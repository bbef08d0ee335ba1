# Shared helpers for chip-queue scripts. Source from a queue script:
#   . "$(dirname "$0")/queue_lib.sh"
# Conventions (established rounds 3+): launch queues with
#   nohup bash tools/<queue>.sh >> results/<queue>.log 2>&1 &
#   echo $! > /tmp/<queue>.pid
# so later queues can gate on `kill -0 $(cat /tmp/<queue>.pid)`, and NEVER
# kill queue processes by name pattern (pkill/pgrep match the session's own
# command line) — always `kill $(cat /tmp/<queue>.pid)` plus its children
# via `ps -o pid= --ppid`.

wait_tunnel() {
  # Block until the tunneled TPU backend answers a real matmul. A plain
  # import succeeds even when the device is unreachable; the probe must
  # compute through the chip.
  while true; do
    echo "[queue] probing tunnel $(date -u +%H:%M:%S)"
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" && return 0
    sleep 150
  done
}

run_stage() {  # marker-file timeout-seconds cmd args...
  # Idempotent retrying stage: skip when the marker exists (a completed
  # earlier attempt), re-probe the tunnel before every attempt, touch the
  # marker only on rc=0. Self-resuming stages (fused checkpoints) make
  # retries cheap.
  local marker=$1 tmo=$2; shift 2
  [ -f "$marker" ] && { echo "[queue] $marker exists, skip"; return 0; }
  local attempt=0
  while [ $attempt -lt "${QUEUE_MAX_ATTEMPTS:-8}" ]; do
    attempt=$((attempt + 1))
    wait_tunnel
    echo "[queue] ==== $* (attempt $attempt) $(date -u +%H:%M:%S) ===="
    timeout "$tmo" "$@" && touch "$marker" && return 0
    echo "[queue] stage rc=$? $(date -u +%H:%M:%S)"
    sleep 120
  done
  echo "[queue] stage GAVE UP: $*"
  return 1
}
