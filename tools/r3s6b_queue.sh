#!/bin/bash
# Round-3 session-6 arms B: does 5x demo data (500 episodes, 13,138
# transitions, results/gen_big/demos) lift the winning recipe — and does it
# flip the d=128 capacity negative (attributed to data scale in the
# session-5 ablation)? Waits for the stage-D chip run to finish first.
#   (E) d=64  BC-only on the big corpus       + 50-ep evals both worlds
#   (F) d=64  gw=10 fused fine-tune from E    (the winning recipe, more data)
#   (G) d=128 BC-only on the big corpus       (data-scale hypothesis test)
# Usage: bash tools/r3s6b_queue.sh >> results/r3s6b_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while [ ! -f results/ref_scale_hospital_2400/summary.json ]; do
  echo "[queue-b] waiting for stage D $(date -u +%H:%M:%S)"; sleep 300
done

wait_tunnel() {
  while true; do
    echo "[queue-b] probing tunnel $(date -u +%H:%M:%S)"
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" && return 0
    sleep 150
  done
}

run_stage() {  # marker-file timeout cmd...
  local marker=$1 tmo=$2; shift 2
  [ -f "$marker" ] && { echo "[queue-b] $marker exists, skip"; return 0; }
  local attempt=0
  while [ $attempt -lt 6 ]; do
    attempt=$((attempt + 1))
    wait_tunnel
    echo "[queue-b] ==== $* (attempt $attempt) $(date -u +%H:%M:%S) ===="
    timeout "$tmo" "$@" && touch "$marker" && return 0
    echo "[queue-b] stage rc=$? $(date -u +%H:%M:%S)"
    sleep 120
  done
  echo "[queue-b] stage GAVE UP: $*"
  return 1
}

DEMOS=results/gen_big/demos

run_stage results/gen_big/bc_only/summary.done 10800 \
  python -u examples/generalization_eval.py \
    --skip-rl --vec-eval \
    --demos "$DEMOS" --bc-epochs 120 --eval-episodes 50 \
    --out results/gen_big/bc_only

run_stage results/gen_big/gw10/summary.done 10800 \
  python -u examples/generalization_eval.py \
    --fused --vec-eval --expert-buffer \
    --demos "$DEMOS" --bc-params results/gen_big/bc_only/il/bc_warm \
    --rl-episodes 300 --eval-episodes 50 \
    --alpha-init 0.05 --guidence-weight 10 \
    --out results/gen_big/gw10

run_stage results/gen_big/bc_d128/summary.done 10800 \
  python -u examples/generalization_eval.py \
    --skip-rl --vec-eval --dim 128 --dim-head 128 \
    --demos "$DEMOS" --bc-epochs 120 --eval-episodes 50 \
    --out results/gen_big/bc_d128

echo "[queue-b] ALL DONE $(date -u +%H:%M:%S)"
