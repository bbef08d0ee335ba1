#!/bin/bash
# Round-3 session-6 stage C: retry the 2400-episode hospital from-scratch
# protocol WITH the new entropy ceiling (sac.alpha_max=2.0 — the healthy
# 800-ep run lived in alpha 0.4-2.5; the unclamped 2400-ep run blew up to
# 10.3 and eval'd 0/100). Direct A/B of the fix on the exact failure case.
# Waits for the arms-B queue to drain first.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$(cat /tmp/r3s6b.pid 2>/dev/null)" 2>/dev/null; do
  echo "[queue-c] waiting for arms-B $(date -u +%H:%M:%S)"; sleep 300
done

wait_tunnel() {
  while true; do
    echo "[queue-c] probing tunnel $(date -u +%H:%M:%S)"
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" && return 0
    sleep 150
  done
}

marker=results/ref_scale_hospital_2400_amax/summary.json
attempt=0
while [ $attempt -lt 10 ]; do
  [ -f "$marker" ] && { echo "[queue-c] done"; exit 0; }
  attempt=$((attempt + 1))
  wait_tunnel
  echo "[queue-c] ==== hospital 2400 alpha_max=2.0 (attempt $attempt) $(date -u +%H:%M:%S) ===="
  timeout 10800 python -u examples/reference_scale_run.py \
    --episodes 2400 --fused --resume --world hospital --alpha-max 2.0 \
    --out results/ref_scale_hospital_2400_amax
  echo "[queue-c] stage rc=$? $(date -u +%H:%M:%S)"
  sleep 60
done
