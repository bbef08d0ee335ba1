#!/bin/bash
# Round-3 session-6 chip queue: stage D carried over from r3s5_queue.sh —
# hospital-world reference-scale from-scratch PER at 3x budget (2400
# episodes; the 800-ep run reached 46/100 and was still improving).
# Self-resuming (fused checkpoints + counters); retries across tunnel drops.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

wait_tunnel() {
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

marker=results/ref_scale_hospital_2400/summary.json
attempt=0
while [ $attempt -lt 10 ]; do
  [ -f "$marker" ] && { echo "[queue] done"; exit 0; }
  attempt=$((attempt + 1))
  wait_tunnel
  echo "[queue] ==== ref_scale hospital 2400 (attempt $attempt) $(date -u +%H:%M:%S) ===="
  timeout 10800 python -u examples/reference_scale_run.py \
    --episodes 2400 --fused --resume --world hospital \
    --out results/ref_scale_hospital_2400
  echo "[queue] stage rc=$? $(date -u +%H:%M:%S)"
  sleep 60
done
