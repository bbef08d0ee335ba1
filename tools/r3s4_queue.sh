#!/bin/bash
# Round-3 session-4 chip queue: (1) hospital-world reference-scale run
# (NEXT.md #2, resumes the session-3 run that died at ~178 episodes), then
# (2) the fused generalization sweep arms (NEXT.md #1, base stage already
# staged in results/gen_fused/base). Each stage retries across tunnel drops.
#
# Usage: bash tools/r3s4_queue.sh >> results/r3s4_queue.log 2>&1 &
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

# ---- stage 1: hospital reference-scale run (self-resuming fused mode) ----
HOSP_OUT=results/ref_scale_hospital
if [ ! -f "$HOSP_OUT/summary.json" ]; then
  ATTEMPT=0
  while [ $ATTEMPT -lt 12 ]; do
    ATTEMPT=$((ATTEMPT + 1))
    wait_tunnel
    echo "[queue] hospital ref-scale attempt $ATTEMPT $(date -u +%H:%M:%S)"
    timeout 10800 python -u examples/reference_scale_run.py \
      --episodes 800 --fused --resume --world hospital --out "$HOSP_OUT"
    rc=$?
    echo "[queue] hospital run exited rc=$rc $(date -u +%H:%M:%S)"
    [ $rc -eq 0 ] && break
    sleep 120
  done
fi

# ---- stage 2: generalization sweep arms (base already staged) -----------
WAIT_QUEUE=0 bash tools/gen_sweep_fused.sh
echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
