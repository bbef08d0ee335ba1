#!/bin/bash
# Master TPU job queue for the round-3 continuation: owns the (single)
# tunneled chip, running each job sequentially with a tunnel-wait + retry
# between jobs, so tunnel drops cost waiting time, not finished work.
#
# Usage: bash tools/r3_queue.sh >> results/r3_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p results

wait_tunnel() {
  while true; do
    echo "[queue] probing tunnel $(date -u +%H:%M:%S)"
    if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
"; then
      echo "[queue] tunnel up $(date -u +%H:%M:%S)"; return 0
    fi
    sleep 150
  done
}

run_job() {  # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  local tries=0
  while [ $tries -lt 5 ]; do
    tries=$((tries + 1))
    wait_tunnel
    echo "[queue] ==== $name attempt $tries $(date -u +%H:%M:%S) ===="
    timeout "$tmo" "$@"
    local rc=$?
    echo "[queue] ==== $name rc=$rc $(date -u +%H:%M:%S) ===="
    [ $rc -eq 0 ] && return 0
    sleep 60
  done
  echo "[queue] $name FAILED after $tries attempts"
  return 1
}

run_job bench_rollout 2400 python -u tools/bench_rollout.py
run_job bench_d128   2400 python -u tools/bench_d128.py
# reference-scale 800-episode protocol through the fused trainer; train_fused
# resumes its own counters+checkpoint, so retries continue the same budget
run_job ref_scale   28800 python -u examples/reference_scale_run.py \
  --episodes 800 --fused --resume
echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
