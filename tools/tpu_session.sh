#!/bin/bash
# One-shot TPU measurement session for the round-3 continuation: waits for
# the tunneled backend, then runs the rollout/training benches that need a
# real chip, logging to results/. Safe to run alongside the experiment
# launchers (these tools are short; contention inflates the experiments'
# wall-clock, not their results — re-run on a quiet chip for final numbers
# if the rows look contended).
#
# Usage: bash tools/tpu_session.sh >> results/tpu_session.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while true; do
  echo "[tpu-session] probing tunnel $(date -u +%H:%M:%S)"
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
"; then
    break
  fi
  sleep 150
done

echo "[tpu-session] tunnel up; bench_rollout $(date -u +%H:%M:%S)"
timeout 2400 python tools/bench_rollout.py
echo "[tpu-session] bench_d128 $(date -u +%H:%M:%S)"
timeout 2400 python tools/bench_d128.py
echo "[tpu-session] done $(date -u +%H:%M:%S)"
