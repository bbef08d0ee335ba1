#!/bin/bash
# Round-4 queue K (gated on queue J): held-out PROCEDURAL-ensemble evals.
# dgvit-test --vec-eval --world rand<K>/randm<K> runs each eval episode in
# a hashed procedural layout; the eval seed (7) differs from the training
# seed, so every layout is never-seen. Two metrics per arm:
#   rand100  — 100 unseen RRC-sized layouts (within-class generalization)
#   randm100 — 50 RRC-sized + 50 hospital-sized (cross-scale)
# Arms: the static-map DR baseline (dr_rand8), the per-reset K=32 arm
# (drr_rand32, 82% zero-shot RRC), the aug arm and the scale arms from
# queues G/J when their checkpoints exist.
# Launch: nohup bash tools/r4k_queue.sh >> results/r4k_queue.log 2>&1 &
#         echo $! > /tmp/r4k_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

if [ -f /tmp/r4j_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4j_queue.pid)" 2>/dev/null; do
    echo "[queue-r4k] waiting on r4j ($(date -u +%H:%M:%S))"
    sleep 120
  done
fi

for ARM in dr_rand8 drr_rand32 aug_rand8 dr_randh32 dr_randm32; do
  [ -d results/${ARM}/checkpoints ] || { echo "[queue-r4k] no ${ARM}"; continue; }
  for EW in rand100 randm100; do
    run_stage results/${ARM}/heldout_${EW}.done 3600 \
      bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
        --checkpoint results/${ARM}/checkpoints --vec-eval \
        --world ${EW} --episodes 100 \
        --out results/${ARM}/heldout_${EW} \
        | tee results/${ARM}/heldout_${EW}.log"
    cp -f results/${ARM}/heldout_${EW}.log \
      artifacts/r4/${ARM}_heldout_${EW}.log 2>/dev/null
  done
done

echo "[queue-r4k] ALL DONE $(date -u +%H:%M:%S)"
