#!/bin/bash
# Round-4 queue I (gated on queue H): robustness sweep + actor export of
# drr_rand32 — the per-reset-DR arm that did NOT collapse (82% zero-shot
# RRC, the best zero-shot RRC of any arm; 0% hospital with 54 collisions,
# artifacts/r4/drr_rand32_summary.json). The sweep's clean points also
# re-measure both worlds, cross-checking the 82%/0% asymmetry.
# Launch: nohup bash tools/r4i_queue.sh >> results/r4i_queue.log 2>&1 &
#         echo $! > /tmp/r4i_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

if [ -f /tmp/r4h_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4h_queue.pid)" 2>/dev/null; do
    echo "[queue-r4i] waiting on r4h ($(date -u +%H:%M:%S))"
    sleep 120
  done
fi

run_stage results/robustness_drr_rand32/sweep.md 3600 \
  python -u tools/robustness_sweep.py \
    --checkpoint results/drr_rand32/checkpoints \
    --export-actor artifacts/r4/drr_rand32_actor.npz \
    --worlds rrc hospital --episodes 100 \
    --out results/robustness_drr_rand32
cp -f results/robustness_drr_rand32/sweep.jsonl \
  artifacts/r4/robustness_drr_rand32.jsonl 2>/dev/null
cp -f results/robustness_drr_rand32/sweep.md \
  artifacts/r4/robustness_drr_rand32.md 2>/dev/null

echo "[queue-r4i] ALL DONE $(date -u +%H:%M:%S)"
