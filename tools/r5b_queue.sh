#!/bin/bash
# Round-5 follow-up queue: waits for the main r5 queue to exit, then runs
# the remaining low-priority seed replicate — the alpha_max 2400-episode
# hospital arm (round 4's A/B landed 48/100 vs the unclamped 0/100 and the
# 800-ep 46/100; the 48-vs-46 "more budget now helps" delta is a 2-point
# single-seed read that needs a second seed before it stays a claim).
#
# Launch: nohup bash tools/r5b_queue.sh >> results/r5b_queue.log 2>&1 &
#         echo $! > /tmp/r5b_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r5

for P in /tmp/r4o_queue.pid /tmp/r5_queue.pid; do
  if [ -f "$P" ]; then
    while kill -0 "$(cat $P)" 2>/dev/null; do
      echo "[r5b] $(basename $P) still owns the chip; sleeping 300s $(date -u +%H:%M:%S)"
      sleep 300
    done
  fi
done
echo "[r5b] chip is free $(date -u +%H:%M:%S)"

run_stage results/hosp2400_amax_s11/train.done 14400 \
  python -u examples/reference_scale_run.py \
    --episodes 2400 --fused --resume --world hospital --alpha-max 2.0 \
    --seed 11 --out results/hosp2400_amax_s11 \
  && cp -f results/hosp2400_amax_s11/summary.json \
       artifacts/r5/hosp2400_amax_s11_summary.json

echo "[queue-r5b] ALL DONE $(date -u +%H:%M:%S)"
