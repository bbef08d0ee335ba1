#!/bin/bash
# Round-4 follow-up chip queue (gated on tools/r4_queue.sh finishing):
#   E. full bench.py under the new variance-honest protocol (median + band,
#      VERDICT r3 weak #2) — also validates the new serving row on-chip
#   F. tools/bench_train_fleet.py — fleet-collection trainer rows
#      (steps/s + updates/s at 1/4/8 robots vs the 1-robot host loop)
# Launch: nohup bash tools/r4b_queue.sh >> results/r4b_queue.log 2>&1 &
#         echo $! > /tmp/r4b_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

while kill -0 "$(cat /tmp/r4_queue.pid 2>/dev/null)" 2>/dev/null; do
  echo "[queue-r4b] waiting for r4_queue $(date -u +%H:%M:%S)"; sleep 300
done

run_stage results/bench_r4.done 3600 \
  bash -c "set -o pipefail; python -u bench.py | tee results/bench_r4.jsonl"
cp -f results/bench_r4.jsonl artifacts/r4/bench_r4.jsonl 2>/dev/null

run_stage results/bench_train_fleet.done 3600 \
  bash -c "set -o pipefail; python -u tools/bench_train_fleet.py | tee results/bench_train_fleet.jsonl"
cp -f results/bench_train_fleet.jsonl artifacts/r4/bench_train_fleet.jsonl 2>/dev/null

echo "[queue-r4b] ALL DONE $(date -u +%H:%M:%S)"
