#!/bin/bash
# Round-4 chip queue — lands the round-3 stage-C/D campaign that never ran
# (VERDICT.md round 3, "Next round" items 1 and 8) plus the fleet bench:
#   A. alpha_max=2.0 A/B on the exact 2400-episode hospital divergence
#      (unclamped baseline: alpha 10.3, 0/100 deterministic eval)
#   B. tools/bench_serve.py  — serving-tier BENCH rows
#   C. tools/bench_fleet.py  — fleet-tier BENCH rows
#   D. gw10-long arm: winning recipe at 800 fine-tune episodes under the
#      ceiling — does it beat the 78%/48% recipe?
# Every stage is idempotent (marker files) and exports durable copies into
# artifacts/r4/ (results/ is wiped between sessions).
#
# Launch: nohup bash tools/r4_queue.sh >> results/r4_queue.log 2>&1 &
#         echo $! > /tmp/r4_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

# ---- A. hospital 2400-episode from-scratch WITH the entropy ceiling -------
run_stage results/ref_scale_hospital_2400_amax/summary.json 10800 \
  python -u examples/reference_scale_run.py \
    --episodes 2400 --fused --resume --world hospital --alpha-max 2.0 \
    --out results/ref_scale_hospital_2400_amax
cp -f results/ref_scale_hospital_2400_amax/summary.json \
      artifacts/r4/summary_hospital_2400_amax.json 2>/dev/null
cp -f results/ref_scale_hospital_2400_amax/testing_data.txt \
      artifacts/r4/testing_data_hospital_2400_amax.txt 2>/dev/null
for f in results/ref_scale_hospital_2400_amax/train_fused_*.jsonl; do
  [ -f "$f" ] && cp -f "$f" artifacts/r4/train_fused_hospital_2400_amax.jsonl
done

# ---- B. serving bench ------------------------------------------------------
run_stage results/bench_serve.done 3600 \
  bash -c "set -o pipefail; python -u tools/bench_serve.py | tee results/bench_serve.jsonl"
cp -f results/bench_serve.jsonl artifacts/r4/bench_serve.jsonl 2>/dev/null

# ---- C. fleet bench --------------------------------------------------------
run_stage results/bench_fleet.done 3600 \
  bash -c "set -o pipefail; python -u tools/bench_fleet.py | tee results/bench_fleet.jsonl"
cp -f results/bench_fleet.jsonl artifacts/r4/bench_fleet.jsonl 2>/dev/null

# ---- D. gw10-long arm (regen the deterministic demo corpus first) ----------
run_stage results/gen_base/demos/.recorded 1800 \
  python -u tools/record_gen_demos.py --out results/gen_base/demos

run_stage results/gen_gw10_long/summary.done 10800 \
  bash -c "set -o pipefail; python -u examples/generalization_eval.py \
    --fused --vec-eval --expert-buffer \
    --demos results/gen_base/demos \
    --bc-params artifacts/r3/gen_fused/bc_warm \
    --rl-episodes 800 --eval-episodes 50 \
    --alpha-init 0.05 --alpha-max 2.0 --guidence-weight 10 \
    --out results/gen_gw10_long | tee results/gen_gw10_long.log"
cp -f results/gen_gw10_long.log artifacts/r4/gen_gw10_long.log 2>/dev/null
for f in results/gen_gw10_long/*testing_data*.txt results/gen_gw10_long/eval/*testing_data*.txt; do
  [ -f "$f" ] && cp -f "$f" "artifacts/r4/gw10_long_$(basename "$f")"
done

echo "[queue-r4] ALL DONE $(date -u +%H:%M:%S)"
