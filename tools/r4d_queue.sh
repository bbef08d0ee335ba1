#!/bin/bash
# Round-4 queue D: robustness study + DR ensemble-size scaling.
#   A. tools/robustness_sweep.py on the flagship checkpoints — the
#      reference's sensor-fault suite (env_lab.py:33-90) at FULL geometry:
#      gw10 winner on rrc+hospital, the RRC specialist on rrc.
#   B. ensemble-size scaling of the round-4 domain-randomization result:
#      from-scratch fused PER 800 eps on rand4 / rand16 / rand32 (rand8
#      measured 47% rrc / 37% hospital zero-shot), eval both worlds.
#   C. bench_train_fleet re-run with the donated-params race fixed
#      (train_fleet publishes params inside dev_lock now).
# Launch: nohup bash tools/r4d_queue.sh >> results/r4d_queue.log 2>&1 &
#         echo $! > /tmp/r4d_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

# ---- A. robustness sweeps ---------------------------------------------------
run_stage results/robustness_gw10/sweep.md 3600 \
  python -u tools/robustness_sweep.py \
    --actor artifacts/r3/gen_fused/gw10_winner_actor.npz \
    --worlds rrc hospital --episodes 100 --out results/robustness_gw10
cp -f results/robustness_gw10/sweep.jsonl \
  artifacts/r4/robustness_gw10.jsonl 2>/dev/null
cp -f results/robustness_gw10/sweep.md \
  artifacts/r4/robustness_gw10.md 2>/dev/null

run_stage results/robustness_spec/sweep.md 3600 \
  python -u tools/robustness_sweep.py \
    --actor artifacts/r3/ref_scale_800ep_actor.npz \
    --worlds rrc --episodes 100 --out results/robustness_spec
cp -f results/robustness_spec/sweep.jsonl \
  artifacts/r4/robustness_spec.jsonl 2>/dev/null
cp -f results/robustness_spec/sweep.md \
  artifacts/r4/robustness_spec.md 2>/dev/null

# ---- B. DR ensemble-size scaling -------------------------------------------
for K in 4 16 32; do
  run_stage results/dr_rand${K}/summary.json 10800 \
    python -u examples/reference_scale_run.py \
      --episodes 800 --fused --resume --world rand${K} \
      --eval-world hospital --alpha-max 2.0 --out results/dr_rand${K}
  cp -f results/dr_rand${K}/summary.json \
    artifacts/r4/dr_rand${K}_summary.json 2>/dev/null

  run_stage results/dr_rand${K}/rrc_eval.done 3600 \
    bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
      --checkpoint results/dr_rand${K}/checkpoints --vec-eval \
      --world rrc --episodes 100 --out results/dr_rand${K}/rrc_eval \
      | tee results/dr_rand${K}/rrc_eval.log"
  cp -f results/dr_rand${K}/rrc_eval.log \
    artifacts/r4/dr_rand${K}_rrc_eval.log 2>/dev/null
done

# ---- C. fleet-trainer bench, post-fix ---------------------------------------
run_stage results/bench_train_fleet2.done 3600 \
  bash -c "set -o pipefail; python -u tools/bench_train_fleet.py \
    | tee results/bench_train_fleet2.jsonl"
cp -f results/bench_train_fleet2.jsonl \
  artifacts/r4/bench_train_fleet2.jsonl 2>/dev/null

echo "[queue-r4d] ALL DONE $(date -u +%H:%M:%S)"
