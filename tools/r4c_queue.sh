#!/bin/bash
# Round-4 queue C (gated on r4b): DOMAIN-RANDOMIZATION transfer arms.
# BENCH.md round 4 concluded transfer is world-diversity bound (more data
# and more episodes both plateau at ~46-48% hospital); these arms test the
# direct remedy — training across a rand8 ensemble of procedurally-random
# layouts (envs/worlds.random_world, per-lane worlds in the vectorized env):
#   A. from-scratch fused PER, 800 eps on rand8 -> eval hospital (+ rrc)
#   B. guided fine-tune recipe (gw=10, alpha0=0.05, amax=2.0, 300 eps) with
#      the fine-tune arena swapped rrc -> rand8; evals rrc+hospital built-in
# Launch: nohup bash tools/r4c_queue.sh >> results/r4c_queue.log 2>&1 &
#         echo $! > /tmp/r4c_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

while kill -0 "$(cat /tmp/r4b_queue.pid 2>/dev/null)" 2>/dev/null; do
  echo "[queue-r4c] waiting for r4b $(date -u +%H:%M:%S)"; sleep 300
done

# ---- A. from-scratch on the ensemble, transfer eval on hospital ------------
run_stage results/dr_rand8/summary.json 10800 \
  python -u examples/reference_scale_run.py \
    --episodes 800 --fused --resume --world rand8 --eval-world hospital \
    --alpha-max 2.0 --out results/dr_rand8
cp -f results/dr_rand8/summary.json artifacts/r4/dr_rand8_summary.json \
  2>/dev/null

# seen-family eval: same checkpoint on rrc (the classic arena)
run_stage results/dr_rand8/rrc_eval.done 3600 \
  bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
    --checkpoint results/dr_rand8/checkpoints --vec-eval \
    --world rrc --episodes 100 --out results/dr_rand8/rrc_eval \
    | tee results/dr_rand8/rrc_eval.log"
cp -f results/dr_rand8/rrc_eval.log artifacts/r4/dr_rand8_rrc_eval.log \
  2>/dev/null

# ---- B. the winning guided recipe with a rand8 fine-tune arena -------------
run_stage results/gen_base/demos/.recorded 1800 \
  python -u tools/record_gen_demos.py --out results/gen_base/demos

run_stage results/gen_rand8/summary.done 10800 \
  bash -c "set -o pipefail; python -u examples/generalization_eval.py \
    --fused --vec-eval --expert-buffer \
    --demos results/gen_base/demos \
    --bc-params artifacts/r3/gen_fused/bc_warm \
    --rl-episodes 300 --eval-episodes 50 \
    --alpha-init 0.05 --alpha-max 2.0 --guidence-weight 10 \
    --train-world rand8 \
    --out results/gen_rand8 | tee results/gen_rand8.log"
cp -f results/gen_rand8.log artifacts/r4/gen_rand8.log 2>/dev/null

echo "[queue-r4c] ALL DONE $(date -u +%H:%M:%S)"
