#!/bin/bash
# Round-4 queue L: consolidated relaunch of the queues the tunnel drop
# orphaned (G aug, H alpha_min, I drr_rand32 sweep, J scale arms, K
# held-out procedural evals). The prior session's results/ tree is gone
# (re-clone), so every arm retrains from scratch via the idempotent
# reference_scale_run --resume stages; artifacts land in artifacts/r4/ as
# each arm finishes so partial progress survives another drop.
# Per-arm block: train 800 eps -> rrc vec-eval -> held-out rand100 +
# randm100 evals -> full robustness sweep + actor export.
# Launch: nohup bash tools/r4l_queue.sh >> results/r4l_queue.log 2>&1 &
#         echo $! > /tmp/r4l_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

eval_stage() {  # arm world
  local arm=$1 world=$2
  run_stage results/${arm}/${world}_eval.done 3600 \
    bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
      --checkpoint results/${arm}/checkpoints --vec-eval \
      --world ${world} --episodes 100 --out results/${arm}/${world}_eval \
      | tee results/${arm}/${world}_eval.log"
  cp -f results/${arm}/${world}_eval.log \
    artifacts/r4/${arm}_${world}_eval.log 2>/dev/null
}

sweep_stage() {  # arm
  local arm=$1
  run_stage results/robustness_${arm}/sweep.md 3600 \
    python -u tools/robustness_sweep.py \
      --checkpoint results/${arm}/checkpoints \
      --export-actor artifacts/r4/${arm}_actor.npz \
      --worlds rrc hospital --episodes 100 \
      --out results/robustness_${arm}
  cp -f results/robustness_${arm}/sweep.jsonl \
    artifacts/r4/robustness_${arm}.jsonl 2>/dev/null
  cp -f results/robustness_${arm}/sweep.md \
    artifacts/r4/robustness_${arm}.md 2>/dev/null
}

arm_block() {  # arm train-args...
  local arm=$1; shift
  run_stage results/${arm}/summary.json 10800 \
    python -u examples/reference_scale_run.py \
      --episodes 800 --fused --resume --eval-world hospital \
      --alpha-max 2.0 --out results/${arm} "$@"
  cp -f results/${arm}/summary.json \
    artifacts/r4/${arm}_summary.json 2>/dev/null
  [ -d results/${arm}/checkpoints ] || return 0
  eval_stage ${arm} rrc
  eval_stage ${arm} rand100
  eval_stage ${arm} randm100
  sweep_stage ${arm}
}

# G: fault augmentation x DR (lane-pinned, the stable baseline recipe)
arm_block aug_rand8 --world rand8 --world-assign lane \
  --aug patch_occlusion=0.25 --aug obs_noise=0.196 --aug-prob 0.5

# H: alpha_min=0.1 A/B on the per-reset-DR collapse
arm_block drr_rand8_amin --world rand8 --alpha-min 0.1

# K-baseline: retrain dr_rand8 (lane-pinned) ONLY for the held-out evals —
# its clean evals + robustness sweep are already recorded
# (artifacts/r4/dr_rand8_summary.json, robustness_rand8.jsonl); the re-run
# summary lands as dr_rand8b so it cross-checks rather than overwrites.
run_stage results/dr_rand8b/summary.json 10800 \
  python -u examples/reference_scale_run.py \
    --episodes 800 --fused --resume --eval-world hospital \
    --alpha-max 2.0 --out results/dr_rand8b \
    --world rand8 --world-assign lane
cp -f results/dr_rand8b/summary.json \
  artifacts/r4/dr_rand8b_summary.json 2>/dev/null
if [ -d results/dr_rand8b/checkpoints ]; then
  eval_stage dr_rand8b rand100
  eval_stage dr_rand8b randm100
fi

# J: arena-scale axis (per-reset assignment, stable at K=32)
arm_block dr_randm32 --world randm32
arm_block dr_randh32 --world randh32

# I: retrain drr_rand32 (checkpoints lost to the re-clone) then the sweep
# the 82%-zero-shot result was still owed
arm_block drr_rand32 --world rand32

echo "[queue-r4l] ALL DONE $(date -u +%H:%M:%S)"
