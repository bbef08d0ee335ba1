#!/bin/bash
# Round-4 queue O: consolidated FINAL drain of the round-4 measurement
# campaign, priority-ordered by information-per-chip-minute. The re-clone
# wiped results/ again, so arms whose artifacts already landed
# (aug_rand8, drr_rand8_amin summary, drr_rand32 summary+rrc) are NOT
# retrained unless a chip-grade deliverable still depends on their lost
# checkpoints. Stage order:
#   1. r4n flagship held-out evals (pure evals; actors live in
#      artifacts/r3 — upgrades the four starred cpu25 rows)
#   2. queue-M arm A: aug_rand8_amin — fault augmentation UNDER the
#      alpha floor (the no-floor arm died at 354 eps; floored control
#      drr_rand8_amin survived — this is the round's open A/B)
#   3. queue-M arm B: drq_rand8_amin — DrQ-v2 shift under the floor
#   4. drr_rand8_aminb: retrain the floored per-reset-DR arm ONLY to get
#      chip-grade held-out evals (cpu25 rows were provisional; the first
#      run's checkpoints died with the re-clone). Cross-check name so the
#      original summary artifact is not overwritten.
#   5. dr_rand8b cross-check + held-out evals (queue-L leftover)
#   6. scale arms dr_randm32 / dr_randh32 (queue-J leftovers)
#   7. drr_rand32 retrain -> held-out evals + robustness sweep (the 82%
#      zero-shot arm still owes its sweep)
# Launch: nohup bash tools/r4o_queue.sh >> results/r4o_queue.log 2>&1 &
#         echo $! > /tmp/r4o_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

eval_stage() {  # arm world extra-args...
  local arm=$1 world=$2; shift 2
  mkdir -p results/${arm}
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

# ---- 1. flagship held-out chip evals (r4n) ----
for ARM in gw10:artifacts/r3/gen_fused/gw10_winner_actor.npz \
           spec:artifacts/r3/ref_scale_800ep_actor.npz; do
  NAME=${ARM%%:*}; NPZ=${ARM#*:}
  mkdir -p results/flag_${NAME}
  for EW in rand100 randm100; do
    run_stage results/flag_${NAME}/${EW}_eval.done 1800 \
      bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
        --actor ${NPZ} --vec-eval --world ${EW} --episodes 100 \
        --out results/flag_${NAME}/${EW}_eval \
        | tee results/flag_${NAME}/${EW}_eval.log"
    cp -f results/flag_${NAME}/${EW}_eval.log \
      artifacts/r4/flag_${NAME}_${EW}_eval.log 2>/dev/null
  done
done

# ---- 2+3. floored augmentation A/Bs (queue M v2) ----
arm_block aug_rand8_amin --world rand8 --world-assign lane \
  --alpha-min 0.1 \
  --aug patch_occlusion=0.25 --aug obs_noise=0.196 --aug-prob 0.5
arm_block drq_rand8_amin --world rand8 --world-assign lane \
  --alpha-min 0.1 --aug-shift 4

# ---- 4. chip-grade evals of the floored per-reset-DR arm ----
arm_block drr_rand8_aminb --world rand8 --alpha-min 0.1

# ---- 5. dr_rand8b cross-check (held-out evals only) ----
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

# ---- 6. scale arms ----
arm_block dr_randm32 --world randm32
arm_block dr_randh32 --world randh32

# ---- 7. drr_rand32 retrain + owed sweep ----
arm_block drr_rand32b --world rand32

echo "[queue-r4o] ALL DONE $(date -u +%H:%M:%S)"
