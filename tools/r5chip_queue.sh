#!/bin/bash
# Round-5 chip queue v2 — replaces the serial tools/r5_queue.sh (killed
# cleanly via its pid per the NEXT.md queue-edit rule). Changes vs v1:
#   * demo recording moved to tools/r5cpu_queue.sh (runs CONCURRENTLY on
#     the single host core; this queue keeps the chip busy from minute 0)
#   * chip stages priority-ordered by the round-4 VERDICT list, with the
#     drr_rand32c owed-sweep block folded in (was tools/r5c_queue.sh)
#   * demo-consuming stages PARK until their corpus marker appears (or the
#     cpu queue dies), instead of serializing behind the recorder
#   * the fleet bench gates on results/r5cpu.alldone — it needs a quiet
#     HOST (1 core), not just a quiet chip
#   * hosp2400 seed replicate (was tools/r5b_queue.sh) runs last
# All ADVICE r4 fixes kept: dedicated .done markers, artifact copies only
# on success, evals gated on summary.json (training completion).
#
# Launch: nohup bash tools/r5chip_queue.sh >> results/r5chip_queue.log 2>&1 &
#         echo $! > /tmp/r5chip_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r5

eval_stage() {  # arm world extra-args...
  local arm=$1 world=$2; shift 2
  mkdir -p results/${arm}
  run_stage results/${arm}/${world}_eval.done 3600 \
    bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
      --checkpoint results/${arm}/checkpoints --vec-eval \
      --world ${world} --episodes 100 --out results/${arm}/${world}_eval $* \
      | tee results/${arm}/${world}_eval.log" \
    && cp -f results/${arm}/${world}_eval.log \
         artifacts/r5/${arm}_${world}_eval.log
}

actor_eval_stage() {  # name npz world extra-args...
  local name=$1 npz=$2 world=$3; shift 3
  mkdir -p results/${name}
  run_stage results/${name}/${world}_eval.done 3600 \
    bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
      --actor ${npz} --vec-eval --world ${world} --episodes 100 \
      --out results/${name}/${world}_eval $* \
      | tee results/${name}/${world}_eval.log" \
    && cp -f results/${name}/${world}_eval.log \
         artifacts/r5/${name}_${world}_eval.log
}

sweep_stage() {  # arm
  local arm=$1
  [ -f results/${arm}/summary.json ] || { echo "[r5chip] no summary for ${arm}, skip sweep"; return 0; }
  run_stage results/robustness_${arm}/sweep.done 5400 \
    python -u tools/robustness_sweep.py \
      --checkpoint results/${arm}/checkpoints \
      --export-actor artifacts/r5/${arm}_actor.npz \
      --worlds rrc hospital --episodes 100 \
      --out results/robustness_${arm} \
    && cp -f results/robustness_${arm}/sweep.jsonl \
         artifacts/r5/robustness_${arm}.jsonl \
    && cp -f results/robustness_${arm}/sweep.md \
         artifacts/r5/robustness_${arm}.md
}

arm_block() {  # arm train-args...
  local arm=$1; shift
  run_stage results/${arm}/train.done 10800 \
    python -u examples/reference_scale_run.py \
      --episodes 800 --fused --resume --eval-world hospital \
      --alpha-max 2.0 --out results/${arm} "$@" \
    && cp -f results/${arm}/summary.json artifacts/r5/${arm}_summary.json
  [ -f results/${arm}/summary.json ] || { echo "[r5chip] ${arm} training incomplete, skip evals"; return 0; }
  eval_stage ${arm} rrc
  eval_stage ${arm} rand100
  eval_stage ${arm} randm100
  sweep_stage ${arm}
}

wait_corpus() {  # marker — park until the cpu queue delivers it (or dies)
  local marker=$1
  while [ ! -f "$marker" ]; do
    if ! kill -0 "$(cat /tmp/r5cpu_queue.pid 2>/dev/null)" 2>/dev/null; then
      [ -f "$marker" ] && return 0
      echo "[r5chip] cpu queue dead and $marker absent — skipping"; return 1
    fi
    echo "[r5chip] waiting on $marker $(date -u +%H:%M:%S)"; sleep 120
  done
  return 0
}

# ---- A. drqc_rand8_amin: the DrQ-v2 critic-only diagnosis arm (VERDICT #3:
#         the designed experiment on WHY both full-aug shift arms collapsed)
arm_block drqc_rand8_amin --world rand8 --world-assign lane \
  --alpha-min 0.1 --aug-shift 4 --aug-critic-only

# ---- B. dr_randm32_s11: seed replicate of the round-5 held-out champion
#         (VERDICT #4: every quality arm is n=1 seed)
#         NOTE: sweep deferred to the tail — the arm aborted_dead at 243
#         eps but its nan_guard-frozen actor evals as a REAL mid-training
#         policy (RRC 100/100, rand100 25%, randm100 17%); with the
#         session clock short, its fault grid ranks below the live arms.
run_stage results/dr_randm32_s11/train.done 10800 \
  python -u examples/reference_scale_run.py \
    --episodes 800 --fused --resume --eval-world hospital \
    --alpha-max 2.0 --out results/dr_randm32_s11 --world randm32 --seed 11 \
  && cp -f results/dr_randm32_s11/summary.json \
       artifacts/r5/dr_randm32_s11_summary.json
if [ -f results/dr_randm32_s11/summary.json ]; then
  eval_stage dr_randm32_s11 rrc
  eval_stage dr_randm32_s11 rand100
  eval_stage dr_randm32_s11 randm100
fi

# ---- J. fleet-trainer bench (VERDICT #5 Done criterion) — moved UP after
#         the drqc win landed (the DrQ fallback arms moved to the tail):
#         the cpu corpus queue is done, so the single host core is quiet
while [ ! -f results/r5cpu.alldone ] && \
      kill -0 "$(cat /tmp/r5cpu_queue.pid 2>/dev/null)" 2>/dev/null; do
  echo "[r5chip] waiting for cpu queue before fleet bench $(date -u +%H:%M:%S)"
  sleep 120
done
run_stage results/bench_train_fleet_r5.done 2400 \
  bash -c "set -o pipefail; python -u tools/bench_train_fleet.py \
    | tee results/bench_train_fleet_r5.jsonl" \
  && cp -f results/bench_train_fleet_r5.jsonl \
       artifacts/r5/bench_train_fleet_r5.jsonl

# ---- B2. dr_randm32_s11_amin: the floor-rescue A/B on the seed that DIED.
#         Seed 11 of the champion recipe aborted_dead at 243 eps (alpha
#         bottomed 0.023, critic went inf/nan) where seed 3407 bottomed at
#         0.059 and survived — per-reset DR without the floor is
#         seed-fragile. Identical run + alpha_min=0.1 tests whether the
#         floor makes the champion recipe RELIABLE (it cured the rand8
#         per-reset collapse; drq proved it is not sufficient under
#         full-aug — this is the un-augmented case it was built for).
arm_block dr_randm32_s11_amin --world randm32 --seed 11 --alpha-min 0.1

# ---- C. drr_rand32c: third deterministic retrain of the 82% RRC arm to
#         complete its OWED held-out rows + fault grid (VERDICT #6; the
#         checkpoints died with a re-clone twice — this time the sweep
#         exports the actor npz into tracked artifacts/)
arm_block drr_rand32c --world rand32

# ---- E. teacher-student distillation, matched demos on rand8 (VERDICT #7) -
if wait_corpus results/distill/demos.done; then
  run_stage results/distill/train.done 10800 \
    bash -c "set -o pipefail; python -u examples/generalization_eval.py \
      --fused --vec-eval --expert-buffer \
      --demos results/distill/demos \
      --bc-params artifacts/r3/gen_fused/bc_warm \
      --rl-episodes 300 --eval-episodes 100 \
      --alpha-init 0.05 --guidence-weight 10 --train-world rand8 \
      --out results/distill | tee results/distill/train.log" \
    && cp -f results/distill/final_actor.npz artifacts/r5/distill_actor.npz \
    && cp -f results/distill/train.log artifacts/r5/distill_train.log
  if [ -f results/distill/final_actor.npz ]; then
    actor_eval_stage distill results/distill/final_actor.npz rand100
    actor_eval_stage distill results/distill/final_actor.npz randm100
  fi
fi

# ---- F. distill_m32: teacher demos x mixed-scale DR (the two winners) -----
if wait_corpus results/distill_m32/demos.done; then
  run_stage results/distill_m32/train.done 10800 \
    bash -c "set -o pipefail; python -u examples/generalization_eval.py \
      --fused --vec-eval --expert-buffer \
      --demos results/distill_m32/demos \
      --bc-params artifacts/r3/gen_fused/bc_warm \
      --rl-episodes 300 --eval-episodes 100 \
      --alpha-init 0.05 --guidence-weight 10 --train-world randm32 \
      --out results/distill_m32 | tee results/distill_m32/train.log" \
    && cp -f results/distill_m32/final_actor.npz \
         artifacts/r5/distill_m32_actor.npz \
    && cp -f results/distill_m32/train.log artifacts/r5/distill_m32_train.log
  if [ -f results/distill_m32/final_actor.npz ]; then
    actor_eval_stage distill_m32 results/distill_m32/final_actor.npz rand100
    actor_eval_stage distill_m32 results/distill_m32/final_actor.npz randm100
  fi
fi

# ---- D. dr_rand8 recipe seed replicates (VERDICT #4) ----------------------
for S in 11 12; do
  run_stage results/dr_rand8_s${S}/train.done 10800 \
    python -u examples/reference_scale_run.py \
      --episodes 800 --fused --resume --eval-world hospital \
      --alpha-max 2.0 --seed ${S} --out results/dr_rand8_s${S} \
      --world rand8 --world-assign lane \
    && cp -f results/dr_rand8_s${S}/summary.json \
         artifacts/r5/dr_rand8_s${S}_summary.json
  if [ -f results/dr_rand8_s${S}/summary.json ]; then
    eval_stage dr_rand8_s${S} rrc
  fi
done

# ---- G. gw10 recipe seed replicates (VERDICT #4; headline 78/48) ----------
if wait_corpus results/gen_base/demos.done; then
  for S in 11 12; do
    run_stage results/gw10_s${S}/train.done 10800 \
      bash -c "set -o pipefail; python -u examples/generalization_eval.py \
        --fused --vec-eval --expert-buffer \
        --demos results/gen_base/demos \
        --bc-params artifacts/r3/gen_fused/bc_warm \
        --rl-episodes 300 --eval-episodes 100 \
        --alpha-init 0.05 --guidence-weight 10 --seed ${S} \
        --out results/gw10_s${S} | tee results/gw10_s${S}/train.log" \
      && cp -f results/gw10_s${S}/train.log artifacts/r5/gw10_s${S}_train.log \
      && cp -f results/gw10_s${S}/final_actor.npz \
           artifacts/r5/gw10_s${S}_actor.npz
  done
fi

# ---- K. hosp2400 alpha_max seed replicate (was tools/r5b_queue.sh) --------
run_stage results/hosp2400_amax_s11/train.done 14400 \
  python -u examples/reference_scale_run.py \
    --episodes 2400 --fused --resume --world hospital --alpha-max 2.0 \
    --seed 11 --out results/hosp2400_amax_s11 \
  && cp -f results/hosp2400_amax_s11/summary.json \
       artifacts/r5/hosp2400_amax_s11_summary.json

# ---- H/I. DrQ fallback diagnosis arms — moved to the TAIL: drqc answered
#         the design question (critic-only routing is the fix); these now
#         only add mechanism detail (does full-aug die at shift=2 / with a
#         20k raw-frame warmup?)
arm_block drq2_rand8_amin --world rand8 --world-assign lane \
  --alpha-min 0.1 --aug-shift 2
arm_block drqw_rand8_amin --world rand8 --world-assign lane \
  --alpha-min 0.1 --aug-shift 4 --aug-warmup 20000

# deferred: fault grid of the s11 salvage actor (see stage B note)
sweep_stage dr_randm32_s11

echo "[queue-r5chip] ALL DONE $(date -u +%H:%M:%S)"
