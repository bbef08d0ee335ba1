#!/bin/bash
# Round-5 chip queue — priority-ordered by the round-4 VERDICT list. The
# round-4 queue (tools/r4o_queue.sh) was found STILL ALIVE at round-5 start,
# mid-way through its own stages 6-7 (dr_randm32 / dr_randh32 / drr_rand32b
# = VERDICT items 1-2), so this queue:
#   0. runs its CPU-side demo stages immediately (no chip needed),
#   1. then WAITS for the r4o pid to exit before touching the chip,
#   2. then runs the round-5 arms:
#      C. drqc_rand8_amin — DrQ shift=4 routed CRITIC-ONLY
#         (sac.aug_actor=False, the actual DrQ-v2 formulation) + floor:
#         the designed experiment on WHY both full-aug shift arms collapsed
#      F. teacher-student distillation: gw10 teacher demos ON rand8 ->
#         gw=10 guided fine-tune ON rand8 (matched demos; the round-4
#         guided-on-rand8 negative was guidance/world MISmatch)
#      C2. dr_randm32_s11 — seed replicate of the round-5 champion
#      F2. distill_m32 — teacher demos x mixed-scale DR (the two winners)
#      G. seed replicates of the load-bearing single-seed deltas
#         (gw10 recipe x2 seeds, dr_rand8 recipe x2 seeds)
#      H/I. DrQ fallback diagnosis arms (shift=2; shift=4 + 20k warmup)
#
# ADVICE.md r4 fixes baked in: dedicated .done markers (never real output
# files), artifact copies only on stage success, eval/sweep stages gated on
# the arm's summary.json (training COMPLETION, not mid-run checkpoints),
# eval_stage forwards extra args.
#
# Launch: nohup bash tools/r5_queue.sh >> results/r5_queue.log 2>&1 &
#         echo $! > /tmp/r5_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r5

cpu_stage() {  # marker timeout cmd...  (no tunnel probe — CPU-only work)
  local marker=$1 tmo=$2; shift 2
  [ -f "$marker" ] && { echo "[r5] $marker exists, skip"; return 0; }
  echo "[r5] ==== (cpu) $* $(date -u +%H:%M:%S) ===="
  timeout "$tmo" "$@" && touch "$marker" && return 0
  echo "[r5] cpu stage rc=$? $(date -u +%H:%M:%S)"
  return 1
}

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
  [ -f results/${arm}/summary.json ] || { echo "[r5] no summary for ${arm}, skip sweep"; return 0; }
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
  # chip-grade evals only for a COMPLETED training run (ADVICE r4 #1)
  [ -f results/${arm}/summary.json ] || { echo "[r5] ${arm} training incomplete, skip evals"; return 0; }
  eval_stage ${arm} rrc
  eval_stage ${arm} rand100
  eval_stage ${arm} randm100
  sweep_stage ${arm}
}

# ---- 0. CPU-side demo corpora (run while r4o still owns the chip) --------
# teacher demo corpus: 400 episodes over the rand8 members, successes only
cpu_stage results/distill/demos.done 5400 \
  python -u tools/record_teacher_demos.py --platform cpu \
    --actor artifacts/r3/gen_fused/gw10_winner_actor.npz \
    --world rand8 --episodes 400 --max-steps 200 \
    --out results/distill/demos
# the scripted-pilot corpus the gw10 recipe trains on (results/ was wiped;
# the recorder is deterministic — reproduces the round-3 corpus exactly)
cpu_stage results/gen_base/demos.done 3600 \
  python -u tools/record_gen_demos.py --out results/gen_base/demos
# teacher demos on the MIXED-SCALE ensemble (for distill_m32 — composing
# the round's two winning recipes: gw10 guidance x randm32 DR; dr_randm32
# landed 37% rand100 / 29% randm100, the new held-out champion)
cpu_stage results/distill_m32/demos.done 5400 \
  python -u tools/record_teacher_demos.py --platform cpu \
    --actor artifacts/r3/gen_fused/gw10_winner_actor.npz \
    --world randm32 --episodes 400 --max-steps 400 \
    --out results/distill_m32/demos

# ---- 1. wait for the round-4 queue to release the chip -------------------
if [ -f /tmp/r4o_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4o_queue.pid)" 2>/dev/null; do
    echo "[r5] r4o queue (pid $(cat /tmp/r4o_queue.pid)) still owns the chip; sleeping 300s $(date -u +%H:%M:%S)"
    sleep 300
  done
fi
echo "[r5] chip is free $(date -u +%H:%M:%S)"

# ---- B. fleet-trainer bench on the QUIET chip (VERDICT r4 #5 Done
#         criterion: 8-robot arm >= 4-robot arm steps/s after the lock-scope
#         fix; the mid-campaign attempt contended with r4o training and was
#         discarded) ----
run_stage results/bench_train_fleet_r5.done 2400 \
  bash -c "set -o pipefail; python -u tools/bench_train_fleet.py \
    | tee results/bench_train_fleet_r5.jsonl" \
  && cp -f results/bench_train_fleet_r5.jsonl \
       artifacts/r5/bench_train_fleet_r5.jsonl

# ---- C. the DrQ-v2 critic-only diagnosis arm ------------------------------
arm_block drqc_rand8_amin --world rand8 --world-assign lane \
  --alpha-min 0.1 --aug-shift 4 --aug-critic-only

# ---- C2. seed replicate of the round-5 champion ---------------------------
# dr_randm32 (37% rand100 / 29% randm100 / hospital>=RRC) is an n=1 claim;
# a second seed ranks above the DrQ fallback arms (VERDICT r4 weak #5).
arm_block dr_randm32_s11 --world randm32 --seed 11

# ---- F. teacher-student distillation (matched demos + DR worlds) ----------
if [ -f results/distill/demos.done ]; then
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

# ---- F2. distill_m32: compose the two winning recipes ---------------------
# gw10-teacher demos recorded ON randm32 members + guided fine-tune ON the
# randm32 ensemble — guidance robustness (gw10: flat fault curves) x
# mixed-scale DR (dr_randm32: held-out champion). Same gen protocol as F.
if [ -f results/distill_m32/demos.done ]; then
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

# ---- G. seed replicates of the load-bearing deltas ------------------------
# gw10 recipe (headline 78/48): 2 extra seeds at the round-3 protocol
for S in 11 12; do
  [ -f results/gen_base/demos.done ] || break
  run_stage results/gw10_s${S}/train.done 10800 \
    bash -c "set -o pipefail; python -u examples/generalization_eval.py \
      --fused --vec-eval --expert-buffer \
      --demos results/gen_base/demos \
      --bc-params artifacts/r3/gen_fused/bc_warm \
      --rl-episodes 300 --eval-episodes 100 \
      --alpha-init 0.05 --guidence-weight 10 --seed ${S} \
      --out results/gw10_s${S} | tee results/gw10_s${S}/train.log" \
    && cp -f results/gw10_s${S}/train.log artifacts/r5/gw10_s${S}_train.log \
    && cp -f results/gw10_s${S}/final_actor.npz artifacts/r5/gw10_s${S}_actor.npz
done
# dr_rand8 recipe (47/37): 2 extra seeds, rrc zero-shot eval per seed
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

# ---- H/I. DrQ fallback diagnosis arms --------------------------------------
arm_block drq2_rand8_amin --world rand8 --world-assign lane \
  --alpha-min 0.1 --aug-shift 2
arm_block drqw_rand8_amin --world rand8 --world-assign lane \
  --alpha-min 0.1 --aug-shift 4 --aug-warmup 20000

echo "[queue-r5] ALL DONE $(date -u +%H:%M:%S)"
