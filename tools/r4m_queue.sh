#!/bin/bash
# Round-4 queue M (gated on queue L), v2: AUGMENTATION UNDER THE ALPHA
# FLOOR. The no-floor fault-aug arm DIED mid-queue-L exactly like the
# per-reset-DR arm (aug_rand8: alpha -> collapse, nan_guard freeze,
# dead-run abort at 354 eps / 11 goals, artifacts/r4/aug_rand8_summary
# .json) — two independent hard-training collapses with one measured
# mechanism. So both augmentation arms here carry sac.alpha_min=0.1
# (+ the usual 2.0 ceiling); their floored control is drr_rand8_amin
# (queue L/H). Arms, lane-pinned rand8, 800 eps each:
#   A. aug_rand8_amin — the queue-G fault-aug recipe + the floor: does
#      collection-time structural dropout buy patch robustness once
#      training survives?
#   B. drq_rand8_amin — update-time DrQ-v2 random shift (sac.aug_shift=4,
#      ops/augment.py): the standard pixel-RL regularizer vs the
#      fault-specific one.
# Launch: nohup bash tools/r4m_queue.sh >> results/r4m_queue.log 2>&1 &
#         echo $! > /tmp/r4m_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

if [ -f /tmp/r4l_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4l_queue.pid)" 2>/dev/null; do
    echo "[queue-r4m] waiting on r4l ($(date -u +%H:%M:%S))"
    sleep 120
  done
fi

arm_block() {  # arm train-args...
  local arm=$1; shift
  run_stage results/${arm}/summary.json 10800 \
    python -u examples/reference_scale_run.py \
      --episodes 800 --fused --resume --world rand8 --world-assign lane \
      --eval-world hospital --alpha-max 2.0 --alpha-min 0.1 \
      --out results/${arm} "$@"
  cp -f results/${arm}/summary.json \
    artifacts/r4/${arm}_summary.json 2>/dev/null
  [ -d results/${arm}/checkpoints ] || return 0
  for EW in rrc rand100 randm100; do
    run_stage results/${arm}/${EW}_eval.done 3600 \
      bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
        --checkpoint results/${arm}/checkpoints --vec-eval \
        --world ${EW} --episodes 100 --out results/${arm}/${EW}_eval \
        | tee results/${arm}/${EW}_eval.log"
    cp -f results/${arm}/${EW}_eval.log \
      artifacts/r4/${arm}_${EW}_eval.log 2>/dev/null
  done
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

arm_block aug_rand8_amin \
  --aug patch_occlusion=0.25 --aug obs_noise=0.196 --aug-prob 0.5
arm_block drq_rand8_amin --aug-shift 4

echo "[queue-r4m] ALL DONE $(date -u +%H:%M:%S)"
