#!/bin/bash
# Round-4 queue G (gated on queue F): sensor-fault AUGMENTATION x domain
# randomization. The round-4 sweeps showed DR buys flat additive-fault
# curves but collapses under structural dropout (robustness_rand8:
# patch=0.25 -> 16% RRC / 0% hospital) while only the demo-guided recipe
# survives it. Hypothesis: feeding the faults into collection
# (make_collect_fn(fault_knobs=...), envs/fault_aug.py) buys dropout
# robustness without demos.
#   Arm: from-scratch fused PER, 800 eps, rand8 ensemble with the
#   LANE-PINNED assignment (--world-assign lane — same recipe as the
#   dr_rand8 baseline it must be compared to; the per-reset default
#   diverged, BENCH round 4 stage D, and would confound the aug variable),
#   alpha_max=2.0, aug = patch 0.25 + noise 0.196 @ prob 0.5.
#   Then: zero-shot evals on hospital + rrc, full robustness sweep on both.
# Launch: nohup bash tools/r4g_queue.sh >> results/r4g_queue.log 2>&1 &
#         echo $! > /tmp/r4g_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

if [ -f /tmp/r4f_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4f_queue.pid)" 2>/dev/null; do
    echo "[queue-r4g] waiting on r4f ($(date -u +%H:%M:%S))"
    sleep 120
  done
fi

run_stage results/aug_rand8/summary.json 10800 \
  python -u examples/reference_scale_run.py \
    --episodes 800 --fused --resume --world rand8 --world-assign lane \
    --eval-world hospital --alpha-max 2.0 \
    --aug patch_occlusion=0.25 --aug obs_noise=0.196 --aug-prob 0.5 \
    --out results/aug_rand8
cp -f results/aug_rand8/summary.json \
  artifacts/r4/aug_rand8_summary.json 2>/dev/null

run_stage results/aug_rand8/rrc_eval.done 3600 \
  bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
    --checkpoint results/aug_rand8/checkpoints --vec-eval \
    --world rrc --episodes 100 --out results/aug_rand8/rrc_eval \
    | tee results/aug_rand8/rrc_eval.log"
cp -f results/aug_rand8/rrc_eval.log \
  artifacts/r4/aug_rand8_rrc_eval.log 2>/dev/null

run_stage results/robustness_aug_rand8/sweep.md 3600 \
  python -u tools/robustness_sweep.py \
    --checkpoint results/aug_rand8/checkpoints \
    --export-actor artifacts/r4/aug_rand8_actor.npz \
    --worlds rrc hospital --episodes 100 \
    --out results/robustness_aug_rand8
cp -f results/robustness_aug_rand8/sweep.jsonl \
  artifacts/r4/robustness_aug_rand8.jsonl 2>/dev/null
cp -f results/robustness_aug_rand8/sweep.md \
  artifacts/r4/robustness_aug_rand8.md 2>/dev/null

echo "[queue-r4g] ALL DONE $(date -u +%H:%M:%S)"
