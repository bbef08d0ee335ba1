#!/bin/bash
# Round-4 queue H (gated on queue G): alpha_min A/B on the exact per-reset
# DR collapse. drr_rand8 (per-episode world resampling) diverged — alpha
# auto-tuned down to 0.003, critics went inf, training stalled at 50/800
# goals (artifacts/r4/drr_rand8_summary.json). The healthy static-map arms
# ran with alpha in ~0.4-2.5. Arm: IDENTICAL protocol with the new opt-in
# sac.alpha_min=0.1 floor (+ the existing 2.0 ceiling) — does banding the
# temperature recover per-reset DR?
# Launch: nohup bash tools/r4h_queue.sh >> results/r4h_queue.log 2>&1 &
#         echo $! > /tmp/r4h_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

if [ -f /tmp/r4g_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4g_queue.pid)" 2>/dev/null; do
    echo "[queue-r4h] waiting on r4g ($(date -u +%H:%M:%S))"
    sleep 120
  done
fi

run_stage results/drr_rand8_amin/summary.json 10800 \
  python -u examples/reference_scale_run.py \
    --episodes 800 --fused --resume --world rand8 \
    --eval-world hospital --alpha-max 2.0 --alpha-min 0.1 \
    --out results/drr_rand8_amin
cp -f results/drr_rand8_amin/summary.json \
  artifacts/r4/drr_rand8_amin_summary.json 2>/dev/null

run_stage results/drr_rand8_amin/rrc_eval.done 3600 \
  bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
    --checkpoint results/drr_rand8_amin/checkpoints --vec-eval \
    --world rrc --episodes 100 --out results/drr_rand8_amin/rrc_eval \
    | tee results/drr_rand8_amin/rrc_eval.log"
cp -f results/drr_rand8_amin/rrc_eval.log \
  artifacts/r4/drr_rand8_amin_rrc_eval.log 2>/dev/null

run_stage results/robustness_drr_amin/sweep.md 3600 \
  python -u tools/robustness_sweep.py \
    --checkpoint results/drr_rand8_amin/checkpoints \
    --export-actor artifacts/r4/drr_rand8_amin_actor.npz \
    --worlds rrc hospital --episodes 100 \
    --out results/robustness_drr_amin
cp -f results/robustness_drr_amin/sweep.jsonl \
  artifacts/r4/robustness_drr_amin.jsonl 2>/dev/null
cp -f results/robustness_drr_amin/sweep.md \
  artifacts/r4/robustness_drr_amin.md 2>/dev/null

echo "[queue-r4h] ALL DONE $(date -u +%H:%M:%S)"
