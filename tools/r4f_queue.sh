#!/bin/bash
# Round-4 queue F (gated on queue E): DR ensemble scaling RE-MEASURED under
# per-reset world resampling (jax_kinematic._world_of). Queue D found the
# static lane%K map made K>n_envs inert (dr_rand32 == dr_rand16
# bit-identically) and pinned each lane to ONE world for the whole run.
# With resampling every lane sees many worlds per run — the standard DR
# formulation. Questions: (a) does resampling improve rand8 transfer over
# the static-map 47%/37%? (b) does K=32 now beat K=8/16 at the same budget?
# Launch: nohup bash tools/r4f_queue.sh >> results/r4f_queue.log 2>&1 &
#         echo $! > /tmp/r4f_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

# gate: wait for queue E to release the chip
if [ -f /tmp/r4e_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4e_queue.pid)" 2>/dev/null; do
    echo "[queue-r4f] waiting on r4e ($(date -u +%H:%M:%S))"
    sleep 120
  done
fi

for K in 8 32; do
  run_stage results/drr_rand${K}/summary.json 10800 \
    python -u examples/reference_scale_run.py \
      --episodes 800 --fused --resume --world rand${K} \
      --eval-world hospital --alpha-max 2.0 --out results/drr_rand${K}
  cp -f results/drr_rand${K}/summary.json \
    artifacts/r4/drr_rand${K}_summary.json 2>/dev/null

  run_stage results/drr_rand${K}/rrc_eval.done 3600 \
    bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
      --checkpoint results/drr_rand${K}/checkpoints --vec-eval \
      --world rrc --episodes 100 --out results/drr_rand${K}/rrc_eval \
      | tee results/drr_rand${K}/rrc_eval.log"
  cp -f results/drr_rand${K}/rrc_eval.log \
    artifacts/r4/drr_rand${K}_rrc_eval.log 2>/dev/null
done

# robustness sweep of the better arm (by hospital eval), actor exported
BEST=$(python - <<'EOF'
import json, os
best, best_rate = "", -1.0
for k in (8, 32):
    p = f"results/drr_rand{k}/summary.json"
    if os.path.exists(p):
        r = json.load(open(p)).get("eval_success_rate") or 0.0
        if r > best_rate:
            best, best_rate = f"rand{k}", r
print(best)
EOF
)
if [ -n "$BEST" ]; then
  run_stage results/robustness_drr_${BEST}/sweep.md 3600 \
    python -u tools/robustness_sweep.py \
      --checkpoint results/drr_${BEST}/checkpoints \
      --export-actor artifacts/r4/drr_${BEST}_actor.npz \
      --worlds rrc hospital --episodes 100 \
      --out results/robustness_drr_${BEST}
  cp -f results/robustness_drr_${BEST}/sweep.jsonl \
    artifacts/r4/robustness_drr_${BEST}.jsonl 2>/dev/null
  cp -f results/robustness_drr_${BEST}/sweep.md \
    artifacts/r4/robustness_drr_${BEST}.md 2>/dev/null
fi

echo "[queue-r4f] ALL DONE $(date -u +%H:%M:%S)"
