#!/bin/bash
# Round-4 queue J (gated on queue I): arena-SCALE diversity. drr_rand32
# measured 82% zero-shot RRC / 0% hospital (54 collisions) — same-scale
# ensemble diversity buys within-class transfer but not cross-scale
# transfer. Two arms test the scale axis directly (both per-reset, the
# assignment that was stable at K=32):
#   A. randh32 — 32 hospital-SIZED random layouts: does big-arena DR
#      transfer to hospital (and lose RRC)?
#   B. randm32 — mixed scales (16 RRC-sized + 16 hospital-sized,
#      per-world arenas): does scale diversity buy BOTH worlds?
# Launch: nohup bash tools/r4j_queue.sh >> results/r4j_queue.log 2>&1 &
#         echo $! > /tmp/r4j_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

if [ -f /tmp/r4i_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4i_queue.pid)" 2>/dev/null; do
    echo "[queue-r4j] waiting on r4i ($(date -u +%H:%M:%S))"
    sleep 120
  done
fi

for SPEC in randh32 randm32; do
  run_stage results/dr_${SPEC}/summary.json 10800 \
    python -u examples/reference_scale_run.py \
      --episodes 800 --fused --resume --world ${SPEC} \
      --eval-world hospital --alpha-max 2.0 --out results/dr_${SPEC}
  cp -f results/dr_${SPEC}/summary.json \
    artifacts/r4/dr_${SPEC}_summary.json 2>/dev/null

  run_stage results/dr_${SPEC}/rrc_eval.done 3600 \
    bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
      --checkpoint results/dr_${SPEC}/checkpoints --vec-eval \
      --world rrc --episodes 100 --out results/dr_${SPEC}/rrc_eval \
      | tee results/dr_${SPEC}/rrc_eval.log"
  cp -f results/dr_${SPEC}/rrc_eval.log \
    artifacts/r4/dr_${SPEC}_rrc_eval.log 2>/dev/null
done

# robustness + actor export of whichever arm evaluated best on hospital
BEST=$(python - <<'PYEOF'
import json, os
best, best_rate = "", -1.0
for k in ("randh32", "randm32"):
    p = f"results/dr_{k}/summary.json"
    if os.path.exists(p):
        r = json.load(open(p)).get("eval_success_rate") or 0.0
        if r > best_rate:
            best, best_rate = k, r
print(best)
PYEOF
)
if [ -n "$BEST" ]; then
  run_stage results/robustness_${BEST}/sweep.md 3600 \
    python -u tools/robustness_sweep.py \
      --checkpoint results/dr_${BEST}/checkpoints \
      --export-actor artifacts/r4/dr_${BEST}_actor.npz \
      --worlds rrc hospital --episodes 100 \
      --out results/robustness_${BEST}
  cp -f results/robustness_${BEST}/sweep.jsonl \
    artifacts/r4/robustness_${BEST}.jsonl 2>/dev/null
  cp -f results/robustness_${BEST}/sweep.md \
    artifacts/r4/robustness_${BEST}.md 2>/dev/null
fi

echo "[queue-r4j] ALL DONE $(date -u +%H:%M:%S)"
