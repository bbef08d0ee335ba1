#!/bin/bash
# Round-4 queue E (gated on queue D): does domain randomization buy
# ROBUSTNESS as well as transfer?
#   A. robustness sweep of the rand8-trained policy (checkpoint-loaded) on
#      rrc + hospital — BOTH unseen; compare against the specialist's
#      cliffs and the gw10 generalist's flat curves (BENCH round 4), and
#      export its actor npz into artifacts for future rounds.
#   B. same sweep for the best ensemble-size arm from queue D (rand16 or
#      rand32), once its checkpoints exist.
# Launch: nohup bash tools/r4e_queue.sh >> results/r4e_queue.log 2>&1 &
#         echo $! > /tmp/r4e_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

# gate: wait for queue D to release the chip
if [ -f /tmp/r4d_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4d_queue.pid)" 2>/dev/null; do
    echo "[queue-r4e] waiting on r4d ($(date -u +%H:%M:%S))"
    sleep 120
  done
fi

run_stage results/robustness_rand8/sweep.md 3600 \
  python -u tools/robustness_sweep.py \
    --checkpoint results/dr_rand8/checkpoints \
    --export-actor artifacts/r4/dr_rand8_actor.npz \
    --worlds rrc hospital --episodes 100 --out results/robustness_rand8
cp -f results/robustness_rand8/sweep.jsonl \
  artifacts/r4/robustness_rand8.jsonl 2>/dev/null
cp -f results/robustness_rand8/sweep.md \
  artifacts/r4/robustness_rand8.md 2>/dev/null

# B: pick whichever of rand16/rand32 evaluated best on hospital (queue D
# summaries); skip silently if neither finished.
BEST=$(python - <<'EOF'
import json, os
best, best_rate = "", -1.0
for k in (16, 32):
    p = f"results/dr_rand{k}/summary.json"
    if os.path.exists(p):
        r = json.load(open(p)).get("eval_success_rate") or 0.0
        if r > best_rate:
            best, best_rate = f"rand{k}", r
print(best)
EOF
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

echo "[queue-r4e] ALL DONE $(date -u +%H:%M:%S)"
