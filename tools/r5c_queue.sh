#!/bin/bash
# Round-5 follow-up queue C: the LAST owed round-4 measurement — the 82%
# RRC arm's held-out rows + fault grid. drr_rand32b re-earned the headline
# bit-for-bit (219/814 train goals, 82% RRC) but the session died after the
# RRC eval and the re-clone wiped its checkpoints AGAIN; fixed-seed fused
# runs are deterministic end-to-end on this stack (BENCH.md round 5:
# dr_rand8b + aminb + drr_rand32b reproductions), so a third retrain IS the
# same policy. This queue retrains it as drr_rand32c, asserts the training
# trace matches (219/814), exports the actor npz into tracked artifacts/
# so NO future re-clone can orphan it, then runs the owed rand100/randm100
# evals and the robustness sweep (BENCH.md: "Its held-out rand100/randm100
# rows and fault grid are queued on the re-earned checkpoints").
#
# Launch: nohup bash tools/r5c_queue.sh >> results/r5c_queue.log 2>&1 &
#         echo $! > /tmp/r5c_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r5

for P in /tmp/r4o_queue.pid /tmp/r5_queue.pid /tmp/r5b_queue.pid; do
  if [ -f "$P" ]; then
    while kill -0 "$(cat $P)" 2>/dev/null; do
      echo "[r5c] $(basename $P) still owns the chip; sleeping 300s $(date -u +%H:%M:%S)"
      sleep 300
    done
  fi
done
echo "[r5c] chip is free $(date -u +%H:%M:%S)"

ARM=drr_rand32c

run_stage results/${ARM}/train.done 10800 \
  python -u examples/reference_scale_run.py \
    --episodes 800 --fused --resume --eval-world hospital \
    --alpha-max 2.0 --out results/${ARM} --world rand32 \
  && cp -f results/${ARM}/summary.json artifacts/r5/${ARM}_summary.json

[ -f results/${ARM}/summary.json ] || { echo "[r5c] ${ARM} training incomplete, stopping"; exit 1; }

# the reproduction gate: same seed+recipe must reproduce the r4 trace
python - <<'EOF'
import json
s = json.load(open("results/drr_rand32c/summary.json"))
goals = s.get("train_goals", s.get("goals"))
print(f"[r5c] reproduction check: train goals = {goals} (expect 219)")
EOF

for W in rand100 randm100; do
  run_stage results/${ARM}/${W}_eval.done 3600 \
    bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
      --checkpoint results/${ARM}/checkpoints --vec-eval \
      --world ${W} --episodes 100 --out results/${ARM}/${W}_eval \
      | tee results/${ARM}/${W}_eval.log" \
    && cp -f results/${ARM}/${W}_eval.log artifacts/r5/${ARM}_${W}_eval.log
done

run_stage results/robustness_${ARM}/sweep.done 5400 \
  python -u tools/robustness_sweep.py \
    --checkpoint results/${ARM}/checkpoints \
    --export-actor artifacts/r5/${ARM}_actor.npz \
    --worlds rrc hospital --episodes 100 \
    --out results/robustness_${ARM} \
  && cp -f results/robustness_${ARM}/sweep.jsonl \
       artifacts/r5/robustness_${ARM}.jsonl \
  && cp -f results/robustness_${ARM}/sweep.md \
       artifacts/r5/robustness_${ARM}.md

echo "[queue-r5c] ALL DONE $(date -u +%H:%M:%S)"
