#!/bin/bash
# Round-4 queue M (gated on queue L): DrQ-v2 random-shift A/B. The round-4
# robustness story so far: layout DR buys flat additive-fault curves but
# collapses under structural dropout; sensor-fault augmentation (queue G)
# feeds faults into COLLECTION. This arm tests the third lever — update-time
# view augmentation (sac.aug_shift, ops/augment.py): same lane-pinned rand8
# recipe as dr_rand8 / aug_rand8 with shift=4px on every sampled frame.
# Comparisons: clean transfer (vs dr_rand8 47%/37%), structural-dropout
# robustness (vs robustness_rand8 patch=0.25 -> 16%/0%), and the held-out
# procedural metrics.
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

ARM=drq_rand8
run_stage results/${ARM}/summary.json 10800 \
  python -u examples/reference_scale_run.py \
    --episodes 800 --fused --resume --world rand8 --world-assign lane \
    --eval-world hospital --alpha-max 2.0 --aug-shift 4 \
    --out results/${ARM}
cp -f results/${ARM}/summary.json \
  artifacts/r4/${ARM}_summary.json 2>/dev/null

for EW in rrc rand100 randm100; do
  run_stage results/${ARM}/${EW}_eval.done 3600 \
    bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
      --checkpoint results/${ARM}/checkpoints --vec-eval \
      --world ${EW} --episodes 100 --out results/${ARM}/${EW}_eval \
      | tee results/${ARM}/${EW}_eval.log"
  cp -f results/${ARM}/${EW}_eval.log \
    artifacts/r4/${ARM}_${EW}_eval.log 2>/dev/null
done

run_stage results/robustness_${ARM}/sweep.md 3600 \
  python -u tools/robustness_sweep.py \
    --checkpoint results/${ARM}/checkpoints \
    --export-actor artifacts/r4/${ARM}_actor.npz \
    --worlds rrc hospital --episodes 100 \
    --out results/robustness_${ARM}
cp -f results/robustness_${ARM}/sweep.jsonl \
  artifacts/r4/robustness_${ARM}.jsonl 2>/dev/null
cp -f results/robustness_${ARM}/sweep.md \
  artifacts/r4/robustness_${ARM}.md 2>/dev/null

echo "[queue-r4m] ALL DONE $(date -u +%H:%M:%S)"
