#!/bin/bash
# Round-4 endgame: held-out PROCEDURAL evals of the two flagship
# reference-recipe policies (pure evals, ~4 min each on chip) so the
# round-4 arms matrix (tools/r4_report.py) compares DR/augmentation arms
# against the recipes that anchor the round-3 story:
#   * gw10 generalist  — BC warm start + gw=10 guided fine-tune
#     (artifacts/r3/gen_fused/gw10_winner_actor.npz; 78% RRC / 48% hosp)
#   * RRC specialist   — 800-ep from-scratch PER on RRC
#     (artifacts/r3/ref_scale_800ep_actor.npz; 100% RRC / 0% hosp)
# rand100 = 100 never-seen RRC-sized layouts, randm100 = mixed-scale; the
# eval derives a disjoint world-seed stream by default (evaluate.py).
# Run AFTER the training queues are stopped (chip contention skews evals):
#   bash tools/r4n_heldout_flagships.sh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

mkdir -p results artifacts/r4

for ARM in gw10:artifacts/r3/gen_fused/gw10_winner_actor.npz \
           spec:artifacts/r3/ref_scale_800ep_actor.npz; do
  NAME=${ARM%%:*}; NPZ=${ARM#*:}
  for EW in rand100 randm100; do
    run_stage results/flag_${NAME}/${EW}_eval.done 1800 \
      bash -c "set -o pipefail; python -u -m dgvit_tpu.train.evaluate \
        --actor ${NPZ} --vec-eval --world ${EW} --episodes 100 \
        --out results/flag_${NAME}/${EW}_eval \
        | tee results/flag_${NAME}/${EW}_eval.log"
    cp -f results/flag_${NAME}/${EW}_eval.log \
      artifacts/r4/flag_${NAME}_${EW}_eval.log 2>/dev/null
  done
done

echo "[r4n] ALL DONE $(date -u +%H:%M:%S)"
