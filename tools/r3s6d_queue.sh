#!/bin/bash
# Round-3 session-6 stage D queue (after the alpha_max A/B):
#   (1) tools/bench_serve.py on a quiet chip — serving-tier BENCH rows
#   (2) gw10-long arm: the winning recipe (d=64, 100-demo corpus, gw=10,
#       alpha0=0.05) at 800 fine-tune episodes with alpha_max=2.0 —
#       does a longer guided fine-tune under the ceiling beat 78/48%?
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
. "$(dirname "$0")/queue_lib.sh"

while kill -0 "$(cat /tmp/r3s6c.pid 2>/dev/null)" 2>/dev/null; do
  echo "[queue-d] waiting for stage C $(date -u +%H:%M:%S)"; sleep 300
done

run_stage results/bench_serve.done 3600 \
  python -u tools/bench_serve.py

run_stage results/gen_gw10_long/summary.done 10800 \
  python -u examples/generalization_eval.py \
    --fused --vec-eval --expert-buffer \
    --demos results/gen_base/demos \
    --bc-params artifacts/r3/gen_fused/bc_warm \
    --rl-episodes 800 --eval-episodes 50 \
    --alpha-init 0.05 --alpha-max 2.0 --guidence-weight 10 \
    --out results/gen_gw10_long

echo "[queue-d] ALL DONE $(date -u +%H:%M:%S)"
