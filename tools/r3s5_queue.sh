#!/bin/bash
# Round-3 session-5 chip queue:
#   (A) d=128 BC-only arm   — the MXU-headroom result (bench_d128: 2x model
#       is free) cashed in as policy quality; fresh d128 BC fit + evals
#   (B) d=128 gw=10 arm     — the winning generalization recipe at d128,
#       reusing A's BC warm start
#   (C) guided-hospital arm — gw=10 + RRC expert corpus trained DIRECTLY on
#       the hospital world (800-episode budget; from-scratch got 46/100)
#   (D) hospital ref-scale at 3x budget (2400 episodes from scratch, PER) —
#       the 800-ep run was still improving at the cut
# Each stage retries across tunnel drops and skips if its summary exists.
#
# Usage: bash tools/r3s5_queue.sh >> results/r3s5_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

wait_tunnel() {
  while true; do
    echo "[queue] probing tunnel $(date -u +%H:%M:%S)"
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" && return 0
    sleep 150
  done
}

run_stage() {  # marker-file timeout cmd...
  local marker=$1 tmo=$2; shift 2
  [ -f "$marker" ] && { echo "[queue] $marker exists, skip"; return 0; }
  local attempt=0
  while [ $attempt -lt 8 ]; do
    attempt=$((attempt + 1))
    wait_tunnel
    echo "[queue] ==== $* (attempt $attempt) $(date -u +%H:%M:%S) ===="
    timeout "$tmo" "$@" && touch "$marker" && return 0
    echo "[queue] stage rc=$? $(date -u +%H:%M:%S)"
    sleep 120
  done
  echo "[queue] stage GAVE UP: $*"
  return 1
}

DEMOS=results/gen_fused/base/demos

run_stage results/gen_d128/bc_only/summary.done 7200 \
  python -u examples/generalization_eval.py \
    --skip-rl --vec-eval --dim 128 --dim-head 128 \
    --demos "$DEMOS" --bc-epochs 120 --eval-episodes 50 \
    --out results/gen_d128/bc_only

run_stage results/gen_d128/gw10/summary.done 10800 \
  python -u examples/generalization_eval.py \
    --fused --vec-eval --expert-buffer --dim 128 --dim-head 128 \
    --demos "$DEMOS" --bc-params results/gen_d128/bc_only/il/bc_warm \
    --rl-episodes 300 --eval-episodes 50 \
    --alpha-init 0.05 --guidence-weight 10 \
    --out results/gen_d128/gw10

run_stage results/gen_hosp_guided/gw10/summary.done 10800 \
  python -u examples/generalization_eval.py \
    --fused --vec-eval --expert-buffer --train-world hospital \
    --demos "$DEMOS" --bc-params results/gen_fused/base/il/bc_warm \
    --rl-episodes 800 --eval-episodes 100 \
    --alpha-init 0.05 --guidence-weight 10 \
    --out results/gen_hosp_guided/gw10

# stage D is self-resuming (fused checkpoints + counters); rerun until done
run_stage results/ref_scale_hospital_2400/summary.json 14400 \
  python -u examples/reference_scale_run.py \
    --episodes 2400 --fused --resume --world hospital \
    --out results/ref_scale_hospital_2400

echo "[queue] ALL DONE $(date -u +%H:%M:%S)"
