#!/bin/bash
# Fused-loop generalization-recipe sweep (VERDICT r2 #7: find a recipe that
# beats BC on BOTH worlds). Stages demos + the BC warm start ONCE, then runs
# the fine-tune arms through the fully-fused on-device trainer with the demo
# corpus HBM-staged for expert guidance; evals are single-dispatch vec-eval
# (50 episodes/world to halve the +-9% noise band of the old 30-ep evals).
#
# Waits for the r3_queue to release the chip (marker line in its log), then
# for the tunnel, like the other launchers.
#
# Usage: bash tools/gen_sweep_fused.sh >> results/gen_sweep.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
EPISODES=${EPISODES:-300}
EVAL_EPS=${EVAL_EPS:-50}
OUTROOT=results/gen_fused

if [ "${WAIT_QUEUE:-1}" = 1 ]; then
  while ! grep -q "ALL DONE" results/r3_queue.log 2>/dev/null; do
    echo "[sweep] r3_queue still owns the chip; sleeping 300s $(date -u +%H:%M:%S)"
    sleep 300
  done
fi

wait_tunnel() {
  while true; do
    echo "[sweep] probing tunnel $(date -u +%H:%M:%S)"
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" && return 0
    sleep 150
  done
}

# ---- stage demos + BC warm start once ----------------------------------
if [ ! -f "$OUTROOT/base/il/bc_warm_actor.npz" ]; then
  wait_tunnel
  echo "[sweep] base stage (demos + BC) $(date -u +%H:%M:%S)"
  timeout 7200 python -u examples/generalization_eval.py \
    --bc-episodes 100 --bc-epochs 120 --skip-rl --vec-eval \
    --eval-episodes "$EVAL_EPS" --out "$OUTROOT/base" || exit 1
fi
DEMOS="$OUTROOT/base/demos"
BCP="$OUTROOT/base/il/bc_warm"

run_arm() {  # name extra-args...
  local name=$1; shift
  [ -f "$OUTROOT/$name/summary.done" ] && { echo "[sweep] $name done, skip"; return 0; }
  wait_tunnel
  echo "[sweep] ==== arm $name $(date -u +%H:%M:%S) ===="
  timeout 10800 python -u examples/generalization_eval.py \
    --fused --vec-eval --expert-buffer \
    --demos "$DEMOS" --bc-params "$BCP" \
    --rl-episodes "$EPISODES" --eval-episodes "$EVAL_EPS" \
    --alpha-init 0.05 "$@" --out "$OUTROOT/$name" \
    && touch "$OUTROOT/$name/summary.done"
  echo "[sweep] ==== arm $name rc=$? $(date -u +%H:%M:%S) ===="
}

run_arm gw10        --guidence-weight 10
run_arm gw7         --guidence-weight 7
run_arm gw10_decay  --guidence-weight 10 --gw-final 1 --gw-decay-steps 100000
run_arm gw5         --guidence-weight 5
echo "[sweep] ALL ARMS DONE $(date -u +%H:%M:%S)"
