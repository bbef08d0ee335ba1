#!/bin/bash
# Launcher for the guidance-weight DECAY recipe arm (VERDICT r2 #7: "gw
# decayed over episodes, jointly with alpha0"): anchor-early (gw=10) /
# specialize-late (gw->1) curriculum, 300 episodes, reusing the round-2 BC
# warm start and demos. Waits for the TPU tunnel like ref_scale_launcher.
#
# Usage: bash tools/gen_decay_launcher.sh >> results/gen_gwdecay.log 2>&1
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while true; do
  echo "[launcher] probing TPU tunnel $(date -u +%H:%M:%S)"
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
print('tpu ok')
"; then
    echo "[launcher] tunnel up; starting decay arm"
    timeout 14000 python -u examples/generalization_eval.py \
      --rl-episodes 300 --alpha-init 0.05 \
      --guidence-weight 10 --gw-final 1 --gw-decay-steps 40000 \
      --expert-buffer --demos results/gen_r2b/demos \
      --bc-params results/gen_r2b/il/bc_warm \
      --out results/gen_gwdecay
    rc=$?
    echo "[launcher] run exited rc=$rc at $(date -u +%H:%M:%S)"
    [ $rc -eq 0 ] && exit 0
    echo "[launcher] non-zero exit; re-probing in 180s"
  else
    echo "[launcher] tunnel down; sleeping 180s"
  fi
  sleep 180
done
