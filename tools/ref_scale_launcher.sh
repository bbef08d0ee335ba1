#!/bin/bash
# Resilient launcher for the reference-scale 800-episode run (VERDICT r2 #8).
#
# The axon TPU tunnel drops occasionally (observed: "Unable to initialize
# backend 'axon': UNAVAILABLE" killing a fresh run at startup). This wrapper
# (a) waits for the tunnel with a cheap matmul probe, (b) launches
# examples/reference_scale_run.py with --resume, and (c) on crash, re-probes
# and relaunches.
#
# Two modes:
#   MODE=fused (default): the fully-fused on-device trainer — train_fused's
#     built-in resume recovers the episode budget from its own JSONL, so the
#     launcher just re-passes the full target every attempt.
#   MODE=host: the per-step host loop (reference main.py pattern; ~5 env
#     steps/s over the tunnel). train_rl's episode counter restarts on
#     resume, so the budget is externally accounted from the JSONL here.
#
# Usage: [MODE=fused] bash tools/ref_scale_launcher.sh [target_episodes] \
#          >> results/ref_scale.log 2>&1
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
TARGET=${1:-800}
MODE=${MODE:-fused}
JSONL=results/ref_scale/train_gtrl_ref_scale_per.jsonl
ATTEMPT=0

while true; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "[launcher] attempt $ATTEMPT ($MODE): probing TPU tunnel $(date -u +%H:%M:%S)"
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
print('tpu ok:', jax.devices())
"; then
    if [ "$MODE" = fused ]; then
      echo "[launcher] tunnel up; fused run to $TARGET episodes (self-resuming)"
      python examples/reference_scale_run.py --episodes "$TARGET" --fused --resume
      rc=$?
    else
      done_eps=0
      [ -f "$JSONL" ] && done_eps=$(wc -l < "$JSONL")
      remaining=$((TARGET - done_eps))
      [ $remaining -lt 1 ] && remaining=1   # <=1 extra episode, then eval runs
      echo "[launcher] tunnel up; $done_eps episodes done, running $remaining more"
      python examples/reference_scale_run.py --episodes "$remaining" --resume
      rc=$?
    fi
    echo "[launcher] run exited rc=$rc at $(date -u +%H:%M:%S)"
    [ $rc -eq 0 ] && exit 0
  else
    echo "[launcher] tunnel down; sleeping 180s"
  fi
  sleep 180
done
