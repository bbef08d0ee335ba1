#!/bin/bash
# Round-5 CPU corpus queue — the demo-recording stages split OUT of the
# serial r5 queue so the chip never idles behind them (this host has ONE
# core; the original r5_queue.sh ran these three stages before any chip
# work). Runs concurrently with tools/r5chip_queue.sh, which gates its
# demo-consuming stages on this queue's .done markers.
#
# Launch: nohup bash tools/r5cpu_queue.sh >> results/r5cpu_queue.log 2>&1 &
#         echo $! > /tmp/r5cpu_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

mkdir -p results artifacts/r5

cpu_stage() {  # marker timeout cmd...  (no tunnel probe — CPU-only work)
  local marker=$1 tmo=$2; shift 2
  [ -f "$marker" ] && { echo "[r5cpu] $marker exists, skip"; return 0; }
  echo "[r5cpu] ==== $* $(date -u +%H:%M:%S) ===="
  timeout "$tmo" "$@" && touch "$marker" && return 0
  echo "[r5cpu] stage rc=$? $(date -u +%H:%M:%S)"
  return 1
}

# the scripted-pilot corpus first (cheapest; unblocks the gw10 seed
# replicates), then the two teacher corpora
cpu_stage results/gen_base/demos.done 3600 \
  python -u tools/record_gen_demos.py --out results/gen_base/demos

cpu_stage results/distill/demos.done 7200 \
  python -u tools/record_teacher_demos.py --platform cpu \
    --actor artifacts/r3/gen_fused/gw10_winner_actor.npz \
    --world rand8 --episodes 400 --max-steps 200 \
    --out results/distill/demos

cpu_stage results/distill_m32/demos.done 7200 \
  python -u tools/record_teacher_demos.py --platform cpu \
    --actor artifacts/r3/gen_fused/gw10_winner_actor.npz \
    --world randm32 --episodes 400 --max-steps 400 \
    --out results/distill_m32/demos

touch results/r5cpu.alldone
echo "[queue-r5cpu] ALL DONE $(date -u +%H:%M:%S)"
