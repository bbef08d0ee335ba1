"""Serving-tier benchmark: single-client RTT vs micro-batched throughput.

On a remote-attached accelerator the per-dispatch RTT (~46 ms through this
tunnel, BENCH.md) dominates single-frame actions; the batching server's win
is coalescing N concurrent clients into one dispatch. This measures, on the
real chip:

  (a) sequential single-frame actions/s (the reference's per-robot
      choose_action pattern, main.py:369)
  (b) BatchingActorServer actions/s with N concurrent clients x M requests
      each, for the live fused-path actor AND the exported StableHLO
      artifact (serve/export.py)

Timing is wall-clock from first submit to last future resolved; every
result materializes as numpy on the host (a real device->host pull — the
honest sync on this tunnel, where block_until_ready acknowledges early).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serve.py
"""

import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.config import Config
from dgvit_tpu.models import build_actor
from dgvit_tpu.serve import (BatchingActorServer, export_actor, load_actor,
                             make_action_fn)

N_CLIENTS = 64
REQS_EACH = 8


def run_clients(srv, frames, goals):
    outs = [None] * N_CLIENTS
    barrier = threading.Barrier(N_CLIENTS + 1)

    def client(i):
        barrier.wait()
        acc = []
        for r in range(REQS_EACH):
            acc.append(srv.act(frames[i], goals[i], timeout=120))
        outs[i] = np.stack(acc)

    ts = [threading.Thread(target=client, args=(i,)) for i in range(N_CLIENTS)]
    for t in ts:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in ts:
        t.join()
    dt = time.perf_counter() - t0
    return outs, dt


def main():
    cfg = Config()
    actor = build_actor(cfg, dtype=jnp.bfloat16)
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 160)),
                        jnp.zeros((1, 2)))["params"]
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (N_CLIENTS, 128, 160)).astype(np.float32)
    goals = rng.normal(0, 0.3, (N_CLIENTS, 2)).astype(np.float32)

    # (a) sequential single-frame RTT (reference pattern). inference=True +
    # bf16 + attn_impl='auto' routes through the fused megakernel on TPU
    # (make_action_fn defaults trace the portable XLA export path instead)
    live = jax.jit(make_action_fn(cfg, params, attn_impl="auto",
                                  dtype=jnp.bfloat16, inference=True))
    np.asarray(live(frames[:1], goals[:1]))  # warm
    t0 = time.perf_counter()
    n_seq = 20
    for i in range(n_seq):
        np.asarray(live(frames[i % N_CLIENTS][None],
                        goals[i % N_CLIENTS][None]))
    seq_dt = time.perf_counter() - t0
    print(json.dumps({"metric": "sequential single-frame actions/s",
                      "value": round(n_seq / seq_dt, 1),
                      "unit": "actions/s",
                      "p50_ms": round(seq_dt / n_seq * 1e3, 2)}), flush=True)

    # (b) batching server over the live fused-path actor
    for label, fn in (
        ("live fused actor", live),
        ("exported artifact",
         load_actor(export_actor(cfg, params, platforms=["tpu"]))),
    ):
        with BatchingActorServer(fn, max_wait_ms=4.0,
                                 buckets=(1, 8, 16, 32, 64)) as srv:
            srv.act(frames[0], goals[0])  # warm bucket 1
            for b in (8, 16, 32, 64):     # warm the bucket grid
                np.asarray(fn(frames[:b], goals[:b]))
            outs, dt = run_clients(srv, frames, goals)
            st = srv.stats()
        total = N_CLIENTS * REQS_EACH
        # every client's every answer must match its own frame's action
        ref = np.asarray(fn(frames, goals), np.float32)
        for i, o in enumerate(outs):
            assert np.abs(np.asarray(o, np.float32) - ref[i]).max() < 1e-2
        print(json.dumps({"metric": f"batched serving actions/s ({label})",
                          "value": round(total / dt, 1),
                          "unit": "actions/s",
                          "clients": N_CLIENTS,
                          "mean_batch": round(st["mean_batch"], 1),
                          "dispatches": st["dispatches"],
                          "eff_latency_ms": round(dt / REQS_EACH * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
