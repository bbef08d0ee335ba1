"""A/B microbench: whole-trunk backward kernel vs per-block custom-vjp path.

Times ONE gradient-bearing actor trunk pass (fwd + bwd) at batch 256 with
the honest harness (N iterations chained inside one jitted lax.scan with a
parameter data dependency; completion forced by a host scalar pull —
BENCH.md pitfalls). Sweeps DGVIT_TRUNK_TB / DGVIT_TRUNK_MLP_CHUNK.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_trunk_ab.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from dgvit_tpu.config import Config
from dgvit_tpu.models import build_actor

N = 20
BS = 256


def measure(tag):
    cfg = Config()
    actor = build_actor(cfg, dtype=jnp.bfloat16)
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 160)),
                        jnp.zeros((1, 2)))
    obs = jax.random.uniform(jax.random.PRNGKey(1), (BS, 128, 160))
    goal = jax.random.normal(jax.random.PRNGKey(2), (BS, 2)) * 0.3

    def loss(p):
        m, ls = actor.apply(p, obs, goal)
        return jnp.sum(m.astype(jnp.float32) ** 2) * 1e-6

    @jax.jit
    def loop(p):
        def body(p, _):
            g = jax.grad(loss)(p)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-12 * b, p, g)
            return p, ()
        p, _ = jax.lax.scan(body, p, None, length=N)
        return jax.tree_util.tree_leaves(p)[0].reshape(-1)[0]

    float(loop(params))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params))
        best = min(best, time.perf_counter() - t0)
    dt = best / N
    print(json.dumps({"config": tag, "fwd+bwd ms": round(dt * 1e3, 3),
                      "grad steps/s": round(1 / dt, 1)}), flush=True)


if __name__ == "__main__":
    measure("per-block (default routing)")
    os.environ["DGVIT_TRUNK_GRAD"] = "1"
    for tb in (8, 16, 32):
        for chunk in (256, 512):
            os.environ["DGVIT_TRUNK_TB"] = str(tb)
            os.environ["DGVIT_TRUNK_MLP_CHUNK"] = str(chunk)
            try:
                measure(f"trunk tb={tb} chunk={chunk}")
            except Exception as e:
                print(json.dumps({"config": f"trunk tb={tb} chunk={chunk}",
                                  "error": repr(e)[:160]}), flush=True)
    os.environ.pop("DGVIT_TRUNK_TB", None)
    os.environ.pop("DGVIT_TRUNK_MLP_CHUNK", None)
    os.environ.pop("DGVIT_TRUNK_GRAD", None)
