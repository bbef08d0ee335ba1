"""MXU-headroom experiment: the d=128 GoT variant (NEXT.md round-3 #1).

The reference geometry (dim 64, heads 4, got_sac_network.py:176-185) leaves
the MXU half-empty: 65-token x 64-lane tiles pad to 128 lanes, and K=64
contractions run at half the systolic array's width. This tool measures the
SAC update and policy forward at dim 128 / dim_head 128 (non-parity, opt-in
config) against the flagship, answering "what does the hardware give back if
the model meets it halfway?" Updates/s halving would mean NO headroom (2x
flops at same rate); updates/s holding near parity means the d=64 model was
issue/padding-bound, not flops-bound.

Honest-harness rules (BENCH.md pitfalls): in-graph lax.scan chaining + host
scalar pull; never block_until_ready on the tunneled backend.

Run on a QUIET chip: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_d128.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config


def sac_updates_per_sec(cfg, bs=256, n=10):
    agent = SACAgent(cfg, dtype=jnp.bfloat16)
    state = agent.init_state(0)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    batch = {
        "obs": jax.random.uniform(ks[0], (bs, 128, 160)),
        "act": jax.random.uniform(ks[1], (bs, 2), minval=-1, maxval=1),
        "pobs": jax.random.uniform(ks[2], (bs, 2)),
        "next_pobs": jax.random.uniform(ks[3], (bs, 2)),
        "rew": jax.random.normal(ks[4], (bs, 1)),
        "next_obs": jax.random.uniform(ks[5], (bs, 128, 160)),
        "engage": jnp.zeros((bs, 1)), "done": jnp.zeros((bs, 1)),
    }

    @jax.jit
    def loop(state, batch):
        def body(s, _):
            s, m = agent._train_step_impl(s, batch)
            return s, m["qf1_loss"]
        s, losses = jax.lax.scan(body, state, None, length=n)
        return s, losses.sum()

    state, v = loop(state, batch)
    float(v)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, v = loop(state, batch)
        float(v)
        best = min(best, time.perf_counter() - t0)
    return n / best


def fwd_frames_per_sec(cfg, bs=2048, n=16):
    from dgvit_tpu.models import build_actor

    actor = build_actor(cfg, dtype=jnp.bfloat16)
    params = actor.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 160)), jnp.zeros((1, 2)))
    obs = jax.random.uniform(jax.random.PRNGKey(1), (bs, 128, 160))
    goal = jax.random.normal(jax.random.PRNGKey(2), (bs, 2)) * 0.3

    @jax.jit
    def loop(params, obs, goal):
        def body(g, _):
            mean, _ls = actor.apply(params, obs, g, inference=True)
            act = jnp.tanh(mean)
            return jnp.concatenate(
                [act[:, :1], g[:, 1:]], axis=1), mean[0, 0]
        g, outs = jax.lax.scan(body, goal, None, length=n)
        return outs.sum()

    float(loop(params, obs, goal))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, obs, goal))
        best = min(best, time.perf_counter() - t0)
    return bs * n / best


def main():
    flagship = Config()  # dim 64, heads 4, dim_head 64, mlp 2048
    d128 = Config()
    d128.model.latent_size = 128
    d128.model.dim_head = 128

    # the fused kernels are equivalence-gated at d=64 only (tests +
    # bench.py on-chip assertion); re-check numerics at d=128 before
    # trusting any timing of that geometry
    if jax.default_backend() == "tpu":
        import numpy as np

        from dgvit_tpu.models import build_actor

        a128 = build_actor(d128, dtype=jnp.bfloat16)
        p128 = a128.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, 128, 160)), jnp.zeros((1, 2)))
        o = jax.random.uniform(jax.random.PRNGKey(4), (16, 128, 160))
        g = jax.random.normal(jax.random.PRNGKey(5), (16, 2)) * 0.3
        fused = np.asarray(a128.apply(p128, o, g, inference=True)[0],
                           np.float32)
        composed = np.asarray(a128.apply(p128, o, g)[0], np.float32)
        err = float(np.abs(fused - composed).max())
        print(json.dumps({"metric": "d128 fused-vs-composed drift",
                          "value": round(err, 5), "unit": "abs"}), flush=True)
        assert err < 0.05, f"fused kernels wrong at d=128: {err}"

    rows = []
    for name, cfg in (("flagship d64", flagship), ("d128 variant", d128)):
        ups = sac_updates_per_sec(cfg)
        fps = fwd_frames_per_sec(cfg)
        rows.append((name, ups, fps))
        print(json.dumps({"metric": f"SAC updates/sec ({name})",
                          "value": round(ups, 2), "unit": "updates/s"}),
              flush=True)
        print(json.dumps({"metric": f"policy fwd frames/sec ({name})",
                          "value": round(fps, 1), "unit": "frames/s"}),
              flush=True)
    (n0, u0, f0), (n1, u1, f1) = rows
    print(json.dumps({"metric": "d128 relative cost",
                      "updates_ratio": round(u0 / u1, 3),
                      "fwd_ratio": round(f0 / f1, 3),
                      "note": "ratio < 2.0 means headroom: 4x attention flops"
                              " + 2x mlp flops cost less than their share"}),
          flush=True)


if __name__ == "__main__":
    main()
