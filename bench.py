"""Benchmark harness — batched GoT policy forward throughput on one chip.

Headline metric (BASELINE.json north star): batched depth-frames/sec/chip for
the flagship GoT actor (dim 64, 4 blocks, 4 heads, 65 tokens — config.yaml:
58-63, GoalFormer.py:123-171). Target: >= 10,000 frames/s on TPU v5e.

Measurement notes:
  * N_INNER forward passes run inside ONE jitted lax.scan with a data
    dependency (the action output feeds the next goal token), so per-dispatch
    tunnel/driver latency amortizes away and on-device time dominates.
  * completion is forced by pulling a scalar to the host (robust even where
    block_until_ready is unreliable on tunneled backends).
  * bf16 compute / fp32 params — the production inference configuration;
    fp32 parity is enforced separately in tests/test_parity_torch.py.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

BASELINE_FRAMES_PER_SEC = 10_000.0  # BASELINE.md north-star target
BATCH = 2048
N_INNER = 32
N_REPEATS = 5  # every timed row: median + [min,max] band over N repeats


def _time_repeats(fn, repeats: int = N_REPEATS):
    """Run fn() `repeats` times (fn must force completion itself) and return
    the sorted wall-times. Variance-honest protocol (VERDICT r3 weak #2):
    headlines quote the MEDIAN with a min/max band, never the best run —
    ambient chip/tunnel variance moved the preprocessing headline 54.8k ->
    67.7k across rounds when best-of-3 was the estimator."""
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)


def _row(metric: str, work: float, ts, unit: str, digits: int = 1, **extra):
    """Emit one JSON bench row: value = work/median_time, band = value at
    the slowest/fastest repeat."""
    med = ts[len(ts) // 2]
    row = {"metric": metric, "value": round(work / med, digits),
           "unit": unit,
           "band": [round(work / ts[-1], digits), round(work / ts[0], digits)],
           "n_repeats": len(ts)}
    row.update(extra)
    print(json.dumps(row), flush=True)
    return row


def _bench_extra():
    """--all mode: the remaining BASELINE.json configs (2) preprocessing
    batch, (4) critic+target update, (5) end-to-end train loop. Each prints
    its own JSON line; the headline stays the last line."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgvit_tpu.agents import SACAgent
    from dgvit_tpu.config import Config
    from dgvit_tpu.ops.pallas_preprocess import preprocess_depth_pallas

    # (2) noise-augmented preprocessing batch — n_inner chained in ONE
    # dispatch so tunnel RTT amortizes (see headline methodology)
    b, n_in = 256, 8
    raw = jax.random.uniform(jax.random.PRNGKey(0), (b, 512, 640), jnp.float32,
                             0.3, 8.0)

    @jax.jit
    def pp_loop(raw):
        # serialize iterations through the SEED (int32 scalar derived from
        # the previous output) — the earlier `raw + carry` form added a full
        # read+write of the 335 MB raw batch per iteration, and that HBM
        # traffic dominated the measurement
        def body(carry, i):
            out = preprocess_depth_pallas(raw, i + carry)
            return (out[0, 0, 0] * 0.0).astype(jnp.int32), ()
        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_in))
        return c

    float(pp_loop(raw))
    _row("preprocessing frames/sec/chip", b * n_in,
         _time_repeats(lambda: float(pp_loop(raw))), "frames/s")

    # Pallas PRNG noise-statistics ASSERTION (hardware-only correctness —
    # pltpu.prng_* has no CPU lowering, so tests/test_pallas_preprocess.py
    # skips these off-TPU; every bench run checks them on the real chip)
    if jax.default_backend() == "tpu":
        from dgvit_tpu.ops.preprocess import preprocess_depth

        small = raw[:8]
        out = np.asarray(preprocess_depth_pallas(small, jnp.int32(7),
                                                 noise_level=50.0))
        ref = np.asarray(preprocess_depth(small, jax.random.PRNGKey(7),
                                          noise_level=50.0))
        assert out.min() >= 0.0 and out.max() <= 1.0, "noise output range"
        assert abs(float(out.mean()) - float(ref.mean())) < 0.01, \
            f"noise mean drift: {out.mean():.4f} vs {ref.mean():.4f}"
        assert abs(float(out.std()) - float(ref.std())) < 0.01, \
            f"noise std drift: {out.std():.4f} vs {ref.std():.4f}"
        again = np.asarray(preprocess_depth_pallas(small, jnp.int32(7),
                                                   noise_level=50.0))
        assert np.array_equal(out, again), "seeded noise not deterministic"
        print(json.dumps({"metric": "pallas PRNG noise stats (on-chip)",
                          "value": 1, "unit": "pass"}))

    # megakernel vs per-block fused path equivalence ON-CHIP (the CPU tier
    # only covers interpret mode — tests/test_megakernel.py)
    if jax.default_backend() == "tpu":
        from dgvit_tpu.models import build_actor

        mcfg = Config()
        mactor = build_actor(mcfg, dtype=jnp.bfloat16)
        mparams = mactor.init(jax.random.PRNGKey(3),
                              jnp.zeros((1, 128, 160)), jnp.zeros((1, 2)))
        mobs = jax.random.uniform(jax.random.PRNGKey(4), (16, 128, 160))
        mgoal = jax.random.normal(jax.random.PRNGKey(5), (16, 2)) * 0.3
        a = np.asarray(mactor.apply(mparams, mobs, mgoal)[0], np.float32)
        m = np.asarray(mactor.apply(mparams, mobs, mgoal,
                                    inference=True)[0], np.float32)
        err = float(np.abs(a - m).max())
        assert err < 0.05, f"megakernel drift vs per-block path: {err}"
        print(json.dumps({"metric": "megakernel equivalence (on-chip)",
                          "value": 1, "unit": "pass"}))

    # cls_final_block backward on-chip gradient equivalence vs the XLA twin
    # (runs in every TPU training step via Transformer(cls_final=True); CPU
    # tests only cover interpret mode)
    if jax.default_backend() == "tpu":
        from dgvit_tpu.ops.cls_block import _cls_block_xla, cls_final_block
        from dgvit_tpu.ops.fused_transformer import _block_params_flat

        kd, d, hds, dh, mlp = jax.random.PRNGKey(11), 64, 4, 64, 256
        inner = hds * dh
        kk = jax.random.split(kd, 12)
        tree = {
            "attn_norm": {"scale": 1 + 0.1 * jax.random.normal(kk[0], (d,)),
                          "bias": 0.1 * jax.random.normal(kk[1], (d,))},
            "attn": {"to_qkv": {"kernel": jax.random.normal(kk[2], (d, 3 * inner)) * 0.05},
                     "to_out": {"kernel": jax.random.normal(kk[3], (inner, d)) * 0.05,
                                "bias": 0.02 * jax.random.normal(kk[4], (d,))}},
            "ff_norm": {"scale": 1 + 0.1 * jax.random.normal(kk[5], (d,)),
                        "bias": 0.1 * jax.random.normal(kk[6], (d,))},
            "ff": {"fc1": {"kernel": jax.random.normal(kk[7], (d, mlp)) * 0.05,
                           "bias": 0.02 * jax.random.normal(kk[8], (mlp,))},
                   "fc2": {"kernel": jax.random.normal(kk[9], (mlp, d)) * 0.05,
                           "bias": 0.02 * jax.random.normal(kk[10], (d,))}},
        }
        flat = _block_params_flat(tree, jnp.float32)
        xg = jax.random.normal(kk[11], (8, 65, d)) * 0.5

        gk = jax.jit(jax.grad(lambda x, f: jnp.sum(
            jnp.sin(cls_final_block(x, f, hds, dh))), argnums=(0, 1)))
        gx = jax.jit(jax.grad(lambda x, f: jnp.sum(
            jnp.sin(_cls_block_xla(x, f, heads=hds, dim_head=dh))),
            argnums=(0, 1)))
        (dx_k, df_k), (dx_x, df_x) = gk(xg, flat), gx(xg, flat)
        derr = float(jnp.abs(dx_k - dx_x).max())
        for gk_, gx_ in zip(df_k, df_x):
            derr = max(derr, float(jnp.abs(gk_ - gx_).max())
                       / max(1.0, float(jnp.abs(gx_).max())))
        assert derr < 5e-2, f"cls_final_block grad drift on-chip: {derr}"
        print(json.dumps({"metric": "cls_final_block grad equivalence (on-chip)",
                          "value": 1, "unit": "pass"}))

    # exported deployment artifact executes ON-CHIP and matches the live
    # actor (serve/export.py traces the XLA path; the tpu lowering of the
    # serialized StableHLO must agree with the fused-path apply to bf16
    # matmul tolerance). CPU tests cover roundtrip/semantics; this gates
    # the artifact on real hardware every round.
    if jax.default_backend() == "tpu":
        from dgvit_tpu.models import build_actor as _ba
        from dgvit_tpu.serve import export_actor, load_actor

        scfg = Config()
        sactor = _ba(scfg)
        sparams = sactor.init(jax.random.PRNGKey(21),
                              jnp.zeros((1, 128, 160)),
                              jnp.zeros((1, 2)))["params"]
        art = load_actor(export_actor(scfg, sparams, platforms=["tpu"]))
        sobs = jax.random.uniform(jax.random.PRNGKey(22), (8, 128, 160))
        sgoal = jax.random.normal(jax.random.PRNGKey(23), (8, 2)) * 0.3
        a_art = np.asarray(art(sobs, sgoal), np.float32)
        a_live = np.tanh(np.asarray(
            sactor.apply({"params": sparams}, sobs, sgoal)[0], np.float32))
        serr = float(np.abs(a_art - a_live).max())
        assert serr < 0.05, f"exported artifact drift on-chip: {serr}"
        print(json.dumps({"metric": "serve artifact equivalence (on-chip)",
                          "value": 1, "unit": "pass"}))

    # (4)+(5) fused SAC update throughput (replay batch resident on device)
    cfg = Config()
    agent = SACAgent(cfg, dtype=jnp.bfloat16)
    state = agent.init_state(0)
    bs = 256
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
    n = 10

    @jax.jit
    def sac_loop(state, batch):
        def body(s, _):
            s, m = agent._train_step_impl(s, batch)
            return s, m["qf1_loss"]
        s, losses = jax.lax.scan(body, state, None, length=n)
        return s, losses.sum()

    _s0, _v0 = sac_loop(state, batch)  # compile + warm
    float(_v0)
    sac_holder = {"s": _s0}

    def run_sac():
        sac_holder["s"], v = sac_loop(sac_holder["s"], batch)
        float(v)

    ts_sac = _time_repeats(run_sac)
    dt = ts_sac[len(ts_sac) // 2] / n
    _row("fused SAC updates/sec (batch 256)", n, ts_sac, "updates/s",
         digits=2)
    _row("SAC train throughput", n * bs, ts_sac, "transitions/s")

    # shard_map DP wrapper overhead at data=1: the fused path composed with
    # the mesh (parallel.shardmap_learn) must cost ~nothing on one chip —
    # the multi-chip scaling story is free only if this ratio stays ~1.0
    from dgvit_tpu.core.mesh import MeshRuntime
    from dgvit_tpu.parallel import shardmap_learn

    rt1 = MeshRuntime.create(data=1, devices=jax.devices()[:1])
    agent_sm = SACAgent(cfg, dtype=jnp.bfloat16, grad_axis="data")
    state_sm = agent_sm.init_state(0)
    sm_step = shardmap_learn(agent_sm, rt1, flavor="plain", raw=True)

    @jax.jit
    def sm_loop(state, batch):  # identical scan harness to sac_loop
        def body(s, _):
            s, m = sm_step(s, batch)
            return s, m["qf1_loss"]
        s, losses = jax.lax.scan(body, state, None, length=n)
        return s, losses.sum()

    _s0, _v0 = sm_loop(state_sm, batch)  # compile + warm
    float(_v0)
    sm_holder = {"s": _s0}

    def run_sm():
        sm_holder["s"], v = sm_loop(sm_holder["s"], batch)
        float(v)

    ts_sm = _time_repeats(run_sm)
    dt_sm = ts_sm[len(ts_sm) // 2] / n
    _row("shard_map(data=1) SAC updates/sec", n, ts_sm, "updates/s",
         digits=2,
         # median-over-median ratio plus its own band: the overhead claim
         # (README/BENCH) must quote this interval, not one lucky pairing
         overhead_vs_unsharded=round(dt_sm / dt, 3),
         overhead_band=[round(ts_sm[0] / ts_sac[-1], 3),
                        round(ts_sm[-1] / ts_sac[0], 3)])

    # critic_latent_reuse opt-in (PARITY.md round 3): actor loss reuses the
    # critic update's trunk latent (pre-update params) — one fewer GoT trunk
    # forward per update; same scan harness as the parity row above
    cfg_lr = Config()
    cfg_lr.sac.critic_latent_reuse = True
    agent_lr = SACAgent(cfg_lr, dtype=jnp.bfloat16)
    state_lr = agent_lr.init_state(0)

    @jax.jit
    def lr_loop(state, batch):
        def body(s, _):
            s, m = agent_lr._train_step_impl(s, batch)
            return s, m["qf1_loss"]
        s, losses = jax.lax.scan(body, state, None, length=n)
        return s, losses.sum()

    _s0, _v0 = lr_loop(state_lr, batch)  # compile + warm
    float(_v0)
    lr_holder = {"s": _s0}

    def run_lr():
        lr_holder["s"], v = lr_loop(lr_holder["s"], batch)
        float(v)

    ts_lr = _time_repeats(run_lr)
    dt_lr = ts_lr[len(ts_lr) // 2] / n
    _row("SAC updates/sec (critic_latent_reuse)", n, ts_lr, "updates/s",
         digits=2, speedup_vs_parity=round(dt / dt_lr, 3))

    # BC epoch throughput (device-resident dataset: corpus moves to HBM once,
    # epochs gather shuffled batches on-device — agents/bc.py)
    from dgvit_tpu.agents.bc import BCTrainer
    from dgvit_tpu.models.policies import GoTPolicy

    rng_np = np.random.default_rng(0)
    n_demo = 2560
    obs_np = rng_np.random((n_demo, 128, 160), np.float32)
    goal_np = rng_np.random((n_demo, 2), np.float32)
    act_np = rng_np.random((n_demo, 2), np.float32).astype(np.float32)
    trbc = BCTrainer(model=GoTPolicy(emb_dropout=0.0), batch_size=64, seed=0)
    trbc.fit(obs_np, goal_np, act_np, epochs=1, to_chw=False)  # compile
    ts_bc = _time_repeats(
        lambda: trbc.fit(obs_np, goal_np, act_np, epochs=5, to_chw=False),
        repeats=3)
    print(json.dumps({"metric": "BC epoch (2560 transitions, batch 64)",
                      "value": round(ts_bc[len(ts_bc) // 2] / 5, 3),
                      "unit": "s/epoch",
                      "band": [round(ts_bc[0] / 5, 3),
                               round(ts_bc[-1] / 5, 3)],
                      "n_repeats": len(ts_bc)}))

    # p50 single-frame action latency. Two numbers:
    #  * on-device: N chained single-frame forwards inside ONE jitted scan
    #    (each iteration's goal input depends on the previous action, so
    #    iterations serialize exactly like a control loop) — this is the
    #    per-step latency a robot control loop pays on the chip itself
    #  * end-to-end: includes the tunneled backend's dispatch RTT on this
    #    machine (not a device property)
    n_lat = 256
    actor = agent.actor

    @jax.jit
    def lat_loop(params, obs1, goal1):
        def body(g, _):
            mean, _ls = actor.apply({"params": params}, obs1[None], g[None],
                                    inference=True)
            a = jnp.tanh(mean.astype(jnp.float32))[0]
            return a, ()
        g, _ = jax.lax.scan(body, goal1, None, length=n_lat)
        return g

    obs1 = jnp.zeros((128, 160))
    goal1 = jnp.zeros((2,))
    sac_state = sac_holder["s"]
    g = lat_loop(sac_state.actor_params, obs1, goal1)
    float(g.sum())
    ts_lat = _time_repeats(
        lambda: float(lat_loop(sac_state.actor_params, obs1, goal1).sum()))
    print(json.dumps({"metric": "on-device single-frame action latency",
                      "value": round(ts_lat[len(ts_lat) // 2] / n_lat * 1e3,
                                     3),
                      "unit": "ms",
                      "band": [round(ts_lat[0] / n_lat * 1e3, 3),
                               round(ts_lat[-1] / n_lat * 1e3, 3)],
                      "n_repeats": len(ts_lat)}))

    key = jax.random.PRNGKey(2)
    a = agent.choose_action(state, obs1, goal1, key, evaluate=True)
    np.asarray(a)
    lats = []
    for _ in range(21):
        t0 = time.perf_counter()
        np.asarray(agent.choose_action(state, obs1, goal1, key, evaluate=True))
        lats.append(time.perf_counter() - t0)
    lats.sort()
    print(json.dumps({"metric": "p50 single-frame action latency (tunnel RTT)",
                      "value": round(lats[len(lats) // 2] * 1e3, 3),
                      "unit": "ms",
                      "band": [round(lats[0] * 1e3, 3),
                               round(lats[-1] * 1e3, 3)],
                      "n_repeats": len(lats)}))

    # serving throughput: concurrent single-frame clients coalescing through
    # the micro-batching server (the fleet/deployment dispatch shape).
    # tools/bench_serve.py is the full campaign; this row keeps one serving
    # number in every round's driver-captured artifact (VERDICT r3 next #1b)
    from dgvit_tpu.serve import BatchingActorServer, make_action_fn

    n_cli, reqs = 32, 4
    live_srv = jax.jit(make_action_fn(
        cfg, jax.tree_util.tree_map(np.asarray, state.actor_params),
        attn_impl="auto", dtype=jnp.bfloat16, inference=True))
    rng_srv = np.random.default_rng(5)
    srv_frames = rng_srv.uniform(0, 1, (n_cli, 128, 160)).astype(np.float32)
    srv_goals = rng_srv.normal(0, 0.3, (n_cli, 2)).astype(np.float32)
    for bkt in (1, 8, 16, 32):  # warm the bucket grid once
        np.asarray(live_srv(srv_frames[:bkt], srv_goals[:bkt]))

    def serve_campaign():
        import threading

        with BatchingActorServer(live_srv, max_wait_ms=4.0,
                                 buckets=(1, 8, 16, 32)) as srv:
            barrier = threading.Barrier(n_cli)

            def client(i):
                barrier.wait()
                for _ in range(reqs):
                    srv.act(srv_frames[i], srv_goals[i], timeout=120)

            cs = [threading.Thread(target=client, args=(i,))
                  for i in range(n_cli)]
            for c in cs:
                c.start()
            for c in cs:
                c.join()

    ts_srv = _time_repeats(serve_campaign, repeats=3)
    _row(f"batched serving actions/s ({n_cli} clients)", n_cli * reqs,
         ts_srv, "actions/s")


def main():
    import jax
    import jax.numpy as jnp

    from dgvit_tpu.config import Config
    from dgvit_tpu.models import build_actor

    cfg = Config()
    actor = build_actor(cfg, dtype=jnp.bfloat16)
    params = actor.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 160)), jnp.zeros((1, 2)))

    @jax.jit
    def rollout(params, obs, goal0):
        def body(goal, _):
            mean, _ls = actor.apply(params, obs, goal, inference=True)
            act = jnp.tanh(mean.astype(jnp.float32))
            return act, act[0, 0]

        final, trace = jax.lax.scan(body, goal0, None, length=N_INNER)
        return final, trace.sum()

    key = jax.random.PRNGKey(1)
    obs = jax.random.uniform(key, (BATCH, 128, 160), jnp.float32)
    goal0 = jnp.zeros((BATCH, 2), jnp.float32)

    # compile + warm up
    _, s = rollout(params, obs, goal0)
    float(s)

    def run_headline():
        _, s = rollout(params, obs, goal0)
        float(s)  # host pull forces completion

    ts = _time_repeats(run_headline)
    frames_per_sec = BATCH * N_INNER / ts[len(ts) // 2]
    _row("batched depth-frames/sec/chip (policy fwd)", BATCH * N_INNER, ts,
         "frames/s",
         vs_baseline=round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3))


def _wait_for_backend(max_wait_s: float, interval_s: float = 60.0) -> bool:
    """The tunneled TPU backend drops occasionally (observed mid-round-3:
    'Unable to initialize backend axon: UNAVAILABLE' for hours). The driver
    runs this file ONCE at round end, so a dead tunnel would record a crash
    as the round's bench artifact. Probe in a SUBPROCESS (jax caches backend
    init failures in-process, so an in-process retry can never recover) and
    retry until the deadline. Disable with DGVIT_BENCH_WAIT_S=0."""
    import os
    import subprocess

    probe = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
             "assert float((x @ x).sum()) == 128.0 * 128 * 128")
    deadline = time.time() + max_wait_s
    first = True
    while True:
        try:
            ok = subprocess.run([sys.executable, "-c", probe], timeout=150,
                                capture_output=True,
                                env=os.environ.copy()).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return True
        if time.time() >= deadline:
            print(json.dumps({"metric": "backend unavailable after wait",
                              "value": 0, "unit": f"waited {max_wait_s}s"}))
            return False
        if first:
            print(f"# backend unavailable, retrying up to {max_wait_s}s",
                  file=sys.stderr, flush=True)
            first = False
        time.sleep(interval_s)


if __name__ == "__main__":
    # Default run emits ALL BASELINE.json configs, one JSON line each, with
    # the headline LAST (the driver records the last line); --headline-only
    # skips the extras for quick checks. Extras failing must never mask the
    # headline.
    import os

    wait_s = float(os.environ.get("DGVIT_BENCH_WAIT_S", "1500"))
    if wait_s > 0 and not _wait_for_backend(wait_s):
        sys.exit(0)  # the JSON line above is the honest round artifact
    if "--headline-only" not in sys.argv:
        try:
            _bench_extra()
        except Exception as e:  # pragma: no cover
            print(json.dumps({"metric": "bench extras failed",
                              "value": 0, "unit": repr(e)[:200]}))
    main()
