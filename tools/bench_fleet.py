"""Fleet-serving benchmark: N live robots sharing one TPU actor.

Extends tools/bench_serve.py (raw request throughput) with environments in
the loop: each robot is a KinematicNavEnv episode thread (host-side sensor
synthesis + dynamics, like a real robot's ROS I/O) whose actions come from
the shared BatchingActorServer. Measures end-to-end fleet control steps/s
— the number a multi-robot deployment actually experiences — for fleet
sizes 1/8/32/64, vs the reference's 1-robot-per-dispatch pattern
(main.py:369) at N=1.

Every action flows device->host through the server's np.asarray pull, so
wall-clock here is an honest sync even on the tunneled backend (BENCH.md
measurement pitfalls).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_fleet.py
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
import numpy as np

from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.models import build_actor
from dgvit_tpu.serve import make_action_fn, serve_fleet
from dgvit_tpu.serve.fleet import FleetRunner

FLEETS = (1, 8, 32, 64)
MAX_STEPS = 25


def main():
    cfg = Config()
    cfg.env.max_steps = MAX_STEPS
    actor = build_actor(cfg, dtype=jnp.bfloat16)
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 160)),
                        jnp.zeros((1, 2)))["params"]
    # live fused-path actor (inference=True routes the TPU megakernel)
    act = jax.jit(make_action_fn(cfg, params, attn_impl="auto",
                                 dtype=jnp.bfloat16, inference=True))
    # warm the bucket grid once so compiles don't ride the timed runs
    for b in (1, 2, 4, 8, 16, 32, 64):
        np.asarray(act(np.zeros((b, 128, 160), np.float32),
                       np.zeros((b, 2), np.float32)))

    # reference pattern: one robot, one dispatch per control step
    env = KinematicNavEnv(seed=0)
    calls = [0]

    def direct(o, g):
        calls[0] += 1
        return np.asarray(act(o[None], g[None]))[0]

    runner = FleetRunner([env], direct, cfg)
    t0 = time.perf_counter()
    runner.run(episodes_per_robot=1)
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "fleet control steps/s (1 robot, direct)",
                      "value": round(calls[0] / dt, 1),
                      "unit": "steps/s"}), flush=True)

    for n in FLEETS:
        envs = [KinematicNavEnv(seed=100 + i) for i in range(n)]
        t0 = time.perf_counter()
        out = serve_fleet(cfg, envs, act, episodes_per_robot=1,
                          max_wait_ms=4.0)
        dt = time.perf_counter() - t0
        st = out["serving"]
        print(json.dumps({
            "metric": f"fleet control steps/s ({n} robots, batched server)",
            "value": round(st["requests"] / dt, 1),
            "unit": "steps/s",
            "robots": n,
            "mean_batch": round(st["mean_batch"], 1),
            "dispatches": st["dispatches"],
            "per_robot_hz": round(st["requests"] / dt / n, 1)}), flush=True)


if __name__ == "__main__":
    main()
