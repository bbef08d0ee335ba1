"""On-chip rows for the fleet-collection trainer (train/train_fleet.py).

Compares the reference's train-while-collect shape (1 robot, host loop —
main.py:369-394: one action dispatch + one update dispatch per env step)
against the fleet driver at 1/4/8 robots sharing one batching actor server
with a concurrent learner. On a remote-attached chip the per-dispatch RTT
dominates single-frame work, so the fleet's coalescing + learner overlap is
exactly the claim to measure (VERDICT r3 next #2: steps/s and updates/s vs
1-robot host loop).

Prints one JSON row per arm. Run on a quiet chip:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train_fleet.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp  # noqa: E402

from dgvit_tpu.config import Config  # noqa: E402
from dgvit_tpu.envs import KinematicNavEnv  # noqa: E402

EPISODES_PER_ROBOT = 2
MAX_STEPS = 100


def _cfg():
    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    cfg.env.max_steps = MAX_STEPS
    cfg.train.save = False
    cfg.train.plot_interval = 10 ** 9
    cfg.train.eval_threshold = 10 ** 9
    cfg.train.pre_train = False
    cfg.train.pre_buffer = False
    return cfg


def _envs(n, cfg):
    return [KinematicNavEnv(seed=100 + i,
                            image_hw=tuple(cfg.model.image_size))
            for i in range(n)]


def bench_host_loop(cfg):
    """Reference shape: single robot, blocking act + update per step."""
    import tempfile

    from dgvit_tpu.train.train_rl import train

    env = _envs(1, cfg)[0]
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        out = train(cfg, env, out_dir=td,
                    max_episodes=EPISODES_PER_ROBOT)
        dt = time.perf_counter() - t0
    # train() counts learn steps in state.itera; steps ~ itera + warmup
    steps = int(out["state"].itera)
    print(json.dumps({
        "metric": "train-while-collect steps/s (1 robot, host loop)",
        "value": round(steps / dt, 2), "unit": "steps/s",
        "updates_per_s": round(int(out["state"].itera) / dt, 2),
        "episodes": out["episodes"]}), flush=True)


def bench_fleet(cfg, n):
    from dgvit_tpu.train.train_fleet import train_fleet

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out = train_fleet(cfg, _envs(n, cfg), out_dir=td,
                          max_episodes=EPISODES_PER_ROBOT * n,
                          max_wait_ms=4.0)
    print(json.dumps({
        "metric": f"fleet train steps/s ({n} robots + learner)",
        "value": round(out["steps_per_s"], 2), "unit": "steps/s",
        "updates_per_s": round(out["updates_per_s"], 2),
        "mean_batch": round(out["serving"]["mean_batch"], 2),
        "episodes": out["episodes"], "env_steps": out["env_steps"],
        "updates": out["updates"]}), flush=True)


def main():
    cfg = _cfg()
    # warm the action + update compiles once so arm 1 isn't charged for them
    bench_fleet(cfg, 1)   # also compiles bucket-1 act + the learn step
    bench_host_loop(cfg)
    for n in (1, 4, 8):
        bench_fleet(cfg, n)


if __name__ == "__main__":
    main()
