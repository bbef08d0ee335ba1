"""Host-loop vs on-device (io_callback) vs pure-JAX vectorized rollout
throughput on the kinematic env — the BENCH rows for the SURVEY §2.3
host-boundary commitment and the envs/jax_kinematic.py capability.

Host loop: one choose_action dispatch per step (reference main.py:369
pattern — H2D image, D2H action, full Python dispatch each step, paying the
tunnel RTT on this machine).
Device loop: the whole episode is ONE jitted lax.scan; only env physics
crosses the boundary via ordered io_callback (train/device_rollout.py).
Vectorized: B pure-JAX envs + policy in one scan, ZERO host boundary
(train/vec_rollout.VecCollector) — honest timing via a host scalar pull of
the reward sum (the tunnel's block_until_ready lies; BENCH.md pitfalls).
Fused: collect + on-device replay ring + SAC updates in ONE dispatch
(train/fused_train.py).

Each arm runs in isolation: a failure (e.g. a transient tunnel error on the
io_callback arm) emits an {"error": ...} line and the remaining arms still
run. Select arms with --arms host,device,vec,fused.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_rollout.py
"""

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv

EPISODES = 5
MAX_STEPS = 200
VEC_B, VEC_T = 64, 64        # vectorized-arm lanes x chunk (TPU sizing)
IMAGE_HW = (128, 160)
FUSED_B, FUSED_T, FUSED_U = 16, 32, 32   # fused-arm lanes/chunk/updates
FUSED_CAP = 4096


def _sq(x):
    return np.squeeze(x, -1) if x.ndim == 3 else x


def arm_host(agent, state, l_s, a_s):
    """Reference main.py:369 pattern — one choose_action dispatch per step."""
    env = KinematicNavEnv(seed=11)
    key = jax.random.PRNGKey(0)
    s0 = env.reset()
    a = agent.choose_action(state, _sq(s0.state), np.asarray(s0.to_goal)[:2],
                            key, evaluate=True)
    np.asarray(a)           # warm the compile outside the timed region
    steps = 0
    t0 = time.perf_counter()
    for ep in range(EPISODES):
        s = env.reset()
        for t in range(MAX_STEPS):
            a = np.asarray(agent.choose_action(
                state, _sq(s.state), np.asarray(s.to_goal)[:2], key,
                evaluate=True))
            s = env.step([(float(a[0]) + 1) * l_s, float(a[1]) * a_s], t)
            steps += 1
            if s.done:
                break
    host_dt = time.perf_counter() - t0
    sps = steps / host_dt
    print(json.dumps({"metric": "host-loop env steps/s (kinematic)",
                      "value": round(sps, 1), "unit": "steps/s",
                      "steps": steps}), flush=True)
    return sps


def arm_device(agent, state, l_s, a_s, host_sps):
    """Whole episode as ONE jitted lax.scan; env physics via io_callback."""
    from dgvit_tpu.train.device_rollout import device_rollout

    env2 = KinematicNavEnv(seed=11)
    # warm compile: one episode (device_rollout resets the env itself)
    r = device_rollout(agent, state, env2, MAX_STEPS, l_s, a_s,
                       jax.random.PRNGKey(1), evaluate=True)
    int(r.steps)
    steps_d = 0
    t0 = time.perf_counter()
    for ep in range(EPISODES):
        r = device_rollout(agent, state, env2, MAX_STEPS, l_s, a_s,
                           jax.random.PRNGKey(ep), evaluate=True)
        steps_d += int(r.steps)
    dev_dt = time.perf_counter() - t0
    sps = steps_d / dev_dt
    row = {"metric": "on-device io_callback env steps/s (kinematic)",
           "value": round(sps, 1), "unit": "steps/s", "steps": steps_d}
    if host_sps:
        row["speedup_vs_host_loop"] = round(sps / host_sps, 2)
    print(json.dumps(row), flush=True)
    return sps


def arm_vec(agent, state, l_s, a_s, host_sps):
    """B pure-JAX envs + policy in one scan, zero host boundary."""
    from dgvit_tpu.envs.jax_kinematic import make_consts
    from dgvit_tpu.train.vec_rollout import VecCollector

    B, T = VEC_B, VEC_T
    consts = make_consts(world="rrc", image_hw=IMAGE_HW,
                         max_steps=MAX_STEPS, seed=11)
    coll = VecCollector(agent, consts, B, T, l_s, a_s, evaluate=True)
    carry = coll.init()
    # warm compile + one chunk
    carry, traj = coll.collect(state.actor_params, carry, jax.random.PRNGKey(0))
    float(traj["rew"].sum())
    n_chunks, tot = 4, 0.0
    t0 = time.perf_counter()
    for i in range(1, n_chunks + 1):
        carry, traj = coll.collect(state.actor_params, carry,
                                   jax.random.PRNGKey(i))
        tot += float(traj["rew"].sum())   # host scalar pull = honest sync
    vec_dt = time.perf_counter() - t0
    sps = B * T * n_chunks / vec_dt
    row = {"metric": "vectorized on-device env steps/s (kinematic)",
           "value": round(sps, 1), "unit": "steps/s",
           "lanes": B, "chunk": T, "reward_sum": round(tot, 2)}
    if host_sps:
        row["speedup_vs_host_loop"] = round(sps / host_sps, 2)
    print(json.dumps(row), flush=True)
    return sps


def arm_fused():
    """Collect + on-device replay ring + SAC updates in ONE dispatch."""
    from dgvit_tpu.envs.jax_kinematic import make_consts, vec_reset
    from dgvit_tpu.train.fused_train import make_fused_round, ring_init

    cfg_f = Config()
    cfg_f.model.compute_dtype = "bfloat16"
    agent_f = SACAgent(cfg_f, dtype=jnp.bfloat16)
    state_f = agent_f.init_state(0)
    l_s, a_s = cfg_f.env.linear_cmd_scale, cfg_f.env.angular_cmd_scale
    FB, FT, FU = FUSED_B, FUSED_T, FUSED_U
    consts_f = make_consts(world="rrc", image_hw=IMAGE_HW,
                           max_steps=MAX_STEPS, seed=11)
    run = make_fused_round(agent_f, consts_f, FB, FT, FU,
                           cfg_f.sac.batch_size, l_s, a_s)
    env_carry = vec_reset(consts_f, FB)
    ring = ring_init(FUSED_CAP, IMAGE_HW, pdim=cfg_f.sac.pstate_dim)
    rng = jax.random.PRNGKey(3)
    n_rounds = 3
    # warm compile + one segment — SAME rounds_arr length as the timed call:
    # the scan length is a static shape, so a length-1 warmup would leave
    # the length-3 program to compile INSIDE the timed region (observed:
    # 9.85 s/round phantom vs ~0.3 s real)
    state_f, env_carry, ring, stats = run(state_f, env_carry, ring, rng,
                                          jnp.arange(n_rounds))
    float(np.asarray(stats["reward_sum"]).sum())
    t0 = time.perf_counter()
    state_f, env_carry, ring, stats = run(state_f, env_carry, ring,
                                          jax.random.PRNGKey(4),
                                          jnp.arange(n_rounds))
    float(np.asarray(stats["reward_sum"]).sum())  # honest host pull
    fused_dt = time.perf_counter() - t0
    per_round = fused_dt / n_rounds
    print(json.dumps({
        "metric": "fused on-device training round (collect+ring+updates)",
        "value": round(per_round * 1e3, 1), "unit": "ms/round",
        "lanes": FB, "chunk": FT, "updates_per_round": FU,
        "batch": cfg_f.sac.batch_size,
        "env_steps_per_s": round(FB * FT * n_rounds / fused_dt, 1),
        "updates_per_s": round(FU * n_rounds / fused_dt, 1)}), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arms", default="host,vec,fused",
                   help="comma-separated subset of host,vec,fused,device; "
                        "the device (io_callback) arm is EXCLUDED by "
                        "default: host callbacks cannot cross the tunneled "
                        "PJRT backend — the program dies at setup with a "
                        "TPU backend error (sometimes hanging first), and "
                        "poisons later compiles in the same process")
    args = p.parse_args(argv)
    arms = [a.strip() for a in args.arms.split(",") if a.strip()]

    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    agent = SACAgent(cfg, dtype=jnp.bfloat16)
    state = agent.init_state(0)
    l_s, a_s = cfg.env.linear_cmd_scale, cfg.env.angular_cmd_scale

    host_sps = None
    failures = 0
    for arm in arms:
        try:
            if arm == "host":
                host_sps = arm_host(agent, state, l_s, a_s)
            elif arm == "device":
                arm_device(agent, state, l_s, a_s, host_sps)
            elif arm == "vec":
                arm_vec(agent, state, l_s, a_s, host_sps)
            elif arm == "fused":
                arm_fused()
            else:
                raise ValueError(f"unknown arm {arm!r}")
        except Exception as e:                       # noqa: BLE001
            # the device (io_callback) arm is a KNOWN limitation of the
            # tunneled backend (reproducible TPU backend setup/compile
            # error) — report it but don't fail the whole bench run
            if arm != "device":
                failures += 1
            traceback.print_exc(file=sys.stderr)
            print(json.dumps({"arm": arm, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
