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

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_rollout.py
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

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.train.device_rollout import device_rollout

EPISODES = 5
MAX_STEPS = 200
VEC_B, VEC_T = 64, 64        # vectorized-arm lanes x chunk (TPU sizing)
IMAGE_HW = (128, 160)
FUSED_B, FUSED_T, FUSED_U = 16, 32, 32   # fused-arm lanes/chunk/updates
FUSED_CAP = 4096


def main():
    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"
    agent = SACAgent(cfg, dtype=jnp.bfloat16)
    state = agent.init_state(0)
    l_s, a_s = cfg.env.linear_cmd_scale, cfg.env.angular_cmd_scale

    # ---- host loop (reference pattern) -------------------------------------
    env = KinematicNavEnv(seed=11)
    key = jax.random.PRNGKey(0)
    # warm the choose_action compile outside the timed region
    sq = lambda x: np.squeeze(x, -1) if x.ndim == 3 else x
    s0 = env.reset()
    a = agent.choose_action(state, sq(s0.state), np.asarray(s0.to_goal)[:2],
                            key, evaluate=True)
    np.asarray(a)
    steps = 0
    t0 = time.perf_counter()
    for ep in range(EPISODES):
        s = env.reset()
        for t in range(MAX_STEPS):
            a = np.asarray(agent.choose_action(
                state, sq(s.state), np.asarray(s.to_goal)[:2], key,
                evaluate=True))
            s = env.step([(float(a[0]) + 1) * l_s, float(a[1]) * a_s], t)
            steps += 1
            if s.done:
                break
    host_dt = time.perf_counter() - t0
    host_sps = steps / host_dt
    print(json.dumps({"metric": "host-loop env steps/s (kinematic)",
                      "value": round(host_sps, 1), "unit": "steps/s",
                      "steps": steps}), flush=True)

    # ---- on-device io_callback loop -----------------------------------------
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
    dev_sps = steps_d / dev_dt
    print(json.dumps({"metric": "on-device io_callback env steps/s (kinematic)",
                      "value": round(dev_sps, 1), "unit": "steps/s",
                      "steps": steps_d,
                      "speedup_vs_host_loop": round(dev_sps / host_sps, 2)}),
          flush=True)

    # ---- pure-JAX vectorized collection (zero host boundary) ---------------
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
    vec_sps = B * T * n_chunks / vec_dt
    print(json.dumps({"metric": "vectorized on-device env steps/s (kinematic)",
                      "value": round(vec_sps, 1), "unit": "steps/s",
                      "lanes": B, "chunk": T,
                      "reward_sum": round(tot, 2),
                      "speedup_vs_host_loop": round(vec_sps / host_sps, 2)}),
          flush=True)

    # ---- fully-fused training rounds (collect + ring + updates on device) --
    from dgvit_tpu.envs.jax_kinematic import make_consts as mk_consts
    from dgvit_tpu.envs.jax_kinematic import vec_reset
    from dgvit_tpu.train.fused_train import make_fused_round, ring_init

    cfg_f = Config()
    cfg_f.model.compute_dtype = "bfloat16"
    agent_f = SACAgent(cfg_f, dtype=jnp.bfloat16)
    state_f = agent_f.init_state(0)
    FB, FT, FU = FUSED_B, FUSED_T, FUSED_U
    consts_f = mk_consts(world="rrc", image_hw=IMAGE_HW,
                         max_steps=MAX_STEPS, seed=11)
    run = make_fused_round(agent_f, consts_f, FB, FT, FU,
                           cfg_f.sac.batch_size, l_s, a_s)
    env_carry = vec_reset(consts_f, FB)
    ring = ring_init(FUSED_CAP, IMAGE_HW, pdim=cfg_f.sac.pstate_dim)
    rng = jax.random.PRNGKey(3)
    # warm compile + one segment
    state_f, env_carry, ring, stats = run(state_f, env_carry, ring, rng,
                                          jnp.arange(1))
    float(np.asarray(stats["reward_sum"]).sum())
    n_rounds = 3
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


if __name__ == "__main__":
    main()
