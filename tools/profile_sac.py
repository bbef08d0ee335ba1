"""SAC train-step component profiler (TPU).

Times each piece of the fused update in isolation with the BENCH.md
methodology (N chained iterations inside one jitted scan, completion forced
by a host scalar pull) so the 32 ms/update budget can be attributed:
  fwd5      — the five GoT trunk forwards of one update
  actor_bwd — actor loss fwd+bwd (trunk backward through custom_vjp)
  critic_bwd— critic loss fwd+bwd
  td        — TD target (actor fwd + target critic fwd, no grads)
  full      — the complete _train_step_impl
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config

BS = 256
N = 10


def timed(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)) if hasattr(x, "sum")
                           else x, out)

    def pull(o):
        leaves = jax.tree_util.tree_leaves(o)
        float(jnp.sum(leaves[0]))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        pull(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} {best / N * 1e3:8.2f} ms/iter")
    return best / N


def main():
    cfg = Config()
    agent = SACAgent(cfg, dtype=jnp.bfloat16)
    state = agent.init_state(0)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    batch = {
        "obs": jax.random.uniform(ks[0], (BS, 128, 160)),
        "act": jax.random.uniform(ks[1], (BS, 2), minval=-1, maxval=1),
        "pobs": jax.random.uniform(ks[2], (BS, 2)),
        "next_pobs": jax.random.uniform(ks[3], (BS, 2)),
        "rew": jax.random.normal(ks[4], (BS, 1)),
        "next_obs": jax.random.uniform(ks[5], (BS, 128, 160)),
        "done": jnp.zeros((BS, 1)),
    }
    key = jax.random.PRNGKey(7)

    @jax.jit
    def full(state, batch):
        def body(s, _):
            s, m = agent._train_step_impl(s, batch)
            return s, m["qf1_loss"]
        return jax.lax.scan(body, state, None, length=N)

    @jax.jit
    def fwd5(state, batch):
        def body(c, _):
            o = batch["obs"] + c
            m1, _ = agent.actor.apply({"params": state.actor_params}, o,
                                      batch["pobs"])
            m2, _ = agent.actor.apply({"params": state.actor_params},
                                      batch["next_obs"], batch["next_pobs"])
            q1, q2 = agent.critic.apply({"params": state.critic_params}, o,
                                        batch["pobs"], batch["act"])
            q3, q4 = agent.critic.apply({"params": state.critic_params}, o,
                                        batch["pobs"], m1)
            q5, q6 = agent.critic.apply(
                {"params": state.critic_target_params}, batch["next_obs"],
                batch["next_pobs"], m2)
            tot = (m1.astype(jnp.float32).sum() + m2.astype(jnp.float32).sum()
                   + q1.astype(jnp.float32).sum() + q2.astype(jnp.float32).sum()
                   + q3.astype(jnp.float32).sum() + q4.astype(jnp.float32).sum()
                   + q5.astype(jnp.float32).sum() + q6.astype(jnp.float32).sum())
            return tot * 0.0, ()
        return jax.lax.scan(body, jnp.float32(0.0), None, length=N)

    @jax.jit
    def td(state, batch):
        def body(c, _):
            t = agent._td_target(state, jnp.float32(0.2),
                                 {k: (v + c if k == "next_obs" else v)
                                  for k, v in batch.items()}, key)
            return t.sum() * 0.0, ()
        return jax.lax.scan(body, jnp.float32(0.0), None, length=N)

    @jax.jit
    def critic_bwd(state, batch):
        target = jnp.zeros((BS, 2))

        def body(s, _):
            s2, l1, l2 = agent._critic_update(s, batch, target, key)
            return s2, l1
        return jax.lax.scan(body, state, None, length=N)

    @jax.jit
    def actor_bwd(state, batch):
        def body(s, _):
            s2, pl, lp = agent._actor_update(s, jnp.float32(0.2), batch, key)
            return s2, pl
        return jax.lax.scan(body, state, None, length=N)

    timed("fwd5", fwd5, state, batch)
    timed("td", td, state, batch)
    timed("critic_bwd", critic_bwd, state, batch)
    timed("actor_bwd", actor_bwd, state, batch)
    timed("full", full, state, batch)


if __name__ == "__main__":
    main()
