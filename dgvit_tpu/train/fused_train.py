"""Fully-fused on-device SAC training: rollout collection, replay ring, and
updates inside ONE jitted program.

The reference pays a host<->device round-trip (plus Python dispatch) per env
step AND per update (main.py:369-394). train_vec already collapses
collection to one dispatch per chunk; this module goes the rest of the way —
a whole training ROUND (B lanes x T env steps -> replay write -> U SAC
updates) is a single `lax.scan` body, and R rounds run as one device
dispatch. Host involvement drops to: launch, pull per-round stats, and
checkpoint between segments.

Components reused unchanged: the pure vectorized env scan
(train/vec_rollout.make_collect_fn over envs/jax_kinematic.py) and the fused
SAC update (agents/sac.SACAgent._train_step_impl) — this file only adds the
on-device replay ring between them.

Deliberate deviations from the reference's replay semantics (documented in
PARITY.md; this is an opt-in beyond-reference path — the parity protocol
remains train_rl):
  * The ring stores EVERY transition, including each episode's first step
    (the host loops skip it, main.py:310-334). At reference episode lengths
    (~800 steps) this is a <0.2% contamination; keeping it avoids dynamic
    compaction inside jit.
  * Sampling is uniform from the valid prefix (the reference's effective
    behavior — its PrioritizedReplayBuffer never updates priorities,
    DRL.py:365-368).
  * Capacity is bounded by HBM: obs+next_obs dominate at
    2 * cap * H * W * 4 bytes (cap=8192 at 128x160 ~= 1.3 GB).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.agents.sac import SACAgent, SACTrainState
from dgvit_tpu.config import Config
from dgvit_tpu.envs.jax_kinematic import EnvConsts, vec_reset
from dgvit_tpu.train.vec_rollout import make_collect_fn


class DeviceRing(NamedTuple):
    """On-device uniform replay ring (reference_schema fields minus engage)."""
    obs: jax.Array        # (cap, h, w)
    act: jax.Array        # (cap, 2)
    pobs: jax.Array       # (cap, p)
    next_pobs: jax.Array  # (cap, p)
    rew: jax.Array        # (cap,)
    next_obs: jax.Array   # (cap, h, w)
    done: jax.Array       # (cap,)
    cursor: jax.Array     # int32 scalar: total writes (wraps modulo cap)


def ring_init(capacity: int, obs_shape: Tuple[int, ...],
              pdim: int = 2) -> DeviceRing:
    """`obs_shape`: (H, W) for single-frame, (C, H, W) for channels mode."""
    z = jnp.zeros
    return DeviceRing(
        obs=z((capacity,) + tuple(obs_shape), jnp.float32),
        act=z((capacity, 2), jnp.float32),
        pobs=z((capacity, pdim), jnp.float32),
        next_pobs=z((capacity, pdim), jnp.float32),
        rew=z((capacity,), jnp.float32),
        next_obs=z((capacity,) + tuple(obs_shape), jnp.float32),
        done=z((capacity,), jnp.float32),
        cursor=jnp.int32(0))


def ring_write(ring: DeviceRing, rows: Dict[str, jax.Array]) -> DeviceRing:
    """Append N rows (any field dict holding (N, ...) arrays)."""
    cap = ring.obs.shape[0]
    n = rows["obs"].shape[0]
    idx = (ring.cursor + jnp.arange(n, dtype=jnp.int32)) % cap
    return DeviceRing(
        obs=ring.obs.at[idx].set(rows["obs"]),
        act=ring.act.at[idx].set(rows["act"]),
        pobs=ring.pobs.at[idx].set(rows["pobs"]),
        next_pobs=ring.next_pobs.at[idx].set(rows["next_pobs"]),
        rew=ring.rew.at[idx].set(rows["rew"]),
        next_obs=ring.next_obs.at[idx].set(rows["next_obs"]),
        done=ring.done.at[idx].set(rows["done"]),
        cursor=ring.cursor + n)


def ring_gather(ring: DeviceRing, idx: jax.Array) -> Dict:
    """Minibatch rows by index, shaped for SACAgent._train_step_impl
    (rew/done as (b, 1) columns)."""
    return {
        "obs": ring.obs[idx], "act": ring.act[idx], "pobs": ring.pobs[idx],
        "next_pobs": ring.next_pobs[idx], "rew": ring.rew[idx][:, None],
        "next_obs": ring.next_obs[idx], "done": ring.done[idx][:, None],
    }


def ring_sample(ring: DeviceRing, key: jax.Array, batch: int) -> Dict:
    """Uniform minibatch from the valid prefix."""
    cap = ring.obs.shape[0]
    size = jnp.minimum(ring.cursor, cap)
    idx = jax.random.randint(key, (batch,), 0, jnp.maximum(size, 1))
    return ring_gather(ring, idx)


def ring_save(ring: DeviceRing, path: str, chunk_rows: int = 1024):
    """Chunked device->host ring snapshot. Fields are pulled in row slices
    (obs+next_obs dominate at ~1.3 GB for cap 8192 @ 128x160 — a single
    device_get would hold a second full copy in host RAM). Written
    atomically (tmp + rename) so a crash mid-write never corrupts the
    resumable snapshot. Uncompressed npz: depth floats compress poorly and
    the write sits on the training critical path."""
    import os

    out = {}
    for name in ring._fields:
        v = getattr(ring, name)
        if name == "cursor":
            out[name] = np.asarray(v)
            continue
        out[name] = np.concatenate(
            [np.asarray(v[i:i + chunk_rows])
             for i in range(0, v.shape[0], chunk_rows)])
    tmp = path + ".tmp.npz"
    np.savez(tmp, **out)
    os.replace(tmp, path)


def ring_load(path: str, like: DeviceRing) -> Optional[DeviceRing]:
    """Restore a ring snapshot onto the device. Returns None (caller keeps
    the cold ring) when the snapshot's geometry doesn't match the configured
    ring — e.g. a resume with a different capacity or image size."""
    with np.load(path) as d:
        fields = {}
        for name in like._fields:
            want = getattr(like, name)
            if name not in d.files or (name != "cursor"
                                       and d[name].shape != want.shape):
                return None
            fields[name] = d[name]
    return DeviceRing(
        **{n: (jnp.int32(fields[n]) if n == "cursor"
               else jnp.asarray(fields[n])) for n in like._fields})


def make_fused_round(agent: SACAgent, consts: EnvConsts, n_envs: int,
                     chunk: int, updates_per_round: int, batch_size: int,
                     l_scale: float, a_scale: float,
                     max_action: float = 1.0, raw: bool = False,
                     stride: Optional[int] = None,
                     prioritized: bool = False, beta: float = 0.4,
                     frame_stack: int = 0,
                     guided: bool = False,
                     fault_knobs=None, aug_prob: float = 1.0):
    """Build `run(state, env_carry, ring, rng, rounds, per=None,
    expert=None)`: R rounds of [collect chunk -> ring write -> U updates]
    as ONE jitted dispatch. Returns (state, env_carry, ring, stats) with
    stats arrays shaped (R,). `per` is a DevicePER when `prioritized` —
    proportional sampling + IS weights + |td| priority updates entirely on
    device (replay/device_per.py), the full PER protocol without a host.

    `guided=True` enables the reference's PRE_BUFFER expert-guidance step
    (DRL.py:195-276): every `run` call then REQUIRES `expert`, a
    device-resident dict of (N, ...) arrays with the ring's field names
    ('act' = expert action). Each update samples a uniform expert
    minibatch with n_expert = min(floor(N/ring_size * batch), batch)
    valid rows, entirely on device — the host loop's learn_guidence
    workflow at fused-loop speed; the corpus is staged to HBM ONCE.
    The corpus is a RUNTIME ARGUMENT, never a closure capture: a
    closed-over jnp array is baked into the lowered module as a literal
    constant, and a real demo corpus (2.6k transitions at 128x160 =
    ~430 MB of obs) ballooned the remote TPU compile indefinitely
    (observed round 3: the guided program never finished compiling).

    `fault_knobs`/`aug_prob` forward to make_collect_fn's sensor-fault
    augmentation (envs/fault_aug.py): collection acts on and stores
    perturbed frames, training the robustness the round-4 sweeps showed
    domain randomization alone cannot buy (structural dropout).

    With a `grad_axis` agent the round is shard_map-ready (`raw=True` skips
    the jit so parallel.shard.shardmap_fused_round can wrap it): n_envs /
    batch_size / ring capacity are then PER-DEVICE, traj-derived stats are
    psum'd over the axis, and `stride` carries the GLOBAL lane count for
    record striding. (`expert` rows are replicated, not sharded: every
    device samples its own expert minibatch — expert rows contribute
    through pmean'd grads exactly like the single-device step.)"""
    from dgvit_tpu.replay.device_per import (per_on_write, per_sample,
                                             per_update)

    collect = make_collect_fn(agent, consts, chunk, l_scale, a_scale,
                              max_action=max_action, stride=stride,
                              frame_stack=frame_stack,
                              fault_knobs=fault_knobs, aug_prob=aug_prob)

    def round_body(carry, _, expert=None):
        state, env_carry, ring, per, rng = carry
        rng, k_coll, k_upd = jax.random.split(rng, 3)
        env_carry, traj = collect(state.actor_params, env_carry, k_coll)

        flat = {k: traj[k].reshape((-1,) + traj[k].shape[2:])
                for k in ("obs", "act", "pobs", "next_pobs", "rew",
                          "next_obs", "done")}
        cap = ring.obs.shape[0]
        new_rows = (ring.cursor
                    + jnp.arange(flat["obs"].shape[0], dtype=jnp.int32)) % cap
        ring2 = ring_write(ring, flat)
        if prioritized:
            per = per_on_write(per, new_rows)

        size = jnp.minimum(ring2.cursor, cap)

        if guided:
            metric_keys = ("qf1_loss", "qf2_loss", "policy_loss",
                           "alpha_loss", "alpha", "n_expert",
                           "guidence_weight")
        else:
            metric_keys = ("qf1_loss", "qf2_loss", "policy_loss",
                           "alpha_loss", "alpha") + (
                () if prioritized else ("entropy",))

        def sample_expert(key):  # uses the traced `expert` runtime arg
            """Uniform expert minibatch + the reference's valid-row count
            (DRL.py:195): n = min(floor(N/stored * batch), batch), with
            stored/batch at GLOBAL scale under a sharded round."""
            n_exp_total = expert["obs"].shape[0]
            eidx = jax.random.randint(key, (batch_size,), 0, n_exp_total)
            eb = {k2: v[eidx] for k2, v in expert.items()}
            g_batch = batch_size
            g_size = size
            if agent.grad_axis is not None:
                nsh = jax.lax.psum(jnp.ones((), jnp.int32), agent.grad_axis)
                g_batch = batch_size * nsh
                g_size = size * nsh
            n_exp = jnp.minimum(
                jnp.floor(n_exp_total / jnp.maximum(g_size, 1).astype(
                    jnp.float32) * g_batch),
                g_batch).astype(jnp.int32)
            return eb, n_exp

        def do_updates(arg):
            st, pr = arg

            def upd(c, k):
                st, pr = c
                if prioritized:
                    ks, ke, _ = jax.random.split(k, 3)
                    idx, w = per_sample(pr, ks, batch_size, size, beta=beta)
                    batch = ring_gather(ring2, idx)
                    if guided:
                        batch["engage"] = jnp.zeros_like(batch["done"])
                        eb, n_exp = sample_expert(ke)
                        st2, m, td = agent._guided_per_step_impl(
                            st, batch, eb, n_exp, w)
                    else:
                        st2, m, td = agent._per_step_impl(st, batch, w)
                    pr = per_update(pr, idx, jnp.abs(td) + 1e-6)
                elif guided:
                    ks, ke = jax.random.split(k)
                    batch = ring_sample(ring2, ks, batch_size)
                    batch["engage"] = jnp.zeros_like(batch["done"])
                    eb, n_exp = sample_expert(ke)
                    st2, m = agent._guided_step_impl(st, batch, eb, n_exp)
                else:
                    st2, m = agent._train_step_impl(
                        st, ring_sample(ring2, k, batch_size))
                return (st2, pr), m

            ks = jax.random.split(k_upd, updates_per_round)
            (st2, pr), ms = jax.lax.scan(upd, (st, pr), ks)
            # f32 regardless of the agent's compute dtype, so both cond
            # branches (and the stats pytree) have one stable type
            return (st2, pr), jax.tree_util.tree_map(
                lambda x: x[-1].astype(jnp.float32), ms)

        def no_updates(arg):
            zero = {k: jnp.float32(0.0) for k in metric_keys}
            if agent.nan_guard:
                zero["skipped_nonfinite"] = jnp.float32(0.0)
            return arg, zero

        (state, per), metrics = jax.lax.cond(size >= batch_size, do_updates,
                                             no_updates, (state, per))
        stats = {
            "reward_sum": traj["rew"].sum(),
            "goals": traj["target"].sum().astype(jnp.int32),
            "collisions": traj["collided"].sum().astype(jnp.int32),
            "episodes": traj["episode_end"].sum().astype(jnp.int32),
            "buffer": size,
        }
        if agent.grad_axis is not None:
            # under shard_map each device sees only its lanes/ring shard;
            # report mesh-global stats (metrics are already pmean'd by
            # the agent's _sync_mean)
            stats = {k: jax.lax.psum(v, agent.grad_axis)
                     for k, v in stats.items()}
            if prioritized:
                # running max priority is global state (new writes inherit
                # it); pmax keeps it replicated across ring shards
                per = per._replace(max_p=jax.lax.pmax(per.max_p,
                                                      agent.grad_axis))
        stats.update(metrics)
        return (state, env_carry, ring2, per, rng), stats

    def run(state: SACTrainState, env_carry, ring: DeviceRing,
            rng: jax.Array, rounds_arr: jax.Array, per=None, expert=None):
        if per is None:
            per = jnp.float32(0.0)  # unused placeholder leaf
        if guided and expert is None:
            raise ValueError("this fused round was built with guided=True; "
                             "pass the staged expert corpus at call time")
        body = partial(round_body, expert=expert)
        (state, env_carry, ring, per, rng), stats = jax.lax.scan(
            body, (state, env_carry, ring, per, rng), rounds_arr)
        if prioritized:
            return state, env_carry, ring, stats, per
        return state, env_carry, ring, stats

    if raw:
        return run
    # donate state + ring: the ring alone is ~1.3 GB at cap 8192 / 128x160 —
    # without aliasing every dispatch would hold two copies
    return partial(jax.jit, donate_argnums=(0, 1, 2))(run)


def train_fused(cfg: Config, out_dir: str = "results", n_envs: int = 16,
                chunk: int = 64, rounds: int = 100,
                rounds_per_dispatch: int = 10,
                updates_per_round: Optional[int] = None,
                ring_capacity: Optional[int] = None,
                world: Optional[str] = None,
                max_episodes: Optional[int] = None,
                resume: bool = False,
                expert_glob: Optional[str] = None,
                ring_snapshot_every: int = 20,
                fault_knobs: Optional[dict] = None,
                aug_prob: float = 1.0,
                world_assign: str = "reset",
                dead_segments_abort: int = 8) -> dict:
    """Host wrapper: run `rounds` fused rounds in segments of
    `rounds_per_dispatch`, logging per-round stats and checkpointing between
    segments. updates_per_round defaults to one update per collected env
    step (the reference's learn-per-step cadence). `max_episodes` adds an
    episode-count stopping criterion (checked between dispatch segments) so
    a run can match the reference's MAX_EPISODES protocol (config.yaml:10)
    rather than a fixed round budget; `rounds` then acts as a safety cap.

    `expert_glob` (with cfg.train.pre_buffer) stages the demo npz corpus to
    HBM once and runs every update through the expert-guidance step — the
    reference's PRE_BUFFER workflow (main.py:223-268, DRL.py:195-276) at
    fused-loop speed.

    resume=True restores the latest train-state checkpoint from the
    checkpoint dir, recovers the cumulative round/goal/episode counters
    from the run's JSONL, AND reloads the newest replay-ring snapshot
    (`ring_latest.npz`, written every `ring_snapshot_every` checkpointed
    segments; 0 disables) — a warm-buffer restart, matching the host path's
    save_replay workflow (cpprb save/load_transitions, DRL.py:505-510).
    What still differs after a warm resume: PER priorities reset to max
    (exactly cpprb's load_transitions-through-add semantics) and the env
    lanes re-reset (episodes in flight at the crash are abandoned — they
    were never counted, so the budget accounting stays exact)."""
    import json as _json
    import os

    from dgvit_tpu.core import checkpoint as ckpt
    from dgvit_tpu.envs.jax_kinematic import make_consts
    from dgvit_tpu.utils.metrics import MetricsLogger

    t, e, s = cfg.train, cfg.env, cfg.sac
    fs = 0
    if cfg.model.patch_mode == "channels":
        if not e.use_frame_stack:
            raise ValueError("patch_mode='channels' needs "
                             "env.use_frame_stack=True in train_fused")
        fs = int(e.frame_stack)
    elif e.use_frame_stack:
        raise ValueError("env.use_frame_stack=True needs "
                         "model.patch_mode='channels'")
    ih, iw = cfg.model.image_size
    agent = SACAgent(cfg)
    state = agent.init_state(t.seed)
    if t.pre_train and t.pre_train_model:
        d, f = os.path.split(t.pre_train_model)
        state = agent.load(state, f, d or ".", actor_only=True)

    consts = make_consts(world=world or "rrc", image_hw=(ih, iw),
                         max_steps=e.max_steps, seed=t.seed,
                         world_assign=world_assign)
    upr = (n_envs * chunk) if updates_per_round is None else updates_per_round
    cap = ring_capacity or min(s.buffer_size, 8192)
    prioritized = bool(s.prioritized_replay)
    expert = None
    if t.pre_buffer and expert_glob:
        from dgvit_tpu.train.train_rl import load_expert_dataset
        data = load_expert_dataset(expert_glob)
        if data is not None:
            if fs:
                def to_stack(a):
                    if a.ndim == 4:
                        return a.transpose(0, 3, 1, 2)
                    return np.repeat(a[:, None], fs, axis=1)
                eobs, enxt = to_stack(data["obs"]), to_stack(data["next_obs"])
            else:
                eobs = (data["obs"][..., 0] if data["obs"].ndim == 4
                        else data["obs"])
                enxt = (data["next_obs"][..., 0]
                        if data["next_obs"].ndim == 4 else data["next_obs"])
            n = eobs.shape[0]
            # column shapes mirror ring_gather's (rew/done as (N, 1)) so the
            # gathered expert minibatch matches the agent batch layout
            expert = {
                "obs": jnp.asarray(eobs, jnp.float32),
                "act": jnp.asarray(data["act"], jnp.float32),
                "pobs": jnp.asarray(data["goal"][:, :2], jnp.float32),
                "next_pobs": jnp.asarray(data["next_goal"][:, :2],
                                         jnp.float32),
                "rew": jnp.asarray(np.resize(data["reward"], (n, 1)),
                                   jnp.float32),
                "next_obs": jnp.asarray(enxt, jnp.float32),
                "done": jnp.asarray(
                    data["done"].astype(np.float32).reshape(n, 1)),
            }
            print(f"[train_fused] expert corpus on device: {n} transitions",
                  flush=True)
    run = make_fused_round(agent, consts, n_envs, chunk, upr, s.batch_size,
                           l_scale=e.linear_cmd_scale,
                           a_scale=e.angular_cmd_scale,
                           max_action=e.max_action, prioritized=prioritized,
                           frame_stack=fs, guided=expert is not None,
                           fault_knobs=fault_knobs, aug_prob=aug_prob)
    if fault_knobs:
        print(f"[train_fused] sensor-fault augmentation: {fault_knobs} "
              f"(prob {aug_prob})", flush=True)
    env_carry = vec_reset(consts, n_envs)
    if fs:
        from dgvit_tpu.train.vec_rollout import stack_init
        env_carry = (env_carry[0], stack_init(env_carry[1], fs),
                     env_carry[2])
    obs_shape = (fs, ih, iw) if fs else (ih, iw)
    ring = ring_init(cap, obs_shape, pdim=s.pstate_dim)
    per = None
    if prioritized:
        from dgvit_tpu.replay.device_per import per_init
        per = per_init(cap)
    rng = jax.random.PRNGKey(t.seed)

    logger = MetricsLogger(out_dir, f"train_fused_{cfg.model.name}_{t.desc}")
    ckpt_dir = os.path.join(out_dir, t.checkpoint_dir)
    ring_path = os.path.join(ckpt_dir, "ring_latest.npz")
    done_rounds = goals = collisions = episodes = 0
    dead_segments = 0   # consecutive segments whose every round's last
    #                     update was nan_guard-skipped (dead-run detector)
    aborted_dead = False
    if resume:
        latest = ckpt.latest_checkpoint(ckpt_dir)
        if latest is not None:
            state = ckpt.restore_train_state(latest, state)
            print(f"[train_fused] resumed train state from {latest} "
                  f"(itera={int(state.itera)})", flush=True)
        if os.path.exists(ring_path):
            warm = ring_load(ring_path, ring)
            if warm is None:
                print("[train_fused] ring snapshot geometry mismatch — "
                      "cold-buffer resume", flush=True)
            else:
                ring = warm
                stored = int(np.minimum(np.asarray(ring.cursor), cap))
                if prioritized:
                    # cpprb load_transitions semantics: reloaded rows come
                    # back at max priority (priorities are not persisted)
                    from dgvit_tpu.replay.device_per import per_on_write
                    per = per_on_write(per, jnp.arange(stored))
                print(f"[train_fused] warm ring: {stored} transitions "
                      f"restored", flush=True)
        if os.path.exists(logger.jsonl):
            with open(logger.jsonl) as f:
                lines = [ln for ln in f if ln.strip()]
            if lines:
                last = _json.loads(lines[-1])
                done_rounds = int(last.get("step", 0))
                goals = int(last.get("goals", 0))
                collisions = int(last.get("collisions", 0))
                episodes = int(last.get("episodes", 0))
                rng = jax.random.fold_in(rng, done_rounds)
                print(f"[train_fused] resumed counters: rounds={done_rounds} "
                      f"episodes={episodes} goals={goals}", flush=True)
    while done_rounds < rounds:
        seg = min(rounds_per_dispatch, rounds - done_rounds)
        if prioritized:
            state, env_carry, ring, stats, per = run(
                state, env_carry, ring, rng, jnp.arange(seg), per, expert)
        else:
            state, env_carry, ring, stats = run(state, env_carry, ring, rng,
                                                jnp.arange(seg), None, expert)
        rng = jax.random.fold_in(rng, done_rounds)
        host = {k: np.asarray(v) for k, v in stats.items()}
        for i in range(seg):
            done_rounds += 1
            goals += int(host["goals"][i])
            collisions += int(host["collisions"][i])
            episodes += int(host["episodes"][i])
            logger.log(done_rounds,
                       env_steps=done_rounds * n_envs * chunk,
                       goals=goals, collisions=collisions, episodes=episodes,
                       **{k: float(host[k][i]) for k in
                          ("reward_sum", "qf1_loss", "policy_loss", "alpha",
                           "buffer")})
        if t.save:
            ckpt.save_train_state(ckpt_dir, int(state.itera), state)
            ckpt.prune_checkpoints(ckpt_dir, keep=3)
            segments_done = -(-done_rounds // rounds_per_dispatch)
            if (ring_snapshot_every
                    and segments_done % ring_snapshot_every == 0):
                ring_save(ring, ring_path)
        if max_episodes is not None and episodes >= max_episodes:
            break
        # dead-run detector: once training diverges, nan_guard freezes the
        # state (every update rolls back) and further rounds only burn
        # chip time — the round-4 drr_rand8 collapse ran 120+ dead rounds
        # before its episode budget ended. If EVERY round in a segment
        # reports its last update skipped for `dead_segments_abort`
        # consecutive segments, stop with a clear verdict.
        skipped = host.get("skipped_nonfinite")
        if (dead_segments_abort and skipped is not None
                and skipped.size and (skipped >= 1.0).all()):
            dead_segments += 1
            if dead_segments >= dead_segments_abort:
                aborted_dead = True
                print(f"[train_fused] DEAD RUN: every round's last update "
                      f"was nan_guard-skipped for {dead_segments} "
                      f"consecutive segments ({dead_segments * seg} "
                      f"rounds) — state is frozen post-divergence; "
                      f"aborting at round {done_rounds}", flush=True)
                break
        else:
            dead_segments = 0
    if t.save and ring_snapshot_every:
        # final snapshot so an immediately-following --resume is warm even
        # when the run ended between cadence points
        ring_save(ring, ring_path)
    return {"rounds": done_rounds, "env_steps": done_rounds * n_envs * chunk,
            "goals": goals, "collisions": collisions, "episodes": episodes,
            "updates": int(state.itera), "state": state,
            "aborted_dead": aborted_dead}


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="dgvit_tpu fully-fused on-device RL training")
    p.add_argument("--config", default=None)
    p.add_argument("--out", default="results")
    p.add_argument("--n-envs", type=int, default=16)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--rounds", type=int, default=100)
    p.add_argument("--rounds-per-dispatch", type=int, default=10)
    p.add_argument("--updates-per-round", type=int, default=None)
    p.add_argument("--ring-capacity", type=int, default=None)
    p.add_argument("--world", default="rrc")
    p.add_argument("--max-episodes", type=int, default=None,
                   help="stop once this many lane-episodes complete "
                        "(reference MAX_EPISODES protocol); --rounds caps")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint + JSONL counters")
    p.add_argument("--expert-glob", default=None,
                   help="demo npz glob for on-device expert guidance "
                        "(needs train.pre_buffer)")
    p.add_argument("--ring-snapshot-every", type=int, default=20,
                   help="persist the replay ring to ring_latest.npz every N "
                        "checkpointed segments for warm-buffer --resume "
                        "(0 = cold-buffer resume; the snapshot is ~1.3 GB "
                        "at cap 8192 @ 128x160)")
    p.add_argument("--aug", action="append", default=None,
                   metavar="KNOB=VALUE",
                   help="sensor-fault augmentation knob (repeatable), e.g. "
                        "--aug patch_occlusion=0.25 --aug obs_noise=0.196; "
                        "knobs: obs_noise blur occlusion patch_occlusion "
                        "greying (envs/fault_aug.py)")
    p.add_argument("--aug-prob", type=float, default=1.0,
                   help="per-lane per-step probability of applying the "
                        "--aug knobs (Bernoulli gate; 1.0 = every frame)")
    p.add_argument("--world-assign", choices=("reset", "lane"),
                   default="reset",
                   help="world-ensemble lane assignment: 'reset' rehashes "
                        "each lane's world every episode (standard DR); "
                        "'lane' pins lane i to world i %% K (the "
                        "measured-better training recipe at the 800-ep "
                        "budget, BENCH.md round 4)")
    args = p.parse_args(argv)
    fault_knobs = None
    if args.aug:
        fault_knobs = {}
        for kv in args.aug:
            k, sep, v = kv.partition("=")
            if not sep or not v:
                p.error(f"--aug expects KNOB=VALUE, got {kv!r}")
            fault_knobs[k.strip()] = float(v)
    cfg = Config.from_yaml(args.config) if args.config else Config()
    out = train_fused(cfg, out_dir=args.out, n_envs=args.n_envs,
                      chunk=args.chunk, rounds=args.rounds,
                      rounds_per_dispatch=args.rounds_per_dispatch,
                      updates_per_round=args.updates_per_round,
                      ring_capacity=args.ring_capacity, world=args.world,
                      max_episodes=args.max_episodes, resume=args.resume,
                      expert_glob=args.expert_glob,
                      ring_snapshot_every=args.ring_snapshot_every,
                      fault_knobs=fault_knobs, aug_prob=args.aug_prob,
                      world_assign=args.world_assign)
    print(f"rounds: {out['rounds']}  env steps: {out['env_steps']}  "
          f"episodes: {out['episodes']}  goals: {out['goals']}  "
          f"collisions: {out['collisions']}  updates: {out['updates']}")


if __name__ == "__main__":
    main()
