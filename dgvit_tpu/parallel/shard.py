"""Sharded training: DP over `data`, TP over `model`, `seq` reserved.

The reference is single-process single-GPU (SURVEY.md §2.3); this module is
the scaling layer it lacks. Strategy (scaling-book style): annotate input
shardings — batch over `data`, the ViT MLP/QKV weights over `model` — and let
GSPMD insert the collectives (gradient psum over ICI for DP; a single
all-reduce per MLP pair for Megatron-style column+row TP).

No NCCL/MPI analogue exists or is needed: XLA collectives ride ICI inside a
slice and DCN across slices, selected by the mesh construction
(core/mesh.py)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

from dgvit_tpu.agents.sac import SACAgent, SACTrainState
from dgvit_tpu.core.mesh import MeshRuntime


def shard_sac_state(runtime: MeshRuntime, state: SACTrainState) -> SACTrainState:
    """Model params TP-sharded over `model` where profitable, optimizer state
    sharded to match (it is a pytree of the same shapes), scalars replicated."""
    def place(tree):
        shardings = runtime.param_sharding(tree)
        return jax.tree_util.tree_map(jax.device_put, tree, shardings)

    return SACTrainState(
        actor_params=place(state.actor_params),
        critic_params=place(state.critic_params),
        critic_target_params=place(state.critic_target_params),
        actor_opt=jax.tree_util.tree_map(
            lambda x: runtime.replicate(x) if np.ndim(x) < 2 else place_leaf(runtime, x),
            state.actor_opt),
        critic_opt=jax.tree_util.tree_map(
            lambda x: runtime.replicate(x) if np.ndim(x) < 2 else place_leaf(runtime, x),
            state.critic_opt),
        log_alpha=runtime.replicate(state.log_alpha),
        alpha_opt=runtime.replicate(state.alpha_opt),
        itera=runtime.replicate(state.itera),
        rng=runtime.replicate(state.rng),
    )


def place_leaf(runtime: MeshRuntime, x):
    """Adam moments share the parameter layout; reuse the shape-based rule."""
    sh = runtime.param_sharding({"leaf": x})["leaf"]
    return jax.device_put(x, sh)


def shard_batch(runtime: MeshRuntime, batch: Dict[str, Any]) -> Dict[str, Any]:
    return runtime.shard_batch(batch)


def sharded_learn(agent: SACAgent, runtime: MeshRuntime):
    """Data/model-parallel jitted SAC step. Inputs carry their shardings
    (shard_sac_state / shard_batch); GSPMD propagates and inserts psums."""
    from dgvit_tpu.core.mesh import use_mesh

    step = jax.jit(agent._train_step_impl, donate_argnums=(0,))

    def learn(state: SACTrainState, batch) -> Tuple[SACTrainState, Dict]:
        # use_mesh also publishes the mesh so seq-sharded attention layers
        # (models with seq_shard=True) route through ring attention
        with use_mesh(runtime.mesh):
            return step(state, batch)

    return learn


def shardmap_learn(agent: SACAgent, runtime: MeshRuntime,
                   flavor: str = "plain", raw: bool = False):
    """DP over `data` via shard_map — the composition that lets the FUSED
    Pallas train path run under a mesh.

    GSPMD (sharded_learn) cannot partition `pl.pallas_call`: it would
    replicate kernel operands and destroy the DP win. shard_map instead
    hands each device its local batch shard and runs the per-device program
    unchanged — kernels included. The agent must be constructed with
    `grad_axis="data"`: its updates pmean gradients/metrics and psum
    sum-form loss denominators over the axis, so the sharded step computes
    EXACTLY the single-device update (see test_shardmap.py equality gates).

    Params/optimizer state are replicated (the GoT geometry is far below
    TP-profitable sizes on the fused path); batch leaves are sharded on dim
    0. `model`/`seq` mesh axes, if present, run redundant replicas — use a
    data-only mesh for this path.

    flavor: 'plain' (learn), 'per' (learn_per, td out sharded over data),
    'guided' (learn_guidence), 'guided_per' (learn_guidence_per — sharded
    IS weights in, sharded per-agent-row td out). `raw=True` returns the
    un-jitted shard-mapped callable (composable inside a caller's jit/scan,
    e.g. bench loops)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dgvit_tpu.core.mesh import AXIS_DATA, use_mesh

    assert agent.grad_axis == AXIS_DATA, (
        "build the agent with SACAgent(cfg, grad_axis='data') so gradients "
        "sync over the mapped axis")
    mesh = runtime.mesh
    repl, dataP = P(), P(AXIS_DATA)

    if flavor == "plain":
        fn, in_specs, out_specs = (agent._train_step_impl,
                                   (repl, dataP), (repl, repl))
    elif flavor == "per":
        fn, in_specs, out_specs = (agent._per_step_impl,
                                   (repl, dataP, dataP), (repl, repl, dataP))
    elif flavor == "guided":
        fn, in_specs, out_specs = (agent._guided_step_impl,
                                   (repl, dataP, dataP, repl), (repl, repl))
    elif flavor == "guided_per":
        # guided + PER composition: agent batch, expert batch, and IS
        # weights sharded over data; n_expert replicated; per-agent-row TD
        # errors come back sharded (priority updates index the global batch)
        fn, in_specs, out_specs = (agent._guided_per_step_impl,
                                   (repl, dataP, dataP, repl, dataP),
                                   (repl, repl, dataP))
    else:
        raise ValueError(flavor)

    sharded = shard_map(fn, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)
    if raw:
        return sharded
    step = jax.jit(sharded, donate_argnums=(0,))

    def learn(state: SACTrainState, batch, *args):
        with use_mesh(runtime.mesh):
            return step(state, batch, *args)

    return learn


def shardmap_collect(agent: SACAgent, runtime: MeshRuntime, consts,
                     batch: int, chunk: int, l_scale: float, a_scale: float,
                     max_action: float = 1.0, evaluate: bool = False):
    """DP-sharded on-device rollout collection: the pure-JAX vectorized env
    (envs/jax_kinematic.py) + policy scan under shard_map, lanes over
    `data`. Each device steps its local lanes; lanes are independent, so no
    collectives at all — the scaling ceiling is one policy batch per device.

    With a `grad_axis='data'` agent, the globally-indexed row noise makes
    the sharded lane streams EXACTLY equal to the unsharded collector's (see
    tests/test_jax_kinematic.py::test_shardmap_collect_matches_unsharded).

    Returns (collect, init): `init() -> carry` builds the lane-sharded
    carry; `collect(actor_params, carry, rng) -> (carry', traj)` with traj
    arrays (chunk, batch, ...) sharded over lanes on dim 1."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dgvit_tpu.core.mesh import AXIS_DATA, use_mesh
    from dgvit_tpu.envs.jax_kinematic import VecState, vec_reset
    from dgvit_tpu.train.vec_rollout import make_collect_fn

    assert agent.grad_axis == AXIS_DATA, (
        "build the agent with SACAgent(cfg, grad_axis='data') so per-row "
        "action noise is globally indexed across lane shards")
    n_data = runtime.mesh.shape[AXIS_DATA]
    assert batch % n_data == 0, (batch, n_data)
    repl, laneP = P(), P(AXIS_DATA)
    lane_state = VecState(*([laneP] * len(VecState._fields)))
    carry_spec = (lane_state, laneP, laneP)
    traj_spec = {k: P(None, AXIS_DATA) for k in
                 ("obs", "act", "pobs", "next_pobs", "rew", "next_obs",
                  "done", "episode_end", "store", "target", "collided")}

    # stride=batch: sharded lanes must advance the record table by the
    # GLOBAL lane count on auto-reset, as the unsharded collector does
    fn = make_collect_fn(agent, consts, chunk, l_scale, a_scale,
                         max_action=max_action, evaluate=evaluate,
                         stride=batch)
    sharded = shard_map(fn, mesh=runtime.mesh,
                        in_specs=(repl, carry_spec, repl),
                        out_specs=(carry_spec, traj_spec), check_vma=False)
    step = jax.jit(sharded)

    def init():
        state, obs, goal = vec_reset(consts, batch)
        return state, obs, goal

    def collect(actor_params, carry, rng):
        with use_mesh(runtime.mesh):
            return step(actor_params, carry, rng)

    return collect, init


def shardmap_fused_round(agent: SACAgent, runtime: MeshRuntime, consts,
                         n_envs: int, chunk: int, updates_per_round: int,
                         batch_size: int, ring_capacity: int,
                         l_scale: float, a_scale: float,
                         max_action: float = 1.0,
                         prioritized: bool = False, guided: bool = False,
                         fault_knobs=None, aug_prob: float = 1.0):
    """The ENTIRE fused training loop (train/fused_train.py: collect ->
    replay ring -> SAC updates) under the device mesh — distributed RL with
    zero host involvement per round.

    Layout: lanes AND replay-ring rows sharded over `data` (each device
    keeps the transitions its own lanes produced — the standard sharded-
    replay design), params/opt state replicated, gradients pmean'd inside
    the update (grad_axis), traj stats psum'd. Each device samples its
    batch_size/n_data minibatch rows from its LOCAL ring shard: the global
    batch is uniform over the union, but a given device's rows never mix
    into another's — a documented deviation from single-device uniform
    sampling (exact equality is impossible here; lane independence and the
    update math are equality-gated separately). With `guided=True`, `run`
    takes the device-resident expert corpus (see make_fused_round) as its
    LAST positional argument, replicated over the mesh: every device
    samples its own expert minibatch and the guided step's
    n_expert/guidance-loss normalizations run at GLOBAL scale via the
    psums already inside _guided_core. (A runtime argument, not a closure
    capture — a closed-over corpus is baked into the HLO as a ~430 MB
    literal that stalls the remote compile; see make_fused_round.)

    `fault_knobs`/`aug_prob` forward to the collect's sensor-fault
    augmentation (envs/fault_aug.py) — each device perturbs its own lanes'
    frames independently, composing DR-with-faults training with the mesh.

    Returns (run, init): run(state, env_carry, ring, rng, rounds_arr
    [, per][, expert]) — one jitted dispatch for R rounds; init() ->
    (env_carry, ring[, per]) global-shaped.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dgvit_tpu.core.mesh import AXIS_DATA, use_mesh
    from dgvit_tpu.envs.jax_kinematic import VecState, vec_reset
    from dgvit_tpu.replay.device_per import DevicePER, per_init
    from dgvit_tpu.train.fused_train import (DeviceRing, make_fused_round,
                                             ring_init)

    assert agent.grad_axis == AXIS_DATA
    n_data = runtime.mesh.shape[AXIS_DATA]
    assert n_envs % n_data == 0 and batch_size % n_data == 0 \
        and ring_capacity % n_data == 0, (n_envs, batch_size, ring_capacity)

    run_local = make_fused_round(
        agent, consts, n_envs // n_data, chunk,
        updates_per_round, batch_size // n_data,
        l_scale, a_scale, max_action=max_action, raw=True, stride=n_envs,
        prioritized=prioritized, guided=guided,
        fault_knobs=fault_knobs, aug_prob=aug_prob)

    repl, laneP = P(), P(AXIS_DATA)
    carry_spec = (VecState(*([laneP] * len(VecState._fields))), laneP, laneP)
    ring_spec = DeviceRing(obs=laneP, act=laneP, pobs=laneP, next_pobs=laneP,
                           rew=laneP, next_obs=laneP, done=laneP, cursor=repl)
    stats_spec = repl  # psum'd/pmean'd inside -> identical on every device
    # PER state shards with the ring rows; the running max priority is
    # pmax'd inside the round body so it stays replicated
    per_spec = DevicePER(prios=laneP, max_p=repl)

    in_specs = [repl, carry_spec, ring_spec, repl, repl]
    out_specs = [repl, carry_spec, ring_spec, stats_spec]
    if prioritized:
        in_specs.append(per_spec)
        out_specs.append(per_spec)
    if guided:
        in_specs.append(repl)  # prefix spec: expert corpus replicated

    def local(*args):
        per = exp = None
        i = 5
        if prioritized:
            per = args[i]
            i += 1
        if guided:
            exp = args[i]
        return run_local(*args[:5], per, exp)

    sharded = shard_map(local, mesh=runtime.mesh,
                        in_specs=tuple(in_specs),
                        out_specs=tuple(out_specs), check_vma=False)
    step = jax.jit(sharded, donate_argnums=(0, 1, 2))

    def init(obs_shape, pdim: int = 2):
        env_carry = vec_reset(consts, n_envs)
        ring = ring_init(ring_capacity, obs_shape, pdim=pdim)
        if prioritized:
            return env_carry, ring, per_init(ring_capacity)
        return env_carry, ring

    def run(state, env_carry, ring, rng, rounds_arr, *extra):
        # extra: per-state (when prioritized), then expert corpus (when
        # guided) — both positional, matching in_specs order
        with use_mesh(runtime.mesh):
            return step(state, env_carry, ring, rng, rounds_arr, *extra)

    return run, init
