"""Evaluation driver — testing.py:40-158 rebuilt: load a trained actor,
run N deterministic episodes, report success rate / collisions / durations,
append results/testing_data.txt.

Two episode loops:
  * host loop (default): reference-shaped Python loop, one device dispatch
    per step (testing.py:103-144).
  * --device-rollout: the whole episode is ONE jitted lax.scan with the env
    behind an ordered io_callback (train/device_rollout.py) — the SURVEY
    §2.3 host-boundary commitment, now reachable from a driver.

Goal-reach durations are reported in SIMULATED seconds (steps * env.DT), not
wall-clock — the reference measured real-time Gazebo where wall-clock was
meaningful; on a kinematic CI world wall-clock would just measure host speed.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import numpy as np

from dgvit_tpu.config import Config
from dgvit_tpu.core import checkpoint as ckpt
from dgvit_tpu.core.rng import RngStream
from dgvit_tpu.envs import Env, KinematicNavEnv
from dgvit_tpu.models import build_actor
from dgvit_tpu.utils import MetricsLogger


def _maybe_stacker(cfg: Config):
    """Channels-mode actors (the Imitation_learning.py:118-121 frame-stacked
    patch embed) consume (C, H, W) observations; single-frame envs feed them
    through an online FrameStacker."""
    if cfg.model.patch_mode == "channels":
        from dgvit_tpu.train.train_rl import FrameStacker
        return FrameStacker(cfg.env.frame_stack)
    return None


def _squeeze_obs(state: np.ndarray) -> np.ndarray:
    return np.squeeze(state, -1) if state.ndim == 3 else state


def run_eval(cfg: Config, env: Env, actor_params, max_episodes: int = 100,
             out_dir: str = "results", name: str = "model",
             device_rollout_loop: bool = False) -> dict:
    e = cfg.env
    rng = RngStream(cfg.train.seed)
    dt = float(getattr(env, "DT", 0.1))  # sim-time per step (env_lab.py:204)
    # a reused env carries its previous run's collision count — reset so the
    # returned dict reports THIS eval's collisions
    if hasattr(env, "collision"):
        env.collision = 0

    if device_rollout_loop:
        return _run_eval_device(cfg, env, actor_params, max_episodes,
                                out_dir, name, dt)

    actor = build_actor(cfg)
    stacker = _maybe_stacker(cfg)
    deterministic_actor = cfg.model.actor_type.startswith("Deterministic")

    @jax.jit
    def act_fn(params, obs, goal):
        out = actor.apply({"params": params}, obs[None], goal[None],
                          inference=True)
        if deterministic_actor:
            # Deterministic* actors return the tanh-squashed action directly
            # (got_sac_network.py:385,447 / vit_sac_network.py:428) — a
            # second tanh here would double-squash it.
            return out[0]
        mean, _ = out
        return jax.numpy.tanh(mean)[0]  # deterministic mean action

    cntr2 = 0
    total_rel = max_episodes
    durations = []
    for ep in range(max_episodes):
        r = env.reset()
        obs = _squeeze_obs(r.state)
        if stacker:
            obs = stacker.reset(obs)
        goal = r.to_goal
        for timestep in range(e.max_steps):
            a = np.asarray(act_fn(actor_params, jax.numpy.asarray(obs),
                                  jax.numpy.asarray(goal[:2])))
            a = a.clip(-e.max_action, e.max_action)
            a_in = [(a[0] + 1) * e.linear_cmd_scale, a[1] * e.angular_cmd_scale]
            s = env.step(a_in, timestep)
            obs = _squeeze_obs(s.state)
            if stacker:
                obs = stacker.push(obs)
            goal = s.to_goal
            if timestep == 0 and s.done:
                total_rel -= 1  # Bad initialization (testing.py:117-121)
                break
            if s.target:
                cntr2 += 1
                durations.append((timestep + 1) * dt)
            if s.done or timestep == e.max_steps - 1:
                break

    return _report(cfg, env, cntr2, total_rel, durations, out_dir, name)


def _run_eval_device(cfg: Config, env: Env, actor_params, max_episodes: int,
                     out_dir: str, name: str, dt: float) -> dict:
    """Episode loop as the jitted io_callback scan (device_rollout)."""
    from dgvit_tpu.agents import SACAgent
    from dgvit_tpu.train.device_rollout import device_rollout

    if cfg.model.patch_mode == "channels":
        raise ValueError("--device-rollout does not support frame-stacked "
                         "(channels-mode) actors yet; use the host loop")

    e = cfg.env
    agent = SACAgent(cfg)
    state = agent.init_state(cfg.train.seed).replace(actor_params=actor_params)

    cntr2 = 0
    total_rel = max_episodes
    durations = []
    for ep in range(max_episodes):
        try:
            out = device_rollout(agent, state, env, e.max_steps,
                                 e.linear_cmd_scale, e.angular_cmd_scale,
                                 jax.random.PRNGKey(cfg.train.seed + ep),
                                 evaluate=True)
        except jax.errors.JaxRuntimeError as err:
            if ep == 0 and "UNAVAILABLE" in str(err):
                # known limitation: host callbacks cannot cross the tunneled
                # PJRT backend (the remote runtime can't call back into this
                # process), so the io_callback program fails at setup — fall
                # back to the host loop rather than dying (BENCH.md pitfalls)
                print("[evaluate] io_callback unsupported on this backend "
                      f"({err}); falling back to the host loop", flush=True)
                return run_eval(cfg, env, actor_params,
                                max_episodes=max_episodes,
                                out_dir=out_dir, name=name)
            raise
        dones = np.asarray(out.dones)
        targets = np.asarray(out.targets)
        if dones[0] > 0:
            total_rel -= 1  # Bad initialization (testing.py:117-121)
            continue
        hit = np.flatnonzero(targets > 0)
        if hit.size:
            cntr2 += 1
            durations.append(float(hit[0] + 1) * dt)

    return _report(cfg, env, cntr2, total_rel, durations, out_dir, name)


def run_eval_vec(cfg: Config, actor_params, max_episodes: int = 100,
                 world: str = "rrc", out_dir: str = "results",
                 name: str = "model", obs_noise: float = 0.0,
                 occlusion: float = 0.0, greying: float = 0.0,
                 sweep=None, world_seed=None):
    """All eval episodes at once: lanes = episodes on the pure-JAX
    vectorized kinematic env (envs/jax_kinematic.py), the whole protocol ONE
    jitted scan dispatch (vs one dispatch per step in the host loop — on a
    tunneled backend this is the difference between seconds and hours).

    Matches run_eval semantics per lane: deterministic actions, bad-init
    exclusion (testing.py:117-121), success/collision latched at the FIRST
    episode end, durations in simulated seconds. Lane i runs record i mod
    n_records (the host loop cycles the same table sequentially).

    Sensor-fault robustness study (the reference's perturbation suite,
    env_lab.py:33-67, applied in-graph so a whole sweep point is still one
    dispatch): `obs_noise` adds N(0, sigma) on the [0,1] depth scale
    (add_nose's sigma=50/255 ~= 0.196), `occlusion` zeroes a random pixel
    fraction (pixel_occlusion), `greying` blends toward mid-grey
    (greying_out).

    `sweep`: a list of {obs_noise, blur, occlusion, patch_occlusion,
    greying} dicts — the whole robustness grid through ONE compile: the
    fault magnitudes become dynamic scalars in the jitted program
    (where-gated so a 0.0 knob is bit-identical to the unperturbed path)
    and each point is one cheap dispatch. Two sweep-only knobs complete
    the reference's five-fault family (env_lab.py:33-90): `blur` blends
    toward the 5x5-Gaussian-blurred frame (add_nose's blur stage; the
    blend factor is the jit-friendly severity dial — kernel size would
    recompile), and `patch_occlusion` zeroes ONE random contiguous
    rectangle of that area fraction per lane per step (the jittable
    analog of superpixel_occlusion's contiguous-region dropout,
    env_lab.py:49-59). Returns a list of reports (knob values folded in)
    instead of a single dict. The static single-point path is unchanged —
    it skips the perturbation RNG draws entirely when all knobs are 0."""
    import jax.numpy as jnp

    from dgvit_tpu.agents import SACAgent
    from dgvit_tpu.envs.jax_kinematic import make_consts, vec_reset, vec_step
    from dgvit_tpu.train.vec_rollout import stack_init, stack_push

    # channels-mode actors (Imitation_learning.py:118-121) consume a
    # (C, H, W) frame stack — carried in-graph like the host FrameStacker
    fs = (int(cfg.env.frame_stack)
          if cfg.model.patch_mode == "channels" else 0)
    e = cfg.env
    agent = SACAgent(cfg)
    # held-out by default for procedural-ensemble specs: a rand<K> EVAL
    # seeded with the training seed would re-draw the first K TRAINING
    # layouts (worlds.random_ensemble member i <- 1000*seed+i), silently
    # un-holding-out the metric. Evals on rand specs therefore derive a
    # disjoint seed stream unless the caller pins `world_seed` (pass the
    # training seed explicitly for a training-distribution eval).
    seed = world_seed
    if seed is None:
        seed = cfg.train.seed
        if isinstance(world, str) and world.startswith("rand"):
            seed = cfg.train.seed + 1_000_003
    consts = make_consts(world=world, image_hw=tuple(cfg.model.image_size),
                         max_steps=e.max_steps, seed=seed)
    dt = float(consts.dt)

    dyn = sweep is not None

    @jax.jit
    def run(params, rng, knobs):
        state, obs, goal = vec_reset(consts, max_episodes)
        if fs:
            obs = stack_init(obs, fs)
        b = max_episodes
        f = jnp.zeros(b, bool)
        init = (state, obs, goal, f, f, f, jnp.zeros(b), f)

        def perturb(obs, key):
            if dyn:
                # dynamic knobs: one compile serves the whole sweep grid.
                # where-gated so a 0.0 knob is bit-identical to clean obs
                # (the draws still happen — their split count is fixed, so
                # noise realizations are PAIRED across sweep points).
                # Shared with training-time augmentation (envs/fault_aug).
                from dgvit_tpu.envs.fault_aug import perturb_obs

                return perturb_obs(obs, key, knobs)
            if obs_noise > 0.0:
                key, k = jax.random.split(key)
                obs = jnp.clip(obs + obs_noise * jax.random.normal(
                    k, obs.shape), 0.0, 1.0)
            if occlusion > 0.0:
                key, k = jax.random.split(key)
                keep = jax.random.uniform(k, obs.shape) >= occlusion
                obs = obs * keep
            if greying > 0.0:
                obs = obs * (1.0 - greying) + 0.5 * greying
            return obs

        def body(c, t):
            state, obs, goal, ended, succ, coll, dur, bad = c
            key = jax.random.fold_in(rng, t)
            key, k_pert = jax.random.split(key)
            # perturbation affects what the policy SEES this step only —
            # the clean frames stay in the carry (and the frame stack)
            obs_in = perturb(obs, k_pert)
            a = agent._act_impl(params, key, obs_in, goal[:, :2], True, False)
            a = jnp.clip(a, -e.max_action, e.max_action)
            a_in = jnp.stack([(a[:, 0] + 1.0) * e.linear_cmd_scale,
                              a[:, 1] * e.angular_cmd_scale], axis=1)
            a_in = jnp.where(ended[:, None], 0.0, a_in)
            out = vec_step(consts, state, a_in)
            bad = bad | ((t == 0) & out.done)
            live = ~ended & ~bad
            hit = out.target & live
            succ = succ | hit
            dur = jnp.where(hit, (t + 1.0) * dt, dur)
            coll = coll | (out.collided & live)
            ended = ended | out.done | out.truncated | bad
            if fs:
                restart = (out.done | out.truncated)[:, None, None, None]
                carry_obs = jnp.where(restart, stack_init(out.obs, fs),
                                      stack_push(obs, out.next_obs))
            else:
                carry_obs = out.obs
            return (out.state, carry_obs, out.to_goal, ended, succ, coll,
                    dur, bad), None

        (state, obs, goal, ended, succ, coll, dur, bad), _ = jax.lax.scan(
            body, init, jnp.arange(e.max_steps))
        return succ, coll, dur, bad

    from dgvit_tpu.envs.fault_aug import KNOB_KEYS as knob_keys
    from dgvit_tpu.envs.fault_aug import knobs_array

    rng = jax.random.PRNGKey(cfg.train.seed)
    points = sweep if dyn else [
        {"obs_noise": obs_noise, "occlusion": occlusion, "greying": greying}]
    reports = []
    for pt in points:
        knobs = knobs_array(pt)
        succ, coll, dur, bad = run(actor_params, rng, knobs)
        succ, coll, dur, bad = (np.asarray(succ), np.asarray(coll),
                                np.asarray(dur), np.asarray(bad))
        total_rel = int(max_episodes - bad.sum())
        cntr2 = int(succ.sum())
        durations = [float(d) for d in dur[succ]]

        class _C:  # collision count carrier for _report
            collision = int(coll.sum())

        tag = name if not dyn else (
            name + " " + ",".join(f"{k}={v}" for k, v in sorted(pt.items())
                                  if v))
        rep = _report(cfg, _C(), cntr2, total_rel, durations, out_dir, tag)
        rep.update({k: float(pt.get(k, 0.0)) for k in knob_keys})
        rep["world"], rep["world_seed"] = world, int(seed)
        reports.append(rep)
    return reports if dyn else reports[0]


def run_eval_fleet(cfg: Config, actor_params, max_episodes: int = 100,
                   n_robots: int = 8, world: str = "rrc",
                   out_dir: str = "results", name: str = "model",
                   env_kind: str = "kinematic") -> dict:
    """The evaluation protocol as a FLEET: episodes split across n_robots
    concurrent KinematicNavEnv clients sharing one BatchingActorServer
    (serve/fleet.py), so the device sees coalesced bucket dispatches
    instead of one per step — the many-robot deployment shape, and on a
    remote-attached chip also the fastest host-loop eval."""
    from dgvit_tpu.serve import make_action_fn, serve_fleet

    if max_episodes % n_robots:
        raise ValueError(f"--episodes {max_episodes} must divide evenly "
                         f"across --fleet {n_robots} robots")
    act = jax.jit(make_action_fn(cfg, actor_params))
    if env_kind == "ros2":
        # live multi-robot Gazebo world: namespaced adapters, free-running
        # physics (serve/fleet.py make_ros2_fleet contract)
        from dgvit_tpu.serve import make_ros2_fleet
        envs = make_ros2_fleet(cfg, n_robots)
    else:
        envs = [KinematicNavEnv(seed=cfg.train.seed + i,
                                image_hw=tuple(cfg.model.image_size),
                                world=world)
                for i in range(n_robots)]
    out = serve_fleet(cfg, envs, act,
                      episodes_per_robot=max_episodes // n_robots)
    if out["errors"]:
        # FleetRunner returns partial results (robot errors attached); the
        # EVAL protocol is strict — an incomplete campaign is not a result
        raise RuntimeError(f"fleet eval incomplete, robots failed: "
                           f"{out['errors']}")

    class _C:
        collision = out["collisions"]

    rep = _report(cfg, _C(), out["successes"],
                  out["episodes"], out["durations"], out_dir, name)
    rep["serving"] = out["serving"]
    return rep


def _report(cfg: Config, env: Env, cntr2: int, total_rel: int, durations,
            out_dir: str, name: str) -> dict:
    e = cfg.env
    s_r = cntr2 / max(total_rel, 1)
    logger = MetricsLogger(out_dir, "testing")
    logger.append_txt(
        "testing_data.txt",
        "\n" + "-" * 40 + "/*/*/*/*/*/*/" + "-" * 40 + "\n"
        f"Model = {name} Sensor = {e.vis_sensor}\n"
        f"Number total of success : {cntr2} with percentage : "
        f"{s_r * 100:.1f} %\n")
    return {"successes": cntr2, "success_rate": s_r,
            "collisions": getattr(env, "collision", 0),
            "durations": durations}


def main(argv=None):
    p = argparse.ArgumentParser(description="dgvit_tpu evaluation")
    p.add_argument("--actor", default=None,
                   help="actor params npz (save_params_npz output)")
    p.add_argument("--checkpoint", default=None,
                   help="full train-state checkpoint: a step_N directory or "
                        "a checkpoints/ dir (newest step is used). Evaluates "
                        "the actor inside a train_rl periodic/elastic "
                        "checkpoint without a separate npz export — the "
                        "testing.py workflow on mid-run checkpoints")
    p.add_argument("--platform", default=os.environ.get("DGVIT_PLATFORM"),
                   help="force a jax backend (e.g. 'cpu'). Needed on hosts "
                        "where a tunneled TPU backend is registered eagerly "
                        "and the JAX_PLATFORMS env var is ignored")
    p.add_argument("--config", default=None)
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--out", default="results")
    p.add_argument("--world", default="rrc",
                   help="kinematic world preset (rrc | hospital) — "
                        "'hospital' is the unseen-layout generalization "
                        "eval (reference README.md:43-51, hospital.world). "
                        "With --vec-eval, rand<K>/randh<K>/randm<K> specs "
                        "run each episode in a hashed procedural layout — "
                        "a held-out-ENSEMBLE generalization metric (the "
                        "eval seed differs from training, so the layouts "
                        "are never-seen)")
    p.add_argument("--device-rollout", action="store_true",
                   help="run each episode as one jitted io_callback scan "
                        "(policy + action scaling on device; env on host)")
    p.add_argument("--fleet", type=int, default=0, metavar="N",
                   help="run the protocol as N concurrent robots sharing "
                        "one micro-batching actor server (serve/fleet.py); "
                        "episodes split evenly across robots")
    p.add_argument("--fleet-env", default="kinematic",
                   choices=["kinematic", "ros2"],
                   help="robot backend for --fleet: kinematic lanes (CI/"
                        "bench) or namespaced GazeboRos2Env adapters over a "
                        "live multi-robot Gazebo world (free-running "
                        "physics)")
    p.add_argument("--vec-eval", action="store_true",
                   help="run ALL episodes at once as lanes of the pure-JAX "
                        "vectorized kinematic env — the whole protocol is "
                        "one device dispatch (envs/jax_kinematic.py)")
    p.add_argument("--world-seed", type=int, default=None,
                   help="pin the world/record-table seed for --vec-eval. "
                        "Default: the config seed — EXCEPT for procedural "
                        "rand<K> specs, which derive a disjoint eval "
                        "stream so the ensemble is genuinely held-out "
                        "(pass the training seed explicitly to evaluate "
                        "on the training distribution)")
    p.add_argument("--obs-noise", type=float, default=0.0,
                   help="robustness study (vec-eval only): N(0, sigma) "
                        "sensor noise on the [0,1] scale (env_lab add_nose "
                        "sigma=50/255 ~= 0.196)")
    p.add_argument("--occlusion", type=float, default=0.0,
                   help="robustness study (vec-eval only): random pixel "
                        "dropout fraction (env_lab pixel_occlusion)")
    p.add_argument("--greying", type=float, default=0.0,
                   help="robustness study (vec-eval only): blend toward "
                        "mid-grey (env_lab greying_out)")
    args = p.parse_args(argv)
    if bool(args.actor) == bool(args.checkpoint):
        p.error("exactly one of --actor / --checkpoint is required")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = Config.from_yaml(args.config) if args.config else Config()
    # the host env only serves the host-loop path (run_eval); --vec-eval /
    # --fleet build their own worlds, and rand<K>/randh<K>/randm<K>
    # procedural-ensemble specs exist ONLY there — constructing the host
    # env eagerly would reject them (get_world knows presets, not specs)
    env = (None if (args.vec_eval or args.fleet) else
           KinematicNavEnv(seed=cfg.train.seed,
                           image_hw=tuple(cfg.model.image_size),
                           world=args.world))
    if args.checkpoint:
        from dgvit_tpu.agents.sac import SACAgent
        path = args.checkpoint
        if not os.path.basename(os.path.normpath(path)).startswith("step_"):
            path = ckpt.latest_checkpoint(path)
            if path is None:
                p.error(f"no step_* checkpoints under {args.checkpoint}")
        state = ckpt.restore_train_state(
            path, SACAgent(cfg).init_state(cfg.train.seed))
        params, name = state.actor_params, os.path.basename(path)
    else:
        actor = build_actor(cfg)
        ih, iw = cfg.model.image_size
        if cfg.model.patch_mode == "channels":
            obs0 = np.zeros((1, cfg.env.frame_stack, ih, iw))
        else:
            obs0 = np.zeros((1, ih, iw))
        template = actor.init(jax.random.PRNGKey(0), obs0,
                              np.zeros((1, cfg.sac.pstate_dim)))["params"]
        params = ckpt.load_params_npz(args.actor, template)
        name = os.path.basename(args.actor)
    if args.fleet and (args.vec_eval or args.device_rollout):
        p.error("--fleet is a host-loop mode; it composes with neither "
                "--vec-eval nor --device-rollout")
    if args.fleet:
        out = run_eval_fleet(cfg, params, args.episodes, args.fleet,
                             args.world, args.out, name,
                             env_kind=args.fleet_env)
    elif args.vec_eval:
        out = run_eval_vec(cfg, params, args.episodes, args.world,
                           args.out, name, obs_noise=args.obs_noise,
                           occlusion=args.occlusion, greying=args.greying,
                           world_seed=args.world_seed)
    else:
        out = run_eval(cfg, env, params, args.episodes, args.out, name,
                       device_rollout_loop=args.device_rollout)
    print(f"success rate: {out['success_rate'] * 100:.1f}% "
          f"({out['successes']} goals), collisions: {out['collisions']}")


if __name__ == "__main__":
    main()
