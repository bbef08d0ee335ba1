"""Unseen-world generalization experiment — the Gazebo-free analogue of the
reference's hospital.world evaluation (README.md:43-51): train a policy in
the RRC arena, then evaluate it on BOTH the training arena and the hospital
layout it never saw.

Pipeline (all on-device, kinematic env):
  1. BC warm-start from scripted-pilot demos recorded in the RRC arena
     (the PRE_TRAIN workflow, main.py:272-274)
  2. SAC fine-tuning in the RRC arena (train_rl driver)
  3. 30-episode evals on rrc and hospital presets (testing.py protocol)

Run: PYTHONPATH=. python examples/generalization_eval.py
     [--bc-episodes 100 --bc-epochs 120 --rl-episodes 80 --eval-episodes 30]
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from dgvit_tpu.agents.bc import BCTrainer
from dgvit_tpu.config import Config
from dgvit_tpu.core import checkpoint as ckpt
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.models.policies import GoTPolicy
from dgvit_tpu.train.demo_record import record_episodes, scripted_pilot
from dgvit_tpu.train.evaluate import run_eval
from dgvit_tpu.train.train_bc import load_bc_dataset
from dgvit_tpu.train.train_rl import train


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bc-episodes", type=int, default=100)
    p.add_argument("--bc-epochs", type=int, default=120)
    p.add_argument("--rl-episodes", type=int, default=80)
    p.add_argument("--eval-episodes", type=int, default=30)
    p.add_argument("--alpha-init", type=float, default=1.0,
                   help="starting entropy temperature for the SAC fine-tune "
                        "(round-2 result: 1.0 washes out the BC warm start; "
                        "0.05 preserves it)")
    p.add_argument("--alpha-max", type=float, default=None,
                   help="opt-in entropy-temperature ceiling (sac.alpha_max) "
                        "for long fine-tunes; the unclamped auto-tune "
                        "diverged at 2400 episodes (BENCH.md session 6)")
    p.add_argument("--guidence-weight", type=float, default=1.0,
                   help="expert BC anchor weight (DRL.py:51); the reward "
                        "scale is +-200 so Q-magnitudes dwarf the default")
    p.add_argument("--gw-final", type=float, default=None,
                   help="decay guidence_weight geometrically to this value "
                        "(anchor-early / specialize-late curriculum)")
    p.add_argument("--gw-decay-steps", type=int, default=0,
                   help="learn steps over which the gw decay completes")
    p.add_argument("--per", action="store_true",
                   help="prioritized replay for the fine-tune (IS-weighted "
                        "loss + TD-error priorities; BENCH.md: +44%% goals "
                        "from scratch)")
    p.add_argument("--expert-buffer", action="store_true",
                   help="reference PRE_BUFFER workflow: feed the recorded "
                        "demos to learn_guidence as the expert buffer")
    p.add_argument("--skip-rl", action="store_true",
                   help="evaluate the BC warm start only")
    p.add_argument("--demos", default=None,
                   help="reuse demo npz dir from a previous run (skip "
                        "re-recording)")
    p.add_argument("--bc-params", default=None,
                   help="reuse a saved BC warm-start npz base path (skip "
                        "demos + BC)")
    p.add_argument("--fused", action="store_true",
                   help="run the SAC fine-tune through the fully-fused "
                        "on-device loop (train/fused_train.py) with the "
                        "demo corpus HBM-staged for expert guidance — the "
                        "same recipe at dispatch-free speed; --rl-episodes "
                        "becomes the fused run's MAX_EPISODES budget")
    p.add_argument("--n-envs", type=int, default=16)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--dim", type=int, default=64,
                   help="GoT latent dim (tools/bench_d128.py: d128 costs "
                        "~the same wall-clock as d64 on v5e — capacity is "
                        "free; pair --bc-params only with a fit at the same "
                        "dim)")
    p.add_argument("--dim-head", type=int, default=64)
    p.add_argument("--train-world", default="rrc",
                   help="arena for the SAC fine-tune stage: rrc | hospital "
                        "| rand<K> (fused tier: K-layout domain-"
                        "randomization ensemble). Demos/BC stay RRC — "
                        "training on hospital turns the experiment into "
                        "guided direct training on the harder world")
    p.add_argument("--vec-eval", action="store_true",
                   help="single-dispatch vectorized evals (run_eval_vec) "
                        "instead of the per-step host loop")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a jax backend (the axon sitecustomize locks "
                        "the tunneled TPU in; JAX_PLATFORMS alone is "
                        "ignored — BENCH.md pitfalls)")
    p.add_argument("--seed", type=int, default=1,
                   help="RL fine-tune seed (cfg.train.seed / host env "
                        "seed) — the seed-replication protocol for the "
                        "recipe arms; 1 = the historical default every "
                        "round-3/4 arm used")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache AFTER any backend override — the cache dir is
    # segregated per platform tag (utils/compcache.py: tunnel AOT entries
    # SIGILL CPU processes). Repeat sweep arms (gw grid, seed replicates)
    # reuse the fused-program compile instead of paying it per arm.
    from dgvit_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache(
        platform_tag="cpu" if args.platform == "cpu" else "axon")

    out = Path(args.out or tempfile.mkdtemp(prefix="gen_eval_"))
    print(f"workdir: {out}", flush=True)

    cfg = Config()
    cfg.model.compute_dtype = "bfloat16"  # TPU fast path
    cfg.model.latent_size = args.dim
    cfg.model.dim_head = args.dim_head
    # NB --bc-params must come from a fit at the SAME --dim; the npz loader
    # shape-asserts every leaf, so a mismatched reuse fails loudly at load
    cfg.train.pre_buffer = False
    cfg.train.plot_interval = 10 ** 9
    cfg.train.eval_threshold = 10 ** 9   # no mid-train eval pauses
    cfg.env.max_steps = 200
    l_s, a_s = cfg.env.linear_cmd_scale, cfg.env.angular_cmd_scale

    # ---- 1. demos + BC (deployment-consistent action units) ----------------
    def pilot_norm(obs, goal, t):
        v, w = scripted_pilot(obs, goal, t)
        return [np.clip(v / l_s - 1.0, -1, 1), np.clip(w / a_s, -1, 1)]

    demo_dir = Path(args.demos) if args.demos else out / "demos"

    def demo_glob() -> str:
        # historical layout: <demos>/RRC/jax/*.npz (scripted-pilot corpus);
        # teacher corpora (tools/record_teacher_demos.py) land under
        # <demos>/<world>/teacher/ — accept any two-level layout
        sub = demo_dir / "RRC" / "jax"
        return (str(sub / "*.npz") if sub.is_dir()
                else str(demo_dir / "*" / "*" / "*.npz"))
    if args.bc_params:
        hist = None
        import shutil
        (out / "il").mkdir(parents=True, exist_ok=True)
        shutil.copy(args.bc_params + "_actor.npz",
                    str(out / "il" / "bc_warm_actor.npz"))
        print(f"reusing BC warm start: {args.bc_params}", flush=True)
    else:
        if args.demos is None:
            env = KinematicNavEnv(seed=0)
            paths = record_episodes(env, pilot_norm, str(demo_dir),
                                    episodes=args.bc_episodes, max_steps=200,
                                    action_to_env=lambda a: [(a[0] + 1) * l_s,
                                                             a[1] * a_s])
            print(f"recorded {len(paths)} demo episodes", flush=True)
        obs, act, goal = load_bc_dataset(demo_glob())
        print(f"BC dataset: {obs.shape[0]} transitions", flush=True)

        policy = GoTPolicy(final_norm="rms", emb_dropout=0.0,
                           l_f_size=args.dim, dim_head=args.dim_head)
        tr = BCTrainer(model=policy, batch_size=64, seed=1)
        best, hist = tr.fit(obs, goal, act, epochs=args.bc_epochs, to_chw=False)
        print(f"BC val RMSE: {min(hist['val']):.4f}", flush=True)
        ckpt.save_params_npz(str(out / "il"), "bc_warm", best)

    # ---- 2. SAC fine-tune in the RRC arena ---------------------------------
    if args.skip_rl:
        assert not args.bc_params, "--skip-rl needs a fresh BC fit"
        actor_params = best
        res = {"successes": 0, "episodes": 0}
        hist_note = "bc-only"
    else:
        cfg.train.pre_train = True
        cfg.train.pre_train_model = str(out / "il" / "bc_warm")
        cfg.sac.alpha = args.alpha_init
        cfg.sac.alpha_max = args.alpha_max
        cfg.sac.guidence_weight = args.guidence_weight
        cfg.sac.guidence_weight_final = args.gw_final
        cfg.sac.guidence_decay_steps = args.gw_decay_steps
        cfg.sac.prioritized_replay = args.per
        cfg.sac.nan_guard = True   # amplified guidance losses can overflow a
                                   # bf16 update; roll back instead of dying
        expert_glob = None
        if args.expert_buffer:
            cfg.train.pre_buffer = True
            expert_glob = demo_glob()
        if args.fused:
            from dgvit_tpu.train.fused_train import train_fused

            cfg.train.seed = args.seed
            res_f = train_fused(cfg, out_dir=str(out / "rl"),
                                n_envs=args.n_envs, chunk=args.chunk,
                                rounds=10 ** 6, rounds_per_dispatch=5,
                                max_episodes=args.rl_episodes,
                                expert_glob=expert_glob,
                                world=args.train_world)
            res = {"successes": res_f["goals"],
                   "episodes": res_f["episodes"],
                   "max_mean_reward": float("nan"), "state": res_f["state"]}
            print(f"fused SAC: {res_f['goals']} goals / "
                  f"{res_f['episodes']} episodes / {res_f['updates']} "
                  f"updates", flush=True)
        else:
            env_rl = KinematicNavEnv(seed=args.seed, world=args.train_world)
            res = train(cfg, env_rl, out_dir=str(out / "rl"),
                        max_episodes=args.rl_episodes,
                        expert_glob=expert_glob)
            print(f"SAC: {res['successes']} goals in {res['episodes']} "
                  f"episodes, max mean reward {res['max_mean_reward']:.1f}",
                  flush=True)
        actor_params = res["state"].actor_params
        hist_note = (f"alpha0={args.alpha_init} expert={args.expert_buffer} "
                     + (f"amax={args.alpha_max} "
                        if args.alpha_max is not None else "")
                     + f"gw={args.guidence_weight}"
                     + (f"->{args.gw_final}@{args.gw_decay_steps}"
                        if args.gw_final is not None else "")
                     + (" per" if args.per else "")
                     + (f" d={args.dim}" if args.dim != 64 else "")
                     + (f" train_world={args.train_world}"
                        if args.train_world != "rrc" else ""))

    # ---- 3. evals: seen (rrc) vs unseen (hospital) --------------------------
    results = {}
    for world in ("rrc", "hospital"):
        if args.vec_eval:
            from dgvit_tpu.train.evaluate import run_eval_vec
            r = run_eval_vec(cfg, actor_params,
                             max_episodes=args.eval_episodes, world=world,
                             out_dir=str(out / "eval"), name=f"gen_{world}")
        else:
            ev = KinematicNavEnv(seed=7, world=world)
            r = run_eval(cfg, ev, actor_params,
                         max_episodes=args.eval_episodes,
                         out_dir=str(out / "eval"), name=f"gen_{world}")
        results[world] = r["success_rate"]
        print(f"[{world}] success rate: {r['success_rate'] * 100:.1f}% "
              f"({r['successes']}/{args.eval_episodes})", flush=True)

    # exportable deployment artifact (testing.py workflow: the actor IS the
    # deliverable) — held-out/robustness evals read <out>/final_actor.npz
    ckpt.save_params_npz(str(out), "final", actor_params)
    print(json.dumps({"rrc": results["rrc"], "hospital": results["hospital"],
                      "bc_val_rmse": (float(min(hist["val"])) if hist else None),
                      "sac_goals": res["successes"], "recipe": hist_note}))


if __name__ == "__main__":
    main()
