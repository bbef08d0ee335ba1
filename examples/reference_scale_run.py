"""Reference-scale from-scratch training run — the Gazebo-free analogue of
the reference's headline protocol (main.py:304-417): MAX_EPISODES=800,
MAX_STEPS=800 (config.yaml:9-10), batch 32, buffer 30k, from-scratch SAC
with PER + nan_guard on the kinematic RRC world, followed by the testing.py
evaluation protocol (deterministic episodes, success % + collision count).

Artifacts land in results/ref_scale: episode JSONL (reward curve, SAC
internals), periodic checkpoints, and a final eval row.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/reference_scale_run.py
     [--episodes 800 --eval-episodes 100 --out results/ref_scale]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dgvit_tpu.utils.compcache import enable_persistent_cache

enable_persistent_cache()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=800)
    p.add_argument("--eval-episodes", type=int, default=100,
                   help="testing.py:46 protocol evaluates 100 episodes")
    p.add_argument("--out", default="results/ref_scale")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="run the protocol through the fully-fused on-device "
                        "trainer (train/fused_train.py) instead of the "
                        "per-step host loop. On the tunneled backend the "
                        "host loop measures ~5 env steps/s (each step pays "
                        "a dispatch RTT; tools/bench_rollout.py), making "
                        "800 episodes infeasible; the fused tier keeps the "
                        "reference's learn-per-step cadence, PER, and "
                        "episode budget with the whole round on device")
    p.add_argument("--n-envs", type=int, default=16)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--world", default="rrc",
                   help="arena preset for training (rrc | hospital | "
                        "rand<K> — K procedurally-random layouts, fused/"
                        "vec tiers only: domain randomization over lane "
                        "ensembles, envs/jax_kinematic.make_consts)")
    p.add_argument("--eval-world", default=None,
                   help="arena preset for the final eval (defaults to "
                        "--world; set e.g. --world rand8 --eval-world "
                        "hospital for the domain-randomization transfer "
                        "protocol)")
    p.add_argument("--alpha-min", type=float, default=None,
                   help="opt-in entropy-temperature floor (sac.alpha_min): "
                        "guards against the measured alpha collapse on the "
                        "per-reset-DR arm (BENCH.md round 4)")
    p.add_argument("--alpha-max", type=float, default=None,
                   help="opt-in entropy-temperature ceiling (cfg.sac."
                        "alpha_max). The unclamped reference auto-tune "
                        "diverged on the 2400-episode hospital protocol "
                        "(alpha 10.3, deterministic eval 0/100; BENCH.md)")
    p.add_argument("--aug", action="append", default=None,
                   metavar="KNOB=VALUE",
                   help="fused-path sensor-fault augmentation knob "
                        "(repeatable; envs/fault_aug.py), e.g. "
                        "--aug patch_occlusion=0.25")
    p.add_argument("--aug-prob", type=float, default=1.0)
    p.add_argument("--aug-shift", type=int, default=0,
                   help="update-time DrQ-v2 random-shift augmentation in "
                        "pixels (sac.aug_shift, ops/augment.py): every "
                        "sampled obs/next_obs is re-cropped at a random "
                        "offset before the losses see it — the standard "
                        "pixel-RL regularizer; 0 = reference behavior")
    p.add_argument("--aug-critic-only", action="store_true",
                   help="route the shifted views through the TD target + "
                        "critic regression only (sac.aug_actor=False — the "
                        "actual DrQ-v2 formulation); the actor step sees "
                        "raw frames. Round-5 diagnosis knob for the "
                        "measured shift=4 collapses (BENCH.md round 4)")
    p.add_argument("--aug-warmup", type=int, default=0,
                   help="learn steps before the DrQ shift turns on "
                        "(sac.aug_warmup): the critic calibrates on raw "
                        "frames first")
    p.add_argument("--seed", type=int, default=None,
                   help="training seed override (cfg.train.seed) — the "
                        "seed-replication protocol for the quality arms; "
                        "default keeps the reference SEED 3407")
    p.add_argument("--world-assign", choices=("reset", "lane"),
                   default="reset",
                   help="ensemble lane assignment (fused path): 'reset' = "
                        "per-episode rehash (standard DR), 'lane' = lane-"
                        "pinned (measured better at this budget, BENCH.md "
                        "round 4 stage D)")
    p.add_argument("--host-eval", action="store_true",
                   help="final eval via the per-step host loop instead of "
                        "the single-dispatch vectorized eval (run_eval_vec; "
                        "fp32 env — equality-gated vs the host loop in "
                        "tests/test_jax_kinematic.py)")
    args = p.parse_args(argv)

    from dgvit_tpu.config import Config
    from dgvit_tpu.envs import KinematicNavEnv
    from dgvit_tpu.train.evaluate import run_eval, run_eval_vec
    from dgvit_tpu.train.train_rl import train

    cfg = Config()                      # reference defaults: 800x800, batch 32
    cfg.model.compute_dtype = "bfloat16"
    cfg.sac.prioritized_replay = True
    cfg.sac.nan_guard = True
    cfg.train.pre_train = False         # from scratch
    cfg.train.pre_buffer = False
    cfg.train.plot_interval = 10 ** 9
    cfg.train.eval_threshold = 10 ** 9  # no mid-train eval pauses
    cfg.train.reward_threshold = 10 ** 9
    cfg.train.save_interval = 40    # bounded loss on interruption + --resume
    # tunnel drops of hours were observed mid-round; snapshot the replay
    # buffer next to each periodic checkpoint so a --resume restart keeps a
    # warm buffer (compressed npz; the synthetic depth frames compress well)
    cfg.train.save_replay = True
    cfg.train.desc = "ref_scale_per"
    if args.alpha_max is not None:
        cfg.sac.alpha_max = args.alpha_max
    if args.alpha_min is not None:
        cfg.sac.alpha_min = args.alpha_min
    if args.aug_shift:
        cfg.sac.aug_shift = args.aug_shift
    if args.aug_critic_only:
        cfg.sac.aug_actor = False
    if args.aug_warmup:
        cfg.sac.aug_warmup = args.aug_warmup
    if args.seed is not None:
        cfg.train.seed = args.seed

    fault_knobs = None
    if args.aug:
        if not args.fused:
            p.error("--aug is a fused-path feature (make_collect_fn); "
                    "pass --fused or drop the augmentation flags")
        fault_knobs = {}
        for kv in args.aug:
            k, sep, v = kv.partition("=")
            if not sep or not v:
                p.error(f"--aug expects KNOB=VALUE, got {kv!r}")
            fault_knobs[k.strip()] = float(v)

    t0 = time.time()
    if args.fused:
        from dgvit_tpu.train.fused_train import train_fused

        # one update per collected env step (main.py:394 cadence); episode
        # budget is the stopping criterion, a generous round cap guards
        # against pathological non-termination
        res_f = train_fused(
            cfg, out_dir=args.out, n_envs=args.n_envs, chunk=args.chunk,
            rounds=10 ** 6, rounds_per_dispatch=5,
            max_episodes=args.episodes, resume=args.resume,
            world=args.world, fault_knobs=fault_knobs,
            aug_prob=args.aug_prob, world_assign=args.world_assign)
        train_wall = time.time() - t0
        res = {"successes": res_f["goals"], "episodes": res_f["episodes"],
               "max_mean_reward": float("nan"), "state": res_f["state"],
               "aborted_dead": res_f.get("aborted_dead", False)}
        print(f"fused train done: {res_f['goals']} goals / "
              f"{res_f['episodes']} episodes / {res_f['env_steps']} steps / "
              f"{res_f['updates']} updates in {train_wall / 3600:.2f} h",
              flush=True)
    else:
        env = KinematicNavEnv(seed=3407,     # reference SEED (config.yaml:7)
                              world=args.world)
        res = train(cfg, env, out_dir=args.out, max_episodes=args.episodes,
                    resume=args.resume)
        train_wall = time.time() - t0
        print(f"train done: {res['successes']} goals / {res['episodes']} "
              f"episodes in {train_wall / 3600:.2f} h, max mean reward "
              f"{res['max_mean_reward']:.1f}", flush=True)

    eval_world = args.eval_world or args.world
    if args.host_eval:
        ev = KinematicNavEnv(seed=7, world=eval_world)
        r = run_eval(cfg, ev, res["state"].actor_params,
                     max_episodes=args.eval_episodes, out_dir=args.out,
                     name="ref_scale_eval")
    else:
        # one device dispatch for the whole protocol — on the tunneled
        # backend the per-step host loop would cost hours
        cfg.train.seed = 7  # eval record table seed (matches the old env)
        r = run_eval_vec(cfg, res["state"].actor_params,
                         max_episodes=args.eval_episodes, world=eval_world,
                         out_dir=args.out, name="ref_scale_eval")
    summary = {
        "mode": "fused" if args.fused else "host_loop",
        "world": args.world,
        "eval_world": eval_world,
        "alpha_max": args.alpha_max,
        "alpha_min": args.alpha_min,
        "aug_shift": args.aug_shift,
        "aug_actor": not args.aug_critic_only,
        "aug_warmup": args.aug_warmup,
        "seed": args.seed if args.seed is not None else 3407,
        "aug": fault_knobs,
        "world_assign": args.world_assign,
        "aborted_dead": res.get("aborted_dead", False),
        "aug_prob": args.aug_prob if fault_knobs else None,
        "train_episodes": res["episodes"],
        "train_successes": res["successes"],
        "max_mean_reward": (None if args.fused
                            else round(float(res["max_mean_reward"]), 2)),
        "train_hours": round(train_wall / 3600, 3),
        "eval_success_rate": r["success_rate"],
        "eval_collisions": r.get("collisions"),
        "eval_episodes": args.eval_episodes,
    }
    (Path(args.out) / "summary.json").write_text(json.dumps(summary))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
