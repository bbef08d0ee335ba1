"""Attention-map visualization over a live episode — the reference's
headline introspection feature (visualizer.py get_local hooked at
simple_vit.py:61; attention heatmaps feature in README.md GIFs), Gazebo-free.

Loads a trained actor, drives one kinematic episode with the deterministic
policy while capturing every block's softmax maps (GoTPolicy(capture=True)
+ utils.visualizer.AttentionVisualizer), and writes a PNG grid: depth frame
with the goal-token attention of each transformer block overlaid (the
goal token's row — where the policy looks to decide the next command).

Run: PYTHONPATH=/root/repo python examples/attention_maps.py \
       [--actor artifacts/r3/gen_fused/gw10_winner_actor.npz] \
       [--steps 40 --every 8 --out results/attention]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--actor",
                   default="artifacts/r3/gen_fused/gw10_winner_actor.npz")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--every", type=int, default=8,
                   help="snapshot cadence (env steps between rows)")
    p.add_argument("--world", default="rrc")
    p.add_argument("--out", default="results/attention")
    p.add_argument("--platform", default="cpu",
                   help="attention capture materializes (B, H, N, N) maps - "
                        "the composed path runs everywhere; cpu is fine")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dgvit_tpu.config import Config
    from dgvit_tpu.core import checkpoint as ckpt
    from dgvit_tpu.envs import KinematicNavEnv
    from dgvit_tpu.models import GoTPolicy
    from dgvit_tpu.utils.visualizer import AttentionVisualizer

    cfg = Config()
    m = cfg.model
    kw = dict(block=m.block, head=m.head, l_f_size=m.latent_size,
              dim_head=m.dim_head, mlp_dim=m.mlp_dim,
              image_size=tuple(m.image_size), patch_size=tuple(m.patch_size),
              action_dim=cfg.sac.action_dim, pstate_dim=cfg.sac.pstate_dim)
    actor = GoTPolicy(**kw)                       # template for the loader
    template = actor.init(jax.random.PRNGKey(0), np.zeros((1, 128, 160)),
                          np.zeros((1, 2)))["params"]
    params = ckpt.load_params_npz(args.actor, template)

    viz = AttentionVisualizer(GoTPolicy(capture=True, **kw),
                              {"params": params})
    viz.activate()

    env = KinematicNavEnv(seed=11, world=args.world)
    e = cfg.env
    r = env.reset()
    obs, goal = np.squeeze(r.state), r.to_goal
    ph, pw = m.patch_size
    gh, gw = m.image_size[0] // ph, m.image_size[1] // pw  # patch grid
    rows = []                                              # (frame, [maps], a)
    for t in range(args.steps):
        viz.clear()
        mean, _ = viz(obs[None], np.asarray(goal[:2])[None])
        a = np.tanh(np.asarray(mean, np.float32))[0]
        if t % args.every == 0:
            per_block = []
            for key in sorted(viz.cache):
                att = viz.cache[key][0]            # (H, N, N)
                g_row = att.mean(0)[0, 1:]         # goal row, patch tokens
                per_block.append(g_row.reshape(gh, gw))
            rows.append((obs.copy(), per_block, a.copy()))
        s = env.step([(a[0] + 1) * e.linear_cmd_scale,
                      a[1] * e.angular_cmd_scale], t)
        obs, goal = np.squeeze(s.state), s.to_goal
        if s.done:
            break

    n_blocks = len(rows[0][1])
    fig, axes = plt.subplots(len(rows), n_blocks + 1,
                             figsize=(2.2 * (n_blocks + 1), 1.9 * len(rows)),
                             squeeze=False)
    for i, (frame, maps, a) in enumerate(rows):
        axes[i][0].imshow(frame, cmap="gray")
        axes[i][0].set_ylabel(f"t={i * args.every}", fontsize=8)
        axes[i][0].set_title(f"v={a[0]:+.2f} w={a[1]:+.2f}", fontsize=7)
        for j, mp in enumerate(maps):
            up = np.kron(mp, np.ones((ph, pw)))   # patch grid -> pixels
            axes[i][j + 1].imshow(frame, cmap="gray")
            axes[i][j + 1].imshow(up, cmap="inferno", alpha=0.55)
            if i == 0:
                axes[i][j + 1].set_title(f"block {j} goal-attn", fontsize=7)
    for ax in fig.axes:
        ax.set_xticks([]), ax.set_yticks([])
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    dest = out / "goal_attention.png"
    fig.tight_layout()
    fig.savefig(dest, dpi=110)
    print(f"wrote {dest} ({len(rows)} timesteps x {n_blocks} blocks)")


if __name__ == "__main__":
    main()
