"""AOT actor export via jax.export — the deployable artifact as ONE file.

What gets exported is the full deterministic deployment map the evaluation
drivers use (train/evaluate.py:66-92, mirroring testing.py:103-144 +
main.py:320,370):

    act(obs[b, ...], goal[b, 2]) -> action[b, 2]

* Gaussian actors: tanh(mean) (the reference's evaluate=True branch,
  got_sac_network.py:205-220); Deterministic* actors return their squashed
  action directly (a second tanh would double-squash,
  got_sac_network.py:385,447).
* optional `env_units=True` bakes in the action clip and command scaling
  a_in = [(a0+1)*L_SCALE, a1*A_SCALE] (main.py:320,370) so the artifact
  emits robot velocity commands directly.

The export traces the composed XLA block path (attn_impl='xla'): the fused
Pallas kernels are TPU-specific custom calls and shape-specialized, so a
portable, batch-polymorphic artifact must avoid them. The exported module
is StableHLO — loadable by jax.export.deserialize (any host, no dgvit_tpu
needed beyond jax), batch-size symbolic by default, and multi-platform
(cpu + tpu) so one artifact serves both the robot's edge host and a TPU
serving tier.

CLI:
    python -m dgvit_tpu.serve.export --actor <name>_actor.npz \
        --out actor.stablehlo [--config cfg.yaml] [--env-units] \
        [--platforms cpu,tpu] [--batch 64]
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dgvit_tpu.models import build_actor


def _obs_tail(cfg) -> tuple:
    """Per-frame observation shape after the batch dim."""
    ih, iw = cfg.model.image_size
    if getattr(cfg.model, "patch_mode", "2d") == "channels":
        return (cfg.env.frame_stack, ih, iw)
    return (ih, iw)


def make_action_fn(cfg, params, env_units: bool = False,
                   attn_impl: str = "xla", dtype=None,
                   inference: bool = False):
    """Deterministic deployment map act(obs, goal) -> action, closed over
    `params` (the bare actor param tree, as stored by save_params_npz).

    Defaults trace the portable XLA path for export; live on-chip serving
    wants attn_impl='auto', inference=True, dtype=bfloat16 instead — that
    routes through the fused whole-trunk megakernel (models/got.py:107)."""
    actor = build_actor(cfg, dtype=dtype, attn_impl=attn_impl)
    deterministic = cfg.model.actor_type.startswith("Deterministic")
    e = cfg.env

    def act(obs, goal):
        out = actor.apply({"params": params}, obs, goal,
                          inference=inference)
        a = out if deterministic else jnp.tanh(out[0])
        if env_units:
            a = jnp.clip(a, -e.max_action, e.max_action)
            a = jnp.stack([(a[..., 0] + 1.0) * e.linear_cmd_scale,
                           a[..., 1] * e.angular_cmd_scale], axis=-1)
        return a

    return act


def export_actor(cfg, params, env_units: bool = False,
                 platforms: Sequence[str] = ("cpu", "tpu"),
                 batch: Optional[int] = None) -> bytes:
    """Serialize the actor's deployment map to portable StableHLO bytes.

    batch=None exports a symbolic batch dimension (any b >= 1 at runtime);
    an int pins it (slightly simpler/faster modules for fixed-batch
    serving tiers)."""
    act = make_action_fn(cfg, params, env_units=env_units)
    b = jax.export.symbolic_shape("b")[0] if batch is None else batch
    obs_spec = jax.ShapeDtypeStruct((b, *_obs_tail(cfg)), jnp.float32)
    goal_spec = jax.ShapeDtypeStruct((b, cfg.sac.pstate_dim), jnp.float32)
    exported = jax.export.export(jax.jit(act),
                                 platforms=list(platforms))(obs_spec,
                                                            goal_spec)
    return exported.serialize()


def load_actor(data: bytes):
    """bytes -> act(obs, goal) callable (jittable; shape-checked against
    the exported symbolic/fixed specs)."""
    return jax.export.deserialize(data).call


def main(argv=None):
    import argparse

    from dgvit_tpu.config import Config
    from dgvit_tpu.core import checkpoint as ckpt

    p = argparse.ArgumentParser(description="export actor to StableHLO")
    p.add_argument("--actor", required=True,
                   help="actor params npz (save_params_npz output)")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--config", default=None)
    p.add_argument("--env-units", action="store_true",
                   help="bake clip + command scaling: the artifact emits "
                        "[linear m/s, angular rad/s] robot commands")
    p.add_argument("--platforms", default="cpu,tpu")
    p.add_argument("--batch", type=int, default=None,
                   help="pin the batch dim (default: symbolic, any b)")
    p.add_argument("--platform", default=os.environ.get("DGVIT_PLATFORM"),
                   help="jax backend to trace on (e.g. 'cpu')")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = Config.from_yaml(args.config) if args.config else Config()
    actor = build_actor(cfg)
    obs0 = np.zeros((1, *_obs_tail(cfg)), np.float32)
    template = actor.init(jax.random.PRNGKey(0), obs0,
                          np.zeros((1, cfg.sac.pstate_dim)))["params"]
    params = ckpt.load_params_npz(args.actor, template)
    data = export_actor(cfg, params, env_units=args.env_units,
                        platforms=args.platforms.split(","),
                        batch=args.batch)
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"exported {args.actor} -> {args.out} "
          f"({len(data)} bytes, platforms={args.platforms}, "
          f"batch={'symbolic' if args.batch is None else args.batch})")


if __name__ == "__main__":
    main()
