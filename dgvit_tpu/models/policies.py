"""Actor / critic zoo — every policy and critic variant of the reference.

GoT-based zoo mirrors got_sac_network.py; the SimpleViT-based alternative zoo
mirrors vit_sac_network.py (available-but-inactive in the reference, imported
only via commented lines DRL.py:30-32). All modules are functional flax:
`apply(params, istate, pstate, ...)`; sampling lives in
models/distributions.py so the policy forward stays deterministic.

Layout conventions (TPU-idiomatic, NOT torch NCHW):
  * GoT / ViT image input: (B, H, W) single-frame or (B, C, H, W) frame-stacked
  * CNN trunk input:       (B, H, W) -> channel appended internally, or
                           (B, H, W, C) NHWC for the 4-channel variants
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dgvit_tpu.models.cnn import ConvTrunk
from dgvit_tpu.models.distributions import clamp_log_std
from dgvit_tpu.models.got import GoT
from dgvit_tpu.models.layers import TorchLinear
from dgvit_tpu.models.simple_vit import SimpleViT


# --------------------------------------------------------------------------
# GoT zoo (got_sac_network.py)
# --------------------------------------------------------------------------

class GoTPolicy(nn.Module):
    """Tanh-Gaussian actor on the GoT trunk (got_sac_network.py:172-256).

    forward: goal -> fc_embed (NO relu, :226) as the goal token; GoT latent ->
    relu(fc1) -> relu(fc2) -> mean / clamped log_std (:230-236).
    """

    action_dim: int = 2
    pstate_dim: int = 2
    block: int = 4
    head: int = 4
    l_f_size: int = 64
    dim_head: int = 64
    mlp_dim: int = 2048
    image_size: Tuple[int, int] = (128, 160)
    patch_size: Tuple[int, int] = (16, 20)
    patch_mode: str = "2d"       # '2d' live loop; 'channels' for IL frame stacks
    final_norm: str = "rms"      # 'layer' for the Imitation_learning.py fork
    emb_dropout: float = 0.1
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, istate, pstate, *, deterministic: bool = True,
                 inference: bool = False):
        goal = TorchLinear(self.l_f_size, dtype=self.dtype, name="fc_embed")(pstate)
        latent = GoT(
            image_size=self.image_size, patch_size=self.patch_size,
            dim=self.l_f_size, depth=self.block, heads=self.head,
            dim_head=self.dim_head, mlp_dim=self.mlp_dim,
            emb_dropout=self.emb_dropout, patch_mode=self.patch_mode,
            final_norm=self.final_norm, attn_impl=self.attn_impl,
            capture=self.capture, seq_shard=self.seq_shard, dtype=self.dtype,
            name="trans",
        )(istate, goal, deterministic=deterministic, inference=inference)
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc1")(latent))
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc2")(x))
        mean = TorchLinear(self.action_dim, dtype=self.dtype, name="mean_linear")(x)
        log_std = TorchLinear(self.action_dim, dtype=self.dtype, name="log_std_linear")(x)
        return mean, clamp_log_std(log_std)


class GoTQNetwork(nn.Module):
    """Twin-Q critic on a single shared GoT trunk (got_sac_network.py:75-123).
    goal embed uses relu (:111); action concatenated after the latent (:114)."""

    action_dim: int = 2
    pstate_dim: int = 2
    block: int = 4
    head: int = 4
    l_f_size: int = 64
    dim_head: int = 64
    mlp_dim: int = 2048
    image_size: Tuple[int, int] = (128, 160)
    patch_size: Tuple[int, int] = (16, 20)
    patch_mode: str = "2d"
    emb_dropout: float = 0.1
    attn_impl: str = "auto"
    seq_shard: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        # setup() (not nn.compact) so `trunk` and `heads` are independently
        # apply-able: the SAC critic_latent_reuse mode evaluates the trunk
        # once per update and feeds the actor step heads-only. Attribute
        # names match the previous explicit name= strings, so the param tree
        # (and torch transplant) is unchanged.
        self.fc_embed = TorchLinear(self.l_f_size, dtype=self.dtype)
        self.trans = GoT(
            image_size=self.image_size, patch_size=self.patch_size,
            dim=self.l_f_size, depth=self.block, heads=self.head,
            dim_head=self.dim_head, mlp_dim=self.mlp_dim,
            emb_dropout=self.emb_dropout, patch_mode=self.patch_mode,
            attn_impl=self.attn_impl, seq_shard=self.seq_shard,
            dtype=self.dtype,
        )
        self.fc1 = TorchLinear(128, dtype=self.dtype)
        self.fc2 = TorchLinear(32, dtype=self.dtype)
        self.fc3 = TorchLinear(self.action_dim, dtype=self.dtype)
        self.fc11 = TorchLinear(128, dtype=self.dtype)
        self.fc21 = TorchLinear(32, dtype=self.dtype)
        self.fc31 = TorchLinear(self.action_dim, dtype=self.dtype)

    def trunk(self, istate, pstate, *, deterministic: bool = True,
              inference: bool = False):
        """Action-independent half: goal embed + GoT backbone → (B, l_f)."""
        goal = nn.relu(self.fc_embed(pstate))
        return self.trans(istate, goal, deterministic=deterministic,
                          inference=inference)

    def heads(self, latent, action):
        """Twin MLP heads over a precomputed trunk latent (the action joins
        only here, got_sac_network.py:114)."""
        x = jnp.concatenate([latent, action.astype(latent.dtype)], axis=1)
        q1 = nn.relu(self.fc1(x))
        q1 = nn.relu(self.fc2(q1))
        q1 = self.fc3(q1)
        q2 = nn.relu(self.fc11(x))
        q2 = nn.relu(self.fc21(q2))
        q2 = self.fc31(q2)
        return q1, q2

    def __call__(self, istate, pstate, action, *, deterministic: bool = True,
                 inference: bool = False):
        return self.heads(
            self.trunk(istate, pstate, deterministic=deterministic,
                       inference=inference), action)


class DeterministicGoTPolicy(nn.Module):
    """Deterministic GoT actor (got_sac_network.py:389-449): fc_embed (no relu),
    relu(fc1 l_f->128), relu(fc2 128->32), tanh(mean_linear)."""

    action_dim: int = 2
    pstate_dim: int = 2
    block: int = 4
    head: int = 4
    l_f_size: int = 64
    dim_head: int = 64
    mlp_dim: int = 2048
    image_size: Tuple[int, int] = (128, 160)
    patch_size: Tuple[int, int] = (16, 20)
    emb_dropout: float = 0.1
    attn_impl: str = "auto"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, istate, pstate, *, deterministic: bool = True,
                 inference: bool = False):
        goal = TorchLinear(self.l_f_size, dtype=self.dtype, name="fc_embed")(pstate)
        latent = GoT(
            image_size=self.image_size, patch_size=self.patch_size,
            dim=self.l_f_size, depth=self.block, heads=self.head,
            dim_head=self.dim_head, mlp_dim=self.mlp_dim,
            emb_dropout=self.emb_dropout, attn_impl=self.attn_impl,
            dtype=self.dtype, name="trans",
        )(istate, goal, deterministic=deterministic, inference=inference)
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc1")(latent))
        x = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc2")(x))
        return jnp.tanh(TorchLinear(self.action_dim, dtype=self.dtype, name="mean_linear")(x))


# --------------------------------------------------------------------------
# CNN zoo (got_sac_network.py GaussianPolicy / QNetwork / DeterministicPolicy)
# --------------------------------------------------------------------------

class GaussianPolicy(nn.Module):
    """CNN tanh-Gaussian actor (got_sac_network.py:258-327). 1-channel input;
    fc_embed has NO relu (:299)."""

    action_dim: int = 2
    pstate_dim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, istate, pstate, *, deterministic: bool = True,
                 inference: bool = False):
        x1 = ConvTrunk(dtype=self.dtype, name="trunk")(istate)
        x2 = TorchLinear(32, dtype=self.dtype, name="fc_embed")(pstate)
        x = jnp.concatenate([x1, x2], axis=1)
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc2")(x))
        mean = TorchLinear(self.action_dim, dtype=self.dtype, name="mean_linear")(x)
        log_std = TorchLinear(self.action_dim, dtype=self.dtype, name="log_std_linear")(x)
        return mean, clamp_log_std(log_std)


class QNetwork(nn.Module):
    """Twin-Q CNN critic (got_sac_network.py:125-170). 1-channel input
    (unsqueeze at :150); goal embed relu'd (:158)."""

    action_dim: int = 2
    pstate_dim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, istate, pstate, action, *, deterministic: bool = True,
                 inference: bool = False):
        x1 = ConvTrunk(dtype=self.dtype, name="trunk")(istate)
        x2 = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc_embed")(pstate))
        x = jnp.concatenate([x1, x2, action.astype(x1.dtype)], axis=1)
        q1 = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc1")(x))
        q1 = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc2")(q1))
        q1 = TorchLinear(self.action_dim, dtype=self.dtype, name="fc3")(q1)
        q2 = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc11")(x))
        q2 = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc21")(q2))
        q2 = TorchLinear(self.action_dim, dtype=self.dtype, name="fc31")(q2)
        return q1, q2


class DeterministicPolicy(nn.Module):
    """Deterministic CNN actor (got_sac_network.py:330-387); expects a
    4-channel frame stack (B, H, W, 4)."""

    action_dim: int = 2
    pstate_dim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, istate, pstate, *, deterministic: bool = True,
                 inference: bool = False):
        x1 = ConvTrunk(dtype=self.dtype, name="trunk")(istate)
        x2 = TorchLinear(32, dtype=self.dtype, name="fc_embed")(pstate)
        x = jnp.concatenate([x1, x2], axis=1)
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc2")(x))
        return jnp.tanh(TorchLinear(self.action_dim, dtype=self.dtype, name="mean")(x))


class ValueNetwork(nn.Module):
    """State-value net (got_sac_network.py:36-72). Unused by the reference's
    main path and internally inconsistent there (fc1 sized 256+32+nb_actions
    but fed 256+32, :45,66-68); implemented here with the working layout."""

    action_dim: int = 2
    pstate_dim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, istate, pstate, *, deterministic: bool = True,
                 inference: bool = False):
        x1 = ConvTrunk(dtype=self.dtype, name="trunk")(istate)
        x2 = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc_embed")(pstate))
        x = jnp.concatenate([x1, x2], axis=1)
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc2")(x))
        return TorchLinear(self.action_dim, dtype=self.dtype, name="fc3")(x)


# --------------------------------------------------------------------------
# SimpleViT zoo (vit_sac_network.py) — goal concatenated after the trunk
# --------------------------------------------------------------------------

class ViTGaussianPolicy(nn.Module):
    """vit_sac_network.py GaussianTransformerPolicy (:174-240): SimpleViT
    (dim 256, depth 2, heads 8, mlp 2048), goal fc_embed->32 (no relu),
    concat, relu(fc1 288->128), relu(fc2 128->32), mean/log_std."""

    action_dim: int = 2
    pstate_dim: int = 2
    dim: int = 256
    depth: int = 2
    heads: int = 8
    mlp_dim: int = 2048
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, istate, pstate, *, deterministic: bool = True,
                 inference: bool = False):
        x1 = SimpleViT(dim=self.dim, depth=self.depth, heads=self.heads,
                       mlp_dim=self.mlp_dim, attn_impl=self.attn_impl,
                       capture=self.capture, seq_shard=self.seq_shard,
                       dtype=self.dtype, name="trans")(istate)
        x2 = TorchLinear(32, dtype=self.dtype, name="fc_embed")(pstate)
        x = jnp.concatenate([x1, x2], axis=1)
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc2")(x))
        mean = TorchLinear(self.action_dim, dtype=self.dtype, name="mean_linear")(x)
        log_std = TorchLinear(self.action_dim, dtype=self.dtype, name="log_std_linear")(x)
        return mean, clamp_log_std(log_std)


class ViTQNetwork(nn.Module):
    """vit_sac_network.py TransformerQNetwork (:74-127)."""

    action_dim: int = 2
    pstate_dim: int = 2
    dim: int = 256
    depth: int = 2
    heads: int = 8
    mlp_dim: int = 2048
    attn_impl: str = "auto"
    seq_shard: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, istate, pstate, action, *, deterministic: bool = True,
                 inference: bool = False):
        x1 = SimpleViT(dim=self.dim, depth=self.depth, heads=self.heads,
                       mlp_dim=self.mlp_dim, attn_impl=self.attn_impl,
                       seq_shard=self.seq_shard,
                       dtype=self.dtype, name="trans")(istate)
        x2 = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc_embed")(pstate))
        x = jnp.concatenate([x1, x2, action.astype(x1.dtype)], axis=1)
        q1 = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc1")(x))
        q1 = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc2")(q1))
        q1 = TorchLinear(self.action_dim, dtype=self.dtype, name="fc3")(q1)
        q2 = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc11")(x))
        q2 = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc21")(q2))
        q2 = TorchLinear(self.action_dim, dtype=self.dtype, name="fc31")(q2)
        return q1, q2


class ViTDeterministicPolicy(nn.Module):
    """vit_sac_network.py DeterministicTransformerPolicy (:375-441): SimpleViT
    trunk, goal fc_embed->32 (no relu), concat, relu(fc1 288->128),
    relu(fc2 128->32), tanh(mean_linear 32->A). Exploration noise
    clamp(N(0,0.1), +-0.25) lives in distributions.deterministic_sample."""

    action_dim: int = 2
    pstate_dim: int = 2
    dim: int = 256
    depth: int = 2
    heads: int = 8
    mlp_dim: int = 2048
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, istate, pstate, *, deterministic: bool = True,
                 inference: bool = False):
        x1 = SimpleViT(dim=self.dim, depth=self.depth, heads=self.heads,
                       mlp_dim=self.mlp_dim, attn_impl=self.attn_impl,
                       capture=self.capture, seq_shard=self.seq_shard,
                       dtype=self.dtype, name="trans")(istate)
        x2 = TorchLinear(32, dtype=self.dtype, name="fc_embed")(pstate)
        x = jnp.concatenate([x1, x2], axis=1)
        x = nn.relu(TorchLinear(128, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(TorchLinear(32, dtype=self.dtype, name="fc2")(x))
        return jnp.tanh(TorchLinear(self.action_dim, dtype=self.dtype,
                                    name="mean_linear")(x))


# --------------------------------------------------------------------------
# Factories
# --------------------------------------------------------------------------

def build_actor(cfg, dtype=None, attn_impl: str = "auto") -> nn.Module:
    """cfg: config.ModelConfig + sac dims. Maps the reference's actor_type
    strings (config.yaml:51-63, DRL.py:126-169) to modules.

    attn_impl='xla' forces the composed XLA block path on the
    transformer-backed actors (no Pallas custom calls) — required for
    portable AOT export (serve/export.py): the fused kernels are
    TPU-specific custom calls AND shape-specialized, so an exported
    artifact must trace the pure-StableHLO path."""
    from dgvit_tpu.config import Config

    if isinstance(cfg, Config):
        m, s = cfg.model, cfg.sac
    else:
        m, s = cfg.model, cfg.sac  # duck-typed
    common = dict(action_dim=s.action_dim, pstate_dim=s.pstate_dim, dtype=dtype)
    seqs = dict(seq_shard=getattr(m, "seq_shard", False),
                attn_impl=attn_impl)
    vit = dict(dim=getattr(m, "vit_dim", 256), depth=getattr(m, "vit_depth", 2),
               heads=getattr(m, "vit_heads", 8), mlp_dim=m.mlp_dim, **seqs)
    if m.actor_type == "GaussianTransformer":
        if m.backbone == "simple_vit":
            return ViTGaussianPolicy(**common, **vit)
        return GoTPolicy(block=m.block, head=m.head, l_f_size=m.latent_size,
                         dim_head=m.dim_head, mlp_dim=m.mlp_dim,
                         image_size=tuple(m.image_size), patch_size=tuple(m.patch_size),
                         emb_dropout=m.emb_dropout,
                         patch_mode=getattr(m, "patch_mode", "2d"),
                         **common, **seqs)
    if m.actor_type == "GaussianConvNet":
        return GaussianPolicy(**common)
    if m.actor_type == "DeterministicTransformer":
        if m.backbone == "simple_vit":
            return ViTDeterministicPolicy(**common, **vit)
        return DeterministicGoTPolicy(block=m.block, head=m.head,
                                      l_f_size=m.latent_size, dim_head=m.dim_head,
                                      mlp_dim=m.mlp_dim, attn_impl=attn_impl,
                                      **common)
    if m.actor_type == "Deterministic":
        return DeterministicPolicy(**common)
    raise ValueError(f"unknown actor_type {m.actor_type!r}")


def build_critic(cfg, dtype=None) -> nn.Module:
    m, s = cfg.model, cfg.sac
    common = dict(action_dim=s.action_dim, pstate_dim=s.pstate_dim, dtype=dtype)
    seqs = dict(seq_shard=getattr(m, "seq_shard", False))
    vit = dict(dim=getattr(m, "vit_dim", 256), depth=getattr(m, "vit_depth", 2),
               heads=getattr(m, "vit_heads", 8), mlp_dim=m.mlp_dim, **seqs)
    if m.critic_type == "Transformer":
        if m.backbone == "simple_vit":
            return ViTQNetwork(**common, **vit)
        return GoTQNetwork(block=m.block, head=m.head, l_f_size=m.latent_size,
                           dim_head=m.dim_head, mlp_dim=m.mlp_dim,
                           image_size=tuple(m.image_size), patch_size=tuple(m.patch_size),
                           emb_dropout=m.emb_dropout,
                           patch_mode=getattr(m, "patch_mode", "2d"),
                           **common, **seqs)
    if m.critic_type == "CNN":
        return QNetwork(**common)
    raise ValueError(f"unknown critic_type {m.critic_type!r}")
