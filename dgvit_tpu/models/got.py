"""GoT — the goal-token ViT core model ("GoalFormer").

Reference semantics (GoalFormer.py:123-171):
  * patch-embeds a (B, 128, 160) depth image into 64 patches of 16x20 via the
    channel-less rearrange 'b (h p1) (w p2) -> b (h w) (p1 p2)' + Linear(320, dim)
    (GoalFormer.py:137-139; the `channels` ctor arg is ignored by this embed)
  * prepends the goal embedding as the CLS token (:160-161)
  * adds a learned positional embedding over n+1 tokens (:142,162), dropout 0.1
  * `depth` pre-norm transformer blocks (:146,165)
  * pools the goal token x[:, 0] (:167) and applies RMSNorm (:129,170)

The imitation-learning fork (Imitation_learning.py:104-176) differs in two
ways, both supported here: channels-aware patch embed for frame-stacked
(B, C, H, W) input, and a final LayerNorm instead of RMSNorm.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dgvit_tpu.models import initializers as init
from dgvit_tpu.models.layers import LayerNorm, RMSNorm, TorchLinear, Transformer


def patchify_2d(img: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """'b (h p1) (w p2) -> b (h w) (p1 p2)' for (B, H, W) images."""
    b, hh, ww = img.shape
    h, w = hh // ph, ww // pw
    x = img.reshape(b, h, ph, w, pw)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h * w, ph * pw)


def patchify_channels(img: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """'b c (h p1) (w p2) -> b (h w) (p1 p2 c)' for (B, C, H, W) images
    (Imitation_learning.py:118-121)."""
    b, c, hh, ww = img.shape
    h, w = hh // ph, ww // pw
    x = img.reshape(b, c, h, ph, w, pw)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # b h w p1 p2 c
    return x.reshape(b, h * w, ph * pw * c)


class GoT(nn.Module):
    image_size: Tuple[int, int] = (128, 160)
    patch_size: Tuple[int, int] = (16, 20)
    dim: int = 64
    depth: int = 4
    heads: int = 4
    dim_head: int = 64
    mlp_dim: int = 2048
    channels: int = 1          # used only when patch_mode == 'channels'
    pool: str = "cls"          # cls | mean
    dropout: float = 0.0
    emb_dropout: float = 0.1
    patch_mode: str = "2d"     # 2d (GoalFormer) | channels (IL fork)
    final_norm: str = "rms"    # rms (GoalFormer) | layer (IL fork)
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False    # ring attention over the `seq` mesh axis
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img, goal, *, deterministic: bool = True,
                 inference: bool = False):
        """img: (B, H, W) [2d mode] or (B, C, H, W) [channels mode];
        goal: (B, dim) pre-embedded goal token. Returns (B, dim) latent.

        `inference=True` requests the whole-trunk megakernel
        (ops/got_megakernel.py): one Pallas launch per frame tile covering
        embed -> all blocks -> CLS pool -> final norm. Used by no-grad
        forwards (choose_action, evaluation, bench); gradient-bearing passes
        keep the per-block custom-vjp kernels. Params are declared with
        identical tree paths either way, and `init` always takes the composed
        path, so checkpoints are portable across both."""
        import os

        import jax

        ph, pw = self.patch_size
        ih, iw = self.image_size
        num_patches = (ih // ph) * (iw // pw)

        # actual patch count from the INPUT — the composed path supports
        # images smaller than the configured image_size (pos[:, :n+1]); the
        # whole-trunk megakernel assumes the full grid, so it requires an
        # exact match (the blocks kernel pads any token count)
        in_h, in_w = (img.shape[-2], img.shape[-1])
        in_patches = (in_h // ph) * (in_w // pw)
        # blocks_ok: the fused blocks->CLS->final-norm path (embed + emb-
        # dropout stay in XLA). Default: inference passes only — the
        # per-block custom-vjp kernels win the gradient-bearing A/B on this
        # chip (5.32 vs 6.57 ms per fwd+bwd @256: the whole-trunk backward's
        # chain recompute costs one extra forward, BENCH.md round 3).
        # DGVIT_TRUNK_GRAD=1 opts gradient passes into the single whole-
        # trunk recompute backward (ops/trunk_train.py, 1 fwd + 1 bwd launch
        # per trunk instead of 4 + 4) for future stacks where launch
        # overhead dominates.
        blocks_ok = (
            not self.is_initializing()
            and (jax.default_backend() == "tpu"
                 or os.environ.get("DGVIT_MEGA_INTERPRET") == "1"
                 or os.environ.get("DGVIT_FUSED_INTERPRET") == "1")
            and self.attn_impl in ("auto", "fused")
            and not self.capture
            and not self.seq_shard
            and self.dropout == 0.0   # block-level dropout needs the PRNG
            and self.pool == "cls"
            and not (self.heads == 1 and self.dim_head == self.dim)
            and in_patches + 1 <= 256
        )
        if os.environ.get("DGVIT_TRUNK_GRAD") != "1":
            blocks_ok = blocks_ok and inference
        mega_ok = blocks_ok and inference and in_patches == num_patches
        use_mega = mega_ok and deterministic

        def _mega_block_params(cdt):
            """Shared fused-path param assembly: per-block flat tuples from
            the Transformer submodule + the final-norm (scale, bias) pair —
            declared with the SAME tree paths the composed path creates."""
            from dgvit_tpu.models.layers import _ln_param_init

            flats = Transformer(
                self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
                self.dropout, attn_impl=self.attn_impl, dtype=self.dtype,
                name="transformer",
            )(jnp.zeros((1, 1, self.dim), cdt), collect_params=True)
            if self.final_norm == "rms":
                g = self.param("norm_out",
                               lambda k: {"g": jnp.ones((self.dim,))})["g"]
                fn = (g.reshape(1, -1).astype(jnp.float32),
                      jnp.zeros((1, self.dim), jnp.float32))
            else:
                no = self.param("norm_out", _ln_param_init(self.dim))
                fn = (no["scale"].reshape(1, -1).astype(jnp.float32),
                      no["bias"].reshape(1, -1).astype(jnp.float32))
            return tuple(flats), fn

        if use_mega:
            from dgvit_tpu.ops.got_megakernel import got_forward_fused

            # channel count from the INPUT (policies construct GoT without
            # a channels override; the composed path is shape-derived too)
            patch_dim = ph * pw * (img.shape[1]
                                   if self.patch_mode == "channels" else 1)
            cdt = self.dtype or img.dtype

            def pe_init(k):
                k1, k2 = jax.random.split(k)
                return {"kernel": init.xavier_uniform(k1, (patch_dim, self.dim)),
                        "bias": init.torch_linear_bias(patch_dim)(k2, (self.dim,))}

            pe = self.param("patch_embed", pe_init)
            pos = self.param("pos_embedding", init.normal,
                             (1, num_patches + 1, self.dim))
            flats, fn = _mega_block_params(cdt)

            patches = (patchify_2d(img, ph, pw) if self.patch_mode == "2d"
                       else patchify_channels(img, ph, pw)).astype(cdt)
            return got_forward_fused(
                patches, goal.astype(cdt),
                (pe["kernel"].astype(cdt), pe["bias"].reshape(1, -1).astype(cdt)),
                pos[0].astype(cdt), flats, fn,
                self.heads, self.dim_head, num_patches + 1, self.final_norm,
                jax.default_backend() != "tpu",
            )

        if self.patch_mode == "2d":
            x = patchify_2d(img, ph, pw)
        elif self.patch_mode == "channels":
            x = patchify_channels(img, ph, pw)
        else:
            raise ValueError(self.patch_mode)
        x = TorchLinear(self.dim, dtype=self.dtype, name="patch_embed")(x)
        b, n, _ = x.shape

        cls = goal[:, None, :].astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)

        pos = self.param("pos_embedding", init.normal, (1, num_patches + 1, self.dim))
        x = x + pos[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        if blocks_ok:
            # embed + emb-dropout ran above in XLA (they need the PRNG);
            # blocks -> CLS pool -> final norm run fused. Taken by live-
            # dropout inference (reference keeps train-mode dropout in every
            # learn pass) AND by gradient-bearing passes, whose backward is
            # the single whole-trunk recompute kernel (ops/trunk_train.py)
            from dgvit_tpu.ops.got_megakernel import blocks_cls_forward_fused

            cdt = self.dtype or img.dtype
            flats, fn = _mega_block_params(cdt)
            return blocks_cls_forward_fused(
                x.astype(cdt), flats, fn, self.heads, self.dim_head,
                self.final_norm, jax.default_backend() != "tpu")

        x = Transformer(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            self.dropout, attn_impl=self.attn_impl, capture=self.capture,
            seq_shard=self.seq_shard, dtype=self.dtype,
            cls_final=self.pool == "cls", name="transformer",
        )(x, deterministic=deterministic)

        # cls_final already pooled the goal token inside the last block
        # (fused: ops/cls_block.py; composed: block output row 0)
        if self.pool == "mean":
            x = x.mean(axis=1)

        if self.final_norm == "rms":
            return RMSNorm(self.dim, name="norm_out")(x)
        return LayerNorm(self.dim, name="norm_out")(x)
