"""SimpleViT — the alternative, goal-free vision backbone.

Reference semantics (simple_vit.py:91-139):
  * channels-aware patch embed 'b c (h p1) (w p2) -> b h w (p1 p2 c)' + Linear
  * fixed 2-D sin-cos positional embedding (posemb_sincos_2d, :20-31)
  * transformer where Attention norms its input internally (:62-63) and the
    output projection is bias-free (:59); FeedForward is LN->Linear->GELU->Linear
  * mean pool over patches; `forward` returns the LayerNormed latent,
    `predict` the class head (:116-139)

The attention maps are captured via flax `sow` (see layers.Attention.capture),
replacing the bytecode-rewriting `@get_local('attn')` hook (simple_vit.py:61).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dgvit_tpu.models.layers import Attention, LayerNorm, TorchLinear


def posemb_sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0,
                     dtype=jnp.float32) -> jnp.ndarray:
    """2-D sin-cos positional embedding (simple_vit.py:20-31)."""
    assert dim % 4 == 0, "feature dimension must be multiple of 4 for sincos emb"
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    omega = np.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / (temperature ** omega)
    y = y.flatten()[:, None] * omega[None, :]
    x = x.flatten()[:, None] * omega[None, :]
    pe = np.concatenate([np.sin(x), np.cos(x), np.sin(y), np.cos(y)], axis=1)
    return jnp.asarray(pe, dtype=dtype)


class _SimpleFeedForward(nn.Module):
    """LayerNorm -> Linear -> GELU -> Linear (simple_vit.py:35-45)."""

    dim: int
    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = LayerNorm(self.dim, name="norm")(x)
        x = TorchLinear(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return TorchLinear(self.dim, dtype=self.dtype, name="fc2")(x)


class _SimpleBlock(nn.Module):
    """x = attn(x) + x; x = ff(x) + x where attn norms internally
    (simple_vit.py:47-89). Attention out-projection is bias-free."""

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(self.dim, name="attn_norm")(x)
        h = _BiaslessAttention(
            self.dim, self.heads, self.dim_head, attn_impl=self.attn_impl,
            capture=self.capture, seq_shard=self.seq_shard, dtype=self.dtype,
            name="attn",
        )(h)
        x = x + h
        return x + _SimpleFeedForward(self.dim, self.mlp_dim, dtype=self.dtype,
                                      name="ff")(x)


class _BiaslessAttention(nn.Module):
    """SimpleViT attention: to_out has no bias (simple_vit.py:59)."""

    dim: int
    heads: int
    dim_head: int
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from dgvit_tpu.ops.attention import attention_probs, dot_product_attention

        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        scale = self.dim_head ** -0.5
        qkv = TorchLinear(inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        if self.capture:
            probs = attention_probs(q, k, scale)
            self.sow("intermediates", "attn", probs)
            out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        else:
            out = None
            if self.seq_shard:
                from dgvit_tpu.parallel.ring_attention import (
                    seq_sharded_attention)
                out = seq_sharded_attention(q, k, v, scale)
            if out is None:
                out = dot_product_attention(q, k, v, scale, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return TorchLinear(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class SimpleViT(nn.Module):
    image_size: Tuple[int, int] = (128, 160)
    patch_size: Tuple[int, int] = (16, 20)
    num_classes: int = 2
    dim: int = 256
    depth: int = 2
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 512
    channels: int = 1
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.patch_embed = TorchLinear(self.dim, dtype=self.dtype)
        self.transformer = _Stack(
            self.dim, self.depth, self.heads, self.dim_head, self.mlp_dim,
            attn_impl=self.attn_impl, capture=self.capture,
            seq_shard=self.seq_shard, dtype=self.dtype)
        self.norm_out = LayerNorm(self.dim)
        self.head_norm = LayerNorm(self.dim)
        self.head = TorchLinear(self.num_classes, dtype=self.dtype)

    def _trunk(self, img):
        ph, pw = self.patch_size
        if img.ndim == 3:
            img = img[:, None]  # (B, 1, H, W)
        b, c, hh, ww = img.shape
        h, w = hh // ph, ww // pw
        x = img.reshape(b, c, h, ph, w, pw).transpose(0, 2, 4, 3, 5, 1)
        x = x.reshape(b, h * w, ph * pw * c)
        x = self.patch_embed(x)
        x = x + posemb_sincos_2d(h, w, self.dim, dtype=x.dtype)
        x = self.transformer(x)
        return x.mean(axis=1)

    def __call__(self, img):
        return self.norm_out(self._trunk(img))

    def predict(self, img):
        return self.head(self.head_norm(self._trunk(img)))

    def full(self, img):
        """Latent + class logits in one pass; also the init target that
        creates every param (both `__call__` and `predict` heads)."""
        x = self._trunk(img)
        return self.norm_out(x), self.head(self.head_norm(x))


class _Stack(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = _SimpleBlock(self.dim, self.heads, self.dim_head, self.mlp_dim,
                             attn_impl=self.attn_impl, capture=self.capture,
                             seq_shard=self.seq_shard,
                             dtype=self.dtype, name=f"block_{i}")(x)
        return x
