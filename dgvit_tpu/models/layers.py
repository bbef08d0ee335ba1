"""Transformer building blocks with reference-exact numerics.

Mirrors GoalFormer.py semantics (PreNorm+Attention / PreNorm+FeedForward
residual blocks, RMSNorm output head) in idiomatic flax. Attention dispatches
to the fused kernel in ops/attention.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgvit_tpu.models import initializers as init
from dgvit_tpu.ops.attention import attention_probs, dot_product_attention


class TorchLinear(nn.Module):
    """Dense layer with the reference's init (Xavier-uniform kernel,
    torch-default uniform bias; got_sac_network.py:30-33)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", init.xavier_uniform, (fan_in, self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", init.torch_linear_bias(fan_in), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class RMSNorm(nn.Module):
    """torch F.normalize(x, dim=-1) * sqrt(dim) * g  (GoalFormer.py:107-122).
    F.normalize clamps the L2 norm at eps=1e-12 (not added in quadrature)."""

    dim: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        dt = x.dtype
        x32 = x.astype(jnp.float32)
        norm = jnp.maximum(jnp.linalg.norm(x32, axis=-1, keepdims=True), self.eps)
        return ((x32 / norm) * (self.dim ** 0.5) * g).astype(dt)


def _ln_param_init(dim: int):
    """Raw param-tree init matching the LayerNorm submodule's tree — used by
    fused paths that read norm params without running the submodule."""
    return lambda k: {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


class LayerNorm(nn.Module):
    """torch nn.LayerNorm defaults: eps=1e-5, elementwise affine."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        dt = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(dt)


class FeedForward(nn.Module):
    """Linear -> GELU(exact) -> Dropout -> Linear -> Dropout
    (GoalFormer.py:39-50; torch nn.GELU default is the exact erf form)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = TorchLinear(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = TorchLinear(self.dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention (GoalFormer.py:52-82).

    qkv projection has no bias; the output projection has a bias unless
    (heads == 1 and dim_head == dim), matching `project_out`.
    `capture` sows the softmax attention map under 'intermediates'/'attn' —
    the functional replacement for the reference's bytecode-rewriting
    visualizer (visualizer.py:3-42, hooked at simple_vit.py:61).

    On TPU the whole section (qkv projection + per-head attention + output
    projection) runs as one fused Pallas kernel (ops/fused_block.py) — 2.1x
    the XLA path at the GoT geometry (BENCH.md ablation). Params are declared
    as raw trees with the SAME paths TorchLinear would create, so torch
    transplants and checkpoints are layout-identical across impls.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False   # ring attention over the `seq` mesh axis
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        import jax

        from dgvit_tpu.models import initializers as init
        from dgvit_tpu.ops.fused_block import fused_attention_section

        b, n, _ = x.shape
        inner = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        scale = self.dim_head ** -0.5

        wqkv = self.param(
            "to_qkv",
            lambda k: {"kernel": init.xavier_uniform(k, (self.dim, inner * 3))},
        )["kernel"]
        if project_out:
            def init_out(k):
                k1, k2 = jax.random.split(k)
                return {"kernel": init.xavier_uniform(k1, (inner, self.dim)),
                        "bias": init.torch_linear_bias(inner)(k2, (self.dim,))}
            wout_tree = self.param("to_out", init_out)
            wout, bout = wout_tree["kernel"], wout_tree["bias"]

        use_fused = (
            self.attn_impl in ("auto", "fused")
            and jax.default_backend() == "tpu"
            and not self.capture
            and not self.seq_shard
            and project_out
            and n <= 256
        )
        if use_fused:
            out = fused_attention_section(
                x.astype(self.dtype) if self.dtype else x,
                wqkv.astype(self.dtype) if self.dtype else wqkv,
                wout.astype(self.dtype) if self.dtype else wout,
                bout.astype(self.dtype) if self.dtype else bout,
                self.heads, self.dim_head)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)

        dt = self.dtype or x.dtype
        qkv = jnp.dot(x.astype(dt), wqkv.astype(dt))
        qkv = qkv.reshape(b, n, 3, self.heads, self.dim_head)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        if self.capture:
            probs = attention_probs(q, k, scale)
            self.sow("intermediates", "attn", probs)
            probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
            out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        else:
            out = None
            if self.seq_shard:
                from dgvit_tpu.parallel.ring_attention import (
                    seq_sharded_attention)
                out = seq_sharded_attention(q, k, v, scale)
            if out is None:
                # attention-prob dropout is 0 in every reference config
                # (GoalFormer.py:124 dropout=0.); the fused kernel skips it
                impl = "auto" if self.attn_impl == "fused" else self.attn_impl
                out = dot_product_attention(q, k, v, scale, impl=impl)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if project_out:
            out = jnp.dot(out, wout.astype(dt)) + bout.astype(dt)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerBlock(nn.Module):
    """PreNorm(attn) + x; PreNorm(ff) + x (GoalFormer.py:90-105).

    On TPU the whole block runs as ONE Pallas kernel (ops/fused_transformer.py)
    — norms, qkv, per-head attention, projections, chunked MLP, residuals all
    VMEM-resident (1.8x the composed path on v5e). Params are declared with
    the SAME tree paths either way, so checkpoints/transplants are portable
    across impls. The composed path handles capture / nonzero dropout / CPU.
    """

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False
    cls_only: bool = False   # return block(x)[:, 0] — fused CLS-final kernel
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 collect_params: bool = False):
        import os

        import jax

        # DGVIT_FUSED_INTERPRET=1 forces the fused kernels in Pallas
        # interpret mode off-TPU — how CPU-mesh tests drive the REAL fused
        # train path under shard_map (tests/test_shardmap.py)
        interp = (jax.default_backend() != "tpu"
                  and os.environ.get("DGVIT_FUSED_INTERPRET") == "1")
        use_fused = (
            not collect_params
            and self.attn_impl in ("auto", "fused")
            and (jax.default_backend() == "tpu" or interp)
            and not self.capture
            and not self.seq_shard
            and self.dropout == 0.0
            and not (self.heads == 1 and self.dim_head == self.dim)
            and x.shape[1] <= 256
        )
        if use_fused or collect_params:
            from dgvit_tpu.models import initializers as init
            from dgvit_tpu.ops.fused_transformer import (
                _block_params_flat, fused_transformer_block)

            dim, inner, mlp = self.dim, self.heads * self.dim_head, self.mlp_dim

            def ln_init(k):
                return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}

            def attn_init(k):
                k1, k2, k3 = jax.random.split(k, 3)
                return {
                    "to_qkv": {"kernel": init.xavier_uniform(k1, (dim, inner * 3))},
                    "to_out": {"kernel": init.xavier_uniform(k2, (inner, dim)),
                               "bias": init.torch_linear_bias(inner)(k3, (dim,))},
                }

            def ff_init(k):
                k1, k2, k3, k4 = jax.random.split(k, 4)
                return {
                    "fc1": {"kernel": init.xavier_uniform(k1, (dim, mlp)),
                            "bias": init.torch_linear_bias(dim)(k2, (mlp,))},
                    "fc2": {"kernel": init.xavier_uniform(k3, (mlp, dim)),
                            "bias": init.torch_linear_bias(mlp)(k4, (dim,))},
                }

            tree = {
                "attn_norm": self.param("attn_norm", ln_init),
                "attn": self.param("attn", attn_init),
                "ff_norm": self.param("ff_norm", ln_init),
                "ff": self.param("ff", ff_init),
            }
            cdt = self.dtype or x.dtype
            flat = _block_params_flat(tree, cdt)
            if collect_params:
                # megakernel path (ops/got_megakernel.py): hand the flat
                # param tuple to the caller instead of computing
                return flat
            if self.cls_only:
                from dgvit_tpu.ops.cls_block import cls_final_block
                return cls_final_block(x.astype(cdt), flat, self.heads,
                                       self.dim_head, interpret=interp)
            return fused_transformer_block(x.astype(cdt), flat, self.heads,
                                           self.dim_head, interp)

        h = LayerNorm(self.dim, name="attn_norm")(x)
        h = Attention(
            self.dim, self.heads, self.dim_head, self.dropout,
            attn_impl=self.attn_impl, capture=self.capture,
            seq_shard=self.seq_shard, dtype=self.dtype,
            name="attn",
        )(h, deterministic=deterministic)
        x = x + h
        if self.cls_only:
            x = x[:, :1]   # only the CLS row survives pooling downstream
        h = LayerNorm(self.dim, name="ff_norm")(x)
        h = FeedForward(self.dim, self.mlp_dim, self.dropout, dtype=self.dtype,
                        name="ff")(h, deterministic=deterministic)
        x = x + h
        return x[:, 0] if self.cls_only else x


class Transformer(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    attn_impl: str = "auto"
    capture: bool = False
    seq_shard: bool = False
    cls_final: bool = False   # last block returns pooled CLS rows: (B, dim)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 collect_params: bool = False):
        if collect_params:
            # megakernel path: return each block's flat param tuple; x only
            # sets the compute dtype
            return [TransformerBlock(
                self.dim, self.heads, self.dim_head, self.mlp_dim,
                self.dropout, attn_impl=self.attn_impl, dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic=deterministic, collect_params=True)
                for i in range(self.depth)]
        for i in range(self.depth):
            x = TransformerBlock(
                self.dim, self.heads, self.dim_head, self.mlp_dim, self.dropout,
                attn_impl=self.attn_impl, capture=self.capture,
                seq_shard=self.seq_shard, dtype=self.dtype,
                cls_only=self.cls_final and i == self.depth - 1,
                name=f"block_{i}",
            )(x, deterministic=deterministic)
        return x
