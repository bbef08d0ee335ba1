"""CLS-only final block (ops/cls_block.py) vs the full-block XLA twin, in
Pallas interpret mode on CPU: forward equality and full gradient equality
(the backward kernel exploits the row-sparse upstream gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.ops.cls_block import _cls_block_xla, cls_final_block
from dgvit_tpu.ops.fused_transformer import _block_params_flat

HEADS, DIM_HEAD, DIM, MLP = 2, 16, 64, 128


def _params(key):
    ks = jax.random.split(key, 8)
    inner = HEADS * DIM_HEAD
    s = lambda k, sh: jax.random.normal(k, sh) * 0.08
    tree = {
        "attn_norm": {"scale": 1.0 + s(ks[0], (DIM,)), "bias": s(ks[1], (DIM,))},
        "attn": {"to_qkv": {"kernel": s(ks[2], (DIM, 3 * inner))},
                 "to_out": {"kernel": s(ks[3], (inner, DIM)),
                            "bias": s(ks[4], (DIM,))}},
        "ff_norm": {"scale": jnp.ones((DIM,)), "bias": jnp.zeros((DIM,))},
        "ff": {"fc1": {"kernel": s(ks[5], (DIM, MLP)), "bias": s(ks[6], (MLP,))},
               "fc2": {"kernel": s(ks[7], (MLP, DIM)),
                       "bias": jnp.zeros((DIM,))}},
    }
    return _block_params_flat(tree, jnp.float32)


@pytest.mark.parametrize("batch,n", [(8, 65), (3, 33), (16, 17)])
def test_cls_forward_matches_full_block(batch, n):
    flat = _params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n, DIM))
    ref = _cls_block_xla(x, flat, heads=HEADS, dim_head=DIM_HEAD)
    out = cls_final_block(x, flat, HEADS, DIM_HEAD, True)
    assert out.shape == (batch, DIM)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_cls_backward_matches_full_block():
    flat = _params(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 33, DIM))
    dy_w = jax.random.normal(jax.random.PRNGKey(4), (8, DIM))

    def loss_ref(x, flat):
        return jnp.sum(_cls_block_xla(x, flat, heads=HEADS,
                                      dim_head=DIM_HEAD) * dy_w)

    def loss_ker(x, flat):
        return jnp.sum(cls_final_block(x, flat, HEADS, DIM_HEAD, True) * dy_w)

    gx_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(x, flat)
    gx_k, gf_k = jax.grad(loss_ker, argnums=(0, 1))(x, flat)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               rtol=5e-4, atol=5e-5)
    for a, b in zip(gf_k, gf_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_transformer_cls_final_matches_pool_after():
    """Composed path: Transformer(cls_final=True) must equal running the
    full blocks and pooling row 0 afterwards (same params)."""
    from dgvit_tpu.models.layers import Transformer

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 33, DIM))
    full = Transformer(DIM, 2, HEADS, DIM_HEAD, MLP)
    pooled = Transformer(DIM, 2, HEADS, DIM_HEAD, MLP, cls_final=True)
    params = full.init(jax.random.PRNGKey(1), x)
    ref = full.apply(params, x)[:, 0]
    out = pooled.apply(params, x)
    assert out.shape == (4, DIM)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
