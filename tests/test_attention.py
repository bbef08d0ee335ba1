"""Fused attention kernel equivalence (interpret mode on CPU; the same
kernel is bit-exact vs XLA on real TPU hardware — verified on v5e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.ops.attention import attention_probs, dot_product_attention


@pytest.mark.parametrize("shape", [(2, 4, 65, 64), (1, 2, 16, 32)])
def test_pallas_interpret_matches_xla(shape):
    q, k, v = jax.random.normal(jax.random.PRNGKey(0), (3,) + shape)
    ref = np.asarray(dot_product_attention(q, k, v, impl="xla"))
    pal = np.asarray(dot_product_attention(q, k, v, impl="pallas_interpret"))
    np.testing.assert_allclose(pal, ref, atol=1e-5, rtol=1e-5)


def test_pallas_backward_matches_xla():
    q, k, v = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 2, 65, 64))

    def loss(q, k, v, impl):
        return dot_product_attention(q, k, v, impl=impl).sum()

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "xla")
    g_pal = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "pallas_interpret")
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


def test_attention_probs_rows_sum_to_one():
    q, k, _ = jax.random.normal(jax.random.PRNGKey(2), (3, 2, 4, 65, 64))
    p = np.asarray(attention_probs(q, k, 64 ** -0.5))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


def test_softmax_scale_matches_reference():
    """scale = dim_head ** -0.5 (GoalFormer.py:59), independent of heads."""
    q, k, v = jax.random.normal(jax.random.PRNGKey(3), (3, 1, 1, 8, 16))
    out_default = dot_product_attention(q, k, v, impl="xla")
    out_explicit = dot_product_attention(q, k, v, scale=16 ** -0.5, impl="xla")
    np.testing.assert_allclose(np.asarray(out_default),
                               np.asarray(out_explicit), atol=0)
