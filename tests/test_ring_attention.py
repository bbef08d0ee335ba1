"""Ring attention over the seq axis == full attention, on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.core.mesh import MeshRuntime
from dgvit_tpu.ops.attention import dot_product_attention
from dgvit_tpu.parallel.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


@pytest.mark.parametrize("n", [64, 256])
def test_ring_attention_matches_full(n):
    runtime = MeshRuntime.create(data=1, model=1, seq=8)
    b, h, d = 2, 4, 32
    q, k, v = jax.random.normal(jax.random.PRNGKey(0), (3, b, h, n, d))
    ref = np.asarray(dot_product_attention(q, k, v, impl="xla"))
    out = np.asarray(ring_attention(q, k, v, runtime.mesh))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow  # seq-shard path only (model.seq_shard); fwd equality
# stays in the default tier, the dryrun exercises the sharded grad
def test_ring_attention_grad():
    runtime = MeshRuntime.create(data=1, model=1, seq=8)
    q, k, v = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 2, 64, 16))

    def loss_ring(q, k, v):
        return ring_attention(q, k, v, runtime.mesh).sum()

    def loss_full(q, k, v):
        return dot_product_attention(q, k, v, impl="xla").sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
