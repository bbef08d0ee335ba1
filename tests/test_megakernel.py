"""Whole-trunk GoT megakernel (ops/got_megakernel.py) vs the composed model,
in Pallas interpret mode on CPU. Hardware-path equivalence vs the per-block
fused kernels is asserted inside bench.py --all on the real chip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgvit_tpu.models.got import GoT

SMALL = dict(dim=64, depth=3, heads=2, dim_head=16, mlp_dim=128,
             emb_dropout=0.0, image_size=(32, 40), patch_size=(16, 20))
IH, IW = SMALL["image_size"]


def _setup(final_norm="rms", patch_mode="2d", batch=4, **over):
    cfg = dict(SMALL, final_norm=final_norm, patch_mode=patch_mode, **over)
    got = GoT(**cfg)
    if patch_mode == "channels":
        img = jax.random.uniform(jax.random.PRNGKey(0),
                                 (batch, cfg.get("channels", 1), IH, IW))
    else:
        img = jax.random.uniform(jax.random.PRNGKey(0), (batch, IH, IW))
    goal = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg["dim"]))
    params = got.init(jax.random.PRNGKey(2), img, goal)
    return got, params, img, goal


def _mega(got, params, img, goal):
    os.environ["DGVIT_MEGA_INTERPRET"] = "1"
    try:
        return got.apply(params, img, goal, inference=True)
    finally:
        del os.environ["DGVIT_MEGA_INTERPRET"]


@pytest.mark.parametrize("final_norm", ["rms", "layer"])
def test_megakernel_matches_composed(final_norm):
    got, params, img, goal = _setup(final_norm=final_norm)
    ref = got.apply(params, img, goal)
    out = _mega(got, params, img, goal)
    assert out.shape == ref.shape == (4, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_megakernel_channels_mode():
    """channels attr left at its DEFAULT (1) while the input carries 4
    channels — policies construct GoT without a channels override, so the
    mega path must derive the patch dim from the input shape exactly like
    the composed path does."""
    got = GoT(**dict(SMALL, patch_mode="channels"))
    img = jax.random.uniform(jax.random.PRNGKey(0), (4, 4, IH, IW))
    goal = jax.random.normal(jax.random.PRNGKey(1), (4, SMALL["dim"]))
    params = got.init(jax.random.PRNGKey(2), img, goal)
    ref = got.apply(params, img, goal)
    out = _mega(got, params, img, goal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_megakernel_odd_batch():
    """b=3: the batch is padded up to the 8-frame tile (Mosaic needs >=8
    sublanes on the (tb, d) blocks) and the padding dropped after."""
    got, params, img, goal = _setup(batch=3)
    ref = got.apply(params, img, goal)
    out = _mega(got, params, img, goal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_megakernel_gradient_correct():
    """A stray grad through the inference path must still be right (custom
    vjp backed by the XLA twin). depth=1: the vjp wraps the whole trunk, so
    one block covers it — grad compiles dominate this test's cost."""
    got, params, img, goal = _setup(depth=1)

    def loss_composed(p, g):
        return jnp.sum(got.apply(p, img, g) ** 2)

    def loss_mega(p, g):
        return jnp.sum(_mega(got, p, img, g) ** 2)

    g_ref = jax.grad(loss_composed, argnums=(0, 1))(params, goal)
    g_out = jax.grad(loss_mega, argnums=(0, 1))(params, goal)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_out = jax.tree_util.tree_leaves(g_out)
    assert len(flat_ref) == len(flat_out)
    for a, b in zip(flat_out, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_blocks_megakernel_with_live_dropout():
    """inference=True with deterministic=False: embed+dropout run in XLA
    (same RNG stream as the composed path -> identical mask), the blocks +
    CLS pool + norm run as the blocks-only megakernel."""
    got, params, img, goal = _setup()
    got_d = GoT(**dict(SMALL, emb_dropout=0.3))
    rngs = {"dropout": jax.random.PRNGKey(7)}
    ref = got_d.apply(params, img, goal, deterministic=False, rngs=rngs)
    os.environ["DGVIT_MEGA_INTERPRET"] = "1"
    try:
        out = got_d.apply(params, img, goal, deterministic=False, rngs=rngs,
                          inference=True)
    finally:
        del os.environ["DGVIT_MEGA_INTERPRET"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_inference_flag_is_noop_when_ineligible():
    """Off-TPU without the interpret override, inference=True must fall
    through to the composed path bit-identically."""
    got, params, img, goal = _setup()
    a = got.apply(params, img, goal)
    b = got.apply(params, img, goal, inference=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
