"""Aux subsystem tests: attention visualizer API, superpixel occlusion,
PointCloud2 codec, depth-image tools, metrics logging."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_attention_visualizer_cache_api():
    from dgvit_tpu.models import GoT
    from dgvit_tpu.utils.visualizer import AttentionVisualizer

    model = GoT(dim=32, depth=2, heads=2, mlp_dim=64, capture=True)
    img = jnp.ones((1, 128, 160))
    goal = jnp.ones((1, 32))
    params = model.init(jax.random.PRNGKey(0), img, goal)
    viz = AttentionVisualizer(model, params)

    # inactive: plain forward, no cache (get_local.is_activate semantics)
    out = viz(img, goal)
    assert out.shape == (1, 32) and viz.cache == {}

    viz.activate()
    out = viz(img, goal)
    assert len(viz.cache) == 2  # one map per block
    for v in viz.cache.values():
        assert v.shape == (1, 2, 65, 65)
        np.testing.assert_allclose(v.sum(-1), 1.0, rtol=1e-5)
    g = viz.goal_token_attention()
    assert all(v.shape == (1, 2, 65) for v in g.values())

    viz.clear()
    assert viz.cache == {}


def test_superpixel_occlusion_properties():
    from dgvit_tpu.envs.faults import slic_segments, superpixel_occlusion

    # structured image (smooth gradients) so superpixels are spatially
    # coherent; on white noise SLIC legitimately scatters segments
    yy, xx = np.meshgrid(np.arange(64), np.arange(80), indexing="ij")
    img = (yy * 2.0 + xx * 1.5).astype(np.float32)
    labels = slic_segments(img, n_segments=20)
    assert labels.shape == img.shape
    assert labels.min() >= 1  # start_label=1 (env_lab.py:51)
    assert 5 <= len(np.unique(labels)) <= 40

    out = superpixel_occlusion(img, segments=20)
    h = img.shape[0]
    band = h // 5
    y1 = h // 2 - band // 2
    y2 = y1 + band
    # the whole center band must be occluded (every band pixel's superpixel
    # overlaps the band by construction)
    assert (out[y1:y2] == 0).all()
    # something outside the band survives
    assert (out != 0).any()


def test_point_cloud2_roundtrip():
    from dgvit_tpu.utils.point_cloud2 import (
        create_cloud_xyz32, read_points_list)

    pts = [(1.0, 2.0, 3.0), (-1.5, 0.0, 4.25), (0.1, 0.2, 0.3)]
    cloud = create_cloud_xyz32(header=None, points=pts)
    assert cloud.width == 3 and cloud.point_step == 12
    back = read_points_list(cloud)
    np.testing.assert_allclose(back, pts, rtol=1e-6)
    # field selection
    xs = read_points_list(cloud, field_names=("x",))
    np.testing.assert_allclose([p[0] for p in xs], [1.0, -1.5, 0.1])


def test_point_cloud2_skip_nans():
    from dgvit_tpu.utils.point_cloud2 import (
        create_cloud_xyz32, read_points_list)

    pts = [(1.0, 2.0, 3.0), (float("nan"), 0.0, 1.0)]
    cloud = create_cloud_xyz32(None, pts)
    assert len(read_points_list(cloud, skip_nans=True)) == 1


def test_depth_image_tools(tmp_path):
    from dgvit_tpu.train.depth_image_tools import dump_npz_frames

    obs = np.random.default_rng(1).random((3, 32, 40, 1)).astype(np.float32)
    npz = tmp_path / "rec.npz"
    np.savez(npz, obs=obs)
    written = dump_npz_frames(str(npz), str(tmp_path / "frames"), limit=2)
    assert len(written) == 2
    import os
    assert all(os.path.getsize(w) > 0 for w in written)


def test_metrics_logger(tmp_path):
    import json

    from dgvit_tpu.utils import MetricsLogger, RewardCurve

    log = MetricsLogger(str(tmp_path), "t")
    log.log(1, reward=1.5)
    log.log(2, reward=2.5, note="hi")
    lines = [json.loads(l) for l in open(tmp_path / "t.jsonl")]
    assert lines[0]["reward"] == 1.5 and lines[1]["note"] == "hi"

    c = RewardCurve(window=2)
    assert c.append(1.0) == 1.0
    assert c.append(3.0) == 2.0
    assert c.append(5.0) == 4.0
    assert c.max_mean == 4.0


def test_reduce_attn_helper():
    """GoalFormer.py:21-26 renormalized damping."""
    from dgvit_tpu.ops.attention import reduce_attn

    attn = jnp.asarray([[0.7, 0.2, 0.1], [0.3, 0.3, 0.4]])
    out = np.asarray(reduce_attn(attn, reduction=0.1, threshold=0.5))
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-6)
    # the damped row redistributes mass away from the >0.5 entry
    assert out[0, 0] < 0.7
    np.testing.assert_allclose(out[1], [0.3, 0.3, 0.4], rtol=1e-6)


def test_profiler_smoke(tmp_path):
    from dgvit_tpu.utils.metrics import Profiler

    with Profiler(str(tmp_path / "trace")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    import os
    assert os.path.isdir(tmp_path / "trace")
