"""Round-2 aux coverage: SLIC oracle vs skimage (skippable), distributed
init no-op behavior, and local batch slicing (VERDICT r1 Missing #6, Weak #5).
"""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# core/distributed.py (multi-host init + process-major batch slicing)
# ---------------------------------------------------------------------------

def test_distributed_initialize_noop_single_process(monkeypatch):
    """No coordinator address -> no jax.distributed call at all."""
    import jax

    from dgvit_tpu.core import distributed

    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    called = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.setdefault("kw", kw))
    distributed.initialize()
    assert "kw" not in called


def test_distributed_initialize_passes_env_config(monkeypatch):
    import jax

    from dgvit_tpu.core import distributed

    got = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: got.update(kw))
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("NUM_PROCESSES", "4")
    monkeypatch.setenv("PROCESS_ID", "2")
    distributed.initialize()
    assert got == {"coordinator_address": "10.0.0.1:1234",
                   "num_processes": 4, "process_id": 2}


def test_local_batch_slice_covers_global_batch(monkeypatch):
    """Process-major slices must tile the global batch exactly — this is the
    layout make_mesh produces for the data axis."""
    import jax

    from dgvit_tpu.core import distributed

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    slices = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        slices.append(distributed.local_batch_slice(32))
    covered = sorted(i for s in slices for i in range(s.start, s.stop))
    assert covered == list(range(32))


# ---------------------------------------------------------------------------
# SLIC vs skimage oracle (env_lab.py:49-59 uses skimage.segmentation.slic)
# ---------------------------------------------------------------------------

def _test_image(h=64, w=80, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    img = 0.5 * yy + 0.3 * np.sin(6 * xx) + 0.05 * rng.normal(size=(h, w))
    return (255 * (img - img.min()) / (img.ptp() + 1e-9)).astype(np.float32)


def test_slic_segments_close_to_skimage():
    pytest.importorskip("skimage", reason="scikit-image not installed")
    from skimage.segmentation import slic as sk_slic

    from dgvit_tpu.envs.faults import slic_segments

    img = _test_image()
    ours = slic_segments(img, n_segments=50, compactness=4)
    ref = sk_slic(img, n_segments=50, compactness=4, channel_axis=None,
                  start_label=1)
    n_ours = len(np.unique(ours))
    n_ref = len(np.unique(ref))
    # independent implementations won't be label-identical; require the
    # segmentations to agree structurally: comparable segment counts and
    # high pairwise co-assignment (Rand-index style) on sampled pixel pairs
    assert 0.5 * n_ref <= n_ours <= 2.0 * n_ref
    rng = np.random.default_rng(1)
    flat_o, flat_r = ours.ravel(), ref.ravel()
    i = rng.integers(0, flat_o.size, 4000)
    j = rng.integers(0, flat_o.size, 4000)
    same_o = flat_o[i] == flat_o[j]
    same_r = flat_r[i] == flat_r[j]
    rand_index = np.mean(same_o == same_r)
    assert rand_index > 0.85, f"segmentations diverge: RI={rand_index:.3f}"


def test_superpixel_occlusion_band_fraction_close_to_skimage():
    pytest.importorskip("skimage", reason="scikit-image not installed")
    from skimage.segmentation import slic as sk_slic

    from dgvit_tpu.envs.faults import superpixel_occlusion

    img = _test_image(seed=2) + 1.0  # strictly positive so zeros = occluded
    ours = superpixel_occlusion(img, segments=50)
    # reference pipeline with skimage labels (env_lab.py:49-59)
    labels = sk_slic(img, n_segments=50, compactness=4, channel_axis=None,
                     start_label=1)
    h = img.shape[0]
    band = h // 5
    y1 = h // 2 - band // 2
    ref = img.copy()
    for seg in np.unique(labels[y1:y1 + band, :]):
        ref[labels == seg] = 0
    frac_ours = np.mean(ours == 0)
    frac_ref = np.mean(ref == 0)
    assert frac_ours > 0.15  # the band plus overlap is a sizable region
    assert abs(frac_ours - frac_ref) < 0.25


# ---------------------------------------------------------------------------
# keyboard teleop (keyboard_control.py:24-143 contract)
# ---------------------------------------------------------------------------

def test_teleop_engage_gate_and_clamps():
    from dgvit_tpu.train.keyboard_control import (ANG_MAX, LIN_MAX,
                                                  KeyboardTeleop)

    t = KeyboardTeleop()
    assert not t.engaged
    t.update("1")
    assert t.engaged          # '1' engages (keyboard_control.py gate)
    t.update("2")
    assert not t.engaged      # '2' disengages

    for _ in range(50):
        t.update("w")
    assert t.linear == pytest.approx(LIN_MAX)   # clamp 0.5 m/s
    for _ in range(50):
        t.update("d")
    assert t.angular == pytest.approx(-ANG_MAX)  # clamp 0.6 rad/s
    t.update("x")
    assert t.linear == 0.0 and t.angular == 0.0


def test_teleop_satisfies_intervention_protocol():
    """train_rl's `intervention` contract: .engaged + .read_action()."""
    from dgvit_tpu.train.keyboard_control import KeyboardTeleop

    t = KeyboardTeleop()
    assert hasattr(t, "engaged")
    assert callable(t.read_action)


def test_teleop_loop_drives_env_and_quits():
    """teleop_loop (the dgvit-teleop console entry's core) drives the env
    from an injectable key source, honors 'q' quit, and resets on done —
    the reference's control_loop (keyboard_control.py:62-117) with env.step
    standing in for the /scout/cmd_vel publisher."""
    from dgvit_tpu.envs import KinematicNavEnv
    from dgvit_tpu.train.keyboard_control import KeyboardTeleop, teleop_loop

    keys = iter(["1", "w", "w", None, "a", "x", "q"])
    lines = []
    env = KinematicNavEnv(seed=0)
    t = KeyboardTeleop()
    steps = teleop_loop(env, t, max_steps=100,
                        key_source=lambda: next(keys, "q"),
                        log=lines.append)
    assert steps == 6                       # 'q' consumed without a step
    assert t.engaged                        # '1' engaged and stayed
    assert any("ENGAGED" in ln for ln in lines)
    assert t.linear == 0.0 and t.angular == 0.0   # 'x' stopped

    # bounded run: max_steps caps the loop even with keys forever
    steps = teleop_loop(env, KeyboardTeleop(), max_steps=3,
                        key_source=lambda: "w", log=lambda s: None)
    assert steps == 3


def test_robustness_compare_tool(tmp_path, capsys):
    """tools/robustness_compare.py merges sweep.jsonl files into the
    fault x policy matrix (reproduces BENCH.md round-4 tables)."""
    import json as _json
    import sys as _sys
    _sys.path.insert(0, "tools")
    import robustness_compare as rc

    a = tmp_path / "a.jsonl"
    rows_a = [
        {"world": "rrc", "success_rate": 1.0, "collisions": 0,
         "obs_noise": 0.0, "blur": 0.0, "occlusion": 0.0,
         "patch_occlusion": 0.0, "greying": 0.0},
        {"world": "rrc", "success_rate": 0.5, "collisions": 50,
         "obs_noise": 0.196, "blur": 0.0, "occlusion": 0.0,
         "patch_occlusion": 0.0, "greying": 0.0},
    ]
    a.write_text("\n".join(_json.dumps(r) for r in rows_a))
    b = tmp_path / "b.jsonl"
    rows_b = [dict(rows_a[0], success_rate=0.6, collisions=40),
              {"world": "rrc", "success_rate": 0.55, "collisions": 45,
               "obs_noise": 0.0, "blur": 0.0, "occlusion": 0.0,
               "patch_occlusion": 0.25, "greying": 0.0}]
    b.write_text("\n".join(_json.dumps(r) for r in rows_b))

    out_md = tmp_path / "cmp.md"
    rc.main([f"one={a}", f"two={b}", "--world", "rrc",
             "--out", str(out_md)])
    txt = out_md.read_text()
    lines = txt.strip().splitlines()
    assert lines[0] == "| fault | one, rrc | two, rrc |"
    assert "| clean | 100% (0) | 60% (40) |" in txt
    assert "| obs_noise=0.196 | 50% (50) | — |" in txt
    assert "| patch_occlusion=0.25 | — | 55% (45) |" in txt
    # clean row sorts first
    assert lines[2].startswith("| clean")
