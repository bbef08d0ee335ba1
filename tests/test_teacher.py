"""SACTeacher: frozen-actor action source (reference SAC_teacher,
main.py:27-53 — dead code there; here it records teacher demo corpora)."""

import numpy as np

import jax

from dgvit_tpu.agents import SACTeacher
from dgvit_tpu.config import Config
from dgvit_tpu.core import checkpoint as ckpt
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.models import build_actor
from dgvit_tpu.train.demo_record import record_episodes


def _cfg():
    return Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 16, "mlp_dim": 32,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "env": {"max_steps": 10},
    })


def test_teacher_loads_and_acts(tmp_path):
    cfg = _cfg()
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(0), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    ckpt.save_params_npz(str(tmp_path), "teach", params)

    t = SACTeacher(cfg, "teach", str(tmp_path))
    a = t.choose_action(np.zeros((32, 40), np.float32),
                        np.zeros(4, np.float32)[:2])
    assert a.shape == (2,) and np.all(np.abs(a) <= 1.0)  # tanh'd mean
    ab = t.choose_action(np.zeros((3, 32, 40), np.float32),
                         np.zeros((3, 2), np.float32))
    assert ab.shape == (3, 2)
    np.testing.assert_allclose(ab[0], a, rtol=1e-5)  # deterministic

    # the exact deployment map: tanh(mean) of the live actor
    import jax.numpy as jnp
    mean, _ = actor.apply({"params": params}, jnp.zeros((1, 32, 40)),
                          jnp.zeros((1, 2)))
    np.testing.assert_allclose(a, np.tanh(np.asarray(mean))[0], atol=1e-6)


def test_teacher_records_demo_corpus(tmp_path):
    """Teacher-generated demonstrations: the SAC_teacher workflow wired to
    the recorder (the reference's commented-out teacher hooks,
    main.py:271,403, never did this)."""
    cfg = _cfg()
    actor = build_actor(cfg)
    params = actor.init(jax.random.PRNGKey(1), np.zeros((1, 32, 40)),
                        np.zeros((1, 2)))["params"]
    ckpt.save_params_npz(str(tmp_path), "teach", params)
    teacher = SACTeacher(cfg, "teach", str(tmp_path))
    source, to_env = teacher.as_pilot()

    env = KinematicNavEnv(seed=3, image_hw=(32, 40))
    paths = record_episodes(env, source, str(tmp_path / "demos"),
                            episodes=2, max_steps=10, action_to_env=to_env)
    assert paths
    d = np.load(paths[0])
    assert d["obs"].shape[1:] == (32, 40)
    assert d["act"].shape[1:] == (2,)
    assert np.all(np.abs(d["act"]) <= cfg.env.max_action)  # policy units
