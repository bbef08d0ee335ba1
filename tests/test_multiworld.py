"""World ensembles / domain randomization for the vectorized env
(envs/worlds.random_world + make_consts world="rand<K>").

Motivated by the measured transfer ceiling (BENCH.md round 4: neither more
data nor more episodes move hospital transfer past ~48% — world diversity
is the binding constraint). A lane's world is assigned PER EPISODE by a
deterministic hash of its record index (_world_of): ray casting, record
banks, and auto-reset must all follow that assignment, and ensembles
larger than the lane count must actually get visited (the dr_rand32 ==
dr_rand16 regression, BENCH.md round 4 stage C).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgvit_tpu.config import Config
from dgvit_tpu.envs.jax_kinematic import (_depth_image, _reset_fields,
                                          _world_of, make_consts, vec_reset,
                                          vec_step)
from dgvit_tpu.envs.worlds import RRC, random_world


def test_random_world_deterministic_and_in_arena():
    w1 = random_world(7)
    w2 = random_world(7)
    w3 = random_world(8)
    assert w1.boxes == w2.boxes
    assert w1.boxes != w3.boxes
    ax0, ax1, ay0, ay1 = w1.arena
    assert w1.arena == RRC.arena
    for x0, x1, y0, y1 in w1.boxes:
        assert x0 < x1 and y0 < y1
        assert ax0 < x0 and x1 < ax1 and ay0 < y0 and y1 < ay1


def test_rand_spec_builds_ensemble_consts():
    c = make_consts(world="rand4", image_hw=(32, 40), seed=3)
    assert c.world.boxes.ndim == 3 and c.world.boxes.shape[0] == 4
    assert c.records.ndim == 3 and c.records.shape[0] == 4
    assert c.world.arena.shape == (4,)
    # deterministic in seed
    c2 = make_consts(world="rand4", image_hw=(32, 40), seed=3)
    np.testing.assert_array_equal(np.asarray(c.world.boxes),
                                  np.asarray(c2.world.boxes))


def test_ensemble_lane_raycast_matches_single_world():
    """Lane i's depth image against the ensemble == the same pose rendered
    in world i % K alone — the per-lane box-table gather is exact."""
    wa, wb = random_world(1), random_world(2)
    ce = make_consts(world=[wa, wb], image_hw=(24, 32), seed=0)
    ca = make_consts(world=wa, image_hw=(24, 32), seed=0)
    cb = make_consts(world=wb, image_hw=(24, 32), seed=0)

    x = jnp.asarray([0.3, 0.3], jnp.float32)
    y = jnp.asarray([-0.2, -0.2], jnp.float32)
    th = jnp.asarray([0.7, 0.7], jnp.float32)
    img_e = np.asarray(_depth_image(ce, x, y, th))
    img_a = np.asarray(_depth_image(ca, x[:1], y[:1], th[:1]))
    img_b = np.asarray(_depth_image(cb, x[1:], y[1:], th[1:]))
    np.testing.assert_array_equal(img_e[0], img_a[0])
    np.testing.assert_array_equal(img_e[1], img_b[0])
    # the two worlds genuinely differ
    assert not np.array_equal(img_e[0], img_e[1])


def test_ensemble_box_padding_never_hits():
    """Worlds with fewer boxes pad with far-away boxes that cannot shadow
    any real ray (they sit beyond every max range)."""
    small = random_world(5, n_boxes=2)
    big = random_world(6, n_boxes=6)
    ce = make_consts(world=[small, big], image_hw=(16, 20), seed=0)
    cs = make_consts(world=small, image_hw=(16, 20), seed=0)
    assert ce.world.boxes.shape[1] == 6  # padded to the max box count
    x = jnp.asarray([0.0, 0.0], jnp.float32)
    y = jnp.asarray([0.0, 0.0], jnp.float32)
    th = jnp.asarray([1.1, 1.1], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_depth_image(ce, x, y, th))[0],
        np.asarray(_depth_image(cs, x[:1], y[:1], th[:1]))[0])


def test_ensemble_reset_uses_per_world_record_banks():
    c = make_consts(world="rand3", image_hw=(16, 20), seed=1, n_records=8)
    rec_idx = jnp.arange(6, dtype=jnp.int32)  # 6 episode slots, 3 worlds
    x, y, theta, gx, gy, dist = _reset_fields(c, rec_idx)
    tables = np.asarray(c.records)
    widx = np.asarray(_world_of(c, rec_idx))
    for lane in range(6):
        w = int(widx[lane])
        np.testing.assert_allclose(
            [float(x[lane]), float(y[lane]), float(gx[lane]),
             float(gy[lane])], tables[w, lane % 8, :4], rtol=1e-6)
    # spawns are never inside their own world's boxes
    boxes = np.asarray(c.world.boxes)
    for lane in range(6):
        bx = boxes[int(widx[lane])]
        inside = ((bx[:, 0] <= float(x[lane])) & (float(x[lane]) <= bx[:, 1])
                  & (bx[:, 2] <= float(y[lane]))
                  & (float(y[lane]) <= bx[:, 3]))
        assert not inside.any()


def test_world_resamples_every_reset_and_covers_big_ensembles():
    """The dr_rand32 regression: with K=32 worlds and only 4 lanes, the
    per-episode hash must (a) change a lane's world across resets even
    when K divides the lane count, and (b) visit many more worlds than
    the lane count over a run — the static lane % K map could do
    neither."""
    c = make_consts(world="rand32", image_hw=(16, 20), seed=0)
    B = 4
    # lane i's rec_idx stream across auto-resets: i, i+B, i+2B, ...
    episodes = 64
    lane_worlds = np.asarray(_world_of(
        c, jnp.asarray([[i + t * B for t in range(episodes)]
                        for i in range(B)], jnp.int32)))
    for i in range(B):
        assert len(set(lane_worlds[i].tolist())) > 1   # (a) resamples
    visited = set(lane_worlds.ravel().tolist())
    assert len(visited) > B                            # (b) beyond lanes
    assert visited <= set(range(32))
    # K | B case too (the pure `rec_idx % K` scheme is constant here)
    c8 = make_consts(world="rand2", image_hw=(16, 20), seed=0)
    stream = np.asarray(_world_of(
        c8, jnp.asarray([0, 8, 16, 24, 32, 40], jnp.int32)))
    assert len(set(stream.tolist())) > 1


def test_render_follows_per_episode_world():
    """vec_step's pre-reset sensors raycast in the episode's assigned
    world, not in lane % K: lane obs == the same pose rendered alone in
    world _world_of(rec_idx)."""
    from dgvit_tpu.envs.worlds import WorldPreset

    c = make_consts(world="rand4", image_hw=(16, 20), seed=5, n_records=4)
    state, obs, _ = vec_reset(c, 2)
    # advance rec_idx past one auto-reset so assignment != episode 0's
    state = state._replace(rec_idx=jnp.asarray([6, 7], jnp.int32))
    out = vec_step(c, state, jnp.tile(jnp.asarray([[0.2, 0.1]]), (2, 1)))
    widx = np.asarray(_world_of(c, state.rec_idx))
    worlds = np.asarray(c.world.boxes)
    arena = tuple(float(v) for v in np.asarray(c.world.arena))
    for lane in range(2):
        single = make_consts(
            world=[WorldPreset(
                name="w",
                boxes=tuple(map(tuple, worlds[int(widx[lane])].tolist())),
                arena=arena)],
            image_hw=(16, 20), seed=5, n_records=4)
        img = np.asarray(_depth_image(
            single, out.state.x[lane][None], out.state.y[lane][None],
            out.state.theta[lane][None], jnp.zeros(1, jnp.int32)))
        np.testing.assert_array_equal(np.asarray(out.next_obs)[lane], img[0])


def test_ensemble_vec_step_and_autoreset():
    c = make_consts(world="rand2", image_hw=(16, 20), seed=2, max_steps=3,
                    n_records=4)
    state, obs, to_goal = vec_reset(c, 4)
    assert obs.shape == (4, 16, 20)
    for _ in range(4):  # cross the max_steps boundary -> auto-resets fire
        out = vec_step(c, state, jnp.tile(jnp.asarray([[0.2, 0.1]]), (4, 1)))
        state = out.state
    assert np.isfinite(np.asarray(out.reward)).all()
    assert np.asarray(state.steps).max() <= 3


def test_ensemble_through_fused_training(tmp_path):
    """world='rand2' flows through train_fused end-to-end (the domain-
    randomization training tier)."""
    from dgvit_tpu.train.fused_train import train_fused

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 4},
        "train": {"pre_buffer": False, "pre_train": False, "save": False},
    })
    out = train_fused(cfg, out_dir=str(tmp_path), n_envs=4, chunk=6,
                      rounds=2, rounds_per_dispatch=2, updates_per_round=1,
                      ring_capacity=64, world="rand2")
    assert out["rounds"] == 2 and out["env_steps"] == 2 * 4 * 6


def test_single_world_path_unchanged():
    """The ensemble branch must not perturb the equality-gated single-world
    path (trajectory parity vs KinematicNavEnv rides on it)."""
    c1 = make_consts(world="rrc", image_hw=(16, 20), seed=0)
    assert c1.world.boxes.ndim == 2 and c1.records.ndim == 2
    # mixed-arena explicit lists build a (K, 4) arena table (randm support)
    cm = make_consts(world=[random_world(1),
                            random_world(2, arena=(-9, 9, -9, 9))],
                     image_hw=(16, 20))
    assert cm.world.arena.shape == (2, 4)


def test_lane_pinned_assignment_option():
    """world_assign='lane' pins lane i to world i % K for the whole run —
    the measured-better training recipe (BENCH.md round 4 stage D), kept
    selectable alongside the default per-reset rehash."""
    c = make_consts(world="rand3", image_hw=(16, 20), seed=1,
                    world_assign="lane")
    # any rec_idx values: assignment depends only on lane position
    w1 = np.asarray(_world_of(c, jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)))
    w2 = np.asarray(_world_of(c, jnp.asarray([7, 70, 700, 1, 2, 3],
                                             jnp.int32)))
    np.testing.assert_array_equal(w1, [0, 1, 2, 0, 1, 2])
    np.testing.assert_array_equal(w1, w2)
    # flows through the fused trainer
    from dgvit_tpu.train.fused_train import train_fused
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 4},
        "train": {"pre_buffer": False, "pre_train": False, "save": False},
    })
    out = train_fused(cfg, out_dir="/tmp/mw_lane", n_envs=4, chunk=6,
                      rounds=1, rounds_per_dispatch=1, updates_per_round=1,
                      ring_capacity=64, world="rand2", world_assign="lane")
    assert out["rounds"] == 1


def test_random_ensemble_specs():
    from dgvit_tpu.envs.worlds import HOSPITAL, RRC, random_ensemble

    r = random_ensemble("rand3", seed=7)
    assert len(r) == 3 and all(w.arena == RRC.arena for w in r)
    # plain rand members are byte-compatible with the pre-randm behavior
    from dgvit_tpu.envs.worlds import random_world
    assert r[1].boxes == random_world(1000 * 7 + 1).boxes

    h = random_ensemble("randh2", seed=0)
    assert all(w.arena == HOSPITAL.arena for w in h)
    assert all(len(w.boxes) == 20 for w in h)

    m = random_ensemble("randm4", seed=0)
    assert [w.arena == HOSPITAL.arena for w in m] == [False, True] * 2

    import pytest
    with pytest.raises(ValueError, match="not a rand spec"):
        random_ensemble("nope8")


def test_mixed_scale_ensemble_per_lane_arenas():
    """randm<K>: the arena table goes (K, 4) and each lane raycasts against
    ITS world's walls — a pose outside the small arena but inside the big
    one must see walls only in the small-arena lane."""
    c = make_consts(world="randm2", image_hw=(16, 20), seed=0)
    assert c.world.arena.ndim == 2 and c.world.arena.shape == (2, 4)
    from dgvit_tpu.envs.jax_kinematic import _laser

    # same pose, lane 0 (RRC-sized world) vs lane 1 (hospital-sized):
    # beyond the RRC wall at x=5.5 the hospital lane still has ~6.5 m of
    # clearance to ITS wall at x=12
    x = jnp.asarray([4.5, 4.5], jnp.float32)
    y = jnp.asarray([0.0, 0.0], jnp.float32)
    th = jnp.zeros(2, jnp.float32)  # facing +x
    d = np.asarray(_laser(c, x, y, th, jnp.asarray([0, 1], jnp.int32)))
    mid = d.shape[1] // 2           # the forward ray
    assert d[0, mid] < 1.5          # RRC wall ~1.0 m ahead (or a box)
    assert d[1, mid] > d[0, mid]    # hospital lane sees farther


def test_mixed_scale_ensemble_trains(tmp_path):
    from dgvit_tpu.train.fused_train import train_fused

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4, "buffer_size": 128},
        "env": {"max_steps": 4},
        "train": {"pre_buffer": False, "pre_train": False, "save": False},
    })
    out = train_fused(cfg, out_dir=str(tmp_path), n_envs=4, chunk=6,
                      rounds=2, rounds_per_dispatch=2, updates_per_round=1,
                      ring_capacity=64, world="randm4")
    assert out["rounds"] == 2


def test_eval_on_heldout_procedural_ensemble(tmp_path):
    """run_eval_vec over a rand<K>/randm<K> world: each episode-lane runs
    in its hashed ensemble member — seeding the eval differently from
    training gives a held-out PROCEDURAL generalization metric (100
    never-seen layouts in one dispatch)."""
    from dgvit_tpu.agents.sac import SACAgent
    from dgvit_tpu.train.evaluate import run_eval_vec

    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
        "sac": {"batch_size": 4},
        "env": {"max_steps": 10},
        "train": {"seed": 7},
    })
    agent = SACAgent(cfg)
    state = agent.init_state(0)
    for world in ("rand8", "randm4"):
        rep = run_eval_vec(cfg, state.actor_params, max_episodes=8,
                           world=world, out_dir=str(tmp_path), name="ens")
        assert 0.0 <= rep["success_rate"] <= 1.0
        # held-out BY DEFAULT: a rand-spec eval must NOT reuse the training
        # seed (member i <- 1000*seed+i would re-draw the training worlds)
        assert rep["world_seed"] != cfg.train.seed
        # pinning world_seed back to the training seed is the explicit
        # training-distribution eval
        rep_t = run_eval_vec(cfg, state.actor_params, max_episodes=8,
                             world=world, out_dir=str(tmp_path), name="ens",
                             world_seed=cfg.train.seed)
        assert rep_t["world_seed"] == cfg.train.seed
