"""On-device rollout (io_callback env boundary) integration test."""

import jax
import numpy as np

from dgvit_tpu.agents import SACAgent
from dgvit_tpu.config import Config
from dgvit_tpu.envs import KinematicNavEnv
from dgvit_tpu.train.device_rollout import device_rollout

import pytest

pytestmark = pytest.mark.slow


def test_device_rollout_episode():
    cfg = Config.from_dict({
        "model": {"block": 1, "head": 2, "latent_size": 32, "mlp_dim": 64,
                  "image_size": (32, 40), "patch_size": (16, 20)},
    })
    agent = SACAgent(cfg)
    state = agent.init_state(0)
    env = KinematicNavEnv(seed=0, image_hw=(32, 40))

    out = device_rollout(agent, state, env, max_steps=20,
                         l_scale=0.25, a_scale=1.0,
                         rng=jax.random.PRNGKey(0))
    rews = np.asarray(out.rewards)
    assert rews.shape == (20,)
    assert np.isfinite(rews).all()
    acts = np.asarray(out.actions)
    assert (np.abs(acts) <= 1.0).all()
    # rewards are zeroed after the episode ends
    dones = np.asarray(out.dones)
    if dones.max() > 0:
        first_done = int(np.argmax(dones > 0))
        assert (rews[first_done + 1:] == 0).all()
    # env actually stepped on the host
    assert env.last_act != (0.0, 0.0) or dones[0] > 0
