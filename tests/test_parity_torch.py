"""Parity gate: transplant reference PyTorch weights into dgvit_tpu models and
match outputs to fp32 tolerance on real logged frames (BASELINE.md fidelity
gate; SURVEY.md §4 'Parity/integration').

The reference modules are imported read-only from /root/reference (skipped if
unavailable). Dropout is disabled on both sides (torch .eval() /
deterministic=True) so the comparison is exact.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dgvit_tpu.models import GoTPolicy, GoTQNetwork, GaussianPolicy, QNetwork
from dgvit_tpu.models import distributions
from dgvit_tpu.models.torch_io import (
    cnn_policy_params_from_torch,
    cnn_q_params_from_torch,
    got_policy_params_from_torch,
    got_q_params_from_torch,
)

DATA_NPZ = "/root/reference/Data/Bachelor/Regragui_RGB_Image2/demo_bot_202.npz"


def _frames(n=3):
    """Real logged depth frames (reference Data/, component #23)."""
    try:
        d = np.load(DATA_NPZ)
        obs = d["obs"][:n, :, :, 0].astype(np.float32)  # (n, 128, 160)
        goal = d["goal"][:n, :2].astype(np.float32)
    except FileNotFoundError:
        rng = np.random.default_rng(0)
        obs = rng.random((n, 128, 160), dtype=np.float32)
        goal = rng.random((n, 2), dtype=np.float32)
    return obs, goal


@pytest.fixture(scope="module")
def torch():
    import torch as t

    t.manual_seed(0)
    return t


def test_got_policy_parity(reference_modules, torch):
    _, ref = reference_modules
    tp = ref.GoTPolicy(2, 2, block=4, head=4, l_f_size=64).eval()
    obs, goal = _frames()

    with torch.no_grad():
        t_mean, t_logstd = tp.forward([torch.tensor(obs), torch.tensor(goal)])

    params = {"params": got_policy_params_from_torch(tp.state_dict(), depth=4)}
    model = GoTPolicy(block=4, head=4, l_f_size=64, attn_impl="xla")
    j_mean, j_logstd = model.apply(params, jnp.asarray(obs), jnp.asarray(goal))

    np.testing.assert_allclose(np.asarray(j_mean), t_mean.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_logstd), t_logstd.numpy(), atol=2e-5, rtol=1e-4)

    # deterministic action path used by evaluation (testing.py:103-144):
    # tanh(mean) must match to fp32 tolerance — the parity gate currency
    t_act = np.tanh(t_mean.numpy())
    j_act = np.asarray(
        distributions.sample(jax.random.PRNGKey(0), j_mean, j_logstd).mean
    )
    np.testing.assert_allclose(j_act, t_act, atol=2e-5, rtol=1e-4)


def test_got_q_network_parity(reference_modules, torch):
    _, ref = reference_modules
    tq = ref.GoTQNetwork(2, 2, block=4, head=4, l_f_size=64).eval()
    obs, goal = _frames()
    act = np.linspace(-1, 1, obs.shape[0] * 2, dtype=np.float32).reshape(-1, 2)

    with torch.no_grad():
        t_q1, t_q2 = tq.forward([torch.tensor(obs), torch.tensor(goal), torch.tensor(act)])

    params = {"params": got_q_params_from_torch(tq.state_dict(), depth=4)}
    model = GoTQNetwork(block=4, head=4, l_f_size=64, attn_impl="xla")
    j_q1, j_q2 = model.apply(params, jnp.asarray(obs), jnp.asarray(goal), jnp.asarray(act))

    np.testing.assert_allclose(np.asarray(j_q1), t_q1.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_q2), t_q2.numpy(), atol=3e-5, rtol=1e-4)


def test_cnn_policy_parity(reference_modules, torch):
    _, ref = reference_modules
    tp = ref.GaussianPolicy(2, 2).eval()
    obs, goal = _frames()

    with torch.no_grad():
        t_mean, t_logstd = tp.forward([torch.tensor(obs), torch.tensor(goal)])

    params = {"params": cnn_policy_params_from_torch(tp.state_dict())}
    model = GaussianPolicy()
    j_mean, j_logstd = model.apply(params, jnp.asarray(obs), jnp.asarray(goal))
    np.testing.assert_allclose(np.asarray(j_mean), t_mean.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_logstd), t_logstd.numpy(), atol=2e-5, rtol=1e-4)


def test_cnn_q_network_parity(reference_modules, torch):
    _, ref = reference_modules
    tq = ref.QNetwork(2, 2).eval()
    obs, goal = _frames()
    act = np.linspace(-1, 1, obs.shape[0] * 2, dtype=np.float32).reshape(-1, 2)

    with torch.no_grad():
        t_q1, t_q2 = tq.forward([torch.tensor(obs), torch.tensor(goal), torch.tensor(act)])

    params = {"params": cnn_q_params_from_torch(tq.state_dict())}
    model = QNetwork()
    j_q1, j_q2 = model.apply(params, jnp.asarray(obs), jnp.asarray(goal), jnp.asarray(act))
    np.testing.assert_allclose(np.asarray(j_q1), t_q1.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_q2), t_q2.numpy(), atol=2e-5, rtol=1e-4)


def test_tanh_gaussian_log_prob_closed_form(torch):
    """tanh-Gaussian log-prob vs torch.distributions oracle
    (got_sac_network.py:238-251)."""
    rng = np.random.default_rng(1)
    mean = rng.standard_normal((8, 2)).astype(np.float32)
    log_std = rng.uniform(-3, 0.5, (8, 2)).astype(np.float32)
    x_t = rng.standard_normal((8, 2)).astype(np.float32)

    t_mean, t_std = torch.tensor(mean), torch.tensor(np.exp(log_std))
    normal = torch.distributions.Normal(t_mean, t_std)
    y_t = torch.tanh(torch.tensor(x_t))
    t_lp = normal.log_prob(torch.tensor(x_t)) - torch.log(1.0 * (1 - y_t.pow(2)) + 1e-6)
    t_lp = t_lp.sum(1, keepdim=True).numpy()

    j_lp = distributions.normal_log_prob(
        jnp.asarray(x_t), jnp.asarray(mean), jnp.exp(jnp.asarray(log_std)))
    j_y = jnp.tanh(jnp.asarray(x_t))
    j_lp = j_lp - jnp.log(1.0 * (1 - j_y**2) + 1e-6)
    j_lp = np.asarray(j_lp.sum(axis=1, keepdims=True))
    np.testing.assert_allclose(j_lp, t_lp, atol=1e-5, rtol=1e-5)


def test_sample_statistics():
    """Sampled actions are tanh-bounded; log_prob matches recomputation."""
    key = jax.random.PRNGKey(0)
    mean = jnp.zeros((512, 2))
    log_std = jnp.full((512, 2), -0.5)
    s = distributions.sample(key, mean, log_std)
    assert bool(jnp.all(jnp.abs(s.action) <= 1.0))
    assert s.log_prob.shape == (512, 1)
    # mean action of zero-mean is zero
    np.testing.assert_allclose(np.asarray(s.mean), 0.0, atol=1e-7)
