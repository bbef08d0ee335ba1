"""Config system tests incl. the reference-yaml translator."""

import pytest

from dgvit_tpu.config import Config, load_reference_yaml

REF_YAML = "/root/reference/src/vis_nav/vis_nav/config.yaml"


def test_defaults_valid():
    cfg = Config().validate()
    assert cfg.model.block == 4 and cfg.model.head == 4
    assert cfg.sac.gamma == 0.999


def test_reference_yaml_translation():
    import os
    if not os.path.exists(REF_YAML):
        pytest.skip("reference not mounted")
    cfg = load_reference_yaml(REF_YAML)
    # values straight from config.yaml:1-63
    assert cfg.train.seed == 3407
    assert cfg.model.latent_size == 64
    assert cfg.model.block == 4 and cfg.model.head == 4
    assert cfg.model.actor_type == "GaussianTransformer"
    assert cfg.model.critic_type == "CNN"
    assert cfg.sac.batch_size == 32
    assert cfg.sac.gamma == 0.999 and cfg.sac.tau == 0.0005
    assert cfg.sac.buffer_size == 30000
    assert cfg.env.vis_sensor == "fish_image"
    assert cfg.env.linear_cmd_scale == 0.25
    assert cfg.env.max_steps == 800 and cfg.env.max_episodes == 800
    assert cfg.train.pre_train is True and cfg.train.if_test is False


def test_roundtrip_dict():
    cfg = Config.from_dict({"sac": {"gamma": 0.95}})
    d = cfg.to_dict()
    cfg2 = Config.from_dict(d)
    assert cfg2.sac.gamma == 0.95


def test_bad_value_rejected():
    with pytest.raises(AssertionError):
        Config.from_dict({"env": {"vis_sensor": "lidar"}})


def test_yaml_scalar_coercion():
    """YAML 1.1 parses '1.0e9' (no exponent sign) as a STRING; scalar config
    fields coerce to the default's type at load so this repairs silently
    instead of crashing episodes later inside the training loop."""
    cfg = Config.from_dict({"train": {"reward_threshold": "1.0e9"},
                            "sac": {"alpha": 1}})
    assert cfg.train.reward_threshold == 1e9
    assert isinstance(cfg.train.reward_threshold, float)
    assert isinstance(cfg.sac.alpha, float)          # int -> float field
    with pytest.raises(TypeError):
        Config.from_dict({"train": {"save": "yes"}})  # bool stays strict
    with pytest.raises(TypeError):
        Config.from_dict({"sac": {"batch_size": "many"}})
