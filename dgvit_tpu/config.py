"""Typed, validated configuration.

Replaces the reference's flat YAML + hard-coded absolute paths
(reference: src/vis_nav/vis_nav/config.yaml:1-63, loaded at main.py:134-136).
Every knob of the reference config is represented; unknown keys raise.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _update_dataclass(obj, data: Dict[str, Any], path: str = ""):
    names = {f.name: f for f in dataclasses.fields(obj)}
    for key, val in data.items():
        if key not in names:
            raise KeyError(f"unknown config key {path + key!r}")
        cur = getattr(obj, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, dict):
            _update_dataclass(cur, val, path=path + key + ".")
        else:
            # coerce scalars to the default's type so YAML sharp edges fail
            # HERE, not episodes later inside the training loop. (YAML 1.1
            # parses '1.0e9' as a STRING — the exponent needs a sign — so a
            # float field can silently receive a str.)
            if isinstance(cur, bool):
                if not isinstance(val, bool):
                    raise TypeError(
                        f"config key {path + key!r}: expected bool, "
                        f"got {type(val).__name__} {val!r}")
            elif isinstance(cur, (int, float)) and not isinstance(val, bool):
                try:
                    val = type(cur)(val)
                except (TypeError, ValueError):
                    raise TypeError(
                        f"config key {path + key!r}: expected "
                        f"{type(cur).__name__}, got {type(val).__name__} "
                        f"{val!r}") from None
            setattr(obj, key, val)
    return obj


@dataclass
class ModelConfig:
    """GoT / ViT / CNN architecture knobs.

    Defaults mirror the reference's active GoT-SAC configuration
    (config.yaml:58-63 block=4 head=4; LATENT_FEATURES_SIZE 64 at :5;
    GoalFormer.py:124 dim_head=64 default, got_sac_network.py:176-185 mlp_dim=2048).
    """

    name: str = "gtrl"
    actor_type: str = "GaussianTransformer"  # GaussianTransformer | GaussianConvNet | DeterministicTransformer | Deterministic
    critic_type: str = "Transformer"  # Transformer | CNN
    block: int = 4          # transformer depth
    head: int = 4           # attention heads
    dim_head: int = 64
    mlp_dim: int = 2048
    latent_size: int = 64   # LATENT_FEATURES_SIZE (ViT embed dim)
    image_size: Tuple[int, int] = (128, 160)
    patch_size: Tuple[int, int] = (16, 20)
    emb_dropout: float = 0.1
    dropout: float = 0.0
    backbone: str = "got"   # got | simple_vit (vit_sac_network alternative zoo)
    compute_dtype: str = "float32"  # float32 | bfloat16 (bf16 for the TPU fast path)
    # Shard the token stream over the `seq` mesh axis (ring attention,
    # parallel/ring_attention.py). Requires an active mesh with seq > 1 and a
    # token count divisible by it (SimpleViT: 64 patches; GoT adds a goal
    # token -> 65, so GoT falls back to local attention unless geometry
    # makes N divisible).
    seq_shard: bool = False
    # SimpleViT-zoo dims (vit_sac_network.py fixes 256/2/8; configurable here
    # so tiny CI geometries and bigger production ViTs share one code path)
    vit_dim: int = 256
    vit_depth: int = 2
    vit_heads: int = 8
    # GoT patch embedding: '2d' = channel-less GoalFormer.py:137-139 (live
    # loop); 'channels' = the Imitation_learning.py:118-121 frame-stack
    # variant, required when env.use_frame_stack is on.
    patch_mode: str = "2d"

    def validate(self):
        ih, iw = self.image_size
        ph, pw = self.patch_size
        assert ih % ph == 0 and iw % pw == 0, "image must divide into patches"
        assert self.actor_type in {
            "GaussianTransformer", "GaussianConvNet",
            "DeterministicTransformer", "Deterministic",
        }
        assert self.critic_type in {"Transformer", "CNN"}
        assert self.backbone in {"got", "simple_vit"}
        assert self.patch_mode in {"2d", "channels"}


@dataclass
class SACConfig:
    """SAC hyperparameters (reference: DRL.py:34-39, config.yaml:9-48)."""

    action_dim: int = 2
    pstate_dim: int = 2      # polar goal (distance, heading)
    gamma: float = 0.999
    tau: float = 0.0005
    lr_actor: float = 1e-3
    lr_critic: float = 1e-3
    lr_alpha: float = 1e-4
    alpha: float = 1.0
    auto_tune_alpha: bool = True
    policy_freq: int = 1     # soft-update cadence (ACTOR_FREQ)
    batch_size: int = 32
    buffer_size: int = 30000
    guidence_weight: float = 1.0   # expert BC loss weight (DRL.py:51)
    engage_weight: float = 1.0     # intervention loss weight (DRL.py:52)
    # Guidance-weight curriculum: geometric decay from guidence_weight to
    # guidence_weight_final over guidence_decay_steps learn steps (computed
    # from state.itera inside the jitted step — no retrace). None/0 = constant.
    # Round-2 result: gw dials in-domain gain vs unseen-world transfer
    # (BENCH.md); decaying anchors the policy to the expert early and lets RL
    # specialize late.
    guidence_weight_final: Optional[float] = None
    guidence_decay_steps: int = 0
    # Reference quirk switches — `replicate` mirrors DRL.py exactly.
    # DRL.py:394 omits the (1-done) mask in the TD target; set True to fix.
    done_mask_in_target: bool = False
    # DRL.py constructs PrioritizedReplayBuffer but samples uniformly and never
    # updates priorities (:365-368 commented out). True enables real PER.
    prioritized_replay: bool = False
    # Failure detection the reference lacks (SURVEY.md §5): when True, an
    # update producing non-finite losses is discarded (params/opt/alpha roll
    # back; the step counter still advances) instead of poisoning training.
    nan_guard: bool = False
    # Overlap replay sampling + H2D transfer with the device step via a
    # background BatchPrefetcher thread (replay/staging.py). Batches are up
    # to `depth` steps stale relative to the newest transition — a deliberate
    # deviation from the reference's sample-after-store ordering, so opt-in.
    prefetch_batches: bool = False
    # Perf opt-in (non-parity): the actor loss evaluates the critic on the
    # PRE-update params, reusing the trunk latent computed during the critic
    # update instead of re-running the GoT trunk (saves one of the ~7 trunk
    # passes per update). Deviates from the reference's post-update-critic
    # ordering (DRL.py:401-407), so off by default. GoT critic only.
    critic_latent_reuse: bool = False
    # Entropy-temperature ceiling (FIX behind a flag, default off =
    # reference semantics). Measured failure it addresses (BENCH.md round-3
    # session 6): reference-semantics auto-tune (DRL.py:417-424, no clamp)
    # blew alpha up to 10.3 mid-run on the 2400-episode hospital protocol
    # and the deterministic policy collapsed to 0/100 while stochastic
    # training still reached goals. alpha_max clamps exp(log_alpha) after
    # every alpha update on all three update flavors.
    alpha_max: Optional[float] = None
    # Entropy-temperature FLOOR, the symmetric opt-in (default off =
    # reference semantics). Measured failure it addresses (BENCH.md round
    # 4: per-reset domain randomization): auto-tune drove alpha down to
    # 0.003 mid-run, the policy went near-deterministic on half-learned
    # behavior, Q-targets lost their entropy regularizer and diverged to
    # inf (drr_rand8: training stalled at 50 goals / 800 eps). alpha_min
    # clamps exp(log_alpha) from below after every alpha update.
    alpha_min: Optional[float] = None
    # Update-time DrQ-v2 random-shift augmentation (ops/augment.py): every
    # sampled obs/next_obs (and expert frames on the guided paths) is
    # replicate-padded and re-cropped at a random per-sample offset of up
    # to this many pixels before the losses see it — the standard
    # regularizer for RL from pixels (Yarats et al. 2021; PAPERS.md ViT-RL
    # survey). 0 (default) = reference behavior: raw replayed frames.
    aug_shift: int = 0
    # DrQ-collapse diagnosis knobs (round 5). Both shift=4 arms collapsed
    # (drq_rand8, and drq_rand8_amin DESPITE the alpha floor holding —
    # BENCH.md round 4), so the suspect moved from the entropy temperature
    # to WHERE the shifted views enter the update:
    #   aug_actor=False — shifted frames feed only the TD target and the
    #     critic regression; the actor update (policy forward, its critic
    #     Q evaluation, and the guided BC/engage losses) sees the raw
    #     replayed frames. This is the actual DrQ-v2 formulation (Yarats
    #     et al. 2021 route encoder gradients through the critic loss
    #     only; with separate actor/critic trunks the equivalent is an
    #     actor step on clean frames).
    #   aug_warmup=N — the first N learn steps see raw frames even with
    #     aug_shift set: augmented TD targets on an untrained critic are
    #     pure target variance at the stage where alpha auto-tune is
    #     calibrating.
    # Defaults reproduce the round-4 semantics (actor augmented, no
    # warmup); both are inert at aug_shift=0.
    aug_actor: bool = True
    aug_warmup: int = 0

    def validate(self):
        assert self.action_dim > 0 and self.pstate_dim > 0
        assert self.aug_shift >= 0
        assert self.aug_warmup >= 0
        if self.aug_warmup or not self.aug_actor:
            assert self.aug_shift > 0, (
                "aug_warmup/aug_actor only shape the DrQ shift augmentation;"
                " they are silently inert without sac.aug_shift > 0")
        assert 0.0 < self.gamma <= 1.0
        assert 0.0 < self.tau <= 1.0
        # the clamp lives in the auto-tune update; with auto-tune off alpha
        # is fixed, so a ceiling below it would be silently inert
        assert self.alpha_max is None or self.alpha_max > 0.0
        if self.alpha_max is not None and not self.auto_tune_alpha:
            assert self.alpha <= self.alpha_max, (
                "alpha_max only clamps the auto-tuned temperature; with "
                "auto_tune_alpha=False set alpha <= alpha_max directly")
        assert self.alpha_min is None or self.alpha_min > 0.0
        if self.alpha_min is not None:
            if self.alpha_max is not None:
                assert self.alpha_min <= self.alpha_max
            if not self.auto_tune_alpha:
                assert self.alpha >= self.alpha_min, (
                    "alpha_min only clamps the auto-tuned temperature; with "
                    "auto_tune_alpha=False set alpha >= alpha_min directly")
        # log_alpha is initialized to log(alpha) (agents/sac.py init_state);
        # alpha <= 0 would seed the train state with -inf/NaN
        assert self.alpha > 0.0, (
            "sac.alpha must be > 0 (it seeds log_alpha); to disable entropy "
            "regularization set auto_tune_alpha=False with a small alpha")


@dataclass
class EnvConfig:
    """Environment / reward knobs (reference: env_lab.py:170-301, config.yaml:43-48)."""

    vis_sensor: str = "depth_image"   # image | fish_image | depth_image
    max_steps: int = 800
    max_episodes: int = 800
    linear_cmd_scale: float = 0.25    # L_SCALE
    angular_cmd_scale: float = 1.0    # A_SCALE
    max_action: float = 1.0
    # reward function constants (env_lab.py:275-301)
    r_target: float = 200.0
    r_collision: float = -100.0
    heuristic_scale: float = 20.0
    goal_radius: float = 0.5
    collision_range: float = 0.2
    dist_norm: float = 15.0           # distance clip/normalizer (env_lab.py:296)
    reward_clip: Tuple[float, float] = (-200.0, 500.0)
    frame_stack: int = 4
    # The reference records 4-channel demos but disables stacking in the
    # live loop (main.py:66-69,323 commented out). True enables the online
    # frame-stacked path (model.patch_mode must be 'channels').
    use_frame_stack: bool = False

    def validate(self):
        assert self.vis_sensor in {"image", "fish_image", "depth_image"}


@dataclass
class MeshConfig:
    """Device-mesh axes. data = batch sharding; model = TP over MLP/QKV;
    seq reserved for long-token-stream sharding (SURVEY.md §2.3)."""

    data: int = -1   # -1 → all remaining devices
    model: int = 1
    seq: int = 1


@dataclass
class TrainConfig:
    seed: int = 3407
    desc: str = "98"
    plot_interval: int = 10
    eval_threshold: int = 80
    eval_epoch: int = 5
    save_interval: int = 50
    save_threshold: float = 1.0
    reward_threshold: float = 90.0
    save: bool = True
    # persist replay transitions next to each periodic checkpoint so an
    # elastic restart resumes with a warm buffer instead of an empty one
    # (cpprb save/load_transitions, DRL.py:505-510, made automatic). Off by
    # default: a full-size reference buffer (30k x 128x160 f32 obs x2) is
    # ~10 GB raw per snapshot — enable for small buffers / fast disks.
    save_replay: bool = False
    pre_train: bool = True
    if_test: bool = False
    pre_buffer: bool = True
    human_intervention: bool = False
    policy_attention_fix: bool = False
    critic_attention_fix: bool = False
    checkpoint_dir: str = "checkpoints"
    data_dir: str = "data"
    robot: str = "scout"          # ROBOT (config.yaml:47)
    # Checkpoint paths for the warm-start behaviors the reference hardcodes
    # (main.py:272-278). Base path WITHOUT the _actor/_critic.npz suffix;
    # empty = skip (the reference gates on PRE_TRAIN/IF_TEST alone because
    # its paths are absolute constants).
    pre_train_model: str = ""     # IL actor loaded when pre_train (main.py:272-274)
    test_model: str = ""          # actor+critic loaded when if_test (main.py:275-278)


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    sac: SACConfig = field(default_factory=SACConfig)
    env: EnvConfig = field(default_factory=EnvConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def validate(self) -> "Config":
        self.model.validate()
        self.sac.validate()
        self.env.validate()
        return self

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "Config":
        return _update_dataclass(cls(), data).validate()

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return cls.from_dict(data)

    def to_dict(self) -> Dict[str, Any]:
        def listify(x):
            if isinstance(x, dict):
                return {k: listify(v) for k, v in x.items()}
            if isinstance(x, tuple):
                return list(x)  # YAML-serializable (safe_dump rejects tuples)
            return x

        return listify(dataclasses.asdict(self))


def load_reference_yaml(path: str) -> Config:
    """Load a reference-format config.yaml (flat keys, config.yaml:1-63) and
    translate it into a structured Config."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)

    cfg = Config()
    algo = raw.get("GoT-SAC", {})
    m = cfg.model
    m.name = algo.get("name", m.name)
    m.actor_type = algo.get("actor_type", m.actor_type)
    m.critic_type = algo.get("critic_type", m.critic_type)
    m.block = algo.get("block", m.block)
    m.head = algo.get("head", m.head)
    m.latent_size = raw.get("LATENT_FEATURES_SIZE", m.latent_size)

    s = cfg.sac
    s.batch_size = raw.get("BATCH_SIZE", s.batch_size)
    s.lr_actor = raw.get("LR_A", s.lr_actor)
    s.lr_critic = raw.get("LR_C", s.lr_critic)
    s.lr_alpha = raw.get("LR_ALPHA", s.lr_alpha)
    s.gamma = raw.get("GAMMA", s.gamma)
    s.tau = raw.get("TAU", s.tau)
    s.policy_freq = raw.get("ACTOR_FREQ", s.policy_freq)
    s.buffer_size = raw.get("BUFFER_SIZE", s.buffer_size)
    s.alpha = raw.get("ALPHA", s.alpha)
    s.auto_tune_alpha = raw.get("AUTO_TUNE", s.auto_tune_alpha)

    e = cfg.env
    e.vis_sensor = raw.get("VIS_SENSOR", e.vis_sensor)
    e.max_steps = raw.get("MAX_STEPS", e.max_steps)
    e.max_episodes = raw.get("MAX_EPISODES", e.max_episodes)
    e.linear_cmd_scale = raw.get("L_SCALE", e.linear_cmd_scale)
    e.angular_cmd_scale = raw.get("A_SCALE", e.angular_cmd_scale)
    e.frame_stack = raw.get("FRAME_STACK", e.frame_stack)

    t = cfg.train
    t.seed = raw.get("SEED", t.seed)
    t.desc = str(raw.get("DESC", t.desc))
    t.plot_interval = raw.get("PLOT_INTERVAL", t.plot_interval)
    t.eval_threshold = raw.get("EVAL_THRESHOLD", t.eval_threshold)
    t.eval_epoch = raw.get("EVAL_EPOCH", t.eval_epoch)
    t.save_interval = raw.get("SAVE_INTERVAL", t.save_interval)
    t.save_threshold = raw.get("SAVE_THRESHOLD", t.save_threshold)
    t.reward_threshold = raw.get("REWARD_THRESHOLD", t.reward_threshold)
    t.save = raw.get("SAVE", t.save)
    t.pre_train = raw.get("PRE_TRAIN", t.pre_train)
    t.if_test = raw.get("IF_TEST", t.if_test)
    t.pre_buffer = raw.get("PRE_BUFFER", t.pre_buffer)
    t.human_intervention = raw.get("HUMAN_INTERVENTION", t.human_intervention)
    t.policy_attention_fix = raw.get("P_ATTENTION_FIX", t.policy_attention_fix)
    t.critic_attention_fix = raw.get("C_ATTENTION_FIX", t.critic_attention_fix)
    t.robot = raw.get("ROBOT", t.robot)
    return cfg.validate()
