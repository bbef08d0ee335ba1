"""dgvit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
the DGViT reference (REGRAGUIahmed/DGViT-Depth-Goal-Guided-Vision-Transformer-).

Layout (mirrors SURVEY.md §7 build plan):
  core/     — mesh/runtime, RNG discipline, checkpointing
  models/   — GoT / SimpleViT / CNN trunks, actor+critic zoo, tanh-Gaussian distribution
  ops/      — Pallas preprocessing + attention kernels (XLA fallback off-TPU)
  agents/   — SAC and BC as pure-functional jitted train steps over a TrainState
  replay/   — C++ prioritized ring buffer (ctypes) + host staging
  envs/     — Env protocol, recorded-replay env, kinematic fake, fault injection
  parallel/ — named-axis sharding (data/model/seq) over jax.sharding.Mesh
  train/    — RL / BC / eval drivers
  utils/    — math helpers, metrics logging, attention capture
"""

__version__ = "0.1.0"
