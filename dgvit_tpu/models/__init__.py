from dgvit_tpu.models.got import GoT
from dgvit_tpu.models.simple_vit import SimpleViT
from dgvit_tpu.models.policies import (
    GoTPolicy,
    GoTQNetwork,
    GaussianPolicy,
    QNetwork,
    DeterministicPolicy,
    DeterministicGoTPolicy,
    ViTGaussianPolicy,
    ViTQNetwork,
    ViTDeterministicPolicy,
    ValueNetwork,
    build_actor,
    build_critic,
)
from dgvit_tpu.models import distributions
