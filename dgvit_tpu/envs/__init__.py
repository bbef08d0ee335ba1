from dgvit_tpu.envs.base import Env, StepResult, ResetResult
from dgvit_tpu.envs.replay_env import ReplayEnv
from dgvit_tpu.envs.kinematic import KinematicNavEnv
