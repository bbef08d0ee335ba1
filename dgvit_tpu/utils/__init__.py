from dgvit_tpu.utils.metrics import MetricsLogger, RewardCurve
