from dgvit_tpu.replay.buffer import PrioritizedReplayBuffer, ReplayBuffer
from dgvit_tpu.replay.staging import BatchPrefetcher
