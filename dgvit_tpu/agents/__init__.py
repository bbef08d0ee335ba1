from dgvit_tpu.agents.sac import SACAgent, SACTrainState
