from dgvit_tpu.agents.sac import SACAgent, SACTrainState
from dgvit_tpu.agents.teacher import SACTeacher
