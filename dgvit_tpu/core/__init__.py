from dgvit_tpu.core.mesh import MeshRuntime, make_mesh
from dgvit_tpu.core.rng import RngStream
