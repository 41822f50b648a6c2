from ad_mpc_tpu.parallel.mesh import make_mesh
from ad_mpc_tpu.parallel.batch import BatchedSolver

__all__ = ["make_mesh", "BatchedSolver"]
