from ad_mpc_tpu.ocp.spec import OCPSpec
from ad_mpc_tpu.ocp.solver import SQPSolver, SolverState

__all__ = ["OCPSpec", "SQPSolver", "SolverState"]
