from ad_mpc_tpu.control.reference import PathReference, WaypointRefs
from ad_mpc_tpu.control.mpc import BicycleMPC, QuadMPC

__all__ = ["PathReference", "WaypointRefs", "BicycleMPC", "QuadMPC"]
