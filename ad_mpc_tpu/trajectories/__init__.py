from ad_mpc_tpu.trajectories.quad_refs import (
    check_trajectory,
    lemniscate_trajectory,
    loop_trajectory,
    minimum_snap_trajectory,
)

__all__ = [
    "check_trajectory",
    "lemniscate_trajectory",
    "loop_trajectory",
    "minimum_snap_trajectory",
]
