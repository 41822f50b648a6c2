from ad_mpc_tpu.sim.simulator import (
    BicycleSim,
    DisturbanceConfig,
    QuadrotorSim,
)

__all__ = ["BicycleSim", "QuadrotorSim", "DisturbanceConfig"]
