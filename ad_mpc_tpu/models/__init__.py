from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
from ad_mpc_tpu.models.quadrotor import QuadrotorParams, quad_dynamics
from ad_mpc_tpu.models.pacejka import PacejkaParams, pacejka_bicycle_dynamics

__all__ = [
    "BicycleParams",
    "bicycle_dynamics",
    "QuadrotorParams",
    "quad_dynamics",
    "PacejkaParams",
    "pacejka_bicycle_dynamics",
]
