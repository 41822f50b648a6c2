"""Velocity-blended kinematic/dynamic bicycle model (7-state, 2-input).

Capability parity with the reference AD vehicle model
(``ros_gp_mpc/src/ad_mpc/ad_3d.py:20-107`` for the parameters,
``ros_gp_mpc/src/ad_mpc/ad_3d_optimizer.py:268-310`` for the dynamics), built
as a pure JAX function so a single definition serves simulation, MPC
linearization (``jax.jacfwd``), and batched scenario sweeps (``vmap``).

State  x = [p_x, p_y, psi, v_x, v_y, psi_dot, delta]
Input  u = [a, delta_dot]   (longitudinal acceleration, steering rate)
Param  switch in [0, 1]     (0 = kinematic model, 1 = dynamic linear-tire)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class BicycleParams(NamedTuple):
    """Physical + constraint parameters of the bicycle plant.

    Defaults reproduce the reference vehicle (``ad_3d.py:46-71``): 1500 kg
    sedan, 2.7 m wheelbase, cornering stiffness from static axle loads at
    0.165 N/deg per kg of load.
    """

    mass: float = 1500.0
    l_f: float = 2.7 * (1.0 - 900.0 / 1500.0)  # CoG -> front axle [m]
    l_r: float = 2.7 * (1.0 - 600.0 / 1500.0)  # CoG -> rear axle [m]
    iz: float = (2.7 * 0.4) * (2.7 * 0.6) * 1500.0  # yaw inertia [kg m^2]
    cf: float = 900.0 * 0.5 * 9.81 * 0.165 * 180.0 / 3.14195  # [N/rad]
    cr: float = 600.0 * 0.5 * 9.81 * 0.165 * 180.0 / 3.14195  # [N/rad]
    # Kinematic->dynamic blending speeds [m/s] (ad_3d.py:62-64).
    blend_min: float = 100.0
    blend_max: float = 110.0
    # Input / state bounds (ad_3d.py:65-71).
    steering_min: float = -0.52
    steering_max: float = 0.52
    steering_rate_min: float = -3.0
    steering_rate_max: float = 3.0
    acc_min: float = -10.0
    acc_max: float = 5.0


NX = 7
NU = 2


def blend_switch(v_x, params: BicycleParams):
    """Velocity-based blend factor in [0,1]: 0 below blend_min (kinematic),
    1 above blend_max (dynamic). Reference ``ad_3d_optimizer.py:443``."""
    return jnp.clip(
        (v_x - params.blend_min) / (params.blend_max - params.blend_min), 0.0, 1.0
    )


def lateral_tire_forces(x, params: BicycleParams):
    """Linear-tire lateral forces (front, rear) per the reference's
    small-angle slip model (``ad_3d_optimizer.py:290-304``). The 1e-99
    singularity guard of the reference is replaced by an epsilon that is
    representable in f32."""
    v_x, v_y, psi_dot, delta = x[3], x[4], x[5], x[6]
    v_x_safe = v_x + 1e-6
    f_fy = 2.0 * params.cf * (delta - (v_y + params.l_f * psi_dot) / v_x_safe)
    f_ry = 2.0 * params.cr * (params.l_r * psi_dot - v_y) / v_x_safe
    return f_fy, f_ry


def bicycle_dynamics(x, u, params: BicycleParams = BicycleParams(), switch=None):
    """Continuous-time dynamics x_dot = f(x, u).

    ``switch`` overrides the per-solve blend parameter (the reference passes
    it as the ACADOS stage parameter ``p``); by default it is computed from
    the state's own v_x.
    """
    p_x, p_y, psi, v_x, v_y, psi_dot, delta = (
        x[0], x[1], x[2], x[3], x[4], x[5], x[6],
    )
    a, delta_dot = u[0], u[1]
    s = blend_switch(v_x, params) if switch is None else switch

    f_fy, f_ry = lateral_tire_forces(x, params)

    # Global-frame kinematics (ad_3d_optimizer.py:280-287).
    p_x_dot = v_x * jnp.cos(psi) - v_y * jnp.sin(psi)
    p_y_dot = v_x * jnp.sin(psi) + v_y * jnp.cos(psi)
    psi_dot_out = psi_dot

    # Dynamic (linear tire) vs kinematic branches, switch-blended per state
    # (ad_3d_optimizer.py:289-307).
    v_x_dyn = a - (f_fy * jnp.sin(delta)) / params.mass + v_y * psi_dot
    v_x_kin = a

    wheelbase = params.l_f + params.l_r
    v_y_dyn = (f_ry + f_fy * jnp.cos(delta)) / params.mass - v_x * psi_dot
    v_y_kin = (delta_dot * v_x + delta * a) * params.l_r / wheelbase

    psi_dd_dyn = (params.l_f * f_fy * jnp.cos(delta) - params.l_r * f_ry) / params.iz
    psi_dd_kin = (delta_dot * v_x + delta * a) / wheelbase

    return jnp.stack(
        [
            p_x_dot,
            p_y_dot,
            psi_dot_out,
            s * v_x_dyn + (1 - s) * v_x_kin,
            s * v_y_dyn + (1 - s) * v_y_kin,
            s * psi_dd_dyn + (1 - s) * psi_dd_kin,
            delta_dot,
        ]
    )


def input_bounds(params: BicycleParams = BicycleParams()):
    """(lbu, ubu) arrays matching reference ``ad_3d_optimizer.py:184-186``."""
    return (
        np.array([params.acc_min, params.steering_rate_min]),
        np.array([params.acc_max, params.steering_rate_max]),
    )


def state_bounds(params: BicycleParams = BicycleParams()):
    """(lbx, ubx) with +-inf on unbounded states; steering angle (state 6)
    is box-bounded (reference ``ad_3d_optimizer.py:188-190``)."""
    lbx = np.full(NX, -np.inf)
    ubx = np.full(NX, np.inf)
    lbx[6] = params.steering_min
    ubx[6] = params.steering_max
    return lbx, ubx
