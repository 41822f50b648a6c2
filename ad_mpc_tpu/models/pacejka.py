"""Pacejka magic-formula bicycle model with road topography (pitch/roll).

An extension beyond the reference's linear-tire model, covering the
BASELINE "Pacejka tire model + road-topography LTV-MPC" configuration: the
lateral tire forces follow the magic formula ``F_y = mu F_z D sin(C arctan(B
alpha))`` and road pitch/roll enter as gravity components in the body frame.
Same 7-state layout as :mod:`ad_mpc_tpu.models.bicycle` so it is a drop-in
dynamics function for the same OCP.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ad_mpc_tpu.utils.math import atan_mosaic


class PacejkaParams(NamedTuple):
    mass: float = 1500.0
    l_f: float = 1.08
    l_r: float = 1.62
    iz: float = 2625.0
    # Magic-formula coefficients (typical dry-asphalt passenger-car values).
    b_f: float = 10.0
    c_f: float = 1.9
    d_f: float = 1.0
    b_r: float = 12.0
    c_r: float = 1.9
    d_r: float = 1.0
    mu: float = 1.0  # road friction scaling
    g: float = 9.81
    road_pitch: float = 0.0  # [rad], positive = uphill
    road_roll: float = 0.0  # [rad], positive = right side down


def slip_angles(x, params: PacejkaParams):
    # v_x is floored at 0.5 m/s, so atan2(., v_x_safe) == atan of the ratio;
    # atan_mosaic keeps the whole model lowerable inside the fused Pallas
    # VDE kernel (jnp.arctan/arctan2 have no Mosaic TPU lowering).
    v_x, v_y, psi_dot, delta = x[3], x[4], x[5], x[6]
    v_x_safe = jnp.maximum(v_x, 0.5)
    alpha_f = delta - atan_mosaic((v_y + params.l_f * psi_dot) / v_x_safe)
    alpha_r = -atan_mosaic((v_y - params.l_r * psi_dot) / v_x_safe)
    return alpha_f, alpha_r


def magic_formula(alpha, b, c, d, fz, mu):
    return mu * fz * d * jnp.sin(c * atan_mosaic(b * alpha))


def pacejka_bicycle_dynamics(x, u, params: PacejkaParams = PacejkaParams()):
    """Continuous-time dynamics x_dot = f(x, u); state/input layout matches
    :func:`ad_mpc_tpu.models.bicycle.bicycle_dynamics`."""
    psi, v_x, v_y, psi_dot, delta = x[2], x[3], x[4], x[5], x[6]
    a_cmd, delta_dot = u[0], u[1]

    wheelbase = params.l_f + params.l_r
    # Static axle normal loads, reduced by road pitch.
    g_eff = params.g * jnp.cos(params.road_pitch) * jnp.cos(params.road_roll)
    fz_f = params.mass * g_eff * params.l_r / wheelbase
    fz_r = params.mass * g_eff * params.l_f / wheelbase

    alpha_f, alpha_r = slip_angles(x, params)
    f_fy = magic_formula(alpha_f, params.b_f, params.c_f, params.d_f, fz_f, params.mu)
    f_ry = magic_formula(alpha_r, params.b_r, params.c_r, params.d_r, fz_r, params.mu)

    # Gravity feed-through from road topography (body frame).
    a_grav_x = -params.g * jnp.sin(params.road_pitch)
    a_grav_y = params.g * jnp.sin(params.road_roll)

    p_x_dot = v_x * jnp.cos(psi) - v_y * jnp.sin(psi)
    p_y_dot = v_x * jnp.sin(psi) + v_y * jnp.cos(psi)
    v_x_dot = a_cmd + a_grav_x - f_fy * jnp.sin(delta) / params.mass + v_y * psi_dot
    v_y_dot = (f_ry + f_fy * jnp.cos(delta)) / params.mass + a_grav_y - v_x * psi_dot
    psi_ddot = (params.l_f * f_fy * jnp.cos(delta) - params.l_r * f_ry) / params.iz

    return jnp.stack(
        [p_x_dot, p_y_dot, psi_dot, v_x_dot, v_y_dot, psi_ddot, delta_dot]
    )


def pacejka_dynamics_p(x, u, p, params: PacejkaParams = PacejkaParams()):
    """Pacejka dynamics with runtime per-solve parameters — the
    friction/STIFFNESS/topography sweep axis of the BASELINE "Pacejka +
    road topography" configuration. Batched scenarios vmap over ``p``
    without recompilation (the reference would need one ACADOS codegen per
    parameterization).

    ``p = [mu, road_pitch, road_roll]`` (3 entries) or
    ``p = [mu, pitch, roll, b_scale, d_scale]`` (5 entries) with the magic-
    formula stiffness factor B and peak factor D scaled per scenario
    (front and rear together) — tire-wear / surface variation draws."""
    params = params._replace(mu=p[0], road_pitch=p[1], road_roll=p[2])
    if p.shape[0] >= 5:
        params = params._replace(
            b_f=params.b_f * p[3], b_r=params.b_r * p[3],
            d_f=params.d_f * p[4], d_r=params.d_r * p[4],
        )
    return pacejka_bicycle_dynamics(x, u, params)
