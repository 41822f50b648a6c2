"""Uncertainty-aware forward propagation and plant-rollout utilities.

Capability parity with the reference's OCP/propagation helpers
(``ros_gp_mpc/src/utils/quad_3d_opt_utils.py``):

- :func:`forward_prop` — EKF-style mean + covariance rollout along a control
  sequence (``uncertainty_forward_propagation``, ``quad_3d_opt_utils.py:61-162``),
  including the GP-predictive-variance branch the reference left as
  ``NotImplementedError``;
- :func:`simulate_plant` — fine-grained plant rollout under a control
  sequence (``quad_3d_opt_utils.py:204-264``);
- :func:`reshape_input_sequence` (``quad_3d_mpc.py:197-212``).

TPU-first design: the mean/covariance recursion is one ``lax.scan`` whose
per-stage Jacobians come from ``jax.jacfwd`` of the RK4-discretized dynamics
— the same linearization the SQP solver uses — so the whole rollout is a
single fused XLA program and batching over scenario fleets is ``vmap``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ad_mpc_tpu.ops.integrators import discretize


def forward_prop(
    dynamics: Callable,
    x0,
    us,
    dt: float,
    P0=None,
    process_noise=None,
    rk4_steps: int = 1,
    residual_var_fn: Optional[Callable] = None,
    residual_select=None,
):
    """Propagate mean and covariance through the discretized dynamics.

    :param dynamics: continuous-time ``f(x, u) -> x_dot``.
    :param x0: (nx,) initial mean.
    :param us: (N, nu) control sequence.
    :param dt: control period per stage.
    :param P0: (nx, nx) initial covariance (default zero).
    :param process_noise: (nx, nx) per-stage additive covariance W.
    :param residual_var_fn: optional ``(x, u) -> (m,)`` predictive variance
        of a learned residual (per second^2); mapped into the state via
        ``residual_select`` (nx, m) and scaled by dt^2 — the GP-covariance
        branch of ``quad_3d_opt_utils.py:120-135``.
    :return: (xs (N+1, nx), Ps (N+1, nx, nx)).
    """
    x0 = jnp.asarray(x0)
    us = jnp.asarray(us)
    nx = x0.shape[0]
    P0 = jnp.zeros((nx, nx), x0.dtype) if P0 is None else jnp.asarray(P0)
    W = (
        jnp.zeros((nx, nx), x0.dtype)
        if process_noise is None
        else jnp.asarray(process_noise)
    )
    F = discretize(dynamics, dt, rk4_steps)

    if residual_select is not None:
        Bx = jnp.asarray(residual_select, x0.dtype)

    def step(carry, u):
        x, P = carry
        A = jax.jacfwd(F, argnums=0)(x, u)
        x_next = F(x, u)
        P_next = A @ P @ A.T + W
        if residual_var_fn is not None:
            var = jnp.asarray(residual_var_fn(x, u))
            P_next = P_next + (dt * dt) * (Bx * var[None, :]) @ Bx.T
        return (x_next, P_next), (x_next, P_next)

    (_, _), (xs, Ps) = jax.lax.scan(step, (x0, P0), us)
    xs = jnp.concatenate([x0[None], xs], axis=0)
    Ps = jnp.concatenate([P0[None], Ps], axis=0)
    return xs, Ps


def simulate_plant(sim, x0, us, key, control_period: float):
    """Roll the disturbance-suite plant one control period per input row
    (``quad_3d_opt_utils.py:204-264`` capability): returns (N+1, nx) states
    including x0."""
    x0 = jnp.asarray(x0)
    us = jnp.asarray(us)

    def body(carry, u):
        x, k = carry
        x, k = sim._step(x, u, k, control_period)
        return (x, k), x

    _, xs = jax.lax.scan(body, (x0, key), us)
    return jnp.concatenate([x0[None], xs], axis=0)


def reshape_input_sequence(u_flat, nu: int):
    """Flattened (N*nu,) -> (N, nu) (``quad_3d_mpc.py:197-212``)."""
    u_flat = jnp.asarray(u_flat)
    return u_flat.reshape(-1, nu)
