"""Explicit integrators + horizon rollouts as pure JAX transforms.

TPU-native replacement for the reference's ACADOS ERK integrator and its
CasADi-generated ODE/VDE sensitivity kernels
(``c_generated_code/sim_car_model/sim_car_expl_ode_fun.c``,
``sim_car_expl_vde_forw.c``): forward integration is an inlined RK4 step,
sensitivities come from ``jax.jacfwd`` of the *discretized* map (exactly the
VDE solution ACADOS computes), and full-horizon rollouts are ``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rk4_step(f, x, u, dt):
    """One classic RK4 step of ``x_dot = f(x, u)``."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def discretize(f, dt, n_steps: int = 1):
    """Return the discrete map F(x, u) integrating f over dt with RK4.

    ``n_steps`` sub-steps mirror ACADOS's ``sim_method_num_steps`` (default 1
    RK4 stage per shooting interval for the reference solvers).
    """
    h = dt / n_steps

    def F(x, u):
        for _ in range(n_steps):
            x = rk4_step(f, x, u, h)
        return x

    return F


def rollout(F, x0, us):
    """Roll the discrete map over a control sequence: (nx,), (N, nu) ->
    states (N+1, nx)."""

    def step(x, u):
        x_next = F(x, u)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


def rollout_p(F, x0, us, ps):
    """Roll a parameterized discrete map F(x, u, p) with per-stage params:
    (nx,), (N, nu), (N, np) -> (N+1, nx). The stage-parameter mechanism is
    the ACADOS per-stage ``p`` (e.g. the blend switch per node, or the quad
    GP 'trigger' that is 1 only at node 0 — ``quad_3d_optimizer.py:289-327``)."""

    def step(x, inp):
        u, p = inp
        x_next = F(x, u, p)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, (us, ps))
    return jnp.concatenate([x0[None], xs], axis=0)


def linearize_p(F, xs, us, ps):
    """Stage-wise linearization of a parameterized discrete map with
    per-stage params (the per-stage VDE sweep)."""
    xk = xs[:-1]
    A = jax.vmap(jax.jacfwd(F, argnums=0))(xk, us, ps)
    B = jax.vmap(jax.jacfwd(F, argnums=1))(xk, us, ps)
    c = jax.vmap(F)(xk, us, ps) - xs[1:]
    return A, B, c


def linearize(F, xs, us):
    """Stage-wise linearization of the discrete dynamics along a trajectory.

    Returns (A, B, c) with shapes (N, nx, nx), (N, nx, nu), (N, nx) where
        x_{k+1} ≈ A_k dx_k + B_k du_k + c_k,  c_k = F(x_k, u_k) - x̄_{k+1}
    (c is the multiple-shooting defect, zero on a dynamics-feasible iterate).
    Jacobians of all N stages are computed in one vmapped jacfwd — the
    batched equivalent of ACADOS's per-stage VDE sweep.
    """
    xk = xs[:-1]

    def fx(x, u):
        return F(x, u)

    A = jax.vmap(jax.jacfwd(fx, argnums=0))(xk, us)
    B = jax.vmap(jax.jacfwd(fx, argnums=1))(xk, us)
    c = jax.vmap(fx)(xk, us) - xs[1:]
    return A, B, c
