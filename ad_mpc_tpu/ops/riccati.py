"""Riccati-recursion solver for the equality-constrained LQ subproblem.

TPU-native replacement for HPIPM's Riccati/condensing factorization
(linked via ``libacados_ocp_solver_*.so`` in the reference; solver options in
``ros_gp_mpc/acados_models/sim_car_acados_ocp.json``). The backward sweep is
a ``lax.scan`` over stages; under ``vmap`` every per-stage matrix op becomes
a batched matmul that XLA tiles onto the MXU.

Solves:
    min  Σ_{k=0}^{N-1} (0.5 dx'Q_k dx + q_k'dx + 0.5 du'R_k du + r_k'du)
         + 0.5 dx_N'Q_N dx_N + q_N'dx_N
    s.t. dx_{k+1} = A_k dx_k + B_k du_k + c_k,   dx_0 = dx0 (fixed)

Shapes: A (N,nx,nx), B (N,nx,nu), c (N,nx), Q (N+1,nx,nx), q (N+1,nx),
R (N,nu,nu), r (N,nu).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LQRGains(NamedTuple):
    K: jax.Array  # (N, nu, nx) feedback
    k: jax.Array  # (N, nu) feedforward


def backward_pass(A, B, c, Q, q, R, r, reg: float = 0.0):
    """Backward Riccati sweep. Returns gains and the value-function expansion
    (P, p) at every stage.

    ``reg`` adds Levenberg-style diagonal regularization to the input Hessian
    before factorization (keeps Cholesky well-posed in f32).
    """
    nu = B.shape[-1]
    eye_u = jnp.eye(nu, dtype=B.dtype)

    def step(carry, inp):
        P_next, p_next = carry
        A_k, B_k, c_k, Q_k, q_k, R_k, r_k = inp

        PA = P_next @ A_k
        PB = P_next @ B_k
        pc = p_next + P_next @ c_k

        H_uu = R_k + B_k.T @ PB + reg * eye_u
        H_ux = B_k.T @ PA
        h_u = r_k + B_k.T @ pc

        chol = jax.scipy.linalg.cho_factor(H_uu)
        K = -jax.scipy.linalg.cho_solve(chol, H_ux)
        kff = -jax.scipy.linalg.cho_solve(chol, h_u)

        # Symmetrized value-function update.
        P = Q_k + A_k.T @ PA + H_ux.T @ K
        P = 0.5 * (P + P.T)
        p = q_k + A_k.T @ pc + H_ux.T @ kff

        return (P, p), (K, kff, P, p)

    init = (Q[-1], q[-1])
    (_, _), (K, kff, P, p) = jax.lax.scan(
        step, init, (A, B, c, Q[:-1], q[:-1], R, r), reverse=True
    )
    return LQRGains(K, kff), (P, p)


def forward_pass(A, B, c, gains: LQRGains, dx0):
    """Forward rollout of the affine policy du = K dx + k through the
    linearized dynamics."""

    def step(dx, inp):
        A_k, B_k, c_k, K_k, k_k = inp
        du = K_k @ dx + k_k
        dx_next = A_k @ dx + B_k @ du + c_k
        return dx_next, (dx, du)

    dx_last, (dxs, dus) = jax.lax.scan(step, dx0, (A, B, c, gains.K, gains.k))
    dxs = jnp.concatenate([dxs, dx_last[None]], axis=0)
    return dxs, dus


def lqr_solve(A, B, c, Q, q, R, r, dx0, reg: float = 0.0):
    """Solve the LQ problem; returns (dx (N+1,nx), du (N,nu))."""
    gains, _ = backward_pass(A, B, c, Q, q, R, r, reg=reg)
    return forward_pass(A, B, c, gains, dx0)
