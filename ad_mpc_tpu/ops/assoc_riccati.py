"""Associative-scan (parallel-prefix) Riccati recursion.

SURVEY.md §2.6/§5 names this as the TPU-native long-horizon option: HPIPM
processes the horizon sequentially (O(N) dependent steps); on TPU the same
LQ solve can run in O(log N) parallel depth by expressing the backward
value-function recursion as an ASSOCIATIVE combination of conditional
value-function elements and using ``jax.lax.associative_scan`` — the
temporal-parallelization construction of Särkkä & García-Fernández (2021,
"Temporal Parallelization of Bayesian Smoothers and Optimal Controllers").

Element parameterization. For the LQ problem of :mod:`ad_mpc_tpu.ops.riccati`
(cost 0.5 dx'Q dx + q'dx + 0.5 du'R du + r'du, dynamics
dx+ = A dx + B du + c), the conditional value function between two stages is

    V(x, z) = "0.5 (z - A_e x - b_e)' C_e^{-1} (z - A_e x - b_e)"
              + 0.5 x' J x - eta' x

(the quoted term read in the max-plus sense when C_e is singular). The
linear control cost r is absorbed by completing the square:
u~ = u + R^{-1} r shifts the drift to b_e = c - B R^{-1} r. Per-stage
elements initialize as

    A_e = A,  b_e = c - B R^{-1} r,  C_e = B R^{-1} B',  J = Q,  eta = -q,

the terminal element is (0, 0, 0, -q_N, Q_N), and two elements combine by

    A = A2 (I + C1 J2)^{-1} A1
    b = A2 (I + C1 J2)^{-1} (b1 + C1 eta2') + b2     (eta2' = -eta2 sign conv.)
    C = A2 (I + C1 J2)^{-1} C1 A2' + C2
    eta = A1' (I + J2 C1)^{-1} (eta2 - J2 b1) + eta1
    J = A1' (I + J2 C1)^{-1} J2 A1 + J1

A reverse cumulative combine yields V_k(x) = 0.5 x'P_k x + p_k'x with
P_k = J_k, p_k = -eta_k for every stage simultaneously; the feedback gains
then come from the standard one-step formulas (vmapped — embarrassingly
parallel), and the forward rollout closes with a second associative scan
over affine-map compositions. Equality with the sequential
:func:`ad_mpc_tpu.ops.riccati.lqr_solve` is asserted by
``tests/test_assoc_riccati.py`` (exact to f64 roundoff up to N=256).

Measured on TPU v5e (r5, f32 at solver-grade matmul precision, batch 1,
nx=7, nu=2 — ``experiments/long_horizon.py``, device-resident
fetch-synced timing, committed to BENCH_DETAIL.json
``long_horizon_riccati``): the associative backend wins at EVERY measured
horizon — N=30 0.44 ms vs 1.33 ms sequential (3.0x), N=128 1.28 vs
1.40 ms, N=512 4.2 vs 5.4 ms — because at batch 1 the sequential
recursion is dependency-bound and the combine tree exposes parallel work
to the otherwise-idle VPU. (An earlier CPU-only measurement suggested the
opposite at small N; the bench row is the committed evidence.) Equality
vs the sequential backend: <1e-6 relative on device. Enabled per spec via
``OCPSpec.assoc_riccati``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(e1, e2):
    """Associative combination of conditional value elements (e1 earlier
    in time, e2 later). Batched over the leading axis by associative_scan."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    nx = A1.shape[-1]
    I = jnp.eye(nx, dtype=A1.dtype)

    # (I + C1 J2)^{-1} applied from the left; transpose identity for the
    # dual factor (I + J2 C1)^{-1} = (I + C1' J2')^{-T} with symmetric C, J.
    M = I + C1 @ J2
    # Solve M X = Y for the three right-hand sides.
    A1_t = jnp.linalg.solve(M, A1)
    bC_t = jnp.linalg.solve(M, (b1 + C1 @ eta2[..., None])[..., 0])
    C1_t = jnp.linalg.solve(M, C1)

    A = A2 @ A1_t
    b = A2 @ bC_t[..., None] + b2
    C = A2 @ C1_t @ jnp.swapaxes(A2, -1, -2) + C2

    Mt = I + J2 @ C1
    eta_t = jnp.linalg.solve(Mt, (eta2 - (J2 @ b1)[..., 0]))
    J_t = jnp.linalg.solve(Mt, J2 @ A1)
    A1T = jnp.swapaxes(A1, -1, -2)
    eta = (A1T @ eta_t[..., None])[..., 0] + eta1
    J = A1T @ J_t + J1
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return (A, b, C, eta, J)


def _combine_batched(e1, e2):
    return jax.vmap(_combine)(e1, e2)


def backward_pass_assoc(A, B, c, Q, q, R, r, reg: float = 0.0):
    """Value-function expansion (P_k, p_k) for k = 0..N via one
    O(log N)-depth associative scan. Shapes as in
    :func:`ad_mpc_tpu.ops.riccati.backward_pass`."""
    N, nx, nu = B.shape[0], B.shape[1], B.shape[2]
    dtype = A.dtype
    eye_u = jnp.eye(nu, dtype=dtype)

    Rreg = R + reg * eye_u
    Rinv_rT = jnp.linalg.solve(Rreg, r[..., None])  # (N, nu, 1)
    Rinv_BT = jnp.linalg.solve(Rreg, jnp.swapaxes(B, -1, -2))  # (N, nu, nx)

    A_e = A
    b_e = (c[..., None] - B @ Rinv_rT)  # (N, nx, 1)
    C_e = B @ Rinv_BT  # (N, nx, nx)
    eta_e = -q[:-1]
    J_e = Q[:-1]

    # Terminal element appended at the end.
    zeros_m = jnp.zeros((1, nx, nx), dtype)
    elems = (
        jnp.concatenate([A_e, zeros_m], axis=0),
        jnp.concatenate([b_e, jnp.zeros((1, nx, 1), dtype)], axis=0),
        jnp.concatenate([C_e, zeros_m], axis=0),
        jnp.concatenate([eta_e, -q[-1:]], axis=0),
        jnp.concatenate([J_e, Q[-1:]], axis=0),
    )

    # Reverse cumulative combine: element k holds V_k = (eta_k, J_k).
    # NOTE argument order: with reverse=True, associative_scan flips the
    # sequence, runs a forward scan, and flips back — so the combine
    # receives (later-time, earlier-time); swap into _combine's
    # (earlier, later) convention.
    scanned = jax.lax.associative_scan(
        lambda a, b: _combine_batched(b, a), elems, reverse=True
    )
    _, _, _, eta_all, J_all = scanned
    P = J_all  # (N+1, nx, nx)
    p = -eta_all  # (N+1, nx)
    return P, p


def gains_from_value(A, B, c, Q, q, R, r, P, p, reg: float = 0.0):
    """Per-stage feedback/feedforward from the value expansion at k+1 —
    embarrassingly parallel (vmapped), no sequential dependency."""
    nu = B.shape[-1]
    eye_u = jnp.eye(nu, dtype=B.dtype)

    def one(A_k, B_k, c_k, R_k, r_k, P_n, p_n):
        H_uu = R_k + B_k.T @ P_n @ B_k + reg * eye_u
        H_ux = B_k.T @ P_n @ A_k
        h_u = r_k + B_k.T @ (p_n + P_n @ c_k)
        chol = jax.scipy.linalg.cho_factor(H_uu)
        K = -jax.scipy.linalg.cho_solve(chol, H_ux)
        kff = -jax.scipy.linalg.cho_solve(chol, h_u)
        return K, kff

    return jax.vmap(one)(A, B, c, R, r, P[1:], p[1:])


def forward_pass_assoc(A, B, c, K, kff, dx0):
    """Closed-loop forward rollout as an associative scan over affine-map
    compositions: dx_{k+1} = M_k dx_k + m_k with M = A + BK, m = B kff + c."""
    M = A + B @ K
    m = (B @ kff[..., None])[..., 0] + c

    def comp(f1, f2):
        # f2 AFTER f1: x -> M2 (M1 x + m1) + m2.
        M1, m1 = f1
        M2, m2 = f2
        return (M2 @ M1, (M2 @ m1[..., None])[..., 0] + m2)

    Mc, mc = jax.lax.associative_scan(
        lambda a, b: jax.vmap(comp)(a, b), (M, m)
    )
    # dx_{k+1} = Mc_k dx0 + mc_k for k = 0..N-1.
    dx_tail = (Mc @ dx0[None, :, None])[..., 0] + mc
    dx = jnp.concatenate([dx0[None], dx_tail], axis=0)
    du = (K @ dx[:-1][..., None])[..., 0] + kff
    return dx, du


def lqr_solve_assoc(A, B, c, Q, q, R, r, dx0, reg: float = 0.0):
    """Drop-in parallel-depth replacement for
    :func:`ad_mpc_tpu.ops.riccati.lqr_solve`: O(log N) sequential depth
    instead of O(N)."""
    P, p = backward_pass_assoc(A, B, c, Q, q, R, r, reg=reg)
    K, kff = gains_from_value(A, B, c, Q, q, R, r, P, p, reg=reg)
    return forward_pass_assoc(A, B, c, K, kff, dx0)
