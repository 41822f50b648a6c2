"""Riccati + IPM QP solver numerics vs dense references.

The Riccati recursion is checked against a direct dense KKT solve; the
interior-point solver is checked against scipy trust-constr on the condensed
dense QP (including soft-constraint slack reformulations) — the same QPs
HPIPM solves in the reference, so agreement here transfers to ACADOS parity.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import LinearConstraint, minimize

from ad_mpc_tpu.ops.qp_ipm import BoundSpec, solve_lq_ocp
from ad_mpc_tpu.ops.riccati import lqr_solve

rng = np.random.default_rng(42)


def random_lq(N=6, nx=3, nu=2, seed=0):
    r = np.random.default_rng(seed)
    A = r.normal(size=(N, nx, nx)) * 0.4 + np.eye(nx) * 0.9
    B = r.normal(size=(N, nx, nu)) * 0.5
    c = r.normal(size=(N, nx)) * 0.1
    Q = np.zeros((N + 1, nx, nx))
    for k in range(N + 1):
        M = r.normal(size=(nx, nx))
        Q[k] = M @ M.T * 0.1 + np.eye(nx)
    q = r.normal(size=(N + 1, nx))
    R = np.zeros((N, nu, nu))
    for k in range(N):
        M = r.normal(size=(nu, nu))
        R[k] = M @ M.T * 0.1 + np.eye(nu)
    rr = r.normal(size=(N, nu))
    dx0 = r.normal(size=nx)
    return A, B, c, Q, q, R, rr, dx0


def dense_blocks(A, B, c, Q, q, R, rr, dx0):
    """Condense into z = [dx_0..dx_N, du_0..du_{N-1}] with equality rows."""
    N, nx, nu = B.shape
    nz = (N + 1) * nx + N * nu
    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(N + 1):
        H[k * nx:(k + 1) * nx, k * nx:(k + 1) * nx] = Q[k]
        g[k * nx:(k + 1) * nx] = q[k]
    off = (N + 1) * nx
    for k in range(N):
        H[off + k * nu:off + (k + 1) * nu, off + k * nu:off + (k + 1) * nu] = R[k]
        g[off + k * nu:off + (k + 1) * nu] = rr[k]
    # Equalities: dx_0 = dx0; dx_{k+1} - A dx_k - B du_k = c_k.
    E = np.zeros((nx * (N + 1), nz))
    e = np.zeros(nx * (N + 1))
    E[:nx, :nx] = np.eye(nx)
    e[:nx] = dx0
    for k in range(N):
        rows = slice((k + 1) * nx, (k + 2) * nx)
        E[rows, (k + 1) * nx:(k + 2) * nx] = np.eye(nx)
        E[rows, k * nx:(k + 1) * nx] = -A[k]
        E[rows, off + k * nu:off + (k + 1) * nu] = -B[k]
        e[rows] = c[k]
    return H, g, E, e


def kkt_solve(H, g, E, e):
    nz, ne = H.shape[0], E.shape[0]
    K = np.block([[H, E.T], [E, np.zeros((ne, ne))]])
    rhs = np.concatenate([-g, e])
    sol = np.linalg.solve(K, rhs)
    return sol[:nz]


def unpack(z, N, nx, nu):
    dx = z[: (N + 1) * nx].reshape(N + 1, nx)
    du = z[(N + 1) * nx:].reshape(N, nu)
    return dx, du


def inf_bounds(n):
    return BoundSpec.make(np.full(n, -np.inf), np.full(n, np.inf))


class TestRiccati:
    def test_matches_dense_kkt(self):
        A, B, c, Q, q, R, rr, dx0 = random_lq(seed=1)
        N, nx, nu = B.shape
        dx, du = lqr_solve(*map(jnp.asarray, (A, B, c, Q, q, R, rr, dx0)))
        z = kkt_solve(*dense_blocks(A, B, c, Q, q, R, rr, dx0))
        dx_ref, du_ref = unpack(z, N, nx, nu)
        np.testing.assert_allclose(np.asarray(dx), dx_ref, atol=1e-9)
        np.testing.assert_allclose(np.asarray(du), du_ref, atol=1e-9)

    def test_long_horizon_stability(self):
        A, B, c, Q, q, R, rr, dx0 = random_lq(N=40, seed=2)
        N, nx, nu = B.shape
        dx, du = lqr_solve(*map(jnp.asarray, (A, B, c, Q, q, R, rr, dx0)))
        z = kkt_solve(*dense_blocks(A, B, c, Q, q, R, rr, dx0))
        dx_ref, du_ref = unpack(z, N, nx, nu)
        np.testing.assert_allclose(np.asarray(du), du_ref, atol=1e-6)


class TestIPM:
    def test_unconstrained_matches_kkt(self):
        A, B, c, Q, q, R, rr, dx0 = random_lq(seed=3)
        N, nx, nu = B.shape
        dx, du, _ = solve_lq_ocp(
            *map(jnp.asarray, (A, B, c, Q, q, R, rr, dx0)),
            inf_bounds(nu), inf_bounds(nx),
            u_ref=jnp.zeros((N, nu)), x_ref=jnp.zeros((N + 1, nx)),
        )
        z = kkt_solve(*dense_blocks(A, B, c, Q, q, R, rr, dx0))
        dx_ref, du_ref = unpack(z, N, nx, nu)
        np.testing.assert_allclose(np.asarray(du), du_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dx), dx_ref, atol=1e-6)

    def _dense_bounded_reference(self, A, B, c, Q, q, R, rr, dx0, lbu, ubu,
                                 u_ref, soft=None, z_pen=10.0):
        """trust-constr on the dense QP; optional soft input bounds via
        explicit slack variables with L1 penalty."""
        N, nx, nu = B.shape
        H, g, E, e = dense_blocks(A, B, c, Q, q, R, rr, dx0)
        nz = H.shape[0]
        off = (N + 1) * nx
        n_slack = 2 * N * nu if soft is not None else 0

        def obj(zfull):
            z = zfull[:nz]
            val = 0.5 * z @ H @ z + g @ z
            if n_slack:
                val += z_pen * np.sum(zfull[nz:])
            return val

        def grad(zfull):
            gr = np.zeros_like(zfull)
            gr[:nz] = H @ zfull[:nz] + g
            if n_slack:
                gr[nz:] = z_pen
            return gr

        cons = [LinearConstraint(
            np.hstack([E, np.zeros((E.shape[0], n_slack))]), e, e)]
        # Input bounds: lbu <= u_ref + du (+ sl) and u_ref + du - su <= ubu.
        Su = np.zeros((N * nu, nz + n_slack))
        for k in range(N):
            Su[k * nu:(k + 1) * nu, off + k * nu:off + (k + 1) * nu] = np.eye(nu)
        lo = np.tile(lbu, N) - u_ref.reshape(-1)
        hi = np.tile(ubu, N) - u_ref.reshape(-1)
        if soft is not None:
            Sl = np.zeros((N * nu, nz + n_slack))
            Sh = np.zeros((N * nu, nz + n_slack))
            for i in range(N * nu):
                Sl[i, nz + i] = 1.0
                Sh[i, nz + N * nu + i] = 1.0
            cons.append(LinearConstraint(Su + Sl, lo, np.inf))
            cons.append(LinearConstraint(Su - Sh, -np.inf, hi))
            lb_full = np.concatenate([np.full(nz, -np.inf), np.zeros(n_slack)])
            ub_full = np.full(nz + n_slack, np.inf)
            from scipy.optimize import Bounds
            bounds = Bounds(lb_full, ub_full)
        else:
            cons.append(LinearConstraint(Su, lo, hi))
            bounds = None

        x0 = np.zeros(nz + n_slack)
        res = minimize(obj, x0, jac=grad, method="trust-constr",
                       constraints=cons, bounds=bounds,
                       options={"gtol": 1e-12, "xtol": 1e-14, "maxiter": 3000})
        return unpack(res.x[:nz], N, nx, nu)

    def test_hard_input_bounds(self):
        A, B, c, Q, q, R, rr, dx0 = random_lq(seed=4)
        N, nx, nu = B.shape
        lbu, ubu = np.full(nu, -0.3), np.full(nu, 0.3)
        u_ref = np.zeros((N, nu))
        dx, du, _ = solve_lq_ocp(
            *map(jnp.asarray, (A, B, c, Q, q, R, rr, dx0)),
            BoundSpec.make(lbu, ubu), inf_bounds(nx),
            u_ref=jnp.asarray(u_ref), x_ref=jnp.zeros((N + 1, nx)),
            iters=30,
        )
        dx_ref, du_ref = self._dense_bounded_reference(
            A, B, c, Q, q, R, rr, dx0, lbu, ubu, u_ref)
        assert np.max(np.asarray(du)) <= 0.3 + 1e-6
        assert np.min(np.asarray(du)) >= -0.3 - 1e-6
        np.testing.assert_allclose(np.asarray(du), du_ref, atol=2e-5)

    def test_soft_input_bounds(self):
        # Tight soft bounds with small L1 penalty: optimum violates them.
        A, B, c, Q, q, R, rr, dx0 = random_lq(seed=5)
        N, nx, nu = B.shape
        lbu, ubu = np.full(nu, -0.1), np.full(nu, 0.1)
        z_pen = 0.5
        u_ref = np.zeros((N, nu))
        spec = BoundSpec.make(
            lbu, ubu, soft=np.ones(nu, dtype=bool),
            zl=np.full(nu, z_pen), zu=np.full(nu, z_pen))
        dx, du, _ = solve_lq_ocp(
            *map(jnp.asarray, (A, B, c, Q, q, R, rr, dx0)),
            spec, inf_bounds(nx),
            u_ref=jnp.asarray(u_ref), x_ref=jnp.zeros((N + 1, nx)),
            iters=30,
        )
        dx_ref, du_ref = self._dense_bounded_reference(
            A, B, c, Q, q, R, rr, dx0, lbu, ubu, u_ref,
            soft=True, z_pen=z_pen)
        # Soft bounds must actually be exceeded here (penalty is cheap).
        assert np.max(np.abs(np.asarray(du))) > 0.1
        np.testing.assert_allclose(np.asarray(du), du_ref, atol=5e-5)

    def test_state_bounds(self):
        A, B, c, Q, q, R, rr, dx0 = random_lq(seed=6)
        N, nx, nu = B.shape
        lbx = np.array([-0.5, -np.inf, -np.inf])
        ubx = np.array([0.5, np.inf, np.inf])
        dx, du, _ = solve_lq_ocp(
            *map(jnp.asarray, (A, B, c, Q, q, R, rr, dx0)),
            inf_bounds(nu), BoundSpec.make(lbx, ubx),
            u_ref=jnp.zeros((N, nu)), x_ref=jnp.zeros((N + 1, nx)),
            iters=30,
        )
        assert np.max(np.asarray(dx)[1:, 0]) <= 0.5 + 1e-5
        assert np.min(np.asarray(dx)[1:, 0]) >= -0.5 - 1e-5
