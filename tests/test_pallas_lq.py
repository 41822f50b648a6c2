"""Pallas fused LQ-QP kernel vs the XLA reference path.

The kernel (``ops/pallas_lq.py``) must reproduce
:func:`ad_mpc_tpu.ops.qp_ipm.solve_lq_ocp` bit-for-algorithm: same cone
eliminations, Riccati recursion, fraction-to-boundary and centering. On CPU
the kernel runs in interpret mode; on TPU the same tests exercise the real
Mosaic compilation path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ad_mpc_tpu.ops.pallas_lq import make_lq_solver
from ad_mpc_tpu.ops.qp_ipm import BoundSpec, solve_lq_ocp

INTERPRET = jax.devices()[0].platform != "tpu"


def _random_lq(rng, B, N, nx, nu):
    """Batch of random stable LQ problems with consistent shapes."""
    A = np.eye(nx) + 0.05 * rng.normal(size=(B, N, nx, nx))
    Bm = 0.1 * rng.normal(size=(B, N, nx, nu))
    c = 0.01 * rng.normal(size=(B, N, nx))
    q = rng.normal(size=(B, N + 1, nx))
    r = 0.1 * rng.normal(size=(B, N, nu))
    u_ref = 0.3 * rng.normal(size=(B, N, nu))
    x_ref = 0.3 * rng.normal(size=(B, N + 1, nx))
    return (
        A.astype(np.float32), Bm.astype(np.float32), c.astype(np.float32),
        q.astype(np.float32), r.astype(np.float32),
        u_ref.astype(np.float32), x_ref.astype(np.float32),
    )


def _bounds_bicycle_like(nx, nu):
    """Soft input box + one hard state box (the AD spec's structure)."""
    u = dict(
        lb=np.array([-10.0, -3.0], np.float64)[:nu],
        ub=np.array([5.0, 3.0], np.float64)[:nu],
        soft=np.ones(nu, bool),
        zl=np.full(nu, 10.0), zu=np.full(nu, 10.0),
        Zl=np.zeros(nu), Zu=np.zeros(nu),
    )
    lbx = np.full(nx, -np.inf)
    ubx = np.full(nx, np.inf)
    lbx[-1], ubx[-1] = -0.52, 0.52
    x = dict(
        lb=lbx, ub=ubx, soft=np.zeros(nx, bool),
        zl=np.zeros(nx), zu=np.zeros(nx), Zl=np.zeros(nx), Zu=np.zeros(nx),
    )
    return u, x


def _bounds_hard_unit(nx, nu):
    """[0,1] hard input box (the quad spec's structure), no state bounds."""
    u = dict(
        lb=np.zeros(nu), ub=np.ones(nu), soft=np.zeros(nu, bool),
        zl=np.zeros(nu), zu=np.zeros(nu), Zl=np.zeros(nu), Zu=np.zeros(nu),
    )
    x = dict(
        lb=np.full(nx, -np.inf), ub=np.full(nx, np.inf),
        soft=np.zeros(nx, bool),
        zl=np.zeros(nx), zu=np.zeros(nx), Zl=np.zeros(nx), Zu=np.zeros(nx),
    )
    return u, x


def _reference_solve(args, Q, R, QN, ub, xb, iters):
    """Vmapped XLA path on the same f32 data. NOTE: must run under
    'highest' matmul precision — on TPU the f32 matmul default uses bf16
    passes, which destroys the IPM's Riccati algebra (the production
    solver sets this via OCPSpec.matmul_precision)."""
    A, Bm, c, q, r, u_ref, x_ref = [jnp.asarray(v, jnp.float32) for v in args]
    N = A.shape[1]
    Qs = jnp.concatenate(
        [jnp.tile(jnp.asarray(Q, jnp.float32)[None], (N, 1, 1)),
         jnp.asarray(QN, jnp.float32)[None]], axis=0
    )
    Rs = jnp.tile(jnp.asarray(R, jnp.float32)[None], (N, 1, 1))
    u_spec = BoundSpec.make(
        jnp.asarray(ub["lb"], jnp.float32), jnp.asarray(ub["ub"], jnp.float32),
        soft=jnp.asarray(ub["soft"]),
        zl=jnp.asarray(ub["zl"], jnp.float32),
        zu=jnp.asarray(ub["zu"], jnp.float32),
        Zl=jnp.asarray(ub["Zl"], jnp.float32),
        Zu=jnp.asarray(ub["Zu"], jnp.float32),
    )
    x_spec = BoundSpec.make(
        jnp.asarray(xb["lb"], jnp.float32), jnp.asarray(xb["ub"], jnp.float32),
        soft=jnp.asarray(xb["soft"]),
    )

    def one(A, Bm, c, q, r, u_ref, x_ref):
        dx, du, stats = solve_lq_ocp(
            A, Bm, c, Qs, q, Rs, r, jnp.zeros(A.shape[-1], jnp.float32),
            u_spec, x_spec, u_ref=u_ref, x_ref=x_ref, iters=iters,
        )
        return dx, du, stats["alpha"][-1]

    with jax.default_matmul_precision("highest"):
        return jax.jit(jax.vmap(one))(A, Bm, c, q, r, u_ref, x_ref)


@pytest.mark.parametrize("bounds_kind", ["bicycle", "unit"])
def test_kernel_matches_xla_path(bounds_kind):
    rng = np.random.default_rng(5)
    B, N, nx, nu = 4, 10, 7, 2
    Q = np.diag(np.array([0.5, 0.5, 2.0, 0.1, 0.0, 0.0, 0.05]))
    R = np.diag(np.array([0.05, 5.0]))
    QN = 1e-3 * Q
    ub, xb = (
        _bounds_bicycle_like(nx, nu)
        if bounds_kind == "bicycle"
        else _bounds_hard_unit(nx, nu)
    )
    args = _random_lq(rng, B, N, nx, nu)

    iters = 12
    solve_p = make_lq_solver(
        N, nx, nu, Q, R, QN, ub, xb, iters=iters, interpret=INTERPRET,
        block_b=8,
    )
    dx_p, du_p, al_p = solve_p(*args)
    dx_r, du_r, al_r = _reference_solve(args, Q, R, QN, ub, xb, iters)

    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_r),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               atol=3e-4, rtol=1e-3)
    # alpha is a step-size diagnostic; at convergence its value is set by
    # rounding noise in the tiny final cone steps, so only its range is
    # checked (the primal solutions above are the real equality assertion).
    assert np.all(np.asarray(al_p) >= 0.0) and np.all(np.asarray(al_p) <= 1.0)


def test_kernel_batch_padding():
    """Batch not divisible by the lane tile pads and slices correctly."""
    rng = np.random.default_rng(9)
    B, N, nx, nu = 5, 6, 4, 2
    Q = np.eye(nx)
    R = 0.1 * np.eye(nu)
    QN = Q
    ub, xb = _bounds_hard_unit(nx, nu)
    args = _random_lq(rng, B, N, nx, nu)
    solve_p = make_lq_solver(N, nx, nu, Q, R, QN, ub, xb, iters=8,
                             interpret=INTERPRET, block_b=4)
    dx_p, du_p, _ = solve_p(*args)
    assert dx_p.shape == (B, N + 1, nx)
    assert du_p.shape == (B, N, nu)
    dx_r, du_r, _ = _reference_solve(args, Q, R, QN, ub, xb, 8)
    np.testing.assert_allclose(np.asarray(du_p), np.asarray(du_r),
                               atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("bounds_kind", ["bicycle", "unit"])
def test_rolled_matches_unrolled(bounds_kind):
    """The stage-rolled kernel (fori_loop over VMEM scratch; small Mosaic
    program, fast cold compile — VERDICT r2 #6) must agree exactly with
    the fully-unrolled round-2 kernel: identical arithmetic per stage."""
    N, nx, nu, B = 30, 7, 2, 8
    rng = np.random.default_rng(5)
    args = _random_lq(rng, B, N, nx, nu)
    Q = np.diag([10, 10, 50, 0, 0, 0, 1.0])
    R = np.diag([1.0, 100.0])
    QN = Q * 1e-6
    ub, xb = (
        _bounds_bicycle_like(nx, nu)
        if bounds_kind == "bicycle"
        else _bounds_hard_unit(nx, nu)
    )
    s_un = make_lq_solver(N, nx, nu, Q, R, QN, ub, xb, iters=12,
                          interpret=True, roll_stages=False)
    s_ro = make_lq_solver(N, nx, nu, Q, R, QN, ub, xb, iters=12,
                          interpret=True, roll_stages=True)
    dx1, du1, a1 = s_un(*args)
    dx2, du2, a2 = s_ro(*args)
    np.testing.assert_allclose(np.asarray(du1), np.asarray(du2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-7)
