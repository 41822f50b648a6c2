"""Pallas fused rollout+VDE kernel vs the XLA jacfwd linearization sweep.

The kernel (``ops/pallas_vde.py``) must reproduce
:func:`ad_mpc_tpu.ops.integrators.linearize` exactly: same RK4 discrete map,
same forward sensitivities (the VDE, ``sim_car_expl_vde_forw.c`` role), same
multiple-shooting defect. On CPU the kernel runs in interpret mode; on TPU
the same tests exercise the real Mosaic path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
from ad_mpc_tpu.models.pacejka import PacejkaParams, pacejka_dynamics_p
from ad_mpc_tpu.ops.integrators import discretize, linearize
from ad_mpc_tpu.ops.pallas_vde import lane_compatible, make_vde

INTERPRET = jax.devices()[0].platform != "tpu"

_BP = BicycleParams()
_PP = PacejkaParams()


def _bicycle(x, u, p):
    return bicycle_dynamics(x, u, _BP, switch=p[0])


def _pacejka(x, u, p):
    return pacejka_dynamics_p(x, u, p, _PP)


def _xla_linearize(f, dt, xs, us, ps):
    F = lambda p: discretize(lambda xx, uu: f(xx, uu, p), dt, 1)
    return jax.vmap(lambda xs_, us_, p: linearize(F(p), xs_, us_))(xs, us, ps)


def _random_traj(rng, B, N, nx, nu, v0=8.0):
    xs = rng.normal(0.0, 0.4, (B, N + 1, nx)).astype(np.float32)
    xs[:, :, 3] += v0
    us = rng.normal(0.0, 0.5, (B, N, nu)).astype(np.float32)
    return jnp.asarray(xs), jnp.asarray(us)


class TestLaneProbe:
    def test_bicycle_and_pacejka_are_lane_polymorphic(self):
        assert lane_compatible(_bicycle, 7, 2, 1)
        assert lane_compatible(_pacejka, 7, 2, 5)

    def test_matrix_shaped_dynamics_is_rejected(self):
        def mat_dyn(x, u, p):  # builds an (nx, nx) matrix: wrong layout
            M = jnp.outer(x, x)[:7, :7]
            return M @ x

        assert not lane_compatible(mat_dyn, 7, 2, 1)


@pytest.mark.parametrize(
    "f,p_dim,p_row",
    [
        (_bicycle, 1, np.array([1.0], np.float32)),
        (_bicycle, 1, np.array([0.3], np.float32)),  # blended branch
        (_pacejka, 5, np.array([0.9, 0.02, -0.01, 1.1, 0.95], np.float32)),
    ],
    ids=["bicycle-dyn", "bicycle-blend", "pacejka"],
)
def test_kernel_matches_xla_linearize(f, p_dim, p_row):
    rng = np.random.default_rng(3)
    B, N, nx, nu, dt = 5, 6, 7, 2, 0.05
    xs, us = _random_traj(rng, B, N, nx, nu)
    ps = jnp.tile(jnp.asarray(p_row)[None], (B, 1))

    lin_k = make_vde(f, dt, N, nx, nu, p_dim, block_b=8, interpret=INTERPRET)
    A1, B1, c1 = lin_k(xs, us, ps)
    A2, B2, c2 = _xla_linearize(f, dt, xs, us, ps)

    assert A1.shape == (B, N, nx, nx)
    assert B1.shape == (B, N, nx, nu)
    assert c1.shape == (B, N, nx)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-5)


class TestQuadLane:
    """Lane-polymorphic quadrotor dynamics (models/quadrotor.py
    ``quad_dynamics_lane``): must equal the matmul-form ``quad_dynamics``
    and ride the fused kernel."""

    def test_equals_matmul_form(self):
        from ad_mpc_tpu.models.quadrotor import (
            QuadrotorParams, quad_dynamics, quad_dynamics_lane,
        )

        qp = QuadrotorParams()
        rng = np.random.default_rng(9)
        x = rng.normal(0.0, 0.7, (64, 13)).astype(np.float32)
        # Mix of unnormalized and unit quaternions (equality must hold
        # pointwise regardless).
        x[:32, 3:7] /= np.linalg.norm(x[:32, 3:7], axis=1, keepdims=True)
        u = rng.uniform(0.0, 1.0, (64, 4)).astype(np.float32)
        f_mat = jax.vmap(lambda xx, uu: quad_dynamics(xx, uu, qp))
        f_lane = jax.vmap(
            lambda xx, uu: quad_dynamics_lane(xx, uu, None, qp)
        )
        np.testing.assert_allclose(
            np.asarray(f_lane(jnp.asarray(x), jnp.asarray(u))),
            np.asarray(f_mat(jnp.asarray(x), jnp.asarray(u))),
            atol=1e-4, rtol=1e-5,  # f32: the two forms associate differently
        )

    def test_lane_probe_accepts(self):
        from ad_mpc_tpu.models.quadrotor import quad_dynamics_lane

        assert lane_compatible(
            lambda x, u, p: quad_dynamics_lane(x, u, p), 13, 4, 0
        )

    def test_kernel_matches_xla_linearize_quad(self):
        from ad_mpc_tpu.models.quadrotor import quad_dynamics_lane

        f = lambda x, u, p: quad_dynamics_lane(x, u, p)
        rng = np.random.default_rng(13)
        B, N, nx, nu, dt = 4, 5, 13, 4, 0.1
        xs = rng.normal(0.0, 0.3, (B, N + 1, nx)).astype(np.float32)
        xs[:, :, 3] += 1.0  # quaternion w
        us = rng.uniform(0.0, 1.0, (B, N, nu)).astype(np.float32)
        xs, us = jnp.asarray(xs), jnp.asarray(us)
        ps = jnp.zeros((B, 1), jnp.float32)

        lin_k = make_vde(f, dt, N, nx, nu, 0, block_b=8,
                         interpret=INTERPRET)
        A1, B1, c1 = lin_k(xs, us, ps)
        A2, B2, c2 = _xla_linearize(f, dt, xs, us, ps)
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A2),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(B1), np.asarray(B2),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   atol=3e-5)


def test_batch_padding_to_block():
    """Batch not a multiple of block_b: padded rows must not leak."""
    rng = np.random.default_rng(5)
    B, N, nx, nu, dt = 3, 4, 7, 2, 0.05
    xs, us = _random_traj(rng, B, N, nx, nu)
    ps = jnp.ones((B, 1), jnp.float32)
    lin_k = make_vde(_bicycle, dt, N, nx, nu, 1, block_b=8,
                     interpret=INTERPRET)
    A1, B1, c1 = lin_k(xs, us, ps)
    A2, B2, c2 = _xla_linearize(_bicycle, dt, xs, us, ps)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-5)


def test_solver_vde_backends_agree():
    """BatchedSQPSolver(vde='pallas') u0 == vde='xla' u0 on a tracking task."""
    from ad_mpc_tpu.control.mpc import bicycle_spec
    from ad_mpc_tpu.ocp.solver import BatchedSQPSolver

    spec = bicycle_spec(t_horizon=0.4, n_nodes=8, qp_iters=6)
    B, N = 4, spec.n_nodes
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(
        np.concatenate(
            [np.zeros((B, 3)), rng.uniform(5, 12, (B, 1)), np.zeros((B, 3))],
            axis=1,
        ),
        jnp.float32,
    )
    t = np.arange(N + 1) * spec.dt
    yx = np.zeros((B, N + 1, 7), np.float32)
    yx[:, :, 0] = np.asarray(x0[:, 3:4]) * t[None]
    yx[:, :, 1] = 0.3  # small lateral offset to force steering activity
    yx[:, :, 3] = np.asarray(x0[:, 3:4])
    yref_x = jnp.asarray(yx)
    yref_u = jnp.zeros((B, N, 2), jnp.float32)
    p = jnp.ones((B, 1), jnp.float32)

    us = {}
    for vde in ("xla", "pallas"):
        s = BatchedSQPSolver(
            spec, _bicycle, p_dim=1, backend="xla", vde=vde,
            block_b=8, interpret=INTERPRET,
        )
        st = s.init_state(x0)
        us[vde] = np.asarray(s.solve(x0, yref_x, yref_u, p, st).us)
        assert s.vde == vde

    np.testing.assert_allclose(us["pallas"], us["xla"], atol=5e-5)


def test_auto_probe_falls_back_off_tpu():
    """vde='auto' selects pallas only alongside the pallas QP backend (i.e.
    on TPU); with the XLA QP backend it stays on the jacfwd sweep."""
    from ad_mpc_tpu.control.mpc import bicycle_spec
    from ad_mpc_tpu.ocp.solver import BatchedSQPSolver

    spec = bicycle_spec(t_horizon=0.2, n_nodes=4, qp_iters=2)
    s = BatchedSQPSolver(spec, _bicycle, p_dim=1, backend="xla", vde="auto")
    assert s.vde == "xla"
