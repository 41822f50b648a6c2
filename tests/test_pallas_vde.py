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


class TestLaneGP:
    """GP-augmented dynamics in lane form (learned/lane.py): the learned
    residual evaluates INSIDE the fused VDE kernel (the reference's
    symbolic-GP-in-codegen capability, ``quad_3d_optimizer.py:289-327``)
    and must match the XLA jacfwd sweep exactly.

    Kernel-equality tests use small (n=8) training sets: interpret-mode
    compiles of the unrolled SE mean are minutes-slow on CPU at n=32, and
    the failure class (layout / lowering / math drift) is size-independent.
    The full bench-size ensembles run through the REAL Mosaic path in the
    TPU lane (``test_tpu_lowering.py``)."""

    def _quad_ens(self, n=8):
        from ad_mpc_tpu.experiments.quad_fleet import make_quad_gp_ensemble

        return make_quad_gp_ensemble(n=n)

    def _bicycle_gp(self, n=8):
        """Small-n twin of ``bench.make_gp_bicycle`` (same layout/closure
        structure, reduced training set)."""
        from ad_mpc_tpu.learned.ensemble import GPEnsemble
        from ad_mpc_tpu.learned.gp import GPParams
        from ad_mpc_tpu.learned.lane import add_rows, lane_residual_terms

        rng = np.random.default_rng(11)
        d = 4
        gps = [[], []]
        for dim in range(2):
            X = rng.uniform(
                [-0.0, -1.0, -0.5, -0.5], [15.0, 1.0, 0.5, 0.5], (n, d)
            )
            y = 0.05 * np.sin(X[:, 1] * 3.0) + 0.02 * X[:, 2] * (dim + 1)
            ls = np.array([5.0, 0.5, 0.3, 0.3])
            sf, sn = 0.01, 0.05
            diff = (X[:, None, :] - X[None, :, :]) / ls
            K = sf * np.exp(-0.5 * np.sum(diff * diff, axis=-1))
            K += (sn**2 + 1e-6) * np.eye(n)
            gps[dim].append(GPParams(
                X, np.linalg.solve(K, y - y.mean()), ls, sf, sn,
                float(y.mean()), X.mean(axis=0),
            ))
        ens = GPEnsemble.from_gps(gps, out_idx=(4, 5), feat_idx=(3, 4, 5, 6))

        def gp_bicycle(x, u, p):
            base = bicycle_dynamics(x, u, _BP, switch=p[0])
            return add_rows(base, lane_residual_terms(ens, x))

        return gp_bicycle

    def test_lane_mean_equals_ensemble_predict(self):
        from ad_mpc_tpu.learned.ensemble import (
            body_frame_features, predict, quad_residual_fn,
        )
        from ad_mpc_tpu.learned.lane import quad_lane_residual_terms

        ens = self._quad_ens()
        rng = np.random.default_rng(2)
        for _ in range(4):
            x = rng.normal(0.0, 1.0, 13)
            x[3:7] /= np.linalg.norm(x[3:7])
            x = jnp.asarray(x)
            old = quad_residual_fn(ens)(x, None)
            terms = quad_lane_residual_terms(ens, x)
            new = np.zeros(13)
            for d, v in terms.items():
                new[d] = float(v)
            np.testing.assert_allclose(np.asarray(old), new, atol=1e-6)

    def test_gp_bicycle_kernel_matches_xla(self):
        f = self._bicycle_gp(n=6)
        rng = np.random.default_rng(3)
        B, N, nx, nu, dt = 4, 4, 7, 2, 0.05
        xs, us = _random_traj(rng, B, N, nx, nu)
        ps = jnp.ones((B, 1), jnp.float32)
        lin_k = make_vde(f, dt, N, nx, nu, 1, block_b=8,
                         interpret=INTERPRET)
        A1, B1, c1 = lin_k(xs, us, ps)
        A2, B2, c2 = _xla_linearize(f, dt, xs, us, ps)
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=2e-5)
        np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), atol=2e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-5)

    def test_gp_quad_kernel_matches_xla(self):
        from ad_mpc_tpu.learned.lane import (
            add_rows, quad_lane_residual_terms,
        )
        from ad_mpc_tpu.models.quadrotor import quad_dynamics_lane

        ens = self._quad_ens(n=4)

        def f(x, u, p):
            return add_rows(
                quad_dynamics_lane(x, u, p),
                quad_lane_residual_terms(ens, x),
            )

        rng = np.random.default_rng(13)
        B, N, dt = 4, 3, 0.1
        xs = rng.normal(0.0, 0.3, (B, N + 1, 13)).astype(np.float32)
        xs[:, :, 3] += 1.0
        us = rng.uniform(0.0, 1.0, (B, N, 4)).astype(np.float32)
        xs, us = jnp.asarray(xs), jnp.asarray(us)
        ps = jnp.zeros((B, 1), jnp.float32)
        lin_k = make_vde(f, dt, N, 13, 4, 0, block_b=8, interpret=INTERPRET)
        A1, B1, c1 = lin_k(xs, us, ps)
        A2, B2, c2 = _xla_linearize(f, dt, xs, us, ps)
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=3e-5)
        np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), atol=3e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=3e-5)

    def test_param_routed_clusters_match_fixed_gather(self):
        """Parameter-routed GP (cluster params in p, gathered out of kernel)
        equals the baked evaluation at the selected cluster, and is lane
        compatible — one compiled program serves mixed-cluster fleets."""
        from ad_mpc_tpu.learned.ensemble import GPEnsemble
        from ad_mpc_tpu.learned.gp import GPParams
        from ad_mpc_tpu.learned.lane import (
            add_rows, lane_residual_terms, param_residual_dynamics,
        )

        rng = np.random.default_rng(4)
        n, d = 6, 4
        gps = [[], []]
        for dim in range(2):
            for c in range(2):  # two clusters, distinct centroids
                X = rng.uniform(-1, 1, (n, d)) + 3.0 * c
                y = 0.1 * X[:, 0] + 0.05 * c
                ls = np.full(d, 1.5)
                K = 0.2 * np.exp(
                    -0.5 * np.sum(
                        ((X[:, None] - X[None]) / ls) ** 2, axis=-1
                    )
                ) + 1e-3 * np.eye(n)
                gps[dim].append(GPParams(
                    X, np.linalg.solve(K, y - y.mean()), ls, 0.2, 0.03,
                    float(y.mean()), X.mean(axis=0),
                ))
        ens = GPEnsemble.from_gps(gps, out_idx=(4, 5), feat_idx=(3, 4, 5, 6))

        f_p, p_dim, pack = param_residual_dynamics(ens, _bicycle, 1)
        assert lane_compatible(f_p, 7, 2, p_dim)

        for c in range(2):
            x = jnp.asarray(
                rng.normal(0, 0.3, 7).astype(np.float32)
            ).at[3:7].add(3.0 * c)  # feature dims land in cluster c's basin
            u = jnp.asarray(rng.normal(0, 0.2, 2).astype(np.float32))
            z = jnp.stack([x[i] for i in ens.feat_idx])
            p = pack(z, jnp.ones(1, jnp.float32))
            got = f_p(x, u, p)
            want = add_rows(
                _bicycle(x, u, p), lane_residual_terms(ens, x, cluster=c)
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5,
                err_msg=f"cluster {c}",
            )


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
