"""Parallel-prefix (associative-scan) Riccati vs the sequential recursion.

The long-horizon option named by SURVEY.md §2.6/§5: O(log N) sequential
depth replaces HPIPM's O(N) stage sweep. Equality with the sequential
lax.scan Riccati must be exact (same math, different evaluation order)."""

import dataclasses

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.ops.assoc_riccati import lqr_solve_assoc
from ad_mpc_tpu.ops.riccati import lqr_solve


def _random_lq(rng, N, nx, nu):
    A = np.eye(nx) + 0.05 * rng.normal(size=(N, nx, nx))
    B = 0.1 * rng.normal(size=(N, nx, nu))
    c = 0.01 * rng.normal(size=(N, nx))
    Q = np.stack([np.eye(nx) * u for u in rng.uniform(0.1, 2.0, N + 1)])
    q = rng.normal(size=(N + 1, nx))
    R = np.stack([np.eye(nu) * u for u in rng.uniform(0.5, 2.0, N)])
    r = 0.2 * rng.normal(size=(N, nu))
    dx0 = rng.normal(size=nx)
    return [jnp.asarray(a) for a in (A, B, c, Q, q, R, r, dx0)]


@pytest.mark.slow
def test_matches_sequential_across_horizons():
    rng = np.random.default_rng(0)
    for N, nx, nu in ((1, 3, 2), (10, 7, 2), (64, 4, 1), (256, 5, 2)):
        args = _random_lq(rng, N, nx, nu)
        dx1, du1 = lqr_solve(*args, reg=1e-9)
        dx2, du2 = lqr_solve_assoc(*args, reg=1e-9)
        np.testing.assert_allclose(np.asarray(du2), np.asarray(du1),
                                   atol=1e-10, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx1),
                                   atol=1e-10, rtol=1e-8)


def test_solver_with_assoc_riccati_long_horizon():
    """Full SQP-RTI solve at N=120 (6 s horizon) with the associative
    backend agrees with the sequential backend."""
    from ad_mpc_tpu.control.mpc import bicycle_spec
    from ad_mpc_tpu.models.bicycle import bicycle_dynamics, BicycleParams
    from ad_mpc_tpu.ocp.solver import SQPSolver

    p = BicycleParams()
    dyn = lambda x, u, pp: bicycle_dynamics(x, u, p, switch=pp[0])
    N = 120
    base = bicycle_spec(t_horizon=0.05 * N, n_nodes=N, qp_iters=10)
    spec_a = dataclasses.replace(base, assoc_riccati=True)

    s_seq = SQPSolver(base, dyn, p_dim=1, dtype=jnp.float64)
    s_par = SQPSolver(spec_a, dyn, p_dim=1, dtype=jnp.float64)

    v = 9.0
    x0 = jnp.zeros(7).at[3].set(v)
    t = jnp.arange(N + 1) * base.dt
    yref = jnp.zeros((N + 1, 7)).at[:, 0].set(v * t).at[:, 1].set(1.5)
    yref = yref.at[:, 3].set(v)
    yref_u = jnp.zeros((N, 2))
    pp = jnp.ones(1)

    st1 = s_seq.init_state(x0)
    st2 = s_par.init_state(x0)
    r1 = s_seq.solve(x0, yref, yref_u, pp, st1)
    r2 = s_par.solve(x0, yref, yref_u, pp, st2)
    np.testing.assert_allclose(np.asarray(r2.us), np.asarray(r1.us),
                               atol=1e-7, rtol=1e-6)
