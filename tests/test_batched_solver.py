"""BatchedSQPSolver equivalence: the fleet-scale solver (XLA and Pallas QP
backends) must reproduce the per-scenario SQPSolver under vmap."""

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import bicycle_spec
from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
from ad_mpc_tpu.ocp.solver import BatchedSQPSolver, SQPSolver, SolverState

_P = BicycleParams()


def _dyn(x, u, p):
    return bicycle_dynamics(x, u, _P, switch=p[0])


def _instances(B, N, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.uniform(5.0, 12.0, B).astype(np.float32)
    x0 = np.zeros((B, 7), np.float32)
    x0[:, 3] = v
    t = np.arange(N + 1, dtype=np.float32) * 0.05
    yref = np.zeros((B, N + 1, 7), np.float32)
    yref[:, :, 0] = v[:, None] * t[None]
    yref[:, :, 1] = rng.uniform(-1.0, 1.0, B)[:, None].astype(np.float32)
    yref[:, :, 3] = v[:, None]
    yref_u = np.zeros((B, N, 2), np.float32)
    p = np.ones((B, 1), np.float32)
    return (jnp.asarray(x0), jnp.asarray(yref), jnp.asarray(yref_u),
            jnp.asarray(p))


def _state_for(x0, N):
    return SolverState(
        xs=jnp.tile(x0[:, None], (1, N + 1, 1)),
        us=jnp.zeros((x0.shape[0], N, 2), jnp.float32),
    )


def test_batched_xla_matches_vmapped_scalar_solver():
    N = 12
    spec = bicycle_spec(t_horizon=0.6, n_nodes=N, qp_iters=10)
    scalar = SQPSolver(spec, _dyn, p_dim=1, dtype=jnp.float32)
    batched = BatchedSQPSolver(spec, _dyn, p_dim=1, backend="xla")
    x0, yref, yref_u, p = _instances(B=3, N=N)
    st = _state_for(x0, N)

    res_b = batched.solve(x0, yref, yref_u, p, st)
    res_s = jax.vmap(
        lambda a, b, c, d, e: scalar.solve(a, b, c, d, e).us
    )(x0, yref, yref_u, p, st)
    np.testing.assert_allclose(np.asarray(res_b.us), np.asarray(res_s),
                               atol=1e-5, rtol=1e-4)


def test_batched_pallas_matches_xla_backend():
    N = 12
    spec = bicycle_spec(t_horizon=0.6, n_nodes=N, qp_iters=10)
    xla = BatchedSQPSolver(spec, _dyn, p_dim=1, backend="xla")
    pal = BatchedSQPSolver(spec, _dyn, p_dim=1, backend="pallas",
                           block_b=8)
    x0, yref, yref_u, p = _instances(B=5, N=N, seed=3)
    st = _state_for(x0, N)
    r_x = xla.solve(x0, yref, yref_u, p, st)
    r_p = pal.solve(x0, yref, yref_u, p, st)
    np.testing.assert_allclose(np.asarray(r_p.us), np.asarray(r_x.us),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r_p.xs), np.asarray(r_x.xs),
                               atol=5e-4, rtol=1e-3)


def test_batched_shift_and_closed_loop_progress():
    """A few RTI ticks of the batched solver must track a straight
    reference (end-to-end sanity of solve + shift)."""
    N = 10
    spec = bicycle_spec(t_horizon=0.5, n_nodes=N, qp_iters=10)
    solver = BatchedSQPSolver(spec, _dyn, p_dim=1, backend="xla")
    B = 2
    x0, yref, yref_u, p = _instances(B=B, N=N, seed=7)
    st = _state_for(x0, N)
    x = x0
    for _ in range(10):
        res = solver.solve(x, yref, yref_u, p, st)
        st = solver.shift(res.state)
        x = jax.vmap(solver._F)(x, res.us[:, 0], p)
    # Lateral error to the (constant-y) reference shrinks.
    err = np.abs(np.asarray(x[:, 1]) - np.asarray(yref[:, 0, 1]))
    err0 = np.abs(np.asarray(x0[:, 1]) - np.asarray(yref[:, 0, 1]))
    assert np.all(err < err0 + 1e-3)
    assert np.all(np.asarray(res.kkt_residual) < 1e-2)
