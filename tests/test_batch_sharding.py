"""Batched / sharded fleet-solver tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import bicycle_spec
from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
from ad_mpc_tpu.ocp.solver import SQPSolver, SolverState
from ad_mpc_tpu.parallel.batch import BatchedSolver
from ad_mpc_tpu.parallel.mesh import make_mesh


def _spec():
    return bicycle_spec(t_horizon=0.4, n_nodes=8, qp_iters=6)


def _dyn():
    p = BicycleParams()
    return lambda x, u, pp: bicycle_dynamics(x, u, p, switch=pp[0])


def _inputs(spec, B, seed=0):
    rng = np.random.default_rng(seed)
    N = spec.n_nodes
    x0 = np.zeros((B, 7), np.float32)
    x0[:, 3] = rng.uniform(4, 10, B)
    t = np.arange(N + 1, dtype=np.float32) * spec.dt
    yx = np.zeros((B, N + 1, 7), np.float32)
    yx[:, :, 0] = x0[:, 3:4] * t[None, :]
    yx[:, :, 3] = x0[:, 3:4]
    yu = np.zeros((B, N, 2), np.float32)
    params = np.ones((B, 1), np.float32)
    return (jnp.asarray(x0), jnp.asarray(yx), jnp.asarray(yu),
            jnp.asarray(params))


def test_batched_matches_sequential():
    spec = _spec()
    B = 4
    x0, yx, yu, params = _inputs(spec, B)

    batched = BatchedSolver(spec, _dyn(), p_dim=1, dtype=jnp.float32,
                            donate_state=False)
    states = batched.init_states(x0)
    us_b, xs_b, _, _ = batched.step(x0, yx, yu, params, states)

    single = SQPSolver(spec, _dyn(), p_dim=1, dtype=jnp.float32)
    for i in range(B):
        st = SolverState(xs=states.xs[i], us=states.us[i])
        res = single.solve(x0[i], yx[i], yu[i], params[i], st)
        np.testing.assert_allclose(
            np.asarray(us_b[i]), np.asarray(res.us), atol=2e-5
        )


def test_sharded_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    spec = _spec()
    B = 16
    x0, yx, yu, params = _inputs(spec, B, seed=1)

    mesh = make_mesh(8)
    sharded = BatchedSolver(spec, _dyn(), p_dim=1, dtype=jnp.float32,
                            mesh=mesh, donate_state=False)
    st_sh = sharded.init_states(x0)
    us_sh, xs_sh, next_sh, kkt = sharded.step(x0, yx, yu, params, st_sh)

    plain = BatchedSolver(spec, _dyn(), p_dim=1, dtype=jnp.float32,
                          donate_state=False)
    st = plain.init_states(x0)
    us, xs, next_st, _ = plain.step(x0, yx, yu, params, st)

    np.testing.assert_allclose(np.asarray(us_sh), np.asarray(us), atol=2e-5)
    # Warm-start states shift identically.
    np.testing.assert_allclose(
        np.asarray(next_sh.us), np.asarray(next_st.us), atol=2e-5
    )
    # The output really is sharded over the mesh.
    assert len(us_sh.sharding.device_set) == 8


def test_warm_start_improves_defect():
    """Second RTI tick from the shifted warm start must keep the dynamics
    defect small (the RTI contract)."""
    spec = _spec()
    B = 2
    x0, yx, yu, params = _inputs(spec, B, seed=2)
    solver = BatchedSolver(spec, _dyn(), p_dim=1, dtype=jnp.float32,
                           donate_state=False)
    st = solver.init_states(x0)
    _, _, st, kkt1 = solver.step(x0, yx, yu, params, st)
    _, _, st, kkt2 = solver.step(x0, yx, yu, params, st)
    _, _, st, kkt3 = solver.step(x0, yx, yu, params, st)
    assert float(jnp.max(kkt3)) < 1e-3
