"""Closed-loop MPC smoke tests — the pytest formalization of the reference's
smoke-test-with-golden-numbers strategy (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ad_mpc_tpu.control.mpc import BicycleMPC, QuadMPC, bicycle_spec, quad_spec
from ad_mpc_tpu.models.quadrotor import hover_input
from ad_mpc_tpu.sim.simulator import BicycleSim, DisturbanceConfig, QuadrotorSim


@pytest.mark.slow
def test_ad_closed_loop_tracks_oval():
    from ad_mpc_tpu.experiments.ad_closed_loop import run_closed_loop

    res = run_closed_loop(v_target=8.0, sim_time=3.0, n_nodes=20,
                          t_horizon=1.0, qp_iters=10)
    assert res.rmse_pos < 0.5, f"tracking RMSE too large: {res.rmse_pos}"
    assert res.v_mean > 5.0, "vehicle failed to reach target speed"


@pytest.mark.slow
def test_quad_point_stabilization():
    """Quad starts 1 m away from the hover target and must converge."""
    spec = quad_spec(n_nodes=10, qp_iters=12)
    mpc = QuadMPC(spec=spec, dtype=jnp.float64)
    sim = QuadrotorSim(sim_dt=1e-3)
    dt = spec.dt

    target = np.zeros(13)
    target[3] = 1.0  # unit quaternion
    x = jnp.asarray(target).at[0].set(1.0).at[2].add(-0.5)

    x_ref = np.tile(target, (spec.n_nodes + 1, 1))
    u_ref = np.tile(hover_input(), (spec.n_nodes, 1))
    mpc.set_reference(x_ref, u_ref)

    key = jax.random.PRNGKey(0)
    for _ in range(30):  # 3 s
        us, xs = mpc.optimize(x)
        x, key = sim.step(x, us[0], key, dt)

    err = np.linalg.norm(np.asarray(x[:3]) - target[:3])
    assert err < 0.15, f"quad did not stabilize: pos err {err}"
    assert abs(np.linalg.norm(np.asarray(x[3:7])) - 1) < 1e-6


def test_backup_control_on_bad_reference():
    """A wildly implausible reference must trigger the shifted-backup path
    (ad_3d_optimizer.py:469-477 semantics)."""
    spec = bicycle_spec(n_nodes=10, t_horizon=0.5, qp_iters=8)
    mpc = BicycleMPC(spec=spec)
    x = jnp.zeros(7).at[3].set(5.0)

    good = np.zeros((11, 7))
    good[:, 0] = np.linspace(0, 2.5, 11)
    good[:, 3] = 5.0
    mpc.set_reference(good)
    us1, _, ok1 = mpc.optimize(x)
    assert ok1

    bad = good.copy()
    bad[:, 1] += 100.0  # reference jumps 100 m sideways
    mpc.set_reference(bad)
    us2, _, ok2 = mpc.optimize(x)
    assert not ok2
    # Backup = shift of previous plan: us2 == [us1[1:], us1[-1]].
    np.testing.assert_allclose(np.asarray(us2[:-1]), np.asarray(us1[1:]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(us2[-1]), np.asarray(us1[-1]),
                               atol=1e-6)
