"""Tests for uncertainty forward propagation and plant rollout
(reference capability: ``quad_3d_opt_utils.py:61-264``)."""

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.models.quadrotor import hover_input, quad_dynamics
from ad_mpc_tpu.ocp.propagation import (
    forward_prop,
    reshape_input_sequence,
    simulate_plant,
)
from ad_mpc_tpu.ops.integrators import discretize, rollout
from ad_mpc_tpu.sim.simulator import DisturbanceConfig, QuadrotorSim


def _hover_state():
    x = np.zeros(13)
    x[2] = 1.0
    x[3] = 1.0
    return jnp.asarray(x)


def test_mean_matches_rollout():
    x0 = _hover_state()
    us = jnp.tile(jnp.asarray(hover_input())[None], (5, 1))
    f = lambda x, u: quad_dynamics(x, u)
    xs, Ps = forward_prop(f, x0, us, dt=0.05)
    F = discretize(f, 0.05, 1)
    xs_ref = rollout(F, x0, us)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), atol=1e-10)
    # Zero initial covariance + no noise -> covariance stays zero.
    assert float(jnp.max(jnp.abs(Ps))) < 1e-12


def test_covariance_grows_with_process_noise():
    x0 = _hover_state()
    us = jnp.tile(jnp.asarray(hover_input())[None], (8, 1))
    W = 1e-4 * jnp.eye(13)
    xs, Ps = forward_prop(
        lambda x, u: quad_dynamics(x, u), x0, us, dt=0.05, process_noise=W
    )
    traces = np.asarray(jax.vmap(jnp.trace)(Ps))
    assert traces[0] == 0.0
    assert np.all(np.diff(traces) > 0)  # monotone growth


def test_residual_variance_injection():
    x0 = _hover_state()
    us = jnp.tile(jnp.asarray(hover_input())[None], (3, 1))
    Bx = jnp.zeros((13, 3)).at[7:10, :].set(jnp.eye(3))
    var_fn = lambda x, u: jnp.ones(3)
    _, Ps = forward_prop(
        lambda x, u: quad_dynamics(x, u), x0, us, dt=0.1,
        residual_var_fn=var_fn, residual_select=Bx,
    )
    # dt^2 * var lands on the velocity diagonal after one stage; position
    # has not yet picked it up (it propagates via A only from stage 2 on).
    assert float(Ps[1, 7, 7]) > 0.009
    assert float(Ps[1, 0, 0]) < 1e-4
    assert float(Ps[2, 0, 0]) > float(Ps[1, 0, 0])


def test_simulate_plant_shapes_and_determinism():
    sim = QuadrotorSim(disturbances=DisturbanceConfig(noisy=True))
    x0 = _hover_state()
    us = jnp.tile(jnp.asarray(hover_input())[None], (4, 1))
    key = jax.random.PRNGKey(0)
    xs1 = simulate_plant(sim, x0, us, key, 0.02)
    xs2 = simulate_plant(sim, x0, us, key, 0.02)
    assert xs1.shape == (5, 13)
    np.testing.assert_allclose(np.asarray(xs1), np.asarray(xs2))


def test_reshape_input_sequence():
    u = jnp.arange(8.0)
    out = reshape_input_sequence(u, 4)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(out[1]), [4, 5, 6, 7])
