"""GP-augmented quadrotor fleet (bench config c6): the body-frame-rotated
GP velocity residual (reference ``quad_3d_optimizer.py:289-327``) wired
into the batched fleet solver as a dynamics closure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ad_mpc_tpu.experiments.quad_fleet import (
    build_quad_fleet,
    make_quad_gp_ensemble,
)


def test_gp_quad_dynamics_is_lane_polymorphic():
    """Round-4 capability: the lane-form GP residual keeps the GP-augmented
    quad on the fused Pallas VDE path (the layout probe must ACCEPT it; the
    real Mosaic lowering is asserted by the TPU lane,
    ``test_tpu_lowering.py``)."""
    from ad_mpc_tpu.learned.lane import add_rows, quad_lane_residual_terms
    from ad_mpc_tpu.models.quadrotor import quad_dynamics_lane
    from ad_mpc_tpu.ops.pallas_vde import lane_compatible

    ens = make_quad_gp_ensemble()

    def f3(x, u, p):
        return add_rows(
            quad_dynamics_lane(x, u, p),
            quad_lane_residual_terms(ens, x),
        )

    assert lane_compatible(f3, 13, 4, 0)


@pytest.mark.slow
def test_gp_residual_changes_solution_and_fleet_tracks():
    ens = make_quad_gp_ensemble()
    tick_n, init_n, sol_n, _ = build_quad_fleet(backend="xla")
    tick_g, init_g, sol_g, _ = build_quad_fleet(backend="xla", ensemble=ens)

    carry_n, carry_g = init_n(8, 0), init_g(8, 0)
    for _ in range(3):
        carry_n, (kkt_n, lat_n) = tick_n(carry_n)
        carry_g, (kkt_g, lat_g) = tick_g(carry_g)
    u_n = np.asarray(jax.block_until_ready(carry_n[5].us))
    u_g = np.asarray(jax.block_until_ready(carry_g[5].us))
    # The residual is small but must actually flow through the solve.
    assert np.abs(u_n - u_g).max() > 1e-5
    # And the corrected fleet still tracks and stays healthy.
    assert float(lat_g) < 0.5
    assert float(jnp.max(kkt_g)) < 1e-2


def test_ensemble_residual_is_bodyframe_rotated():
    """Rotating the state must rotate the world-frame residual with it."""
    from ad_mpc_tpu.learned.ensemble import body_frame_features, predict
    from ad_mpc_tpu.utils.math import v_dot_q

    ens = make_quad_gp_ensemble()

    def resid_world(x):
        z = body_frame_features(x, ens.feat_idx)
        return v_dot_q(predict(ens, z), x[3:7])

    v_w = jnp.array([2.0, -1.0, 0.5])
    x_id = jnp.zeros(13).at[3].set(1.0).at[7:10].set(v_w)
    # Yaw by 90 degrees; same body-frame velocity seen from a rotated body.
    q_yaw = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    v_w_rot = v_dot_q(v_dot_q(v_w, jnp.array([1.0, 0, 0, 0])), q_yaw)
    x_rot = jnp.zeros(13).at[3:7].set(q_yaw).at[7:10].set(v_w_rot)

    r_id = np.asarray(resid_world(x_id))
    r_rot = np.asarray(resid_world(x_rot))
    np.testing.assert_allclose(
        r_rot, np.asarray(v_dot_q(jnp.asarray(r_id), q_yaw)), atol=1e-5
    )
