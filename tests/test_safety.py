"""Safety-shell semantics (reference plausibility/watchdog machinery)."""

import numpy as np

from ad_mpc_tpu.control.safety import (
    ArmingGate,
    backup_control,
    brake_command,
    check_pred_traj,
    is_valid_command,
)


def test_is_valid_command_accepts_close_prediction():
    ref = np.zeros((11, 7))
    ref[:, 0] = np.arange(11.0)
    x_opt = ref.copy()
    x_opt[:, 1] += 0.5
    assert bool(is_valid_command(x_opt, ref))


def test_is_valid_command_rejects_far_prediction():
    ref = np.zeros((11, 7))
    x_opt = ref.copy()
    x_opt[:, 1] += 10.0
    assert not bool(is_valid_command(x_opt, ref))


def test_check_pred_traj():
    x_opt = np.zeros((11, 7))
    x_now = np.zeros(7)
    assert bool(check_pred_traj(x_opt, x_now))
    assert not bool(check_pred_traj(x_opt, x_now + 100.0))
    x_opt[3, 2] = np.nan
    assert not bool(check_pred_traj(x_opt, x_now))


def test_backup_control_shift():
    us = np.arange(20.0).reshape(10, 2)
    b = np.asarray(backup_control(us))
    np.testing.assert_allclose(b[:-1], us[1:])
    np.testing.assert_allclose(b[-1], us[-1])


def test_arming_gate():
    gate = ArmingGate(n_required=3)
    assert not gate.update(True)
    assert not gate.update(True)
    assert gate.update(True)
    assert not gate.update(False)  # reset on failure
    assert not gate.update(True)


def test_brake_command():
    u, steer = brake_command(steering_hold=0.2)
    assert float(u[0]) < -1e4
    assert float(steer) == 0.2


def test_unsafe_streak_continuously_brakes_plant():
    """While unarmed the node must publish brake/hold on EVERY tick (the
    reference's run_pure, gp_ad_mpc_node.py:446-481) so the plant actually
    decelerates during an unsafe streak instead of coasting on its last
    command."""
    import jax

    from ad_mpc_tpu.nodes.ad_node import ADControllerNode
    from ad_mpc_tpu.sim.simulator import BicycleSim

    # Gate that can never arm -> every tick is an unsafe tick.
    node = ADControllerNode(
        rate_hz=50.0, n_nodes=8, t_horizon=0.4, qp_iters=4,
        arming_threshold=10**9,
    )
    n = 80
    xs_track = np.linspace(0.0, 80.0, n)
    node.ref_gen.set_traj(
        xs_track, np.zeros(n), np.zeros(n), np.full(n, 8.0)
    )

    sim = BicycleSim()
    key = jax.random.PRNGKey(0)
    x = np.zeros(7)
    x[3] = 8.0
    v0 = x[3]
    for _ in range(25):
        cmd = node.control_tick(x)
        assert cmd is not None, "unsafe tick must still publish a command"
        assert cmd[0] < -9.0, "unsafe command must brake"
        xj, key = sim.step(
            np.asarray(x, np.float64), np.asarray(cmd[:2], np.float64),
            key, 0.02,
        )
        x = np.asarray(xj)
    assert x[3] < v0 - 3.0, f"plant did not decelerate: v={x[3]:.2f}"
