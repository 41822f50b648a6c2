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
