"""Trajectory library tests — check_trajectory as a property validator
(the reference's own QA oracle, trajectories.py:30-126)."""

import numpy as np
import pytest

from ad_mpc_tpu.trajectories import (
    check_trajectory,
    fit_multi_segment_polynomial,
    lemniscate_trajectory,
    loop_trajectory,
    random_periodical_keyframes,
    random_trajectory,
    sample_polynomial_trajectory,
    straight_trajectory,
)


@pytest.mark.parametrize("gen,kw", [
    (loop_trajectory, {}),
    (loop_trajectory, {"yawing": True}),
    (loop_trajectory, {"clockwise": False}),
    (lemniscate_trajectory, {}),
])
def test_generated_trajectories_are_feasible(gen, kw):
    traj, t, u = gen(v_max=6.0, **kw)
    ok, errs = check_trajectory(traj, u, t)
    assert ok, errs


def test_loop_reaches_vmax():
    traj, t, u = loop_trajectory(v_max=8.0)
    speeds = np.linalg.norm(traj[:, 7:10], axis=1)
    assert abs(np.max(speeds) - 8.0) < 0.5


def test_inputs_in_range():
    traj, t, u = loop_trajectory(v_max=6.0)
    # Normalized thrust commands must stay well within [0, 1].
    assert np.min(u) > -0.05 and np.max(u) < 1.0


def test_straight_trajectory_feasible():
    traj, t, u = straight_trajectory(
        start=np.array([0.0, 0.0, 1.0]),
        end=np.array([8.0, 2.0, 1.5]),
        speed=3.0,
    )
    ok, errs = check_trajectory(traj, u, t)
    assert ok, errs
    # Reaches the displaced endpoint (flatness map re-anchors XY to 0).
    disp = traj[-1, :3] - traj[0, :3]
    np.testing.assert_allclose(disp, [8.0, 2.0, 0.5], atol=0.05)


def test_polynomial_hits_waypoints():
    t_knots = np.array([0.0, 1.0, 2.5, 4.0])
    wps = np.array(
        [[0, 0, 1], [1, 1, 2], [2, -1, 1.5], [3, 0, 1]], dtype=float
    )
    coeffs = fit_multi_segment_polynomial(t_knots, wps)
    derivs, t = sample_polynomial_trajectory(coeffs, t_knots, 0.01)
    pos = derivs[0]  # (3, n)
    for i, tk in enumerate(t_knots[:-1]):
        j = int(np.searchsorted(t, tk))
        np.testing.assert_allclose(pos[:, j], wps[i], atol=1e-4)
    # Rest endpoints: near-zero start velocity.
    assert np.linalg.norm(derivs[1][:, 0]) < 1e-6
    # Numeric derivative consistency: d(pos)/dt == vel.
    v_num = np.gradient(pos, axis=1) / 0.01
    assert np.max(np.abs(v_num[:, 2:-2] - derivs[1][:, 2:-2])) < 0.05


def test_random_trajectory_feasible():
    traj, t, u = random_trajectory(seed=3, duration=12.0, n_keyframes=6)
    ok, errs = check_trajectory(traj, u, t, atol=(2e-2, 2e-3, 0.1))
    assert ok, errs


def test_random_keyframes_within_limits():
    limits = ((-4.0, 4.0), (-3.0, 3.0), (0.5, 2.5))
    kf, theta = random_periodical_keyframes(12, map_limits=limits, seed=1)
    assert kf.shape == (13, 3)
    np.testing.assert_allclose(kf[0], kf[-1])  # closed curve
    lim = np.asarray(limits)
    assert np.all(kf >= lim[None, :, 0] - 1e-9)
    assert np.all(kf <= lim[None, :, 1] + 1e-9)


def test_validator_rejects_bad_trajectory():
    traj, t, u = loop_trajectory(v_max=6.0)
    bad = traj.copy()
    bad[:, 7] += 1.0  # velocity inconsistent with position derivative
    ok, _ = check_trajectory(bad, u, t)
    assert not ok
