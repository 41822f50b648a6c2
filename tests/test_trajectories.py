"""Trajectory library tests — check_trajectory as a property validator
(the reference's own QA oracle, trajectories.py:30-126)."""

import numpy as np
import pytest

from ad_mpc_tpu.trajectories import (
    check_trajectory,
    lemniscate_trajectory,
    loop_trajectory,
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


def test_validator_rejects_bad_trajectory():
    traj, t, u = loop_trajectory(v_max=6.0)
    bad = traj.copy()
    bad[:, 7] += 1.0  # velocity inconsistent with position derivative
    ok, _ = check_trajectory(bad, u, t)
    assert not ok
