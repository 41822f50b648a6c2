"""Mission state machine + reference generator tests
(reference capability: ``gp_mpc_node.py:518-692``,
``reference_publisher_node.py``)."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ad_mpc_tpu.control.mpc import QuadMPC, quad_spec
from ad_mpc_tpu.nodes.quad_node import MissionPhase, QuadMissionNode
from ad_mpc_tpu.nodes.reference_publisher import (
    ReferenceGenerator,
    decode_reference,
    encode_reference,
)
from ad_mpc_tpu.sim.simulator import DisturbanceConfig, QuadrotorSim
from ad_mpc_tpu.trajectories import straight_trajectory


@pytest.fixture(scope="module")
def mission_run():
    """Fly a short straight trajectory through the full state machine."""
    traj, t_ref, u_traj = straight_trajectory(
        start=np.array([0.0, 0.0, 1.0]),
        end=np.array([2.0, 0.0, 1.0]),
        speed=1.0,
    )
    node = QuadMissionNode(
        mpc=QuadMPC(spec=quad_spec(qp_iters=10)),
        control_period=0.02,
        optimize_every=2,
        record=True,
    )
    sim = QuadrotorSim(disturbances=DisturbanceConfig())
    x = np.array(traj[0])
    x[2] = 1.0
    key = jax.random.PRNGKey(0)

    node.receive_trajectory(traj, t_ref, u_traj)
    phases = [node.phase]
    t = 0.0
    for _ in range(1200):
        u = node.step(np.asarray(x), t)
        x, key = sim.step(jax.numpy.asarray(x), jax.numpy.asarray(u), key, 0.02)
        x = np.asarray(x)
        t += 0.02
        phases.append(node.phase)
        if node.phase == MissionPhase.OFF:
            break
    return node, phases, x


def test_mission_progresses_through_phases(mission_run):
    node, phases, _ = mission_run
    seen = [p.value for p in phases]
    assert "ascend" in seen
    assert "track" in seen
    assert "land" in seen


def test_mission_lands(mission_run):
    node, phases, x = mission_run
    assert node.phase == MissionPhase.OFF
    assert x[2] < node.land_z + 0.1


def test_tracking_rmse_reasonable(mission_run):
    node, _, _ = mission_run
    assert node.tracking_rmse() < 0.5


def test_recording_rows(mission_run):
    node, _, _ = mission_run
    rec = node.recording_arrays()
    assert rec is not None
    x_in, u, x_out, x_pred, dt = rec
    assert x_in.shape[1] == 13 and u.shape[1] == 4
    assert x_out.shape == x_in.shape == x_pred.shape
    # Nominal prediction should be closer to x_out than standing still.
    err_pred = np.linalg.norm(x_out - x_pred, axis=1).mean()
    err_hold = np.linalg.norm(x_out - x_in, axis=1).mean()
    assert err_pred < err_hold


def test_reference_generator_modes():
    gen = ReferenceGenerator(mode="hover", velocities=(1.0,), seeds=(0, 1))
    assert len(gen) == 2
    traj, t_ref, inputs = gen.next_trajectory()
    assert traj.shape[1] == 13 and inputs.shape[1] == 4
    assert gen.next_trajectory() is not None
    assert gen.next_trajectory() is None


def test_reference_message_roundtrip():
    gen = ReferenceGenerator(mode="hover")
    traj, t_ref, inputs = gen.next_trajectory()
    msg = encode_reference(traj, t_ref, inputs)
    traj2, t2, inputs2 = decode_reference(msg)
    np.testing.assert_allclose(traj, traj2)
    np.testing.assert_allclose(inputs, inputs2)
    np.testing.assert_allclose(t_ref, t2, atol=1e-12)
