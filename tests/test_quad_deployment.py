"""Quad deployment path: xacro param loading, ControlCommand conversion,
sequence-gated skipped-message compensation, and the UDP-wired two-node
closed loop with the busy-flag handshake."""

import os
import threading

import numpy as np
import pytest

from ad_mpc_tpu.models.quadrotor import QuadrotorParams, hover_input
from ad_mpc_tpu.nodes.quad_node import MissionPhase, QuadMissionNode
from ad_mpc_tpu.nodes.quad_wrapper import (
    ControlCommand,
    decode_control_command,
    encode_control_command,
    parse_xacro_file,
    quad_params_from_xacro,
    to_control_command,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "test_quad.xacro")


class TestXacro:
    def test_parse_attributes(self):
        a = parse_xacro_file(FIXTURE)
        assert a["mass"] == "0.9"
        assert a["arm_length"] == "0.22"
        assert a["body_inertia"][0]["ixx"] == "0.011"

    def test_params_derivation(self):
        p = quad_params_from_xacro(FIXTURE, quad_name="test_quad")
        # mass + 4 rotor masses
        assert abs(p.mass - (0.9 + 4 * 0.025)) < 1e-12
        # max thrust = w_max^2 * motor constant
        assert abs(p.max_thrust - 1100.0**2 * 1.2e-5) < 1e-9
        assert p.j == (0.011, 0.012, 0.021)
        assert p.configuration == "x"
        # hummingbird selects the + configuration
        p2 = quad_params_from_xacro(FIXTURE, quad_name="hummingbird")
        assert p2.configuration == "+"


class TestControlCommand:
    def test_conversion_semantics(self):
        params = QuadrotorParams()
        us = np.full((5, 4), 0.5)
        xs = np.zeros((6, 13))
        xs[1, 10:13] = [0.1, -0.2, 0.3]
        cmd = to_control_command(us, xs, params, t=1.5)
        assert cmd.control_mode == 2 and cmd.armed
        # collective thrust: sum of stage-0 inputs * max_thrust / mass
        expect = 4 * 0.5 * params.max_thrust / params.mass
        assert abs(cmd.collective_thrust - expect) < 1e-9
        np.testing.assert_allclose(cmd.bodyrates, [0.1, -0.2, 0.3])
        np.testing.assert_allclose(cmd.rotor_thrusts,
                                   0.5 * params.max_thrust)

    def test_codec_round_trip(self):
        cmd = ControlCommand(
            t=2.0, control_mode=2, armed=True, collective_thrust=9.81,
            bodyrates=np.array([0.1, 0.2, 0.3]),
            rotor_thrusts=np.array([1.0, 2.0, 3.0, 4.0]),
        )
        back = decode_control_command(encode_control_command(cmd))
        assert back.t == cmd.t and back.control_mode == 2 and back.armed
        np.testing.assert_allclose(back.bodyrates, cmd.bodyrates)
        np.testing.assert_allclose(back.rotor_thrusts, cmd.rotor_thrusts)


class TestSkippedMessageCompensation:
    def _node(self):
        return QuadMissionNode(n_nodes=6, t_horizon=0.6)

    def test_even_cadence_alternates(self):
        node = self._node()
        x = np.zeros(13)
        x[3] = 1.0
        opt_counts = []
        n0 = 0
        for seq in range(1, 9):
            before = node.mpc.solver  # no-op; count via _optimize_next flip
            node.step(x, 0.01 * seq, seq=seq)
            opt_counts.append(not node._optimize_next)
        # Every second message optimizes: flags alternate.
        assert opt_counts == [True, False] * 4

    def test_odd_drop_before_skip_tick_optimizes_now(self):
        """A drop detected on a would-be skip tick with odd count flips the
        phase: optimize NOW to preserve the cadence
        (``gp_mpc_node.py:449-466``)."""
        node = self._node()
        x = np.zeros(13)
        x[3] = 1.0
        node.step(x, 0.00, seq=1)   # optimizes; next tick would skip
        node.step(x, 0.01, seq=3)   # seq 2 dropped (odd) -> optimize now
        assert node.n_skipped == 1
        assert not node._optimize_next  # next tick is a skip tick again
        node.step(x, 0.02, seq=4)   # skip tick
        assert node._optimize_next

    def test_drop_on_optimize_tick_forces_double(self):
        """A drop detected on an optimize tick means the reference is
        already late: optimize twice in a row
        (``gp_mpc_node.py:474-484``)."""
        node = self._node()
        x = np.zeros(13)
        x[3] = 1.0
        node.step(x, 0.00, seq=1)   # optimizes
        node.step(x, 0.01, seq=2)   # skip tick -> next optimizes
        node.step(x, 0.02, seq=5)   # drops seqs 3,4 on an optimize tick
        assert node.n_skipped == 2
        assert node._optimize_next  # armed to optimize AGAIN next tick
        node.step(x, 0.03, seq=6)   # the double-up optimization
        assert not node._optimize_next


@pytest.mark.slow
def test_quad_two_node_closed_loop_with_drops():
    """Full quad transport stack in threads: plant node + controller node +
    reference publisher over the UDP bridge, with deterministic message
    drops exercising the compensation, and the busy handshake releasing the
    publisher."""
    import jax.numpy as jnp

    from ad_mpc_tpu.nodes.quad_controller import (
        QuadControllerNode,
        QuadSimNode,
    )
    from ad_mpc_tpu.nodes.reference_publisher import (
        ReferenceGenerator,
        ReferencePublisherNode,
    )

    base = 49400
    mission = QuadMissionNode(n_nodes=10, t_horizon=1.0,
                              control_period=0.01)
    ctrl = QuadControllerNode(
        mission=mission,
        state_port=base, control_port=base + 1,
        reference_port=base + 2, busy_port=base + 3,
    )
    sim = QuadSimNode(
        rate_hz=100.0, state_port=base, control_port=base + 1,
        drop_every=17,
    )
    pub = ReferencePublisherNode(
        generator=ReferenceGenerator(mode="hover"),
        reference_port=base + 2, busy_port=base + 3,
    )

    # Compile before the loop starts.
    mission.step(np.asarray(sim.x), 0.0, seq=0)
    mission._last_seq = None
    mission._optimize_next = True
    mission._msg_count = 0
    sim.warmup()

    t_ctrl = threading.Thread(target=ctrl.run, kwargs={"max_ticks": 500})
    t_sim = threading.Thread(target=sim.run,
                             kwargs={"max_ticks": 600, "warmup": False})
    t_ctrl.start()
    t_sim.start()
    sent = pub.run(max_trajectories=1, timeout_s=30.0)
    t_sim.join(timeout=60)
    ctrl.stop()
    t_ctrl.join(timeout=30)

    assert sent == 1
    assert ctrl.n_steps > 50, "controller never received plant states"
    assert mission.n_skipped > 0, "drops were not observed"
    assert mission.phase in (MissionPhase.TRACK, MissionPhase.LAND,
                             MissionPhase.OFF, MissionPhase.ASCEND)
    # The quad must have flown toward the hover reference (z = 1); the
    # final state may be post-landing free fall (the sim has no ground
    # plane), so check the peak altitude reached under control.
    s = np.stack(sim.states)
    assert float(s[:, 2].max()) > 0.6, (
        f"quad never lifted: max z={s[:, 2].max():.2f}"
    )
