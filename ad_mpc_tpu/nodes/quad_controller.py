"""UDP-wired quadrotor controller + plant nodes: the transport-level
``gp_mpc_node.py`` deployment (the AD stack's counterpart is
``ad_node.py``/``sim_node.py``).

Capabilities mirrored from the reference:

- odometry in over UDP with **sequence numbers**, so the mission stepper's
  skipped-message compensation is exercised for real
  (``gp_mpc_node.py:443-492``);
- **busy-flag publisher** answering ``ReferencePublisherNode``'s handshake
  (``/is_mpc_busy``, ``reference_publisher_node.py:67-68``): busy while a
  received trajectory is being flown (ascend/track/land), False when idle;
- body-rate **ControlCommand** output (collective thrust + body rates +
  per-rotor thrusts, ``create_ros_gp_mpc.py:121-143``) encoded for the UDP
  bridge; the plant node decodes it and applies the rotor thrusts.
"""

from __future__ import annotations

import threading

import numpy as np

from ad_mpc_tpu.models.quadrotor import QuadrotorParams, hover_input
from ad_mpc_tpu.nodes import topics
from ad_mpc_tpu.nodes.quad_node import MissionPhase, QuadMissionNode
from ad_mpc_tpu.nodes.quad_wrapper import (
    encode_control_command,
    to_control_command,
)
from ad_mpc_tpu.nodes.reference_publisher import decode_reference
from ad_mpc_tpu.runtime import Publisher, RateTimer, SpscQueue, Subscriber


class QuadControllerNode:
    """Transport wrapper over :class:`QuadMissionNode`."""

    def __init__(
        self,
        mission: QuadMissionNode | None = None,
        params: QuadrotorParams = QuadrotorParams(),
        state_port: int = topics.QUAD_STATE_PORT,
        control_port: int = topics.QUAD_CONTROL_PORT,
        reference_port: int = topics.REFERENCE_PORT,
        busy_port: int = topics.BUSY_PORT,
    ):
        self.mission = mission if mission is not None else QuadMissionNode()
        self.params = params
        self.state_q = SpscQueue(slot_size=512, n_slots=64)
        self.ref_q = SpscQueue(slot_size=4 * 1024 * 1024, n_slots=2)
        self.state_sub = Subscriber(state_port)
        self.ref_sub = Subscriber(reference_port)
        self.control_pub = Publisher(control_port)
        self.busy_pub = Publisher(busy_port)
        self._stop = threading.Event()
        self._rx_threads: list[threading.Thread] = []
        self.n_steps = 0

    def _rx_loop(self, sub: Subscriber, queue: SpscQueue):
        while not self._stop.is_set():
            msg = sub.receive(timeout_ms=50)
            if msg is not None:
                queue.push(*msg)

    def start_io(self):
        for sub, q in ((self.state_sub, self.state_q),
                       (self.ref_sub, self.ref_q)):
            t = threading.Thread(target=self._rx_loop, args=(sub, q),
                                 daemon=True)
            t.start()
            self._rx_threads.append(t)

    @property
    def busy(self) -> bool:
        return self.mission.phase in (
            MissionPhase.ASCEND, MissionPhase.TRACK, MissionPhase.LAND
        )

    def handle_state(self, msg: np.ndarray) -> np.ndarray:
        """One odometry message [seq, t, x13] -> encoded ControlCommand."""
        seq = int(msg[0])
        t = float(msg[1])
        x = np.asarray(msg[2:15], np.float64)
        u = self.mission.step(x, t, seq=seq)
        self.n_steps += 1
        xs = self.mission.last_xs
        if xs is None:
            xs = np.tile(x, (2, 1))
        cmd = to_control_command(
            np.atleast_2d(u), xs, self.params, t=t,
            armed=self.mission.phase != MissionPhase.OFF,
        )
        return encode_control_command(cmd)

    def run(self, max_ticks: int | None = None):
        self.start_io()
        ticks = 0
        while not self._stop.is_set():
            if max_ticks is not None and ticks >= max_ticks:
                break
            ref_msg = self.ref_q.pop_latest()
            if ref_msg is not None:
                traj, t_ref, inputs = decode_reference(ref_msg[1])
                self.mission.receive_trajectory(traj, t_ref, inputs)

            st = self.state_q.pop_latest()
            if st is not None:
                out = self.handle_state(np.asarray(st[1], np.float64))
                self.control_pub.publish(topics.TAG_QUAD_CONTROL, out)
                ticks += 1

            self.busy_pub.publish(
                topics.TAG_BUSY, np.array([self.busy], np.uint8)
            )
            if st is None:
                import time

                time.sleep(0.002)

    def stop(self):
        self._stop.set()


class QuadSimNode:
    """Quadrotor plant node: publishes sequenced odometry, applies received
    rotor-thrust commands (the Gazebo/RotorS role)."""

    def __init__(
        self,
        rate_hz: float = 100.0,
        params: QuadrotorParams = QuadrotorParams(),
        seed: int = 0,
        state_port: int = topics.QUAD_STATE_PORT,
        control_port: int = topics.QUAD_CONTROL_PORT,
        drop_every: int | None = None,
    ):
        import jax
        import jax.numpy as jnp

        from ad_mpc_tpu.sim.simulator import DisturbanceConfig, QuadrotorSim

        self.params = params
        self.rate_hz = rate_hz
        self.dt = 1.0 / rate_hz
        self.sim = QuadrotorSim(params=params,
                                disturbances=DisturbanceConfig())
        self.key = jax.random.PRNGKey(seed)
        x0 = np.zeros(13)
        x0[2] = 0.1
        x0[3] = 1.0
        self.x = jnp.asarray(x0)
        self.u_thrust = np.asarray(hover_input(params)) * params.max_thrust
        self.state_pub = Publisher(state_port)
        self.control_sub = Subscriber(control_port)
        self.timer = RateTimer(rate_hz)
        self.seq = 0
        self.t = 0.0
        # Optional deterministic message dropping: exercises the
        # controller's skipped-message compensation.
        self.drop_every = drop_every
        self.states: list[np.ndarray] = []

    def tick(self):
        self.seq += 1
        self.t += self.dt
        xi = np.asarray(self.x)
        self.states.append(xi)
        dropped = (
            self.drop_every is not None and self.seq % self.drop_every == 0
        )
        if not dropped:
            msg = np.concatenate([[float(self.seq), self.t], xi])
            self.state_pub.publish(topics.TAG_QUAD_STATE, msg.astype(np.float64))

        while True:
            m = self.control_sub.receive(timeout_ms=0)
            if m is None:
                break
            cmd = np.asarray(m[1], np.float64)
            self.u_thrust = cmd[7:11]  # rotor thrusts [N]

        u_norm = np.clip(self.u_thrust / self.params.max_thrust, 0.0, 1.0)
        self.x, self.key = self.sim.step(self.x, u_norm, self.key, self.dt)

    def warmup(self):
        import jax

        x, _ = self.sim.step(self.x, np.full(4, 0.5), self.key, self.dt)
        jax.block_until_ready(x)

    def run(self, max_ticks: int | None = None, warmup: bool = True):
        if warmup:
            self.warmup()
        ticks = 0
        while max_ticks is None or ticks < max_ticks:
            self.timer.sleep()
            self.tick()
            ticks += 1
