"""Reference-trajectory generator/publisher: the
``reference_publisher_node.py`` analogue.

Generates dense quadrotor references in modes {loop, lemniscate, random,
hover} and hands them to the mission controller, iterating seeds x target
velocities with a busy-flag handshake (``reference_publisher_node.py:23-167``).

The pure generator API (:meth:`ReferenceGenerator.next_trajectory`) is
transport-free; :class:`ReferencePublisherNode` wraps it over the native UDP
bridge using the flattened message layout of the reference's
``ReferenceTrajectory.msg`` (Nx13 trajectory + dt + Nx4 inputs).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ad_mpc_tpu.models.quadrotor import QuadrotorParams, hover_input
from ad_mpc_tpu.trajectories import (
    lemniscate_trajectory,
    loop_trajectory,
    random_trajectory,
)

from ad_mpc_tpu.nodes.topics import BUSY_PORT, REFERENCE_PORT, TAG_REFERENCE


class ReferenceGenerator:
    """Iterates (seed, velocity) combinations per mode."""

    def __init__(
        self,
        mode: str = "loop",
        velocities=(8.0,),
        seeds=(0,),
        quad: QuadrotorParams = QuadrotorParams(),
        discretization_dt: float = 0.01,
    ):
        if mode not in ("loop", "lemniscate", "random", "hover"):
            raise ValueError(mode)
        self.mode = mode
        self.quad = quad
        self.dt = discretization_dt
        self._queue = [(s, v) for s in seeds for v in velocities]
        self._i = 0

    def __len__(self):
        return len(self._queue)

    def next_trajectory(self):
        """(traj (n,13), t_ref (n,), inputs (n,4)) or None when exhausted."""
        if self._i >= len(self._queue):
            return None
        seed, v = self._queue[self._i]
        self._i += 1

        if self.mode == "loop":
            return loop_trajectory(
                self.quad, discretization_dt=self.dt, v_max=v
            )
        if self.mode == "lemniscate":
            return lemniscate_trajectory(
                self.quad, discretization_dt=self.dt, v_max=v
            )
        if self.mode == "random":
            # Speed-based time allocation (higher v -> faster flight),
            # matching the reference's av_dt = av_dist/speed semantics.
            return random_trajectory(
                self.quad, discretization_dt=self.dt, seed=seed, speed=v,
            )
        # hover: a short constant point reference.
        n = int(2.0 / self.dt)
        traj = np.zeros((n, 13))
        traj[:, 2] = 1.0
        traj[:, 3] = 1.0
        t_ref = np.arange(n) * self.dt
        inputs = np.tile(hover_input(self.quad), (n, 1))
        return traj, t_ref, inputs


def encode_reference(traj, t_ref, inputs) -> np.ndarray:
    """Flatten to one float64 row-message: [n, dt, traj.ravel, inputs.ravel]
    (the ``ReferenceTrajectory.msg`` layout, ``msg/ReferenceTrajectory.msg``)."""
    n = len(t_ref)
    dt = float(t_ref[1] - t_ref[0]) if n > 1 else 0.0
    return np.concatenate(
        [[float(n), dt], np.asarray(traj, float).ravel(),
         np.asarray(inputs, float).ravel()]
    )


def decode_reference(msg: np.ndarray):
    n = int(msg[0])
    dt = float(msg[1])
    traj = msg[2 : 2 + 13 * n].reshape(n, 13)
    inputs = msg[2 + 13 * n : 2 + 17 * n].reshape(n, 4)
    t_ref = np.arange(n) * dt
    return traj, t_ref, inputs


class ReferencePublisherNode:
    """UDP publisher with the busy-flag handshake: publish one reference,
    wait until the controller reports not-busy, publish the next."""

    def __init__(
        self,
        generator: Optional[ReferenceGenerator] = None,
        reference_port: int = REFERENCE_PORT,
        busy_port: int = BUSY_PORT,
    ):
        from ad_mpc_tpu.runtime import Publisher, Subscriber

        self.gen = generator if generator is not None else ReferenceGenerator()
        self.pub = Publisher(reference_port)
        self.busy_sub = Subscriber(busy_port)

    def run(
        self,
        poll_ms: int = 100,
        max_trajectories: int | None = None,
        timeout_s: float = 120.0,
    ):
        """Publish trajectories one at a time with the busy handshake.

        Robustness over the reference's bare flag wait
        (``reference_publisher_node.py:161-167``): the busy subscriber is
        drained before each publish (a stale queued busy=False must not
        release the next trajectory immediately), a busy=True must be seen
        before a busy=False is accepted, and the whole wait is bounded by
        ``timeout_s`` so a dead controller cannot spin the publisher forever.
        """
        import time

        sent = 0
        while True:
            if max_trajectories is not None and sent >= max_trajectories:
                break
            nxt = self.gen.next_trajectory()
            if nxt is None:
                break
            # Drain any stale busy messages queued before this publish.
            while self.busy_sub.receive(timeout_ms=0) is not None:
                pass
            self.pub.publish(TAG_REFERENCE, encode_reference(*nxt))
            sent += 1
            # Busy handshake: require at least one busy=True (the controller
            # acknowledged the trajectory) before accepting busy=False.
            saw_busy = False
            deadline = time.monotonic() + timeout_s
            while time.monotonic() < deadline:
                msg = self.busy_sub.receive(timeout_ms=poll_ms)
                if msg is None:
                    continue
                busy = bool(np.asarray(msg[1]).ravel()[0])
                if busy:
                    saw_busy = True
                elif saw_busy:
                    break
        return sent
