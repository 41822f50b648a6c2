"""Plant-simulator node: the CARLA-bridge role in the reference stack.

Publishes the vehicle state at a fixed rate, applies received control
commands to the JAX bicycle plant, and publishes the waypoint window of a
global track (the ``/local_traj`` producer role).
"""

from __future__ import annotations

import numpy as np

from ad_mpc_tpu.nodes import topics
from ad_mpc_tpu.runtime import Publisher, RateTimer, Subscriber
from ad_mpc_tpu.sim.simulator import BicycleSim, DisturbanceConfig


class SimNode:
    def __init__(
        self,
        rate_hz: float = 50.0,
        v_target: float = 8.0,
        disturbances: DisturbanceConfig = DisturbanceConfig(),
        seed: int = 0,
        state_port: int = topics.STATE_PORT,
        control_port: int = topics.CONTROL_PORT,
        waypoint_port: int = topics.WAYPOINT_PORT,
        device=None,
        track_radius: float = 30.0,
    ):
        """``device``: optional jax device for the plant step — e.g.
        ``jax.devices('cpu')[0]`` to keep the 50 Hz plant local while the
        controller's solver runs on a (possibly tunneled) accelerator in
        the same process."""
        import jax
        import jax.numpy as jnp

        from ad_mpc_tpu.experiments.ad_closed_loop import oval_track

        self._device = device
        self.rate_hz = rate_hz
        self.dt = 1.0 / rate_hz
        self.sim = BicycleSim(disturbances=disturbances)
        self.key = jax.random.PRNGKey(seed)
        self.x = jnp.zeros(7).at[3].set(v_target * 0.5)
        self.u = np.zeros(2)
        self.v_target = v_target
        # track_radius: corner radius of the oval — shrink it (with high
        # v_target) for aggressive scenarios where actuation lag bites.
        self.track = oval_track(r=track_radius)

        self.state_pub = Publisher(state_port)
        self.wp_pub = Publisher(waypoint_port)
        self.control_sub = Subscriber(control_port)
        self.timer = RateTimer(rate_hz)
        self.states = []

    def tick(self):
        import numpy as np

        tx, ty, tpsi = self.track
        xi = np.asarray(self.x)

        # Publish waypoint window ahead of the vehicle (the /local_traj role).
        m = len(tx)
        ci = int(np.argmin((tx - xi[0]) ** 2 + (ty - xi[1]) ** 2))
        idx = (ci + np.arange(0, 200)) % m
        wps = np.stack(
            [tx[idx], ty[idx], tpsi[idx], np.full(len(idx), self.v_target)],
            axis=1,
        ).astype(np.float32)
        self.wp_pub.publish(topics.TAG_WAYPOINTS, wps)

        # Publish state.
        self.state_pub.publish(topics.TAG_STATE, xi.astype(np.float32))

        # Apply most recent control (drain the socket).
        while True:
            msg = self.control_sub.receive(timeout_ms=0)
            if msg is None:
                break
            _, cmd = msg
            self.u = np.asarray(cmd[:2], np.float64)

        self.x, self.key = self._step()
        self.states.append(xi)

    def _step(self):
        if self._device is None:
            return self.sim.step(self.x, self.u, self.key, self.dt)
        import jax

        with jax.default_device(self._device):
            return self.sim.step(self.x, self.u, self.key, self.dt)

    def warmup(self):
        """Compile the plant step before the real-time loop."""
        import jax

        x, key = self._step()
        jax.block_until_ready(x)

    def run(self, max_ticks: int | None = None, warmup: bool = True):
        if warmup:
            self.warmup()
        ticks = 0
        while max_ticks is None or ticks < max_ticks:
            self.timer.sleep()
            self.tick()
            ticks += 1

    def tracking_rmse(self) -> float:
        tx, ty, _ = self.track
        s = np.stack(self.states)
        d = np.sqrt(
            (s[:, None, 0] - tx[None, :]) ** 2
            + (s[:, None, 1] - ty[None, :]) ** 2
        ).min(axis=1)
        return float(np.sqrt(np.mean(d**2)))


def main():
    import argparse

    from ad_mpc_tpu.utils.platform import add_platform_arg, apply_platform_arg

    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=50.0)
    ap.add_argument("--v", type=float, default=8.0)
    ap.add_argument("--ticks", type=int, default=None)
    ap.add_argument("--noisy", action="store_true")
    ap.add_argument(
        "--base-port", type=int, default=None,
        help="use ports base, base+1, base+2 for state/control/waypoints "
        "(foreign-process wiring; default: the topics.py well-known ports)",
    )
    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform_arg(args)

    ports = {}
    if args.base_port is not None:
        ports = dict(
            state_port=args.base_port,
            control_port=args.base_port + 1,
            waypoint_port=args.base_port + 2,
        )
    node = SimNode(
        rate_hz=args.rate,
        v_target=args.v,
        disturbances=DisturbanceConfig(noisy=args.noisy),
        **ports,
    )
    try:
        node.run(max_ticks=args.ticks)
    finally:
        print(f"sim RMSE vs track: {node.tracking_rmse():.4f} m, "
              f"jitter: {node.timer.jitter_stats()}")


if __name__ == "__main__":
    main()
