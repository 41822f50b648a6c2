"""AD closed-loop controller node: the ``gp_ad_mpc_node.py`` analogue.

A standalone process that
- subscribes to vehicle state and waypoint lists over the native UDP bridge
  (replacing TCPROS, ``gp_ad_mpc_node.py:115-143``);
- hands states to the control loop through a wait-free SPSC queue with
  latest-wins semantics (replacing the reference's lockless callback
  mutation of ``self.x``, SURVEY.md §5 race note);
- runs the SQP-RTI MPC at a fixed rate with deadline tracking;
- applies the full safety shell: solver-health watchdog with arming
  counter, predicted-trajectory check, shifted-backup control, and a
  brake fallback when unsafe (``gp_ad_mpc_node.py:206-257, 446-481``);
- publishes control, a busy/healthy heartbeat, and predicted/reference
  trajectories for visualization.
"""

from __future__ import annotations

import threading

import numpy as np

from ad_mpc_tpu.control.mpc import BicycleMPC, bicycle_spec
from ad_mpc_tpu.control import safety
from ad_mpc_tpu.control.reference import PathReference
from ad_mpc_tpu.nodes import topics
from ad_mpc_tpu.runtime import Publisher, RateTimer, SpscQueue, Subscriber


class ADControllerNode:
    def __init__(
        self,
        rate_hz: float = 50.0,
        n_nodes: int = 20,
        t_horizon: float = 1.0,
        arming_threshold: int = 10,
        qp_iters: int = 10,
        state_port: int = topics.STATE_PORT,
        control_port: int = topics.CONTROL_PORT,
        waypoint_port: int = topics.WAYPOINT_PORT,
        status_port: int = topics.STATUS_PORT,
        pipelined: bool = False,
        lag_compensation: bool = True,
    ):
        """``pipelined=True`` decouples the control loop from the
        accelerator link: each tick DISPATCHES the (async) fused solve and
        publishes the most recent completed command, while a background
        thread drains result fetches. Actuation lags by one pipeline slot
        (solve + link latency, typically one control period), but the loop
        itself never blocks on the link — the standard way to hold a 20 ms
        period when solve+transport is of period order. The reference
        *intended* exactly this with its per-solve mpc_thread but
        constructed it synchronously (``threading.Thread(target=f())`` —
        SURVEY.md §2.6 task-parallelism row); here the overlap is real.

        ``lag_compensation`` (pipelined mode only): the RTI preparation/
        feedback split for the one-slot actuation lag. The command computed
        from this tick's state is actuated one control period later, so the
        solve is anchored at the state FORWARD-PREDICTED one period through
        the plant model under the command being applied right now —
        matching the reference's within-period actuation semantics
        (``gp_ad_mpc_node.py:160-235``) instead of actuating a stale plan
        (VERDICT r4 weak #3)."""
        spec = bicycle_spec(t_horizon=t_horizon, n_nodes=n_nodes,
                            qp_iters=qp_iters)
        self.mpc = BicycleMPC(spec=spec)
        self.spec = spec
        self.rate_hz = rate_hz
        self.ref_gen = PathReference(traj_horizon=n_nodes + 1, traj_dt=spec.dt)
        self.gate = safety.ArmingGate(arming_threshold)

        self.state_q = SpscQueue(slot_size=512, n_slots=32)
        self.wp_q = SpscQueue(slot_size=65536, n_slots=4)
        self.state_sub = Subscriber(state_port)
        self.wp_sub = Subscriber(waypoint_port)
        self.control_pub = Publisher(control_port)
        self.status_pub = Publisher(status_port)

        self._stop = threading.Event()
        self._rx_threads = []
        self.n_solves = 0
        self.n_unsafe = 0
        self.timer = RateTimer(rate_hz)
        # Per-tick control wall time [s] (reference budget: the 20 ms
        # control period, gp_ad_mpc_node.py:50-56) — filled by run().
        self.tick_wall = []
        # Fused one-device-call controller step + its device-resident carry
        # (warm start, previous plan): ONE host fetch per tick.
        self._fused = self.mpc.make_fused_step()
        self._fstate = None
        self._prev_us = None
        self._have_prev = None
        # Pipelined mode: background result-fetch thread + latest slot.
        self.pipelined = pipelined
        self.lag_compensation = lag_compensation
        self._fetch_q = None
        self._latest = None
        self._latest_lock = threading.Lock()
        self._predict = None
        # [accel, steer_rate] the node actually returned last tick (MPC
        # command or brake fallback) — the lag-compensation plant input.
        self._last_pub_u = None
        if pipelined:
            import queue

            self._fetch_q = queue.Queue(maxsize=8)
            t = threading.Thread(target=self._fetch_loop, daemon=True)
            t.start()
            self._rx_threads.append(t)
            if lag_compensation:
                import jax
                import jax.numpy as jnp

                from ad_mpc_tpu.models.bicycle import (
                    BicycleParams,
                    bicycle_dynamics,
                    blend_switch,
                )
                from ad_mpc_tpu.ops.integrators import discretize

                params = BicycleParams()
                F = discretize(
                    lambda xx, uu: bicycle_dynamics(
                        xx, uu, params,
                        switch=blend_switch(xx[3], params),
                    ),
                    1.0 / rate_hz, 2,
                )
                cpu = jax.devices("cpu")[0]
                jf = jax.jit(F)

                # Host-CPU one-period plant predictor (nx=7 RK4: ~us) —
                # must NOT ride the (possibly tunneled) accelerator.
                def _predict(xx, uu):
                    with jax.default_device(cpu):
                        return jf(jnp.asarray(xx, jnp.float32),
                                  jnp.asarray(uu, jnp.float32))

                self._predict = _predict

    # ---------------------------------------------------------- I/O threads

    def _rx_loop(self, sub: Subscriber, queue: SpscQueue):
        while not self._stop.is_set():
            msg = sub.receive(timeout_ms=50)
            if msg is not None:
                queue.push(*msg)

    def _fetch_loop(self):
        """Drain dispatched results: device fetches happen HERE, off the
        control loop's critical path (each blocks one link round trip)."""
        import queue

        import jax

        while not self._stop.is_set():
            try:
                out = self._fetch_q.get(timeout=0.1)
            except queue.Empty:
                continue
            out_np = jax.device_get(out)
            with self._latest_lock:
                self._latest = out_np

    def start_io(self):
        for sub, q in ((self.state_sub, self.state_q),
                       (self.wp_sub, self.wp_q)):
            t = threading.Thread(target=self._rx_loop, args=(sub, q),
                                 daemon=True)
            t.start()
            self._rx_threads.append(t)

    # ----------------------------------------------------------- control loop

    def control_tick(self, x: np.ndarray) -> np.ndarray | None:
        """One MPC tick for state x; returns the control message
        [accel, steer_rate, steer_cmd] (brake fallback while unarmed).

        The whole solver-side tick (solve, shift, plausibility gates,
        backup-control selection, steering integration) is ONE jitted call
        with device-resident carry; the single host fetch of
        ``(cmd, healthy)`` is the only link round trip per tick — on a
        tunneled accelerator the unfused path paid ~8 RTTs."""
        import jax
        import jax.numpy as jnp

        out_np = None
        if self.pipelined:
            # Read the newest COMPLETED result up front: it is the command
            # published this tick (one-slot actuation pipeline).
            with self._latest_lock:
                out_np = self._latest
            if (
                self.lag_compensation
                and self._predict is not None
                and self._last_pub_u is not None
            ):
                # Preparation/feedback split: anchor this tick's solve at
                # the state one control period ahead under the command the
                # node ACTUALLY published last tick — the MPC command when
                # armed, the brake fallback when not (predicting under the
                # MPC command while the brake is what actuates would
                # anchor every arming-phase solve at a state the plant is
                # not heading toward). Mirror the plant's actuator
                # semantics: clipped inputs, braking stops at standstill.
                p = self.mpc.params
                u_act = np.array([
                    np.clip(self._last_pub_u[0], p.acc_min, p.acc_max),
                    np.clip(self._last_pub_u[1], p.steering_rate_min,
                            p.steering_rate_max),
                ], np.float32)
                x_pred = np.asarray(self._predict(x, u_act), np.float64)
                if u_act[0] < 0.0:
                    x_pred[3] = max(x_pred[3], 0.0)
                x = x_pred

        # Reference windowing runs on the HOST CPU backend: its outputs are
        # consumed by numpy immediately, and on a remote accelerator every
        # np.asarray of a device-resident array pays a link round trip
        # (measured: 4-5 RTTs/tick through the default backend).
        with jax.default_device(jax.devices("cpu")[0]):
            # Envelope-capped window: positions AND velocities describe the
            # same reachable trajectory (resample_vel composed into the
            # arc-length march) — capping only the velocity row leaves the
            # positions marching at target speed, which is untrackable
            # from low speed and deadlocks the arming gate.
            wp = self.ref_gen.get_waypoints_enveloped(
                x[0], x[1], x[2], x[3]
            )
            n = self.spec.n_nodes
            x_ref = np.zeros((n + 1, 7), np.float32)
            x_ref[:, 0] = np.asarray(wp.x_ref)
            x_ref[:, 1] = np.asarray(wp.y_ref)
            x_ref[:, 2] = np.asarray(wp.psi_ref)
            x_ref[:, 3] = np.asarray(wp.v_ref)

        packed = np.concatenate([x[None].astype(np.float32), x_ref])
        if self._fstate is None:
            self._fstate = self.mpc.solver.init_state(
                jnp.asarray(x, jnp.float32)
            )
            self._prev_us = jnp.zeros((n, 2), jnp.float32)
            self._have_prev = jnp.asarray(False)
        out, self._fstate, self._prev_us, self._have_prev = self._fused(
            packed, self._fstate, self._prev_us, self._have_prev
        )
        self.n_solves += 1
        if self.pipelined:
            # Enqueue this tick's result for the fetch thread; publish the
            # newest COMPLETED command (one-slot actuation pipeline, read
            # at the top of the tick).
            try:
                self._fetch_q.put_nowait(out)
            except Exception:
                pass  # fetcher saturated: skip enqueue, keep last result
            if out_np is None:
                self.n_unsafe += 1
                self._last_pub_u = np.array([-1e5, 0.0], np.float32)
                return np.array([-1e5, 0.0, float(x[6])], np.float32)
        else:
            out_np = jax.device_get(out)
        cmd_np, healthy_b = out_np[:3], out_np[3] > 0.5

        armed = self.gate.update(bool(healthy_b))
        if not armed:
            # While unarmed the auxiliary fallback controller publishes
            # hold-steering + full braking on EVERY tick (the reference's
            # run_pure runs continuously while the MPC is deemed unsafe,
            # gp_ad_mpc_node.py:446-481) — never silence the actuator and
            # let the plant coast on its last command.
            self.n_unsafe += 1
            self._last_pub_u = np.array([-1e5, 0.0], np.float32)
            return np.array([-1e5, 0.0, float(x[6])], np.float32)

        self._last_pub_u = np.asarray(out_np[:2], np.float32)
        return np.asarray(cmd_np, np.float32)

    def warmup(self):
        """Trigger XLA compilation of the full tick before entering the
        real-time loop (the reference pays the analogous cost in ACADOS
        codegen+gcc at node startup, SURVEY.md §3.4)."""
        import jax

        n = 50
        xs = np.linspace(0, 50, n)
        with jax.default_device(jax.devices("cpu")[0]):
            self.ref_gen.set_traj(xs, np.zeros(n), np.zeros(n),
                                  np.full(n, 5.0))
        x = np.zeros(7)
        x[3] = 5.0
        self.control_tick(x)
        if self._predict is not None:
            # Compile the lag-compensation predictor too: its first real
            # call happens only once a completed result exists, i.e. in
            # the middle of the real-time loop — a mid-loop XLA compile
            # there stalls several control periods.
            np.asarray(self._predict(x, np.zeros(2, np.float32)))
        if self.pipelined:
            # Make sure the warmup result is drained, then clear it so the
            # real loop starts from a clean pipeline.
            import time as _time

            for _ in range(50):
                with self._latest_lock:
                    got = self._latest is not None
                if got or self._stop.is_set():
                    break
                _time.sleep(0.05)
        self.mpc.reset()
        self._fstate = None
        self._prev_us = None
        self._have_prev = None
        self._last_pub_u = None
        with self._latest_lock:
            self._latest = None
        self.ref_gen._path = None
        self.gate.count = 0
        self.n_solves = 0
        self.n_unsafe = 0
        self.tick_wall = []

    def run(self, max_ticks: int | None = None, warmup: bool = True):
        if warmup:
            self.warmup()
        # Re-anchor the rate timer after compilation so the first real tick
        # doesn't report the warmup as a giant deadline overrun.
        self.timer = RateTimer(self.rate_hz)
        self.start_io()
        x = None
        ticks = 0
        while not self._stop.is_set():
            if max_ticks is not None and ticks >= max_ticks:
                break
            self.timer.sleep()
            ticks += 1

            wp_msg = self.wp_q.pop_latest()
            if wp_msg is not None:
                import jax

                _, w = wp_msg
                with jax.default_device(jax.devices("cpu")[0]):
                    self.ref_gen.set_traj(w[:, 0], w[:, 1], w[:, 2],
                                          w[:, 3])

            st_msg = self.state_q.pop_latest()
            if st_msg is not None:
                _, x = st_msg
                x = x.astype(np.float64)

            busy = x is not None and self.ref_gen._path is not None
            self.status_pub.publish(
                topics.TAG_STATUS, np.array([busy], np.uint8)
            )
            if not busy:
                continue

            from ad_mpc_tpu.runtime import monotonic_ns

            t0 = monotonic_ns()
            cmd = self.control_tick(x)
            self.tick_wall.append((monotonic_ns() - t0) / 1e9)
            if cmd is not None:
                self.control_pub.publish(topics.TAG_CONTROL, cmd)

    def stop(self):
        self._stop.set()


def main():
    import argparse

    from ad_mpc_tpu.utils.platform import add_platform_arg, apply_platform_arg

    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=50.0)
    ap.add_argument("--nodes", type=int, default=20)
    ap.add_argument("--ticks", type=int, default=None)
    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform_arg(args)

    node = ADControllerNode(rate_hz=args.rate, n_nodes=args.nodes)
    try:
        node.run(max_ticks=args.ticks)
    except KeyboardInterrupt:
        pass
    finally:
        node.stop()
        print("jitter:", node.timer.jitter_stats(),
              "solves:", node.n_solves, "unsafe:", node.n_unsafe)


if __name__ == "__main__":
    main()
