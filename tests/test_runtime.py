"""Native runtime bridge tests: SPSC queue, UDP pub/sub, rate timer."""

import os
import threading
import time

import numpy as np
import pytest

from ad_mpc_tpu.runtime import (
    Publisher,
    RateTimer,
    SpscQueue,
    Subscriber,
    monotonic_ns,
)


class TestSpsc:
    def test_round_trip(self):
        q = SpscQueue(slot_size=1024, n_slots=8)
        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        assert q.push(7, arr)
        tag, out = q.pop()
        assert tag == 7
        np.testing.assert_array_equal(out, arr)
        assert q.pop() is None

    def test_pop_latest_discards(self):
        q = SpscQueue(slot_size=256, n_slots=16)
        for i in range(5):
            q.push(1, np.array([i], dtype=np.int64))
        tag, out = q.pop_latest()
        assert int(out[0]) == 4
        assert len(q) == 0

    def test_full_queue(self):
        q = SpscQueue(slot_size=128, n_slots=2)
        a = np.zeros(4, np.float32)
        assert q.push(0, a)
        assert q.push(0, a)
        assert not q.push(0, a)  # full

    def test_threaded_producer_consumer(self):
        q = SpscQueue(slot_size=256, n_slots=64)
        n = 2000
        received = []

        def producer():
            i = 0
            while i < n:
                if q.push(0, np.array([i], dtype=np.int64)):
                    i += 1

        def consumer():
            while len(received) < n:
                msg = q.pop()
                if msg is not None:
                    received.append(int(msg[1][0]))

        tp = threading.Thread(target=producer)
        tc = threading.Thread(target=consumer)
        tp.start(); tc.start()
        tp.join(timeout=20); tc.join(timeout=20)
        assert received == list(range(n))  # FIFO order, no loss, no dupes


class TestUdp:
    def test_pub_sub_round_trip(self):
        port = 48231
        sub = Subscriber(port)
        pub = Publisher(port)
        arr = np.random.default_rng(0).normal(size=(10, 7)).astype(np.float32)
        pub.publish(3, arr)
        msg = sub.receive(timeout_ms=1000)
        assert msg is not None
        tag, out = msg
        assert tag == 3
        np.testing.assert_array_equal(out, arr)
        pub.close(); sub.close()

    def test_timeout_returns_none(self):
        sub = Subscriber(48232)
        t0 = time.time()
        assert sub.receive(timeout_ms=50) is None
        assert time.time() - t0 < 1.0
        sub.close()


class TestRate:
    def test_period_accuracy(self):
        timer = RateTimer(200.0)  # 5 ms period
        t0 = monotonic_ns()
        for _ in range(20):
            timer.sleep()
        elapsed = (monotonic_ns() - t0) / 1e9
        assert 0.08 < elapsed < 0.25  # ~0.1 s nominal, generous upper bound
        stats = timer.jitter_stats()
        assert stats["p50_ms"] < 5.0


@pytest.mark.slow
def test_two_process_closed_loop():
    """FOREIGN-process closed loop: the plant simulator runs as a separate
    OS process (`python -m ad_mpc_tpu.nodes.sim_node`) speaking only the
    UDP message codec — the CARLA/Gazebo-process role of the reference
    stack (`gp_ad_mpc_node.py:115-143`). Validates that the transport layer
    carries a real cross-process control loop, not just threads."""
    import subprocess
    import sys

    from ad_mpc_tpu.nodes.ad_node import ADControllerNode

    base = 49360
    ctrl = ADControllerNode(
        rate_hz=50.0, n_nodes=10, t_horizon=0.5, arming_threshold=2,
        qp_iters=8,
        state_port=base, control_port=base + 1, waypoint_port=base + 2,
        status_port=base + 3,
    )
    ctrl.warmup()

    proc = subprocess.Popen(
        [sys.executable, "-m", "ad_mpc_tpu.nodes.sim_node",
         "--ticks", "160", "--v", "6.0", "--base-port", str(base)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    # The foreign process pays its own jax-import/compile latency before it
    # starts publishing; run the controller until it has actually heard
    # enough of the sim's 160 ticks, then stop it.
    t_ctrl = threading.Thread(
        target=ctrl.run, kwargs={"max_ticks": None, "warmup": False}
    )
    t_ctrl.start()
    try:
        deadline = time.time() + 90
        while time.time() < deadline and ctrl.n_solves < 60:
            if proc.poll() is not None:
                break  # sim finished its ticks
            time.sleep(0.2)
        out, _ = proc.communicate(timeout=120)
    finally:
        ctrl.stop()
        t_ctrl.join(timeout=30)
    assert proc.returncode == 0, out[-800:]
    assert ctrl.n_solves > 50, "controller never heard the foreign process"
    # The sim process prints its own tracking RMSE on exit.
    import re

    m = re.search(r"sim RMSE vs track: ([0-9.]+) m", out)
    assert m, out[-800:]
    assert float(m.group(1)) < 1.0, out[-800:]


@pytest.mark.slow
def test_two_node_closed_loop_pipelined():
    """Pipelined controller (async dispatch + background result fetch):
    the loop must keep publishing every period and still track, with
    commands one pipeline slot stale."""
    from ad_mpc_tpu.nodes.ad_node import ADControllerNode
    from ad_mpc_tpu.nodes.sim_node import SimNode

    base = 49400
    ctrl = ADControllerNode(
        rate_hz=50.0, n_nodes=10, t_horizon=0.5, arming_threshold=2,
        qp_iters=8, pipelined=True,
        state_port=base, control_port=base + 1, waypoint_port=base + 2,
        status_port=base + 3,
    )
    sim = SimNode(
        rate_hz=50.0, v_target=6.0,
        state_port=base, control_port=base + 1, waypoint_port=base + 2,
    )
    ctrl.warmup()
    sim.warmup()
    t_ctrl = threading.Thread(
        target=ctrl.run, kwargs={"max_ticks": 120, "warmup": False}
    )
    t_sim = threading.Thread(
        target=sim.run, kwargs={"max_ticks": 120, "warmup": False}
    )
    t_ctrl.start(); t_sim.start()
    t_ctrl.join(timeout=120)
    ctrl.stop()
    t_sim.join(timeout=60)

    assert ctrl.n_solves > 50
    rmse = sim.tracking_rmse()
    assert rmse < 1.0, f"pipelined two-node loop diverged: RMSE {rmse}"
    s = np.stack(sim.states)
    assert s[-1, 0] - s[0, 0] > 3.0


@pytest.mark.slow
def test_two_node_closed_loop():
    """Full multi-process-style stack in two threads: sim node + controller
    node over the UDP bridge, tracking the oval."""
    from ad_mpc_tpu.nodes.ad_node import ADControllerNode
    from ad_mpc_tpu.nodes.sim_node import SimNode

    base = 49300  # isolated ports for this test
    ctrl = ADControllerNode(
        rate_hz=50.0, n_nodes=10, t_horizon=0.5, arming_threshold=2,
        qp_iters=8,
        state_port=base, control_port=base + 1, waypoint_port=base + 2,
        status_port=base + 3,
    )
    sim = SimNode(
        rate_hz=50.0, v_target=6.0,
        state_port=base, control_port=base + 1, waypoint_port=base + 2,
    )

    # Compile everything before the real-time threads start (the nodes do
    # this themselves on startup; doing it here keeps the 50 Hz phase tight).
    ctrl.warmup()
    sim.warmup()
    t_ctrl = threading.Thread(
        target=ctrl.run, kwargs={"max_ticks": 120, "warmup": False}
    )
    t_sim = threading.Thread(
        target=sim.run, kwargs={"max_ticks": 120, "warmup": False}
    )
    t_ctrl.start(); t_sim.start()
    # The controller loop may run slower than the sim on a contended host —
    # let it finish its own max_ticks before stopping anything.
    t_ctrl.join(timeout=120)
    ctrl.stop()
    t_sim.join(timeout=60)

    assert ctrl.n_solves > 50, "controller never received state/waypoints"
    rmse = sim.tracking_rmse()
    assert rmse < 1.0, f"two-node closed loop diverged: RMSE {rmse}"
    # Vehicle must actually have moved forward along the track under control
    # (absolute speed depends on host CPU contention, so don't assert it).
    s = np.stack(sim.states)
    assert s[-1, 0] - s[0, 0] > 3.0, f"vehicle didn't move: {s[-1, :2]}"
