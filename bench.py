"""Benchmark: batched closed-loop MPC solves/s on the available accelerator.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": r}

Workload (BASELINE.json config 2): dynamic bicycle with linear tire, N=30
horizon, a fleet of scenarios each tracking a constant-curvature arc at its
own speed. Every tick is the *full closed-loop unit of work*: build the
reference window on-device, run one SQP-RTI solve per scenario
(linearization sweep + fixed-iteration interior-point QP with Riccati
factorizations), advance the plant by the applied control, shift the warm
start — i.e., exactly what a deployed controller executes per control
period (SURVEY.md §3.1). vs_baseline normalizes against the
reference-derived per-chip target: BASELINE.json asks >=10k solves/s on a
v5p-16 (8 chips) => 1250 solves/s/chip.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import bicycle_spec
from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics, blend_switch
from ad_mpc_tpu.ocp.solver import SQPSolver, SolverState

PER_CHIP_TARGET = 10_000 / 8  # BASELINE: 10k solves/s on v5p-16 (8 chips)


def make_scenarios(batch, seed=0):
    """Per-scenario (speed, curvature): arcs the vehicle can actually track
    (|v^2 kappa| <= 6 m/s^2 lateral, |kappa| <= 0.05 1/m)."""
    rng = np.random.default_rng(seed)
    v = rng.uniform(5.0, 15.0, batch).astype(np.float32)
    kmax = np.minimum(0.05, 6.0 / v**2)
    kappa = rng.uniform(-1.0, 1.0, batch).astype(np.float32) * kmax
    return jnp.asarray(v), jnp.asarray(kappa.astype(np.float32))


def arc_reference(v, kappa, s0, N, dt, params: BicycleParams):
    """(N+1, 7) state reference along a constant-curvature arc starting at
    arc length s0 from the origin. Closed form, jit-friendly."""
    s = s0 + v * jnp.arange(N + 1, dtype=jnp.float32) * dt
    k = jnp.where(jnp.abs(kappa) < 1e-6, 1e-6, kappa)
    psi = k * s
    x = jnp.sin(psi) / k
    y = (1.0 - jnp.cos(psi)) / k
    # Straight-line limit.
    x = jnp.where(jnp.abs(kappa) < 1e-6, s, x)
    y = jnp.where(jnp.abs(kappa) < 1e-6, jnp.zeros_like(s), y)
    delta = jnp.arctan(kappa * (params.l_f + params.l_r))
    ref = jnp.stack(
        [
            x,
            y,
            psi,
            jnp.full_like(s, v),
            jnp.zeros_like(s),
            jnp.full_like(s, kappa * v),
            jnp.full_like(s, delta),
        ],
        axis=-1,
    )
    return ref


def build_fleet(n_nodes=30, qp_iters=12, batch=1024, mesh=None):
    """Returns (tick, init) where tick(carry) -> (carry, kkt) runs one full
    closed-loop control period for the whole fleet inside one XLA program."""
    spec = bicycle_spec(
        t_horizon=n_nodes * 0.05, n_nodes=n_nodes, qp_iters=qp_iters
    )
    p = BicycleParams()
    solver = SQPSolver(
        spec,
        lambda x, u, pp: bicycle_dynamics(x, u, p, switch=pp[0]),
        p_dim=1,
        dtype=jnp.float32,
    )
    N, dt = spec.n_nodes, spec.dt

    def project_arc(x0, s0, kappa):
        """Arc length of the point on the arc closest to the vehicle,
        unwrapped near the previous anchor s0 — the closed-form analogue of
        the reference's closest-waypoint search (``ref_traj.py:103-116``)."""
        px, py = x0[0], x0[1]
        k = kappa
        # On-arc: (k*x, 1 - k*y) = (sin(ks), cos(ks)).
        ang = jnp.arctan2(k * px, 1.0 - k * py)
        ks0 = k * s0
        ang = ks0 + jnp.arctan2(jnp.sin(ang - ks0), jnp.cos(ang - ks0))
        s_arc = ang / jnp.where(jnp.abs(k) < 1e-6, 1e-6, k)
        return jnp.where(jnp.abs(k) < 1e-6, px, s_arc)

    def one_tick(x0, s0, v, kappa, state):
        s0 = project_arc(x0, s0, kappa)
        yref_x = arc_reference(v, kappa, s0, N, dt, p)
        yref_u = jnp.zeros((N, 2), jnp.float32)
        sw = blend_switch(x0[3], p)
        res = solver.solve(x0, yref_x, yref_u, jnp.array([sw]), state)
        # Plant advance by the applied control (same discretization).
        x_next = solver._F(x0, res.us[0], jnp.array([sw]))
        state_next = solver.shift(res.state)
        return x_next, s0, state_next, res.kkt_residual

    tick_v = jax.vmap(one_tick)

    def tick(carry):
        x0, s0, v, kappa, states = carry
        x0, s0, states, kkt = tick_v(x0, s0, v, kappa, states)
        return (x0, s0, v, kappa, states), kkt

    tick = jax.jit(tick, donate_argnums=(0,))

    def init(seed=0):
        v, kappa = make_scenarios(batch, seed)
        x0 = jnp.zeros((batch, 7), jnp.float32)
        x0 = x0.at[:, 3].set(v)
        s0 = jnp.zeros((batch,), jnp.float32)

        def one_state(x):
            return SolverState(
                xs=jnp.tile(x[None], (N + 1, 1)),
                us=jnp.zeros((N, 2), jnp.float32),
            )

        states = jax.vmap(one_state)(x0)
        return (x0, s0, v, kappa, states)

    return tick, init, spec


def bench_batch(batch=1024, n_nodes=30, qp_iters=12, ticks=20, warmup=5):
    tick, init, _ = build_fleet(n_nodes, qp_iters, batch)
    carry = init()
    for _ in range(warmup):
        carry, kkt = tick(carry)
    jax.block_until_ready(kkt)

    tic = time.perf_counter()
    for _ in range(ticks):
        carry, kkt = tick(carry)
    jax.block_until_ready(kkt)
    dt = time.perf_counter() - tic
    return batch * ticks / dt, float(jnp.mean(kkt)), float(jnp.max(kkt))


def bench_latency(n_nodes=30, qp_iters=12, reps=50):
    """Single-solve closed-loop latency (batch=1) vs the 20 ms budget."""
    tick, init, _ = build_fleet(n_nodes, qp_iters, batch=1)
    carry = init()
    for _ in range(5):
        carry, kkt = tick(carry)
    jax.block_until_ready(kkt)
    ts = []
    for _ in range(reps):
        tic = time.perf_counter()
        carry, kkt = tick(carry)
        jax.block_until_ready(kkt)
        ts.append(time.perf_counter() - tic)
    ts = 1e3 * np.asarray(ts)
    return float(np.percentile(ts, 50)), float(np.percentile(ts, 99))


def main():
    import os

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 1024
    solves_per_s, kkt_mean, kkt_max = bench_batch(batch=batch)
    print(
        f"# batch={batch} N=30 kkt_defect mean={kkt_mean:.2e} max={kkt_max:.2e}",
        file=sys.stderr,
    )

    try:
        p50, p99 = bench_latency()
        print(f"# single-solve latency p50={p50:.2f}ms p99={p99:.2f}ms "
              f"(budget 20ms)", file=sys.stderr)
    except Exception as e:  # latency bench is informative only
        print(f"# latency bench failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
