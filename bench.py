"""Benchmark: batched MPC solves/s on the available accelerator.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": r}

Workload (BASELINE.json config 2): dynamic bicycle with linear tire, N=30
horizon, batch of scenarios, full SQP-RTI solve per scenario per tick
(linearization sweep + fixed-iteration interior-point QP with Riccati
factorizations). vs_baseline normalizes against the reference-derived
per-chip target: BASELINE.json asks >=10k solves/s on a v5p-16 (8 chips)
=> 1250 solves/s/chip.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import bicycle_spec
from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
from ad_mpc_tpu.parallel.batch import BatchedSolver

PER_CHIP_TARGET = 10_000 / 8  # BASELINE: 10k solves/s on v5p-16 (8 chips)


def make_inputs(spec, batch, seed=0):
    rng = np.random.default_rng(seed)
    N = spec.n_nodes
    x0 = np.zeros((batch, 7), np.float32)
    x0[:, 3] = rng.uniform(5.0, 15.0, batch)  # initial speeds
    x0[:, 2] = rng.uniform(-0.3, 0.3, batch)
    # Straight-ahead references at each scenario's speed.
    t = np.arange(N + 1, dtype=np.float32) * spec.dt
    yx = np.zeros((batch, N + 1, 7), np.float32)
    yx[:, :, 0] = x0[:, None, 0] + x0[:, 3:4] * t[None, :]
    yx[:, :, 2] = x0[:, 2:3]
    yx[:, :, 3] = x0[:, 3:4]
    yu = np.zeros((batch, N, 2), np.float32)
    params = np.ones((batch, 1), np.float32)  # dynamic-model blend
    return jnp.asarray(x0), jnp.asarray(yx), jnp.asarray(yu), jnp.asarray(params)


def bench_batch(batch=1024, n_nodes=30, qp_iters=12, ticks=20, warmup=3):
    spec = bicycle_spec(
        t_horizon=n_nodes * 0.05, n_nodes=n_nodes, qp_iters=qp_iters
    )
    p = BicycleParams()
    solver = BatchedSolver(
        spec,
        lambda x, u, pp: bicycle_dynamics(x, u, p, switch=pp[0]),
        p_dim=1,
        dtype=jnp.float32,
    )
    x0, yx, yu, params = make_inputs(spec, batch)
    states = solver.init_states(x0)

    for _ in range(warmup):
        us, xs, states, kkt = solver.step(x0, yx, yu, params, states)
    jax.block_until_ready(us)

    tic = time.perf_counter()
    for _ in range(ticks):
        us, xs, states, kkt = solver.step(x0, yx, yu, params, states)
    jax.block_until_ready(us)
    dt = time.perf_counter() - tic
    solves_per_s = batch * ticks / dt
    return solves_per_s, float(jnp.mean(kkt))


def bench_latency(n_nodes=30, qp_iters=12, reps=50):
    """Single-solve latency (batch=1): p50/p99 vs the 20 ms budget."""
    spec = bicycle_spec(
        t_horizon=n_nodes * 0.05, n_nodes=n_nodes, qp_iters=qp_iters
    )
    p = BicycleParams()
    solver = BatchedSolver(
        spec,
        lambda x, u, pp: bicycle_dynamics(x, u, p, switch=pp[0]),
        p_dim=1,
        dtype=jnp.float32,
        donate_state=False,
    )
    x0, yx, yu, params = make_inputs(spec, 1)
    states = solver.init_states(x0)
    for _ in range(5):
        us, xs, states2, kkt = solver.step(x0, yx, yu, params, states)
    jax.block_until_ready(us)
    ts = []
    for _ in range(reps):
        tic = time.perf_counter()
        us, xs, states2, kkt = solver.step(x0, yx, yu, params, states)
        jax.block_until_ready(us)
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
    solves_per_s, kkt = bench_batch(batch=batch)
    print(f"# batch={batch} N=30 kkt_defect={kkt:.2e}", file=sys.stderr)

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
