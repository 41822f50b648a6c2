"""Scaling-efficiency table generator (BASELINE row: "solves/s efficiency
measured at 1 chip, 1 host, and >=2 hosts").

Real multi-chip TPU hardware is not reachable from this environment (one
v5-lite chip over a tunnel), so the table separates:

1. the REAL single-chip throughput (read from ``BENCH_DETAIL.json``, which
   ``bench.py`` regenerates on the actual TPU), and
2. mesh-scaling EFFICIENCY ratios measured on the virtual-device CPU
   backend — the identical jitted program + ``shard_map`` sharding a real
   slice runs, weak-scaled (fixed per-device batch) over 1/2/4/8 devices,
   plus the >=2-process ``jax.distributed`` DCN path.

Usage::

    python -m ad_mpc_tpu.parallel.scaling          # writes SCALING.md
"""

from __future__ import annotations

import json
import os
import time


def measure_cpu_mesh(devices=(1, 2, 4, 8), per_dev_batch=16, nodes=8,
                     qp_iters=6, ticks=10, backend="xla"):
    """Weak-scaling sweep on the virtual CPU mesh: per-device batch fixed,
    device count grows; perfect scaling = flat time per tick."""
    need = max(devices)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={need}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ad_mpc_tpu.control.mpc import bicycle_spec
    from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
    from ad_mpc_tpu.parallel.batch import BatchedSolver
    from ad_mpc_tpu.parallel.mesh import batch_sharding, make_mesh

    spec = bicycle_spec(t_horizon=0.05 * nodes, n_nodes=nodes,
                        qp_iters=qp_iters)
    p = BicycleParams()
    dyn = lambda x, u, pp: bicycle_dynamics(x, u, p, switch=pp[0])

    rows = []
    for nd in devices:
        if nd > len(jax.devices()):
            continue
        mesh = make_mesh(nd)
        solver = BatchedSolver(spec, dyn, p_dim=1, mesh=mesh,
                               donate_state=False, backend=backend)
        B = per_dev_batch * nd
        N = spec.n_nodes
        rng = np.random.default_rng(0)
        v = rng.uniform(4.0, 10.0, B)
        x0 = np.zeros((B, 7), np.float32)
        x0[:, 3] = v
        t = np.arange(N + 1) * spec.dt
        yx = np.zeros((B, N + 1, 7), np.float32)
        yx[:, :, 0] = v[:, None] * t[None]
        yx[:, :, 3] = v[:, None]
        bsh = batch_sharding(mesh)
        put = lambda a: jax.device_put(jnp.asarray(a, jnp.float32), bsh)
        x0j, yxj = put(x0), put(yx)
        yuj = put(np.zeros((B, N, 2), np.float32))
        pj = put(np.ones((B, 1), np.float32))
        states = solver.init_states(x0j)
        us, xs, states, kkt = solver.step(x0j, yxj, yuj, pj, states)
        jax.block_until_ready(us)
        tic = time.perf_counter()
        for _ in range(ticks):
            us, xs, states, kkt = solver.step(x0j, yxj, yuj, pj, states)
        jax.block_until_ready(us)
        dt = time.perf_counter() - tic
        rows.append({
            "devices": nd, "batch": B,
            "solves_per_s": B * ticks / dt,
            "kkt_mean": float(jnp.mean(kkt)),
        })
    base = rows[0]["solves_per_s"] / rows[0]["devices"]
    for r in rows:
        r["efficiency"] = r["solves_per_s"] / (r["devices"] * base)
    return rows


def measure_shard_invariance(per_dev_batch=16384, nodes=30, qp_iters=12,
                             ticks=10, rounds=3, backend="pallas"):
    """Single-chip shard-invariance measurement (VERDICT r4 weak #7): the
    per-shard program a multi-chip ``shard_map`` fleet would run per
    device, vs the identical unsharded program, at the SAME per-device
    batch, on the CURRENT default accelerator. A ratio ~1 is the
    actionable scaling statement for this batch-parallel workload: each
    solve stays on one device and no collective crosses shards, so
    N-chip throughput = N x per-chip rate, bounded only by the separately
    measured DCN row. (The old virtual-CPU-mesh weak-scaling table carried
    no information: 8 virtual devices time-share 2 physical cores.)

    Runs from ``bench.py`` on the real TPU; results land in
    BENCH_DETAIL.json and are formatted into SCALING.md by :func:`main`.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ad_mpc_tpu.control.mpc import bicycle_spec
    from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
    from ad_mpc_tpu.parallel.batch import BatchedSolver
    from ad_mpc_tpu.parallel.mesh import batch_sharding, make_mesh

    spec = bicycle_spec(t_horizon=0.05 * nodes, n_nodes=nodes,
                        qp_iters=qp_iters)
    p = BicycleParams()
    dyn = lambda x, u, pp: bicycle_dynamics(x, u, p, switch=pp[0])

    B, N = per_dev_batch, spec.n_nodes
    rng = np.random.default_rng(0)
    v = rng.uniform(4.0, 10.0, B)
    x0 = np.zeros((B, 7), np.float32)
    x0[:, 3] = v
    t = np.arange(N + 1) * spec.dt
    yx = np.zeros((B, N + 1, 7), np.float32)
    yx[:, :, 0] = v[:, None] * t[None]
    yx[:, :, 3] = v[:, None]
    yu = np.zeros((B, N, 2), np.float32)
    pv = np.ones((B, 1), np.float32)

    out = {"per_dev_batch": B, "n_nodes": N, "backend": backend}
    for label, mesh in (("plain", None), ("shard_map_1dev", make_mesh(1))):
        solver = BatchedSolver(spec, dyn, p_dim=1, mesh=mesh,
                               donate_state=False, backend=backend)
        if mesh is not None:
            bsh = batch_sharding(mesh)
            put = lambda a: jax.device_put(jnp.asarray(a, jnp.float32), bsh)
        else:
            put = lambda a: jnp.asarray(a, jnp.float32)
        x0j, yxj, yuj, pj = put(x0), put(yx), put(yu), put(pv)
        states = solver.init_states(x0j)
        us, xs, states, kkt = solver.step(x0j, yxj, yuj, pj, states)
        _ = float(jnp.max(kkt))  # compile + full sync
        best = None
        for _ in range(rounds):
            tic = time.perf_counter()
            for _ in range(ticks):
                us, xs, states, kkt = solver.step(x0j, yxj, yuj, pj, states)
            # Fetch-synced window (a value depending on the last tick): on
            # the tunneled runtime block_until_ready is not a reliable
            # barrier; the one in-window fetch RTT is ~10% of the window
            # at this batch and is included (conservative).
            _ = float(jnp.max(kkt))
            dt = time.perf_counter() - tic
            best = dt if best is None else min(best, dt)
        out[label] = {"solves_per_s": round(B * ticks / best, 0),
                      "kkt_max": float(jnp.max(kkt))}
    out["sharded_over_plain"] = round(
        out["shard_map_1dev"]["solves_per_s"] / out["plain"]["solves_per_s"],
        3,
    )
    return out


def main():
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from ad_mpc_tpu.parallel.multihost import launch

    mh_line = launch(procs=2, batch=64, devices_per_proc=4, nodes=8,
                     ticks=5, backend="xla")
    mh_rate = float(mh_line.split("solves_per_s=")[1].split()[0])
    one_proc = measure_cpu_mesh(devices=(8,))[0]
    mh_eff = mh_rate / one_proc["solves_per_s"]

    chip, inv = {}, {}
    detail_path = os.path.join(repo, "BENCH_DETAIL.json")
    if os.path.exists(detail_path):
        with open(detail_path) as f:
            d = json.load(f)
        c2s = [v for k, v in d.get("configs", {}).items()
               if k.startswith("c2_dynamic_bicycle")
               and "_N40_" not in k]  # headline stays the N=30 family
        if c2s:
            cfg = max(c2s, key=lambda r: r["solves_per_s"])
            chip = {"device": d.get("device"), "sha": d.get("git_sha"),
                    "solves_per_s": cfg["solves_per_s"],
                    "batch": cfg["batch"]}
        inv = d.get("shard_invariance", {})

    lines = [
        "# SCALING — solves/s efficiency (BASELINE scaling row)",
        "",
        "Generated by `python -m ad_mpc_tpu.parallel.scaling` (invariance",
        "numbers produced on the real chip by `bench.py`). Real multi-chip",
        "hardware is not reachable here (one tunneled v5-lite chip), so",
        "the scaling claim decomposes into measured pieces: per-chip rate,",
        "shard_map partitioning invariance on the real chip, and the",
        "2-process DCN path.",
        "",
        "## Real TPU, single chip (from BENCH_DETAIL.json)",
        "",
    ]
    if chip:
        lines += [
            f"- `{chip['device']}` @ `{(chip['sha'] or '')[:12]}`: "
            f"**{chip['solves_per_s']:,.0f} solves/s** "
            f"(dynamic bicycle N=30, batch {chip.get('batch', '?')}, "
            "fused Pallas QP+VDE)",
        ]
    else:
        lines += ["- (BENCH_DETAIL.json not present)"]
    lines += [
        "",
        "## Shard invariance on the real chip (the multi-chip claim)",
        "",
    ]
    if inv:
        lines += [
            f"- per-device batch {inv.get('per_dev_batch')}: plain "
            f"{inv['plain']['solves_per_s']:,.0f} solves/s vs the same "
            f"program under `shard_map` on a 1-device mesh "
            f"{inv['shard_map_1dev']['solves_per_s']:,.0f} solves/s "
            f"(ratio {inv.get('sharded_over_plain')})",
            "",
            "The per-shard program a multi-chip fleet runs per device is",
            "rate-identical to the unsharded program at the same",
            "per-device batch, and no collective crosses shards in the",
            "solve — so N-chip throughput is N x the per-chip rate above,",
            "bounded only by the DCN row below.",
        ]
    else:
        lines += ["- (not yet measured — run bench.py)"]
    lines += [
        "",
        "## >=2 hosts (jax.distributed, 2 processes x 4 devices, DCN path)",
        "",
        f"- `{mh_line}`",
        f"- efficiency vs 1-process 8-device mesh (virtual CPU devices): "
        f"{100 * mh_eff:.0f}%",
        "",
        "Batch data parallelism is embarrassingly parallel (each solve",
        "stays on one device; only diagnostic reductions cross hosts), so",
        "on real ICI/DCN the efficiency ceiling is the collective-free",
        "fraction measured here.",
        "",
    ]
    out = os.path.join(repo, "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    for line in lines:
        print(line)


if __name__ == "__main__":
    main()
