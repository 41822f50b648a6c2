"""Offline AD closed-loop experiment: bicycle MPC tracking a track.

The AD analogue of the reference's smoke test
(``src/experiments/trajectory_test.py``, README-documented oracle: mean opt
time + tracking RMSE printout): the JAX bicycle plant replaces CARLA, the
Frenet reference pipeline replaces ``/local_traj``, and the SQP-RTI solver
replaces ACADOS. Run as a module for the human-readable report.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import BicycleMPC, bicycle_spec
from ad_mpc_tpu.control.reference import PathReference, resample_vel
from ad_mpc_tpu.sim.simulator import BicycleSim, DisturbanceConfig


def oval_track(n_points: int = 600, r: float = 30.0, straight: float = 60.0):
    """Oval track waypoints (two straights + two half-circles)."""
    seg = n_points // 4
    # Bottom straight: (0,0) -> (straight, 0), heading 0.
    xs1 = np.linspace(0, straight, seg, endpoint=False)
    ys1 = np.zeros(seg)
    ps1 = np.zeros(seg)
    # Right half-circle up.
    th = np.linspace(-np.pi / 2, np.pi / 2, seg, endpoint=False)
    xs2 = straight + r * np.cos(th)
    ys2 = r + r * np.sin(th)
    ps2 = th + np.pi / 2
    # Top straight: back.
    xs3 = np.linspace(straight, 0, seg, endpoint=False)
    ys3 = np.full(seg, 2 * r)
    ps3 = np.full(seg, np.pi)
    # Left half-circle down.
    th4 = np.linspace(np.pi / 2, 3 * np.pi / 2, seg, endpoint=False)
    xs4 = r * np.cos(th4)
    ys4 = r + r * np.sin(th4)
    ps4 = th4 + np.pi / 2
    x = np.concatenate([xs1, xs2, xs3, xs4])
    y = np.concatenate([ys1, ys2, ys3, ys4])
    psi = np.unwrap(np.concatenate([ps1, ps2, ps3, ps4]))
    psi = (psi + np.pi) % (2 * np.pi) - np.pi
    return x, y, psi


@dataclass
class ClosedLoopResult:
    rmse_pos: float
    mean_opt_ms: float
    p50_opt_ms: float
    p99_opt_ms: float
    v_mean: float
    n_steps: int
    states: np.ndarray
    refs: np.ndarray


def run_closed_loop(
    v_target: float = 8.0,
    sim_time: float = 20.0,
    n_nodes: int = 40,
    t_horizon: float = 2.0,
    disturbances: DisturbanceConfig = DisturbanceConfig(),
    seed: int = 0,
    qp_iters: int = 18,
    verbose: bool = False,
) -> ClosedLoopResult:
    spec = bicycle_spec(t_horizon=t_horizon, n_nodes=n_nodes, qp_iters=qp_iters)
    mpc = BicycleMPC(spec=spec)
    sim = BicycleSim(disturbances=disturbances)
    dt = spec.dt

    tx, ty, tpsi = oval_track()
    ref_gen = PathReference(traj_horizon=n_nodes + 1, traj_dt=dt)

    x = jnp.array([0.0, 0.0, 0.0, v_target * 0.5, 0.0, 0.0, 0.0])
    key = jax.random.PRNGKey(seed)

    n_steps = int(sim_time / dt)
    states, refs, t_solve = [], [], []

    # Local-trajectory emulation: like CARLA's /local_traj, feed the
    # controller a forward window of the global track each tick.
    M = len(tx)
    for step in range(n_steps):
        xi = np.asarray(x)
        # window of the track ahead of the closest point
        d2 = (tx - xi[0]) ** 2 + (ty - xi[1]) ** 2
        ci = int(np.argmin(d2))
        idx = (ci + np.arange(0, 200)) % M
        ref_gen.set_traj(tx[idx], ty[idx], tpsi[idx],
                         np.full(len(idx), v_target))
        wp = ref_gen.get_waypoints(xi[0], xi[1], xi[2])
        v_ref = resample_vel(wp.v_ref, xi[3], dt,
                             acc_max=3.0, dec_max=5.0)

        x_ref = np.zeros((n_nodes + 1, 7))
        x_ref[:, 0] = np.asarray(wp.x_ref)
        x_ref[:, 1] = np.asarray(wp.y_ref)
        x_ref[:, 2] = np.asarray(wp.psi_ref)
        x_ref[:, 3] = np.asarray(v_ref)
        mpc.set_reference(x_ref)

        tic = time.perf_counter()
        us, xs, ok = mpc.optimize(x)
        us = jax.block_until_ready(us)
        t_solve.append(time.perf_counter() - tic)

        u0 = us[0]
        x, key = sim.step(x, u0, key, dt)
        states.append(np.asarray(x))
        refs.append(x_ref[0])
        if verbose and step % 40 == 0:
            print(
                f"t={step*dt:5.1f}s pos=({float(x[0]):7.2f},{float(x[1]):7.2f}) "
                f"v={float(x[3]):5.2f} err={np.linalg.norm(np.asarray(x[:2])-x_ref[1,:2]):.3f}"
            )

    states = np.stack(states)
    refs = np.stack(refs)
    # Tracking error vs the track polyline (distance to nearest track point).
    d = np.sqrt(
        (states[:, None, 0] - tx[None, :]) ** 2
        + (states[:, None, 1] - ty[None, :]) ** 2
    ).min(axis=1)
    rmse = float(np.sqrt(np.mean(d**2)))
    t_ms = 1e3 * np.asarray(t_solve[2:])  # drop compile steps
    return ClosedLoopResult(
        rmse_pos=rmse,
        mean_opt_ms=float(t_ms.mean()),
        p50_opt_ms=float(np.percentile(t_ms, 50)),
        p99_opt_ms=float(np.percentile(t_ms, 99)),
        v_mean=float(states[:, 3].mean()),
        n_steps=n_steps,
        states=states,
        refs=refs,
    )


def main():
    import argparse

    from ad_mpc_tpu.utils.platform import add_platform_arg, apply_platform_arg

    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=float, default=8.0)
    ap.add_argument("--time", type=float, default=20.0)
    ap.add_argument("--nodes", type=int, default=40)
    ap.add_argument("--noisy", action="store_true")
    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform_arg(args)

    res = run_closed_loop(
        v_target=args.v,
        sim_time=args.time,
        n_nodes=args.nodes,
        disturbances=DisturbanceConfig(noisy=args.noisy),
        verbose=True,
    )
    print(
        f":::::::::::::: AD CLOSED LOOP ::::::::::::::\n"
        f"n_steps={res.n_steps}  v_mean={res.v_mean:.2f} m/s\n"
        f"tracking RMSE (vs track): {res.rmse_pos:.4f} m\n"
        f"opt time mean={res.mean_opt_ms:.3f} ms  "
        f"p50={res.p50_opt_ms:.3f}  p99={res.p99_opt_ms:.3f}"
    )


if __name__ == "__main__":
    main()
