"""Offline quadrotor tracking simulation — the reference smoke test.

Mirrors ``src/experiments/trajectory_test.py`` (README oracle: mean opt time
~1.5 ms, RMSE ~0.24 m at loop @8 m/s with disturbances): generate a
loop/lemniscate reference via differential flatness, track it closed-loop
with the SQP-RTI MPC against the disturbance-suite simulator, report RMSE +
opt time.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import QuadMPC, quad_spec
from ad_mpc_tpu.models.quadrotor import hover_input
from ad_mpc_tpu.sim.simulator import DisturbanceConfig, QuadrotorSim
from ad_mpc_tpu.trajectories import (
    lemniscate_trajectory,
    loop_trajectory,
    random_trajectory,
)
from ad_mpc_tpu.utils.math import interpol_mse


def get_reference_chunk(traj, u_traj, t_ref, t_now, n_nodes, dt_node):
    """Window + downsample the dense reference onto the MPC horizon
    (``utils/quad_3d_opt_utils.py:267-296`` capability)."""
    i0 = int(np.searchsorted(t_ref, t_now))
    ref_dt = t_ref[1] - t_ref[0]
    stride = max(int(round(dt_node / ref_dt)), 1)
    idx = i0 + stride * np.arange(n_nodes + 1)
    idx = np.clip(idx, 0, len(t_ref) - 1)
    return traj[idx], u_traj[np.clip(idx[:-1], 0, len(u_traj) - 1)]


@dataclass
class QuadTrackingResult:
    rmse: float
    mean_opt_ms: float
    v_max: float
    n_steps: int


def run_tracking(
    traj_type: str = "loop",
    v_max: float = 8.0,
    disturbances: DisturbanceConfig = DisturbanceConfig(
        noisy=True, drag=True, payload=False, motor_noise=True
    ),
    n_nodes: int = 10,
    t_horizon: float = 1.0,
    control_period: float = 0.02,
    sim_dt: float = 5e-4,
    seed: int = 0,
    residual_fn=None,
    rdrv_d=None,
    ensemble=None,
    qp_iters: int = 15,
    max_steps: int | None = None,
    verbose: bool = False,
) -> QuadTrackingResult:
    """``ensemble``: a fitted :class:`~ad_mpc_tpu.learned.ensemble.GPEnsemble`
    deployed through the full QuadMPC GP mode (per-solve midpoint cluster
    selection + node-0 trigger, ``quad_3d_optimizer.py:289-327``);
    ``residual_fn`` is the simpler fixed-closure path."""
    if traj_type == "loop":
        traj, t_ref, u_traj = loop_trajectory(v_max=v_max, radius=5.0)
    elif traj_type == "lemniscate":
        traj, t_ref, u_traj = lemniscate_trajectory(v_max=v_max, radius=5.0)
    elif traj_type == "random":
        # Reference sweep's third family (reference_publisher_node.py:23-167
        # modes, comparative_experiment.py:263-311): random min-snap flight;
        # v_max maps to the average-speed time allocation.
        traj, t_ref, u_traj = random_trajectory(seed=seed, speed=v_max)
    else:
        raise ValueError(traj_type)

    spec = quad_spec(n_nodes=n_nodes, t_horizon=t_horizon, qp_iters=qp_iters)
    mpc = QuadMPC(spec=spec, residual_fn=residual_fn, rdrv_d=rdrv_d,
                  ensemble=ensemble, dtype=jnp.float32)
    sim = QuadrotorSim(disturbances=disturbances, sim_dt=sim_dt)

    x = jnp.asarray(traj[0])
    key = jax.random.PRNGKey(seed)

    n_steps = int(t_ref[-1] / control_period)
    if max_steps is not None:
        n_steps = min(n_steps, max_steps)
    states, times, t_solve = [], [], []
    u_hover = hover_input()

    for step in range(n_steps):
        t_now = step * control_period
        x_ref, u_ref = get_reference_chunk(
            traj, u_traj, t_ref, t_now, n_nodes, spec.dt
        )
        mpc.set_reference(x_ref, u_ref)

        tic = time.perf_counter()
        us, xs = mpc.optimize(x)
        us = jax.block_until_ready(us)
        t_solve.append(time.perf_counter() - tic)

        x, key = sim.step(x, us[0], key, control_period)
        states.append(np.asarray(x))
        times.append(t_now + control_period)
        if verbose and step % 100 == 0:
            err = np.linalg.norm(np.asarray(x[:3]) - x_ref[1, :3])
            print(f"t={t_now:5.2f}s err={err:.3f} v={np.linalg.norm(np.asarray(x[7:10])):.2f}")

    states = np.stack(states)
    times = np.asarray(times)
    rmse = float(
        interpol_mse(times, states[:, :3], t_ref, traj[:, :3])
    )
    t_ms = 1e3 * np.asarray(t_solve[2:])
    return QuadTrackingResult(
        rmse=rmse,
        mean_opt_ms=float(t_ms.mean()),
        v_max=float(np.max(np.linalg.norm(states[:, 7:10], axis=1))),
        n_steps=n_steps,
    )


def main():
    import argparse

    from ad_mpc_tpu.utils.platform import add_platform_arg, apply_platform_arg

    ap = argparse.ArgumentParser()
    ap.add_argument("--traj", default="loop",
                    choices=["loop", "lemniscate", "random"])
    ap.add_argument("--v", type=float, default=8.0)
    ap.add_argument("--no-dist", action="store_true")
    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform_arg(args)

    dist = (
        DisturbanceConfig()
        if args.no_dist
        else DisturbanceConfig(noisy=True, drag=True, motor_noise=True)
    )
    res = run_tracking(traj_type=args.traj, v_max=args.v,
                       disturbances=dist, verbose=True)
    print(
        f":::::::::::::: QUAD TRACKING ({args.traj} @ {args.v} m/s) ::::::::::::::\n"
        f"n_steps={res.n_steps}  v_max={res.v_max:.2f} m/s\n"
        f"tracking RMSE: {res.rmse:.4f} m   (reference oracle: ~0.24 m)\n"
        f"opt time mean={res.mean_opt_ms:.3f} ms"
    )


if __name__ == "__main__":
    main()
