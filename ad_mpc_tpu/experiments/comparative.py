"""Comparative model experiment: ideal / nominal / GP / RDRv sweeps.

Capability parity with ``src/experiments/comparative_experiment.py``: a
factory preparing a quad MPC for a given model option, a closed-loop run
returning (rmse, v_max, t_opt), and a sweep over trajectory types x speeds
x models persisting result tensors for comparison plots.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ad_mpc_tpu.control.mpc import QuadMPC, quad_spec
from ad_mpc_tpu.experiments.quad_trajectory_test import run_tracking
from ad_mpc_tpu.learned.ensemble import GPEnsemble, quad_residual_fn
from ad_mpc_tpu.sim.simulator import DisturbanceConfig
from ad_mpc_tpu.utils import io


def prepare_quad_mpc(
    model: str = "nominal",
    ensemble: Optional[GPEnsemble] = None,
    rdrv_d: Optional[np.ndarray] = None,
    **spec_kw,
):
    """Model options (``comparative_experiment.py:32-96``):

    - 'nominal': plain nominal dynamics;
    - 'gp': nominal + GP-ensemble residual;
    - 'rdrv': nominal + linear drag matrix;
    ('ideal' = nominal MPC against an undisturbed plant — a sim choice, not
    a controller choice.)
    """
    spec = quad_spec(**spec_kw)
    if model == "gp":
        assert ensemble is not None
        return QuadMPC(spec=spec, residual_fn=quad_residual_fn(ensemble))
    if model == "rdrv":
        assert rdrv_d is not None
        return QuadMPC(spec=spec, rdrv_d=rdrv_d)
    return QuadMPC(spec=spec)


def comparative_sweep(
    models: dict,
    traj_types=("loop", "lemniscate"),
    speeds=(5.0, 8.0),
    disturbances: DisturbanceConfig = DisturbanceConfig(drag=True),
    seed: int = 0,
    save_name: Optional[str] = None,
    verbose: bool = False,
):
    """models: dict name -> dict(residual_fn=..., rdrv_d=...) kwargs for
    run_tracking. Returns (rmse, t_opt, v_max) tensors of shape
    (n_models, n_traj, n_speeds)."""
    names = list(models)
    shape = (len(names), len(traj_types), len(speeds))
    rmse = np.zeros(shape)
    t_opt = np.zeros(shape)
    v_max = np.zeros(shape)

    for i, name in enumerate(names):
        kw = models[name]
        for j, traj in enumerate(traj_types):
            for k, v in enumerate(speeds):
                dist = (
                    DisturbanceConfig()
                    if name == "ideal"
                    else disturbances
                )
                res = run_tracking(
                    traj_type=traj, v_max=v, disturbances=dist,
                    seed=seed, **{k2: v2 for k2, v2 in kw.items()},
                )
                rmse[i, j, k] = res.rmse
                t_opt[i, j, k] = res.mean_opt_ms
                v_max[i, j, k] = res.v_max
                if verbose:
                    print(f"{name:8s} {traj:11s} v={v:4.1f}: "
                          f"rmse={res.rmse:.4f} t={res.mean_opt_ms:.2f}ms")

    if save_name:
        d = os.path.join(io.RESULTS_ROOT, "experiments", save_name)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "mse.npy"), rmse**2)
        np.save(os.path.join(d, "t_opt.npy"), t_opt)
        np.save(os.path.join(d, "mean_v.npy"), v_max)
        with open(os.path.join(d, "models.txt"), "w") as f:
            f.write("\n".join(names))
        # Persistent cross-run registry (the reference's metadata.json
        # accumulation, gp_mpc_node.py:556-599): sweeps stay comparable
        # across sessions/rounds.
        from ad_mpc_tpu.utils.live_viz import ExperimentRegistry

        reg = ExperimentRegistry(
            os.path.join(io.RESULTS_ROOT, "experiments", "metadata.json")
        )
        for i, name in enumerate(names):
            for j, traj in enumerate(traj_types):
                for k, v in enumerate(speeds):
                    reg.record(traj, name, v, rmse[i, j, k], t_opt[i, j, k])
    return rmse, t_opt, v_max


if __name__ == "__main__":
    from ad_mpc_tpu.utils.platform import force_cpu

    force_cpu()
    out = comparative_sweep(
        {"ideal": {}, "nominal": {}},
        traj_types=("loop",),
        speeds=(8.0,),
        verbose=True,
        save_name="comparative_demo",
    )
