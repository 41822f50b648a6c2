"""Comparative model-sweep experiment (SURVEY.md §2.4, reference
``src/experiments/comparative_experiment.py``): tiny end-to-end sweep —
models x trajectories x speeds closed loop, .npy result tensors, and the
persistent cross-run registry (the reference's metadata.json accumulation,
``nodes/gp_mpc_node.py:556-599``)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_comparative_sweep_tiny(tmp_path, monkeypatch):
    from ad_mpc_tpu.experiments import comparative
    from ad_mpc_tpu.utils import io

    monkeypatch.setattr(io, "RESULTS_ROOT", str(tmp_path))

    rmse, t_opt, v_max = comparative.comparative_sweep(
        {"ideal": {"max_steps": 30}, "nominal": {"max_steps": 30}},
        traj_types=("loop",),
        speeds=(6.0,),
        save_name="tiny",
    )
    assert rmse.shape == (2, 1, 1)
    assert np.isfinite(rmse).all() and np.isfinite(t_opt).all()
    # 'ideal' runs without disturbances -> at least as good as 'nominal'.
    assert rmse[0, 0, 0] <= rmse[1, 0, 0] + 1e-6

    d = tmp_path / "experiments" / "tiny"
    assert (d / "mse.npy").exists()
    assert (d / "t_opt.npy").exists()
    assert (d / "mean_v.npy").exists()
    assert (d / "models.txt").read_text().splitlines() == ["ideal", "nominal"]

    meta = tmp_path / "experiments" / "metadata.json"
    assert meta.exists()
    reg = json.loads(meta.read_text())
    assert reg  # at least one (traj, model, speed) record persisted
