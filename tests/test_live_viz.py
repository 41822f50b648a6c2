"""Live visualization artists + persistent experiment registry."""

import json
import os

import numpy as np

from ad_mpc_tpu.utils.live_viz import (
    ExperimentRegistry,
    LiveQuadPlotter,
    LiveVehiclePlotter,
)


def test_quad_plotter_frames_and_snapshot(tmp_path):
    p = LiveQuadPlotter(interactive=False)
    traj = np.zeros((50, 3))
    traj[:, 0] = np.linspace(0, 2, 50)
    traj[:, 2] = 1.0
    p.set_reference(traj)
    for k in range(5):
        x = np.zeros(13)
        x[0] = 0.04 * k
        x[2] = 1.0
        x[3] = 1.0
        pred = np.zeros((10, 13))
        pred[:, 0] = x[0] + np.linspace(0, 0.5, 10)
        pred[:, 2] = 1.0
        p.update(x, pred_xs=pred)
    out = p.snapshot(str(tmp_path / "frame.png"))
    assert os.path.getsize(out) > 1000
    # Artists hold the latest data (persistent, not re-created).
    assert len(p._trail) == 5
    p.close()


def test_vehicle_plotter_frames(tmp_path):
    track = np.stack([np.linspace(0, 50, 100), np.zeros(100)], axis=1)
    p = LiveVehiclePlotter(track_xy=track, interactive=False)
    for k in range(4):
        x = np.zeros(7)
        x[0] = 2.0 * k
        x[3] = 8.0
        p.update(x)
    out = p.snapshot(str(tmp_path / "veh.png"))
    assert os.path.getsize(out) > 1000
    p.close()


def test_registry_accumulates_across_runs(tmp_path):
    path = str(tmp_path / "metadata.json")
    r1 = ExperimentRegistry(path)
    r1.record("loop", "nominal", 8.0, rmse=0.20, t_opt_ms=2.0)
    r1.record("loop", "nominal", 8.0, rmse=0.30, t_opt_ms=4.0)
    r1.record("loop", "gp", 8.0, rmse=0.10, t_opt_ms=3.0)

    # A NEW process (fresh registry object) sees the accumulated means.
    r2 = ExperimentRegistry(path)
    e = r2.lookup("loop", "nominal", 8.0)
    assert e["n_runs"] == 2
    assert abs(e["rmse"] - 0.25) < 1e-12
    assert abs(e["t_opt_ms"] - 3.0) < 1e-12

    table = r2.table("loop")
    assert "nominal" in table and "gp" in table and "v=8" in table

    with open(path) as f:
        raw = json.load(f)
    assert raw["loop"]["gp"]["8"]["n_runs"] == 1
