"""Visualization, animator, metrics, and solver-checkpoint tests
(SURVEY.md §5 auxiliary subsystems)."""

import os

import numpy as np
import pytest

from ad_mpc_tpu.utils.metrics import LatencyTracker, ThroughputTracker
from ad_mpc_tpu.utils.visualization import (
    covariance_ellipses,
    gp_inference_plot,
    mse_tracking_experiment_plot,
    trajectory_tracking_results,
)


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    import matplotlib.pyplot as plt

    plt.close("all")


def test_tracking_plot_writes_file(tmp_path):
    t = np.linspace(0, 2, 50)
    x = np.zeros((50, 13))
    x[:, 0] = t
    ref = x.copy()
    ref[:, 1] = 0.1
    out = str(tmp_path / "track.png")
    trajectory_tracking_results(t, x, ref, save_path=out)
    assert os.path.getsize(out) > 0


def test_mse_grid_plot(tmp_path):
    mse = np.random.default_rng(0).uniform(0.05, 0.3, (2, 3, 2))
    out = str(tmp_path / "mse.png")
    mse_tracking_experiment_plot(
        [4, 6, 8], mse, ["nominal", "gp"], ["loop", "lemniscate"],
        t_opt=[0.001], save_path=out,
    )
    assert os.path.getsize(out) > 0


def test_gp_inference_plot(tmp_path):
    rng = np.random.default_rng(0)
    z = rng.normal(size=(40, 3))
    y = z[:, :1] * 0.5 + rng.normal(0, 0.05, (40, 1))
    mu = z[:, :1] * 0.5
    var = np.full((40, 1), 0.01)
    out = str(tmp_path / "gp.png")
    gp_inference_plot(z, y, mu, var=var, save_path=out)
    assert os.path.getsize(out) > 0


def test_covariance_ellipses(tmp_path):
    xs = np.cumsum(np.ones((10, 7)) * 0.1, axis=0)
    Ps = np.tile(0.01 * np.eye(7)[None], (10, 1, 1))
    out = str(tmp_path / "cov.png")
    covariance_ellipses(xs, Ps, save_path=out)
    assert os.path.getsize(out) > 0


def test_animator_saves_gif(tmp_path):
    from ad_mpc_tpu.utils.animator import Dynamic3DTrajectory

    x = np.zeros((40, 13))
    x[:, 0] = np.linspace(0, 1, 40)
    x[:, 2] = 1.0
    out = str(tmp_path / "replay.gif")
    Dynamic3DTrajectory(x, x, speedup=8).save(out, fps=10)
    assert os.path.getsize(out) > 0


def test_latency_tracker_percentiles():
    lt = LatencyTracker("solve", budget_ms=20.0)
    for v in [1, 2, 3, 100]:
        lt.add(v * 1e-3)
    s = lt.stats()
    assert s["count"] == 4
    assert s["p50_ms"] == pytest.approx(2.5)
    assert s["overruns"] == 1
    with lt.measure():
        pass
    assert len(lt) == 5


def test_throughput_tracker():
    tp = ThroughputTracker()
    with tp.window(100):
        pass
    assert tp.rate() > 0


def test_solver_iterate_roundtrip(tmp_path):
    import jax.numpy as jnp

    from ad_mpc_tpu.ocp.solver import SolverState, load_iterate, save_iterate

    st = SolverState(xs=jnp.ones((5, 7)), us=jnp.zeros((4, 2)))
    p = str(tmp_path / "iter.npz")
    save_iterate(p, st)
    st2 = load_iterate(p)
    np.testing.assert_allclose(np.asarray(st2.xs), np.asarray(st.xs))
    np.testing.assert_allclose(np.asarray(st2.us), np.asarray(st.us))
