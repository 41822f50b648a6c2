"""Result visualization: tracking plots, experiment grids, GP inference.

Capability parity with the reference's visualization module
(``ros_gp_mpc/src/utils/visualization.py:31-650``): trajectory-tracking
result plots, MSE-vs-speed experiment grids, GP posterior plots with
+-3 sigma bands, and covariance ellipses — all headless (Agg backend),
returning the figure and optionally saving to disk.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def trajectory_tracking_results(
    t, x_executed, x_ref, t_ref=None, title: str = "", save_path=None
):
    """3D path + per-axis position error over time
    (``visualization.py:trajectory_tracking_results``)."""
    plt = _plt()
    t = np.asarray(t)
    x_executed = np.asarray(x_executed)
    x_ref = np.asarray(x_ref)
    t_ref = t if t_ref is None else np.asarray(t_ref)

    fig = plt.figure(figsize=(10, 4))
    ax3d = fig.add_subplot(1, 2, 1, projection="3d")
    ax3d.plot(*x_executed[:, :3].T, label="executed")
    ax3d.plot(*x_ref[:, :3].T, "--", label="reference")
    ax3d.legend()
    ax3d.set_title(title or "tracking")

    ax = fig.add_subplot(1, 2, 2)
    ref_i = np.stack(
        [np.interp(t, t_ref, x_ref[:, k]) for k in range(3)], axis=1
    )
    err = x_executed[:, :3] - ref_i
    for k, lab in enumerate("xyz"):
        ax.plot(t, err[:, k], label=f"e_{lab}")
    ax.plot(t, np.linalg.norm(err, axis=1), "k", label="|e|")
    ax.set_xlabel("t [s]")
    ax.set_ylabel("position error [m]")
    ax.legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=110)
    return fig


def mse_tracking_experiment_plot(
    v_list, mse, model_names, traj_names, t_opt=None, save_path=None
):
    """Grid of tracking-error-vs-speed curves per trajectory type and model
    (``visualization.py:mse_tracking_experiment_plot``).

    :param mse: (n_traj, n_speeds, n_models) array.
    """
    plt = _plt()
    mse = np.asarray(mse)
    n_traj = mse.shape[0]
    fig, axes = plt.subplots(
        1, n_traj, figsize=(4 * n_traj, 3.2), squeeze=False
    )
    for i in range(n_traj):
        ax = axes[0, i]
        for m, name in enumerate(model_names):
            ax.plot(v_list, mse[i, :, m], marker="o", label=name)
        ax.set_title(traj_names[i])
        ax.set_xlabel("max speed [m/s]")
        ax.set_ylabel("RMSE [m]")
        ax.legend()
    if t_opt is not None:
        fig.suptitle(f"mean opt time: {np.mean(t_opt) * 1e3:.2f} ms")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=110)
    return fig


def gp_inference_plot(
    z_test, y_test, mu, var=None, dim_names=None, save_path=None
):
    """Held-out residual predictions: nominal error (the raw target) vs the
    GP posterior with +-3 sigma bands (``gp_visualization.py:74-152``).

    :param z_test: (m, d) features; plotted against the first feature dim.
    :param y_test: (m, k) targets; mu (m, k); var (m, k) optional.
    """
    plt = _plt()
    z_test, y_test, mu = map(np.asarray, (z_test, y_test, mu))
    if y_test.ndim == 1:
        y_test, mu = y_test[:, None], mu[:, None]
    k = y_test.shape[1]
    order = np.argsort(z_test[:, 0])
    fig, axes = plt.subplots(1, k, figsize=(4 * k, 3.2), squeeze=False)
    for j in range(k):
        ax = axes[0, j]
        ax.plot(z_test[order, 0], y_test[order, j], ".", ms=3,
                alpha=0.5, label="residual")
        ax.plot(z_test[order, 0], mu[order, j], "r-", label="GP mean")
        if var is not None:
            s = 3.0 * np.sqrt(np.asarray(var)[order, j])
            ax.fill_between(
                z_test[order, 0], mu[order, j] - s, mu[order, j] + s,
                color="r", alpha=0.2, label="+-3 sigma",
            )
        name = dim_names[j] if dim_names else f"dim {j}"
        ax.set_title(name)
        ax.legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=110)
    return fig


def covariance_ellipses(xs, Ps, idx=(0, 1), n_std: float = 3.0, ax=None,
                        save_path=None):
    """Overlay n-std covariance ellipses of a propagated state distribution
    on the mean path (``visualization.py`` covariance-ellipsoid capability,
    fed by :func:`ad_mpc_tpu.ocp.propagation.forward_prop`)."""
    plt = _plt()
    from matplotlib.patches import Ellipse

    xs, Ps = np.asarray(xs), np.asarray(Ps)
    i, j = idx
    if ax is None:
        fig, ax = plt.subplots(figsize=(5, 4))
    else:
        fig = ax.figure
    ax.plot(xs[:, i], xs[:, j], "b.-", ms=3, label="mean")
    for k in range(len(xs)):
        P = Ps[k][np.ix_([i, j], [i, j])]
        w, V = np.linalg.eigh(P)
        w = np.maximum(w, 0.0)
        ang = np.degrees(np.arctan2(V[1, 1], V[0, 1]))
        e = Ellipse(
            (xs[k, i], xs[k, j]),
            2 * n_std * np.sqrt(w[1]), 2 * n_std * np.sqrt(w[0]),
            angle=ang, fc="none", ec="r", alpha=0.6,
        )
        ax.add_patch(e)
    ax.legend()
    ax.set_aspect("equal", adjustable="datalim")
    if save_path:
        fig.savefig(save_path, dpi=110)
    return fig
