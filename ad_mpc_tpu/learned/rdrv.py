"""RDRv linear drag-model fitting (Faessler et al.).

Capability parity with ``rdrv_fitting.py:27-136``: per-axis linear
regression (no intercept) of the body-frame acceleration error against the
body-frame velocity yields a diagonal 3x3 drag matrix D, consumed by the
quadrotor dynamics as ``v_dot += R(q) D R(q)^T v``
(``quad_3d_optimizer.py:376-381``).
"""

from __future__ import annotations

import numpy as np

from ad_mpc_tpu.learned.dataset import ResidualDataset


def fit_rdrv(dataset: ResidualDataset, vel_idx=(7, 8, 9)) -> np.ndarray:
    """Returns the (3,3) diagonal drag matrix D."""
    v = dataset.x_in[:, list(vel_idx)]  # body-frame velocities
    a_err = dataset.y[:, list(vel_idx)]  # body-frame accel residuals
    d = np.zeros(3)
    for i in range(3):
        denom = float(v[:, i] @ v[:, i])
        d[i] = float(v[:, i] @ a_err[:, i]) / denom if denom > 0 else 0.0
    return np.diag(d)
