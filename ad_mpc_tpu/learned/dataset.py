"""Residual-dataset pipeline for model learning.

Capability parity with ``GPDataset`` (``ros_gp_mpc/src/model_fitting/
gp_common.py:29-342``): regression targets ``y = (x_out - x_pred)/dt`` (the
per-second nominal-model error), world->body velocity rotation, pruning by
velocity cap + per-dim error histograms (``utils.py:458-533``), GMM
clustering with cluster caching, and train/test splitting.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ad_mpc_tpu.utils.math import quaternion_inverse, v_dot_q


def world_to_body_velocities(states):
    """Rotate the velocity block of (m,13) quad states into the body frame
    (``gp_common.py`` ``world_to_body_velocity_mapping``)."""
    states = np.asarray(states)
    out = states.copy()
    for i in range(len(states)):
        out[i, 7:10] = np.asarray(
            v_dot_q(states[i, 7:10], quaternion_inverse(states[i, 3:7]))
        )
    return out


@dataclass
class ResidualDataset:
    """Recorded (state_in, input, state_out, nominal x_pred, dt) tuples and
    the derived regression problem."""

    x_in: np.ndarray  # (m, nx) states (body-frame velocities)
    u: np.ndarray  # (m, nu)
    y: np.ndarray  # (m, nx) per-second nominal-model error, body frame
    cluster_labels: np.ndarray | None = None
    _gmm: object = field(default=None, repr=False)

    @staticmethod
    def from_rollouts(x_in, u, x_out, x_pred, dt, rotate_body: bool = True):
        """y = (x_out - x_pred) / dt (``gp_common.py:68-99``); drops dt==0
        rows; velocities rotated to body frame."""
        x_in, u, x_out, x_pred = map(np.asarray, (x_in, u, x_out, x_pred))
        dt = np.asarray(dt).reshape(-1)
        keep = dt > 0
        x_in, u, x_out, x_pred, dt = (
            x_in[keep], u[keep], x_out[keep], x_pred[keep], dt[keep],
        )
        if rotate_body and x_in.shape[1] == 13:
            x_in_b = world_to_body_velocities(x_in)
            x_out_b = world_to_body_velocities(x_out)
            x_pred_b = world_to_body_velocities(x_pred)
        else:
            x_in_b, x_out_b, x_pred_b = x_in, x_out, x_pred
        y = (x_out_b - x_pred_b) / dt[:, None]
        return ResidualDataset(x_in=x_in_b, u=u, y=y)

    def features(self, feat_idx):
        return self.x_in[:, list(feat_idx)]

    def targets(self, dim):
        return self.y[:, dim]

    def prune(self, vel_cap: float = 20.0, hist_bins: int = 10,
              hist_thresh: float = 1e-3, vel_idx=(7, 8, 9)):
        """Velocity cap + histogram pruning (``gp_common.py:101-112``,
        ``utils.py:458-533``): drop samples in sparsely-populated error-norm
        histogram bins (spurious residual outliers)."""
        keep = np.all(np.abs(self.x_in[:, list(vel_idx)]) <= vel_cap, axis=1)

        err_norm = np.linalg.norm(self.y[:, list(vel_idx)], axis=1)
        counts, edges = np.histogram(err_norm, bins=hist_bins)
        frac = counts / max(counts.sum(), 1)
        bin_idx = np.clip(
            np.digitize(err_norm, edges[:-1]) - 1, 0, hist_bins - 1
        )
        keep &= frac[bin_idx] >= hist_thresh
        return ResidualDataset(
            x_in=self.x_in[keep], u=self.u[keep], y=self.y[keep]
        )

    def cluster(self, n_clusters: int, feat_idx=(7, 8, 9), seed: int = 0):
        """GMM clustering in feature space (``gp_common.py:224-271``)."""
        from sklearn.mixture import GaussianMixture

        z = self.features(feat_idx)
        gmm = GaussianMixture(
            n_components=n_clusters, random_state=seed, n_init=3
        ).fit(z)
        self._gmm = gmm
        self.cluster_labels = gmm.predict(z)
        return self.cluster_labels

    def cluster_subsets(self, feat_idx=(7, 8, 9)):
        """Yield (features, ResidualDataset-view) per cluster."""
        assert self.cluster_labels is not None, "call cluster() first"
        for c in range(self.cluster_labels.max() + 1):
            m = self.cluster_labels == c
            yield c, ResidualDataset(
                x_in=self.x_in[m], u=self.u[m], y=self.y[m]
            )

    def split(self, test_frac: float = 0.2, seed: int = 0):
        rng = np.random.default_rng(seed)
        m = len(self.x_in)
        perm = rng.permutation(m)
        n_test = int(m * test_frac)
        te, tr = perm[:n_test], perm[n_test:]
        return (
            ResidualDataset(self.x_in[tr], self.u[tr], self.y[tr]),
            ResidualDataset(self.x_in[te], self.u[te], self.y[te]),
        )


def select_training_points(z, y, n_points: int, method: str = "kmeans",
                           seed: int = 0):
    """Training-point subselection (``utils.py:536-743`` capability):

    - 'kmeans': cluster features and take the sample closest to each center
      (distance-maximizing coverage);
    - 'random_inverse_density': inverse-histogram-density sampling favoring
      rare regions.
    """
    z = np.asarray(z)
    y = np.asarray(y)
    m = len(z)
    if n_points >= m:
        return np.arange(m)
    if method == "kmeans":
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=n_points, random_state=seed, n_init=4).fit(z)
        idx = []
        for c in range(n_points):
            members = np.flatnonzero(km.labels_ == c)
            if len(members) == 0:
                continue
            d = np.linalg.norm(z[members] - km.cluster_centers_[c], axis=1)
            idx.append(members[np.argmin(d)])
        return np.unique(idx)
    elif method == "random_inverse_density":
        rng = np.random.default_rng(seed)
        norm = np.linalg.norm(z, axis=1)
        counts, edges = np.histogram(norm, bins=20)
        bin_idx = np.clip(np.digitize(norm, edges[:-1]) - 1, 0, 19)
        w = 1.0 / np.maximum(counts[bin_idx], 1)
        w = w / w.sum()
        return rng.choice(m, size=n_points, replace=False, p=w)
    raise ValueError(method)
