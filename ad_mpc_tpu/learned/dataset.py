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
        ``utils.py:458-533``): drop samples whose error falls in
        sparsely-populated histogram bins (spurious residual outliers) —
        both PER OUTPUT DIMENSION and on the error norm, matching the
        reference's two-stage filter."""
        # Non-finite rows (diverged recording flights) are unconditionally
        # dropped FIRST — they would poison every histogram below.
        finite = np.all(np.isfinite(self.x_in), axis=1) & np.all(
            np.isfinite(self.y), axis=1
        )
        x_in, u, y = self.x_in[finite], self.u[finite], self.y[finite]
        keep = np.all(np.abs(x_in[:, list(vel_idx)]) <= vel_cap, axis=1)

        def hist_keep(values):
            counts, edges = np.histogram(values, bins=hist_bins)
            frac = counts / max(counts.sum(), 1)
            bin_idx = np.clip(
                np.digitize(values, edges[:-1]) - 1, 0, hist_bins - 1
            )
            return frac[bin_idx] >= hist_thresh

        # Per-dimension error histograms (utils.py:497-503).
        for d in vel_idx:
            keep &= hist_keep(y[:, d])
        # Error-norm histogram (utils.py:505-517).
        keep &= hist_keep(np.linalg.norm(y[:, list(vel_idx)], axis=1))
        return ResidualDataset(x_in=x_in[keep], u=u[keep], y=y[keep])

    def cluster(self, n_clusters: int, feat_idx=(7, 8, 9), seed: int = 0,
                cache_path: str | None = None):
        """GMM clustering in feature space (``gp_common.py:224-271``).

        ``cache_path``: optional gmm pickle path — loaded when it exists
        with a matching component count, written otherwise (the reference's
        ``gmm.pkl`` cache)."""
        import os

        from sklearn.mixture import GaussianMixture

        z = self.features(feat_idx)
        gmm = None
        if cache_path is not None and os.path.exists(cache_path):
            import joblib

            cached = joblib.load(cache_path)
            if getattr(cached, "n_components", None) == n_clusters:
                gmm = cached
        if gmm is None:
            gmm = GaussianMixture(
                n_components=n_clusters, random_state=seed, n_init=3
            ).fit(z)
            if cache_path is not None and n_clusters > 1:
                import joblib

                os.makedirs(os.path.dirname(cache_path) or ".",
                            exist_ok=True)
                joblib.dump(gmm, cache_path)
        self._gmm = gmm
        self.cluster_labels = gmm.predict(z)
        return self.cluster_labels

    def cluster_agency(self, feat_idx=(7, 8, 9), top2_thresh: float = 0.2):
        """Soft top-2 cluster assignment (``gp_common.py:254-262``): each
        cluster owns its argmax samples PLUS any sample whose second-highest
        membership probability for it exceeds ``top2_thresh`` — overlapping
        training sets smooth the cluster boundaries."""
        assert self._gmm is not None, "call cluster() first"
        probs = self._gmm.predict_proba(self.features(feat_idx))
        idx_aux = np.arange(probs.shape[0])
        top_1 = np.argmax(probs, axis=1)
        probs2 = probs.copy()
        probs2[idx_aux, top_1] = 0.0
        top_2 = np.argmax(probs2, axis=1)
        agency = {}
        for c in range(probs.shape[1]):
            own = np.flatnonzero(top_1 == c)
            soft = np.flatnonzero(
                (top_2 == c) & (probs2[idx_aux, top_2] > top2_thresh)
            )
            agency[c] = np.concatenate([own, soft])
        return agency

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
      (the reference's 2-D branch, ``distance_maximizing_points_2d``);
    - 'histogram_median': 1-D histogram with ``n_points`` bins, taking each
      bin's median sample (``distance_maximizing_points_1d``);
    - 'pca_cuboid': corners + center of the PCA-aligned bounding cuboid,
      nearest dataset samples (the reference's >=3-D branch), topped up by
      inverse-density random fill;
    - 'random_inverse_density': inverse-histogram-density sampling favoring
      rare regions (``sample_random_points``).
    """
    z = np.asarray(z)
    y = np.asarray(y)
    m = len(z)
    if n_points >= m:
        return np.arange(m)
    if method == "histogram_median":
        rng = np.random.default_rng(seed)
        vals = z[:, 0]
        _, edges = np.histogram(vals, bins=n_points)
        bin_idx = np.clip(np.digitize(vals, edges) - 1, 0, n_points - 1)
        idx = []
        for i in range(n_points):
            members = np.flatnonzero(bin_idx == i)
            if len(members) == 0:
                idx.append(int(rng.integers(m)))
                continue
            bin_values = vals[members]
            if len(bin_values) % 2 == 0:  # median must be a data point
                members = members[:-1]
                bin_values = bin_values[:-1]
            idx.append(int(members[np.argsort(bin_values)[len(bin_values) // 2]]))
        return np.unique(idx)
    if method == "pca_cuboid":
        from sklearn.decomposition import PCA

        rng = np.random.default_rng(seed)
        d = min(z.shape[1], 3)
        pca = PCA(n_components=d).fit(z)
        zp = (z - z.mean(axis=0)) @ pca.components_.T
        p_min, p_max = zp.min(axis=0), zp.max(axis=0)
        # Cuboid corners + center in PCA space; nearest samples.
        corners = [np.zeros(d)]
        for bits in range(2**d):
            corner = np.array(
                [p_min[j] if (bits >> j) & 1 else p_max[j] for j in range(d)]
            )
            corners.append(corner)
        idx = []
        for corner in corners[: n_points]:
            idx.append(int(np.argmin(np.linalg.norm(zp - corner, axis=1))))
        idx = list(np.unique(idx))
        # Inverse-density random fill to n_points (utils.py:719-743).
        if len(idx) < n_points:
            norm = np.linalg.norm(zp, axis=1)
            counts, edges = np.histogram(norm, bins=20)
            bin_idx = np.clip(np.digitize(norm, edges[:-1]) - 1, 0, 19)
            w = 1.0 / np.maximum(counts[bin_idx], 1)
            w[idx] = 0.0
            w = w / w.sum()
            fill = rng.choice(m, size=n_points - len(idx), replace=False,
                              p=w)
            idx = list(np.unique(np.concatenate([idx, fill])))
        return np.asarray(idx[:n_points])
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
