"""Clustered GP ensembles as stacked parameter tensors.

Capability parity with the reference's ``GPEnsemble``
(``ros_gp_mpc/src/model_fitting/gp.py:536-788``): one GP per (output dim,
cluster), centroid-sorted clusters, nearest-centroid cluster selection,
feature extraction ``z = B_z [x; u]``, and the dynamics augmentation
``x_dot += B_x . R(q) . GP(z)`` (``quad_3d_optimizer.py:289-327``).

TPU-first redesign: the reference compiles one ACADOS solver per cluster and
switches between compiled binaries at runtime (``acados_models[i]``). Here
all clusters live in ONE stacked parameter tensor (padded to a common
training-set size) and cluster choice is a gather — no recompilation, no
model switch, and ``lax`` tracing sees a single program. Selection can run
per-solve (reference semantics) or per-evaluation inside the rollout.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.learned.gp import GPParams
from ad_mpc_tpu.utils.math import q_to_rot_mat, quaternion_inverse, v_dot_q


class GPEnsemble(NamedTuple):
    """Stacked GP parameters over (out_dim D, clusters C, points n, feats d).

    Clusters with fewer training points are padded with repeated rows whose
    ``k_inv_y`` entries are zero — padding contributes exactly nothing to the
    posterior mean.
    """

    x_train: jax.Array  # (D, C, n, d)
    k_inv_y: jax.Array  # (D, C, n)
    len_scale: jax.Array  # (D, C, d)
    sigma_f: jax.Array  # (D, C)
    sigma_n: jax.Array  # (D, C)
    y_mean: jax.Array  # (D, C)
    centroids: jax.Array  # (D, C, d)
    n_valid: jax.Array  # (D, C) true (unpadded) training-set sizes
    out_idx: tuple  # static: which state dims the outputs correct (e.g. 7,8,9)
    feat_idx: tuple  # static: which body-frame state dims form z (e.g. 7,8,9)

    @property
    def n_clusters(self) -> int:
        return self.x_train.shape[1]

    @staticmethod
    def from_gps(
        gps: Sequence[Sequence[GPParams]],
        out_idx: Sequence[int],
        feat_idx: Sequence[int],
    ) -> "GPEnsemble":
        """Stack per-dim lists of per-cluster GPParams, padding training sets
        to a common size and sorting clusters by centroid first-feature
        (``gp.py:592-595``)."""
        D = len(gps)
        C = len(gps[0])
        n_max = max(int(g.x_train.shape[0]) for row in gps for g in row)

        def pad(g: GPParams):
            n = g.x_train.shape[0]
            reps = n_max - n
            x = np.concatenate(
                [np.asarray(g.x_train), np.tile(np.asarray(g.x_train[:1]), (reps, 1))]
            )
            a = np.concatenate([np.asarray(g.k_inv_y), np.zeros(reps)])
            return x, a

        x_all = np.zeros((D, C, n_max, gps[0][0].x_train.shape[1]))
        a_all = np.zeros((D, C, n_max))
        ls = np.zeros((D, C, gps[0][0].len_scale.shape[0]))
        sf = np.zeros((D, C))
        sn = np.zeros((D, C))
        ym = np.zeros((D, C))
        cen = np.zeros((D, C, gps[0][0].centroid.shape[0]))
        nv = np.zeros((D, C), dtype=np.int32)
        for i, row in enumerate(gps):
            order = np.argsort([float(g.centroid[0]) for g in row])
            for j, cj in enumerate(order):
                g = row[cj]
                x_all[i, j], a_all[i, j] = pad(g)
                ls[i, j] = np.asarray(g.len_scale)
                sf[i, j] = float(g.sigma_f)
                sn[i, j] = float(g.sigma_n)
                ym[i, j] = float(g.y_mean)
                cen[i, j] = np.asarray(g.centroid)
                nv[i, j] = int(g.x_train.shape[0])
        return GPEnsemble(
            x_train=jnp.asarray(x_all),
            k_inv_y=jnp.asarray(a_all),
            len_scale=jnp.asarray(ls),
            sigma_f=jnp.asarray(sf),
            sigma_n=jnp.asarray(sn),
            y_mean=jnp.asarray(ym),
            centroids=jnp.asarray(cen),
            n_valid=jnp.asarray(nv),
            out_idx=tuple(int(i) for i in out_idx),
            feat_idx=tuple(int(i) for i in feat_idx),
        )


def homogeneous_feature_space(ens: GPEnsemble) -> bool:
    """True when every output dimension shares identical cluster centroids
    (``gp.py:772-788``): selection can then be computed once instead of per
    output dimension."""
    if ens.x_train.shape[0] == 1:
        return True
    cen = np.asarray(ens.centroids)
    return bool(np.all(cen == cen[0:1]))


def select_cluster(ens: GPEnsemble, z):
    """Nearest-centroid cluster index per output dim (``gp.py:738-770``).
    z: (d,) -> (D,) int."""
    d2 = jnp.sum((ens.centroids - z[None, None, :]) ** 2, axis=-1)  # (D, C)
    return jnp.argmin(d2, axis=-1)


def predict(ens: GPEnsemble, z, cluster_idx=None):
    """Posterior means of all output dims at feature z: (D,).

    cluster_idx: (D,) int per-dim cluster choice; None = nearest centroid.
    """
    if cluster_idx is None:
        cluster_idx = select_cluster(ens, z)
    D = ens.x_train.shape[0]
    dim_range = jnp.arange(D)

    x_t = ens.x_train[dim_range, cluster_idx]  # (D, n, d)
    a = ens.k_inv_y[dim_range, cluster_idx]  # (D, n)
    ls = ens.len_scale[dim_range, cluster_idx]  # (D, d)
    sf = ens.sigma_f[dim_range, cluster_idx]  # (D,)
    ym = ens.y_mean[dim_range, cluster_idx]  # (D,)

    diff = (z[None, None, :] - x_t) / ls[:, None, :]
    k_s = sf[:, None] * jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1))  # (D, n)
    return jnp.sum(k_s * a, axis=-1) + ym


def predict_variance(ens: GPEnsemble, z, cluster_idx=None):
    """Posterior variances of all output dims at feature z: (D,).

    Computed on the fly from the stacked training sets (clusters are small,
    n~30, so the per-call Cholesky is cheap); feeds the +-3 sigma bands of
    ``gp_visualization`` and the GP-covariance branch of
    :func:`ad_mpc_tpu.ocp.propagation.forward_prop`.
    """
    if cluster_idx is None:
        cluster_idx = select_cluster(ens, z)
    D = ens.x_train.shape[0]
    dim_range = jnp.arange(D)

    x_t = ens.x_train[dim_range, cluster_idx]  # (D, n, d)
    ls = ens.len_scale[dim_range, cluster_idx]  # (D, d)
    sf = ens.sigma_f[dim_range, cluster_idx]  # (D,)
    sn = ens.sigma_n[dim_range, cluster_idx]  # (D,)
    nv = ens.n_valid[dim_range, cluster_idx]  # (D,)

    def one(x_t_d, ls_d, sf_d, sn_d, nv_d):
        n = x_t_d.shape[0]
        # Padded rows (repeats of row 0 beyond nv_d) must not enter the
        # posterior as extra observations: zero their k_s entries and
        # decouple them from K (identity rows/cols) so the solve ignores
        # them exactly.
        m = (jnp.arange(n) < nv_d).astype(x_t_d.dtype)
        diff = (x_t_d[:, None, :] - x_t_d[None, :, :]) / ls_d
        K = sf_d * jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1))
        K = K * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        K = K + (sn_d**2 + 1e-6) * jnp.diag(m)
        ds = (z[None, :] - x_t_d) / ls_d
        k_s = sf_d * jnp.exp(-0.5 * jnp.sum(ds * ds, axis=-1)) * m
        sol = jnp.linalg.solve(K, k_s)
        return jnp.maximum(sf_d - jnp.dot(k_s, sol), 1e-12)

    return jax.vmap(one)(x_t, ls, sf, sn, nv)


def body_frame_features(x, feat_idx):
    """Feature vector z from a 13D quad state: selected dims with the
    velocity block rotated into the body frame
    (``quad_3d_optimizer.py:296-298``)."""
    q = x[3:7]
    v_b = v_dot_q(x[7:10], quaternion_inverse(q))
    x_body = x.at[7:10].set(v_b) if hasattr(x, "at") else x
    return jnp.stack([x_body[i] for i in feat_idx])


def state_residual_fn(ens: GPEnsemble, fixed_cluster=None):
    """Generic dynamics-residual closure: GP outputs add directly to
    ``x_dot`` at ``out_idx`` with features taken straight from the state at
    ``feat_idx`` (no frame rotation).

    This generalizes the ensemble beyond the quadrotor layout — e.g. a GP
    residual on the *bicycle lateral dynamics* (BASELINE config 3) uses
    ``out_idx=(4, 5)`` (v_y, psi_dot corrections) and
    ``feat_idx=(3, 4, 5, 6)`` (v_x, v_y, psi_dot, delta).
    """

    def residual(x, u):
        dtype = jnp.result_type(x)
        z = jnp.stack([x[i] for i in ens.feat_idx])
        mu = predict(ens, z, cluster_idx=fixed_cluster).astype(dtype)
        xd = jnp.zeros_like(x)
        for k, dim in enumerate(ens.out_idx):
            xd = xd.at[dim].set(mu[k])
        return xd

    return residual


def quad_residual_fn(ens: GPEnsemble, fixed_cluster=None):
    """Dynamics-residual closure for the quadrotor:
    ``x_dot += B_x . R(q) . GP(z)`` with z the body-frame velocity features
    (``quad_3d_optimizer.py:289-327``).

    The returned function is pure JAX: it fuses into the RK4 rollout and is
    differentiated by the SQP linearization — replacing the reference's
    per-cluster CasADi codegen.

    fixed_cluster: optional (D,) int to pin the cluster per solve (reference
    semantics via ``select_gp`` on the horizon midpoint); None = select per
    evaluation.
    """
    out_idx = ens.out_idx

    def residual(x, u):
        dtype = jnp.result_type(x)
        z = body_frame_features(x, ens.feat_idx)
        mu_body = predict(ens, z, cluster_idx=fixed_cluster).astype(dtype)
        # Only velocity-dim outputs are supported for the world-frame
        # rotation (the reference's B_x also selects velocity dims 7:10).
        full_body = jnp.zeros(3, dtype=dtype)
        for k, dim in enumerate(out_idx):
            full_body = full_body.at[dim - 7].set(mu_body[k])
        mu_world = v_dot_q(full_body, x[3:7])
        xd = jnp.zeros_like(x)
        return xd.at[7:10].set(mu_world)

    return residual
