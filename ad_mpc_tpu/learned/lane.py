"""Lane-polymorphic GP inference: the learned residual INSIDE the fused
Pallas VDE kernel.

The reference inlines the GP posterior mean symbolically into its compiled
solver dynamics — the SE-kernel mean becomes part of the ACADOS/CasADi
codegen and is differentiated by the VDE
(``ros_gp_mpc/src/quad_mpc/quad_3d_optimizer.py:289-327``, symbolic mean
from ``src/model_fitting/gp.py:403-471``). The TPU-native equivalent here
rewrites :func:`ad_mpc_tpu.learned.ensemble.predict` under the *slab
contract* of :mod:`ad_mpc_tpu.ops.pallas_vde`: every state entry ``x[i]`` is
an (N, B) VPU tile (stages on sublanes, scenarios on lanes), so the GP mean
must be expressed as elementwise ops over those tiles only — no feature-axis
matmuls, no gathers, no rank-4 broadcasts.

Two evaluation modes:

- **baked** (:func:`lane_gp_mean`): the training set is a compile-time
  constant, unrolled over its n points — each term is
  ``a_j * exp(-0.5 * sum_k ((z_k - X[j,k]) / l_k)^2)`` with X/a/l Python
  floats, which Mosaic lowers as plain VPU arithmetic. One cluster per
  compiled program: exactly the reference's one-ACADOS-binary-per-cluster
  semantics, minus the recompiles (clusters share the XLA program; only the
  constants differ).
- **parameter-routed** (:func:`param_residual_dynamics`): the selected
  cluster's parameters ride the per-scenario parameter vector ``p`` — the
  nearest-centroid gather (``gp.py:738-770``) runs OUTSIDE the kernel, per
  scenario, per solve, and the kernel reads GP parameters as (N, B) slabs.
  One compiled program serves every cluster AND mixed-cluster fleets, which
  the reference cannot do at all.

Because the lane forms use only per-entry indexing + elementwise jnp, they
also evaluate correctly on plain ``(nx,)`` state vectors — the XLA jacfwd
path, the closed-loop plants, and the parity oracle all reuse the SAME
function, so there is no fused-vs-reference model drift to test away.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.learned.ensemble import GPEnsemble, select_cluster


def lane_gp_mean(x_train, k_inv_y, len_scale, sigma_f, y_mean, z):
    """SE-kernel posterior mean on slabs, unrolled over the static training
    set: ``mu = y_mean + sum_j a_j sigma_f exp(-0.5 ||(z - X_j) / l||^2)``
    (``gp.py:403-471``).

    x_train (n, d), k_inv_y (n,), len_scale (d,): host constants (numpy);
    z: length-d list of slabs (each (N, B), or scalars on the vector path).
    Returns the mean as one slab. All arithmetic is elementwise with Python-
    float coefficients — Mosaic-lowerable by construction, and ``jax.
    linearize`` reuses each exp's primal for its tangent, so the VDE's
    nx+nu tangent sweeps pay only multiply-adds.
    """
    X = np.asarray(x_train, np.float64)
    a = np.asarray(k_inv_y, np.float64) * float(sigma_f)
    inv_l = [1.0 / float(v) for v in np.asarray(len_scale)]
    n, d = X.shape
    assert len(z) == d, (len(z), d)

    mu = None
    for j in range(n):
        if a[j] == 0.0:  # padded training rows contribute exactly nothing
            continue
        d2 = None
        for k in range(d):
            t = (z[k] - float(X[j, k])) * inv_l[k]
            t = t * t
            d2 = t if d2 is None else d2 + t
        term = float(a[j]) * jnp.exp(-0.5 * d2)
        mu = term if mu is None else mu + term
    if mu is None:
        return float(y_mean) + 0.0 * z[0]
    return mu + float(y_mean)


def _ens_cluster(ens: GPEnsemble, dim: int, cluster) -> tuple:
    """Host-side (numpy) parameters of one (output-dim, cluster) GP."""
    c = int(cluster[dim]) if np.ndim(cluster) else int(cluster)
    return (
        np.asarray(ens.x_train)[dim, c],
        np.asarray(ens.k_inv_y)[dim, c],
        np.asarray(ens.len_scale)[dim, c],
        float(np.asarray(ens.sigma_f)[dim, c]),
        float(np.asarray(ens.y_mean)[dim, c]),
    )


def add_rows(base, contribs: dict):
    """Add per-row contributions to a stacked (nx, ...) slab without
    scatter: re-stack the rows (the Mosaic-safe `_one_hot_rows` pattern)."""
    nx = base.shape[0]
    return jnp.stack(
        [base[i] + contribs[i] if i in contribs else base[i]
         for i in range(nx)]
    )


def lane_residual_terms(ens: GPEnsemble, x, cluster=0) -> dict:
    """Generic state-feature residual (the bicycle layout of
    ``bench.make_gp_bicycle``): features straight from the state at
    ``feat_idx``, outputs added at ``out_idx`` — the lane twin of
    :func:`ad_mpc_tpu.learned.ensemble.state_residual_fn`."""
    z = [x[i] for i in ens.feat_idx]
    out = {}
    for k, dim in enumerate(ens.out_idx):
        out[dim] = lane_gp_mean(*_ens_cluster(ens, k, cluster), z)
    return out


def _rot_rows(x):
    """Entrywise R(q) of the state's [w,x,y,z] quaternion block as a 3x3
    list of slabs (matches :func:`ad_mpc_tpu.utils.math.q_to_rot_mat`)."""
    qw, qx, qy, qz = x[3], x[4], x[5], x[6]
    return [
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx * qx + qy * qy)],
    ]


def quad_lane_residual_terms(ens: GPEnsemble, x, cluster=0) -> dict:
    """Quadrotor body-frame GP residual, entrywise: features are the
    body-frame velocities ``v_b = R(q)^T v``, the per-dim means are rotated
    back to world, ``x_dot[7:10] += R(q) mu_body``
    (``quad_3d_optimizer.py:289-327``; lane twin of
    :func:`ad_mpc_tpu.learned.ensemble.quad_residual_fn`)."""
    assert tuple(ens.feat_idx) == (7, 8, 9) and tuple(ens.out_idx) == (7, 8, 9), (
        "quad lane residual supports the body-frame velocity layout only"
    )
    R = _rot_rows(x)
    v = [x[7], x[8], x[9]]
    v_b = [R[0][r] * v[0] + R[1][r] * v[1] + R[2][r] * v[2] for r in range(3)]
    mu_b = [
        lane_gp_mean(*_ens_cluster(ens, k, cluster), v_b) for k in range(3)
    ]
    mu_w = [
        R[r][0] * mu_b[0] + R[r][1] * mu_b[1] + R[r][2] * mu_b[2]
        for r in range(3)
    ]
    return {7: mu_w[0], 8: mu_w[1], 9: mu_w[2]}


# ------------------------------------------------- parameter-routed clusters

def gp_param_dim(ens: GPEnsemble) -> int:
    """Rows of the per-scenario parameter vector holding one selected
    cluster per output dim: per dim [X flat (n*d), a (n,), inv_l (d,),
    sigma_f, y_mean]."""
    D, _, n, d = ens.x_train.shape
    return D * (n * d + n + d + 2)


def gather_cluster_params(ens: GPEnsemble, z):
    """OUT-of-kernel nearest-centroid cluster gather (``gp.py:738-770``):
    pick each output dim's cluster for feature point ``z`` (d,) and flatten
    its parameters into a (gp_param_dim,) vector. Pure JAX — vmap over the
    fleet, run per solve (the reference reselects per solve on the horizon
    midpoint, ``quad_3d_optimizer.py:489-493``)."""
    idx = select_cluster(ens, z)  # (D,)
    D, _, n, d = ens.x_train.shape
    dims = jnp.arange(D)
    X = ens.x_train[dims, idx]          # (D, n, d)
    a = ens.k_inv_y[dims, idx] * ens.sigma_f[dims, idx][:, None]  # (D, n)
    inv_l = 1.0 / ens.len_scale[dims, idx]  # (D, d)
    sf = ens.sigma_f[dims, idx]         # (D,)
    ym = ens.y_mean[dims, idx]          # (D,)
    per = [
        jnp.concatenate(
            [X[i].reshape(-1), a[i], inv_l[i], sf[i][None], ym[i][None]]
        )
        for i in range(D)
    ]
    return jnp.concatenate(per).astype(jnp.float32)


def param_gp_mean(n: int, d: int, p, off: int, z):
    """SE-kernel mean with GP parameters read from parameter-vector rows
    (slabs): same unrolled structure as :func:`lane_gp_mean` but every
    coefficient is a slab — the per-scenario selected-cluster values."""
    xo, ao, lo = off, off + n * d, off + n * d + n
    ym = p[lo + d + 1]
    inv_l = [p[lo + k] for k in range(d)]
    mu = ym
    for j in range(n):
        d2 = None
        for k in range(d):
            t = (z[k] - p[xo + j * d + k]) * inv_l[k]
            t = t * t
            d2 = t if d2 is None else d2 + t
        mu = mu + p[ao + j] * jnp.exp(-0.5 * d2)
    return mu


def param_residual_dynamics(ens: GPEnsemble, base_f3, base_p_dim: int,
                            quad_frame: bool = False):
    """Compose ``base_f3(x, u, p)`` with a parameter-routed GP residual.

    Returns ``(f3, p_dim, pack)``:
    - ``f3(x, u, p)``: lane-polymorphic dynamics reading the GP from
      ``p[base_p_dim:]`` — passes the Mosaic probes, so the fused Pallas
      VDE serves *mixed-cluster fleets in one compiled program*;
    - ``p_dim``: total parameter rows;
    - ``pack(z, base_p)``: per-scenario parameter builder (vmap over the
      fleet): nearest-centroid gather at feature point z, concatenated
      behind the model's own parameters.
    """
    D, _, n, d = ens.x_train.shape
    per = n * d + n + d + 2

    def pack(z, base_p=None):
        gp = gather_cluster_params(ens, z)
        if base_p is None:
            return gp
        return jnp.concatenate([jnp.asarray(base_p, jnp.float32), gp])

    if quad_frame:
        assert tuple(ens.feat_idx) == (7, 8, 9) and tuple(ens.out_idx) == (7, 8, 9)

        def f3(x, u, p):
            R = _rot_rows(x)
            v = [x[7], x[8], x[9]]
            v_b = [
                R[0][r] * v[0] + R[1][r] * v[1] + R[2][r] * v[2]
                for r in range(3)
            ]
            mu_b = [
                param_gp_mean(n, d, p, base_p_dim + i * per, v_b)
                for i in range(D)
            ]
            mu_w = [
                R[r][0] * mu_b[0] + R[r][1] * mu_b[1] + R[r][2] * mu_b[2]
                for r in range(3)
            ]
            return add_rows(base_f3(x, u, p), {7: mu_w[0], 8: mu_w[1],
                                               9: mu_w[2]})
    else:

        def f3(x, u, p):
            z = [x[i] for i in ens.feat_idx]
            contribs = {}
            for i, dim in enumerate(ens.out_idx):
                contribs[dim] = param_gp_mean(
                    n, d, p, base_p_dim + i * per, z
                )
            return add_rows(base_f3(x, u, p), contribs)

    return f3, base_p_dim + D * per, pack
