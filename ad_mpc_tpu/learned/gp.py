"""Exact Gaussian-process regression, JAX-native.

Capability parity with the reference's from-scratch GP
(``ros_gp_mpc/src/model_fitting/gp.py``): anisotropic squared-exponential
kernel (``gp.py:81-138``), Cholesky NLL with L-BFGS-B hyperparameter fitting
over log-parameters with restarts + bounds (``gp.py:292-358``), precomputed
``K^-1 y`` for O(n) inference (``gp.py:233-276``).

Design differences, TPU-first:
- one jnp implementation serves numeric *and* differentiable use — the
  reference needed a numpy copy plus a CasADi-MX mirror of every routine to
  inline the GP mean into its OCP codegen; here :func:`predict_mean` is a
  plain JAX function, so it fuses straight into the dynamics closure and
  ``jax.jacfwd`` differentiates it inside the SQP linearization sweep;
- NLL gradients are analytic (``jax.grad``) instead of L-BFGS-B's
  finite differences;
- prediction over batches of query points is a batched matvec against the
  cached ``K^-1 y`` — MXU-friendly when vmapped over scenarios.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize


class GPParams(NamedTuple):
    """Precomputed exact-GP state (the content of the reference's joblib
    pickles, ``gp.py:489-533``)."""

    x_train: jax.Array  # (n, d)
    k_inv_y: jax.Array  # (n,)  = K^-1 (y - y_mean)
    len_scale: jax.Array  # (d,)
    sigma_f: jax.Array  # amplitude
    sigma_n: jax.Array  # noise std
    y_mean: jax.Array  # scalar training-target mean
    centroid: jax.Array  # (d,) training-feature mean (ensemble selection)


def kernel(x1, x2, len_scale, sigma_f):
    """Anisotropic SE kernel matrix (m,d),(n,d) -> (m,n)
    (``gp.py:81-115``: k = sigma_f * exp(-0.5 ||(x-x')/l||^2))."""
    d = (x1[:, None, :] - x2[None, :, :]) / len_scale
    return sigma_f * jnp.exp(-0.5 * jnp.sum(d * d, axis=-1))


def kernel_vec(z, x_train, len_scale, sigma_f):
    """k(z, X): (d,),(n,d) -> (n,)."""
    d = (z[None, :] - x_train) / len_scale
    return sigma_f * jnp.exp(-0.5 * jnp.sum(d * d, axis=-1))


def predict_mean(params: GPParams, z):
    """Posterior mean at a single query point: mu = k_s . K^-1 y + y_mean
    (``gp.py:403-471``). Differentiable; vmap for batches."""
    k_s = kernel_vec(z, params.x_train, params.len_scale, params.sigma_f)
    return jnp.dot(k_s, params.k_inv_y) + params.y_mean


def predict_var(params: GPParams, z):
    """Posterior variance at a query point (uses a cached Cholesky-free
    approximation: full var requires K^-1 k_s; recompute here)."""
    k_s = kernel_vec(z, params.x_train, params.len_scale, params.sigma_f)
    K = kernel(params.x_train, params.x_train, params.len_scale, params.sigma_f)
    K = K + (params.sigma_n**2 + 1e-8) * jnp.eye(K.shape[0])
    sol = jnp.linalg.solve(K, k_s)
    return params.sigma_f - jnp.dot(k_s, sol)


def _nll(theta, x, y):
    """Negative log marginal likelihood over log-hyperparams
    theta = [log l (d), log sigma_f, log sigma_n] (``gp.py:292-316``)."""
    d = x.shape[1]
    len_scale = jnp.exp(theta[:d])
    sigma_f = jnp.exp(theta[d])
    sigma_n = jnp.exp(theta[d + 1])
    K = kernel(x, x, len_scale, sigma_f)
    K = K + (sigma_n**2 + 1e-8) * jnp.eye(x.shape[0])
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    return (
        jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * jnp.dot(y, alpha)
        + 0.5 * x.shape[0] * jnp.log(2 * jnp.pi)
    )


def fit_gp(
    x_train,
    y_train,
    n_restarts: int = 5,
    seed: int = 0,
    log_bounds=(-7.0, 7.0),
) -> GPParams:
    """Fit hyperparameters by restarting L-BFGS-B on the NLL with analytic
    JAX gradients, then precompute K^-1 y (``gp.py:318-369``)."""
    x = np.asarray(x_train, dtype=np.float64)
    y = np.asarray(y_train, dtype=np.float64).reshape(-1)
    y_mean = y.mean()
    yc = y - y_mean
    d = x.shape[1]

    val_grad = jax.jit(jax.value_and_grad(lambda t: _nll(t, x, yc)))

    def obj(theta):
        v, g = val_grad(theta)
        return float(v), np.asarray(g)

    rng = np.random.default_rng(seed)
    best, best_val = None, np.inf
    for i in range(n_restarts):
        theta0 = np.concatenate(
            [
                np.log(x.std(axis=0) + 1e-3) + rng.normal(0, 0.5, d),
                [np.log(yc.std() + 1e-3) + rng.normal(0, 0.5)],
                [np.log(0.1 * (yc.std() + 1e-3)) + rng.normal(0, 0.5)],
            ]
        )
        try:
            res = minimize(
                obj, theta0, jac=True, method="L-BFGS-B",
                bounds=[log_bounds] * (d + 2),
            )
            if res.fun < best_val:
                best, best_val = res.x, res.fun
        except np.linalg.LinAlgError:
            continue
    assert best is not None, "all hyperparameter fits failed"

    len_scale = np.exp(best[:d])
    sigma_f = float(np.exp(best[d]))
    sigma_n = float(np.exp(best[d + 1]))

    K = np.asarray(kernel(x, x, len_scale, sigma_f))
    K = K + (sigma_n**2 + 1e-8) * np.eye(len(x))
    k_inv_y = np.linalg.solve(K, yc)

    return GPParams(
        x_train=jnp.asarray(x),
        k_inv_y=jnp.asarray(k_inv_y),
        len_scale=jnp.asarray(len_scale),
        sigma_f=jnp.asarray(sigma_f),
        sigma_n=jnp.asarray(sigma_n),
        y_mean=jnp.asarray(y_mean),
        centroid=jnp.asarray(x.mean(axis=0)),
    )
