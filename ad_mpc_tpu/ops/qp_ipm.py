"""Primal-dual interior-point method for box-constrained LQ optimal control.

TPU-native replacement for HPIPM's full-condensing interior-point QP (the
reference links it via ``libacados_ocp_solver_*.so``; BALANCE mode,
``qp_iter_max=50`` — see ``ros_gp_mpc/acados_models/sim_car_acados_ocp.json``).
Design:

- Every inequality is a (possibly *soft*) box bound on a single input or
  state entry, matching ACADOS ``idxbu/idxbx/idxsbu`` semantics
  (``ad_3d_optimizer.py:184-198``). Soft bounds carry an L1 penalty ``z``
  and L2 penalty ``Z`` on their violation slack, exactly HPIPM's
  soft-constraint model.
- Each IPM iteration eliminates all bound duals/slacks into *diagonal*
  Hessian and gradient modifications (derivation below), then solves the
  equality-constrained Newton step with one Riccati sweep
  (:mod:`ad_mpc_tpu.ops.riccati`) — no condensing, no dense QP: the work is
  O(N (nx+nu)^3) and fully ``lax``-structured, so the whole solve jits into
  a single XLA program and ``vmap`` turns it into batched MXU matmuls.
- Fixed iteration count + fraction-to-boundary steps: branch-free,
  compile-once, data-independent control flow (XLA requirement).

Soft lower bound on scalar v (hard bound = limit Z,mu-terms -> drop sigma):
    v - l + sigma >= 0  (ipm slack t > 0, dual lam > 0)
    sigma >= 0          (dual mu > 0), cost z*sigma + 0.5*Z*sigma^2
Newton rows (tau = barrier parameter):
    lam*t - tau = 0, mu*sigma - tau = 0, z + Z*sigma - lam - mu = 0,
    v - l + sigma - t = 0
Eliminating (dt, dsigma, dmu) yields  dlam = g + h*dv  with
    D   = Z + lam/t + mu/sigma
    h_l = -(lam/t) * (1 - lam/(t*D))          (<= 0)
    g_l = -r1'/t + (lam/t)*(r3 + r1'/t + r2/sigma)/D
so the stationarity row of v gains diagonal Hessian weight ``-h_l`` and
gradient term ``-(lam + g_l)``; upper bounds mirror with flipped signs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ad_mpc_tpu.ops.riccati import lqr_solve


class BoundSpec(NamedTuple):
    """Static description of box bounds for one variable group.

    All arrays have the variable's width (nu or nx). Infinite entries in
    lb/ub disable the bound. ``soft`` marks entries whose bound may be
    violated at linear cost ``zl/zu`` (+ quadratic ``Zl/Zu``).
    """

    lb: jax.Array
    ub: jax.Array
    soft: jax.Array  # bool
    zl: jax.Array
    zu: jax.Array
    Zl: jax.Array
    Zu: jax.Array

    @staticmethod
    def make(lb, ub, soft=None, zl=None, zu=None, Zl=None, Zu=None):
        lb = jnp.asarray(lb)
        if not jnp.issubdtype(lb.dtype, jnp.floating):
            lb = lb.astype(jnp.result_type(float))
        n = lb.shape[-1]
        z = jnp.zeros(n, dtype=lb.dtype)
        return BoundSpec(
            lb=lb,
            ub=jnp.asarray(ub, dtype=lb.dtype),
            soft=jnp.zeros(n, dtype=bool) if soft is None else jnp.asarray(soft),
            zl=z if zl is None else jnp.asarray(zl, dtype=lb.dtype),
            zu=z if zu is None else jnp.asarray(zu, dtype=lb.dtype),
            Zl=z if Zl is None else jnp.asarray(Zl, dtype=lb.dtype),
            Zu=z if Zu is None else jnp.asarray(Zu, dtype=lb.dtype),
        )


class _Cone(NamedTuple):
    """IPM variables for one side (lower or upper) of one bound group.
    Shapes: (n_stages, width). Masked-out entries idle at 1."""

    t: jax.Array  # ipm slack > 0
    lam: jax.Array  # bound dual > 0
    sigma: jax.Array  # soft violation slack > 0 (soft only)
    mu: jax.Array  # dual of sigma >= 0 (soft only)


class QPState(NamedTuple):
    dx: jax.Array
    du: jax.Array
    cones: tuple  # (u_lo, u_hi, x_lo, x_hi)
    tau: jax.Array


def _mask_finite(b):
    return jnp.isfinite(b)


def _init_cone(v, bound, lo: bool, t0: float, lam0: float):
    """Strictly-interior start. v: (S, n) current variable values."""
    lb_or_ub = bound.lb if lo else bound.ub
    mask = jnp.broadcast_to(_mask_finite(lb_or_ub), v.shape)
    gap = (v - lb_or_ub) if lo else (lb_or_ub - v)
    soft = jnp.broadcast_to(bound.soft, v.shape) & mask
    # sigma covers any initial violation so t starts interior.
    sigma = jnp.where(soft, jnp.maximum(t0 - gap, t0), 1.0)
    t = jnp.where(mask, jnp.where(soft, gap + sigma, jnp.maximum(gap, t0)), 1.0)
    lam = jnp.where(mask, jnp.full_like(v, lam0), 1.0)
    mu = jnp.where(soft, jnp.full_like(v, lam0), 1.0)
    return _Cone(t=t, lam=lam, sigma=sigma, mu=mu)


def _cone_terms(v, bound, cone: _Cone, tau, lo: bool):
    """Per-entry diagonal Hessian weight w (>=0) and gradient contribution g
    for the Riccati step, plus cached elimination coefficients."""
    lb_or_ub = bound.lb if lo else bound.ub
    mask = _mask_finite(lb_or_ub)
    soft = bound.soft & mask
    hard = mask & ~bound.soft

    t, lam, sigma, mu = cone
    gap = (v - lb_or_ub) if lo else (lb_or_ub - v)

    # Residuals. rp is the primal bound residual; it folds into r1.
    rp = gap + jnp.where(soft, sigma, 0.0) - t
    r1 = lam * t - tau + lam * rp
    r2 = mu * sigma - tau
    z = bound.zl if lo else bound.zu
    Z = bound.Zl if lo else bound.Zu
    r3 = z + Z * sigma - lam - mu

    lam_t = lam / t
    D = Z + lam_t + mu / sigma
    # Soft: damped weight; hard: pure barrier weight lam/t. The weight is
    # capped at 1e6: beyond that the bound is already "infinitely stiff"
    # relative to any cost curvature, while uncapped weights (~1e8 at an
    # active bound) make the f32 Riccati cancellation lose PSD-ness of the
    # value Hessian and NaN the Cholesky. Constraint resolution under the
    # cap is ~1e-6 — far below the 1e-3 parity tolerance.
    w_soft = lam_t * (1.0 - lam_t / D)
    w = jnp.where(soft, w_soft, jnp.where(hard, lam_t, 0.0))
    w_cap = 1e6 if t.dtype == jnp.float32 else 1e12
    w = jnp.minimum(w, w_cap)

    g_soft = -r1 / t + lam_t * (r3 + r1 / t + r2 / sigma) / D
    g_hard = -r1 / t
    g = jnp.where(soft, g_soft, jnp.where(hard, g_hard, 0.0))

    # Gradient of the stationarity row: lower bound contributes -(lam + g),
    # upper contributes +(lam + g).
    sgn = -1.0 if lo else 1.0
    grad = jnp.where(mask, sgn * (lam + g), 0.0)
    return w, grad, (r1, r2, r3, rp, D, lam_t, mask, soft)


def _cone_step(dv, cone: _Cone, cache, lo: bool):
    """Recover the Newton step of the cone variables given the primal step dv
    of the underlying variable (back-substitution of the elimination)."""
    r1, r2, r3, rp, D, lam_t, mask, soft = cache
    t, lam, sigma, mu = cone
    s = 1.0 if lo else -1.0  # d(gap)/d(v)

    dsigma = jnp.where(
        soft, (-r3 - r1 / t - r2 / sigma - s * lam_t * dv) / D, 0.0
    )
    dlam = jnp.where(mask, -r1 / t - lam_t * (s * dv + dsigma), 0.0)
    dmu = jnp.where(soft, (-r2 - mu * dsigma) / sigma, 0.0)
    dt = jnp.where(mask, s * dv + dsigma + rp, 0.0)
    return _Cone(t=dt, lam=dlam, sigma=dsigma, mu=dmu)


def _fraction_to_boundary(cone: _Cone, dcone: _Cone, frac=0.995):
    """Max step alpha keeping all positive variables positive."""

    def ratio(v, dv):
        r = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.min(r)

    alphas = jnp.stack(
        [
            ratio(cone.t, dcone.t),
            ratio(cone.lam, dcone.lam),
            ratio(cone.sigma, dcone.sigma),
            ratio(cone.mu, dcone.mu),
        ]
    )
    return jnp.minimum(1.0, frac * jnp.min(alphas))


def _cone_complementarity(cone: _Cone, bound, lo: bool):
    lb_or_ub = bound.lb if lo else bound.ub
    # Broadcast the per-entry masks over the stage dimension: the numerator
    # sums (n_stages, width) complementarity pairs, so the count must too —
    # a per-entry count inflates mean complementarity by N and turns the
    # tau = 0.1*mean centering rule into geometric barrier GROWTH.
    mask = jnp.broadcast_to(_mask_finite(lb_or_ub), cone.t.shape)
    soft = jnp.broadcast_to(bound.soft, cone.t.shape) & mask
    comp = jnp.where(mask, cone.t * cone.lam, 0.0) + jnp.where(
        soft, cone.sigma * cone.mu, 0.0
    )
    count = jnp.sum(mask) + jnp.sum(soft)
    return jnp.sum(comp), count


def solve_lq_ocp(
    A, B, c, Q, q, R, r, dx0,
    u_bounds: BoundSpec, x_bounds: BoundSpec,
    u_ref, x_ref,
    iters: int = 18,
    tau_min: float = 1e-8,
    reg: float = 1e-8,
    lqr_fn=lqr_solve,
):
    """Solve the box-constrained LQ OCP with a fixed-iteration primal-dual IPM.

    Bounds are evaluated on the *absolute* variables ``u_ref + du`` and
    ``x_ref + dx`` (u_ref/x_ref are the SQP linearization points), matching
    the ACADOS convention where bounds constrain the true decision variables.
    State bounds apply to stages 1..N (stage 0 is the fixed initial state).

    Returns (dx, du, stats dict).
    """
    N = A.shape[0]
    dtype = A.dtype

    # Initial primal iterate: du = 0, dx = defect propagation (feasible).
    def prop(dx, inp):
        A_k, c_k = inp
        nxt = A_k @ dx + c_k
        return nxt, nxt

    _, dx_tail = jax.lax.scan(prop, dx0, (A, c))
    dx = jnp.concatenate([dx0[None], dx_tail], axis=0)
    du = jnp.zeros((N, B.shape[-1]), dtype=dtype)

    u_abs = u_ref + du
    x_abs = x_ref + dx

    t0, lam0 = 0.1, 0.1
    cones = (
        _init_cone(u_abs, u_bounds, True, t0, lam0),
        _init_cone(u_abs, u_bounds, False, t0, lam0),
        _init_cone(x_abs[1:], x_bounds, True, t0, lam0),
        _init_cone(x_abs[1:], x_bounds, False, t0, lam0),
    )
    tau = jnp.asarray(0.1, dtype=dtype)

    state = QPState(dx=dx, du=du, cones=cones, tau=tau)

    def iteration(state: QPState, _):
        dx, du, cones, tau = state.dx, state.du, state.cones, state.tau
        u_abs = u_ref + du
        x_abs = x_ref + dx

        wu_l, gu_l, cache_ul = _cone_terms(u_abs, u_bounds, cones[0], tau, True)
        wu_h, gu_h, cache_uh = _cone_terms(u_abs, u_bounds, cones[1], tau, False)
        wx_l, gx_l, cache_xl = _cone_terms(x_abs[1:], x_bounds, cones[2], tau, True)
        wx_h, gx_h, cache_xh = _cone_terms(x_abs[1:], x_bounds, cones[3], tau, False)

        # Modified cost for the Newton/Riccati step.
        R_mod = R + jax.vmap(jnp.diag)(wu_l + wu_h)
        r_mod = jnp.einsum("kij,kj->ki", R, du) + r + gu_l + gu_h

        wx = jnp.concatenate([jnp.zeros_like(wx_l[:1]), wx_l + wx_h], axis=0)
        gx = jnp.concatenate([jnp.zeros_like(gx_l[:1]), gx_l + gx_h], axis=0)
        Q_mod = Q + jax.vmap(jnp.diag)(wx)
        q_mod = jnp.einsum("kij,kj->ki", Q, dx) + q + gx

        # Newton step: homogeneous dynamics (iterate is dynamics-feasible).
        zeros_c = jnp.zeros_like(c)
        ddx, ddu = lqr_fn(
            A, B, zeros_c, Q_mod, q_mod, R_mod, r_mod,
            jnp.zeros_like(dx0), reg=reg,
        )

        dcones = (
            _cone_step(ddu, cones[0], cache_ul, True),
            _cone_step(ddu, cones[1], cache_uh, False),
            _cone_step(ddx[1:], cones[2], cache_xl, True),
            _cone_step(ddx[1:], cones[3], cache_xh, False),
        )

        alpha = jnp.min(
            jnp.stack(
                [_fraction_to_boundary(cn, dcn) for cn, dcn in zip(cones, dcones)]
            )
        )

        dx_new = dx + alpha * ddx
        du_new = du + alpha * ddu
        # Positivity floor: in f32 the fraction-to-boundary update can round
        # a tiny slack (sigma ~ tau/z ~ 1e-9 at convergence) to exact zero,
        # making the next iteration's mu/sigma division non-finite.
        floor = 1e-10
        cones_new = tuple(
            _Cone(*(jnp.maximum(v + alpha * dv, floor)
                    for v, dv in zip(cn, dcn)))
            for cn, dcn in zip(cones, dcones)
        )

        # Barrier update: centering on current complementarity.
        comp_sums = [
            _cone_complementarity(cn, b, lo)
            for cn, b, lo in zip(
                cones_new,
                (u_bounds, u_bounds, x_bounds, x_bounds),
                (True, False, True, False),
            )
        ]
        total = sum(cs[0] for cs in comp_sums)
        count = sum(cs[1] for cs in comp_sums)
        mean_comp = total / jnp.maximum(count, 1)
        tau_new = jnp.maximum(0.1 * mean_comp, tau_min).astype(dtype)

        return QPState(dx_new, du_new, cones_new, tau_new), alpha

    state, alphas = jax.lax.scan(iteration, state, None, length=iters)
    stats = {"alpha": alphas, "tau": state.tau}
    return state.dx, state.du, stats
