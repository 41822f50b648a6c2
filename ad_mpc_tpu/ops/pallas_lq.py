"""Fused Pallas TPU kernel for the box-constrained LQ optimal-control QP.

This is the TPU-native replacement for the role HPIPM+BLASFEO play in the
reference (``libacados_ocp_solver_sim_car.so``; solver options in
``ros_gp_mpc/acados_models/sim_car_acados_ocp.json``): the ENTIRE
fixed-iteration primal-dual interior-point solve — cone eliminations,
backward Riccati factorization, forward rollout, cone back-substitution,
fraction-to-boundary step and barrier centering — runs as ONE Pallas kernel
per QP, batched over scenarios.

Why a kernel at all: the stage matrices are tiny (7x7 / 13x13), so the XLA
path (``ops/qp_ipm.py`` + ``ops/riccati.py``) becomes hundreds of
micro-dispatches per solve — latency-bound at batch 1 and dispatch-bound at
large batch. The Pallas layout instead puts the *scenario batch on the
128-wide lane axis* and unrolls the small-matrix algebra across matrix
entries, so every multiply-add in the Riccati recursion is a full-width VPU
op and the whole solve is one launch with all state resident in VMEM.

Static specialization: cost weights, bound values, and softness flags are
compile-time Python scalars baked into the trace (Pallas kernels may not
capture array constants). Cone state exists only for the *finite* bound
entries — a bound that does not exist costs nothing, and each cone entry's
math is a clean (N, B) two-axis VPU op.

Semantics match :func:`ad_mpc_tpu.ops.qp_ipm.solve_lq_ocp` exactly (same
elimination, same fraction-to-boundary rule, same centering); equality is
asserted by ``tests/test_pallas_lq.py`` (interpret mode on CPU, the real
Mosaic path on TPU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# --------------------------------------------------------- small-matrix alg.
# Dynamic operands are (n, m, B) arrays: matrix entries on leading (untiled)
# axes, the scenario batch on the lane axis. Static (compile-time) matrices
# are numpy and unroll into scalar multiply-adds, skipping zeros.


def mat_mul(X, Y):
    """(a, k, B) @ (k, c, B) -> (a, c, B)."""
    return jnp.sum(X[:, :, None, :] * Y[None, :, :, :], axis=1)


def mat_tmul(X, Y):
    """X^T Y: (k, a, B), (k, c, B) -> (a, c, B)."""
    return jnp.sum(X[:, :, None, :] * Y[:, None, :, :], axis=0)


def mat_vec(X, v):
    """(a, k, B) @ (k, B) -> (a, B)."""
    return jnp.sum(X * v[None, :, :], axis=1)


def mat_tvec(X, v):
    """X^T v: (k, a, B), (k, B) -> (a, B)."""
    return jnp.sum(X * v[:, None, :], axis=0)


def bmat_vec(M2, v):
    """Unbatched (a, k) matrix times lane-batched (k, B) -> (a, B)."""
    return jnp.sum(M2[:, :, None] * v[None, :, :], axis=1)


def diag_embed(eye2, w):
    """diag(w): identity (n, n) input times per-entry weights (n, B) ->
    (n, n, B) — ONE broadcast multiply, no scatter, no per-element stacks
    (keeps the Mosaic op count linear in the horizon)."""
    return eye2[:, :, None] * w[:, None, :]


def chol_factor(H, n):
    """Unrolled Cholesky of an (n, n, B) SPD stack -> list-of-lists of (B,)
    lane vectors (lower triangle)."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        s = H[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(s)
        inv = 1.0 / L[i][i]
        for j in range(i + 1, n):
            s = H[j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv
    return L


def chol_solve(L, B_mat, n, m):
    """Solve (L L^T) X = B for an (n, m, B) right-hand-side stack."""
    Y = [[None] * m for _ in range(n)]
    for i in range(n):
        inv = 1.0 / L[i][i]
        for j in range(m):
            s = B_mat[i, j]
            for k in range(i):
                s = s - L[i][k] * Y[k][j]
            Y[i][j] = s * inv
    X = [[None] * m for _ in range(n)]
    for i in reversed(range(n)):
        inv = 1.0 / L[i][i]
        for j in range(m):
            s = Y[i][j]
            for k in range(i + 1, n):
                s = s - L[k][i] * X[k][j]
            X[i][j] = s * inv
    return jnp.stack([jnp.stack(row, axis=0) for row in X], axis=0)


def chol_solve_vec(L, b, n):
    """Solve (L L^T) x = b for an (n, B) stack."""
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=0)


# ------------------------------------------------------------- cone algebra
# Static per-side description: only finite-bound entries exist. All bound
# values / penalties / softness are compile-time scalars; the per-entry cone
# state is a (n_stages, B) array — a clean VPU tile shape.


class _SideSpec(NamedTuple):
    idx: tuple  # active variable indices within the group
    b: tuple  # bound value per active entry
    soft: tuple  # bool per active entry
    z: tuple  # L1 penalty per active entry
    Z: tuple  # L2 penalty per active entry
    lo: bool

    @staticmethod
    def make(lb, ub, soft, zl, zu, Zl, Zu, lo: bool):
        b = np.asarray(lb if lo else ub, np.float64)
        mask = np.isfinite(b)
        idx = tuple(int(i) for i in np.flatnonzero(mask))
        z = np.asarray(zl if lo else zu, np.float64)
        Z = np.asarray(Zl if lo else Zu, np.float64)
        soft = np.asarray(soft, bool)
        return _SideSpec(
            idx=idx,
            b=tuple(float(b[i]) for i in idx),
            soft=tuple(bool(soft[i]) for i in idx),
            z=tuple(float(z[i]) for i in idx),
            Z=tuple(float(Z[i]) for i in idx),
            lo=lo,
        )

    @property
    def n(self):
        return len(self.idx)

    @property
    def comp_count_per_stage(self):
        return self.n + sum(self.soft)


def _gather(v, side: _SideSpec):
    """(S, w, B) -> list of n (S, B) columns for the active entries."""
    return [v[:, j] for j in side.idx]


def _cone_init(v, side: _SideSpec, t0, lam0):
    """Cone state as lists of (S, B) arrays per active entry."""
    ts, lams, sigmas, mus = [], [], [], []
    for e, j in enumerate(side.idx):
        gap = (v[:, j] - side.b[e]) if side.lo else (side.b[e] - v[:, j])
        if side.soft[e]:
            sigma = jnp.maximum(t0 - gap, t0)
            t = gap + sigma
            mu = jnp.full_like(gap, lam0)
        else:
            sigma = jnp.ones_like(gap)
            t = jnp.maximum(gap, t0)
            mu = jnp.ones_like(gap)
        ts.append(t)
        lams.append(jnp.full_like(gap, lam0))
        sigmas.append(sigma)
        mus.append(mu)
    stack = lambda xs: (
        jnp.stack(xs, axis=1) if xs else jnp.zeros(v.shape[:1] + (0,) + v.shape[2:], v.dtype)
    )
    return (stack(ts), stack(lams), stack(sigmas), stack(mus))


def _cone_terms(v, side: _SideSpec, cone, tau):
    """Per active entry: Hessian weight w_e, stationarity gradient grad_e,
    and elimination cache. Returns lists of (S, B) arrays (w, grad aligned
    with side.idx) and the cache."""
    t_all, lam_all, sig_all, mu_all = cone
    ws, grads, caches = [], [], []
    sgn = -1.0 if side.lo else 1.0
    for e in range(side.n):
        j = side.idx[e]
        t, lam = t_all[:, e], lam_all[:, e]
        gap = (v[:, j] - side.b[e]) if side.lo else (side.b[e] - v[:, j])
        if side.soft[e]:
            sigma, mu = sig_all[:, e], mu_all[:, e]
            rp = gap + sigma - t
            r1 = lam * t - tau + lam * rp
            r2 = mu * sigma - tau
            r3 = side.z[e] + side.Z[e] * sigma - lam - mu
            lam_t = lam / t
            D = side.Z[e] + lam_t + mu / sigma
            w = lam_t * (1.0 - lam_t / D)
            g = -r1 / t + lam_t * (r3 + r1 / t + r2 / sigma) / D
            caches.append((r1, r2, r3, rp, D, lam_t))
        else:
            rp = gap - t
            r1 = lam * t - tau + lam * rp
            lam_t = lam / t
            w = lam_t
            g = -r1 / t
            caches.append((r1, None, None, rp, None, lam_t))
        # Barrier-weight cap (mirrors qp_ipm): keeps the f32 Riccati
        # cancellation from destroying PSD-ness at active bounds.
        w = jnp.minimum(w, 1e6)
        ws.append(w)
        grads.append(sgn * (lam + g))
    return ws, grads, caches


def _cone_step(dv, side: _SideSpec, cone, caches):
    """Newton step of the cone variables given the primal step dv (S, w, B).
    Returns stacked (S, n, B) deltas."""
    s = 1.0 if side.lo else -1.0
    t_all, lam_all, sig_all, mu_all = cone
    dts, dlams, dsigmas, dmus = [], [], [], []
    for e in range(side.n):
        j = side.idx[e]
        t, lam = t_all[:, e], lam_all[:, e]
        dv_e = dv[:, j]
        if side.soft[e]:
            r1, r2, r3, rp, D, lam_t = caches[e]
            sigma, mu = sig_all[:, e], mu_all[:, e]
            dsigma = (-r3 - r1 / t - r2 / sigma - s * lam_t * dv_e) / D
            dlam = -r1 / t - lam_t * (s * dv_e + dsigma)
            dmu = (-r2 - mu * dsigma) / sigma
            dt = s * dv_e + dsigma + rp
        else:
            r1, _, _, rp, _, lam_t = caches[e]
            dsigma = jnp.zeros_like(t)
            dlam = -r1 / t - lam_t * s * dv_e
            dmu = jnp.zeros_like(t)
            dt = s * dv_e + rp
        dts.append(dt)
        dlams.append(dlam)
        dsigmas.append(dsigma)
        dmus.append(dmu)
    stack = lambda xs: (
        jnp.stack(xs, axis=1)
        if xs
        else jnp.zeros(dv.shape[:1] + (0,) + dv.shape[2:], dv.dtype)
    )
    return (stack(dts), stack(dlams), stack(dsigmas), stack(dmus))


def _ratio_min(v, dv, cur):
    """Min fraction-to-boundary ratio over (S, n, B) -> (B,) running min."""
    if v.shape[1] == 0:
        return cur
    r = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.minimum(cur, jnp.min(r, axis=(0, 1)))


def _comp_sum(side: _SideSpec, cone, total):
    """Complementarity sum over active (and soft) entries -> (B,).

    Reduce the FULL (S, n, B) products over the stage axis first — Mosaic
    rejects add-reductions over a dimension with a non-zero layout offset,
    which a column slice ``t_all[:, e]`` would produce."""
    t_all, lam_all, sig_all, mu_all = cone
    s_hard = jnp.sum(t_all * lam_all, axis=0)  # (n, B)
    s_soft = jnp.sum(sig_all * mu_all, axis=0)  # (n, B)
    for e in range(side.n):
        total = total + s_hard[e]
        if side.soft[e]:
            total = total + s_soft[e]
    return total


# ------------------------------------------------------------------- kernel


def _lq_core(
    A, Bm, c, q, r, u_ref, x_ref, Q2, R2, QN2, eye_x, eye_u,
    *,
    N, nx, nu,
    u_sides, x_sides, iters, reg, tau_min, _return_carry=False,
):
    """Pure-jnp core of the kernel (batch-last layout). Runs identically
    inside the Pallas kernel and as a plain traced function (debugging).

    Q2/R2/QN2/eye_x/eye_u are small UNBATCHED (n, n) tensor inputs — Pallas
    kernels may not capture array constants, and element-wise scalar
    unrolling would blow up the Mosaic op count."""
    dtype = A.dtype
    Bt = A.shape[-1]
    Rreg = R2 + reg * eye_u

    # Initial primal iterate: du = 0, dx = defect propagation (feasible).
    dx_rows = [jnp.zeros((nx, Bt), dtype)]
    for k in range(N):
        dx_rows.append(mat_vec(A[k], dx_rows[-1]) + c[k])
    dx = jnp.stack(dx_rows, axis=0)  # (N+1, nx, Bt)
    du = jnp.zeros((N, nu, Bt), dtype)

    t0, lam0 = 0.1, 0.1
    # Only sides with at least one finite bound carry cone state (empty
    # sides would put zero-size arrays in the loop carry).
    sides = tuple(
        (s, True) for s in u_sides if s.n > 0
    ) + tuple(
        (s, False) for s in x_sides if s.n > 0
    )
    cones = tuple(
        _cone_init(u_ref + du if is_u else x_ref[1:] + dx[1:], s, t0, lam0)
        for s, is_u in sides
    )
    tau = jnp.full((Bt,), 0.1, dtype)
    alpha = jnp.ones((Bt,), dtype)

    comp_count = N * sum(s.comp_count_per_stage for s, _ in sides)

    def ipm_body(_, carry):
        dx, du, cones, tau, _ = carry
        u_abs = u_ref + du
        x_abs = x_ref[1:] + dx[1:]

        # Cone eliminations. Collect per-variable-group diagonal weights and
        # gradient adds as per-entry column lists (None = zero), stacked
        # once into (N, width, Bt) arrays.
        wu_cols = [None] * nu
        gu_cols = [None] * nu
        wx_cols = [None] * nx
        gx_cols = [None] * nx
        caches = []
        for si, (side, is_u) in enumerate(sides):
            v = u_abs if is_u else x_abs
            ws, gs, cch = _cone_terms(v, side, cones[si], tau)
            caches.append(cch)
            tgt_w = wu_cols if is_u else wx_cols
            tgt_g = gu_cols if is_u else gx_cols
            for e, j in enumerate(side.idx):
                tgt_w[j] = ws[e] if tgt_w[j] is None else tgt_w[j] + ws[e]
                tgt_g[j] = gs[e] if tgt_g[j] is None else tgt_g[j] + gs[e]

        zero_col = jnp.zeros((N, Bt), dtype)
        stackc = lambda cols: jnp.stack(
            [col if col is not None else zero_col for col in cols], axis=1
        )
        gu = stackc(gu_cols)  # (N, nu, Bt)
        wu = stackc(wu_cols)  # (N, nu, Bt)
        gx = stackc(gx_cols)  # (N, nx, Bt) -- stages 1..N
        wx = stackc(wx_cols)  # (N, nx, Bt)
        zero_x = jnp.zeros((nx, Bt), dtype)

        # Backward Riccati sweep with cone-modified cost. Terminal stage N
        # carries x-cone row N-1 (x cones cover stages 1..N).
        P = QN2[:, :, None] + diag_embed(eye_x, wx[N - 1])
        p_vec = bmat_vec(QN2, dx[N]) + q[N] + gx[N - 1]
        Ks = [None] * N
        ks = [None] * N
        for k in range(N - 1, -1, -1):
            A_k, B_k = A[k], Bm[k]
            gx_k = gx[k - 1] if k > 0 else zero_x
            wx_k = wx[k - 1] if k > 0 else zero_x
            q_k = bmat_vec(Q2, dx[k]) + q[k] + gx_k
            r_k = bmat_vec(R2, du[k]) + r[k] + gu[k]

            PA = mat_mul(P, A_k)  # (nx, nx, Bt)
            PB = mat_mul(P, B_k)  # (nx, nu, Bt)
            H_uu = (
                Rreg[:, :, None]
                + diag_embed(eye_u, wu[k])
                + mat_tmul(B_k, PB)
            )
            H_ux = mat_tmul(B_k, PA)  # (nu, nx, Bt)
            h_u = r_k + mat_tvec(B_k, p_vec)

            L = chol_factor(H_uu, nu)
            K = -chol_solve(L, H_ux, nu, nx)  # (nu, nx, Bt)
            kf = -chol_solve_vec(L, h_u, nu)  # (nu, Bt)
            Ks[k] = K
            ks[k] = kf

            P_new = (
                Q2[:, :, None]
                + diag_embed(eye_x, wx_k)
                + mat_tmul(A_k, PA)
                + mat_tmul(H_ux, K)
            )
            P = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
            p_vec = q_k + mat_tvec(A_k, p_vec) + mat_tvec(H_ux, kf)

        # Forward rollout of the affine policy (homogeneous dynamics: the
        # iterate is kept dynamics-feasible).
        ddx_rows = [jnp.zeros((nx, Bt), dtype)]
        ddu_rows = []
        for k in range(N):
            ddu_k = mat_vec(Ks[k], ddx_rows[-1]) + ks[k]
            ddu_rows.append(ddu_k)
            ddx_rows.append(
                mat_vec(A[k], ddx_rows[-1]) + mat_vec(Bm[k], ddu_k)
            )
        ddx = jnp.stack(ddx_rows, axis=0)
        ddu = jnp.stack(ddu_rows, axis=0)

        dcones = []
        alpha = jnp.full((Bt,), jnp.inf, dtype)
        for si, (side, is_u) in enumerate(sides):
            dv = ddu if is_u else ddx[1:]
            dcn = _cone_step(dv, side, cones[si], caches[si])
            dcones.append(dcn)
            for v, dvv in zip(cones[si], dcn):
                alpha = _ratio_min(v, dvv, alpha)
        alpha = jnp.minimum(1.0, 0.995 * alpha)
        al = alpha[None, None, :]

        dx_new = dx + al * ddx
        du_new = du + al * ddu
        # Positivity floor mirroring qp_ipm: f32 rounding can zero a tiny
        # slack at convergence, poisoning the next mu/sigma division.
        floor = 1e-10
        cones_new = tuple(
            tuple(jnp.maximum(v + al * dv, floor) for v, dv in zip(cn, dcn))
            for cn, dcn in zip(cones, dcones)
        )

        total = jnp.zeros((Bt,), dtype)
        for si, (side, _) in enumerate(sides):
            total = _comp_sum(side, cones_new[si], total)
        tau_new = jnp.maximum(
            0.1 * total / max(comp_count, 1), tau_min
        ).astype(dtype)

        return dx_new, du_new, cones_new, tau_new, alpha

    dx, du, cones, tau, alpha = jax.lax.fori_loop(
        0, iters, ipm_body, (dx, du, cones, tau, alpha)
    )
    if _return_carry:
        return dx, du, cones, tau, alpha
    return dx, du, alpha


def _lq_kernel(
    A_ref, B_ref, c_ref, q_ref, r_ref, uref_ref, xref_ref,
    Q_ref, R_ref, QN_ref, eyex_ref, eyeu_ref,
    dx_out, du_out, alpha_out,
    **static,
):
    dx, du, alpha = _lq_core(
        A_ref[:], B_ref[:], c_ref[:], q_ref[:], r_ref[:],
        uref_ref[:], xref_ref[:],
        Q_ref[:], R_ref[:], QN_ref[:], eyex_ref[:], eyeu_ref[:],
        **static,
    )
    dx_out[:] = dx
    du_out[:] = du
    alpha_out[:] = alpha[None]


def _lq_kernel_rolled(
    A_ref, B_ref, c_ref, q_ref, r_ref, uref_ref, xref_ref,
    Q_ref, R_ref, QN_ref, eyex_ref, eyeu_ref,
    dx_out, du_out, alpha_out,
    dx_s, du_s, ddx_s, ddu_s, gxp_s, wxp_s, gu_s, wu_s, K_s, k_s,
    *, N, nx, nu, u_sides, x_sides, iters, reg, tau_min,
):
    """Stage-ROLLED variant of :func:`_lq_kernel`: the backward Riccati and
    forward rollout run as ``lax.fori_loop``s with dynamically-indexed VMEM
    scratch (per-stage state in ``*_s`` refs), instead of unrolling N
    stages into the trace. Cuts the Mosaic program size by ~N for the
    Riccati part — the round-2 cold compile of the N=30 unrolled kernel
    exceeded 9 minutes (VERDICT r2 #6); per-stage reads/writes must go
    through refs because Mosaic has no ``dynamic_slice`` on values.

    Identical arithmetic and op order per stage; equality vs the unrolled
    kernel is asserted by ``tests/test_pallas_lq.py``.
    """
    dtype = dx_out.dtype
    Bt = A_ref.shape[-1]
    Q2 = Q_ref[...]
    R2 = R_ref[...]
    QN2 = QN_ref[...]
    eye_x = eyex_ref[...]
    eye_u = eyeu_ref[...]
    Rreg = R2 + reg * eye_u
    q = q_ref[...]
    r = r_ref[...]
    u_ref = uref_ref[...]
    x_ref = xref_ref[...]

    # Initial primal iterate: du = 0, dx = defect propagation (feasible).
    dx_s[0] = jnp.zeros((nx, Bt), dtype)

    def init_body(k, dxk):
        nxt = mat_vec(A_ref[k], dxk) + c_ref[k]
        dx_s[k + 1] = nxt
        return nxt

    jax.lax.fori_loop(0, N, init_body, jnp.zeros((nx, Bt), dtype))
    du_s[...] = jnp.zeros((N, nu, Bt), dtype)

    t0, lam0 = 0.1, 0.1
    sides = tuple(
        (s, True) for s in u_sides if s.n > 0
    ) + tuple(
        (s, False) for s in x_sides if s.n > 0
    )
    dx0 = dx_s[...]
    cones = tuple(
        _cone_init(u_ref + du_s[...] if is_u else x_ref[1:] + dx0[1:],
                   s, t0, lam0)
        for s, is_u in sides
    )
    tau = jnp.full((Bt,), 0.1, dtype)
    alpha = jnp.ones((Bt,), dtype)
    comp_count = N * sum(s.comp_count_per_stage for s, _ in sides)

    def ipm_body(_, carry):
        cones, tau, _ = carry
        dx = dx_s[...]
        du = du_s[...]
        u_abs = u_ref + du
        x_abs = x_ref[1:] + dx[1:]

        wu_cols = [None] * nu
        gu_cols = [None] * nu
        wx_cols = [None] * nx
        gx_cols = [None] * nx
        caches = []
        for si, (side, is_u) in enumerate(sides):
            v = u_abs if is_u else x_abs
            ws, gs, cch = _cone_terms(v, side, cones[si], tau)
            caches.append(cch)
            tgt_w = wu_cols if is_u else wx_cols
            tgt_g = gu_cols if is_u else gx_cols
            for e, j in enumerate(side.idx):
                tgt_w[j] = ws[e] if tgt_w[j] is None else tgt_w[j] + ws[e]
                tgt_g[j] = gs[e] if tgt_g[j] is None else tgt_g[j] + gs[e]

        zero_col = jnp.zeros((N, Bt), dtype)
        stackc = lambda cols: jnp.stack(
            [col if col is not None else zero_col for col in cols], axis=1
        )
        gu = stackc(gu_cols)  # (N, nu, Bt)
        wu = stackc(wu_cols)
        gx = stackc(gx_cols)  # (N, nx, Bt) -- stages 1..N
        wx = stackc(wx_cols)
        zrow = jnp.zeros((1, nx, Bt), dtype)
        # Shifted per-stage x-cone rows: gxp[k] = gx row of stage k (zero at
        # k=0), so the backward loop can read them at a dynamic index.
        gxp_s[...] = jnp.concatenate([zrow, gx[: N - 1]], axis=0)
        wxp_s[...] = jnp.concatenate([zrow, wx[: N - 1]], axis=0)
        gu_s[...] = gu
        wu_s[...] = wu

        # Backward Riccati sweep (rolled): terminal stage N carries x-cone
        # row N-1 (x cones cover stages 1..N).
        P0 = QN2[:, :, None] + diag_embed(eye_x, wx[N - 1])
        pv0 = bmat_vec(QN2, dx[N]) + q[N] + gx[N - 1]

        def bwd_body(j, carry):
            P, p_vec = carry
            k = N - 1 - j
            A_k = A_ref[k]
            B_k = B_ref[k]
            q_k = bmat_vec(Q2, dx_s[k]) + q_ref[k] + gxp_s[k]
            r_k = bmat_vec(R2, du_s[k]) + r_ref[k] + gu_s[k]

            PA = mat_mul(P, A_k)
            PB = mat_mul(P, B_k)
            H_uu = (
                Rreg[:, :, None]
                + diag_embed(eye_u, wu_s[k])
                + mat_tmul(B_k, PB)
            )
            H_ux = mat_tmul(B_k, PA)
            h_u = r_k + mat_tvec(B_k, p_vec)

            L = chol_factor(H_uu, nu)
            K = -chol_solve(L, H_ux, nu, nx)
            kf = -chol_solve_vec(L, h_u, nu)
            K_s[k] = K
            k_s[k] = kf

            P_new = (
                Q2[:, :, None]
                + diag_embed(eye_x, wxp_s[k])
                + mat_tmul(A_k, PA)
                + mat_tmul(H_ux, K)
            )
            P = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
            p_vec = q_k + mat_tvec(A_k, p_vec) + mat_tvec(H_ux, kf)
            return P, p_vec

        jax.lax.fori_loop(0, N, bwd_body, (P0, pv0))

        # Forward rollout of the affine policy (rolled).
        ddx_s[0] = jnp.zeros((nx, Bt), dtype)

        def fwd_body(k, ddxk):
            ddu_k = mat_vec(K_s[k], ddxk) + k_s[k]
            ddu_s[k] = ddu_k
            nxt = mat_vec(A_ref[k], ddxk) + mat_vec(B_ref[k], ddu_k)
            ddx_s[k + 1] = nxt
            return nxt

        jax.lax.fori_loop(0, N, fwd_body, jnp.zeros((nx, Bt), dtype))
        ddx = ddx_s[...]
        ddu = ddu_s[...]

        dcones = []
        alpha = jnp.full((Bt,), jnp.inf, dtype)
        for si, (side, is_u) in enumerate(sides):
            dv = ddu if is_u else ddx[1:]
            dcn = _cone_step(dv, side, cones[si], caches[si])
            dcones.append(dcn)
            for v, dvv in zip(cones[si], dcn):
                alpha = _ratio_min(v, dvv, alpha)
        alpha = jnp.minimum(1.0, 0.995 * alpha)
        al = alpha[None, None, :]

        dx_s[...] = dx + al * ddx
        du_s[...] = du + al * ddu
        floor = 1e-10
        cones_new = tuple(
            tuple(jnp.maximum(v + al * dv, floor) for v, dv in zip(cn, dcn))
            for cn, dcn in zip(cones, dcones)
        )

        total = jnp.zeros((Bt,), dtype)
        for si, (side, _) in enumerate(sides):
            total = _comp_sum(side, cones_new[si], total)
        tau_new = jnp.maximum(
            0.1 * total / max(comp_count, 1), tau_min
        ).astype(dtype)

        return cones_new, tau_new, alpha

    _, _, alpha = jax.lax.fori_loop(
        0, iters, ipm_body, (cones, tau, alpha)
    )
    dx_out[...] = dx_s[...]
    du_out[...] = du_s[...]
    alpha_out[...] = alpha[None]


def make_lq_solver(
    N, nx, nu, Q, R, QN, u_bounds, x_bounds,
    iters=12, reg=1e-8, tau_min=1e-8, block_b=LANES, interpret=False,
    roll_stages=None,
):
    """Build the batched Pallas QP solver.

    Q/R/QN: (nx,nx)/(nu,nu)/(nx,nx) numpy stage weights (compile-time);
    u_bounds/x_bounds: dicts with lb/ub/soft/zl/zu/Zl/Zu numpy arrays
    (compile-time, matching :class:`ad_mpc_tpu.ops.qp_ipm.BoundSpec`).

    ``roll_stages``: True runs the Riccati/rollout stage loops as
    ``fori_loop`` over VMEM scratch (small Mosaic program, fast compile),
    False fully unrolls them (round-2 behavior; ~N x larger program, ~10
    min cold compile at N=30). Default (None) rolls for N >= 16.

    Returns solve(A, B, c, q, r, u_ref, x_ref) with batch-FIRST shapes
    (B, N, ...) -> (dx (B,N+1,nx), du (B,N,nu), alpha (B,)).
    """
    if roll_stages is None:
        roll_stages = N >= 16
    u_sides = tuple(
        _SideSpec.make(**u_bounds, lo=lo) for lo in (True, False)
    )
    x_sides = tuple(
        _SideSpec.make(**x_bounds, lo=lo) for lo in (True, False)
    )
    Q2 = jnp.asarray(np.asarray(Q, np.float32))
    R2 = jnp.asarray(np.asarray(R, np.float32))
    QN2 = jnp.asarray(np.asarray(QN, np.float32))
    eye_x = jnp.eye(nx, dtype=jnp.float32)
    eye_u = jnp.eye(nu, dtype=jnp.float32)

    kern = functools.partial(
        _lq_kernel_rolled if roll_stages else _lq_kernel,
        N=N, nx=nx, nu=nu,
        u_sides=u_sides, x_sides=x_sides,
        iters=iters, reg=reg, tau_min=tau_min,
    )

    def solve(A, B, c, q, r, u_ref, x_ref):
        batch = A.shape[0]
        Bt = int(min(block_b, max(batch, 1)))
        pad = (-batch) % Bt
        full = batch + pad

        def prep(x):
            # (B, N, ...) -> (N, ..., B) batch-last, padded.
            x = jnp.asarray(x, jnp.float32)
            if pad:
                x = jnp.concatenate(
                    [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0
                )
            return jnp.moveaxis(x, 0, -1)

        inputs = [prep(v) for v in (A, B, c, q, r, u_ref, x_ref)]
        inputs += [Q2, R2, QN2, eye_x, eye_u]
        grid = (full // Bt,)

        def spec(*shape):
            nd = len(shape) + 1
            return pl.BlockSpec(
                tuple(shape) + (Bt,),
                lambda i, _nd=nd: (0,) * (_nd - 1) + (i,),
                memory_space=pltpu.VMEM,
            )

        def spec_full(*shape):
            # Small unbatched weight matrices: same full block every program.
            nd = len(shape)
            return pl.BlockSpec(
                tuple(shape),
                lambda i, _nd=nd: (0,) * _nd,
                memory_space=pltpu.VMEM,
            )

        scratch = []
        if roll_stages:
            vmem = lambda *shape: pltpu.VMEM(shape + (Bt,), jnp.float32)
            scratch = [
                vmem(N + 1, nx),  # dx
                vmem(N, nu),      # du
                vmem(N + 1, nx),  # ddx
                vmem(N, nu),      # ddu
                vmem(N, nx),      # gxp (shifted x-cone gradients)
                vmem(N, nx),      # wxp
                vmem(N, nu),      # gu
                vmem(N, nu),      # wu
                vmem(N, nu, nx),  # K gains
                vmem(N, nu),      # k feedforward
            ]

        dx_t, du_t, al_t = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                spec(N, nx, nx),
                spec(N, nx, nu),
                spec(N, nx),
                spec(N + 1, nx),
                spec(N, nu),
                spec(N, nu),
                spec(N + 1, nx),
                spec_full(nx, nx),
                spec_full(nu, nu),
                spec_full(nx, nx),
                spec_full(nx, nx),
                spec_full(nu, nu),
            ],
            out_specs=[
                spec(N + 1, nx),
                spec(N, nu),
                spec(1),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N + 1, nx, full), jnp.float32),
                jax.ShapeDtypeStruct((N, nu, full), jnp.float32),
                jax.ShapeDtypeStruct((1, full), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*inputs)

        dx = jnp.moveaxis(dx_t, -1, 0)[:batch]
        du = jnp.moveaxis(du_t, -1, 0)[:batch]
        alpha = jnp.moveaxis(al_t, -1, 0)[:batch, 0]
        return dx, du, alpha

    return solve
