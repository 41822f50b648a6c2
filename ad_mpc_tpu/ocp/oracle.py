"""Independent NLP oracle for full-solve parity testing.

The reference validates nothing beyond golden closed-loop numbers; BASELINE
demands "control output matches ACADOS to 1e-3 at N≈20-40". ACADOS itself is
not installable in this environment, so the oracle is a *direct multiple
shooting* transcription of the exact same OCP (dims/weights/bounds taken
from the same :class:`~ad_mpc_tpu.ocp.spec.OCPSpec`, the same RK4
discretization, the same soft-bound L1/L2 penalty model as HPIPM —
``ros_gp_mpc/acados_models/sim_car_acados_ocp.json``,
``src/ad_mpc/ad_3d_optimizer.py:146-209``) solved to high accuracy by scipy
``trust-constr`` in float64.

This is a legitimate external oracle for the SQP-RTI engine: the optimum is
defined by the objective/constraints alone, and scipy's interior-point
trust-region method shares no code with :mod:`ad_mpc_tpu.ops.qp_ipm` or
:mod:`ad_mpc_tpu.ops.riccati`. Derivatives are supplied by JAX in f64 —
they only affect the oracle's convergence path, not its fixed point.

Transcription. Decision vector
    z = [x_1 .. x_N | u_0 .. u_{N-1} | s_lo | s_hi]
with slack variables s >= 0 only for the soft input-bound entries
(ACADOS ``idxsbu``). Constraints:
    x_{k+1} - F(x_k, u_k) = 0          (multiple-shooting defects; x_0 fixed)
    lbu - s_lo <= u <= ubu + s_hi      (soft entries)
    lbu <= u <= ubu                    (hard entries, as variable bounds)
    lbx <= x_k <= ubx, k = 1..N        (hard state boxes, variable bounds)
Objective (matching the solver's acados-style dt scaling, ``OCPSpec``):
    sum_k dt/2 (||x_k - xref_k||_Q^2 + ||u_k - uref_k||_R^2)
    + 1/2 ||x_N - xref_N||_{W_e}^2 + z_l's_lo + 1/2 s_lo'Z_l s_lo + (upper)
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

from ad_mpc_tpu.ocp.spec import OCPSpec
from ad_mpc_tpu.utils.math import yaw_wrap_reference


class OracleResult(NamedTuple):
    us: np.ndarray  # (N, nu)
    xs: np.ndarray  # (N+1, nx)
    cost: float
    constr_violation: float
    status: int
    message: str


# Compiled objective/constraint functions are cached per (spec, dynamics) so
# a parity sweep over many (x0, reference) instances compiles once.
_FN_CACHE: dict = {}


def _compiled_fns(spec: OCPSpec, dynamics: Callable):
    import jax
    import jax.numpy as jnp

    from ad_mpc_tpu.ops.integrators import discretize

    key = (spec, id(dynamics))
    if key in _FN_CACHE:
        return _FN_CACHE[key]

    N, nx, nu, dt = spec.n_nodes, spec.nx, spec.nu, spec.dt
    Q, R, QN = spec.weight_arrays()
    _, _, _, _, soft_u, _ = spec.bound_arrays()
    qd, rd, qnd = np.diag(Q), np.diag(R), np.diag(QN)
    soft_idx = np.flatnonzero(soft_u)
    n_soft = len(soft_idx)
    zl = np.where(soft_u, spec.zl_u, 0.0)[soft_idx]
    zu = np.where(soft_u, spec.zu_u, 0.0)[soft_idx]
    Zl = np.where(soft_u, spec.Zl_u, 0.0)[soft_idx]
    Zu = np.where(soft_u, spec.Zu_u, 0.0)[soft_idx]
    n_x, n_u = N * nx, N * nu
    n_s = N * n_soft

    def split(z):
        xs = z[:n_x].reshape(N, nx)
        us = z[n_x : n_x + n_u].reshape(N, nu)
        s_lo = z[n_x + n_u : n_x + n_u + n_s].reshape(N, n_soft)
        s_hi = z[n_x + n_u + n_s :].reshape(N, n_soft)
        return xs, us, s_lo, s_hi

    def objective_j(z, x0, yref_x, yref_u):
        xs, us, s_lo, s_hi = split(z)
        xs_full = jnp.concatenate([x0[None], xs], axis=0)
        dx = xs_full[:-1] - yref_x[:-1]
        du = us - yref_u
        stage = 0.5 * jnp.sum(dx * dx * qd) + 0.5 * jnp.sum(du * du * rd)
        dterm = xs_full[-1] - yref_x[-1]
        term = 0.5 * jnp.sum(dterm * dterm * qnd)
        slack = (
            jnp.sum(s_lo * zl) + 0.5 * jnp.sum(s_lo * s_lo * Zl)
            + jnp.sum(s_hi * zu) + 0.5 * jnp.sum(s_hi * s_hi * Zu)
        )
        return stage + term + slack

    def defects_j(z, x0, params):
        F = discretize(
            lambda x, u: dynamics(x, u, params), dt, spec.rk4_steps
        )
        xs, us, _, _ = split(z)
        xs_full = jnp.concatenate([x0[None], xs], axis=0)
        pred = jax.vmap(F)(xs_full[:-1], us)
        return (pred - xs_full[1:]).reshape(-1)

    fns = dict(
        obj=jax.jit(objective_j),
        obj_grad=jax.jit(jax.grad(objective_j)),
        defects=jax.jit(defects_j),
        defects_jac=jax.jit(jax.jacrev(defects_j)),
        split=split,
        soft_idx=soft_idx,
        penalties=(zl, zu, Zl, Zu),
    )
    _FN_CACHE[key] = fns
    return fns


def solve_ocp_oracle(
    spec: OCPSpec,
    dynamics: Callable,
    x0,
    yref_x,
    yref_u,
    params=(),
    xtol: float = 1e-12,
    gtol: float = 1e-10,
    maxiter: int = 4000,
    us_init=None,
) -> OracleResult:
    """Solve the OCP defined by (spec, dynamics) to optimality.

    ``dynamics(x, u, p) -> x_dot`` — the same continuous-time model handed to
    :class:`~ad_mpc_tpu.ocp.solver.SQPSolver` (pass the identical callable so
    both solvers optimize the identical problem).
    """
    import jax
    import jax.numpy as jnp
    from scipy.optimize import Bounds, LinearConstraint, NonlinearConstraint, minimize

    enable_x64 = lambda: jax.enable_x64(True)  # jax>=0.9 context manager

    from ad_mpc_tpu.ops.integrators import discretize, rollout

    N, nx, nu, dt = spec.n_nodes, spec.nx, spec.nu, spec.dt
    lbu, ubu, lbx, ubx, soft_u, _ = spec.bound_arrays()

    x0 = np.asarray(x0, dtype=np.float64)
    yref_x = np.asarray(yref_x, dtype=np.float64).copy()
    yref_u = np.asarray(yref_u, dtype=np.float64)
    params = np.asarray(params, dtype=np.float64)

    if spec.yaw_wrap_idx is not None:
        i = spec.yaw_wrap_idx
        yref_x[:, i] = np.asarray(
            yaw_wrap_reference(jnp.asarray(yref_x[:, i]), float(x0[i]))
        )

    soft_idx = np.flatnonzero(soft_u)  # input entries with slack
    n_soft = len(soft_idx)

    n_x = N * nx
    n_u = N * nu
    n_s = N * n_soft
    n_z = n_x + n_u + 2 * n_s

    with enable_x64():
        fns = _compiled_fns(spec, dynamics)
        split = fns["split"]
        obj = lambda z: fns["obj"](z, x0, yref_x, yref_u)
        obj_grad = lambda z: fns["obj_grad"](z, x0, yref_x, yref_u)
        defects = lambda z: fns["defects"](z, x0, params)
        defects_jac = lambda z: fns["defects_jac"](z, x0, params)

        F = discretize(lambda x, u: dynamics(x, u, jnp.asarray(params)),
                       dt, spec.rk4_steps)

        # Initial guess: constant-u rollout (same cold start as the solver).
        if us_init is None:
            us_init = np.zeros((N, nu))
        us_init = np.asarray(us_init, dtype=np.float64)
        xs_roll = np.asarray(
            rollout(F, jnp.asarray(x0), jnp.asarray(us_init))
        )
        z0 = np.concatenate(
            [
                xs_roll[1:].reshape(-1),
                us_init.reshape(-1),
                1e-3 * np.ones(2 * n_s),
            ]
        )

        # Variable bounds: hard state boxes on x_1..x_N, hard input entries,
        # nonneg slacks. Soft input entries get (-inf, inf) variable bounds —
        # their boxes live in the linear slack constraints below.
        lb = np.concatenate(
            [
                np.tile(lbx, N),
                np.tile(np.where(soft_u, -np.inf, lbu), N),
                np.zeros(2 * n_s),
            ]
        )
        ub = np.concatenate(
            [
                np.tile(ubx, N),
                np.tile(np.where(soft_u, np.inf, ubu), N),
                np.full(2 * n_s, np.inf),
            ]
        )

        constraints = [
            NonlinearConstraint(
                lambda z: np.asarray(defects(z)),
                0.0,
                0.0,
                jac=lambda z: np.asarray(defects_jac(z)),
            )
        ]
        if n_soft:
            # u_i + s_lo_i >= lbu_i  and  u_i - s_hi_i <= ubu_i per stage.
            rows = []
            lo = []
            hi = []
            for k in range(N):
                for j, idx in enumerate(soft_idx):
                    row = np.zeros(n_z)
                    row[n_x + k * nu + idx] = 1.0
                    row[n_x + n_u + k * n_soft + j] = 1.0
                    rows.append(row)
                    lo.append(lbu[idx])
                    hi.append(np.inf)
                    row = np.zeros(n_z)
                    row[n_x + k * nu + idx] = 1.0
                    row[n_x + n_u + n_s + k * n_soft + j] = -1.0
                    rows.append(row)
                    lo.append(-np.inf)
                    hi.append(ubu[idx])
            constraints.append(
                LinearConstraint(np.asarray(rows), np.asarray(lo), np.asarray(hi))
            )

        res = minimize(
            lambda z: float(obj(z)),
            z0,
            jac=lambda z: np.asarray(obj_grad(z)),
            bounds=Bounds(lb, ub),
            constraints=constraints,
            method="trust-constr",
            options={"xtol": xtol, "gtol": gtol, "maxiter": maxiter,
                     "verbose": 0},
        )

    xs_opt, us_opt, _, _ = split(res.x)
    xs_full = np.concatenate([x0[None], xs_opt], axis=0)
    return OracleResult(
        us=us_opt,
        xs=xs_full,
        cost=float(res.fun),
        constr_violation=float(getattr(res, "constr_violation", np.nan)),
        status=int(res.status),
        message=str(res.message),
    )
