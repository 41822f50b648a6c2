"""SQP-RTI nonlinear MPC solver: one jitted XLA program per OCP spec.

TPU-native replacement for the ACADOS SQP-RTI capsule
(``acados_solver_sim_car.c``; Python driver ``ad_3d_optimizer.py:396-480``):

- linearization sweep = vmapped ``jax.jacfwd`` of the RK4-discretized
  dynamics (the VDE);
- the QP is solved by a fixed-iteration primal-dual IPM with per-stage
  Riccati factorizations (:mod:`ad_mpc_tpu.ops.qp_ipm`);
- RTI warm starting is a *functional* solver state (the previous
  state/control trajectory), threaded through solves and shiftable — no
  hidden C-state, so batching over thousands of scenario warm-starts is just
  ``vmap`` and mesh-sharding is ``shard_map``.

The solve function is compiled once per (spec, dynamics); every call with
new numeric data reuses the program — the XLA analogue of ACADOS's
generate-and-compile-at-init (``SURVEY.md §3.4``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.ocp.spec import OCPSpec
from ad_mpc_tpu.ops.integrators import (
    discretize,
    linearize,
    linearize_p,
    rollout,
    rollout_p,
)
from ad_mpc_tpu.ops.qp_ipm import BoundSpec, solve_lq_ocp
from ad_mpc_tpu.utils.math import yaw_wrap_reference


def _lqr_fn(spec: OCPSpec):
    """Riccati backend per spec: sequential scan (default) or the
    O(log N)-depth associative scan for long horizons."""
    if spec.assoc_riccati:
        from ad_mpc_tpu.ops.assoc_riccati import lqr_solve_assoc

        return lqr_solve_assoc
    from ad_mpc_tpu.ops.riccati import lqr_solve

    return lqr_solve


class SolverState(NamedTuple):
    """RTI warm-start iterate: the current primal trajectory guess."""

    xs: jax.Array  # (N+1, nx)
    us: jax.Array  # (N, nu)


class SolveResult(NamedTuple):
    us: jax.Array  # (N, nu) optimized controls
    xs: jax.Array  # (N+1, nx) optimized states
    state: SolverState  # warm-start state for the next solve
    kkt_residual: jax.Array  # stationarity+feasibility norm (solver health)
    alpha: jax.Array  # last-QP step sizes (diagnostics)


def save_iterate(path: str, state: SolverState) -> str:
    """Persist an RTI warm-start iterate to disk — the ACADOS
    ``store_iterate`` capability (``ad_3d_optimizer.py:453-455``,
    ``src/ad_mpc/solve_iteration.json``) with npz instead of json."""
    np.savez(path, xs=np.asarray(state.xs), us=np.asarray(state.us))
    return path


def load_iterate(path: str) -> SolverState:
    """Restore a warm-start iterate saved by :func:`save_iterate`
    (ACADOS ``load_iterate``)."""
    with np.load(path) as z:
        return SolverState(xs=jnp.asarray(z["xs"]), us=jnp.asarray(z["us"]))


class SQPSolver:
    """Factory wiring an OCPSpec + dynamics into jitted solve/shift calls.

    :param dynamics: continuous-time ``f(x, u, p) -> x_dot`` where ``p`` is a
        per-solve parameter vector (the reference's ACADOS stage parameter,
        e.g. the kinematic/dynamic blend switch). Pass ``p_dim=0`` for none.
    """

    def __init__(
        self,
        spec: OCPSpec,
        dynamics: Callable,
        p_dim: int = 0,
        dtype=jnp.float32,
    ):
        self.spec = spec
        self.dtype = dtype
        self.p_dim = p_dim

        if p_dim > 0:
            f = dynamics
        else:
            f = lambda x, u, p: dynamics(x, u)

        N, dt = spec.n_nodes, spec.dt

        Q, R, QN = spec.weight_arrays()
        lbu, ubu, lbx, ubx, soft_u, soft_x = spec.bound_arrays()
        self._Q = jnp.asarray(Q, dtype)
        self._R = jnp.asarray(R, dtype)
        self._QN = jnp.asarray(QN, dtype)
        zl_u = np.where(soft_u, spec.zl_u, 0.0)
        zu_u = np.where(soft_u, spec.zu_u, 0.0)
        Zl_u = np.where(soft_u, spec.Zl_u, 0.0)
        Zu_u = np.where(soft_u, spec.Zu_u, 0.0)
        # Host-side (numpy) mirrors: consumers that need compile-time bound
        # values (the Pallas kernel builder) read these — converting the
        # jnp versions back with np.asarray would be a per-construction
        # device->host fetch (pure overhead, and it can stall on a
        # tunneled accelerator).
        self._u_bounds_np = dict(
            lb=np.asarray(lbu, np.float64), ub=np.asarray(ubu, np.float64),
            soft=np.asarray(soft_u, bool),
            zl=np.asarray(zl_u, np.float64), zu=np.asarray(zu_u, np.float64),
            Zl=np.asarray(Zl_u, np.float64), Zu=np.asarray(Zu_u, np.float64),
        )
        self._x_bounds_np = dict(
            lb=np.asarray(lbx, np.float64), ub=np.asarray(ubx, np.float64),
            soft=np.asarray(soft_x, bool),
            zl=np.zeros_like(np.asarray(lbx, np.float64)),
            zu=np.zeros_like(np.asarray(lbx, np.float64)),
            Zl=np.zeros_like(np.asarray(lbx, np.float64)),
            Zu=np.zeros_like(np.asarray(lbx, np.float64)),
        )
        self._u_bounds = BoundSpec.make(
            jnp.asarray(lbu, dtype), jnp.asarray(ubu, dtype),
            soft=jnp.asarray(soft_u),
            zl=jnp.asarray(zl_u, dtype), zu=jnp.asarray(zu_u, dtype),
            Zl=jnp.asarray(Zl_u, dtype), Zu=jnp.asarray(Zu_u, dtype),
        )
        self._x_bounds = BoundSpec.make(
            jnp.asarray(lbx, dtype), jnp.asarray(ubx, dtype),
            soft=jnp.asarray(soft_x),
        )

        def F(x, u, p):
            return discretize(lambda xx, uu: f(xx, uu, p), dt, spec.rk4_steps)(x, u)

        self._F = F

        def solve(x0, yref_x, yref_u, params, state: SolverState) -> SolveResult:
            """One MPC solve: ``spec.sqp_iters`` Gauss-Newton iterations.

            yref_x: (N+1, nx), yref_u: (N, nu), params: (p_dim,) broadcast to
            all stages, or (N, p_dim) for stage-varying parameters (the
            ACADOS per-stage ``p`` — e.g. the quad GP 'trigger' active at
            node 0 only, ``quad_3d_optimizer.py:289-327``).
            """
            with jax.default_matmul_precision(spec.matmul_precision):
                return _solve_inner(x0, yref_x, yref_u, params, state)

        def _solve_inner(x0, yref_x, yref_u, params, state):
            x0 = x0.astype(dtype)
            yref_x = yref_x.astype(dtype)
            yref_u = yref_u.astype(dtype)
            params = jnp.asarray(params).astype(dtype)
            state = SolverState(
                xs=state.xs.astype(dtype), us=state.us.astype(dtype)
            )

            if spec.yaw_wrap_idx is not None:
                i = spec.yaw_wrap_idx
                yref_x = yref_x.at[:, i].set(
                    yaw_wrap_reference(yref_x[:, i], x0[i])
                )

            # Unify: params broadcast to per-stage rows (N, p_dim).
            ps = params if params.ndim == 2 else jnp.tile(params[None], (N, 1))

            def merit(xs_c, us_c):
                """Exact merit on a dynamics-FEASIBLE candidate: the true LS
                objective + the soft-bound penalty model + an L1 penalty on
                hard-bound violation. Used by the full-SQP line search (RTI
                mode never calls this); candidates are re-rolled through the
                dynamics first, so no defect term is needed and descent in
                this merit is descent in the actual NLP."""
                dxr = xs_c[:-1] - yref_x[:-1]
                dur = us_c - yref_u
                obj = 0.5 * jnp.einsum("ki,ij,kj->", dxr, self._Q, dxr)
                obj = obj + 0.5 * jnp.einsum("ki,ij,kj->", dur, self._R, dur)
                dterm = xs_c[-1] - yref_x[-1]
                obj = obj + 0.5 * dterm @ self._QN @ dterm
                # Soft input-bound L1/L2 penalty (zl/zu, Zl/Zu).
                ub_ = self._u_bounds
                vlo = jnp.maximum(jnp.where(jnp.isfinite(ub_.lb),
                                            ub_.lb - us_c, 0.0), 0.0)
                vhi = jnp.maximum(jnp.where(jnp.isfinite(ub_.ub),
                                            us_c - ub_.ub, 0.0), 0.0)
                softf = ub_.soft.astype(us_c.dtype)
                hardf = 1.0 - softf
                obj = obj + jnp.sum(softf * (ub_.zl * vlo + ub_.zu * vhi))
                obj = obj + 0.5 * jnp.sum(
                    softf * (ub_.Zl * vlo**2 + ub_.Zu * vhi**2)
                )
                obj = obj + spec.ls_penalty * jnp.sum(hardf * (vlo + vhi))
                # Hard state-bound violation (stages 1..N).
                xb_ = self._x_bounds
                xlo = jnp.maximum(jnp.where(jnp.isfinite(xb_.lb),
                                            xb_.lb - xs_c[1:], 0.0), 0.0)
                xhi = jnp.maximum(jnp.where(jnp.isfinite(xb_.ub),
                                            xs_c[1:] - xb_.ub, 0.0), 0.0)
                return obj + spec.ls_penalty * jnp.sum(xlo + xhi)

            def sqp_iter(carry, _):
                xs, us = carry
                # Pin the initial state (x0 equality bound,
                # ad_3d_optimizer.py:441-442) then linearize along the iterate.
                xs = xs.at[0].set(x0)
                A, B, c = linearize_p(F, xs, us, ps)

                Qs = jnp.concatenate(
                    [jnp.tile(self._Q[None], (N, 1, 1)), self._QN[None]], axis=0
                )
                Rs = jnp.tile(self._R[None], (N, 1, 1))
                q_lin = jnp.einsum("ij,kj->ki", self._Q, xs[:-1] - yref_x[:-1])
                q_term = self._QN @ (xs[-1] - yref_x[-1])
                q = jnp.concatenate([q_lin, q_term[None]], axis=0)
                r = jnp.einsum("ij,kj->ki", self._R, us - yref_u)

                dx0 = jnp.zeros_like(x0)
                dx, du, stats = solve_lq_ocp(
                    A, B, c, Qs, q, Rs, r, dx0,
                    self._u_bounds, self._x_bounds,
                    u_ref=us, x_ref=xs,
                    iters=spec.qp_iters,
                    reg=spec.levenberg,
                    lqr_fn=_lqr_fn(spec),
                )
                if spec.ls_steps > 1:
                    # Globalized step: candidate control sequences are
                    # re-rolled through the dynamics (feasibility
                    # restoration), then ranked by the exact merit — a
                    # fixed candidate set keeps the trace branch-free.
                    cands = 0.5 ** jnp.arange(spec.ls_steps, dtype=dtype)

                    def eval_cand(a):
                        us_c = us + a * du
                        xs_c = rollout_p(F, x0, us_c, ps)
                        return merit(xs_c, us_c), xs_c, us_c

                    ms, xss, uss = jax.vmap(eval_cand)(cands)
                    i = jnp.argmin(ms)
                    return (xss[i], uss[i]), stats["alpha"]
                return (xs + dx, us + du), stats["alpha"]

            (xs, us), alphas = jax.lax.scan(
                sqp_iter, (state.xs, state.us), None, length=spec.sqp_iters
            )

            # KKT health metric: dynamics defect norm of the returned iterate.
            defect = jax.vmap(F)(xs[:-1], us, ps) - xs[1:]
            kkt = jnp.sqrt(jnp.mean(defect**2))

            new_state = SolverState(xs=xs, us=us)
            return SolveResult(us=us, xs=xs, state=new_state,
                               kkt_residual=kkt, alpha=alphas[-1])

        self.solve = jax.jit(solve)

        def shift(state: SolverState) -> SolverState:
            """RTI shift: advance the warm start one stage (the reference's
            implicit RTI warm start + shifted backup control,
            ``ad_3d_optimizer.py:469-477``)."""
            xs = jnp.concatenate([state.xs[1:], state.xs[-1:]], axis=0)
            us = jnp.concatenate([state.us[1:], state.us[-1:]], axis=0)
            return SolverState(xs=xs, us=us)

        self.shift = jax.jit(shift)

    def init_state(self, x0, u0=None) -> SolverState:
        """Cold-start state: constant-control rollout from x0."""
        spec = self.spec
        u0 = (
            jnp.zeros(spec.nu, self.dtype)
            if u0 is None
            else jnp.asarray(u0, self.dtype)
        )
        us = jnp.tile(u0[None], (spec.n_nodes, 1))
        params = jnp.zeros((self.p_dim,), self.dtype)
        Fp = lambda x, u: self._F(x, u, params)
        xs = rollout(Fp, jnp.asarray(x0, self.dtype), us)
        return SolverState(xs=xs, us=us)


class BatchedSQPSolver:
    """Fleet-scale SQP-RTI solver: one XLA program per tick with the QP
    dispatched to the fused Pallas interior-point kernel
    (:mod:`ad_mpc_tpu.ops.pallas_lq`) on TPU, or the vmapped XLA IPM
    elsewhere.

    This is the deployment analogue of running B independent ACADOS capsules
    — except the whole fleet shares ONE compiled program and the QP runs as
    a single kernel launch with the scenario batch on the TPU lane axis.
    ``backend='xla'`` forces the vmapped :func:`solve_lq_ocp` path (used by
    the equality tests); ``'pallas'`` forces the kernel (interpret mode off
    TPU); ``'auto'`` picks pallas on TPU.
    """

    def __init__(
        self,
        spec: OCPSpec,
        dynamics: Callable,
        p_dim: int = 0,
        backend: str = "auto",
        vde: str = "auto",
        block_b: int = 128,
        interpret: Optional[bool] = None,
        mesh=None,
        roll_stages: Optional[bool] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — the batched solve is
        dispatched per-shard via ``jax.shard_map`` with the scenario batch
        split over every mesh axis, so the fused Pallas kernels run
        independently on each device (batch DP over ICI/DCN with no
        per-solve collective; SURVEY.md §2.6)."""
        self.spec = spec
        self.p_dim = p_dim
        self.mesh = mesh
        dtype = jnp.float32
        self.dtype = dtype
        base = SQPSolver(spec, dynamics, p_dim=p_dim, dtype=dtype)
        self.base = base
        self._F = base._F

        on_tpu = jax.devices()[0].platform == "tpu"
        if backend == "auto":
            backend = "pallas" if on_tpu else "xla"
        self.backend = backend

        # Linearization backend: the fused Pallas rollout+VDE kernel when
        # the dynamics is lane-polymorphic (ops/pallas_vde.py), else the
        # vmapped-jacfwd XLA sweep. 'auto' probes the dynamics layout.
        f3 = dynamics if p_dim > 0 else (lambda x, u, p: dynamics(x, u))
        if vde == "auto":
            from ad_mpc_tpu.ops.pallas_vde import (
                lane_compatible,
                mosaic_lowerable,
            )

            ok = backend == "pallas" and lane_compatible(
                f3, spec.nx, spec.nu, p_dim
            )
            if ok and on_tpu and (interpret is None or not interpret):
                # Layout compatibility is necessary but NOT sufficient: a
                # dynamics may use a primitive with no Mosaic lowering rule
                # (round-2: Pacejka's atan2). Attempt a real lowering and
                # fall back to the XLA jacfwd sweep on failure.
                ok = mosaic_lowerable(
                    f3, spec.nx, spec.nu, p_dim,
                    dt=spec.dt, rk4_steps=spec.rk4_steps,
                )
            vde = "pallas" if ok else "xla"
        self.vde = vde

        N, dt = spec.n_nodes, spec.dt
        Q, R, QN = spec.weight_arrays()

        if backend == "pallas":
            from ad_mpc_tpu.ops.pallas_lq import make_lq_solver

            self._qp = make_lq_solver(
                N, spec.nx, spec.nu, Q, R, QN,
                base._u_bounds_np, base._x_bounds_np,
                iters=spec.qp_iters, reg=spec.levenberg,
                block_b=block_b,
                interpret=(not on_tpu) if interpret is None else interpret,
                roll_stages=roll_stages,
            )
        else:
            def qp_xla(A, B, c, q, r, u_ref, x_ref):
                Qs = jnp.concatenate(
                    [jnp.tile(base._Q[None], (N, 1, 1)), base._QN[None]],
                    axis=0,
                )
                Rs = jnp.tile(base._R[None], (N, 1, 1))

                def one(A, B, c, q, r, u_ref, x_ref):
                    dx, du, stats = solve_lq_ocp(
                        A, B, c, Qs, q, Rs, r,
                        jnp.zeros(spec.nx, dtype),
                        base._u_bounds, base._x_bounds,
                        u_ref=u_ref, x_ref=x_ref,
                        iters=spec.qp_iters, reg=spec.levenberg,
                        lqr_fn=_lqr_fn(spec),
                    )
                    return dx, du, stats["alpha"][-1]

                return jax.vmap(one)(A, B, c, q, r, u_ref, x_ref)

            self._qp = qp_xla

        if self.vde == "pallas":
            from ad_mpc_tpu.ops.pallas_vde import auto_block_n, make_vde

            self._lin = make_vde(
                f3, spec.dt, N, spec.nx, spec.nu, p_dim,
                rk4_steps=spec.rk4_steps, block_b=block_b,
                interpret=(not on_tpu) if interpret is None else interpret,
                block_n=auto_block_n(f3, spec.nx, spec.nu, p_dim, N),
            )
        else:
            self._lin = jax.vmap(
                lambda xs, us, p: linearize(
                    lambda x, u: self._F(x, u, p), xs, us
                )
            )

        Qj = jnp.asarray(Q, dtype)
        QNj = jnp.asarray(QN, dtype)
        Rj = jnp.asarray(R, dtype)

        def solve(x0, yref_x, yref_u, params, state: SolverState):
            """Batched solve. Shapes: x0 (B,nx), yref_x (B,N+1,nx), yref_u
            (B,N,nu), params (B,p_dim), state arrays batched likewise."""
            x0 = x0.astype(dtype)
            yref_x = yref_x.astype(dtype)
            yref_u = yref_u.astype(dtype)
            params = params.astype(dtype)
            with jax.default_matmul_precision(spec.matmul_precision):
                if spec.yaw_wrap_idx is not None:
                    i = spec.yaw_wrap_idx
                    yref_x = yref_x.at[:, :, i].set(
                        jax.vmap(yaw_wrap_reference)(
                            yref_x[:, :, i], x0[:, i]
                        )
                    )

                lin = self._lin

                def sqp_iter(carry, _):
                    xs, us = carry
                    xs = xs.at[:, 0].set(x0)
                    A, B, c = lin(xs, us, params)
                    q_lin = jnp.einsum(
                        "ij,bkj->bki", Qj, xs[:, :-1] - yref_x[:, :-1]
                    )
                    q_term = jnp.einsum(
                        "ij,bj->bi", QNj, xs[:, -1] - yref_x[:, -1]
                    )
                    q = jnp.concatenate([q_lin, q_term[:, None]], axis=1)
                    r = jnp.einsum("ij,bkj->bki", Rj, us - yref_u)
                    dx, du, alpha = self._qp(A, B, c, q, r, us, xs)
                    return (xs + dx, us + du), alpha

                (xs, us), alphas = jax.lax.scan(
                    sqp_iter, (state.xs, state.us), None,
                    length=spec.sqp_iters,
                )

                Fv = jax.vmap(jax.vmap(self._F, in_axes=(0, 0, None)),
                              in_axes=(0, 0, 0))
                defect = Fv(xs[:, :-1], us, params) - xs[:, 1:]
                kkt = jnp.sqrt(jnp.mean(defect**2, axis=(1, 2)))

                new_state = SolverState(xs=xs, us=us)
                return SolveResult(us=us, xs=xs, state=new_state,
                                   kkt_residual=kkt, alpha=alphas[-1])

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            # Batch dim sharded over ALL mesh axes (host-major on a 2-D
            # host x chip mesh); everything else replicated within a shard.
            b = P(tuple(mesh.axis_names))
            st_spec = SolverState(xs=b, us=b)
            # check_vma off: the body is pure per-shard compute (no
            # collectives), and the varying-axis checker rejects scan
            # carries seeded from replicated constants inside the shard.
            solve = shard_map(
                solve,
                mesh=mesh,
                in_specs=(b, b, b, b, st_spec),
                out_specs=SolveResult(
                    us=b, xs=b, state=st_spec, kkt_residual=b, alpha=b
                ),
                check_vma=False,
            )

        self._solve_fn = solve  # pre-jit (compose into larger programs)
        self.solve = jax.jit(solve)

        def shift(state: SolverState) -> SolverState:
            xs = jnp.concatenate([state.xs[:, 1:], state.xs[:, -1:]], axis=1)
            us = jnp.concatenate([state.us[:, 1:], state.us[:, -1:]], axis=1)
            return SolverState(xs=xs, us=us)

        self._shift_fn = shift
        self.shift = jax.jit(shift)

    def init_state(self, x0s) -> SolverState:
        """Cold start for a (B, nx) batch: constant-state warm start."""
        x0s = jnp.asarray(x0s, self.dtype)
        N = self.spec.n_nodes
        xs = jnp.tile(x0s[:, None], (1, N + 1, 1))
        us = jnp.zeros((x0s.shape[0], N, self.spec.nu), self.dtype)
        return SolverState(xs=xs, us=us)
