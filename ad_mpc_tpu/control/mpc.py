"""MPC controller facades: the L3/L4 layer of the reference
(``AD3DMPC``/``Quad3DMPC``/``ROSGPMPC``) as thin wrappers over one jitted
SQP-RTI solver.

Unlike the reference — which compiles one ACADOS solver per model variant and
mutates hidden C state — these facades hold only (a) the compiled solve
function and (b) an explicit, functional warm-start ``SolverState``. Batched
fleet operation therefore needs no new machinery: vmap the pure parts and
carry stacked states.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control import safety
from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics, blend_switch
from ad_mpc_tpu.models.quadrotor import QuadrotorParams, quad_dynamics
from ad_mpc_tpu.ocp.solver import SQPSolver, SolverState
from ad_mpc_tpu.ocp.spec import OCPSpec


def bicycle_spec(
    t_horizon: float = 2.0,
    n_nodes: int = 40,
    q_cost=(10.0, 10.0, 100.0, 0.0, 0.0, 0.0, 0.0),
    r_cost=(1.0, 100.0),
    params: BicycleParams = BicycleParams(),
    sqp_iters: int = 1,
    qp_iters: int = 18,
) -> OCPSpec:
    """AD OCP spec with the reference's dims/weights/bounds:
    N=40, tf=2 s, Q/R from the node (``create_ros_ad_mpc.py:26-44``),
    W_e = Q*1e-6, soft input box + hard steering box
    (``ad_3d_optimizer.py:146-198``)."""
    p = params
    return OCPSpec(
        n_nodes=n_nodes,
        t_horizon=t_horizon,
        nx=7,
        nu=2,
        q_cost=tuple(q_cost),
        r_cost=tuple(r_cost),
        w_e_cost=tuple(1e-6 * np.asarray(q_cost)),
        lbu=(p.acc_min, p.steering_rate_min),
        ubu=(p.acc_max, p.steering_rate_max),
        lbx=(-np.inf,) * 6 + (p.steering_min,),
        ubx=(np.inf,) * 6 + (p.steering_max,),
        soft_u=(True, True),
        zl_u=10.0,
        zu_u=10.0,
        sqp_iters=sqp_iters,
        qp_iters=qp_iters,
        yaw_wrap_idx=2,
    )


class BicycleMPC:
    """AD vehicle MPC (L3 facade + safety shell).

    ``optimize(x)`` mirrors ``AD3DMPC.optimize`` + the backup-control path of
    ``AD3DOptimizer.run_optimization``: solve, gate the solution through
    ``is_valid_command``, fall back to the shifted previous plan when
    implausible.
    """

    def __init__(
        self,
        params: BicycleParams = BicycleParams(),
        spec: Optional[OCPSpec] = None,
        point_reference: bool = False,
        dtype=jnp.float32,
    ):
        """``point_reference=True`` selects the full-SQP solver mode the
        reference uses for single-point targets (``create_ros_ad_mpc.py:88``
        switches solver_type SQP vs SQP_RTI): multiple globalized
        Gauss-Newton iterations per solve instead of one RTI step."""
        import dataclasses

        self.params = params
        self.spec = spec if spec is not None else bicycle_spec(params=params)
        if point_reference and self.spec.sqp_iters == 1:
            self.spec = dataclasses.replace(
                self.spec, sqp_iters=10, ls_steps=6
            )
        self.solver = SQPSolver(
            self.spec,
            lambda x, u, p: bicycle_dynamics(x, u, params, switch=p[0]),
            p_dim=1,
            dtype=dtype,
        )
        self.state: Optional[SolverState] = None
        self._prev_us = None
        self._yref_x = None
        self._yref_u = None

    def set_reference(self, x_ref, u_ref=None):
        """x_ref: (M, 7) state reference (padded/truncated to N+1 rows by
        repeating the last row, ``ad_3d_optimizer.py:347-349``)."""
        N = self.spec.n_nodes
        x_ref = np.atleast_2d(np.asarray(x_ref, dtype=float))
        if u_ref is None:
            u_ref = np.zeros((x_ref.shape[0], 2))
        u_ref = np.atleast_2d(np.asarray(u_ref, dtype=float))
        while x_ref.shape[0] < N + 1:
            x_ref = np.vstack([x_ref, x_ref[-1:]])
            u_ref = np.vstack([u_ref, u_ref[-1:]])
        self._yref_x = jnp.asarray(x_ref[: N + 1])
        self._yref_u = jnp.asarray(u_ref[:N])

    def optimize(self, x0, use_backup_gate: bool = True):
        """Returns (us (N,2), xs (N+1,7), ok flag)."""
        x0 = jnp.asarray(x0)
        if self.state is None:
            self.state = self.solver.init_state(x0)
        sw = blend_switch(x0[3], self.params)
        res = self.solver.solve(
            x0, self._yref_x, self._yref_u, jnp.array([sw]), self.state
        )
        self.state = self.solver.shift(res.state)

        us, xs = res.us, res.xs
        ok = bool(safety.is_valid_command(xs, self._yref_x))
        if use_backup_gate:
            if ok:
                self._prev_us = us
            elif self._prev_us is not None:
                us = safety.backup_control(self._prev_us)
                self._prev_us = us
        return us, xs, ok

    def make_fused_step(self):
        """One-device-call controller step for deployment nodes: solve +
        RTI shift + plausibility gate (``is_valid_command``) + predicted-
        trajectory health + backup-control selection composed into a single
        jitted program.

        Deployment rationale: every separate host fetch (``np.asarray`` on
        a result, ``bool()`` on a gate) pays a full host-link round trip —
        on a remote/tunneled accelerator that dominates the control period
        (measured: ~8 RTTs/tick through the unfused path). The fused step
        returns ``(cmd, healthy, state, prev_us, have_prev)`` where only
        ``(cmd, healthy)`` need fetching — ONE round trip per tick, the
        irreducible minimum for a host-side actuator.
        """
        import jax

        from ad_mpc_tpu.models.bicycle import blend_switch as _blend

        solver, params = self.solver, self.params
        N = self.spec.n_nodes
        yref_u = jnp.zeros((N, 2), jnp.float32)

        @jax.jit
        def step(packed, state, prev_us, have_prev):
            # packed (N+2, 7): row 0 = x0, rows 1: = yref_x — a SINGLE
            # host->device transfer per tick (separate puts each pay a
            # link round trip on a remote accelerator).
            x0 = packed[0]
            yref_x = packed[1:]
            sw = _blend(x0[3], params)
            res = solver.solve(x0, yref_x, yref_u,
                               jnp.stack([sw]), state)
            new_state = solver.shift(res.state)
            ok = safety.is_valid_command(res.xs, yref_x)
            pred_ok = safety.check_pred_traj(res.xs, x0)
            use_backup = (~ok) & have_prev
            us_out = jnp.where(
                use_backup, safety.backup_control(prev_us), res.us
            )
            # node-level steering integration (gp_ad_mpc_node.py:222-224)
            steer_cmd = jnp.clip(
                x0[6] + us_out[0, 1] * 0.1,
                params.steering_min, params.steering_max,
            )
            # out (4,): [accel, steer_rate, steer_cmd, healthy] — one
            # device->host fetch covers command AND watchdog signal.
            out = jnp.stack([
                us_out[0, 0], us_out[0, 1], steer_cmd,
                (ok & pred_ok).astype(jnp.float32),
            ])
            return out, new_state, us_out, have_prev | ok

        return step

    def reset(self):
        self.state = None
        self._prev_us = None


def quad_spec(
    t_horizon: float = 1.0,
    n_nodes: int = 10,
    q_cost=(10, 10, 10, 0.1, 0.1, 0.1, 0.1, 0.05, 0.05, 0.05, 0.05, 0.05, 0.05),
    r_cost=(0.1, 0.1, 0.1, 0.1),
    sqp_iters: int = 1,
    qp_iters: int = 18,
) -> OCPSpec:
    """Quadrotor OCP spec mirroring the reference dims and weights (N=10,
    tf=1 s, nx=13, nu=4, input box [0,1]; 12-weight q_cost expanded with the
    quaternion-norm extra weight -> 13 diagonal entries,
    ``quad_3d_optimizer.py:52-55, 139, 199-203``)."""
    return OCPSpec(
        n_nodes=n_nodes,
        t_horizon=t_horizon,
        nx=13,
        nu=4,
        q_cost=tuple(q_cost),
        r_cost=tuple(r_cost),
        w_e_cost=tuple(q_cost),
        lbu=(0.0,) * 4,
        ubu=(1.0,) * 4,
        sqp_iters=sqp_iters,
        qp_iters=qp_iters,
    )


class QuadMPC:
    """Quadrotor MPC facade (``Quad3DMPC`` capability set: nominal / RDRv /
    GP-ensemble models).

    GP mode (``ensemble`` given) reproduces the reference's full mechanism
    (``quad_3d_optimizer.py:289-327, 489-493``):

    - **dual-state evaluation**: ``optimize(x0, gp_x0=...)`` evaluates the
      GP at node 0 on a second (EKF) state estimate while the dynamics use
      the control state — the ACADOS ``trigger`` stage parameter, here a
      per-stage parameter row that is 1 only at node 0;
    - **per-solve cluster selection**: the cluster is picked by nearest
      centroid at the horizon-midpoint state of the current warm start
      (``select_gp`` on node N/2) and pinned for the whole solve via the
      stage parameters — no per-cluster recompilation.
    """

    def __init__(
        self,
        params: QuadrotorParams = QuadrotorParams(),
        spec: Optional[OCPSpec] = None,
        rdrv_d=None,
        residual_fn=None,
        ensemble=None,
        dtype=jnp.float32,
    ):
        self.params = params
        self.spec = spec if spec is not None else quad_spec()
        self.ensemble = ensemble
        self.last_cluster = None
        self.n_resets = 0  # solver-health resets (observability)

        if ensemble is not None:
            from ad_mpc_tpu.learned.ensemble import (
                body_frame_features,
                predict,
            )
            from ad_mpc_tpu.utils.math import v_dot_q

            D = len(ensemble.out_idx)
            self._gp_D = D
            out_idx = ensemble.out_idx

            def dyn(x, u, p):
                # p = [trigger, mu0_body (D,), cluster_idx (D,)]
                trigger = p[0]
                mu0 = p[1 : 1 + D]
                cl = p[1 + D : 1 + 2 * D].astype(jnp.int32)
                z = body_frame_features(x, ensemble.feat_idx)
                mu = predict(ensemble, z, cluster_idx=cl)
                mu = jnp.where(trigger > 0.5, mu0, mu).astype(
                    jnp.result_type(x)
                )
                full_body = jnp.zeros(3, jnp.result_type(x))
                for k, dim in enumerate(out_idx):
                    full_body = full_body.at[dim - 7].set(mu[k])
                mu_world = v_dot_q(full_body, x[3:7])
                xd = quad_dynamics(x, u, params, rdrv_d=rdrv_d)
                if residual_fn is not None:
                    xd = xd + residual_fn(x, u)
                return xd.at[7:10].add(mu_world)

            self.solver = SQPSolver(
                self.spec, dyn, p_dim=1 + 2 * D, dtype=dtype
            )
        else:

            def dyn(x, u):
                xd = quad_dynamics(x, u, params, rdrv_d=rdrv_d)
                if residual_fn is not None:
                    xd = xd + residual_fn(x, u)
                return xd

            self.solver = SQPSolver(self.spec, dyn, p_dim=0, dtype=dtype)
        self.state: Optional[SolverState] = None
        self._yref_x = None
        self._yref_u = None

    def set_reference(self, x_ref, u_ref=None):
        N = self.spec.n_nodes
        x_ref = np.atleast_2d(np.asarray(x_ref, dtype=float))
        if x_ref.shape[0] == 1:
            x_ref = np.tile(x_ref, (N + 1, 1))
        if u_ref is None:
            u_ref = np.zeros((x_ref.shape[0], 4))
        u_ref = np.atleast_2d(np.asarray(u_ref, dtype=float))
        while x_ref.shape[0] < N + 1:
            x_ref = np.vstack([x_ref, x_ref[-1:]])
            u_ref = np.vstack([u_ref, u_ref[-1:]])
        self._yref_x = jnp.asarray(x_ref[: N + 1])
        self._yref_u = jnp.asarray(u_ref[:N])

    def optimize(self, x0, gp_x0=None):
        """One solve. ``gp_x0``: optional second (EKF) state estimate used
        ONLY for the node-0 GP evaluation (``quad_3d.py:112-132``, the
        reference's ``set_gp_state``); dynamics and x0 bound use ``x0``."""
        x0 = jnp.asarray(x0)
        if self.state is None:
            self.state = self.solver.init_state(x0)
        else:
            # RTI manifold retraction: project the warm-start quaternions
            # back to unit norm before linearizing. The OCP treats q as 4
            # generic states (as ACADOS does); on aggressive references the
            # iterate's quaternion norm can drift far off the manifold
            # (observed: ||q|| -> 3.5 on random min-snap flights), where
            # the linearized dynamics become violent enough to NaN the QP.
            # The quaternion-norm cost weight alone (quad_3d_optimizer
            # .py:139) does not bound the drift at RTI=1 iteration.
            qs = self.state.xs[:, 3:7]
            qs = qs / jnp.linalg.norm(qs, axis=1, keepdims=True)
            self.state = self.state._replace(
                xs=self.state.xs.at[:, 3:7].set(qs)
            )

        if self.ensemble is None:
            params = jnp.zeros((0,))
        else:
            from ad_mpc_tpu.learned.ensemble import (
                body_frame_features,
                predict,
                select_cluster,
            )

            ens = self.ensemble
            N = self.spec.n_nodes
            D = self._gp_D
            # Per-solve cluster from the horizon-midpoint warm-start state
            # (quad_3d_optimizer.py:489-493).
            z_mid = body_frame_features(self.state.xs[N // 2], ens.feat_idx)
            cl = select_cluster(ens, z_mid)
            self.last_cluster = np.asarray(cl)
            # Node-0 GP mean from the GP-specific state estimate.
            x_gp = x0 if gp_x0 is None else jnp.asarray(gp_x0)
            mu0 = predict(
                ens, body_frame_features(x_gp, ens.feat_idx), cluster_idx=cl
            )
            trigger = jnp.zeros((N, 1)).at[0, 0].set(1.0)
            row = jnp.concatenate([mu0, cl.astype(mu0.dtype)])
            params = jnp.concatenate(
                [trigger, jnp.tile(row[None], (N, 1))], axis=1
            )

        res = self.solver.solve(
            x0, self._yref_x, self._yref_u, params, self.state
        )

        # Solver-health watchdog (the reference resets its optimizer on
        # infeasibility, gp_ad_mpc_node.py:154-158, 206-208): a non-finite
        # or physically implausible iterate (observed: RTI divergence to
        # |v| ~ 8e4 m/s under a misextrapolating RDRv model on aggressive
        # random flights) would poison every later warm start. ONE fused
        # scalar fetch decides (a remote accelerator pays a link RTT per
        # fetch): inf when any of us/xs is non-finite, else the velocity
        # magnitude.
        def health(r):
            ok = jnp.all(jnp.isfinite(r.us)) & jnp.all(jnp.isfinite(r.xs))
            return jnp.where(
                ok, jnp.max(jnp.abs(r.xs[:, 7:10])), jnp.inf
            )

        if not float(health(res)) < 100.0:
            # Reset the RTI iterate to the current state and re-solve once.
            self.n_resets += 1
            self.state = self.solver.init_state(x0)
            res = self.solver.solve(
                x0, self._yref_x, self._yref_u, params, self.state
            )
            if not float(health(res)) < 100.0:
                # Still pathological from a clean cold start: do NOT store
                # the poisoned iterate — next tick starts fresh. The
                # caller still receives this solve's output and must apply
                # its own actuation-level guards (the closed-loop nodes'
                # safety shell does).
                self.state = None
                return res.us, res.xs
        self.state = self.solver.shift(res.state)
        return res.us, res.xs

    def reset(self):
        self.state = None
