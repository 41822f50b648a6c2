"""Batched quadrotor MPC fleet for the benchmark (BENCH config 5).

Runs the reference quadrotor OCP dims (nx=13, nu=4, N=10, tf=1 s —
``ros_gp_mpc/acados_models/my_quad_acados_ocp.json``) through
:class:`ad_mpc_tpu.ocp.solver.BatchedSQPSolver`, i.e. the same fused-kernel
deployment path the vehicle fleet uses: the box-constrained QP runs as the
single-launch Pallas interior-point kernel on TPU (inputs in [0,1]^4,
``quad_3d.py:53-55``), and the linearization rides the fused Pallas VDE
kernel via :func:`ad_mpc_tpu.models.quadrotor.quad_dynamics_lane` — the
entrywise (lane-polymorphic) form of the quaternion dynamics, equality-
tested against the matmul form in ``tests/test_pallas_vde.py``.

Scenario: each fleet member tracks a circular trajectory of per-scenario
radius/speed/altitude (the reference's ``loop_trajectory`` family,
``src/utils/trajectories.py:357-466``) with hover attitude references —
closed loop against the RK4 plant with quaternion renormalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import quad_spec
from ad_mpc_tpu.models.quadrotor import (
    QuadrotorParams,
    hover_input,
    quad_dynamics_lane,
)
from ad_mpc_tpu.ocp.solver import BatchedSQPSolver, SolverState


def circle_reference(theta0, radius, omega, alt, N, dt):
    """(N+1, 13) state reference along a horizontal circle: position and
    world velocity from the circle geometry, hover attitude, zero rates."""
    th = theta0 + omega * jnp.arange(N + 1, dtype=jnp.float32) * dt
    zeros = jnp.zeros_like(th)
    ones = jnp.ones_like(th)
    return jnp.stack(
        [
            radius * jnp.cos(th),
            radius * jnp.sin(th),
            jnp.full_like(th, alt),
            ones, zeros, zeros, zeros,  # q = identity (hover attitude)
            -radius * omega * jnp.sin(th),
            radius * omega * jnp.cos(th),
            zeros,
            zeros, zeros, zeros,
        ],
        axis=-1,
    )


def make_quad_scenarios(batch, seed=0):
    rng = np.random.default_rng(seed)
    radius = rng.uniform(2.0, 6.0, batch).astype(np.float32)
    speed = rng.uniform(1.0, 4.0, batch).astype(np.float32)
    alt = rng.uniform(1.0, 3.0, batch).astype(np.float32)
    return jnp.asarray(radius), jnp.asarray(speed), jnp.asarray(alt)


def make_quad_gp_ensemble(seed: int = 23, n: int = 32):
    """Synthetic-but-real GP ensemble on the quadrotor's aerodynamic
    residual layout (the reference's RA-L flagship: GP corrections on the
    body-frame velocity dynamics, ``quad_3d_optimizer.py:289-327`` —
    out dims 7/8/9, features = body-frame velocities)."""
    from ad_mpc_tpu.learned.ensemble import GPEnsemble
    from ad_mpc_tpu.learned.gp import GPParams

    rng = np.random.default_rng(seed)
    gps = [[], [], []]
    for dim in range(3):
        X = rng.uniform(-5.0, 5.0, (n, 3))
        # Drag-like residual: quadratic in the dim's own body velocity.
        y = -0.03 * X[:, dim] * np.abs(X[:, dim]) + 0.01 * X[:, (dim + 1) % 3]
        ls = np.full(3, 2.5)
        sf, sn = 0.05, 0.02
        diff = (X[:, None, :] - X[None, :, :]) / ls
        K = sf * np.exp(-0.5 * np.sum(diff * diff, axis=-1))
        K += (sn**2 + 1e-6) * np.eye(n)
        gps[dim].append(GPParams(
            x_train=X, k_inv_y=np.linalg.solve(K, y - y.mean()),
            len_scale=ls, sigma_f=sf, sigma_n=sn, y_mean=float(y.mean()),
            centroid=X.mean(axis=0),
        ))
    return GPEnsemble.from_gps(gps, out_idx=(7, 8, 9), feat_idx=(7, 8, 9))


def build_quad_fleet(n_nodes: int = 10, qp_iters: int = 18, backend=None,
                     params: QuadrotorParams = QuadrotorParams(),
                     ensemble=None, sqp_iters: int = 1):
    """Closed-loop quad fleet factory mirroring ``bench.build_fleet``.

    ``ensemble``: optional GPEnsemble — adds the body-frame-rotated GP
    velocity residual ``R(q) GP(v_body)`` to the nominal dynamics, exactly
    the GP-augmented model the reference bakes into per-cluster codegen
    (``quad_3d_optimizer.py:289-327``), in the lane-polymorphic form of
    :mod:`ad_mpc_tpu.learned.lane` — so the GP mean evaluates INSIDE the
    fused Pallas VDE kernel (the reference inlines the symbolic mean into
    its ACADOS codegen; here the inlining is the dynamics closure itself)
    and the whole GP fleet remains ONE compiled program.

    Returns (tick, init, solver, spec); tick(carry) -> (carry, (kkt, lat)).
    """
    spec = quad_spec(n_nodes=n_nodes, qp_iters=qp_iters,
                     sqp_iters=sqp_iters)
    kw = {} if backend is None else {"backend": backend}

    if ensemble is None:
        dyn = lambda x, u: quad_dynamics_lane(x, u, None, params)
    else:
        from ad_mpc_tpu.learned.lane import (
            add_rows,
            quad_lane_residual_terms,
        )

        def dyn(x, u):
            base = quad_dynamics_lane(x, u, None, params)
            return add_rows(base, quad_lane_residual_terms(ensemble, x))

    solver = BatchedSQPSolver(spec, dyn, p_dim=0, **kw)
    N, dt = spec.n_nodes, spec.dt
    u_hover = jnp.asarray(hover_input(params), jnp.float32)

    ref_v = jax.vmap(
        lambda th, r, om, al: circle_reference(th, r, om, al, N, dt)
    )

    def renorm(x):
        q = x[3:7]
        return x.at[3:7].set(q / jnp.linalg.norm(q))

    F_v = jax.vmap(solver._F)

    def tick(carry):
        x0, theta, radius, speed, alt, states = carry
        omega = speed / radius
        yref_x = ref_v(theta, radius, omega, alt)
        yref_u = jnp.tile(u_hover[None, None], (x0.shape[0], N, 1))
        p = jnp.zeros((x0.shape[0], 0), jnp.float32)
        res = solver.solve(x0, yref_x, yref_u, p, states)
        x_next = jax.vmap(renorm)(F_v(x0, res.us[:, 0], p))
        states = solver.shift(res.state)
        lat = jnp.linalg.norm(x_next[:, :3] - yref_x[:, 1, :3], axis=-1)
        return (x_next, theta + omega * dt, radius, speed, alt, states), (
            res.kkt_residual, jnp.mean(lat)
        )

    tick = jax.jit(tick, donate_argnums=(0,))

    def init(batch, seed=0, extra_seed=1):
        radius, speed, alt = make_quad_scenarios(batch, seed)
        theta = jnp.zeros((batch,), jnp.float32)
        x0 = jax.vmap(
            lambda r, om, al: circle_reference(0.0, r, om, al, 0, dt)[0]
        )(radius, speed / radius, alt)

        def one_state(x):
            return SolverState(
                xs=jnp.tile(x[None], (N + 1, 1)),
                us=jnp.tile(u_hover[None], (N, 1)),
            )

        states = jax.vmap(one_state)(x0)
        return (x0, theta, radius, speed, alt, states)

    return tick, init, solver, spec


def rti_vs_converged_quad(carry, n_check=64, n_nodes=10, ensemble=None,
                          deployed_sqp_iters=1):
    """Deployed-RTI-vs-converged-SQP u0 gate for the quad fleet (the same
    check ``bench.rti_vs_converged`` applies to the vehicle configs): from
    a live fleet state, u0 of the deployed tick (``deployed_sqp_iters``
    Gauss-Newton iterations) must agree with a fully converged
    multi-iteration SQP solve — the measure that the RTI KKT defect is
    linearization residue, not solution error."""
    x0, theta, radius, speed, alt, states = carry
    m = min(n_check, x0.shape[0])
    x0m = x0[:m]
    st_m = jax.tree.map(lambda t: t[:m], states)

    _, _, sol1, spec = build_quad_fleet(n_nodes=n_nodes, qp_iters=18,
                                        sqp_iters=deployed_sqp_iters,
                                        ensemble=ensemble)
    _, _, sol6, _ = build_quad_fleet(n_nodes=n_nodes, qp_iters=24,
                                     sqp_iters=6, ensemble=ensemble)

    N, dt = spec.n_nodes, spec.dt
    om = (speed / radius)[:m]
    yref_x = jax.vmap(
        lambda th, r, o, al: circle_reference(th, r, o, al, N, dt)
    )(theta[:m], radius[:m], om, alt[:m])
    u_h = jnp.asarray(hover_input(), jnp.float32)
    yref_u = jnp.tile(u_h[None, None], (m, N, 1))
    p = jnp.zeros((m, 0), jnp.float32)
    u_rti = sol1.solve(x0m, yref_x, yref_u, p, st_m).us[:, 0]
    u_cvg = sol6.solve(x0m, yref_x, yref_u, p, st_m).us[:, 0]
    return float(jnp.max(jnp.abs(u_rti - u_cvg)))
