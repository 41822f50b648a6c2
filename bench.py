"""Benchmark: batched closed-loop MPC solves/s on the available accelerator.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": r}
and writes per-config detail to BENCH_DETAIL.json.

Configs (BASELINE.json), each swept over a batch ladder to its knee:
  2. dynamic bicycle, linear tire, N=30 — the DYNAMIC branch is driven
     explicitly (switch=1), not via the blend speeds (the reference's
     blend_min=100 m/s would silently select the kinematic branch at road
     speeds, ``ad_3d.py:62-64``). Headline = best c2 row.
  3. GP-augmented dynamic bicycle: GP residual on the lateral dynamics
     (v_y_dot, psi_ddot), the SE mean fused INSIDE the Pallas VDE kernel
     (learned/lane.py), N=30.
  4. Pacejka magic formula + road topography: 4096-scenario friction /
     pitch / roll sweep, one compiled program (per-scenario p vector).
  5. quadrotor fleet at the reference dims (N=10, nx=13, nu=4) + its
     RTI-vs-converged u0 gate.
  6. GP-augmented quadrotor fleet (the reference's RA-L flagship), GP
     fused in-kernel.
  (1 is the CPU offline loop, ``experiments/ad_closed_loop.py``; multi-
  host is covered by ``dryrun_multichip`` + ``parallel/multihost.py``.)
Plus: device-resident single-solve latency, BOTH deployment-loop modes
(blocking and pipelined; ``experiments/deployment_loop.py``), and the
MXU-vs-VPU micro row (``experiments/mxu_riccati.py``).

Every tick is the full closed-loop unit of work: build the reference window
on-device, one SQP-RTI solve per scenario, advance the plant by the applied
control, shift the warm start (SURVEY.md §3.1).

Quality gates (VERDICT round-1): the bench FAILS (exit 1) when solution
quality regresses —
  - RTI-vs-converged: u0 of the deployed 1-iteration RTI tick must agree
    with a fully converged SQP solve from the same warm start;
  - closed-loop tracking: mean lateral distance of the fleet to its
    reference must stay small;
  - KKT dynamics-defect of the returned iterate must stay small.

vs_baseline normalizes against the reference-derived per-chip target:
BASELINE.json asks >=10k solves/s on a v5p-16 (8 chips) => 1250/chip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.control.mpc import bicycle_spec
from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
from ad_mpc_tpu.ocp.solver import BatchedSQPSolver, SolverState

PER_CHIP_TARGET = 10_000 / 8  # BASELINE: 10k solves/s on v5p-16 (8 chips)

# QP backend: 'auto' resolves to the fused Pallas interior-point kernel on
# TPU (one launch, scenario batch on the lane axis) and the XLA IPM
# elsewhere. Measured backend comparisons live in BENCH_DETAIL.json, which
# this script regenerates — not in comments.
BENCH_BACKEND = "auto"
LATENCY_BACKEND = "auto"  # auto -> pallas on TPU


def make_scenarios(batch, seed=0):
    """Per-scenario (speed, curvature): arcs the vehicle can actually track
    (|v^2 kappa| <= 6 m/s^2 lateral, |kappa| <= 0.05 1/m)."""
    rng = np.random.default_rng(seed)
    v = rng.uniform(5.0, 15.0, batch).astype(np.float32)
    kmax = np.minimum(0.05, 6.0 / v**2)
    kappa = rng.uniform(-1.0, 1.0, batch).astype(np.float32) * kmax
    return jnp.asarray(v), jnp.asarray(kappa.astype(np.float32))


def arc_reference(v, kappa, s0, N, dt, wheelbase):
    """(N+1, 7) state reference along a constant-curvature arc starting at
    arc length s0 from the origin. Closed form, jit-friendly."""
    s = s0 + v * jnp.arange(N + 1, dtype=jnp.float32) * dt
    k = jnp.where(jnp.abs(kappa) < 1e-6, 1e-6, kappa)
    psi = k * s
    x = jnp.sin(psi) / k
    y = (1.0 - jnp.cos(psi)) / k
    x = jnp.where(jnp.abs(kappa) < 1e-6, s, x)
    y = jnp.where(jnp.abs(kappa) < 1e-6, jnp.zeros_like(s), y)
    delta = jnp.arctan(kappa * wheelbase)
    ref = jnp.stack(
        [
            x,
            y,
            psi,
            jnp.full_like(s, v),
            jnp.zeros_like(s),
            jnp.full_like(s, kappa * v),
            jnp.full_like(s, delta),
        ],
        axis=-1,
    )
    return ref


def _project_arc(x0, s0, kappa):
    """Arc length of the point on the arc closest to the vehicle, unwrapped
    near the previous anchor s0 (closed-form closest-waypoint search,
    ``ref_traj.py:103-116``)."""
    px, py = x0[0], x0[1]
    k = kappa
    ang = jnp.arctan2(k * px, 1.0 - k * py)
    ks0 = k * s0
    ang = ks0 + jnp.arctan2(jnp.sin(ang - ks0), jnp.cos(ang - ks0))
    s_arc = ang / jnp.where(jnp.abs(k) < 1e-6, 1e-6, k)
    return jnp.where(jnp.abs(k) < 1e-6, px, s_arc)


def build_fleet(
    dynamics,
    p_of_scenario,
    n_nodes=30,
    qp_iters=12,
    sqp_iters=1,
    wheelbase=2.7,
    backend=None,
    v_cap=None,
):
    """Generic closed-loop fleet factory over :class:`BatchedSQPSolver`:
    reference windows built vmapped in XLA, the QP solved by the fused
    Pallas interior-point kernel on TPU (XLA IPM elsewhere).

    dynamics(x, u, p): continuous model with per-scenario parameter vector;
    p_of_scenario(v, kappa, extra): builds the per-scenario p.
    Returns (tick, init, solver, spec): tick(carry) -> (carry, (kkt, lat)).
    """
    spec = bicycle_spec(
        t_horizon=n_nodes * 0.05, n_nodes=n_nodes,
        qp_iters=qp_iters, sqp_iters=sqp_iters,
    )
    if backend is None:
        backend = BENCH_BACKEND
    p_dim = int(np.asarray(p_of_scenario(5.0, 0.0, np.zeros(8))).shape[0])
    solver = BatchedSQPSolver(spec, dynamics, p_dim=p_dim, backend=backend)
    N, dt = spec.n_nodes, spec.dt

    proj_v = jax.vmap(_project_arc)
    ref_v = jax.vmap(
        lambda v, k, s0: arc_reference(v, k, s0, N, dt, wheelbase)
    )
    F_v = jax.vmap(solver._F)

    def tick(carry):
        x0, s0, v, kappa, p, states = carry
        s0 = proj_v(x0, s0, kappa)
        yref_x = ref_v(v, kappa, s0)
        yref_u = jnp.zeros((x0.shape[0], N, 2), jnp.float32)
        res = solver.solve(x0, yref_x, yref_u, p, states)
        x_next = F_v(x0, res.us[:, 0], p)
        states = solver.shift(res.state)
        # Mean lateral tracking error of the fleet (quality gate signal).
        lat = jnp.sqrt(
            (x_next[:, 0] - yref_x[:, 1, 0]) ** 2
            + (x_next[:, 1] - yref_x[:, 1, 1]) ** 2
        )
        return (x_next, s0, v, kappa, p, states), (
            res.kkt_residual, jnp.mean(lat)
        )

    tick = jax.jit(tick, donate_argnums=(0,))

    def init(batch, seed=0, extra_seed=1):
        v, kappa = make_scenarios(batch, seed)
        v, kappa = np.asarray(v), np.asarray(kappa)
        rng = np.random.default_rng(extra_seed)
        extras = rng.uniform(0.0, 1.0, (batch, 8)).astype(np.float32)
        p_np = np.stack(
            [np.asarray(p_of_scenario(float(vv), float(kk), ee))
             for vv, kk, ee in zip(v, kappa, extras)]
        ).astype(np.float32)
        if v_cap is not None:
            # Reference-velocity envelope (resample_vel semantics) — the
            # drawn parameters may make the drawn speed physically
            # untrackable; cap before the scenario ever reaches the solver.
            v = np.minimum(v, v_cap(v, kappa, p_np)).astype(np.float32)
        p = jnp.asarray(p_np)
        v = jnp.asarray(v)
        kappa = jnp.asarray(kappa)
        x0 = jnp.zeros((batch, 7), jnp.float32)
        x0 = x0.at[:, 3].set(v)
        s0 = jnp.zeros((batch,), jnp.float32)

        def one_state(x):
            return SolverState(
                xs=jnp.tile(x[None], (N + 1, 1)),
                us=jnp.zeros((N, 2), jnp.float32),
            )

        states = jax.vmap(one_state)(x0)
        return (x0, s0, v, kappa, p, states)

    return tick, init, solver, spec


# ------------------------------------------------------------- model configs

_BP = BicycleParams()


def dynamic_bicycle(x, u, p):
    """Linear-tire dynamic bicycle: the tire branch is driven explicitly by
    p[0]=1 (BASELINE config 2 really exercises Cf/Cr)."""
    return bicycle_dynamics(x, u, _BP, switch=p[0])


def make_gp_bicycle():
    """GP-augmented dynamic bicycle (BASELINE config 3): a synthetic-but-real
    GP ensemble (32 points, 4 features, 2 output dims on v_y_dot/psi_ddot)
    fused into the RK4 rollout in lane-polymorphic form
    (:mod:`ad_mpc_tpu.learned.lane`), so the VDE runs the fused Pallas
    kernel — the TPU analogue of the reference inlining the symbolic GP
    mean into its solver codegen (``quad_3d_optimizer.py:289-327``)."""
    from ad_mpc_tpu.learned.ensemble import GPEnsemble
    from ad_mpc_tpu.learned.gp import GPParams
    from ad_mpc_tpu.learned.lane import add_rows, lane_residual_terms

    rng = np.random.default_rng(11)
    n, d = 32, 4
    gps = [[], []]
    for dim in range(2):
        X = rng.uniform(
            [-0.0, -1.0, -0.5, -0.5], [15.0, 1.0, 0.5, 0.5], (n, d)
        )
        y = 0.05 * np.sin(X[:, 1] * 3.0) + 0.02 * X[:, 2] * (dim + 1)
        ls = np.array([5.0, 0.5, 0.3, 0.3])
        sf, sn = 0.01, 0.05
        diff = (X[:, None, :] - X[None, :, :]) / ls
        K = sf * np.exp(-0.5 * np.sum(diff * diff, axis=-1))
        K += (sn**2 + 1e-6) * np.eye(n)
        gps[dim].append(
            GPParams(
                x_train=X,
                k_inv_y=np.linalg.solve(K, y - y.mean()),
                len_scale=ls,
                sigma_f=sf,
                sigma_n=sn,
                y_mean=float(y.mean()),
                centroid=X.mean(axis=0),
            )
        )
    ens = GPEnsemble.from_gps(gps, out_idx=(4, 5), feat_idx=(3, 4, 5, 6))

    def gp_bicycle(x, u, p):
        base = bicycle_dynamics(x, u, _BP, switch=p[0])
        return add_rows(base, lane_residual_terms(ens, x))

    return gp_bicycle


def make_pacejka():
    """Pacejka + road topography (BASELINE config 4): p = [mu, pitch, roll]
    drawn per scenario — a friction/stiffness/topography sweep in ONE
    compiled program."""
    from ad_mpc_tpu.models.pacejka import PacejkaParams, pacejka_dynamics_p

    pp = PacejkaParams()

    def dyn(x, u, p):
        return pacejka_dynamics_p(x, u, p, pp)

    def p_of(v, kappa, extra):
        mu = 0.6 + 0.5 * extra[0]  # friction in [0.6, 1.1]
        pitch = (extra[1] - 0.5) * 0.12  # +-3.4 deg
        roll = (extra[2] - 0.5) * 0.10
        b_scale = 0.8 + 0.4 * extra[3]  # stiffness factor draw
        d_scale = 0.85 + 0.3 * extra[4]  # peak factor draw
        return np.array([mu, pitch, roll, b_scale, d_scale], np.float32)

    def v_cap(v, kappa, p):
        """Friction-circle reference-velocity envelope: cap the demanded
        lateral acceleration v^2|kappa| at 75% of the drawn tire limit
        mu*g*D. Analogous in spirit to the reference's ``resample_vel``,
        which caps reference speed by the LONGITUDINAL acceleration-
        reachability envelope (``nodes/gp_ad_mpc_node.py:344-349``) — the
        shared principle is that the reference generator must not demand
        physically unreachable motion; the lateral friction-circle form
        here is ours. Without it the sweep asks a handful of low-mu
        scenarios to corner beyond physics, and their (correctly)
        unattainable solves dominate kkt_max (diagnosed round 3: all
        kkt>9e-4 scenarios had a_y demand > 0.9 mu g D). Margin 0.75: at
        0.85 the fleet still grazes saturation transiently (measured kkt
        spikes to 1.9e-2 around tick 40); at 0.75 steady-state kkt_max
        settles below 1e-5, within one order of the linear-tire fleet."""
        a_y_max = 0.75 * p[:, 0] * 9.81 * p[:, 4]
        v_max = np.sqrt(a_y_max / np.maximum(np.abs(kappa), 1e-3))
        return np.minimum(v, v_max)

    return dyn, p_of, v_cap


# ----------------------------------------------------------------- measuring

def run_config(tick, init, batch, ticks=20, warmup=5, seed=0, notes=None):
    """One measured row. The returned dict is self-describing (ADVICE r3):
    it records its own measurement window (warmup/ticks) and any scenario
    filtering notes, so rows with different windows are comparable by
    inspection instead of by reading this file's history."""
    carry = init(batch, seed)
    tic0 = time.perf_counter()
    carry, (kkt, lat) = tick(carry)  # first call: XLA/Mosaic compile
    jax.block_until_ready(kkt)
    compile_s = time.perf_counter() - tic0
    for _ in range(warmup - 1):
        carry, (kkt, lat) = tick(carry)
    _ = float(jnp.max(kkt))
    tic = time.perf_counter()
    for _ in range(ticks):
        carry, (kkt, lat) = tick(carry)
    # Close the window on a SCALAR FETCH of a value that depends on the
    # last tick (ticks chain through the donated carry, so it transitively
    # depends on all of them): on the tunneled runtime block_until_ready
    # has been observed returning without serializing on device work
    # (r5 investigation); a value fetch cannot. Costs one link RTT per
    # window — same order as an honest block, and conservative.
    _ = float(jnp.max(kkt))
    dt = time.perf_counter() - tic
    if dt / ticks < 5e-4:
        # Implausible: no full fleet solve completes in <0.5 ms/tick (the
        # b=1 device-resident tick alone is ~0.7 ms). Observed once through
        # the tunneled runtime: the async dispatch chain resolved without
        # actually serializing on device work, yielding a nonsense 3e8
        # solves/s row. Re-measure with a per-tick blocking loop — slower
        # but unfakeable.
        tic = time.perf_counter()
        for _ in range(ticks):
            carry, (kkt, lat) = tick(carry)
            _ = float(jnp.max(kkt))  # per-tick fetch: unfakeable
        dt = time.perf_counter() - tic
        notes = ((notes + "; ") if notes else "") + \
            "async timing implausible -> re-measured per-tick blocking"
    row = {
        "solves_per_s": batch * ticks / dt,
        "kkt_mean": float(jnp.mean(kkt)),
        "kkt_p99": float(jnp.percentile(kkt, 99)),
        "kkt_max": float(jnp.max(kkt)),
        "lat_err_mean_m": float(lat),
        "batch": batch,
        "warmup_ticks": warmup,
        "measured_ticks": ticks,
        "first_call_s": round(compile_s, 2),  # compile (or cache-load) + run
    }
    if notes:
        row["notes"] = notes
    return row, carry


def rti_vs_converged(dynamics, p_of, carry, n_check=64, n_nodes=30):
    """Quality gate: u0 of the deployed RTI tick vs a fully converged SQP
    solve from the same state/warm start (explains the KKT defect: RTI
    linearization residue, not divergence)."""
    x0, s0, v, kappa, p, states = carry
    m = min(n_check, x0.shape[0])
    x0m, s0m, vm, km, pm = x0[:m], s0[:m], v[:m], kappa[:m], p[:m]
    st_m = jax.tree.map(lambda t: t[:m], states)

    _, _, solver1, spec = build_fleet(dynamics, p_of, n_nodes=n_nodes,
                                      qp_iters=12, sqp_iters=1)
    _, _, solver8, _ = build_fleet(dynamics, p_of, n_nodes=n_nodes,
                                   qp_iters=20, sqp_iters=6)
    N, dt = spec.n_nodes, spec.dt

    s0p = jax.vmap(_project_arc)(x0m, s0m, km)
    yref_x = jax.vmap(lambda v, k, s0: arc_reference(v, k, s0, N, dt, 2.7))(
        vm, km, s0p
    )
    yref_u = jnp.zeros((m, N, 2), jnp.float32)
    u_rti = solver1.solve(x0m, yref_x, yref_u, pm, st_m).us[:, 0]
    u_cvg = solver8.solve(x0m, yref_x, yref_u, pm, st_m).us[:, 0]
    return float(jnp.max(jnp.abs(u_rti - u_cvg)))


def bench_latency(dynamics, p_of, n_nodes=30, qp_iters=12, reps=30,
                  k_ticks=50, backend=None):
    """Single-solve closed-loop latency (batch=1) vs the 20 ms budget.

    Device-resident measurement (VERDICT r2 #4): the control tick runs
    K times inside ONE jitted ``lax.fori_loop`` — the deployment mode where
    state stays on-device — and each K-tick program is timed blocking, so a
    per-tick sample is wall/K. The single host-link round trip per program
    is INCLUDED (divided by K), making every sample a conservative *upper
    bound* on device compute per tick. p50/p99 are over ``reps`` such
    samples: measured numbers, not inferences. Raw blocking per-call
    latency and the host-link floor are reported alongside for
    transparency (on a tunneled accelerator each blocking call pays the
    full link RTT, which a device-resident deployment does not)."""
    tick, init, _, _ = build_fleet(
        dynamics, p_of, n_nodes, qp_iters,
        backend=LATENCY_BACKEND if backend is None else backend,
    )
    carry = init(1)

    @jax.jit
    def k_tick(carry):
        def body(_, c):
            c, _aux = tick(c)
            return c
        return jax.lax.fori_loop(0, k_ticks, body, carry)

    carry_k = k_tick(carry)  # compile
    _ = float(carry_k[0][0, 0])
    samples = []
    for _i in range(reps):
        tic = time.perf_counter()
        carry_k = k_tick(carry_k)
        # Scalar fetch, not block_until_ready: the latter has been observed
        # not serializing on device work through the tunnel (r5); the fetch
        # RTT is the documented per-program round trip, included.
        _ = float(carry_k[0][0, 0])
        samples.append((time.perf_counter() - tic) / k_ticks)
    samples = 1e3 * np.asarray(samples)

    # Raw blocking per-call latency (includes full host-link RTT per call).
    for _ in range(3):
        carry, (kkt, _) = tick(carry)
    _ = float(jnp.max(kkt))
    ts = []
    for _i in range(reps):
        tic = time.perf_counter()
        carry, (kkt, _) = tick(carry)
        _ = float(jnp.max(kkt))
        ts.append(time.perf_counter() - tic)
    ts = 1e3 * np.asarray(ts)

    # Host-link floor: a trivial jitted op, same blocking pattern.
    x = jnp.zeros((1, 8), jnp.float32)
    triv = jax.jit(lambda v: v + 1.0)
    jax.block_until_ready(triv(x))
    tf = []
    for _ in range(reps):
        tic = time.perf_counter()
        jax.block_until_ready(triv(x))
        tf.append(time.perf_counter() - tic)
    tf = 1e3 * np.asarray(tf)

    return {
        "p50_compute": float(np.percentile(samples, 50)),
        "p99_compute": float(np.percentile(samples, 99)),
        "compute_method": f"device-resident lax.fori_loop x{k_ticks}, "
                          f"wall/{k_ticks}, {reps} samples (upper bound: "
                          "includes 1/K of one host-link RTT)",
        "p50_blocking": float(np.percentile(ts, 50)),
        "p99_blocking": float(np.percentile(ts, 99)),
        "host_link_floor_p50": float(np.percentile(tf, 50)),
        "budget": 20.0,
    }


# ---- quality gates, ratcheted to the measured operating point -------------
#
# VERDICT r3 #3: the round-3 gates sat 4+ orders above the measured values,
# so a 1000x KKT regression would still exit 0. These are per-config-family
# gates at ~10x the round-4 measured steady state (recorded in
# BENCH_DETAIL.json at the same SHA), so any real regression fails the
# official channel while run-to-run noise (±30% throughput, small kkt
# wander) does not.
# Quad configs run 2 Gauss-Newton iterations per tick: at dt=0.1 the
# attitude-dynamics linearization residue leaves a 1-iteration RTI iterate
# at kkt ~1.1-1.4e-3 (r4, grazing BASELINE's 1e-3 parity bar); the second
# iteration collapses the residue quadratically (measured r3: ~223x) at a
# measured throughput cost recorded in BENCH_DETAIL.
QUAD_SQP_ITERS = 2

GATES = {
    # measured r4: kkt_mean ~5e-7, kkt_max ~2e-6, lat ~0.16 m
    "c2_": {"kkt_mean": 5e-6, "kkt_max": 3e-5, "lat_err_mean_m": 0.4},
    "c3_": {"kkt_mean": 5e-6, "kkt_max": 3e-5, "lat_err_mean_m": 0.4},
    # measured r4: kkt_mean ~8e-7, kkt_max ~8e-6, lat ~0.03 m
    "c4_": {"kkt_mean": 8e-6, "kkt_max": 1e-4, "lat_err_mean_m": 0.15},
    # measured r5 at QUAD_SQP_ITERS=2: kkt_mean ~2e-7, kkt_max ~1.1e-5
    # (the 1-iteration RTI residue of the attitude dynamics at dt=0.1 sat
    # at 1.1-1.4e-3, grazing BASELINE's 1e-3 bar — VERDICT r4 #3; the
    # second Gauss-Newton iteration collapses it ~100x), lat ~1 mm
    "c5_": {"kkt_mean": 2e-6, "kkt_max": 1e-4, "lat_err_mean_m": 0.02},
    # fitted flagship model: its REAL drag residual (~4 m/s^2) is ~100x
    # the synthetic ensemble's, so the per-iterate linearization residue
    # is proportionally larger — measured r5: kkt_mean ~1.7e-5, max
    # ~6.5e-5 (still 15x+ under BASELINE's 1e-3 bar). Listed BEFORE the
    # "c6_" prefix so it wins the prefix match.
    "c6_fitted_": {"kkt_mean": 1e-4, "kkt_max": 5e-4,
                   "lat_err_mean_m": 0.02},
    "c6_": {"kkt_mean": 2e-6, "kkt_max": 1e-4, "lat_err_mean_m": 0.02},
}
RTI_GATES = {
    # measured r4: bicycle ~5e-5, pacejka ~7e-5; quad r5 ~4.7e-4
    "rti_vs_converged_u0": 5e-4,
    "c4_rti_vs_converged_u0": 7e-4,
    "c5_rti_vs_converged_u0": 1e-3,
    "c6_rti_vs_converged_u0": 1e-3,
}


def _gates_for(cfg_name):
    for prefix, g in GATES.items():
        if cfg_name.startswith(prefix):
            return g
    return {}


# ---- roofline accounting (VERDICT r3 #4) ----------------------------------
#
# Peak assumptions (documented, not measured): one v5e TensorCore VPU is an
# (8, 128) vector unit with 4 ALUs at ~0.94 GHz -> ~3.85e12 f32 op/s
# (counting FMA as two would double it); the MXU bf16 systolic peak is
# ~197e12 FLOP/s. The solver is a VPU program BY DESIGN (batch-on-lanes
# layout; 7x7/13x13 matrices cannot tile a 128x128 systolic array without
# >90% padding waste) — the measured MXU-packing comparison lives in
# docs/SOLVER.md §MXU.
VPU_PEAK_FLOPS = 3.85e12
MXU_PEAK_FLOPS = 197e12

# Hand-counted continuous-dynamics flop estimates (+-30% models, counting
# exp/div as one op each; derivations in docs/SOLVER.md §Roofline).
DYN_FLOPS = {
    "c2_": 90,     # blended-tire bicycle
    "c3_": 1100,   # + 2-dim 32-point SE GP mean (2*32*(3*4+3) + base)
    "c4_": 170,    # Pacejka magic formula + topography
    "c5_": 150,    # quad entrywise quaternion dynamics
    "c6_": 1450,   # + 3-dim 32-point GP, body-frame rotations
}


def analytic_flops_per_solve(N, nx, nu, qp_iters, sqp_iters, dyn_flops):
    """Analytic per-solve flop count of the deployed tick's solver math:
    RK4+VDE sweep (primal + nx+nu JVP passes at ~2x primal cost each),
    fixed-iteration Riccati IPM (dominant cubic terms per stage per iter),
    and the final KKT defect check."""
    rk4 = 4 * dyn_flops + 14 * nx          # 4 evals + combine
    vde = rk4 * (1 + 2 * (nx + nu))        # primal + tangent sweeps
    riccati = (3 * nx**3 + 4 * nx**2 * nu + 2 * nx * nu**2 + nu**3)
    ipm = qp_iters * N * (riccati + 16 * (nx + nu))
    return sqp_iters * (N * vde + ipm) + N * rk4


def annotate_roofline(detail):
    """Attach flops/solve, achieved FLOP/s and %-of-peak to every config
    row (in place)."""
    for name, row in detail["configs"].items():
        dyn = next(
            (v for k, v in DYN_FLOPS.items() if name.startswith(k)), None
        )
        if dyn is None or "solves_per_s" not in row:
            continue
        if name.startswith(("c5_", "c6_")):
            N, nx, nu, qi = 10, 13, 4, 18
        elif "_N40_" in name:
            N, nx, nu, qi = 40, 7, 2, 12
        else:
            N, nx, nu, qi = 30, 7, 2, 12
        fl = analytic_flops_per_solve(N, nx, nu, qi, 1, dyn)
        ach = fl * row["solves_per_s"]
        row["flops_per_solve"] = fl
        row["achieved_gflops"] = round(ach / 1e9, 1)
        row["pct_vpu_peak"] = round(100 * ach / VPU_PEAK_FLOPS, 2)
        row["pct_mxu_peak"] = round(100 * ach / MXU_PEAK_FLOPS, 3)


def sync_scaling_md(repo_dir, detail):
    """Refresh SCALING.md's real-chip line from the artifact just written
    (VERDICT r3 #7: no committed doc number may disagree with
    BENCH_DETAIL.json at the same SHA). The line is replaced wholesale, so
    drift is structurally impossible as long as bench is the only writer."""
    path = os.path.join(repo_dir, "SCALING.md")
    # Headline restricted to the documented c2 family (N=30 bicycle on the
    # fused Pallas path): quad N=10 rows do ~10x less work per solve, so a
    # cross-family max would silently compare incomparables (ADVICE r4).
    try:
        best_name, best = max(
            ((k, v) for k, v in detail["configs"].items()
             if "solves_per_s" in v and k.startswith("c2_")
             and "_N40_" not in k),
            key=lambda kv: kv[1]["solves_per_s"],
        )
    except ValueError:
        return
    backend = best.get("vde_backend", "pallas")
    line = (
        f"- `{detail['device']}` @ `{detail['git_sha'][:12]}`: "
        f"**{best['solves_per_s']:,.0f} solves/s** ({best_name}, N=30 "
        f"bicycle, vde={backend}; auto-synced from BENCH_DETAIL.json)\n"
    )
    try:
        with open(path) as f:
            lines = f.readlines()
        for i, ln in enumerate(lines):
            if ln.startswith("- `tpu"):
                lines[i] = line
                break
        with open(path, "w") as f:
            f.writelines(lines)
    except OSError:
        pass


def _git_provenance(repo_dir):
    """Stamp the artifact with the commit it was produced from (VERDICT r2
    #2: every committed benchmark number must be regenerable from committed
    code). A dirty tree aborts unless BENCH_ALLOW_DIRTY=1 (dev loop)."""
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=repo_dir,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "status", "--porcelain"], cwd=repo_dir,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip())
    except Exception:
        return {"git_sha": "unknown", "git_dirty": None}
    if dirty and not os.environ.get("BENCH_ALLOW_DIRTY"):
        print("bench: refusing to run on a dirty tree "
              "(set BENCH_ALLOW_DIRTY=1 to override)", file=sys.stderr)
        sys.exit(2)
    return {"git_sha": sha, "git_dirty": dirty}


def main():
    repo = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(repo, ".jax_cache")
    cache_warm = os.path.isdir(cache) and bool(os.listdir(cache))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dev = jax.devices()[0]
    log = lambda s: print(s, file=sys.stderr)
    log(f"# device: {dev.platform} {dev.device_kind}")

    detail = {
        "device": f"{dev.platform} {dev.device_kind}",
        "compile_cache_warm_at_start": cache_warm,
        "configs": {},
        "errors": {},
        **_git_provenance(repo),
    }
    switch_on = lambda v, k, e: np.array([1.0], np.float32)

    def guarded(name, fn):
        """Per-config isolation (VERDICT r2 #1c): one config failing can
        never zero the others or the headline metric."""
        try:
            return fn()
        except Exception as e:
            detail["errors"][name] = f"{type(e).__name__}: {e}"[:500]
            log(f"# {name} FAILED: {type(e).__name__}: {str(e)[:200]}")
            return None

    # ---- config 2: dynamic bicycle (headline metric at batch 1024)
    carry = None

    def run_c2():
        nonlocal carry
        tick, init, _, _ = build_fleet(dynamic_bicycle, switch_on)
        r256, _ = run_config(tick, init, 256)
        r1024, carry_ = run_config(tick, init, 1024)
        r4096, _ = run_config(tick, init, 4096)
        r16k, _ = run_config(tick, init, 16384)
        carry = carry_
        detail["configs"]["c2_dynamic_bicycle_b256"] = r256
        detail["configs"]["c2_dynamic_bicycle_b1024"] = r1024
        detail["configs"]["c2_dynamic_bicycle_b4096"] = r4096
        detail["configs"]["c2_dynamic_bicycle_b16384"] = r16k
        log(f"# c2 dynamic-tire N=30: b256 {r256['solves_per_s']:.0f}/s "
            f"b1024 {r1024['solves_per_s']:.0f}/s "
            f"b4096 {r4096['solves_per_s']:.0f}/s "
            f"b16384 {r16k['solves_per_s']:.0f}/s "
            f"kkt mean={r16k['kkt_mean']:.2e} max={r16k['kkt_max']:.2e} "
            f"lat_err={r16k['lat_err_mean_m']:.3f} m")
        # Headline = best c2 batch size (same OCP, same gates).
        return max((r256, r1024, r4096, r16k),
                   key=lambda r: r["solves_per_s"])

    r1024 = guarded("c2_dynamic_bicycle", run_c2)

    # ---- c2 at the REFERENCE-EXACT AD deployment dims: N=40, tf=2 s,
    # dt=50 ms (`acados_models/sim_car_acados_ocp.json`,
    # `launch/gp_ad_mpc.launch:6-8`) — the end of BASELINE's "N~20-40"
    # range, where the stage-rolled kernels and compile path are most
    # stressed (VERDICT r4 missing #3). Batch ladder to its knee.
    def run_c2_n40():
        tick40, init40, solver40, _ = build_fleet(
            dynamic_bicycle, switch_on, n_nodes=40, qp_iters=12
        )
        rows = {}
        for b in (1024, 4096, 16384):
            rows[b], _ = run_config(tick40, init40, b)
            rows[b]["vde_backend"] = solver40.vde
            detail["configs"][f"c2_dynamic_bicycle_N40_b{b}"] = rows[b]
        log(f"# c2-N40 reference-exact dims (vde={solver40.vde}): "
            + " ".join(f"b{b} {r['solves_per_s']:.0f}/s"
                       for b, r in rows.items())
            + f" kkt mean={rows[16384]['kkt_mean']:.2e} "
            f"max={rows[16384]['kkt_max']:.2e} "
            f"lat_err={rows[16384]['lat_err_mean_m']:.3f} m")

    guarded("c2_n40", run_c2_n40)

    # RTI-vs-converged quality gate on the live fleet state.
    d_u0 = None
    if carry is not None:
        d_u0 = guarded(
            "rti_vs_converged",
            lambda: rti_vs_converged(dynamic_bicycle, switch_on, carry),
        )
    if d_u0 is not None:
        detail["rti_vs_converged_u0"] = d_u0
        log(f"# quality: max|u0_RTI - u0_converged| = {d_u0:.3e}")

    # ---- config 3: GP-augmented bicycle — on the fused Pallas VDE since
    # round 4 (learned/lane.py), swept to its batch knee like c2.
    def run_c3():
        tick_g, init_g, solver_g, _ = build_fleet(make_gp_bicycle(),
                                                  switch_on)
        rows = {}
        for b in (256, 4096, 16384):
            rows[b], _ = run_config(tick_g, init_g, b)
            rows[b]["vde_backend"] = solver_g.vde
            detail["configs"][f"c3_gp_bicycle_b{b}"] = rows[b]
        log(f"# c3 GP-augmented N=30 (vde={solver_g.vde}): "
            + " ".join(f"b{b} {r['solves_per_s']:.0f}/s"
                       for b, r in rows.items())
            + f" kkt mean={rows[16384]['kkt_mean']:.2e} "
            f"max={rows[16384]['kkt_max']:.2e} "
            f"lat_err={rows[16384]['lat_err_mean_m']:.3f} m")

    guarded("c3_gp_bicycle", run_c3)

    # ---- config 4: Pacejka friction/topography sweep, batch 4096
    def run_c4():
        pac_dyn, pac_p, pac_vcap = make_pacejka()
        tick_p, init_p, solver_p, _ = build_fleet(pac_dyn, pac_p,
                                                  v_cap=pac_vcap)
        # Long warmup: the fleet cold-starts off the arc (v_y=psi_dot=0),
        # and the stiff-tire transient takes ~40 ticks to die out; kkt is
        # a steady-state tracking metric, not a cold-start one.
        r_pac, carry_p = run_config(tick_p, init_p, 4096, ticks=10,
                                    warmup=45)
        r_pac["vde_backend"] = solver_p.vde
        detail["configs"]["c4_pacejka_b4096"] = r_pac
        # Same deployed-RTI-vs-converged-SQP gate the bicycle gets: the
        # stiff magic-formula model is where one-iteration RTI is most
        # stressed (VERDICT r2 #7).
        d_pac = rti_vs_converged(pac_dyn, pac_p, carry_p)
        detail["c4_rti_vs_converged_u0"] = d_pac
        log(f"# c4 Pacejka sweep N=30 (vde={solver_p.vde}): "
            f"b4096 {r_pac['solves_per_s']:.0f}/s "
            f"kkt mean={r_pac['kkt_mean']:.2e} max={r_pac['kkt_max']:.2e} "
            f"lat_err={r_pac['lat_err_mean_m']:.3f} m "
            f"rti_vs_conv={d_pac:.2e}")

    guarded("c4_pacejka", run_c4)

    # ---- config 5: quadrotor OCP through the same fused path, swept to
    # its batch knee; plus the deployed-RTI-vs-converged u0 gate (VERDICT
    # r3 #2 — the quad kkt_max is RTI linearization residue of the
    # attitude dynamics at dt=0.1, diagnosed in docs/SOLVER.md: sqp_iters=2
    # collapses it ~quadratically while u0 already matches the converged
    # solve to ~1e-3 of the [0,1] thrust range).
    def run_c5():
        from ad_mpc_tpu.experiments.quad_fleet import (
            build_quad_fleet,
            rti_vs_converged_quad,
        )

        tick_q, init_q, solver_q, _ = build_quad_fleet(
            sqp_iters=QUAD_SQP_ITERS
        )
        rows = {}
        carry_q = None
        for b in (256, 1024, 4096, 16384):
            rows[b], c_ = run_config(tick_q, init_q, b, warmup=20)
            rows[b]["vde_backend"] = solver_q.vde
            detail["configs"][f"c5_quad_b{b}"] = rows[b]
            if b == 256:
                carry_q = c_
        d_q = rti_vs_converged_quad(
            carry_q, deployed_sqp_iters=QUAD_SQP_ITERS
        )
        detail["c5_rti_vs_converged_u0"] = d_q
        log(f"# c5 quad N=10 (vde={solver_q.vde}): "
            + " ".join(f"b{b} {r['solves_per_s']:.0f}/s"
                       for b, r in rows.items())
            + f" kkt mean={rows[4096]['kkt_mean']:.2e} "
            f"max={rows[4096]['kkt_max']:.2e} "
            f"lat_err={rows[4096]['lat_err_mean_m']:.3f} m "
            f"rti_vs_conv={d_q:.2e}")

    guarded("c5_quad", run_c5)

    # ---- config 6: GP-augmented quadrotor fleet (the reference's RA-L
    # flagship capability — GP velocity-residual correction — at fleet
    # scale: body-frame features, rotated mean, one compiled program, GP
    # mean fused INSIDE the Pallas VDE kernel since round 4).
    def run_c6():
        from ad_mpc_tpu.experiments.quad_fleet import (
            build_quad_fleet,
            make_quad_gp_ensemble,
            rti_vs_converged_quad,
        )

        tick_g, init_g, solver_g, _ = build_quad_fleet(
            ensemble=make_quad_gp_ensemble(), sqp_iters=QUAD_SQP_ITERS
        )
        rows = {}
        carry_g = None
        for b in (256, 1024, 4096, 16384):
            rows[b], c_ = run_config(tick_g, init_g, b, warmup=20)
            rows[b]["vde_backend"] = solver_g.vde
            detail["configs"][f"c6_gp_quad_b{b}"] = rows[b]
            if b == 256:
                carry_g = c_
        # The c6 RTI gate the r4 artifact lacked (VERDICT r4 weak #2).
        d_g = rti_vs_converged_quad(
            carry_g, ensemble=make_quad_gp_ensemble(),
            deployed_sqp_iters=QUAD_SQP_ITERS,
        )
        detail["c6_rti_vs_converged_u0"] = d_g
        log(f"# c6 GP-quad N=10 (vde={solver_g.vde}): "
            + " ".join(f"b{b} {r['solves_per_s']:.0f}/s"
                       for b, r in rows.items())
            + f" kkt mean={rows[16384]['kkt_mean']:.2e} "
            f"max={rows[16384]['kkt_max']:.2e} "
            f"lat_err={rows[16384]['lat_err_mean_m']:.3f} m")

        # FITTED-model row (VERDICT r4 weak #6): the ensemble produced by
        # the gp_flagship record->fit pipeline (committed in the model
        # registry) riding the same fused Pallas VDE path — proof the
        # fitting pipeline and the fused GP kernel meet.
        try:
            from ad_mpc_tpu.utils import io as _io

            fitted = _io.load_model("gp_flagship_c1")
        except Exception as e:
            log(f"# c6 fitted row skipped (no gp_flagship_c1 model): {e}")
            return
        tick_f, init_f, solver_f, _ = build_quad_fleet(
            ensemble=fitted, sqp_iters=QUAD_SQP_ITERS
        )
        for b in (4096, 16384):
            r, _ = run_config(tick_f, init_f, b, warmup=20)
            r["vde_backend"] = solver_f.vde
            r["notes"] = ("fitted gp_flagship_c1 ensemble "
                          f"({fitted.x_train.shape[2]} pts/dim)")
            detail["configs"][f"c6_fitted_gp_quad_b{b}"] = r
            log(f"# c6-fitted b{b} (vde={solver_f.vde}): "
                f"{r['solves_per_s']:.0f}/s kkt max={r['kkt_max']:.2e}")

    guarded("c6_gp_quad", run_c6)

    # ---- single-solve latency vs the 20 ms budget
    def run_lat():
        lat = bench_latency(dynamic_bicycle, switch_on)
        detail["latency_ms"] = lat
        log(f"# single-solve latency: compute p50={lat['p50_compute']:.2f}"
            f"ms p99={lat['p99_compute']:.2f}ms (device-resident) | "
            f"blocking p50={lat['p50_blocking']:.2f}ms of which host-link "
            f"floor {lat['host_link_floor_p50']:.2f}ms | budget 20ms")
        if lat["p99_compute"] > lat["budget"]:
            detail.setdefault("latency_warnings", []).append(
                f"compute p99 {lat['p99_compute']:.2f}ms over budget"
            )

    guarded("latency", run_lat)

    # ---- deployment loop: the REAL node path (ad_node <-> sim_node over
    # the C++ rt_bridge at 50 Hz, solver on the accelerator) — VERDICT r3
    # #6. Records per-tick wall p50/p99, missed 20 ms deadlines, and the
    # measured host-link floor under every blocking solve (on a tunneled
    # chip the floor alone exceeds the budget; the artifact says so
    # rather than hiding the path).
    def run_deploy():
        from ad_mpc_tpu.experiments.deployment_loop import (
            run_deployment_loop,
        )

        dep = run_deployment_loop(ticks=400)
        detail["deployment_loop_50hz"] = dep
        log(f"# deployment loop 50Hz ({dep['solver_platform']} solver): "
            f"tick p50={dep['tick_p50_ms']:.1f}ms p99={dep['tick_p99_ms']:.1f}ms "
            f"missed {dep['missed_deadlines']}/{dep['ticks']} "
            f"(link floor {dep['host_link_floor_p50_ms']:.1f}ms, "
            f"tick-minus-link {dep.get('tick_p50_minus_link_ms')}ms) "
            f"rmse={dep['tracking_rmse_m']:.3f}m")
        # Pipelined mode: the one-slot actuation pipeline that holds the
        # 20 ms period regardless of link latency (ad_node pipelined=True).
        depp = run_deployment_loop(ticks=400, base_port=49520,
                                   pipelined=True)
        detail["deployment_loop_50hz_pipelined"] = depp
        log(f"# deployment loop 50Hz PIPELINED: "
            f"tick p50={depp['tick_p50_ms']:.2f}ms "
            f"p99={depp['tick_p99_ms']:.1f}ms "
            f"missed {depp['missed_deadlines']}/{depp['ticks']} "
            f"rmse={depp['tracking_rmse_m']:.3f}m")
        # Lag-compensation A/B at an aggressive scenario (VERDICT r4 weak
        # #3): v=12 m/s on r=15 m corners (a_lat ~ 9.6 m/s^2) is where the
        # one-slot actuation lag actually bites; the compensated row
        # forward-predicts the solve anchor by the pipeline delay.
        for lc in (False, True):
            d = run_deployment_loop(
                ticks=700, base_port=49540 + 4 * int(lc), pipelined=True,
                lag_compensation=lc, v_target=12.0, track_radius=15.0,
            )
            key = "deployment_aggr_" + ("lagcomp" if lc else "nolagcomp")
            detail[key] = d
            log(f"# deployment AGGRESSIVE pipelined lag_comp={lc}: "
                f"rmse={d['tracking_rmse_m']:.3f}m "
                f"missed {d['missed_deadlines']}/{d['ticks']}")

    guarded("deployment_loop", run_deploy)

    # ---- MXU-vs-VPU micro measurement (VERDICT r3 #4): the Riccati inner
    # op in XLA's best MXU-shaped mapping vs the lane-layout kernel. The
    # full macro comparison (whole QP, both backends) is the committed run
    # quoted in docs/SOLVER.md §MXU (the XLA macro at b4096 is minutes-slow
    # by its nature — that IS the result — so it is not re-run every bench).
    def run_mxu():
        from ad_mpc_tpu.experiments.mxu_riccati import micro

        detail["mxu_riccati_micro"] = micro()
        m = detail["mxu_riccati_micro"]
        log(f"# mxu micro: lane {m['pallas_lane_gflops']} GFLOP/s "
            f"({m['pallas_lane_pct_vpu_fma_peak']}% of VPU FMA peak) vs "
            f"XLA dot f32 {m['xla_dot_f32_gflops']} / bf16 "
            f"{m['xla_dot_bf16_gflops']} GFLOP/s")

    guarded("mxu_riccati", run_mxu)

    # ---- long-horizon Riccati backend row (VERDICT r4 weak #4): the
    # associative-scan option measured against the sequential recursion on
    # this device, with the crossover horizon (or its absence) recorded.
    def run_long_horizon():
        from ad_mpc_tpu.experiments.long_horizon import micro as lh_micro

        detail["long_horizon_riccati"] = lh_micro()
        lh = detail["long_horizon_riccati"]
        log(f"# long-horizon riccati: crossover_n={lh['crossover_n']} "
            + " ".join(f"N{k[1:]}:{v['assoc_over_seq']}x"
                       for k, v in lh["rows"].items()))

    guarded("long_horizon_riccati", run_long_horizon)

    # ---- shard-invariance row (VERDICT r4 weak #7): the multi-chip claim
    # decomposed into what ONE real chip can prove — shard_map partitioning
    # at fixed per-device batch is rate-invariant vs the unsharded program.
    def run_shard_invariance():
        from ad_mpc_tpu.parallel.scaling import measure_shard_invariance

        detail["shard_invariance"] = measure_shard_invariance()
        si = detail["shard_invariance"]
        log(f"# shard invariance: plain {si['plain']['solves_per_s']:,.0f} "
            f"vs shard_map(1) {si['shard_map_1dev']['solves_per_s']:,.0f} "
            f"solves/s (ratio {si['sharded_over_plain']})")

    guarded("shard_invariance", run_shard_invariance)

    # ---- roofline annotation (VERDICT r3 #4)
    annotate_roofline(detail)

    # ---- quality gates (per config family, ratcheted — VERDICT r3 #3)
    failures = []
    for cfg_name, r in detail["configs"].items():
        for key, lim in _gates_for(cfg_name).items():
            if r[key] > lim:
                failures.append(f"{cfg_name}.{key}={r[key]:.3e}>{lim}")
    if d_u0 is not None and d_u0 > RTI_GATES["rti_vs_converged_u0"]:
        failures.append(f"rti_vs_converged_u0={d_u0:.3e}")
    for k in ("c4_rti_vs_converged_u0", "c5_rti_vs_converged_u0",
              "c6_rti_vs_converged_u0"):
        v = detail.get(k)
        if v is not None and v > RTI_GATES[k]:
            failures.append(f"{k}={v:.3e}>{RTI_GATES[k]}")
    for name, err in detail["errors"].items():
        failures.append(f"{name} raised: {err[:120]}")
    detail["quality_gates"] = {"pass": not failures, "failures": failures,
                               "gates": GATES, "rti_gates": RTI_GATES}
    if failures:
        log("# QUALITY GATE FAILURES: " + "; ".join(failures))

    with open(os.path.join(repo, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    sync_scaling_md(repo, detail)

    solves_per_s = r1024["solves_per_s"] if r1024 else 0.0
    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / PER_CHIP_TARGET, 3),
            }
        )
    )
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
