"""Fused Pallas TPU kernel for the batched RK4 rollout + VDE sweep.

TPU-native replacement for the reference's CasADi-generated explicit ODE/VDE
kernels driven by the ACADOS ERK module
(``c_generated_code/sim_car_model/sim_car_expl_ode_fun.c``,
``sim_car_expl_vde_forw.c``): for every shooting interval the kernel
integrates the dynamics one RK4 interval AND produces the forward
sensitivities (A_k = dF/dx, B_k = dF/du) plus the multiple-shooting defect
c_k = F(x_k, u_k) - x_{k+1} — the entire Gauss-Newton linearization sweep of
the SQP-RTI iteration in ONE kernel launch.

Layout: stage linearizations are mutually independent (they linearize around
the given iterate, not a rollout), so the horizon folds onto the *sublane*
axis and the scenario batch rides the 128-wide *lane* axis — every state
entry is an (N, B) VPU tile and the whole sweep is one program per batch
block. State/input entries live on the untiled leading axis.

Sensitivities are exact forward-mode derivatives of the discrete RK4 map:
``jax.linearize`` evaluates the primal RK4 chain once and the resulting
linear map is applied to the nx+nu basis tangents — exactly the variational
differential equations ACADOS integrates, evaluated by AD instead of
codegen, for all N stages of the block simultaneously.

Requirement on the dynamics: ``f(x, u, p)`` must be *lane-polymorphic* —
written with per-entry indexing (``x[3]``), elementwise jnp ops, and a
trailing ``jnp.stack`` so it evaluates correctly on (nx, ...) slabs whose
trailing axes are batch-like. The models in :mod:`ad_mpc_tpu.models`
(bicycle, Pacejka) satisfy this; :func:`lane_compatible` probes a dynamics
via ``jax.eval_shape`` so callers can fall back to the XLA ``jacfwd`` path
(:func:`ad_mpc_tpu.ops.integrators.linearize`) otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def lane_compatible(f, nx: int, nu: int, p_dim: int) -> bool:
    """True when ``f(x, u, p)`` maps (nx, N, B), (nu, N, B), (p, N, B) slabs
    to an (nx, N, B) slab — the layout contract of the fused kernel.

    This checks LAYOUT only. On TPU it must be combined with
    :func:`mosaic_lowerable`, which attempts a real Mosaic lowering — a
    dynamics can be layout-compatible yet use a primitive Pallas cannot
    lower (e.g. ``atan2``: the round-2 bench crash)."""
    try:
        N, B = 3, 4
        out = jax.eval_shape(
            f,
            jax.ShapeDtypeStruct((nx, N, B), jnp.float32),
            jax.ShapeDtypeStruct((nu, N, B), jnp.float32),
            jax.ShapeDtypeStruct((max(p_dim, 1), N, B), jnp.float32),
        )
        return out.shape == (nx, N, B)
    except Exception:
        return False


def mosaic_lowerable(
    f, nx: int, nu: int, p_dim: int, dt: float = 0.05, rk4_steps: int = 1
) -> bool:
    """Attempt a REAL Mosaic lowering of a tiny fused VDE built on ``f``.

    ``jax.export`` with ``platforms=('tpu',)`` runs the full Pallas→Mosaic
    lowering pass AOT — no device contact, no execution — so any
    ``NotImplementedError: Unimplemented primitive`` (the class of failure
    that zeroed the round-2 bench) is raised here instead of inside a
    benchmark or deployment. Cheap (~0.5 s for a tiny N=2 kernel) and
    exact: it exercises the identical ``_vde_kernel`` trace, including
    ``jax.linearize`` of the dynamics. Device-free matters doubly on a
    tunneled accelerator: probing via ``jit(...).lower()`` on the live
    backend was observed to wedge the tunnel's transfer stream."""
    try:
        N = 2
        lin = make_vde(f, dt, N, nx, nu, p_dim, rk4_steps=rk4_steps,
                       block_b=8, interpret=False)
        jax.export.export(jax.jit(lin), platforms=("tpu",))(
            jax.ShapeDtypeStruct((8, N + 1, nx), jnp.float32),
            jax.ShapeDtypeStruct((8, N, nu), jnp.float32),
            jax.ShapeDtypeStruct((8, max(p_dim, 1)), jnp.float32),
        )
        return True
    except Exception:
        return False


def _one_hot_rows(n, j, shape, dtype=jnp.float32):
    """(n, *shape) slab that is 1 on leading-axis row j, 0 elsewhere.

    Built from stacked scalar broadcasts: Mosaic's vector-layout pass
    mis-slices rows re-extracted from an iota-derived value (and scatter is
    unsupported), while stack-of-broadcasts lowers cleanly."""
    return jnp.stack(
        [jnp.full(shape, 1.0 if i == j else 0.0, dtype) for i in range(n)]
    )


def _vde_kernel(
    xlo_ref, xhi_ref, u_ref, p_ref, a_ref, b_ref, c_ref,
    *, f, dt, rk4_steps, nx, nu,
):
    """One (stage-block, batch-block) program: primal RK4 + nx+nu tangent
    sweeps for a block of stages at once (stages on the sublane axis).

    Refs: xlo/xhi (nx, Nt, B) — the iterate at stages k and k+1 (stage
    linearizations are mutually independent, so the horizon blocks onto the
    grid exactly like the batch; passing the shifted iterate as a second
    operand keeps every BlockSpec non-overlapping); u (nu, Nt, B),
    p (pd, Nt, B) pre-expanded to full stage slabs; outputs
    a (nx*nx, Nt, B), b (nx*nu, Nt, B), c (nx, Nt, B) with
    a[i*nx + j] = dF_i/dx_j per (stage, scenario) — Jacobian axes stay
    flattened onto the leading (untiled) axis; Mosaic's vector layouts are
    rank-3-friendly and the reshape happens outside the kernel.
    """
    x = xlo_ref[...]  # (nx, Nt, B)
    u = u_ref[...]  # (nu, Nt, B)
    p = p_ref[...]  # (pd, Nt, B)
    h = dt / rk4_steps

    def rk4_map(xx, uu):
        for _ in range(rk4_steps):
            k1 = f(xx, uu, p)
            k2 = f(xx + 0.5 * h * k1, uu, p)
            k3 = f(xx + 0.5 * h * k2, uu, p)
            k4 = f(xx + h * k3, uu, p)
            xx = xx + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return xx

    tail = x.shape[1:]
    zero_u = jnp.zeros_like(u)
    zero_x = jnp.zeros_like(x)
    # One primal evaluation + a reusable linear (tangent) map: the VDE
    # for every stage of the block simultaneously. Register pressure from
    # residual-heavy dynamics (the unrolled GP mean) is handled by stage
    # blocking (auto_block_n), which bounds the live set per program.
    x_next, lin = jax.linearize(rk4_map, x, u)
    a_cols = [
        lin(_one_hot_rows(nx, j, tail, x.dtype), zero_u)
        for j in range(nx)
    ]
    b_cols = [
        lin(zero_x, _one_hot_rows(nu, j, tail, u.dtype))
        for j in range(nu)
    ]

    # Row i*n + j holds dF_i/dv_j (column j of the Jacobian, entry i).
    a_ref[...] = jnp.stack(
        [a_cols[j][i] for i in range(nx) for j in range(nx)], axis=0
    )
    b_ref[...] = jnp.stack(
        [b_cols[j][i] for i in range(nx) for j in range(nu)], axis=0
    )
    c_ref[...] = x_next - xhi_ref[...]


# Dynamics whose jaxpr has more equations than this get one-sublane-tile
# stage blocks (see auto_block_n); leaner dynamics keep full-horizon slabs.
# Measured anchors (r4, slab avals): bicycle 95, quad 127, Pacejka 237 —
# all compile AND run faster full-slab at N=30; the 32-point GP models
# (1343/1693) kill the full-slab compile. 500 splits the gap.
COMPLEX_DYN_EQNS = 500
DEFAULT_BLOCK_N = 8


def auto_block_n(f, nx: int, nu: int, p_dim: int, N: int) -> int | None:
    """Stage-block policy, measured both ways (round 4):

    - *lean* dynamics (bicycle ~40 eqns, Pacejka ~100, quad ~70): one
      program over the full horizon wins — stage-blocking the Pacejka
      fleet cost 2x (VDE-heavy config; 4x the grid programs, each paying
      pipeline ramp on the same operands);
    - *residual-heavy* dynamics (the unrolled 32-point GP mean: many
      hundreds of equations): full-horizon N=30 slabs blow the Mosaic
      register allocator past the scoped-VMEM limit and the compile dies —
      one sublane tile (8 stages) per program keeps the live set bounded.

    The discriminator is the equation count of the dynamics' jaxpr on slab
    avals — deterministic, cheap, and monotone in the register pressure
    that actually kills the compile.
    """
    try:
        jaxpr = jax.make_jaxpr(f)(
            jax.ShapeDtypeStruct((nx, 4, 8), jnp.float32),
            jax.ShapeDtypeStruct((nu, 4, 8), jnp.float32),
            jax.ShapeDtypeStruct((max(p_dim, 1), 4, 8), jnp.float32),
        )
        n_eqns = len(jaxpr.jaxpr.eqns)
    except Exception:
        n_eqns = COMPLEX_DYN_EQNS + 1  # opaque -> be conservative
    return DEFAULT_BLOCK_N if n_eqns > COMPLEX_DYN_EQNS else None


def make_vde(
    f, dt, N, nx, nu, p_dim,
    rk4_steps: int = 1, block_b: int = LANES, interpret: bool = False,
    block_n=None,
):
    """Build the batched fused linearization sweep.

    ``f(x, u, p)``: lane-polymorphic continuous dynamics (see module doc).

    ``block_n``: stages per kernel program, or None for the full horizon.
    Stage linearizations are independent, so the horizon can block onto
    the grid like the batch; see :func:`auto_block_n` for the measured
    trade and the policy callers should use.

    Returns ``linearize(xs, us, ps)`` with batch-FIRST shapes — xs
    (B, N+1, nx), us (B, N, nu), ps (B, p_dim) — producing
    (A (B, N, nx, nx), Bm (B, N, nx, nu), c (B, N, nx)), matching the
    vmapped :func:`ad_mpc_tpu.ops.integrators.linearize`.
    """
    pd = max(p_dim, 1)
    Nt = N if block_n is None else int(min(block_n, N))
    n_pad = (-N) % Nt
    Np = N + n_pad
    kern = functools.partial(
        _vde_kernel,
        f=f, dt=float(dt), rk4_steps=rk4_steps, nx=nx, nu=nu,
    )

    def linearize(xs, us, ps):
        batch = xs.shape[0]
        Bt = int(min(block_b, max(batch, 1)))
        pad = (-batch) % Bt
        full = batch + pad

        def prep(v):
            # (B, S, n) -> (n, S_pad, full): entries lead, batch on lanes,
            # stage axis padded to the block multiple (replicated last
            # stage; padded outputs are cropped, so values only need to be
            # finite).
            v = jnp.asarray(v, jnp.float32)
            if pad:
                v = jnp.concatenate(
                    [v, jnp.repeat(v[-1:], pad, axis=0)], axis=0
                )
            if n_pad:
                v = jnp.concatenate(
                    [v, jnp.repeat(v[:, -1:], n_pad, axis=1)], axis=1
                )
            return v.transpose(2, 1, 0)

        if p_dim == 0:
            ps = jnp.zeros((batch, 1), jnp.float32)
        # Per-solve params expand to per-stage slabs so every in-kernel
        # operand is a clean (stages, lanes) tile (no rank-mixing broadcast).
        ps = jnp.broadcast_to(
            jnp.asarray(ps, jnp.float32)[:, None, :], (batch, N, pd)
        )
        xs = jnp.asarray(xs, jnp.float32)
        xlo_t = prep(xs[:, :-1])  # (nx, Np, full)
        xhi_t = prep(xs[:, 1:])   # (nx, Np, full)
        us_t = prep(us)           # (nu, Np, full)
        ps_t = prep(ps)           # (pd, Np, full)

        grid = (Np // Nt, full // Bt)

        def spec(rows):
            return pl.BlockSpec(
                (rows, Nt, Bt),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            )

        A_t, B_t, c_t = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec(nx), spec(nx), spec(nu), spec(pd)],
            out_specs=[spec(nx * nx), spec(nx * nu), spec(nx)],
            out_shape=[
                jax.ShapeDtypeStruct((nx * nx, Np, full), jnp.float32),
                jax.ShapeDtypeStruct((nx * nu, Np, full), jnp.float32),
                jax.ShapeDtypeStruct((nx, Np, full), jnp.float32),
            ],
            interpret=interpret,
        )(xlo_t, xhi_t, us_t, ps_t)

        # (i*n+j, N, B) -> (B, N, i, j); (nx, N, B) -> (B, N, nx).
        A = A_t.reshape(nx, nx, Np, full).transpose(3, 2, 0, 1)[
            :batch, :N
        ]
        Bm = B_t.reshape(nx, nu, Np, full).transpose(3, 2, 0, 1)[
            :batch, :N
        ]
        c = c_t.transpose(2, 1, 0)[:batch, :N]
        return A, Bm, c

    return linearize
