"""Batched / sharded MPC fleets.

This is the TPU-native replacement for "one ACADOS process per vehicle":
the scenario fleet solves as ONE compiled program built on
:class:`ad_mpc_tpu.ocp.solver.BatchedSQPSolver` — on TPU the QP runs as the
single-launch fused Pallas interior-point kernel with the batch on the lane
axis (and the fused VDE kernel when the dynamics is lane-polymorphic), off
TPU as the vmapped XLA IPM. ``jax.sharding`` + ``shard_map`` split the
fleet across an ICI/DCN mesh; each solve stays on its device, so batch data
parallelism adds no per-solve collectives. Warm-start states are carried
functionally, so the whole control tick (solve + shift) is one
donated-buffer XLA program per step (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ad_mpc_tpu.ocp.solver import BatchedSQPSolver, SolverState
from ad_mpc_tpu.ocp.spec import OCPSpec
from ad_mpc_tpu.ops.integrators import rollout
from ad_mpc_tpu.parallel.mesh import batch_sharding


class BatchedSolver:
    """Fleet-of-scenarios MPC: every argument gains a leading batch dim.

    :param mesh: optional ``jax.sharding.Mesh``; when given, inputs/outputs
        shard over it (ICI data parallelism) and the fused solve dispatches
        per-shard via ``shard_map``; without it the batch stays on one
        device.
    :param backend: 'auto' (fused Pallas QP kernel on TPU, XLA IPM
        elsewhere), 'pallas' (kernel; interpret mode off TPU), or 'xla'.
    """

    def __init__(
        self,
        spec: OCPSpec,
        dynamics: Callable,
        p_dim: int = 0,
        dtype=jnp.float32,
        mesh: Optional[Mesh] = None,
        donate_state: bool = True,
        backend: str = "auto",
        vde: str = "auto",
    ):
        assert dtype == jnp.float32, "fleet solver is f32 (TPU-native)"
        self.spec = spec
        self.dtype = dtype
        self.mesh = mesh
        self.p_dim = p_dim
        self._batched = BatchedSQPSolver(
            spec, dynamics, p_dim=p_dim, backend=backend, vde=vde, mesh=mesh
        )
        self.backend = self._batched.backend
        self.vde = self._batched.vde
        self._F = self._batched._F

        solve_fn = self._batched._solve_fn
        shift_fn = self._batched._shift_fn

        def step(x0s, yref_xs, yref_us, params, states: SolverState):
            """One fleet control tick: solve all scenarios, shift all
            warm starts. Returns (us, xs, next_states, kkt)."""
            res = solve_fn(x0s, yref_xs, yref_us, params, states)
            next_states = shift_fn(res.state)
            return res.us, res.xs, next_states, res.kkt_residual

        if mesh is not None:
            bsh = batch_sharding(mesh)
            state_sh = SolverState(xs=bsh, us=bsh)
            step = jax.jit(
                step,
                in_shardings=(bsh, bsh, bsh, bsh, state_sh),
                out_shardings=(bsh, bsh, state_sh, bsh),
                donate_argnums=(4,) if donate_state else (),
            )
        else:
            step = jax.jit(step, donate_argnums=(4,) if donate_state else ())
        self.step = step

    def init_states(self, x0s, u0=None) -> SolverState:
        """Cold-start fleet warm-start states by constant-input rollout."""
        spec = self.spec
        B = x0s.shape[0]
        u0 = (
            jnp.zeros((B, spec.nu), self.dtype)
            if u0 is None
            else jnp.asarray(u0, self.dtype)
        )
        us = jnp.tile(u0[:, None, :], (1, spec.n_nodes, 1))
        params = jnp.zeros((B, self.p_dim), self.dtype)

        def one(x0, u_row, p):
            Fp = lambda x, u: self._F(x, u, p)
            return rollout(Fp, x0, u_row)

        xs = jax.vmap(one)(jnp.asarray(x0s, self.dtype), us, params)
        states = SolverState(xs=xs, us=us)
        if self.mesh is not None:
            bsh = batch_sharding(self.mesh)
            states = SolverState(
                xs=jax.device_put(states.xs, bsh),
                us=jax.device_put(states.us, bsh),
            )
        return states
