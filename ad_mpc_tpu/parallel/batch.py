"""Batched / sharded MPC fleets.

This is the TPU-native replacement for "one ACADOS process per vehicle":
``vmap`` turns the single-scenario SQP-RTI solve into a scenario-fleet
solve whose per-stage Riccati ops become batched MXU matmuls, and
``jax.sharding`` splits the fleet across an ICI mesh. Warm-start states are
carried functionally, so the whole control tick (solve + shift) is one
donated-buffer XLA program per step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ad_mpc_tpu.ocp.solver import SQPSolver, SolverState
from ad_mpc_tpu.ocp.spec import OCPSpec
from ad_mpc_tpu.ops.integrators import rollout
from ad_mpc_tpu.parallel.mesh import batch_sharding


class BatchedSolver:
    """Fleet-of-scenarios MPC: every argument gains a leading batch dim.

    :param mesh: optional ``jax.sharding.Mesh`` with a 'batch' axis; when
        given, inputs/outputs are sharded over it (ICI data parallelism);
        without it the batch stays on one device.
    """

    def __init__(
        self,
        spec: OCPSpec,
        dynamics: Callable,
        p_dim: int = 0,
        dtype=jnp.float32,
        mesh: Optional[Mesh] = None,
        donate_state: bool = True,
    ):
        self.spec = spec
        self.dtype = dtype
        self.mesh = mesh
        self._single = SQPSolver(spec, dynamics, p_dim=p_dim, dtype=dtype)
        self.p_dim = p_dim

        solve_v = jax.vmap(
            lambda x0, yx, yu, p, st: self._single.solve(x0, yx, yu, p, st)
        )
        shift_v = jax.vmap(self._single.shift)

        def step(x0s, yref_xs, yref_us, params, states: SolverState):
            """One fleet control tick: solve all scenarios, shift all
            warm starts. Returns (us, xs, next_states, kkt)."""
            res = solve_v(x0s, yref_xs, yref_us, params, states)
            next_states = shift_v(res.state)
            return res.us, res.xs, next_states, res.kkt_residual

        if mesh is not None:
            # 1-D (batch) or 2-D (host x chip) mesh: the scenario batch
            # shards over every mesh axis, so each solve stays on one chip
            # and no per-solve collective crosses DCN.
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
            Fp = lambda x, u: self._single._F(x, u, p)
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
