"""ad_mpc_tpu — a TPU-native data-driven nonlinear MPC engine.

A brand-new JAX/XLA/Pallas framework providing the capability set of the
HMCL-UNIST/AD_MPC reference stack (autonomous-driving bicycle MPC + quadrotor
GP-MPC), redesigned TPU-first:

- models are pure functions ``f(x, u, params) -> x_dot``;
- the SQP-RTI solver is a single jitted program (Gauss-Newton linearization via
  ``jax.jacfwd``, stage-wise primal-dual interior-point QP solved by Riccati
  recursion under ``lax.scan``/``lax.fori_loop``);
- batching is ``vmap``; multi-chip scaling is ``shard_map`` over a
  ``jax.sharding.Mesh``;
- learned residual models (GP ensembles / RDRv drag) are dynamics-term
  closures fused into the linearization sweep, not per-model codegen.
"""

__version__ = "0.1.0"
