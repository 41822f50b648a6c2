"""Safety / plausibility machinery of the closed-loop controller.

Reproduces the reference's runtime safety semantics as pure functions:

- ``is_valid_command``: solution-vs-reference plausibility gate
  (``ad_3d_optimizer.py:385-394``);
- ``check_pred_traj``: predicted-trajectory health check
  (``gp_ad_mpc_node.py:248-257``);
- ``backup_control``: time-shifted previous solution fallback
  (``ad_3d_optimizer.py:469-477``);
- ``ArmingGate``: N-consecutive-success watchdog before the controller may
  publish (``gp_ad_mpc_node.py:62-63, 206-216``);
- ``brake_command``: auxiliary full-braking fallback controller
  (``gp_ad_mpc_node.py:446-481``).
"""

from __future__ import annotations

import jax.numpy as jnp


def is_valid_command(x_opt, x_ref, mean_tol=3.0, var_tol=2.0, max_tol=4.0):
    """Plausibility gate: mean/variance/max of the per-stage XY distance
    between the predicted trajectory and the reference must be small.

    Mirrors ``ad_3d_optimizer.py:385-394`` including its quirk of leaving the
    final entry at zero distance.
    """
    d = jnp.sqrt(
        (x_ref[:-1, 0] - x_opt[:-1, 0]) ** 2 + (x_ref[:-1, 1] - x_opt[:-1, 1]) ** 2
    )
    d = jnp.concatenate([d, jnp.zeros(1, dtype=d.dtype)])
    return (
        (jnp.mean(d) < mean_tol)
        & (jnp.var(d, ddof=1) < var_tol)
        & (jnp.max(d) < max_tol)
    )


def check_pred_traj(x_opt, x_now, jump_tol=5.0):
    """Predicted-trajectory health: no wild jump between the current state
    and the start of the prediction, no non-finite values
    (``gp_ad_mpc_node.py:248-257``)."""
    finite = jnp.all(jnp.isfinite(x_opt))
    jump = jnp.sqrt(jnp.sum((x_opt[0, :2] - x_now[:2]) ** 2))
    return finite & (jump < jump_tol)


def backup_control(prev_us):
    """Time-shift the previous control plan by one stage, repeating the last
    entry — the reference's "backup ctrl" (``ad_3d_optimizer.py:474-476``)."""
    return jnp.concatenate([prev_us[1:], prev_us[-1:]], axis=0)


def brake_command(steering_hold, accel=-1e5):
    """Hold steering, full braking — the auxiliary fallback controller
    (``run_pure``, ``gp_ad_mpc_node.py:455-481``)."""
    return jnp.array([accel, 0.0]), steering_hold


class ArmingGate:
    """The controller must report ``n_required`` consecutive healthy solves
    before its output is trusted; any failure resets the count
    (``gp_ad_mpc_node.py:62-63, 206-216``)."""

    def __init__(self, n_required: int = 10):
        self.n_required = n_required
        self.count = 0

    def update(self, ok: bool) -> bool:
        self.count = self.count + 1 if ok else 0
        return self.armed

    @property
    def armed(self) -> bool:
        return self.count >= self.n_required
