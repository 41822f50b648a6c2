"""Frenet / arc-length reference generator for the AD stack.

Capability parity with the reference's ``RefTrajectory``
(``ros_gp_mpc/src/ad_mpc/ref_traj.py:41-171``): waypoint list ->
arc-length-parameterized trajectory with filtered curvature; per-step
closest-point search, Frenet error coordinates, velocity-based arc-length
interpolation of x/y/psi/curvature references, yaw unwrap +
``fix_angle_reference``, stop flag at path end, first-3-point re-anchoring
to the current pose.

Implemented with static shapes end-to-end so the whole per-tick reference
computation jits and vmaps (a CARLA-style fleet computes thousands of these
on-device per control period).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ad_mpc_tpu.utils.math import (
    fix_angle_reference,
    unwrap_angles,
    wrap_to_pi,
)


class PathData(NamedTuple):
    """Arc-length-parameterized path (the ``set_traj`` product)."""

    x: jax.Array
    y: jax.Array
    psi: jax.Array
    vel: jax.Array
    cdist: jax.Array  # cumulative arc length s
    curv: jax.Array  # filtered curvature dpsi/ds


class WaypointRefs(NamedTuple):
    """Per-tick output (the ``get_waypoints`` dict, as a struct)."""

    s0: jax.Array  # arc-length at closest waypoint
    e_y0: jax.Array  # lateral Frenet error
    e_psi0: jax.Array  # heading Frenet error
    x_ref: jax.Array  # (H,)
    y_ref: jax.Array
    psi_ref: jax.Array
    v_ref: jax.Array
    curv_ref: jax.Array
    stop: jax.Array  # bool: reached end of path


def _moving_average_filtfilt(sig, width: int = 11):
    """Zero-phase moving-average smoothing, the jit-friendly stand-in for the
    reference's ``filtfilt(ones(11)/11, 1, ...)`` curvature filter
    (``ref_traj.py:20``). Edge-padded forward+backward pass."""
    kernel = jnp.ones(width) / width
    pad = width // 2

    def smooth(s):
        s_pad = jnp.concatenate([s[:1].repeat(pad), s, s[-1:].repeat(pad)])
        return jnp.convolve(s_pad, kernel, mode="valid")

    return smooth(smooth(sig[::-1])[::-1])


def make_path(x, y, psi, vel, filter_width: int = 11) -> PathData:
    """Build the arc-length parameterization (``set_traj`` +
    ``compute_curvature``, ``ref_traj.py:10-25, 67-86``)."""
    x, y, psi, vel = map(jnp.asarray, (x, y, psi, vel))
    seg = jnp.sqrt(jnp.diff(x) ** 2 + jnp.diff(y) ** 2)
    cdist = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])

    dpsi = jnp.diff(unwrap_angles(psi))
    curv_raw = dpsi / jnp.maximum(jnp.diff(cdist), 0.1)
    curv_raw = jnp.concatenate([curv_raw, curv_raw[-1:]])
    curv = _moving_average_filtfilt(curv_raw, filter_width)
    return PathData(x=x, y=y, psi=psi, vel=vel, cdist=cdist, curv=curv)


# Vehicle-level reachable-acceleration envelope, owned HERE so every
# consumer (enveloped windowing, legacy resample_vel callers, deployment
# nodes) caps against the same physical limits.
ENVELOPE_ACC_MAX = 3.0
ENVELOPE_DEC_MAX = 5.0


def get_waypoints(
    path: PathData, x_init, y_init, psi_init, traj_horizon: int,
    traj_dt: float, v_now=None, acc_max: float = ENVELOPE_ACC_MAX,
    dec_max: float = ENVELOPE_DEC_MAX,
) -> WaypointRefs:
    """Per-tick local reference extraction (``get_waypoints``,
    ``ref_traj.py:89-171``). Pure function: jit/vmap over vehicles.

    ``v_now`` (optional): current vehicle speed. When given, the
    arc-length march is capped by the reachable acceleration envelope
    from ``v_now`` (``resample_vel`` composed INTO the interpolation):
    positions AND velocities then describe the same reachable window.
    Capping only the velocity row while the positions march at the
    path's target speed (the naive composition) makes the window
    untrackable from low speed — the plausibility gate then rejects every
    solve and the arming watchdog can never bootstrap from standstill at
    an aggressive target speed (measured r5 deadlock)."""
    psi_init = wrap_to_pi(psi_init)

    # (1) Closest waypoint.
    d2 = (path.x - x_init) ** 2 + (path.y - y_init) ** 2
    ci = jnp.argmin(d2)

    # (2) Frenet error coordinates.
    psi_w = path.psi[ci]
    cos_p, sin_p = jnp.cos(psi_w), jnp.sin(psi_w)
    ex = x_init - path.x[ci]
    ey = y_init - path.y[ci]
    e_y0 = -sin_p * ex + cos_p * ey
    s0 = path.cdist[ci]
    e_psi0 = wrap_to_pi(psi_init - psi_w)

    # (3) Velocity-based arc-length interpolation ANCHORED AT s0
    # (ref_traj.py:126-132): the query marches forward from the vehicle's
    # own arc position using the velocity profile AT each queried position,
    # so the function is also correct standalone against a long global path
    # (not only when the caller re-windows the track every tick).
    if v_now is None:

        def advance(s, _):
            v = jnp.interp(s, path.cdist, path.vel)
            s_next = s + traj_dt * v
            return s_next, s_next

        _, s_query = jax.lax.scan(advance, s0, None, length=traj_horizon)
    else:

        def advance(carry, _):
            s, v_prev = carry
            v_path = jnp.interp(s, path.cdist, path.vel)
            v = jnp.clip(
                v_path,
                jnp.maximum(v_prev - dec_max * traj_dt, 0.0),
                v_prev + acc_max * traj_dt,
            )
            s_next = s + traj_dt * v
            return (s_next, v), s_next

        (_, _), s_query = jax.lax.scan(
            advance, (s0, jnp.asarray(v_now, jnp.result_type(s0))),
            None, length=traj_horizon,
        )

    x_ref = jnp.interp(s_query, path.cdist, path.x)
    y_ref = jnp.interp(s_query, path.cdist, path.y)
    psi_unwrapped = unwrap_angles(path.psi)
    psi_ref = jnp.interp(s_query, path.cdist, psi_unwrapped)
    cdist_ref = jnp.interp(s_query, path.cdist, path.cdist)
    curv_ref = jnp.interp(s_query, path.cdist, path.curv)

    psi_ref = fix_angle_reference(psi_ref, psi_init)
    psi_ref = wrap_to_pi(psi_ref)

    # v_ref by finite differences of interpolated arc length
    # (ref_traj.py:147-149).
    v_ref = jnp.diff(cdist_ref) / traj_dt
    v_ref = jnp.concatenate([v_ref, v_ref[-1:]])

    stop = cdist_ref[-1] >= path.cdist[-1] - 1e-9

    # First-3-point re-anchoring to the current pose (ref_traj.py:157-167):
    # keeps the front of the reference reachable from where the car actually
    # is. The resulting arrays stay length H (last point dropped).
    def reanchor(ref, first3):
        return jnp.concatenate([first3, ref[2:-1]])

    x_ref = reanchor(x_ref, jnp.linspace(x_init, x_ref[1], 3))
    y_ref = reanchor(y_ref, jnp.linspace(y_init, y_ref[1], 3))
    psi_ref = reanchor(psi_ref, jnp.full(3, psi_ref[0]))
    v_ref = reanchor(v_ref, jnp.full(3, v_ref[2]))
    curv_ref = reanchor(curv_ref, jnp.full(3, curv_ref[0]))

    return WaypointRefs(
        s0=s0, e_y0=e_y0, e_psi0=e_psi0,
        x_ref=x_ref, y_ref=y_ref, psi_ref=psi_ref, v_ref=v_ref,
        curv_ref=curv_ref, stop=stop,
    )


def resample_vel(v_ref, v_now, dt, acc_max: float = ENVELOPE_ACC_MAX,
                 dec_max: float = ENVELOPE_DEC_MAX):
    """Limit the velocity reference to the reachable acceleration envelope
    from the current speed (node-level ``resample_vel``,
    ``gp_ad_mpc_node.py:344-349``)."""
    steps = jnp.arange(1, v_ref.shape[0] + 1, dtype=v_ref.dtype)
    upper = v_now + acc_max * dt * steps
    lower = jnp.maximum(v_now - dec_max * dt * steps, 0.0)
    return jnp.clip(v_ref, lower, upper)


class PathReference:
    """Thin stateful wrapper mirroring the reference's ``RefTrajectory`` API
    (``set_traj`` / ``get_waypoints``) over the pure functions above."""

    def __init__(self, traj_horizon: int = 10, traj_dt: float = 0.2):
        self.traj_horizon = traj_horizon
        self.traj_dt = traj_dt
        self._path: PathData | None = None
        self._get = jax.jit(
            lambda path, x, y, p: get_waypoints(
                path, x, y, p, self.traj_horizon, self.traj_dt
            )
        )
        self._get_env = jax.jit(
            lambda path, x, y, p, v, am, dm: get_waypoints(
                path, x, y, p, self.traj_horizon, self.traj_dt,
                v_now=v, acc_max=am, dec_max=dm,
            )
        )

    def set_traj(self, x_ref, y_ref, psi_ref, vel_ref):
        self._path = make_path(x_ref, y_ref, psi_ref, vel_ref)

    def get_waypoints(self, x_init, y_init, psi_init) -> WaypointRefs:
        if self._path is None:
            raise RuntimeError("trajectory has not been set")
        return self._get(self._path, x_init, y_init, psi_init)

    def get_waypoints_enveloped(
        self, x_init, y_init, psi_init, v_now,
        acc_max: float = ENVELOPE_ACC_MAX, dec_max: float = ENVELOPE_DEC_MAX,
    ) -> WaypointRefs:
        """Reference window capped by the reachable acceleration envelope
        from the current speed — positions and velocities consistent (see
        :func:`get_waypoints` ``v_now`` docs)."""
        if self._path is None:
            raise RuntimeError("trajectory has not been set")
        return self._get_env(
            self._path, x_init, y_init, psi_init, v_now, acc_max, dec_max
        )
