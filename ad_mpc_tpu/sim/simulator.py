"""Digital-twin plant simulators with a configurable disturbance suite.

Capability parity with the reference's Simplified Simulator
(``ros_gp_mpc/src/quad_mpc/quad_3d.py:175-287``: RK4 update, gaussian
force/torque noise, quadratic aero + linear rotor drag, payload force,
asymmetric motor voltage noise) and the AD plant holder (``ad_3d.py``),
redesigned functionally: the simulator is a pure ``step(state, u, key)``
keyed by an explicit JAX PRNG key, so fault-injection sweeps vmap over keys
and whole scenario fleets run on-device.

The disturbance suite doubles as the framework's fault-injection surface
(SURVEY.md §5 "failure detection / fault injection").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ad_mpc_tpu.models.bicycle import BicycleParams, bicycle_dynamics
from ad_mpc_tpu.models.quadrotor import (
    QuadrotorParams,
    normalize_quat_state,
    quad_dynamics,
)
from ad_mpc_tpu.ops.integrators import rk4_step
from ad_mpc_tpu.utils.math import quaternion_inverse, v_dot_q


class DisturbanceConfig(NamedTuple):
    """Toggles mirroring ``SimpleSimConfig.simulation_disturbances``
    (``configuration_parameters.py:46-51``)."""

    noisy: bool = False  # gaussian force/torque noise
    drag: bool = False  # quadratic aero + linear rotor drag
    payload: bool = False  # constant payload force
    motor_noise: bool = False  # asymmetric motor voltage noise


class QuadrotorSim:
    """13-state quadrotor twin. ``step`` integrates one control period with
    RK4 sub-steps of ``sim_dt`` (the reference uses 0.5 ms,
    ``quad_3d_mpc.py:simulate``)."""

    def __init__(
        self,
        params: QuadrotorParams = QuadrotorParams(),
        disturbances: DisturbanceConfig = DisturbanceConfig(),
        sim_dt: float = 5e-4,
    ):
        self.params = params
        self.dist = disturbances
        self.sim_dt = sim_dt

        p = params
        d = disturbances
        rotor_drag = jnp.array([0.3, 0.3, 0.0])
        aero_drag = 0.08
        payload_mass = 0.3 * float(d.payload)

        def f_dist(x, u_thrust, f_d, t_d):
            """Continuous dynamics with additive disturbance force/torque and
            drag (quad_3d.py:244-287)."""
            base = quad_dynamics(x, u_thrust / p.max_thrust, p)
            q, v, w = x[3:7], x[7:10], x[10:13]
            a_extra = jnp.zeros(3)
            if d.drag:
                v_b = v_dot_q(v, quaternion_inverse(q))
                a_drag_b = (
                    -aero_drag * v_b**2 * jnp.sign(v_b) / p.mass
                    - rotor_drag * v_b / p.mass
                )
                a_extra = a_extra + v_dot_q(a_drag_b, q)
            a_extra = a_extra + v_dot_q(f_d / p.mass, q)
            a_extra = a_extra - jnp.array([0.0, 0.0, payload_mass * p.g / p.mass])
            j = jnp.asarray(p.j)
            w_extra = t_d / j
            return base.at[7:10].add(a_extra).at[10:13].add(w_extra)

        def step(x, u, key, dt):
            """Integrate one control period of length dt. u is normalized
            [0,1]^4; returns (x_next, key)."""
            k_motor, k_f, k_t = jax.random.split(key, 3)
            u = jnp.clip(u, 0.0, 1.0)
            if d.motor_noise:
                # Reference quad_3d.py:188-192: bias 0.1*(u/1.3)^2,
                # std 0.02*sqrt(u).
                std = 0.02 * jnp.sqrt(u)
                noise = 0.1 * (u / 1.3) ** 2 + std * jax.random.normal(
                    k_motor, u.shape
                )
                u_eff = jnp.clip(u - noise, 0.0, 1.0)
            else:
                u_eff = u
            u_thrust = u_eff * p.max_thrust

            n_sub = max(int(round(dt / self.sim_dt)), 1)
            h = dt / n_sub

            if d.noisy:
                f_d = jax.random.normal(k_f, (3,)) * 10 * h
                t_d = jax.random.normal(k_t, (3,)) * 10 * h
            else:
                f_d = jnp.zeros(3)
                t_d = jnp.zeros(3)

            def body(_, x):
                x = rk4_step(lambda xx, uu: f_dist(xx, uu, f_d, t_d), x, u_thrust, h)
                return normalize_quat_state(x)

            x = jax.lax.fori_loop(0, n_sub, body, x)
            return x, jax.random.fold_in(key, 1)

        self._step = step
        self.step = jax.jit(step, static_argnums=(3,))


class BicycleSim:
    """7-state bicycle twin (the plant role CARLA plays for the AD stack;
    the reference's own RK4 update is ``ad_3d.py:109-153``, disabled there
    because CARLA is the plant)."""

    def __init__(
        self,
        params: BicycleParams = BicycleParams(),
        disturbances: DisturbanceConfig = DisturbanceConfig(),
        sim_dt: float = 1e-3,
    ):
        self.params = params
        self.dist = disturbances
        self.sim_dt = sim_dt

        p = params
        d = disturbances

        def step(x, u, key, dt):
            u = jnp.stack(
                [
                    jnp.clip(u[0], p.acc_min, p.acc_max),
                    jnp.clip(u[1], p.steering_rate_min, p.steering_rate_max),
                ]
            )
            if d.motor_noise:
                k1, key = jax.random.split(key)
                u = u + 0.02 * jnp.sqrt(jnp.abs(u)) * jax.random.normal(k1, (2,))
            n_sub = max(int(round(dt / self.sim_dt)), 1)
            h = dt / n_sub

            if d.noisy:
                k2, key = jax.random.split(key)
                w = jax.random.normal(k2, (2,)) * 0.5 * h
            else:
                w = jnp.zeros(2)

            def f(xx, uu):
                xd = bicycle_dynamics(xx, uu, p)
                return xd.at[3].add(w[0]).at[4].add(w[1])

            def body(_, xx):
                xx = rk4_step(f, xx, u, h)
                # Keep steering within physical range.
                xx = xx.at[6].set(
                    jnp.clip(xx[6], p.steering_min, p.steering_max)
                )
                # Braking stops at standstill — it does not drive the car
                # backwards (the plant role CARLA plays: negative
                # AckermannDrive accel is a BRAKE). Without this, the
                # brake-fallback controller reverses the plant
                # indefinitely and the arming gate can never re-arm.
                return xx.at[3].set(
                    jnp.where(u[0] < 0.0, jnp.maximum(xx[3], 0.0), xx[3])
                )

            x = jax.lax.fori_loop(0, n_sub, body, x)
            return x, jax.random.fold_in(key, 1)

        self.step = jax.jit(step, static_argnums=(3,))
