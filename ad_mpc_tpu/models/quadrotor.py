"""13-state quadrotor dynamics (pos, quat, vel, body-rate), 4 motor inputs.

Capability parity with the reference quadrotor model
(``ros_gp_mpc/src/quad_mpc/quad_3d.py:20-95`` parameters,
``ros_gp_mpc/src/quad_mpc/quad_3d_optimizer.py:341-393`` dynamics), written
as one pure JAX function. The optional RDRv linear-drag matrix (Faessler et
al.) enters as a parameter, not separate codegen.

State  x = [p(3), q_wxyz(4), v_world(3), w_body(3)]
Input  u in [0,1]^4  (normalized motor thrusts)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ad_mpc_tpu.utils.math import (
    q_to_rot_mat,
    quaternion_inverse,
    skew_symmetric,
    v_dot_q,
)


def _rotor_xy(length: float, configuration: str):
    """Thruster positions for 'x' or '+' airframes (quad_3d.py:64-71)."""
    if configuration == "+":
        x_f = np.array([length, 0.0, -length, 0.0])
        y_f = np.array([0.0, length, 0.0, -length])
    else:  # 'x'
        h = np.cos(np.pi / 4) * length
        x_f = np.array([h, -h, -h, h])
        y_f = np.array([-h, -h, h, h])
    return x_f, y_f


class QuadrotorParams(NamedTuple):
    """Physical parameters; defaults reproduce the reference quad
    (quad_3d.py:38-95)."""

    mass: float = 1.0  # [kg]
    j: tuple = (0.03, 0.03, 0.06)  # diagonal inertia [kg m^2]
    max_thrust: float = 20.0  # per-motor max thrust [N]
    length: float = 0.47 / 2  # arm length [m]
    c_torque: float = 0.013  # z-torque per unit thrust [m]
    configuration: str = "x"
    g: float = 9.81

    @property
    def x_f(self):
        return _rotor_xy(self.length, self.configuration)[0]

    @property
    def y_f(self):
        return _rotor_xy(self.length, self.configuration)[1]

    @property
    def z_l_tau(self):
        c = self.c_torque
        return np.array([-c, c, -c, c])


NX = 13
NU = 4


def quad_dynamics(x, u, params: QuadrotorParams = QuadrotorParams(), rdrv_d=None):
    """Continuous-time dynamics x_dot = f(x, u).

    :param rdrv_d: optional (3,3) linear drag matrix D; adds
        ``R(q) @ D @ R(q)^T v`` to the velocity dynamics (RDRv model,
        quad_3d_optimizer.py:364-382).
    """
    dtype = jnp.result_type(x)
    q = x[3:7]
    v = x[7:10]
    w = x[10:13]

    f_thrust = u * params.max_thrust
    j = jnp.asarray(params.j, dtype=dtype)

    p_dot = v
    q_dot = 0.5 * skew_symmetric(w) @ q

    a_thrust = (
        jnp.array([0.0, 0.0, 1.0], dtype=dtype)
        * jnp.sum(f_thrust) / params.mass
    )
    g_vec = jnp.array([0.0, 0.0, params.g], dtype=dtype)
    v_dot = v_dot_q(a_thrust, q) - g_vec
    if rdrv_d is not None:
        v_b = v_dot_q(v, quaternion_inverse(q))
        v_dot = v_dot + v_dot_q(jnp.asarray(rdrv_d, dtype=dtype) @ v_b, q)

    x_f = jnp.asarray(params.x_f, dtype=dtype)
    y_f = jnp.asarray(params.y_f, dtype=dtype)
    z_l_tau = jnp.asarray(params.z_l_tau, dtype=dtype)
    w_dot = jnp.stack(
        [
            (jnp.dot(f_thrust, y_f) + (j[1] - j[2]) * w[1] * w[2]) / j[0],
            (-jnp.dot(f_thrust, x_f) + (j[2] - j[0]) * w[2] * w[0]) / j[1],
            (jnp.dot(f_thrust, z_l_tau) + (j[0] - j[1]) * w[0] * w[1]) / j[2],
        ]
    )

    return jnp.concatenate([p_dot, q_dot, v_dot, w_dot])


def quad_dynamics_lane(x, u, p, params: QuadrotorParams = QuadrotorParams()):
    """Lane-polymorphic quadrotor dynamics for the fused Pallas VDE kernel
    (:mod:`ad_mpc_tpu.ops.pallas_vde`): per-entry indexing + elementwise ops
    + trailing ``jnp.stack`` only, so it evaluates on (13, N, B) slabs with
    stages/scenarios on the trailing axes. Identical mathematics to
    :func:`quad_dynamics` with ``rdrv_d=None`` (quaternion kinematics,
    thrust rotation and inertia torques expanded entrywise instead of via
    matmuls, which Mosaic's vector layouts cannot tile at these ranks);
    equality is asserted by ``tests/test_pallas_vde.py``. ``p`` is accepted
    for the (x, u, p) kernel contract and ignored.
    """
    del p
    qw, qx, qy, qz = x[3], x[4], x[5], x[6]
    vx, vy, vz = x[7], x[8], x[9]
    wx, wy, wz = x[10], x[11], x[12]

    t0 = u[0] * params.max_thrust
    t1 = u[1] * params.max_thrust
    t2 = u[2] * params.max_thrust
    t3 = u[3] * params.max_thrust

    # Quaternion kinematics q_dot = 1/2 Omega(w) q, expanded.
    q_dot_w = 0.5 * (-qx * wx - qy * wy - qz * wz)
    q_dot_x = 0.5 * (qw * wx + qy * wz - qz * wy)
    q_dot_y = 0.5 * (qw * wy - qx * wz + qz * wx)
    q_dot_z = 0.5 * (qw * wz + qx * wy - qy * wx)

    # v_dot = R(q) [0, 0, T/m] - g z_hat: third column of R(q), expanded.
    a = (t0 + t1 + t2 + t3) / params.mass
    v_dot_x = 2.0 * (qx * qz + qw * qy) * a
    v_dot_y = 2.0 * (qy * qz - qw * qx) * a
    v_dot_z = (1.0 - 2.0 * qx * qx - 2.0 * qy * qy) * a - params.g

    # Body-rate dynamics: thrust moments (static rotor geometry unrolls to
    # scalar coefficients) + Euler inertia coupling.
    jxx, jyy, jzz = (float(v) for v in params.j)
    # Python-float coefficients: numpy f64 scalars would promote the whole
    # slab to f64 under x64 mode, which the f32 kernel refs reject.
    x_f = [float(v) for v in params.x_f]
    y_f = [float(v) for v in params.y_f]
    z_l = [float(v) for v in params.z_l_tau]
    m_x = t0 * y_f[0] + t1 * y_f[1] + t2 * y_f[2] + t3 * y_f[3]
    m_y = -(t0 * x_f[0] + t1 * x_f[1] + t2 * x_f[2] + t3 * x_f[3])
    m_z = t0 * z_l[0] + t1 * z_l[1] + t2 * z_l[2] + t3 * z_l[3]
    w_dot_x = (m_x + (jyy - jzz) * wy * wz) / jxx
    w_dot_y = (m_y + (jzz - jxx) * wz * wx) / jyy
    w_dot_z = (m_z + (jxx - jyy) * wx * wy) / jzz

    return jnp.stack(
        [
            vx, vy, vz,
            q_dot_w, q_dot_x, q_dot_y, q_dot_z,
            v_dot_x, v_dot_y, v_dot_z,
            w_dot_x, w_dot_y, w_dot_z,
        ]
    )


def normalize_quat_state(x):
    """Renormalize the quaternion block of a 13D state (post-integration)."""
    q = x[3:7]
    q = q / jnp.linalg.norm(q)
    return x.at[3:7].set(q)


def input_bounds(params: QuadrotorParams = QuadrotorParams()):
    """Normalized motor thrust bounds [0, 1] (quad_3d.py:53-55)."""
    return np.zeros(NU), np.ones(NU)


def hover_input(params: QuadrotorParams = QuadrotorParams()):
    """Normalized input where total thrust balances gravity."""
    return np.full(NU, params.mass * params.g / (NU * params.max_thrust))


def quat_rot_mat(q):
    return q_to_rot_mat(q)
