"""Quaternion / angle algebra as pure jnp functions.

Capability parity with the reference's dual numpy/CasADi math utilities
(``ros_gp_mpc/src/utils/utils.py:284-455, 843-856``). Because JAX traces pure
functions, a single implementation serves eager numpy-like use, ``jit``,
``vmap``, and ``grad`` — the reference needed two copies (numpy + CasADi MX)
of every routine.

Quaternions are ``[w, x, y, z]`` (Hamilton convention), matching the reference.
All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def atan_mosaic(x):
    """``arctan`` from Mosaic-lowerable primitives only (mul/add/div/sqrt/
    select) — ``jnp.arctan``/``jnp.arctan2`` have no Pallas TPU lowering
    rule, which is fatal for dynamics traced inside the fused VDE kernel
    (:mod:`ad_mpc_tpu.ops.pallas_vde`).

    Method: reciprocal range reduction to [0, 1], two half-angle reductions
    ``atan(z) = 2 atan(z / (1 + sqrt(1 + z^2)))`` bringing the argument under
    tan(pi/16) ≈ 0.199, then the degree-9 odd Taylor polynomial (truncation
    error < 2e-9, below f32 rounding). Total error vs f64 ``arctan``:
    |err| < 4e-7 for values AND first derivatives over |x| ≤ 1e30, asserted
    by ``tests/test_math.py``. Branches use the double-``where`` trick so
    forward/reverse AD stay NaN-free at x = 0.
    """
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.where(inv, ax, 1.0), ax)
    w = z / (1.0 + jnp.sqrt(1.0 + z * z))
    w = w / (1.0 + jnp.sqrt(1.0 + w * w))
    w2 = w * w
    p = w * (
        1.0
        + w2 * (-1.0 / 3.0 + w2 * (0.2 + w2 * (-1.0 / 7.0 + w2 / 9.0)))
    )
    r = 4.0 * p
    r = jnp.where(inv, jnp.pi / 2.0 - r, r)
    return jnp.where(x < 0.0, -r, r)


def atan2_mosaic(y, x):
    """Four-quadrant ``arctan2`` built on :func:`atan_mosaic` (same error
    bound away from the negative real axis; x = 0 handled by the reciprocal
    reduction inside ``atan_mosaic`` via y/x = ±inf)."""
    base = atan_mosaic(y / jnp.where(x == 0.0, 1e-30, x))
    shift = jnp.where(y < 0.0, -jnp.pi, jnp.pi)
    return jnp.where(x < 0.0, base + shift, base)


def skew_symmetric(v):
    """4x4 quaternion-kinematics matrix Omega(v) with q_dot = 1/2 Omega(w) q.

    Mirrors reference ``utils.py:392-404`` (PAMPC convention). Batched over
    leading dims: v (..., 3) -> (..., 4, 4).
    """
    v = jnp.asarray(v)
    z = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    rows = [
        jnp.stack([z, -vx, -vy, -vz], axis=-1),
        jnp.stack([vx, z, vz, -vy], axis=-1),
        jnp.stack([vy, -vz, z, vx], axis=-1),
        jnp.stack([vz, vy, -vx, z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def skew_3d(v):
    """Classic 3x3 cross-product matrix: skew(v) @ u == cross(v, u)."""
    v = jnp.asarray(v)
    z = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    rows = [
        jnp.stack([z, -vz, vy], axis=-1),
        jnp.stack([vz, z, -vx], axis=-1),
        jnp.stack([-vy, vx, z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def unit_quat(q):
    """Normalize to unit modulus (reference ``utils.py:299-312``)."""
    q = jnp.asarray(q)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def q_to_rot_mat(q):
    """Unit quaternion (..., 4) [w,x,y,z] -> rotation matrix (..., 3, 3)."""
    q = jnp.asarray(q)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (qy**2 + qz**2)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx**2 + qz**2)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx**2 + qy**2)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def v_dot_q(v, q):
    """Rotate vector v (..., 3) by unit quaternion q (..., 4)."""
    rot = q_to_rot_mat(q)
    return jnp.einsum("...ij,...j->...i", rot, jnp.asarray(v))


def q_dot_q(q, r):
    """Hamilton product q*r, both (..., 4) [w,x,y,z]."""
    q = jnp.asarray(q)
    r = jnp.asarray(r)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rw, rx, ry, rz = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=-1,
    )


def quaternion_inverse(q):
    """Conjugate of a unit quaternion."""
    q = jnp.asarray(q)
    return jnp.stack([q[..., 0], -q[..., 1], -q[..., 2], -q[..., 3]], axis=-1)


def quaternion_to_euler(q):
    """Unit quaternion -> (roll, pitch, yaw), matching the reference's
    pyquaternion yaw_pitch_roll ZYX convention (``utils.py:293-296``)."""
    q = jnp.asarray(q)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (qw * qx + qy * qz), 1 - 2 * (qx**2 + qy**2))
    sinp = jnp.clip(2 * (qw * qy - qz * qx), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy**2 + qz**2))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_to_quaternion(roll, pitch, yaw):
    """ZYX Euler angles -> unit quaternion [w,x,y,z]."""
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def rotation_matrix_to_quat(rot):
    """Rotation matrix (..., 3, 3) -> unit quaternion (branch-free Shepperd).

    Uses the four candidate extractions and picks the best-conditioned one
    with ``where`` masks so the function stays jit/vmap-friendly.
    """
    rot = jnp.asarray(rot)
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 = 1 + ... (>= 0 clamped).
    qw2 = jnp.maximum(1 + tr, 0.0)
    qx2 = jnp.maximum(1 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1 - m00 - m11 + m22, 0.0)

    eps = 1e-12
    q_w = jnp.stack(
        [qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1
    ) / (2 * jnp.sqrt(qw2 + eps)[..., None])
    q_x = jnp.stack(
        [m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1
    ) / (2 * jnp.sqrt(qx2 + eps)[..., None])
    q_y = jnp.stack(
        [m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1
    ) / (2 * jnp.sqrt(qy2 + eps)[..., None])
    q_z = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1
    ) / (2 * jnp.sqrt(qz2 + eps)[..., None])

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    return unit_quat(q[..., 0, :])


def undo_quaternion_flip(q_past, q_current):
    """Keep quaternion sign-continuity: flip q_current if q_past is closer to
    -q_current than to +q_current (reference ``utils.py`` capability)."""
    q_past = jnp.asarray(q_past)
    q_current = jnp.asarray(q_current)
    flip = jnp.sum((q_past - q_current) ** 2, axis=-1) > jnp.sum(
        (q_past + q_current) ** 2, axis=-1
    )
    return jnp.where(flip[..., None], -q_current, q_current)


def wrap_to_pi(angle):
    """Wrap angle(s) to (-pi, pi] (reference ``bound_angle_within_pi``,
    ``ref_traj.py:28-29``)."""
    return (jnp.asarray(angle) + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def unwrap_angles(angles, axis=-1):
    """np.unwrap equivalent: remove jumps > pi along an axis (jit-friendly)."""
    angles = jnp.asarray(angles)
    d = jnp.diff(angles, axis=axis)
    d_wrapped = wrap_to_pi(d)
    correction = jnp.cumsum(d_wrapped - d, axis=axis)
    pad = [(0, 0)] * angles.ndim
    pad[axis if axis >= 0 else angles.ndim + axis] = (1, 0)
    return angles + jnp.pad(correction, pad)


def fix_angle_reference(angle_ref, angle_init):
    """Smooth a reference angle sequence w.r.t. an initial angle so there are
    no 2*pi jumps (reference ``ref_traj.py:31-36``)."""
    diff = wrap_to_pi(jnp.asarray(angle_ref) - angle_init)
    diff = unwrap_angles(diff)
    return angle_init + diff


def yaw_wrap_reference(psi_ref, psi0):
    """ACADOS-parity yaw-wrap correction of a yaw reference against the
    current state's yaw (reference ``ad_3d_optimizer.py:420-438``):

    - if psi0 < 0 and psi0 + pi < ref: ref -= 2*pi
    - if psi0 > 0 and psi0 - pi > ref: ref += 2*pi
    """
    psi_ref = jnp.asarray(psi_ref)
    down = (psi0 < 0) & (psi0 + jnp.pi < psi_ref)
    up = (psi0 > 0) & (psi0 - jnp.pi > psi_ref)
    return psi_ref - 2 * jnp.pi * down + 2 * jnp.pi * up


def interpol_mse(t_1, x_1, t_2, x_2):
    """RMSE between two time-stamped position sequences after interpolating
    the second onto the first's timestamps (reference ``utils.py:238-259``
    uses cubic interpolation; linear is used here — identical for the dense
    samplings the experiments produce)."""
    x_2 = jnp.asarray(x_2)
    x_interp = jnp.stack(
        [jnp.interp(t_1, t_2, x_2[:, i]) for i in range(x_2.shape[1])], axis=-1
    )
    err = jnp.sum((jnp.asarray(x_1) - x_interp) ** 2, axis=-1)
    return jnp.sqrt(jnp.mean(err))


def quaternion_state_mse(x, x_ref, mask):
    """Weighted MSE between two 13D quad states with quaternion geodesic
    distance for the attitude block (reference ``utils.py:811-825``)."""
    x = jnp.asarray(x)
    x_ref = jnp.asarray(x_ref)
    q_err = q_dot_q(x[3:7], quaternion_inverse(x_ref[3:7]))
    e = jnp.concatenate(
        [x[:3] - x_ref[:3], q_err[1:], x[7:10] - x_ref[7:10], x[10:] - x_ref[10:]]
    )
    return jnp.sqrt(jnp.sum((e * jnp.asarray(mask)) ** 2))
