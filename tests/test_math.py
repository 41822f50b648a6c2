"""Unit tests for quaternion/angle math vs scipy and analytic identities."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from ad_mpc_tpu.utils import math as qm

rng = np.random.default_rng(0)


def random_quat(n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.normal(size=shape)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q):
    """[w,x,y,z] -> scipy's [x,y,z,w]."""
    return np.roll(np.asarray(q), -1, axis=-1)


class TestQuaternion:
    def test_rot_mat_vs_scipy(self):
        q = random_quat(32)
        ours = np.asarray(qm.q_to_rot_mat(q))
        theirs = R.from_quat(to_scipy(q)).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-12)

    def test_v_dot_q(self):
        q = random_quat(16)
        v = rng.normal(size=(16, 3))
        ours = np.asarray(qm.v_dot_q(v, q))
        theirs = R.from_quat(to_scipy(q)).apply(v)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)

    def test_q_dot_q_vs_scipy(self):
        q1, q2 = random_quat(8), random_quat(8)
        ours = np.asarray(qm.q_dot_q(q1, q2))
        theirs = R.from_quat(to_scipy(q1)) * R.from_quat(to_scipy(q2))
        theirs = np.roll(theirs.as_quat(), 1, axis=-1)
        # Quaternion double cover: q and -q are the same rotation.
        sign = np.sign(np.sum(ours * theirs, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours, theirs * sign, atol=1e-12)

    def test_inverse(self):
        q = random_quat(8)
        ident = np.asarray(qm.q_dot_q(q, qm.quaternion_inverse(q)))
        np.testing.assert_allclose(ident, np.tile([1, 0, 0, 0], (8, 1)), atol=1e-12)

    def test_skew_symmetric_kinematics(self):
        # q_dot = 1/2 Omega(w) q must equal 1/2 q * (0, w) (Hamilton product).
        q = random_quat(8)
        w = rng.normal(size=(8, 3))
        lhs = 0.5 * np.einsum("nij,nj->ni", np.asarray(qm.skew_symmetric(w)), q)
        w_quat = np.concatenate([np.zeros((8, 1)), w], axis=-1)
        rhs = 0.5 * np.asarray(qm.q_dot_q(q, w_quat))
        np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    def test_euler_round_trip(self):
        q = random_quat(32)
        rpy = np.asarray(qm.quaternion_to_euler(q))
        q2 = np.asarray(qm.euler_to_quaternion(rpy[:, 0], rpy[:, 1], rpy[:, 2]))
        sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, q2 * sign, atol=1e-9)

    def test_euler_vs_scipy(self):
        q = random_quat(32)
        ours = np.asarray(qm.quaternion_to_euler(q))
        theirs = R.from_quat(to_scipy(q)).as_euler("ZYX")[:, ::-1]
        np.testing.assert_allclose(ours, theirs, atol=1e-9)

    def test_rotation_matrix_to_quat(self):
        q = random_quat(64)
        rot = np.asarray(qm.q_to_rot_mat(q))
        q2 = np.asarray(qm.rotation_matrix_to_quat(rot))
        sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, q2 * sign, atol=1e-6)

    def test_undo_quaternion_flip(self):
        q = random_quat(8)
        flipped = np.asarray(qm.undo_quaternion_flip(q, -q))
        np.testing.assert_allclose(flipped, q, atol=1e-12)

    def test_skew_3d(self):
        v, u = rng.normal(size=(2, 3))
        np.testing.assert_allclose(
            np.asarray(qm.skew_3d(v)) @ u, np.cross(v, u), atol=1e-12
        )


class TestAngles:
    def test_wrap_to_pi(self):
        a = rng.uniform(-20, 20, size=100)
        w = np.asarray(qm.wrap_to_pi(a))
        assert np.all(w > -np.pi - 1e-12) and np.all(w <= np.pi + 1e-12)
        np.testing.assert_allclose(np.cos(w), np.cos(a), atol=1e-12)
        np.testing.assert_allclose(np.sin(w), np.sin(a), atol=1e-12)

    def test_unwrap_vs_numpy(self):
        a = np.cumsum(rng.uniform(-0.5, 0.5, size=200))
        wrapped = np.asarray(qm.wrap_to_pi(a))
        ours = np.asarray(qm.unwrap_angles(wrapped))
        theirs = np.unwrap(wrapped)
        np.testing.assert_allclose(ours, theirs, atol=1e-9)

    def test_fix_angle_reference(self):
        # A reference crossing the -pi/pi seam must become continuous.
        ref = np.asarray(qm.wrap_to_pi(np.linspace(3.0, 3.5, 20)))
        fixed = np.asarray(qm.fix_angle_reference(ref, 3.0))
        assert np.max(np.abs(np.diff(fixed))) < 0.1
        np.testing.assert_allclose(np.cos(fixed), np.cos(ref), atol=1e-9)

    @pytest.mark.parametrize(
        "psi0,ref,expect",
        [
            (-3.0, 1.0, 1.0 - 2 * np.pi),  # ref crosses pi from negative psi0
            (3.0, -1.0, -1.0 + 2 * np.pi),  # ref crosses -pi from positive psi0
            (0.5, 1.0, 1.0),  # no wrap needed
            (-0.5, -1.0, -1.0),
        ],
    )
    def test_yaw_wrap_reference_parity(self, psi0, ref, expect):
        # Mirrors reference ad_3d_optimizer.py:420-438 semantics exactly.
        got = float(qm.yaw_wrap_reference(np.array(ref), psi0))
        assert got == pytest.approx(expect)


def test_interpol_mse():
    t = np.linspace(0, 1, 50)
    x = np.stack([np.sin(t), np.cos(t)], axis=-1)
    assert float(qm.interpol_mse(t, x, t, x)) < 1e-9
    shifted = x + 0.1
    assert float(qm.interpol_mse(t, x, t, shifted)) == pytest.approx(
        np.sqrt(0.02), rel=1e-6
    )


class TestMosaicAtan:
    """Error bounds of the Mosaic-lowerable atan (documented 4e-7 for values
    and first derivatives — the bound the Pacejka model relies on)."""

    def test_value_error_bound(self):
        import jax

        for lo, hi in [(-1.5, 1.5), (-100.0, 100.0), (-1e-4, 1e-4)]:
            x = np.linspace(lo, hi, 200_001).astype(np.float32)
            got = np.asarray(jax.jit(qm.atan_mosaic)(x))
            err = np.abs(got - np.arctan(x.astype(np.float64)))
            assert err.max() < 4e-7, (lo, hi, err.max())

    def test_grad_error_and_nan_free(self):
        import jax

        x = np.linspace(-5.0, 5.0, 50_001).astype(np.float32)
        g = np.asarray(jax.vmap(jax.grad(qm.atan_mosaic))(x))
        gref = 1.0 / (1.0 + x.astype(np.float64) ** 2)
        assert np.isfinite(g).all()
        assert np.abs(g - gref).max() < 4e-7
        # the branch points x = 0 and |x| = 1 (forward mode = the VDE path)
        for pt in (0.0, 1.0, -1.0):
            _, t = jax.jvp(qm.atan_mosaic, (pt,), (1.0,))
            assert np.isfinite(t) and abs(t - 1.0 / (1.0 + pt * pt)) < 1e-6

    def test_atan2_quadrants(self):
        import jax

        y = np.array([1.0, 1.0, -1.0, -1.0, 0.5, 1e-3], np.float32)
        x = np.array([1.0, -1.0, -1.0, 1.0, 2.0, -1.0], np.float32)
        got = np.asarray(jax.jit(qm.atan2_mosaic)(y, x))
        np.testing.assert_allclose(
            got, np.arctan2(y.astype(np.float64), x.astype(np.float64)),
            atol=1e-6,
        )
