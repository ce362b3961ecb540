"""Unit tests for math utilities against analytic ground truth and scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from leibnizgym_tpu.utils import math as m


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestTransforms:
    def test_scale_unscale_roundtrip(self):
        lo = jnp.array([-2.0, 0.0, 5.0])
        hi = jnp.array([3.0, 1.0, 6.0])
        x = jnp.array([[0.5, 0.25, 5.5], [-1.0, 0.9, 6.0]])
        y = m.scale_transform(x, lo, hi)
        assert np.allclose(m.unscale_transform(y, lo, hi), x, atol=1e-6)

    def test_scale_bounds(self):
        lo, hi = jnp.array([-1.0]), jnp.array([3.0])
        assert np.allclose(m.scale_transform(lo, lo, hi), -1.0)
        assert np.allclose(m.scale_transform(hi, lo, hi), 1.0)

    def test_saturate(self):
        x = jnp.array([-5.0, 0.5, 5.0])
        out = m.saturate(x, jnp.array(-1.0), jnp.array(1.0))
        assert np.allclose(out, [-1.0, 0.5, 1.0])


class TestQuaternions:
    def test_quat_mul_matches_scipy(self):
        a, b = rand_quats(32, 1), rand_quats(32, 2)
        ours = np.asarray(m.quat_mul(jnp.asarray(a), jnp.asarray(b)))
        scipy_q = (R.from_quat(a) * R.from_quat(b)).as_quat()
        # quaternions are double covers: compare up to sign
        sign = np.sign(np.sum(ours * scipy_q, axis=-1, keepdims=True))
        assert np.allclose(ours, sign * scipy_q, atol=1e-5)

    def test_quat_rotate_matches_scipy(self):
        q = rand_quats(16, 3)
        v = np.random.default_rng(4).normal(size=(16, 3))
        ours = np.asarray(m.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        assert np.allclose(ours, R.from_quat(q).apply(v), atol=1e-5)

    def test_quat_diff_rad(self):
        # rotation by angle t about any axis differs from identity by t
        for angle in (0.0, 0.3, 1.5, 3.0):
            q = R.from_rotvec([0, 0, angle]).as_quat()
            eye = np.array([0.0, 0.0, 0.0, 1.0])
            d = float(m.quat_diff_rad(jnp.asarray(q), jnp.asarray(eye)))
            assert abs(d - angle) < 1e-5

    def test_quat_from_euler_xyz_matches_scipy(self):
        rng = np.random.default_rng(5)
        rpy = rng.uniform(-np.pi, np.pi, size=(16, 3))
        ours = np.asarray(
            m.quaternion_from_euler_xyz(
                jnp.asarray(rpy[:, 0]), jnp.asarray(rpy[:, 1]), jnp.asarray(rpy[:, 2])
            )
        )
        # reference convention: extrinsic xyz
        scipy_q = R.from_euler("xyz", rpy).as_quat()
        sign = np.sign(np.sum(ours * scipy_q, axis=-1, keepdims=True))
        assert np.allclose(ours, sign * scipy_q, atol=1e-5)

    def test_matrix_quat_roundtrip(self):
        q = rand_quats(64, 6)
        mats = np.asarray(m.quat_to_matrix(jnp.asarray(q)))
        assert np.allclose(mats, R.from_quat(q).as_matrix(), atol=1e-5)
        back = np.asarray(m.matrix_to_quat(jnp.asarray(mats)))
        sign = np.sign(np.sum(back * q, axis=-1, keepdims=True))
        assert np.allclose(back, sign * q, atol=1e-4)

    def test_quat_integrate_small_step(self):
        q0 = jnp.array([0.0, 0.0, 0.0, 1.0])
        omega = jnp.array([0.0, 0.0, 2.0])
        q = q0
        for _ in range(100):
            q = m.quat_integrate(q, omega, 0.001)
        expected = R.from_rotvec([0, 0, 0.2]).as_quat()
        assert np.allclose(np.asarray(q), expected, atol=1e-3)


class TestLinalg:
    def test_solve_pd_3x3(self):
        rng = np.random.default_rng(7)
        a = rng.normal(size=(50, 3, 3))
        spd = a @ np.swapaxes(a, -1, -2) + 0.1 * np.eye(3)
        b = rng.normal(size=(50, 3))
        x = np.asarray(m.solve_pd_3x3(jnp.asarray(spd), jnp.asarray(b)))
        expected = np.linalg.solve(spd, b[..., None])[..., 0]
        assert np.allclose(x, expected, atol=1e-4)

    def test_skew(self):
        v = jnp.array([1.0, 2.0, 3.0])
        u = jnp.array([0.5, -1.0, 2.0])
        assert np.allclose(np.asarray(m.skew(v) @ u), np.cross(v, u), atol=1e-6)
