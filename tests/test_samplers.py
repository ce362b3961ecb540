"""Distribution-level tests for the pose/goal samplers (reference sample.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.envs.trifinger import sample as s


def test_random_xy_in_disc_uniform():
    key = jax.random.PRNGKey(0)
    x, y = s.random_xy(key, 20000, 0.15)
    r = np.hypot(np.asarray(x), np.asarray(y))
    assert r.max() <= 0.15 + 1e-6
    # uniform in disc => r^2 uniform in [0, R^2]
    u = (r / 0.15) ** 2
    hist, _ = np.histogram(u, bins=10, range=(0, 1))
    assert hist.min() > 0.8 * 2000 and hist.max() < 1.2 * 2000


def test_random_z_range():
    z = np.asarray(s.random_z(jax.random.PRNGKey(1), 1000, 0.03, 0.1))
    assert z.min() >= 0.03 and z.max() <= 0.1


def test_default_orientation():
    q = np.asarray(s.default_orientation(5))
    assert np.allclose(q, np.tile([0, 0, 0, 1.0], (5, 1)))


def test_random_orientation_unit_and_isotropic():
    q = np.asarray(s.random_orientation(jax.random.PRNGKey(2), 5000))
    assert np.allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    # isotropy: mean of rotated z-axis should vanish
    from scipy.spatial.transform import Rotation as R

    v = R.from_quat(q).apply([0, 0, 1.0])
    assert np.all(np.abs(v.mean(0)) < 0.05)


def test_random_yaw_orientation():
    q = np.asarray(s.random_yaw_orientation(jax.random.PRNGKey(3), 1000))
    # pure yaw: x and y components zero
    assert np.allclose(q[:, 0], 0, atol=1e-6)
    assert np.allclose(q[:, 1], 0, atol=1e-6)
    assert np.allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


def test_random_angular_vel_stats():
    av = np.asarray(s.random_angular_vel(jax.random.PRNGKey(4), 20000, 0.5))
    mag = np.linalg.norm(av, axis=-1)
    # |N(0, 0.5)| has mean 0.5*sqrt(2/pi) ~ 0.399
    assert abs(mag.mean() - 0.5 * np.sqrt(2 / np.pi)) < 0.02
