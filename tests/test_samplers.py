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


def test_scale_orientation_swing_endpoints():
    """frac=1 is the identity map; frac=0 leaves a pure-yaw quaternion."""
    q = np.asarray(s.random_orientation(jax.random.PRNGKey(7), 512))
    q1 = np.asarray(s.scale_orientation_swing(jnp.asarray(q), 1.0))
    # same rotation (quaternion sign may flip)
    dot = np.abs(np.sum(q * q1, axis=-1))
    assert np.allclose(dot, 1.0, atol=1e-5)
    q0 = np.asarray(s.scale_orientation_swing(jnp.asarray(q), 0.0))
    assert np.allclose(q0[:, 0], 0.0, atol=1e-5)  # x = 0: yaw only
    assert np.allclose(q0[:, 1], 0.0, atol=1e-5)
    assert np.allclose(np.linalg.norm(q0, axis=-1), 1.0, atol=1e-5)


def test_scale_orientation_swing_monotone_tilt():
    """The z-axis tilt angle grows monotonically with frac, and the yaw
    (twist) component is preserved for every frac."""
    from scipy.spatial.transform import Rotation as R

    q = np.asarray(s.random_orientation(jax.random.PRNGKey(8), 256))
    prev_tilt = np.zeros(256)
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        qf = np.asarray(s.scale_orientation_swing(jnp.asarray(q), frac))
        z_rot = R.from_quat(qf).apply([0, 0, 1.0])
        tilt = np.arccos(np.clip(z_rot[:, 2], -1, 1))
        assert np.all(tilt >= prev_tilt - 1e-4), f"tilt not monotone at {frac}"
        prev_tilt = tilt
    # frac=1 recovers the original tilt
    z_orig = R.from_quat(q).apply([0, 0, 1.0])
    assert np.allclose(prev_tilt, np.arccos(np.clip(z_orig[:, 2], -1, 1)), atol=1e-4)
