"""Key-based random sampling strategies for poses and goals.

TPU-native re-design of the reference samplers
(/root/reference/leibnizgym/envs/trifinger/sample.py:22-84): torch's global RNG
streams become explicit ``jax.random`` keys so sampling is pure, reproducible,
and shardable. Distributions are identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from leibnizgym_tpu.utils.math import quaternion_from_euler_xyz


def random_xy(key: jax.Array, num: int, max_com_distance_to_center: float):
    """Uniform positions in a disc of the given radius (sqrt-radius trick)."""
    k_r, k_t = jax.random.split(key)
    radius = jnp.sqrt(jax.random.uniform(k_r, (num,))) * max_com_distance_to_center
    theta = 2.0 * jnp.pi * jax.random.uniform(k_t, (num,))
    return radius * jnp.cos(theta), radius * jnp.sin(theta)


def random_z(key: jax.Array, num: int, min_height: float, max_height: float) -> jax.Array:
    """Uniform heights in ``[min_height, max_height]``."""
    z = jax.random.uniform(key, (num,))
    return (max_height - min_height) * z + min_height


def default_orientation(num: int) -> jax.Array:
    """Identity quaternion(s), shape (num, 4), (x, y, z, w)."""
    quat = jnp.zeros((num, 4))
    return quat.at[..., 3].set(1.0)


def random_orientation(key: jax.Array, num: int) -> jax.Array:
    """Uniformly random unit quaternions via normalized Gaussians."""
    quat = jax.random.normal(key, (num, 4))
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    return quat / jnp.maximum(norm, 1e-12)


def random_angular_vel(key: jax.Array, num: int, magnitude_stdev: float) -> jax.Array:
    """Random angular velocity: random unit axis x N(0, stdev) magnitude."""
    k_axis, k_mag = jax.random.split(key)
    axis = jax.random.normal(k_axis, (num, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    magnitude = jax.random.normal(k_mag, (num, 1)) * magnitude_stdev
    return magnitude * axis


def random_yaw_orientation(key: jax.Array, num: int) -> jax.Array:
    """Random rotation about the z-axis only."""
    zeros = jnp.zeros(num)
    yaw = 2.0 * jnp.pi * jax.random.uniform(key, (num,))
    return quaternion_from_euler_xyz(zeros, zeros, yaw)


# ---------------------------------------------------------------------------
# From-bits variants: identical distributions driven by pre-drawn uniform /
# normal columns. The env step draws ONE uniform block and ONE normal block
# per step and slices them here — a single pair of threefry invocations
# instead of ~18 (counting key splits), which measurably matters when the
# whole env step is ~100 us on a TPU chip.
# ---------------------------------------------------------------------------


def random_xy_from_uniform(u2: jax.Array, max_com_distance_to_center):
    """u2: (num, 2) uniforms -> uniform positions in the disc."""
    radius = jnp.sqrt(u2[:, 0]) * max_com_distance_to_center
    theta = 2.0 * jnp.pi * u2[:, 1]
    return radius * jnp.cos(theta), radius * jnp.sin(theta)


def random_z_from_uniform(u1: jax.Array, min_height, max_height) -> jax.Array:
    return (max_height - min_height) * u1 + min_height


def random_yaw_orientation_from_uniform(u1: jax.Array) -> jax.Array:
    zeros = jnp.zeros_like(u1)
    return quaternion_from_euler_xyz(zeros, zeros, 2.0 * jnp.pi * u1)


def random_orientation_from_normal(n4: jax.Array) -> jax.Array:
    norm = jnp.linalg.norm(n4, axis=-1, keepdims=True)
    return n4 / jnp.maximum(norm, 1e-12)


def random_angular_vel_from_normal(n4: jax.Array, magnitude_stdev) -> jax.Array:
    axis = n4[:, 0:3]
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    return axis * (n4[:, 3:4] * magnitude_stdev)


def scale_orientation_swing(quat: jax.Array, frac) -> jax.Array:
    """Orientation-difficulty curriculum: shrink the out-of-plane (swing)
    component of ``quat`` by ``frac`` in [0, 1], keeping the yaw (twist about
    z) component intact.

    Swing-twist decomposition: q = q_swing * q_twist with
    q_twist = normalize([0, 0, q.z, q.w]) (xyzw layout). The swing rotation's
    angle is scaled by ``frac`` (slerp from identity). frac=0 -> random-yaw
    goals (cube can be pivoted on the table, the "easy" orientation task of
    reference difficulty -1); frac=1 -> the fully random orientations of
    reference difficulty 4/5 (trifinger_env.py:1194-1265). Extension beyond
    the reference, used by the trifinger_difficulty_4_curriculum preset."""
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    tw_norm = jnp.sqrt(z * z + w * w)
    # degenerate twist (rotation by pi about an axis in the xy-plane):
    # fall back to identity twist
    safe = tw_norm > 1e-6
    tz = jnp.where(safe, z / jnp.maximum(tw_norm, 1e-6), 0.0)
    tw = jnp.where(safe, w / jnp.maximum(tw_norm, 1e-6), 1.0)
    # q_swing = q * conj(q_twist); conj twist = (0, 0, -tz, tw)
    sx = x * tw - y * tz
    sy = y * tw + x * tz
    sz = z * tw - w * tz
    sw = w * tw + z * tz
    # scale the swing angle: theta' = frac * theta about the same axis
    s_vec_norm = jnp.sqrt(sx * sx + sy * sy + sz * sz)
    half = jnp.arctan2(s_vec_norm, sw)  # in [0, pi)
    new_half = frac * half
    scale = jnp.where(
        s_vec_norm > 1e-6, jnp.sin(new_half) / jnp.maximum(s_vec_norm, 1e-6), 0.0
    )
    nsx, nsy, nsz, nsw = sx * scale, sy * scale, sz * scale, jnp.cos(new_half)
    # recompose: q' = q_swing' * q_twist
    ox = nsx * tw + nsy * tz
    oy = nsy * tw - nsx * tz
    oz = nsz * tw + nsw * tz
    ow = nsw * tw - nsz * tz
    out = jnp.stack([ox, oy, oz, ow], axis=-1)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
