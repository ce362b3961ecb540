"""JAX math utilities: normalization transforms and quaternion algebra.

TPU-native re-implementation of the reference's TorchScript tensor math
(see /root/reference/leibnizgym/utils/torch_utils.py:18-180). All functions are
pure, shape-polymorphic over leading batch dims, and safe under jit/vmap.

Quaternion convention matches the reference (and IsaacGym): (x, y, z, w),
real part last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Normalization / denormalization (reference: torch_utils.py:18-75)
# ---------------------------------------------------------------------------


def scale_transform(x: jax.Array, lower: jax.Array, upper: jax.Array) -> jax.Array:
    """Normalize ``x`` from ``[lower, upper]`` to ``[-1, 1]`` (broadcasts)."""
    offset = (lower + upper) * 0.5
    return 2.0 * (x - offset) / (upper - lower)


def unscale_transform(x: jax.Array, lower: jax.Array, upper: jax.Array) -> jax.Array:
    """Denormalize ``x`` from ``[-1, 1]`` to ``[lower, upper]`` (broadcasts)."""
    offset = (lower + upper) * 0.5
    return x * (upper - lower) * 0.5 + offset


def saturate(x: jax.Array, lower: jax.Array, upper: jax.Array) -> jax.Array:
    """Clamp ``x`` to ``[lower, upper]`` (broadcasts)."""
    return jnp.maximum(jnp.minimum(x, upper), lower)


# ---------------------------------------------------------------------------
# Quaternion algebra (reference: torch_utils.py:83-180); (x, y, z, w) layout
# ---------------------------------------------------------------------------


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of two (..., 4) quaternions in (x, y, z, w) layout."""
    x1, y1, z1, w1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x2, y2, z2, w2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return jnp.stack([x, y, z, w], axis=-1)


def quat_conjugate(a: jax.Array) -> jax.Array:
    """Conjugate of a (..., 4) quaternion."""
    return jnp.concatenate([-a[..., :3], a[..., 3:4]], axis=-1)


def quat_diff_rad(a: jax.Array, b: jax.Array) -> jax.Array:
    """Angular difference in radians between two (..., 4) quaternions.

    Matches the reference formula ``2 * asin(clamp(|vec(a * conj(b))|, max=1))``
    (torch_utils.py:131-150).
    """
    mul = quat_mul(a, quat_conjugate(b))
    vec_norm = jnp.linalg.norm(mul[..., 0:3], axis=-1)
    return 2.0 * jnp.arcsin(jnp.clip(vec_norm, max=1.0))


def quaternion_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Euler XYZ (radians) to quaternion (x, y, z, w). Reference: torch_utils.py:153-180."""
    cy = jnp.cos(yaw * 0.5)
    sy = jnp.sin(yaw * 0.5)
    cr = jnp.cos(roll * 0.5)
    sr = jnp.sin(roll * 0.5)
    cp = jnp.cos(pitch * 0.5)
    sp = jnp.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) ``v`` (..., 3) by quaternion(s) ``q`` (..., 4)."""
    qvec = q[..., 0:3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + qw * t + jnp.cross(qvec, t)


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) ``v`` by the inverse of quaternion(s) ``q``."""
    return quat_rotate(quat_conjugate(q), v)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize a quaternion to unit length."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion (..., 4) in (x, y, z, w) to rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_integrate(q: jax.Array, omega: jax.Array, dt: jax.Array | float) -> jax.Array:
    """Integrate quaternion by world-frame angular velocity over ``dt``.

    First-order: q' = normalize(q + 0.5 * dt * omega_quat * q). This is the
    standard rigid-body orientation update used by game-physics engines.
    """
    omega_quat = jnp.concatenate(
        [omega, jnp.zeros_like(omega[..., :1])], axis=-1
    )
    dq = 0.5 * quat_mul(omega_quat, q)
    return quat_normalize(q + dt * dq)


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) to quaternion (..., 4) in (x, y, z, w).

    Branch-free Shepperd-style selection via jnp.where — safe under jit/vmap.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    trace = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # four candidate solutions, one per dominant component
    qw0 = safe_sqrt(1.0 + trace) * 0.5
    s0 = 0.25 / qw0
    c0 = jnp.stack([(m21 - m12) * s0, (m02 - m20) * s0, (m10 - m01) * s0, qw0], -1)

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) * 0.5
    s1 = 0.25 / qx1
    c1 = jnp.stack([qx1, (m01 + m10) * s1, (m02 + m20) * s1, (m21 - m12) * s1], -1)

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) * 0.5
    s2 = 0.25 / qy2
    c2 = jnp.stack([(m01 + m10) * s2, qy2, (m12 + m21) * s2, (m02 - m20) * s2], -1)

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) * 0.5
    s3 = 0.25 / qz3
    c3 = jnp.stack([(m02 + m20) * s3, (m12 + m21) * s3, qz3, (m10 - m01) * s3], -1)

    cond0 = (trace > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, c0, jnp.where(cond1, c1, jnp.where(cond2, c2, c3)))
    return quat_normalize(q)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Quaternion from unit axis (..., 3) and angle (...,)."""
    half = angle * 0.5
    s = jnp.sin(half)[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([axis * s, w], axis=-1)


# ---------------------------------------------------------------------------
# Small linear algebra helpers used by the physics engine
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix of (..., 3) -> (..., 3, 3)."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def solve_pd_3x3(a: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``a @ x = b`` for symmetric positive-definite 3x3 ``a``.

    Closed-form Cholesky — avoids general LU on tiny matrices, which XLA/TPU
    would pad wastefully. Batched over leading dims.
    """
    a00 = a[..., 0, 0]
    a10 = a[..., 1, 0]
    a11 = a[..., 1, 1]
    a20 = a[..., 2, 0]
    a21 = a[..., 2, 1]
    a22 = a[..., 2, 2]
    l00 = jnp.sqrt(jnp.maximum(a00, 1e-12))
    l10 = a10 / l00
    l20 = a20 / l00
    l11 = jnp.sqrt(jnp.maximum(a11 - l10 * l10, 1e-12))
    l21 = (a21 - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l20 * l20 - l21 * l21, 1e-12))
    # forward substitution L y = b
    y0 = b[..., 0] / l00
    y1 = (b[..., 1] - l10 * y0) / l11
    y2 = (b[..., 2] - l20 * y0 - l21 * y1) / l22
    # back substitution L^T x = y
    x2 = y2 / l22
    x1 = (y1 - l21 * x2) / l11
    x0 = (y0 - l10 * x1 - l20 * x2) / l00
    return jnp.stack([x0, x1, x2], axis=-1)
