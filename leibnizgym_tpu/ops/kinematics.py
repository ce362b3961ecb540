"""Batched forward kinematics for one TriFinger finger chain.

Because the three fingers are kinematically independent and identical up to a
mount yaw (trifingerpro.urdf:461-475), all kinematics and dynamics are computed
in the *finger-local frame* (mount frame before yaw). Gravity is along -z and
therefore invariant under the yaw, so per-finger dynamics never needs the yaw;
only world-space quantities (contacts, observations) apply it.

All functions broadcast over arbitrary leading batch dims; a flat
(env * finger) batch axis is the intended layout on TPU — one big elementwise
pipeline on the VPU, no per-finger branching.

Replaces the kinematic side of IsaacGym's articulation engine (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.models import trifinger as tf_model

# static chain constants — plain numpy so importing this module never touches
# the accelerator backend (a wedged TPU tunnel must not make `import
# leibnizgym_tpu` itself crash; jnp converts these at trace time)
_O2 = np.asarray(tf_model.JOINT_OFFSETS[1], dtype=np.float32)
_O3 = np.asarray(tf_model.JOINT_OFFSETS[2], dtype=np.float32)
_TIP = np.asarray(tf_model.TIP_OFFSET, dtype=np.float32)
_MOUNT_Z = tf_model.MOUNT_HEIGHT


def rot_x(theta: jax.Array) -> jax.Array:
    """Rotation matrix about x, shape (..., 3, 3)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [o, z, z, z, c, -s, z, s, c], axis=-1
    ).reshape(theta.shape + (3, 3))


def rot_y(theta: jax.Array) -> jax.Array:
    """Rotation matrix about y, shape (..., 3, 3)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [c, z, s, z, o, z, -s, z, c], axis=-1
    ).reshape(theta.shape + (3, 3))


def rot_z(theta: jax.Array) -> jax.Array:
    """Rotation matrix about z, shape (..., 3, 3)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [c, -s, z, s, c, z, z, z, o], axis=-1
    ).reshape(theta.shape + (3, 3))


class FingerFK(NamedTuple):
    """Forward-kinematics products for one finger, finger-local frame.

    Shapes given for a (...,) batch of q triplets.
    """

    # link frame rotations (also the joint frames): upper, middle, lower
    link_rot: jax.Array  # (..., 3, 3, 3)
    # joint positions
    joint_pos: jax.Array  # (..., 3, 3)
    # joint axes in finger frame
    joint_axis: jax.Array  # (..., 3, 3)
    # tip frame position
    tip_pos: jax.Array  # (..., 3)
    # per-link COM positions (depends on link COM table -> use model defaults)
    link_com: jax.Array  # (..., 3, 3)


def finger_fk(q: jax.Array, link_coms: jax.Array | None = None) -> FingerFK:
    """FK of one 3-DoF finger; ``q`` shape (..., 3).

    ``link_coms`` optionally overrides the per-link COM table (3, 3) for DR.
    """
    if link_coms is None:
        link_coms = jnp.asarray(tf_model.LINK_COMS)

    r1 = rot_y(q[..., 0])
    p1 = jnp.zeros(q.shape[:-1] + (3,))
    p2 = jnp.einsum("...ij,j->...i", r1, _O2)
    r2 = r1 @ rot_x(q[..., 1])
    p3 = p2 + jnp.einsum("...ij,j->...i", r2, _O3)
    r3 = r2 @ rot_x(q[..., 2])
    tip = p3 + jnp.einsum("...ij,j->...i", r3, _TIP)

    ey = jnp.array([0.0, 1.0, 0.0])
    ex = jnp.array([1.0, 0.0, 0.0])
    a1 = jnp.broadcast_to(ey, p1.shape)
    a2 = jnp.einsum("...ij,j->...i", r1, ex)
    a3 = jnp.einsum("...ij,j->...i", r2, ex)

    com1 = jnp.einsum("...ij,j->...i", r1, link_coms[0])
    com2 = p2 + jnp.einsum("...ij,j->...i", r2, link_coms[1])
    com3 = p3 + jnp.einsum("...ij,j->...i", r3, link_coms[2])

    return FingerFK(
        link_rot=jnp.stack([r1, r2, r3], axis=-3),
        joint_pos=jnp.stack([p1, p2, p3], axis=-2),
        joint_axis=jnp.stack([a1, a2, a3], axis=-2),
        tip_pos=tip,
        link_com=jnp.stack([com1, com2, com3], axis=-2),
    )


def tip_jacobian(fk: FingerFK) -> jax.Array:
    """Linear Jacobian of the tip w.r.t. the 3 joint angles: (..., 3, 3).

    Column i is ``axis_i x (tip - joint_i)``.
    """
    rel = fk.tip_pos[..., None, :] - fk.joint_pos  # (..., 3joints, 3)
    cols = jnp.cross(fk.joint_axis, rel)  # (..., 3joints, 3)
    return jnp.swapaxes(cols, -1, -2)  # columns = joints


def tip_velocity(fk: FingerFK, qd: jax.Array) -> jax.Array:
    """Linear velocity of the tip; ``qd`` shape (..., 3)."""
    jac = tip_jacobian(fk)
    return jnp.einsum("...ij,...j->...i", jac, qd)


def tip_angular_velocity(fk: FingerFK, qd: jax.Array) -> jax.Array:
    """Angular velocity of the tip link: sum over joints of axis_j * qd_j."""
    return jnp.einsum("...jd,...j->...d", fk.joint_axis, qd)


# ---------------------------------------------------------------------------
# World-frame helpers (apply the mount transform)
# ---------------------------------------------------------------------------

_MOUNT_YAWS = np.asarray(tf_model.FINGER_MOUNT_YAWS, dtype=np.float32)
# (3, 3, 3) per-finger world rotation — numpy at module scope (see note on
# the chain constants above); trig in f64 then cast = correctly-rounded f32
MOUNT_ROTS = np.stack(
    [
        np.array(
            [
                [np.cos(y), -np.sin(y), 0.0],
                [np.sin(y), np.cos(y), 0.0],
                [0.0, 0.0, 1.0],
            ]
        )
        for y in np.asarray(tf_model.FINGER_MOUNT_YAWS, dtype=np.float64)
    ]
).astype(np.float32)
MOUNT_POS = np.array([0.0, 0.0, _MOUNT_Z], dtype=np.float32)


def finger_to_world(x_local: jax.Array, finger_rot: jax.Array) -> jax.Array:
    """Map finger-local points (..., 3) to world given the mount rotation."""
    return MOUNT_POS + jnp.einsum("...ij,...j->...i", finger_rot, x_local)


def all_tips_world(q9: jax.Array):
    """World tip positions and rotations for all 3 fingers.

    Args:
        q9: (..., 9) joint positions, finger-major layout.

    Returns:
        tip_pos_w (..., 3, 3), tip_rot_w (..., 3, 3, 3), fk (per-finger FK with
        a finger axis at -2/-3 positions).
    """
    q_f = q9.reshape(q9.shape[:-1] + (3, 3))  # (..., finger, joint)
    fk = finger_fk(q_f)  # batched over finger axis
    tip_w = MOUNT_POS + jnp.einsum("fij,...fj->...fi", MOUNT_ROTS, fk.tip_pos)
    tip_rot_w = jnp.einsum("fij,...fjk->...fik", MOUNT_ROTS, fk.link_rot[..., 2, :, :])
    return tip_w, tip_rot_w, fk
