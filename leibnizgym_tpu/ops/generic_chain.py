"""Generic-chain finger kinematics/dynamics for robot URDF variants.

The default engines bake trifingerpro's chain (axes y/x/x, shared mount
height) as trace-time constants — optimal for the RL environment, which,
like the reference TrifingerEnv, is trifingerpro-only. This module provides
the *variant* path: FK and robot-only physics for ANY
:class:`~leibnizgym_tpu.models.chain.ChainModel` (trifingeredu, trifinger,
single-finger edu/pro, ... — every robot URDF the reference ships,
SURVEY.md §2.2), with arbitrary per-joint origin rotations, rotation axes,
and per-finger mount transforms.

The heavy lifting reuses :mod:`leibnizgym_tpu.ops.dynamics` — its Jacobian
assembly, RNEA bias, and mass-matrix code are chain-agnostic given a
FingerFK; only the FK itself is generalized here (Rodrigues rotation about
the URDF axis instead of hand-specialized rot_y/rot_x chains).

Contacts are intentionally out of scope: the cube-manipulation task (and
its contact solver) is defined for the trifingerpro arena. This module's
job is to make every shipped robot model *simulable* — gravity, PD control,
joint limits — which the round-1 build could only parse.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from leibnizgym_tpu.models.chain import ChainModel
from leibnizgym_tpu.ops import dynamics
from leibnizgym_tpu.ops.kinematics import FingerFK


def _rodrigues(axis, theta: jax.Array) -> jax.Array:
    """Rotation matrix about a fixed unit ``axis`` (3,) by angle (...,)."""
    ax = jnp.asarray(axis)
    k = jnp.array(
        [
            [0.0, -ax[2], ax[1]],
            [ax[2], 0.0, -ax[0]],
            [-ax[1], ax[0], 0.0],
        ]
    )
    c = jnp.cos(theta)[..., None, None]
    s = jnp.sin(theta)[..., None, None]
    eye = jnp.eye(3)
    return eye + s * k + (1.0 - c) * (k @ k)


def finger_fk_chain(q: jax.Array, chain: ChainModel) -> FingerFK:
    """FK of one generic 3-DoF finger in the finger (mount) frame.

    ``q`` shape (..., 3). Returns the same FingerFK structure the
    trifingerpro-specialized :func:`ops.kinematics.finger_fk` produces, so
    every downstream consumer (Jacobians, dynamics) works unchanged.
    """
    batch = q.shape[:-1]
    r = jnp.broadcast_to(jnp.eye(3), batch + (3, 3))
    p = jnp.zeros(batch + (3,))
    joint_pos, joint_axis, link_rot, link_com = [], [], [], []
    for i in range(3):
        p = p + jnp.einsum("...ij,j->...i", r, jnp.asarray(chain.joint_xyz[i]))
        r = r @ jnp.asarray(chain.joint_rot[i])
        joint_pos.append(p)
        joint_axis.append(jnp.einsum("...ij,j->...i", r, jnp.asarray(chain.joint_axis[i])))
        r = r @ _rodrigues(chain.joint_axis[i], q[..., i])
        link_rot.append(r)
        link_com.append(
            p + jnp.einsum("...ij,j->...i", r, jnp.asarray(chain.link_coms[i]))
        )
    tip = p + jnp.einsum("...ij,j->...i", r, jnp.asarray(chain.tip_xyz))
    return FingerFK(
        link_rot=jnp.stack(link_rot, axis=-3),
        joint_pos=jnp.stack(joint_pos, axis=-2),
        joint_axis=jnp.stack(joint_axis, axis=-2),
        tip_pos=tip,
        link_com=jnp.stack(link_com, axis=-2),
    )


def tips_world_chain(q: jax.Array, chain: ChainModel) -> jax.Array:
    """World tip positions for all fingers; ``q`` (..., 3F) -> (..., F, 3)."""
    f = chain.num_fingers
    q_f = q.reshape(q.shape[:-1] + (f, 3))
    tips = []
    for i in range(f):
        fk = finger_fk_chain(q_f[..., i, :], chain)
        tips.append(
            jnp.asarray(chain.mount_pos[i])
            + jnp.einsum("ij,...j->...i", jnp.asarray(chain.mount_rot[i]), fk.tip_pos)
        )
    return jnp.stack(tips, axis=-2)


class ChainState(NamedTuple):
    """Robot-only physics state for a generic chain; env-batched."""

    q: jax.Array  # (N, 3F)
    qd: jax.Array  # (N, 3F)


def chain_default_state(chain: ChainModel, n: int,
                        q0: jax.Array | None = None) -> ChainState:
    f = chain.num_fingers
    if q0 is None:
        mid = 0.5 * (chain.joint_lower + chain.joint_upper)
        q0 = jnp.tile(jnp.asarray(mid), (f,))
    return ChainState(
        q=jnp.broadcast_to(q0, (n, 3 * f)),
        qd=jnp.zeros((n, 3 * f)),
    )


def chain_physics_step(
    state: ChainState,
    tau: jax.Array,
    chain: ChainModel,
    dt: float = 0.02,
    substeps: int = 4,
    joint_damping: float = 0.0,
    armature: float = 0.0,
) -> ChainState:
    """Robot-only semi-implicit step: forward dynamics + torque saturation +
    joint limits (hard clamp with velocity zeroing, PhysX-style).

    Gravity is rotated into each finger's mount frame, so non-yaw mounts are
    handled exactly. ``tau`` (N, 3F) is clamped to the URDF effort limit.
    """
    f = chain.num_fingers
    h = dt / substeps
    g_world = jnp.array([0.0, 0.0, -9.81])
    damping = jnp.full(3, joint_damping)
    arma = jnp.full(3, armature)
    effort = jnp.asarray(chain.effort_limit)
    vel_lim = jnp.asarray(chain.velocity_limit)
    lower, upper = jnp.asarray(chain.joint_lower), jnp.asarray(chain.joint_upper)

    def substep(carry, _):
        q, qd = carry  # (N, 3F)
        q_f = q.reshape(-1, f, 3)
        qd_f = qd.reshape(-1, f, 3)
        tau_f = jnp.clip(tau.reshape(-1, f, 3), -effort, effort)
        qdd = []
        for i in range(f):
            g_local = jnp.asarray(chain.mount_rot[i]).T @ g_world
            fk = finger_fk_chain(q_f[:, i], chain)
            qdd.append(
                jax.vmap(
                    lambda q3, qd3, t3, fk3: dynamics.forward_dynamics(
                        q3, qd3, t3, g_local,
                        link_masses=jnp.asarray(chain.link_masses),
                        joint_damping=damping,
                        armature=arma,
                        fk=fk3,
                        base_masses=jnp.asarray(chain.link_masses),
                        base_inertias=jnp.asarray(chain.link_inertias),
                    )
                )(q_f[:, i], qd_f[:, i], tau_f[:, i], fk)
            )
        qdd = jnp.stack(qdd, axis=1).reshape(q.shape)
        qd = qd + h * qdd
        qd = jnp.clip(qd, -jnp.tile(vel_lim, (f,)), jnp.tile(vel_lim, (f,)))
        q_new = q + h * qd
        # hard joint limits: clamp position, zero outward velocity
        lo, hi = jnp.tile(lower, (f,)), jnp.tile(upper, (f,))
        hit_lo, hit_hi = q_new < lo, q_new > hi
        q_new = jnp.clip(q_new, lo, hi)
        qd = jnp.where(hit_lo, jnp.maximum(qd, 0.0), qd)
        qd = jnp.where(hit_hi, jnp.minimum(qd, 0.0), qd)
        return (q_new, qd), None

    (q, qd), _ = jax.lax.scan(substep, (state.q, state.qd), None, length=substeps)
    return ChainState(q=q, qd=qd)
