"""Generalized-coordinate dynamics of one 3-DoF finger chain.

Replaces PhysX articulated dynamics (SURVEY.md §2.3) for the fixed-base
TriFinger. The mass matrix is assembled from link Jacobians; Coriolis +
gravity bias comes from the Euler-Lagrange equations evaluated with JAX
autodiff — guaranteed consistent with M(q) and trivially verifiable against
finite differences. All functions are written unbatched (single finger) and
are vmapped over (env, finger) by the engine; XLA turns the tiny 3x3 algebra
into one fused elementwise pipeline across the flat batch.

Why not ABA/RNEA by hand: for a 3-DoF chain the closed-form Cholesky solve of
the 3x3 system (utils.math.solve_pd_3x3) is already optimal; hand-derived
recursions would only add transcription risk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.models import trifinger as tf_model
from leibnizgym_tpu.ops.kinematics import finger_fk
from leibnizgym_tpu.utils.math import solve_pd_3x3

# numpy so importing never touches the accelerator backend
_LOWER_MASK = np.array(
    [[1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [1.0, 1.0, 1.0]], dtype=np.float32
)  # mask[l, i] = joint i moves link l


def link_jacobians(fk) -> tuple[jax.Array, jax.Array]:
    """Linear & angular Jacobians of each link COM w.r.t. the 3 joints.

    Returns (jv, jw) of shape (3 links, 3, 3 joints): column i of link l is the
    velocity of COM l per unit qd_i (zero for i > l).
    """
    # rel[l, i] = com_l - p_i
    rel = fk.link_com[..., :, None, :] - fk.joint_pos[..., None, :, :]
    jv_cols = jnp.cross(fk.joint_axis[..., None, :, :], rel)  # (l, i, 3)
    jv_cols = jv_cols * _LOWER_MASK[..., None]
    jw_cols = jnp.broadcast_to(
        fk.joint_axis[..., None, :, :], jv_cols.shape
    ) * _LOWER_MASK[..., None]
    # -> (l, 3, i): columns indexed by joint
    return jnp.swapaxes(jv_cols, -1, -2), jnp.swapaxes(jw_cols, -1, -2)


def mass_matrix(
    q: jax.Array,
    link_masses: jax.Array | None = None,
    armature: jax.Array | None = None,
    fk=None,
    base_masses: jax.Array | None = None,
    base_inertias: jax.Array | None = None,
) -> jax.Array:
    """3x3 joint-space mass matrix of one finger; ``q`` shape (3,).

    ``link_masses`` (3,) scales masses AND inertias proportionally (DR knob:
    density-style randomization keeps the inertia/mass ratio fixed).

    ``fk``/``base_masses``/``base_inertias`` override the default
    trifingerpro chain (robot-variant support, ops/generic_chain.py): any
    FingerFK-shaped structure and matching link inertial tables work — the
    Jacobian assembly below is chain-agnostic.
    """
    if fk is None:
        fk = finger_fk(q)
    jv, jw = link_jacobians(fk)
    if base_masses is None:
        base_masses = jnp.asarray(tf_model.LINK_MASSES)
    if base_inertias is None:
        base_inertias = jnp.asarray(tf_model.LINK_INERTIAS)
    masses = base_masses if link_masses is None else link_masses
    scale = masses / base_masses
    inertias = base_inertias * scale[:, None, None]

    # world-frame link inertias: R I R^T
    r = fk.link_rot
    i_w = r @ inertias @ jnp.swapaxes(r, -1, -2)

    m = jnp.einsum("l,lki,lkj->ij", masses, jv, jv)
    m = m + jnp.einsum("lki,lkm,lmj->ij", jw, i_w, jw)
    if armature is not None:
        m = m + jnp.diag(armature)
    return m


def potential_energy(
    q: jax.Array, gravity: jax.Array, link_masses: jax.Array | None = None
) -> jax.Array:
    """Gravitational potential of one finger (finger-local frame; gravity is
    yaw-invariant so this is exact for every finger)."""
    fk = finger_fk(q)
    masses = jnp.asarray(tf_model.LINK_MASSES) if link_masses is None else link_masses
    return -jnp.einsum("l,li,i->", masses, fk.link_com, gravity)


def bias_forces_lagrangian(
    q: jax.Array,
    qd: jax.Array,
    gravity: jax.Array,
    link_masses: jax.Array | None = None,
    armature: jax.Array | None = None,
) -> jax.Array:
    """Autodiff (Euler-Lagrange) bias — the reference oracle for RNEA.

    b = (dM/dq . qd) qd - 1/2 d(qd^T M qd)/dq + dV/dq; forward dynamics is
    M qdd = tau - b. Exact but ~4x the FLOPs of RNEA; used in tests only.
    """

    def mq(qq):
        return mass_matrix(qq, link_masses, armature) @ qd

    dmqd = jax.jacfwd(mq)(q)  # (3, 3): d(M qd)_i / dq_j

    def kinetic(qq):
        return 0.5 * qd @ mass_matrix(qq, link_masses, armature) @ qd

    return (
        dmqd @ qd
        - jax.grad(kinetic)(q)
        + jax.grad(lambda qq: potential_energy(qq, gravity, link_masses))(q)
    )


def bias_forces(
    q: jax.Array,
    qd: jax.Array,
    gravity: jax.Array,
    link_masses: jax.Array | None = None,
    armature: jax.Array | None = None,
    fk=None,
    base_masses: jax.Array | None = None,
    base_inertias: jax.Array | None = None,
) -> jax.Array:
    """Coriolis/centrifugal + gravity bias via recursive Newton-Euler
    (qdd = 0, base acceleration = -gravity). Validated against the
    Lagrangian/autodiff formulation in tests; ~4x cheaper.

    ``armature`` is accepted for signature parity but does not enter the bias
    (it only adds to the mass-matrix diagonal). ``fk``/``base_masses``/
    ``base_inertias`` override the trifingerpro chain (variant support).
    """
    del armature
    if fk is None:
        fk = finger_fk(q)
    if base_masses is None:
        base_masses = jnp.asarray(tf_model.LINK_MASSES)
    if base_inertias is None:
        base_inertias = jnp.asarray(tf_model.LINK_INERTIAS)
    masses = base_masses if link_masses is None else link_masses
    scale = masses / base_masses
    inertias = base_inertias * scale[:, None, None]
    r = fk.link_rot
    i_w = r @ inertias @ jnp.swapaxes(r, -1, -2)

    axes = fk.joint_axis  # (3, 3)
    joints = fk.joint_pos  # (3, 3)
    coms = fk.link_com  # (3, 3)

    # forward pass: angular velocity/acceleration and linear acceleration of
    # each joint origin, then of each COM (all in the finger-local frame)
    omega_prev = jnp.zeros(3)
    alpha_prev = jnp.zeros(3)
    a_joint_prev = -gravity  # fictitious base acceleration injects gravity
    p_prev = jnp.zeros(3)
    omega, alpha, a_com = [], [], []
    for i in range(3):
        d = joints[i] - p_prev
        a_joint = (
            a_joint_prev
            + jnp.cross(alpha_prev, d)
            + jnp.cross(omega_prev, jnp.cross(omega_prev, d))
        )
        w = omega_prev + axes[i] * qd[i]
        al = alpha_prev + jnp.cross(omega_prev, axes[i] * qd[i])  # qdd = 0
        rc = coms[i] - joints[i]
        ac = a_joint + jnp.cross(al, rc) + jnp.cross(w, jnp.cross(w, rc))
        omega.append(w)
        alpha.append(al)
        a_com.append(ac)
        omega_prev, alpha_prev, a_joint_prev, p_prev = w, al, a_joint, joints[i]

    # backward pass: net link loads -> joint torques
    f_child = jnp.zeros(3)
    n_child = jnp.zeros(3)
    tau = [None, None, None]
    for i in reversed(range(3)):
        f_net = masses[i] * a_com[i]
        n_net = i_w[i] @ alpha[i] + jnp.cross(omega[i], i_w[i] @ omega[i])
        p_child = joints[i + 1] if i < 2 else joints[i]  # arm to child joint
        f_i = f_net + f_child
        n_i = (
            n_net
            + n_child
            + jnp.cross(coms[i] - joints[i], f_net)
            + (jnp.cross(p_child - joints[i], f_child) if i < 2 else jnp.zeros(3))
        )
        tau[i] = axes[i] @ n_i
        f_child, n_child = f_i, n_i
    return jnp.stack(tau)


def forward_dynamics(
    q: jax.Array,
    qd: jax.Array,
    tau: jax.Array,
    gravity: jax.Array,
    link_masses: jax.Array | None = None,
    joint_damping: jax.Array | None = None,
    armature: jax.Array | None = None,
    fk=None,
    base_masses: jax.Array | None = None,
    base_inertias: jax.Array | None = None,
) -> jax.Array:
    """Joint accelerations qdd of one finger under applied torque ``tau``."""
    m = mass_matrix(q, link_masses, armature, fk, base_masses, base_inertias)
    b = bias_forces(q, qd, gravity, link_masses, armature, fk,
                    base_masses, base_inertias)
    total = tau - b
    if joint_damping is not None:
        total = total - joint_damping * qd
    return solve_pd_3x3(m, total)
