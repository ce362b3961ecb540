"""The batched TriFinger physics engine: one pure substepped step function.

Replaces `gym.simulate` (reference env_base.py:383-384) and everything behind
it (PhysX articulation + rigid-body + contact pipeline, SURVEY.md §2.3).

Design notes (TPU-first):
- `physics_step` is written for ONE environment and `vmap`-ed over the env
  axis by callers; under jit the whole thing lowers to one fused elementwise
  pipeline over the env batch (the VPU lanes) — tiny 3x3 algebra never forms
  real matrices in HBM.
- Substeps and solver iterations are `lax.fori_loop`s with static trip counts;
  the 22-slot contact sweep is unrolled inside the body (fixed topology, no
  data-dependent control flow anywhere).
- Torque is held constant across substeps, exactly like the reference where
  `set_dof_actuation_force_tensor` happens once per env step
  (trifinger_env.py:496) before `gym.simulate` substeps internally.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.models import trifinger as tf_model
from leibnizgym_tpu.ops import dynamics
from leibnizgym_tpu.ops.contact import (
    _CORNER_SIGNS,
    _tangent_basis,
    closest_point_on_box,
    contact_target,
    cube_body,
    restitution_target,
    solve_contact_friction,
    solve_contact_normal,
)
from leibnizgym_tpu.ops.kinematics import (
    MOUNT_POS,
    MOUNT_ROTS,
    finger_fk,
    tip_jacobian,
)
from leibnizgym_tpu.ops.types import PhysicsState, SceneParams, SolverConfig
from leibnizgym_tpu.utils.math import quat_integrate, solve_pd_3x3

# numpy so importing never touches the accelerator backend
_TIP_LOCAL_OFFSET = np.asarray(tf_model.TIP_SPHERE_OFFSET, dtype=np.float32)
_MAX_CUBE_ANGVEL = 64.0  # PhysX AssetOptions default max_angular_velocity


class _FingerPre(NamedTuple):
    """Per-finger quantities precomputed once per substep (finger axis 3)."""

    tip_pos_w: jax.Array  # (3, 3)
    jac_w: jax.Array  # (3, 3, 3) world-frame linear tip jacobian
    minv_jt: jax.Array  # (3, 3, 3) M^-1 J_w^T  (impulse -> delta qd map)
    a_tip: jax.Array  # (3, 3, 3) J M^-1 J^T  (tip-point inverse mass)
    # lower-link shaft sample points (S = len(LOWER_LINK_SAMPLES) per finger)
    samp_pos_w: jax.Array  # (3, S, 3)
    samp_jac_w: jax.Array  # (3, S, 3, 3)
    samp_minv_jt: jax.Array  # (3, S, 3, 3)
    samp_a: jax.Array  # (3, S, 3, 3)


def _finger_precompute(q_f: jax.Array, params: SceneParams,
                       with_samples: bool = True) -> _FingerPre:
    """q_f: (3 fingers, 3 joints). ``with_samples=False`` (the link-cube
    contact group trace-time gated off) skips the lower-link sample
    jacobians entirely and returns zero-length sample arrays."""

    def per_finger(q3, mount_rot):
        fk = finger_fk(q3)
        m = dynamics.mass_matrix(q3, params.link_masses, params.armature)
        jac_local = tip_jacobian(fk)
        jac_w = mount_rot @ jac_local
        # columns of M^-1 J^T: solve M x = row_i(J)  (J^T columns are J rows)
        minv_jt = jax.vmap(lambda col: solve_pd_3x3(m, col))(jac_w).T
        # note: vmap over the 3 world axes -> rows of J_w; stack -> (3,3);
        # transpose gives M^-1 J_w^T with impulse index last
        a_tip = jac_w @ minv_jt
        tip_w = MOUNT_POS + mount_rot @ fk.tip_pos

        if not with_samples:
            empty = jnp.zeros((0, 3)), jnp.zeros((0, 3, 3))
            return (tip_w, jac_w, minv_jt, a_tip, empty[0], empty[1],
                    jnp.zeros((0, 3, 3)), jnp.zeros((0, 3, 3)))

        # lower-link shaft sample points: sphere centers along the knee->tip
        # segment (replaces the reference's forearm V-HACD collision meshes,
        # trifinger_env.py:874-937)
        knee = fk.joint_pos[2]
        sp_w, sj_w, sm, sa = [], [], [], []
        for frac, _radius in tf_model.LOWER_LINK_SAMPLES:
            p_local = knee + frac * (fk.tip_pos - knee)
            rel = p_local[None, :] - fk.joint_pos  # (3 joints, 3)
            cols = jnp.cross(fk.joint_axis, rel)  # rows = joints
            j_w = mount_rot @ cols.T  # point jacobian, columns = joints
            m_jt = jax.vmap(lambda col: solve_pd_3x3(m, col))(j_w).T
            sp_w.append(MOUNT_POS + mount_rot @ p_local)
            sj_w.append(j_w)
            sm.append(m_jt)
            sa.append(j_w @ m_jt)
        return (tip_w, jac_w, minv_jt, a_tip, jnp.stack(sp_w), jnp.stack(sj_w),
                jnp.stack(sm), jnp.stack(sa))

    out = jax.vmap(per_finger)(q_f, MOUNT_ROTS)
    return _FingerPre(*out)


def _free_velocities(
    state: PhysicsState, tau: jax.Array, params: SceneParams, h: float
):
    """Integrate external+actuation forces over one substep (no contacts)."""
    q_f = state.q.reshape(3, 3)
    qd_f = state.qd.reshape(3, 3)
    tau_f = tau.reshape(3, 3)

    qdd_f = jax.vmap(
        lambda q3, qd3, t3: dynamics.forward_dynamics(
            q3, qd3, t3, params.gravity,
            params.link_masses, params.joint_damping, params.armature,
        )
    )(q_f, qd_f, tau_f)
    qd_f = qd_f + h * qdd_f

    # cube: gravity + PhysX-style damping
    v = state.cube_linvel * jnp.maximum(0.0, 1.0 - params.cube_linear_damping * h)
    w = state.cube_angvel * jnp.maximum(0.0, 1.0 - params.cube_angular_damping * h)
    v = v + h * params.gravity
    return qd_f, v, w


def _substep(state: PhysicsState, tau: jax.Array, params: SceneParams,
             cfg: SolverConfig, h: float) -> PhysicsState:
    # ---- unconstrained velocity update -----------------------------------
    qd_f, v, w = _free_velocities(state, tau, params, h)
    q_f = state.q.reshape(3, 3)

    # ---- per-substep precomputation --------------------------------------
    pre = _finger_precompute(q_f, params, with_samples=cfg.enable_link_cube)
    body = cube_body(state.cube_pos, state.cube_quat,
                     params.cube_mass, params.cube_inertia)
    half = params.cube_half_extents
    # The tiny (0,0,1.3mm) tip-sphere center offset is applied in the world
    # frame: it is z-aligned in the tip frame and the tip stays near-vertical
    # in the robot's workspace, so this avoids carrying tip rotations through
    # the contact path.
    tip_centers = pre.tip_pos_w + _TIP_LOCAL_OFFSET

    # object shape is static (cfg.object_shape): box = 8 corner points vs
    # ground/wall; sphere (ball.urdf) = ONE lowest point vs ground and ONE
    # outermost radial point vs wall, and probe queries are sphere-sphere
    sphere_obj = cfg.object_shape == 1
    radius_o = half[0]  # sphere radius (half_extents broadcast to (r, r, r))
    ground_n = jnp.array([0.0, 0.0, 1.0])

    def wall_gap(pts):
        """Perpendicular gap (k,) from points (k, 3) to the arena wall
        (positive inside) + inward normals (k, 3). Piecewise cylinder+cone
        profile (SceneParams.wall_slope/wall_knee_z; slope 0 = the plain
        cylinder). Mirrors engine_v2._wall_gap_s."""
        rho = jnp.maximum(jnp.linalg.norm(pts[:, 0:2], axis=-1), 1e-9)
        z_over = jnp.maximum(pts[:, 2] - params.wall_knee_z, 0.0)
        s = jnp.where(z_over > 0.0, params.wall_slope, 0.0)
        inv_len = 1.0 / jnp.sqrt(1.0 + s * s)
        r_eff = params.wall_radius + params.wall_slope * z_over
        gap = (r_eff - rho) * inv_len
        n = jnp.concatenate(
            [-pts[:, 0:2] / rho[:, None] * inv_len[:, None],
             (s * inv_len)[:, None]], axis=-1,
        )
        return gap, n

    if sphere_obj:
        a_pts = (state.cube_pos - ground_n * radius_o)[None]  # (1, 3)
        if cfg.enable_cube_wall:
            # Contact point ALONG the contact normal (center - n*radius) so
            # the normal impulse passes through the sphere center (r x n = 0):
            # with the cone profile the normal tilts above the knee, and a
            # horizontally-offset point would give a pure normal impulse a
            # spurious lever arm that spins a frictionless sphere. Below the
            # knee n is horizontal, so this reduces to the old
            # center + outward*radius point exactly.
            gap_c, b_n = wall_gap(state.cube_pos[None])
            b_pts = (state.cube_pos - b_n[0] * radius_o)[None]
            b_depth = radius_o - gap_c
    else:
        corners_w = state.cube_pos + jnp.einsum(
            "ij,cj->ci", body.rot, _CORNER_SIGNS * half
        )  # (8, 3)
        a_pts = corners_w
        if cfg.enable_cube_wall:
            b_pts = corners_w
            gap_b, b_n = wall_gap(corners_w)
            b_depth = -gap_b
    _P = a_pts.shape[0]  # object contact points per group (static)
    if not cfg.enable_cube_wall:
        b_pts = jnp.zeros((0, 3))
        b_depth = jnp.zeros(0)
        b_n = jnp.zeros((0, 3))
    _PB = b_pts.shape[0]  # wall contact points (0 when gated off)

    # ---- contact slot construction ---------------------------------------
    # group A: object points vs ground
    a_depth = -a_pts[:, 2]
    a_r = a_pts - state.cube_pos

    # group B: object points vs arena wall; inward radial normal
    b_r = b_pts - state.cube_pos

    # probe sphere (tip / link sample) vs object surface
    def obj_surface(center):
        """(n_w, sdist, point): signed distance of the probe center to the
        object surface; +n pushes the object away from the probe."""
        if sphere_obj:
            delta = center - state.cube_pos
            d2 = delta @ delta
            dist = jnp.sqrt(jnp.maximum(d2, 1e-18))
            # degenerate probe-at-center: fixed +z direction (finite, unit)
            dir_out = jnp.where(
                d2 > 1e-16, delta / dist, jnp.array([0.0, 0.0, 1.0])
            )
            sdist = dist - radius_o
            point = state.cube_pos + radius_o * dir_out
            return -dir_out, sdist, point
        local = body.rot.T @ (center - state.cube_pos)
        n_local, sdist, surf_local = closest_point_on_box(local, half)
        n_w = -(body.rot @ n_local)
        point = state.cube_pos + body.rot @ surf_local
        return n_w, sdist, point

    # group C: tip spheres vs object (3)
    def tip_cube(center):
        n_w, sdist, point = obj_surface(center)
        depth = params.tip_radius - sdist
        return n_w, depth, point

    c_n, c_depth, c_point = jax.vmap(tip_cube)(tip_centers)
    c_r = c_point - state.cube_pos

    # trace-time gated finger-side group counts (0 = group not built)
    _ND = 3 if cfg.enable_tip_ground else 0
    _NE = 3 if cfg.enable_tip_wall else 0

    # group D: tip spheres vs ground (3)
    d_depth = (params.tip_radius - tip_centers[:, 2])[:_ND]

    # group E: tip spheres vs arena wall (3); inward radial normal, acts on
    # the finger only (reference stage collision, trifinger_env.py:874-937)
    e_gap, e_n = wall_gap(tip_centers[:_NE])
    e_depth = params.tip_radius - e_gap

    # group F: lower-link shaft samples vs object (3 fingers x S samples)
    def link_cube(center, radius):
        n_w, sdist, point = obj_surface(center)
        depth = radius - sdist
        return n_w, depth, point

    _S = len(tf_model.LOWER_LINK_SAMPLES) if cfg.enable_link_cube else 0
    _SAMP_RADII = [r for _, r in tf_model.LOWER_LINK_SAMPLES]
    f_n = [[None] * _S for _ in range(3)]
    f_depth = [[None] * _S for _ in range(3)]
    f_point = [[None] * _S for _ in range(3)]
    for f in range(3):
        for s in range(_S):
            f_n[f][s], f_depth[f][s], f_point[f][s] = link_cube(
                pre.samp_pos_w[f, s], _SAMP_RADII[s]
            )

    # ---- effective masses, tangents, restitution targets -----------------
    def k_cube_dir(r, d):
        rxd = jnp.cross(r, d)
        return body.inv_mass + rxd @ body.inv_inertia_w @ rxd

    def cube_point_vel(v_, w_, r):
        return v_ + jnp.cross(w_, r)

    def tip_vel(qd_f_, f):
        return pre.jac_w[f] @ qd_f_[f]

    # pre-solve normal velocities for restitution
    a_t1, a_t2 = _tangent_basis(ground_n)
    b_t = jax.vmap(_tangent_basis)(b_n)
    c_t = jax.vmap(_tangent_basis)(c_n)
    e_t = jax.vmap(_tangent_basis)(e_n)
    f_t = [[_tangent_basis(f_n[f][s]) for s in range(_S)] for f in range(3)]
    f_r = [[f_point[f][s] - state.cube_pos for s in range(_S)] for f in range(3)]

    def samp_vel(qd_f_, f, s):
        return pre.samp_jac_w[f, s] @ qd_f_[f]

    def _stack0(xs):
        """jnp.stack that returns a zero-length array for a gated-off group."""
        return jnp.stack(xs) if xs else jnp.zeros(0)

    a_vn0 = jax.vmap(lambda r: cube_point_vel(v, w, r) @ ground_n)(a_r)
    b_vn0 = jax.vmap(lambda r, n: cube_point_vel(v, w, r) @ n)(b_r, b_n)
    c_vn0 = jnp.stack([
        (cube_point_vel(v, w, c_r[f]) - tip_vel(qd_f, f)) @ c_n[f] for f in range(3)
    ])
    d_vn0 = _stack0([tip_vel(qd_f, f)[2] for f in range(_ND)])
    e_vn0 = _stack0([tip_vel(qd_f, f) @ e_n[f] for f in range(_NE)])
    f_vn0 = [
        [
            (cube_point_vel(v, w, f_r[f][s]) - samp_vel(qd_f, f, s)) @ f_n[f][s]
            for s in range(_S)
        ]
        for f in range(3)
    ]

    a_target = jax.vmap(
        lambda depth, vn0: contact_target(
            depth, vn0, params.restitution_cube_ground, params.bounce_threshold, h, cfg
        )
    )(a_depth, a_vn0)
    b_target = jax.vmap(
        lambda depth, vn0: contact_target(
            depth, vn0, jnp.asarray(0.0), params.bounce_threshold, h, cfg
        )
    )(b_depth, b_vn0)
    c_target = jax.vmap(
        lambda depth, vn0: contact_target(
            depth, vn0, params.restitution_tip_cube, params.bounce_threshold, h, cfg
        )
    )(c_depth, c_vn0)
    d_target = jax.vmap(
        lambda depth, vn0: contact_target(
            depth, vn0, params.restitution_tip_ground, params.bounce_threshold,
            h, cfg, bias_cap=cfg.finger_bias_cap,
        )
    )(d_depth, d_vn0)
    e_target = jax.vmap(
        lambda depth, vn0: contact_target(
            depth, vn0, params.restitution_tip_wall, params.bounce_threshold,
            h, cfg, bias_cap=cfg.finger_bias_cap,
        )
    )(e_depth, e_vn0)
    f_target = [
        [
            contact_target(
                f_depth[f][s], f_vn0[f][s], params.restitution_link_cube,
                params.bounce_threshold, h, cfg,
            )
            for s in range(_S)
        ]
        for f in range(3)
    ]

    a_wn = jax.vmap(lambda r: k_cube_dir(r, ground_n))(a_r)
    a_wt1 = jax.vmap(lambda r: k_cube_dir(r, a_t1))(a_r)
    a_wt2 = jax.vmap(lambda r: k_cube_dir(r, a_t2))(a_r)
    b_wn = jax.vmap(k_cube_dir)(b_r, b_n)
    b_wt1 = jax.vmap(k_cube_dir)(b_r, b_t[0])
    b_wt2 = jax.vmap(k_cube_dir)(b_r, b_t[1])
    c_wn = jnp.stack([
        k_cube_dir(c_r[f], c_n[f]) + c_n[f] @ pre.a_tip[f] @ c_n[f] for f in range(3)
    ])
    c_wt1 = jnp.stack([
        k_cube_dir(c_r[f], c_t[0][f]) + c_t[0][f] @ pre.a_tip[f] @ c_t[0][f]
        for f in range(3)
    ])
    c_wt2 = jnp.stack([
        k_cube_dir(c_r[f], c_t[1][f]) + c_t[1][f] @ pre.a_tip[f] @ c_t[1][f]
        for f in range(3)
    ])
    # groups D and E act on the finger alone, so their effective inverse mass
    # J M^-1 J^T can hit the kinematic singularity (fully extended finger at
    # the arena wall: ~1e-9..0) and explode the PGS impulse — floor at
    # cfg.w_min (max(w, w_min) keeps non-singular dynamics bit-identical)
    d_wn = _stack0([jnp.maximum(pre.a_tip[f][2, 2], cfg.w_min) for f in range(_ND)])
    d_wt1 = _stack0([jnp.maximum(pre.a_tip[f][0, 0], cfg.w_min) for f in range(_ND)])
    d_wt2 = _stack0([jnp.maximum(pre.a_tip[f][1, 1], cfg.w_min) for f in range(_ND)])
    e_wn = _stack0([
        jnp.maximum(e_n[f] @ pre.a_tip[f] @ e_n[f], cfg.w_min) for f in range(_NE)
    ])
    e_wt1 = _stack0([
        jnp.maximum(e_t[0][f] @ pre.a_tip[f] @ e_t[0][f], cfg.w_min) for f in range(_NE)
    ])
    e_wt2 = _stack0([
        jnp.maximum(e_t[1][f] @ pre.a_tip[f] @ e_t[1][f], cfg.w_min) for f in range(_NE)
    ])

    def f_w(f, s, d):
        return k_cube_dir(f_r[f][s], d) + d @ pre.samp_a[f, s] @ d

    f_wn = [[f_w(f, s, f_n[f][s]) for s in range(_S)] for f in range(3)]
    f_wt1 = [[f_w(f, s, f_t[f][s][0]) for s in range(_S)] for f in range(3)]
    f_wt2 = [[f_w(f, s, f_t[f][s][1]) for s in range(_S)] for f in range(3)]

    # torsional friction about the contact normal at cube contacts (cube-side
    # angular resistance only; the PhysX patch model torque bound is
    # mu_torsion * patch_radius * lambda_n)
    # floored like engine_v2.k_spin: a degenerate zero normal must yield a
    # zero torsion impulse (0/eps), never 0/0 = NaN
    def k_spin(n):
        return jnp.maximum(n @ body.inv_inertia_w @ n, 1e-6)

    torsion = cfg.enable_torsion
    a_ws = k_spin(ground_n) if torsion else None
    b_ws = jax.vmap(k_spin)(b_n) if torsion else None
    c_ws = jnp.stack([k_spin(c_n[f]) for f in range(3)]) if torsion else None
    mu_tor_r = params.mu_torsion * params.torsion_patch_radius

    # ---- TGS mode (solver_type 1): per-iteration mini-steps ---------------
    # Each solver iteration integrates contact depths with the evolving
    # normal velocities (d -= u_n * h_it) and recomputes the positional bias
    # from the live depth, correcting penetration geometrically. The
    # restitution part of the target stays fixed at the substep-start impact
    # velocity. solver_type 0 keeps the classic precomputed targets.
    tgs = cfg.solver_type == 1
    h_it = h / cfg.solver_iterations
    if tgs:
        def rest_of(depth, vn0, e):
            return restitution_target(
                depth, vn0, e, params.bounce_threshold, h
            )

        a_rest = jax.vmap(lambda d, u: rest_of(d, u, params.restitution_cube_ground))(a_depth, a_vn0)
        b_rest = jax.vmap(lambda d, u: rest_of(d, u, jnp.asarray(0.0)))(b_depth, b_vn0)
        c_rest = jax.vmap(lambda d, u: rest_of(d, u, params.restitution_tip_cube))(c_depth, c_vn0)
        d_rest = jax.vmap(lambda d, u: rest_of(d, u, params.restitution_tip_ground))(d_depth, d_vn0)
        e_rest = jax.vmap(lambda d, u: rest_of(d, u, params.restitution_tip_wall))(e_depth, e_vn0)
        f_rest = (jnp.stack([
            jnp.stack([
                rest_of(f_depth[f][s], f_vn0[f][s], params.restitution_link_cube)
                for s in range(_S)
            ])
            for f in range(3)
        ]) if _S else jnp.zeros((3, 0)))

    def tgs_target(d, rest, it, bias_cap=None):
        pen = cfg.tgs_bias / h_it * jnp.maximum(d - cfg.contact_slop, 0.0)
        if bias_cap is not None:
            pen = jnp.minimum(pen, bias_cap)
        h_rem = h - it * h_it  # speculative approach budget = remaining time
        bias = jnp.where(d > 0.0, pen, d / h_rem)
        return jnp.maximum(bias, rest)

    # ---- projected Gauss-Seidel sweeps -----------------------------------
    def sweep(it, carry):
        if tgs:
            v, w, qd_f, lam, dep, poses = carry
            a_d, b_d, c_d, d_d, e_d, f_d = dep
        else:
            v, w, qd_f, lam = carry
        (a_ln, a_l1, a_l2, a_lt, b_ln, b_l1, b_l2, b_lt,
         c_ln, c_l1, c_l2, c_lt, d_ln, d_l1, d_l2,
         e_ln, e_l1, e_l2, f_ln, f_l1, f_l2) = lam

        # -- A: cube corners vs ground
        for i in range(_P):
            r = a_r[i]
            u = v + jnp.cross(w, r)
            tgt = tgs_target(a_d[i], a_rest[i], it) if tgs else a_target[i]
            d_lam, nl = solve_contact_normal(u @ ground_n, tgt, a_wn[i], a_ln[i])
            a_ln = a_ln.at[i].set(nl)
            p = d_lam * ground_n
            v = v + body.inv_mass * p
            w = w + body.inv_inertia_w @ jnp.cross(r, p)
            mu_l = params.mu_cube_ground * nl
            u = v + jnp.cross(w, r)
            if tgs:
                a_d = a_d.at[i].add(-(u @ ground_n) * h_it)
            d_lam, t1l = solve_contact_friction(u @ a_t1, a_wt1[i], a_l1[i], mu_l)
            a_l1 = a_l1.at[i].set(t1l)
            p = d_lam * a_t1
            v = v + body.inv_mass * p
            w = w + body.inv_inertia_w @ jnp.cross(r, p)
            u = v + jnp.cross(w, r)
            d_lam, t2l = solve_contact_friction(u @ a_t2, a_wt2[i], a_l2[i], mu_l)
            a_l2 = a_l2.at[i].set(t2l)
            p = d_lam * a_t2
            v = v + body.inv_mass * p
            w = w + body.inv_inertia_w @ jnp.cross(r, p)
            # torsional friction about the normal
            if torsion:
                d_lam, sl = solve_contact_friction(
                    w @ ground_n, a_ws, a_lt[i], mu_tor_r * nl
                )
                a_lt = a_lt.at[i].set(sl)
                w = w + body.inv_inertia_w @ (d_lam * ground_n)

        # -- B: cube corners vs wall
        for i in range(_PB):
            r, n = b_r[i], b_n[i]
            u = v + jnp.cross(w, r)
            tgt = tgs_target(b_d[i], b_rest[i], it) if tgs else b_target[i]
            d_lam, nl = solve_contact_normal(u @ n, tgt, b_wn[i], b_ln[i])
            b_ln = b_ln.at[i].set(nl)
            p = d_lam * n
            v = v + body.inv_mass * p
            w = w + body.inv_inertia_w @ jnp.cross(r, p)
            if tgs:
                u = v + jnp.cross(w, r)
                b_d = b_d.at[i].add(-(u @ n) * h_it)
            mu_l = params.mu_cube_wall * nl
            for t_vec, w_t, lam_arr, set_back in (
                (b_t[0][i], b_wt1[i], b_l1, 0),
                (b_t[1][i], b_wt2[i], b_l2, 1),
            ):
                u = v + jnp.cross(w, r)
                d_lam, tl = solve_contact_friction(u @ t_vec, w_t, lam_arr[i], mu_l)
                if set_back == 0:
                    b_l1 = b_l1.at[i].set(tl)
                else:
                    b_l2 = b_l2.at[i].set(tl)
                p = d_lam * t_vec
                v = v + body.inv_mass * p
                w = w + body.inv_inertia_w @ jnp.cross(r, p)
            if torsion:
                d_lam, sl = solve_contact_friction(
                    w @ n, b_ws[i], b_lt[i], mu_tor_r * nl
                )
                b_lt = b_lt.at[i].set(sl)
                w = w + body.inv_inertia_w @ (d_lam * n)

        # -- C: tips vs cube (impulse +P on cube, -P on finger f)
        for f in range(3):
            r, n = c_r[f], c_n[f]
            u = (v + jnp.cross(w, r)) - pre.jac_w[f] @ qd_f[f]
            tgt = tgs_target(c_d[f], c_rest[f], it) if tgs else c_target[f]
            d_lam, nl = solve_contact_normal(u @ n, tgt, c_wn[f], c_ln[f])
            c_ln = c_ln.at[f].set(nl)
            p = d_lam * n
            v = v + body.inv_mass * p
            w = w + body.inv_inertia_w @ jnp.cross(r, p)
            qd_f = qd_f.at[f].add(-(pre.minv_jt[f] @ p))
            if tgs:
                u = (v + jnp.cross(w, r)) - pre.jac_w[f] @ qd_f[f]
                c_d = c_d.at[f].add(-(u @ n) * h_it)
            mu_l = params.mu_tip_cube * nl
            for which in (0, 1):
                t_vec = c_t[which][f]
                w_t = c_wt1[f] if which == 0 else c_wt2[f]
                lam_prev = c_l1[f] if which == 0 else c_l2[f]
                u = (v + jnp.cross(w, r)) - pre.jac_w[f] @ qd_f[f]
                d_lam, tl = solve_contact_friction(u @ t_vec, w_t, lam_prev, mu_l)
                if which == 0:
                    c_l1 = c_l1.at[f].set(tl)
                else:
                    c_l2 = c_l2.at[f].set(tl)
                p = d_lam * t_vec
                v = v + body.inv_mass * p
                w = w + body.inv_inertia_w @ jnp.cross(r, p)
                qd_f = qd_f.at[f].add(-(pre.minv_jt[f] @ p))
            # cube-side spin resistance (tip treated as non-spinning about n)
            if torsion:
                d_lam, sl = solve_contact_friction(
                    w @ n, c_ws[f], c_lt[f], mu_tor_r * nl
                )
                c_lt = c_lt.at[f].set(sl)
                w = w + body.inv_inertia_w @ (d_lam * n)

        # -- F: lower-link shaft samples vs cube (impulse +P cube, -P finger)
        for f in range(3):
            for s in range(_S):
                r, n = f_r[f][s], f_n[f][s]
                u = (v + jnp.cross(w, r)) - pre.samp_jac_w[f, s] @ qd_f[f]
                tgt = (tgs_target(f_d[f, s], f_rest[f, s], it)
                       if tgs else f_target[f][s])
                d_lam, nl = solve_contact_normal(
                    u @ n, tgt, f_wn[f][s], f_ln[f, s]
                )
                f_ln = f_ln.at[f, s].set(nl)
                p = d_lam * n
                v = v + body.inv_mass * p
                w = w + body.inv_inertia_w @ jnp.cross(r, p)
                qd_f = qd_f.at[f].add(-(pre.samp_minv_jt[f, s] @ p))
                if tgs:
                    u = (v + jnp.cross(w, r)) - pre.samp_jac_w[f, s] @ qd_f[f]
                    f_d = f_d.at[f, s].add(-(u @ n) * h_it)
                mu_l = params.mu_link_cube * nl
                for which in (0, 1):
                    t_vec = f_t[f][s][which]
                    w_t = f_wt1[f][s] if which == 0 else f_wt2[f][s]
                    lam_prev = f_l1[f, s] if which == 0 else f_l2[f, s]
                    u = (v + jnp.cross(w, r)) - pre.samp_jac_w[f, s] @ qd_f[f]
                    d_lam, tl = solve_contact_friction(u @ t_vec, w_t, lam_prev, mu_l)
                    if which == 0:
                        f_l1 = f_l1.at[f, s].set(tl)
                    else:
                        f_l2 = f_l2.at[f, s].set(tl)
                    p = d_lam * t_vec
                    v = v + body.inv_mass * p
                    w = w + body.inv_inertia_w @ jnp.cross(r, p)
                    qd_f = qd_f.at[f].add(-(pre.samp_minv_jt[f, s] @ p))

        # -- D: tips vs ground (impulse +P on finger)
        ex = jnp.array([1.0, 0.0, 0.0])
        ey = jnp.array([0.0, 1.0, 0.0])
        ez = jnp.array([0.0, 0.0, 1.0])
        for f in range(_ND):
            u = pre.jac_w[f] @ qd_f[f]
            tgt = (tgs_target(d_d[f], d_rest[f], it, bias_cap=cfg.finger_bias_cap)
                   if tgs else d_target[f])
            d_lam, nl = solve_contact_normal(u[2], tgt, d_wn[f], d_ln[f])
            d_ln = d_ln.at[f].set(nl)
            qd_f = qd_f.at[f].add(pre.minv_jt[f] @ (d_lam * ez))
            mu_l = params.mu_tip_ground * nl
            u = pre.jac_w[f] @ qd_f[f]
            if tgs:
                d_d = d_d.at[f].add(-u[2] * h_it)
            d_lam, t1l = solve_contact_friction(u[0], d_wt1[f], d_l1[f], mu_l)
            d_l1 = d_l1.at[f].set(t1l)
            qd_f = qd_f.at[f].add(pre.minv_jt[f] @ (d_lam * ex))
            u = pre.jac_w[f] @ qd_f[f]
            d_lam, t2l = solve_contact_friction(u[1], d_wt2[f], d_l2[f], mu_l)
            d_l2 = d_l2.at[f].set(t2l)
            qd_f = qd_f.at[f].add(pre.minv_jt[f] @ (d_lam * ey))

        # -- E: tips vs arena wall (impulse +P on finger, wall static)
        for f in range(_NE):
            n = e_n[f]
            u = pre.jac_w[f] @ qd_f[f]
            tgt = (tgs_target(e_d[f], e_rest[f], it, bias_cap=cfg.finger_bias_cap)
                   if tgs else e_target[f])
            d_lam, nl = solve_contact_normal(u @ n, tgt, e_wn[f], e_ln[f])
            e_ln = e_ln.at[f].set(nl)
            qd_f = qd_f.at[f].add(pre.minv_jt[f] @ (d_lam * n))
            if tgs:
                u = pre.jac_w[f] @ qd_f[f]
                e_d = e_d.at[f].add(-(u @ n) * h_it)
            mu_l = params.mu_tip_wall * nl
            for which in (0, 1):
                t_vec = e_t[which][f]
                w_t = e_wt1[f] if which == 0 else e_wt2[f]
                lam_prev = e_l1[f] if which == 0 else e_l2[f]
                u = pre.jac_w[f] @ qd_f[f]
                d_lam, tl = solve_contact_friction(u @ t_vec, w_t, lam_prev, mu_l)
                if which == 0:
                    e_l1 = e_l1.at[f].set(tl)
                else:
                    e_l2 = e_l2.at[f].set(tl)
                qd_f = qd_f.at[f].add(pre.minv_jt[f] @ (d_lam * t_vec))

        new_lam = (a_ln, a_l1, a_l2, a_lt, b_ln, b_l1, b_l2, b_lt,
                   c_ln, c_l1, c_l2, c_lt, d_ln, d_l1, d_l2,
                   e_ln, e_l1, e_l2, f_ln, f_l1, f_l2)
        if tgs:
            # mini-step pose integration: positions genuinely move each
            # iteration (true TGS); contact frames/jacobians stay frozen at
            # substep start (first-order) while depths integrate alongside
            p_pos, p_quat, p_q = poses
            p_pos = p_pos + h_it * v
            p_quat = quat_integrate(p_quat, w, h_it)
            p_q = p_q + h_it * qd_f
            return (v, w, qd_f, new_lam, (a_d, b_d, c_d, d_d, e_d, f_d),
                    (p_pos, p_quat, p_q))
        return v, w, qd_f, new_lam

    zeros_p = jnp.zeros(_P)
    zeros_pb = jnp.zeros(_PB)
    zeros3 = jnp.zeros(3)
    zeros_d = jnp.zeros(_ND)
    zeros_e = jnp.zeros(_NE)
    zeros3s = jnp.zeros((3, _S))
    lam0 = (zeros_p, zeros_p, zeros_p, zeros_p,
            zeros_pb, zeros_pb, zeros_pb, zeros_pb,
            zeros3, zeros3, zeros3, zeros3, zeros_d, zeros_d, zeros_d,
            zeros_e, zeros_e, zeros_e, zeros3s, zeros3s, zeros3s)
    if tgs:
        f_dep0 = (jnp.stack([
            jnp.stack([f_depth[f][s] for s in range(_S)]) for f in range(3)
        ]) if _S else jnp.zeros((3, 0)))
        dep0 = (a_depth, b_depth, c_depth, d_depth, e_depth, f_dep0)
        poses0 = (state.cube_pos, state.cube_quat, q_f)
        v, w, qd_f, lam, _, tgs_poses = jax.lax.fori_loop(
            0, cfg.solver_iterations, sweep, (v, w, qd_f, lam0, dep0, poses0)
        )
    else:
        v, w, qd_f, lam = jax.lax.fori_loop(
            0, cfg.solver_iterations, sweep, (v, w, qd_f, lam0)
        )

    # ---- fingertip contact impulses (force/torque sensing) ----------------
    # Reconstructed from the converged accumulators — the net impulse each tip
    # exchanged this substep (replaces PhysX force sensors,
    # trifinger_env.py:827-832).
    (_, _, _, _, _, _, _, _, c_ln, c_l1, c_l2, _, d_ln, d_l1, d_l2,
     e_ln, e_l1, e_l2, _, _, _) = lam
    ex = jnp.array([1.0, 0.0, 0.0])
    ey = jnp.array([0.0, 1.0, 0.0])
    ez = jnp.array([0.0, 0.0, 1.0])
    # impulse ON the tip: reaction of cube contact (-P) plus ground and wall
    # contacts (+P); lower-link contacts act above the tip sensor and are
    # excluded (the reference force sensors sit on the fingertip bodies,
    # trifinger_env.py:827-832)
    imp_c = -(c_ln[:, None] * c_n + c_l1[:, None] * c_t[0] + c_l2[:, None] * c_t[1])
    imp_d = (d_ln[:, None] * ez + d_l1[:, None] * ex + d_l2[:, None] * ey
             if _ND else jnp.zeros((3, 3)))
    imp_e = (e_ln[:, None] * e_n + e_l1[:, None] * e_t[0] + e_l2[:, None] * e_t[1]
             if _NE else jnp.zeros((3, 3)))
    tip_impulse = imp_c + imp_d + imp_e  # (3 fingers, 3)
    # torque impulse about the tip frame origin
    arm_c = c_point - pre.tip_pos_w  # (3, 3)
    arm_d = (tip_centers - params.tip_radius * ez) - pre.tip_pos_w
    arm_e = ((tip_centers - params.tip_radius * e_n) - pre.tip_pos_w
             if _NE else jnp.zeros((3, 3)))
    tip_torque_impulse = (
        jnp.cross(arm_c, imp_c) + jnp.cross(arm_d, imp_d) + jnp.cross(arm_e, imp_e)
    )

    # ---- position integration + limits -----------------------------------
    # (TGS already integrated poses inside the mini-step loop)
    q_new = (tgs_poses[2].reshape(9) if tgs else (q_f + h * qd_f).reshape(9))
    lower = jnp.asarray(cfg.joint_limit_lower)
    upper = jnp.asarray(cfg.joint_limit_upper)
    q_clamped = jnp.clip(q_new, lower, upper)
    qd9 = qd_f.reshape(9)
    # kill outward velocity at the limits
    at_lower = (q_new <= lower) & (qd9 < 0.0)
    at_upper = (q_new >= upper) & (qd9 > 0.0)
    qd9 = jnp.where(at_lower | at_upper, 0.0, qd9)
    qd9 = jnp.clip(qd9, -params.velocity_limit, params.velocity_limit)

    w_norm = jnp.linalg.norm(w)
    w = jnp.where(w_norm > _MAX_CUBE_ANGVEL, w * (_MAX_CUBE_ANGVEL / w_norm), w)

    new_state = PhysicsState(
        q=q_clamped,
        qd=qd9,
        cube_pos=tgs_poses[0] if tgs else state.cube_pos + h * v,
        cube_quat=tgs_poses[1] if tgs else quat_integrate(state.cube_quat, w, h),
        cube_linvel=v,
        cube_angvel=w,
    )
    return new_state, tip_impulse, tip_torque_impulse


def physics_step(
    state: PhysicsState,
    tau: jax.Array,
    params: SceneParams,
    cfg: SolverConfig,
    dt: float = 0.02,
):
    """Advance one environment by one control step of ``dt`` seconds.

    Unbatched; `vmap` over the env axis for the fleet. ``tau`` (9,) is the
    already-saturated applied joint torque (computed once per step by the env
    layer, exactly like trifinger_env.py:442-496).

    Returns (new_state, tip_wrench) where ``tip_wrench`` (3, 6) is the
    per-fingertip contact force+torque averaged over the step (impulse / dt) —
    the replacement for PhysX fingertip force sensors.
    """
    h = dt / cfg.substeps

    def body(_, carry):
        s, acc_f, acc_t = carry
        s, imp_f, imp_t = _substep(s, tau, params, cfg, h)
        return s, acc_f + imp_f, acc_t + imp_t

    state, imp_f, imp_t = jax.lax.fori_loop(
        0, cfg.substeps, body, (state, jnp.zeros((3, 3)), jnp.zeros((3, 3)))
    )
    tip_wrench = jnp.concatenate([imp_f / dt, imp_t / dt], axis=-1)
    return state, tip_wrench
