"""Collision detection and sequential-impulse contact solver.

Replaces the PhysX TGS contact pipeline (SURVEY.md §2.3) with an analytic,
fixed-topology formulation chosen for TPU execution:

- The scene has a *static* contact graph: 3 tip-spheres x cube, 8 cube corners
  x ground, 8 cube corners x arena wall, 3 tip-spheres x ground = 22 candidate
  contacts. No broadphase, no dynamic shapes — every contact slot always
  exists and inactivity falls out of the impulse clamping (speculative
  targets), so the whole solve is branch-free and jit/vmap friendly.
- Velocity-level projected Gauss-Seidel with accumulated impulses, Baumgarte
  positional bias, speculative (tunneling-safe) targets for separated pairs,
  and PhysX-style restitution gated by a bounce-threshold velocity
  (rlg_hydra.py:32 bounce_threshold_velocity=0.5).
- Finger coupling enters through the 3x3 tip Jacobian and joint-space mass
  matrix: an impulse P at the tip changes joint velocity by M^-1 J^T P.

Unbatched (single env); the engine vmaps it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.ops.types import SolverConfig
from leibnizgym_tpu.utils.math import quat_to_matrix

# 8 corner sign combinations of a box
# numpy so importing never touches the accelerator backend (wedged-tunnel
# robustness); jnp converts at trace time
_CORNER_SIGNS = np.array(
    [
        [sx, sy, sz]
        for sx in (-1.0, 1.0)
        for sy in (-1.0, 1.0)
        for sz in (-1.0, 1.0)
    ]
)


def _tangent_basis(n: jax.Array):
    """Two orthonormal tangents for a unit normal n (3,)."""
    # pick the axis least aligned with n
    a = jnp.where(jnp.abs(n[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


class CubeBody(NamedTuple):
    """Precomputed cube quantities for the solver."""

    pos: jax.Array  # (3,)
    rot: jax.Array  # (3, 3)
    inv_mass: jax.Array  # ()
    inv_inertia_w: jax.Array  # (3, 3) world-frame inverse inertia


def cube_body(pos, quat, mass, inertia_diag) -> CubeBody:
    rot = quat_to_matrix(quat)
    inv_i_body = jnp.diag(1.0 / inertia_diag)
    return CubeBody(
        pos=pos,
        rot=rot,
        inv_mass=1.0 / mass,
        inv_inertia_w=rot @ inv_i_body @ rot.T,
    )


def closest_point_on_box(center_local: jax.Array, half: jax.Array):
    """Sphere-center vs box in box-local coords.

    Returns (normal_local pointing from box surface toward the center,
    signed distance of center to the box surface; negative = inside).
    """
    clamped = jnp.clip(center_local, -half, half)
    delta = center_local - clamped
    # sqrt-free outside test (matches engine_v2.sphere_vs_cube): TPU's sqrt
    # rounding can flip a `norm(delta) > eps` predicate at the epsilon
    # boundary and emit a zero normal for a center exactly on/inside the box
    dist_sq = delta @ delta
    outside = dist_sq > 1e-16
    dist = jnp.sqrt(jnp.maximum(dist_sq, 1e-18))
    n_out = delta / dist

    # inside: push out through nearest face
    face_gap = half - jnp.abs(center_local)  # >= 0 inside
    axis = jnp.argmin(face_gap)
    sign = jnp.sign(center_local[axis] + 1e-12)
    n_in = jnp.zeros(3).at[axis].set(sign)
    inside_dist = -face_gap[axis]

    normal = jnp.where(outside, n_out, n_in)
    sdist = jnp.where(outside, dist, inside_dist)
    surface_local = jnp.where(outside, clamped, center_local + n_in * face_gap[axis])
    return normal, sdist, surface_local


def solve_contact_normal(
    u_n: jax.Array, target: jax.Array, w_n: jax.Array, lam: jax.Array
):
    """One clamped normal-impulse update. Returns (d_lambda, new_lambda)."""
    d_lam = (target - u_n) / w_n
    new_lam = jnp.maximum(lam + d_lam, 0.0)
    return new_lam - lam, new_lam


def solve_contact_friction(
    u_t: jax.Array, w_t: jax.Array, lam_t: jax.Array, mu_lam_n: jax.Array
):
    """One clamped friction-impulse update along a tangent direction."""
    d_lam = -u_t / w_t
    new_lam = jnp.clip(lam_t + d_lam, -mu_lam_n, mu_lam_n)
    return new_lam - lam_t, new_lam


def contact_target(
    depth: jax.Array,
    v_n0: jax.Array,
    restitution: jax.Array,
    bounce_threshold: jax.Array,
    h: float,
    cfg: SolverConfig,
    bias_cap: float | None = None,
) -> jax.Array:
    """Velocity target for the normal constraint.

    Penetrating: Baumgarte bias beta/h * (depth - slop), optionally capped at
                 ``bias_cap`` m/s (finger-only contacts; see
                 SolverConfig.finger_bias_cap).
    Separated:   speculative -gap/h (may approach but not tunnel past contact).
    Restitution: -e * v_n0 when impact speed exceeds the bounce threshold AND
                 the pair is predicted to touch within this substep
                 (depth - v_n0*h > 0). Without the touch gate a separated pair
                 approaching faster than the bounce threshold would receive a
                 phantom impulse at a distance (PhysX applies restitution to
                 speculative contacts only once they are predicted to touch).
    """
    pen_bias = cfg.baumgarte / h * jnp.maximum(depth - cfg.contact_slop, 0.0)
    if bias_cap is not None:
        pen_bias = jnp.minimum(pen_bias, bias_cap)
    bias = jnp.where(
        depth > 0.0,
        pen_bias,
        depth / h,  # negative: allowed approach speed closes the gap exactly
    )
    return jnp.maximum(bias, restitution_target(
        depth, v_n0, restitution, bounce_threshold, h
    ))


def restitution_target(
    depth: jax.Array,
    v_n0: jax.Array,
    restitution: jax.Array,
    bounce_threshold: jax.Array,
    h: float,
) -> jax.Array:
    """Restitution part of the normal velocity target (-inf when inactive).

    Shared by the PGS target above and the TGS mode, whose positional bias
    is recomputed every solver iteration from the integrated depth while the
    restitution target stays fixed at the substep-start impact velocity."""
    # restitution can only RAISE the target, and only on real impacts —
    # a plain maximum(bias, 0) here would forbid approach velocity on
    # separated contacts and freeze bodies in mid-air.
    touching = depth - v_n0 * h > 0.0
    return jnp.where(
        (v_n0 < -bounce_threshold) & touching, -restitution * v_n0, -jnp.inf
    )
