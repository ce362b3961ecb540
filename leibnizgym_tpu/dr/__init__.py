"""Domain randomization: per-env physics parameter resampling.

The reference ships an empty ``dr/`` package
(/root/reference/leibnizgym/dr/__init__.py) with the randomization wish-list
left as comments (trifinger_env.py:385-392: restitution/friction, object
mass/size, link masses). Here DR is first-class: `SceneParams` is a batched
pytree and this sampler redraws it per env at reset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from leibnizgym_tpu.ops.types import SceneParams

# default randomization ranges (multiplicative scales unless noted)
DR_DEFAULTS = {
    "cube_mass_scale": (0.8, 1.2),
    "cube_size_scale": (0.97, 1.03),
    "link_mass_scale": (0.9, 1.1),
    "friction_scale": (0.7, 1.3),
    "restitution_range": (0.0, 0.8),  # absolute, tip-cube pair
}


def _u(key, n, lo, hi, shape=()):
    return jax.random.uniform(key, (n,) + shape, minval=lo, maxval=hi)


def sample_scene_params(
    key: jax.Array, n: int, base: SceneParams, ranges: dict | None = None
) -> SceneParams:
    """Draw ``n`` randomized SceneParams around ``base`` (unbatched template).

    Derived quantities (cube inertia from mass+size) stay consistent, the
    motivation behind the reference's CuboidalObject design (utils.py:57-63).
    """
    r = dict(DR_DEFAULTS)
    if ranges:
        r.update({k: tuple(v) for k, v in ranges.items() if k in DR_DEFAULTS})
    k_cm, k_cs, k_lm, k_fr, k_re = jax.random.split(key, 5)

    mass_scale = _u(k_cm, n, *r["cube_mass_scale"])
    cube_mass = base.cube_mass * mass_scale
    size_scale = _u(k_cs, n, *r["cube_size_scale"])
    half = base.cube_half_extents * size_scale[:, None]
    # inertia scales as mass * length^2 under uniform mass/size scaling —
    # exact for ANY base shape (box, sphere, cuboid) and preserves the
    # object's *declared* URDF inertia at scale 1 (a from-scratch box
    # formula here silently replaced ball.urdf's declared sphere inertia)
    inertia = base.cube_inertia * (mass_scale * size_scale**2)[:, None]
    link_masses = base.link_masses * _u(k_lm, n, *r["link_mass_scale"], (3,))
    fric = _u(k_fr, n, *r["friction_scale"])
    restitution = _u(k_re, n, *r["restitution_range"])

    def bc(x):
        return jnp.broadcast_to(x, (n,) + jnp.shape(x))

    return SceneParams(
        gravity=bc(base.gravity),
        link_masses=link_masses,
        joint_damping=bc(base.joint_damping),
        armature=bc(base.armature),
        torque_limit=bc(base.torque_limit),
        velocity_limit=bc(base.velocity_limit),
        cube_mass=cube_mass,
        cube_half_extents=half,
        cube_inertia=inertia,
        cube_linear_damping=bc(base.cube_linear_damping),
        cube_angular_damping=bc(base.cube_angular_damping),
        mu_tip_cube=base.mu_tip_cube * fric,
        mu_cube_ground=base.mu_cube_ground * fric,
        mu_cube_wall=base.mu_cube_wall * fric,
        mu_tip_ground=base.mu_tip_ground * fric,
        restitution_tip_cube=restitution,
        restitution_cube_ground=bc(base.restitution_cube_ground),
        restitution_tip_ground=bc(base.restitution_tip_ground),
        tip_radius=bc(base.tip_radius),
        bounce_threshold=bc(base.bounce_threshold),
        wall_radius=bc(base.wall_radius),
        wall_slope=bc(base.wall_slope),
        wall_knee_z=bc(base.wall_knee_z),
        mu_tip_wall=base.mu_tip_wall * fric,
        restitution_tip_wall=bc(base.restitution_tip_wall),
        mu_link_cube=base.mu_link_cube * fric,
        restitution_link_cube=bc(base.restitution_link_cube),
        mu_torsion=bc(base.mu_torsion),
        torsion_patch_radius=bc(base.torsion_patch_radius),
    )
