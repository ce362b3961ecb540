"""Pytree datatypes for the TPU physics engine.

The reference keeps simulation state inside the PhysX binary and exposes it via
gymtorch tensor views (trifinger_env.py:565-628). Here the state IS the pytree:
purely functional, vmappable over the env axis, shardable with jax.sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from leibnizgym_tpu.models import trifinger as tf_model


@struct.dataclass
class PhysicsState:
    """Dynamic state of one (or a batch of) TriFinger scene(s).

    Leading batch dims are allowed on every field.
    """

    # robot joints, layout (finger-major): [f0j1 f0j2 f0j3 f1j1 ... f2j3]
    q: jax.Array  # (..., 9) joint positions
    qd: jax.Array  # (..., 9) joint velocities
    # free cube
    cube_pos: jax.Array  # (..., 3)
    cube_quat: jax.Array  # (..., 4) xyzw
    cube_linvel: jax.Array  # (..., 3)
    cube_angvel: jax.Array  # (..., 3)

    @classmethod
    def default(cls, batch_shape=()) -> "PhysicsState":
        q0 = jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3)
        quat0 = jnp.array([0.0, 0.0, 0.0, 1.0])
        pos0 = jnp.array([0.0, 0.0, tf_model.CUBE_SIZE / 2])

        def bc(x):
            return jnp.broadcast_to(x, batch_shape + x.shape)

        return cls(
            q=bc(q0),
            qd=jnp.zeros(batch_shape + (9,)),
            cube_pos=bc(pos0),
            cube_quat=bc(quat0),
            cube_linvel=jnp.zeros(batch_shape + (3,)),
            cube_angvel=jnp.zeros(batch_shape + (3,)),
        )


@struct.dataclass
class SceneParams:
    """Physical parameters of the scene.

    Every field may carry a leading env batch dim — this is the domain-
    randomization surface (the reference's empty ``dr/`` package plus the
    randomization wish-list at trifinger_env.py:385-392). Scalars broadcast.
    """

    gravity: jax.Array  # (3,)
    # robot
    link_masses: jax.Array  # (3,) per-chain link masses (upper, middle, lower+tip)
    joint_damping: jax.Array  # (3,) viscous joint damping per finger joint
    armature: jax.Array  # (3,) rotor armature added to M diagonal
    torque_limit: jax.Array  # () actuator torque saturation
    velocity_limit: jax.Array  # () joint velocity clamp
    # cube
    cube_mass: jax.Array  # ()
    cube_half_extents: jax.Array  # (3,)
    cube_inertia: jax.Array  # (3,) diagonal body-frame inertia
    cube_linear_damping: jax.Array  # ()
    cube_angular_damping: jax.Array  # ()
    # contact materials (already pair-combined)
    mu_tip_cube: jax.Array  # ()
    mu_cube_ground: jax.Array  # ()
    mu_cube_wall: jax.Array  # ()
    mu_tip_ground: jax.Array  # ()
    restitution_tip_cube: jax.Array  # ()
    restitution_cube_ground: jax.Array  # ()
    restitution_tip_ground: jax.Array  # ()
    tip_radius: jax.Array  # ()
    # solver settings (static python numbers would also work, but keeping them
    # here lets DR perturb e.g. the bounce threshold)
    bounce_threshold: jax.Array  # () restitution activation velocity
    # arena wall profile: vertical cylinder of `wall_radius` up to
    # `wall_knee_z`, flaring outward at `wall_slope` (dr/dz) above it. The
    # reference boundary mesh (high_table_boundary.stl) measures r=0.1945
    # below z=0.034 and slope 0.577 above (scripts/asset_tools.py deviation,
    # PARITY.md); the shipped default keeps the round-1..3 straight cylinder
    # (slope 0) for learning-curve/golden-trajectory continuity — set
    # gym config arena.profile="cone" for the measured reference profile.
    wall_radius: jax.Array  # ()
    wall_slope: jax.Array  # () dr/dz above the knee; 0 = cylinder
    wall_knee_z: jax.Array  # () height where the flare starts
    # extended contact pairs (tip-vs-wall, lower-link-vs-cube; reference
    # collision setup trifinger_env.py:874-937 collides every finger link and
    # the stage boundary)
    mu_tip_wall: jax.Array  # ()
    restitution_tip_wall: jax.Array  # ()
    mu_link_cube: jax.Array  # ()
    restitution_link_cube: jax.Array  # ()
    # torsional friction at cube contacts (reference object shape prop
    # torsion_friction=0.001, trifinger_env.py:932-937). Torque bound is
    # mu_torsion * patch_radius * lambda_n (PhysX patch model).
    mu_torsion: jax.Array  # ()
    torsion_patch_radius: jax.Array  # ()

    @classmethod
    def default(cls, object_size=None, object_density: float | None = None,
                object_shape: str = "box") -> "SceneParams":
        """Defaults for the RRC cube; ``object_size`` (scalar or (3,)) and
        ``object_density`` support cuboid variants (the reference's phase-3
        cuboid and its open TODO 'Make object dimensions configurable',
        trifinger_env.py:139-143). ``object_shape="sphere"`` selects the
        ball.urdf object (radius 0.0375, mass 0.25; reference
        resources/assets/trifinger/objects/urdf/ball.urdf) — ``object_size``
        is then the diameter and ``cube_half_extents[0]`` carries the radius."""
        if object_shape == "sphere":
            size = np.broadcast_to(np.asarray(
                2 * tf_model.BALL_RADIUS if object_size is None else object_size,
                np.float64,
            ), (3,))
            radius = float(size[0]) / 2
            if object_density is None:
                # URDF declares the mass outright; scale with volume if the
                # radius is overridden
                mass = tf_model.BALL_MASS * (radius / tf_model.BALL_RADIUS) ** 3
            else:
                mass = float(object_density * 4.0 / 3.0 * np.pi * radius**3)
            return cls.default(
                object_size=size, object_density=mass / float(np.prod(size))
            ).replace(
                cube_inertia=jnp.asarray(tf_model.ball_inertia_diag(mass, radius)),
            )
        size = np.asarray(
            tf_model.CUBE_SIZE if object_size is None else object_size, np.float64
        )
        size = np.broadcast_to(size, (3,))
        density = tf_model.CUBE_DENSITY if object_density is None else object_density
        mass = float(density * size[0] * size[1] * size[2])

        def combine(a, b):
            # PhysX default pair combine mode: average
            return 0.5 * (a + b)

        return cls(
            gravity=jnp.array([0.0, 0.0, -9.81]),
            link_masses=jnp.asarray(tf_model.LINK_MASSES),
            joint_damping=jnp.zeros(3),
            armature=jnp.zeros(3),
            torque_limit=jnp.asarray(tf_model.MAX_TORQUE_NM),
            velocity_limit=jnp.asarray(tf_model.MAX_VELOCITY_RADPS),
            cube_mass=jnp.asarray(mass),
            cube_half_extents=jnp.asarray(size / 2),
            cube_inertia=jnp.asarray(tf_model.cube_inertia_diag(mass, size)),
            cube_linear_damping=jnp.asarray(tf_model.CUBE_LINEAR_DAMPING),
            cube_angular_damping=jnp.asarray(tf_model.CUBE_ANGULAR_DAMPING),
            mu_tip_cube=jnp.asarray(
                combine(tf_model.ROBOT_FRICTION, tf_model.OBJECT_FRICTION)
            ),
            mu_cube_ground=jnp.asarray(
                combine(tf_model.OBJECT_FRICTION, tf_model.GROUND_FRICTION)
            ),
            mu_cube_wall=jnp.asarray(
                combine(tf_model.OBJECT_FRICTION, tf_model.STAGE_FRICTION)
            ),
            mu_tip_ground=jnp.asarray(
                combine(tf_model.ROBOT_FRICTION, tf_model.GROUND_FRICTION)
            ),
            restitution_tip_cube=jnp.asarray(
                combine(tf_model.ROBOT_RESTITUTION, tf_model.OBJECT_RESTITUTION)
            ),
            restitution_cube_ground=jnp.asarray(0.0),
            restitution_tip_ground=jnp.asarray(
                combine(tf_model.ROBOT_RESTITUTION, 0.0)
            ),
            tip_radius=jnp.asarray(tf_model.TIP_SPHERE_RADIUS),
            bounce_threshold=jnp.asarray(0.5),
            wall_radius=jnp.asarray(tf_model.WALL_INNER_RADIUS),
            wall_slope=jnp.zeros(()),
            wall_knee_z=jnp.zeros(()),
            mu_tip_wall=jnp.asarray(
                combine(tf_model.ROBOT_FRICTION, tf_model.STAGE_FRICTION)
            ),
            restitution_tip_wall=jnp.asarray(
                combine(tf_model.ROBOT_RESTITUTION, 0.0)
            ),
            mu_link_cube=jnp.asarray(
                combine(tf_model.ROBOT_FRICTION, tf_model.OBJECT_FRICTION)
            ),
            restitution_link_cube=jnp.asarray(
                combine(tf_model.ROBOT_RESTITUTION, tf_model.OBJECT_RESTITUTION)
            ),
            mu_torsion=jnp.asarray(
                combine(0.0, tf_model.OBJECT_TORSION_FRICTION)
            ),
            torsion_patch_radius=jnp.asarray(0.01),
        )


@struct.dataclass
class SolverConfig:
    """Static solver configuration (python ints/floats; jit-static)."""

    substeps: int = struct.field(pytree_node=False, default=4)
    solver_iterations: int = struct.field(pytree_node=False, default=8)
    # 0 = velocity-level PGS + Baumgarte bias (the validated training
    #     default mapping of the reference's PhysX config);
    # 1 = TGS (PhysX solver_type 1, reference rlg_hydra.py:27-29): every
    #     solver iteration is a mini-step of h/solver_iterations — contact
    #     depths are integrated along with the evolving normal velocities,
    #     so positional error is corrected geometrically across iterations
    #     instead of through a one-shot velocity bias. Select from the env
    #     via sim.physx.tpu_solver: "tgs".
    solver_type: int = struct.field(pytree_node=False, default=0)
    # 0 = box object (RRC cube), 1 = sphere object (ball.urdf). Static so the
    # engines trace shape-specific contact sets: a sphere has ONE ground and
    # ONE wall contact point instead of 8 corners, and tip/link-vs-object
    # queries become sphere-sphere instead of sphere-box.
    object_shape: int = struct.field(pytree_node=False, default=0)
    baumgarte: float = struct.field(pytree_node=False, default=0.2)
    # TGS positional bias factor per mini-step: the velocity target corrects
    # tgs_bias of the *remaining* depth per iteration (geometric decay, so
    # the exit velocity carries only ~(1-tgs_bias)^iters of bias energy)
    tgs_bias: float = struct.field(pytree_node=False, default=0.7)
    contact_slop: float = struct.field(pytree_node=False, default=0.001)
    # Floor on the effective inverse mass (J M^-1 J^T projected on the
    # contact direction) of finger-only contacts (tip-ground, tip-wall).
    # At a kinematic singularity (finger fully extended pressing the arena
    # wall) the projection reaches ~1e-9..0 and the PGS impulse
    # (target-u)/w explodes to inf/NaN; the floor makes such contacts soft
    # instead (max effective contact mass = 1/w_min kg). Applied as
    # max(w, w_min), so non-singular dynamics are bit-identical.
    w_min: float = struct.field(pytree_node=False, default=0.05)
    # Cap on the Baumgarte depenetration velocity of finger-only contacts
    # (m/s). Deep tip penetration of the wall only arises through the
    # singular configuration above; an uncapped bias (depth/h-scaled) then
    # demands ~8 m/s and kicks the finger violently. Binds only beyond
    # ~25 mm penetration at the default baumgarte factor.
    finger_bias_cap: float = struct.field(pytree_node=False, default=2.0)
    joint_limit_lower: tuple = struct.field(
        pytree_node=False,
        default=tuple(np.tile(tf_model.JOINT_POS_LOW, 3).tolist()),
    )
    joint_limit_upper: tuple = struct.field(
        pytree_node=False,
        default=tuple(np.tile(tf_model.JOINT_POS_HIGH, 3).tolist()),
    )
    # Trace-time contact-group gates. A disabled group is not even BUILT —
    # zero collision queries, zero PGS slots, zero cost — so a task config
    # that cannot activate a pair (e.g. on-table tasks never drive the cube
    # into the arena wall rim at speed; mu_torsion == 0 makes every torsion
    # sweep a no-op) can shed its full cost. All default ON: the shipped
    # fidelity surface is unchanged unless a config opts out via
    # sim.contact_pairs. Object-vs-ground and tip-vs-object are the task's
    # essential pairs and are always built.
    enable_cube_wall: bool = struct.field(pytree_node=False, default=True)
    enable_tip_ground: bool = struct.field(pytree_node=False, default=True)
    enable_tip_wall: bool = struct.field(pytree_node=False, default=True)
    enable_link_cube: bool = struct.field(pytree_node=False, default=True)
    enable_torsion: bool = struct.field(pytree_node=False, default=True)
