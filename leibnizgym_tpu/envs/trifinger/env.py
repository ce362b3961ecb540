"""TriFinger environment: pure-functional MDP core + stateful wrapper.

Capability parity with the reference ``TrifingerEnv``
(/root/reference/leibnizgym/envs/trifinger/trifinger_env.py) re-designed for
TPU: the IsaacGym stack of mutable gymtorch buffer views, indexed setters and
refresh calls collapses into

    env_step: (EnvStatic, EnvParams, EnvState, action) -> (EnvState, Transition)

vmapped/batched over the env axis, jitted whole, and shardable along the env
axis with jax.sharding. Resets are jnp.where masking (the functional
replacement for set_*_tensor_indexed, reference trifinger_env.py:419-423).

Reference quirks intentionally reproduced (SURVEY.md §7.3):
- dones = reset & goal_reset (env_base.py:399 logical_and) under the default
  ``dones_mode: "and"`` config.
- On a reset step the fingertip "previous" state used by delta rewards is the
  pre-reset fingertip state (the reference's history-zeroing is rotated out by
  the post-step appendleft before rewards read it).
- The ``robot_a``-labelled state slot carries applied joint torques
  (trifinger_env.py:299 vs :1043-1047).
- Reset envs take a zero action on their reset step (action buffer zeroing in
  _reset_impl, trifinger_env.py:387).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from leibnizgym_tpu.envs.trifinger import sample as sampling
from leibnizgym_tpu.envs.trifinger.config import (
    SIM_DEFAULT_CONFIG_DICT,
    TRIFINGER_DEFAULT_CONFIG_DICT,
)
from leibnizgym_tpu.envs.trifinger.dims import (
    CuboidalObject,
    SphereObject,
    TrifingerDimensions,
)
from leibnizgym_tpu.envs.trifinger.rewards import (
    RewardTermSpec,
    _qmul_c,
    build_reward_specs,
    compute_rewards_c,
    quat_diff_rad_c,
)
from leibnizgym_tpu.models import trifinger as tf_model
from leibnizgym_tpu.ops.engine import physics_step
from leibnizgym_tpu.ops.engine_v2 import physics_step_v2
from leibnizgym_tpu.ops.types import PhysicsState, SceneParams, SolverConfig
from leibnizgym_tpu.utils import merged_dict, print_info
from leibnizgym_tpu.utils.math import (
    saturate,
    scale_transform,
    unscale_transform,
)



# ---------------------------------------------------------------------------
# Static (hashable) environment description — drives tracing/compilation
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EnvStatic:
    num_envs: int
    episode_length: int
    task_difficulty: int
    command_mode: str
    normalize_obs: bool
    normalize_action: bool
    apply_safety_damping: bool
    asymmetric_obs: bool
    enable_ft_sensors: bool
    robot_reset_type: str
    robot_dof_pos_stddev: float
    robot_dof_vel_stddev: float
    object_reset_type: str
    goal_rotation_active: bool
    goal_rate_magnitude: float
    termination_activate: bool
    termination_bonus: float
    position_tolerance: float
    orientation_tolerance: float
    # annealed tolerances (TPU-build extension for the 6-DoF curriculum):
    # linear ramp from *_init to the final tolerance over
    # [0, tolerance_anneal_frames] env-steps; 0 disables annealing
    position_tolerance_init: float
    orientation_tolerance_init: float
    tolerance_anneal_frames: float
    # goal-orientation difficulty curriculum (TPU-build extension): for
    # difficulties 4/5/6, scale the out-of-plane (swing) component of sampled
    # goal orientations from ori_difficulty_init -> 1.0 linearly over
    # [0, ori_difficulty_anneal_frames] env-steps; 0 disables (reference
    # behavior: fully random goal orientations from the first episode)
    ori_difficulty_init: float
    ori_difficulty_anneal_frames: float
    # success-gated curriculum (TPU-build extension, round-2): when True the
    # goal-orientation difficulty AND the success tolerances are driven by
    # the runtime ``EnvParams.curriculum_level`` scalar (advanced/retreated
    # by a host-side controller on measured success) instead of the
    # frame-based ramps above — a frame schedule cannot retreat when it
    # outpaces learning (the round-2 frame-annealed D4 run collapsed to zero
    # success once the ramp passed the policy's competence)
    curriculum_success_gated: bool
    dones_mode: str
    control_decimation: int
    dt: float
    dr_activate: bool
    # DR ranges as a hashable ((name, lo, hi), ...) tuple so the configured
    # values (not just DR_DEFAULTS) reach sample_scene_params
    dr_ranges: Tuple[Tuple[str, float, float], ...]
    # PD-gain randomization range (lo, hi); scales kp and kd per env at reset
    dr_pd_gain_scale: Tuple[float, float]
    engine: str  # "soa" (TPU scalar layout) | "pallas" (mega-kernel) | "reference"
    use_keypoint_obs: bool  # append 8 object + 8 goal cube-corner keypoints
    # Gaussian observation noise, std in *normalized* obs units (the
    # reference's planned hook, trifinger_env.py:979 "TODO: add observation
    # noise"). 0 disables. Policy obs only — the privileged state stays
    # clean (that is the point of the asymmetric critic).
    obs_noise_std: float
    reward_specs: Tuple[RewardTermSpec, ...]
    solver: SolverConfig

    @property
    def action_dim(self) -> int:
        return 18 if self.command_mode == "position_impedance" else 9

    @property
    def obs_dim(self) -> int:
        base = 9 + 9 + 7 + 7 + self.action_dim
        return base + (48 if self.use_keypoint_obs else 0)

    @property
    def state_dim(self) -> int:
        if not self.asymmetric_obs:
            return 0
        return self.obs_dim + 6 + 3 * 13 + 9 + 3 * 6

    def reward_spec_dict(self) -> Dict[str, RewardTermSpec]:
        return {s.name: s for s in self.reward_specs}


# ---------------------------------------------------------------------------
# Parameter pytree (arrays the jitted fns close over as runtime inputs)
# ---------------------------------------------------------------------------


@struct.dataclass
class EnvParams:
    obs_scale_low: jax.Array
    obs_scale_high: jax.Array
    state_scale_low: jax.Array
    state_scale_high: jax.Array
    action_scale_low: jax.Array
    action_scale_high: jax.Array
    pd_stiffness: jax.Array  # (9,)
    pd_damping: jax.Array  # (9,)
    safety_damping: jax.Array  # (9,)
    torque_low: jax.Array  # (9,)
    torque_high: jax.Array  # (9,)
    dof_default_pos: jax.Array  # (9,)
    dof_default_vel: jax.Array  # (9,)
    # goal/object sampling geometry (CuboidalObject-derived)
    max_com_distance: jax.Array  # ()
    object_min_height: jax.Array  # ()
    object_max_height: jax.Array  # ()
    object_radius_3d: jax.Array  # ()
    object_size_z: jax.Array  # ()
    scene_base: SceneParams  # unbatched template for DR resampling
    # success-gated curriculum position in [0, 1] (only consumed when
    # static.curriculum_success_gated; a plain array so the host controller
    # can move it every epoch without recompiling)
    curriculum_level: jax.Array  # ()


@struct.dataclass
class EnvState:
    """Full environment state (batched over the env axis).

    Layout note (TPU): fields suffixed ``_cm`` are component-major — shape
    (k, N) with the env axis in the 128-wide lane dimension — because (N, k)
    arrays with k << 128 pad k up to full lanes (e.g. the round-1 (N, 2, 3,
    13) fingertip history materialized 67 MB of padded HBM traffic per step
    for 2.5 MB of data). Only what the MDP layer actually consumes is kept:
    previous tip positions and previous object pose (the reference's 2-deep
    state history, trifinger_env.py:974-975, reduced to its read set)."""

    physics: PhysicsState  # (N, ...)
    scene: SceneParams  # (N, ...) per-env physics params (DR surface)
    pd_scale: jax.Array  # (N, 2) DR scale on (pd_stiffness, pd_damping)
    goal_pose_cm: jax.Array  # (7, N) [x y z qx qy qz qw]
    goal_angvel_cm: jax.Array  # (3, N)
    action_buf: jax.Array  # (N, A)
    applied_torque: jax.Array  # (N, 9)
    tip_wrench: jax.Array  # (N, 18) [f0: force3 torque3 | f1 | f2]
    reset_buf: jax.Array  # (N,) bool
    goal_reset_buf: jax.Array  # (N,) bool
    steps_count: jax.Array  # (N,) int32
    successes: jax.Array  # (N,) int32
    tip_pos_prev_cm: jax.Array  # (9, N) previous-step world tip xyz, finger-major
    obj_posquat_prev_cm: jax.Array  # (7, N) previous-step object pos+quat
    frames: jax.Array  # () int32 — simulator frame counter
    key: jax.Array  # PRNG key

    @property
    def goal_pose(self) -> jax.Array:
        """(N, 7) view of the goal pose (row-major convenience accessor)."""
        return self.goal_pose_cm.T


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------


_DR_RANGE_KEYS = (
    "cube_mass_scale", "cube_size_scale", "link_mass_scale",
    "friction_scale", "restitution_range",
)


def _extract_dr_ranges(dr_config: dict) -> Tuple[Tuple[str, float, float], ...]:
    """Configured DR ranges as a hashable tuple (jit-static)."""
    out = []
    for key in _DR_RANGE_KEYS:
        if key in dr_config:
            lo, hi = dr_config[key]
            out.append((key, float(lo), float(hi)))
    return tuple(out)


def build_static(config: dict) -> EnvStatic:
    rs = config["reset_distribution"]
    term = config["termination_conditions"]["success"]
    sim = config["sim"]
    # Default engine is platform-conditional: the Mosaic mega-kernel is the
    # fast path ON TPU (3.3x the XLA-SoA engine end-to-end, 3 s compiles —
    # RESULTS.md round-3 bench) but only runs in slow interpret mode
    # elsewhere, so CPU (tests, multichip dryrun) defaults to the XLA-SoA
    # engine. Explicit config always wins.
    engine = config.get("engine")
    if engine is None:
        engine = "pallas" if jax.default_backend() == "tpu" else "soa"
    engine = str(engine)
    if engine not in ("soa", "pallas", "reference"):
        raise ValueError(
            f"Invalid engine: {engine!r} not in ['soa', 'pallas', 'reference']."
        )
    specs = build_reward_specs(config["reward_terms"])
    # The reference trains with PhysX solver_type 1 (TGS) + 8 position
    # iterations (rlg_hydra.py:27-29); the TGS position-iteration mode is
    # the default since round 3. The controlled comparison that flipped it
    # (same seed/engine/everything, D1 preset, 78.6M frames): TGS reaches
    # 6,357 episode reward vs PGS 3,862 — TGS also matches the reference's
    # published curve (~6,000 by 80-100M frames). sim.physx.tpu_solver=pgs
    # selects the velocity-level PGS + Baumgarte solver instead.
    tpu_solver = str(sim["physx"].get("tpu_solver", "tgs"))
    if tpu_solver not in ("pgs", "tgs"):
        raise ValueError(
            f"Invalid sim.physx.tpu_solver: {tpu_solver!r} not in ['pgs', 'tgs']."
        )
    object_type = str(config.get("object_type", "cube"))
    if object_type not in ("cube", "sphere"):
        raise ValueError(
            f"Invalid object_type: {object_type!r} not in ['cube', 'sphere']."
        )
    # trace-time contact-group gates (sim.contact_pairs, all default ON):
    # a pair a task cannot activate costs zero compute when disabled — the
    # engines do not even build the group (ops/types.py SolverConfig)
    pairs = dict(sim.get("contact_pairs", {}) or {})
    unknown = set(pairs) - {
        "cube_wall", "tip_ground", "tip_wall", "link_cube", "torsion"
    }
    if unknown:
        raise ValueError(f"Invalid sim.contact_pairs keys: {sorted(unknown)}")
    solver = SolverConfig(
        substeps=int(sim["substeps"]),
        solver_iterations=int(sim["physx"]["num_position_iterations"]),
        solver_type=1 if tpu_solver == "tgs" else 0,
        object_shape=1 if object_type == "sphere" else 0,
        enable_cube_wall=bool(pairs.get("cube_wall", True)),
        enable_tip_ground=bool(pairs.get("tip_ground", True)),
        enable_tip_wall=bool(pairs.get("tip_wall", True)),
        enable_link_cube=bool(pairs.get("link_cube", True)),
        enable_torsion=bool(pairs.get("torsion", True)),
    )
    return EnvStatic(
        num_envs=int(config["num_instances"]),
        episode_length=int(config["episode_length"] or 0),
        task_difficulty=int(config["task_difficulty"]),
        command_mode=str(config["command_mode"]),
        normalize_obs=bool(config["normalize_obs"]),
        normalize_action=bool(config["normalize_action"]),
        apply_safety_damping=bool(config["apply_safety_damping"]),
        asymmetric_obs=bool(config["asymmetric_obs"]),
        enable_ft_sensors=bool(config["enable_ft_sensors"] or config["asymmetric_obs"]),
        robot_reset_type=str(rs["robot_initial_state"]["type"]),
        robot_dof_pos_stddev=float(rs["robot_initial_state"]["dof_pos_stddev"]),
        robot_dof_vel_stddev=float(rs["robot_initial_state"]["dof_vel_stddev"]),
        object_reset_type=str(rs["object_initial_state"]["type"]),
        goal_rotation_active=bool(config["goal_movement"]["rotation"]["activate"]),
        goal_rate_magnitude=float(config["goal_movement"]["rotation"]["rate_magnitude"]),
        termination_activate=bool(term["activate"]),
        termination_bonus=float(term["bonus"]),
        position_tolerance=float(term["position_tolerance"]),
        orientation_tolerance=float(term["orientation_tolerance"]),
        position_tolerance_init=float(
            term.get("position_tolerance_init", term["position_tolerance"])
        ),
        orientation_tolerance_init=float(
            term.get("orientation_tolerance_init", term["orientation_tolerance"])
        ),
        tolerance_anneal_frames=float(term.get("tolerance_anneal_frames", 0.0)),
        ori_difficulty_init=float(
            config.get("goal_curriculum", {}).get("orientation_difficulty_init", 1.0)
        ),
        ori_difficulty_anneal_frames=float(
            config.get("goal_curriculum", {}).get("anneal_frames", 0.0)
        ),
        curriculum_success_gated=bool(
            config.get("goal_curriculum", {}).get("success_gated", False)
        ),
        dones_mode=str(config.get("dones_mode", "and")),
        control_decimation=int(config["control_decimation"]),
        dt=float(sim["dt"]),
        dr_activate=bool(config.get("domain_randomization", {}).get("activate", False)),
        dr_ranges=_extract_dr_ranges(config.get("domain_randomization", {})),
        dr_pd_gain_scale=tuple(
            float(x) for x in config.get("domain_randomization", {}).get(
                "pd_gain_scale", (1.0, 1.0)
            )
        ),
        engine=engine,
        use_keypoint_obs=bool(config.get("use_keypoint_obs", False)),
        obs_noise_std=float(config.get("obs_noise_std", 0.0)),
        reward_specs=tuple(specs[name] for name in sorted(specs)),
        solver=solver,
    )


def build_params(static: EnvStatic, object_dims: CuboidalObject,
                 arena: Optional[dict] = None,
                 object_density: Optional[float] = None) -> EnvParams:
    """Assemble scale vectors exactly as __configure_mdp_spaces
    (reference trifinger_env.py:630-748)."""
    jpos_low = np.tile(tf_model.JOINT_POS_LOW, 3)
    jpos_high = np.tile(tf_model.JOINT_POS_HIGH, 3)
    jvel_low = np.full(9, -tf_model.MAX_VELOCITY_RADPS, np.float32)
    jvel_high = np.full(9, tf_model.MAX_VELOCITY_RADPS, np.float32)
    jtorque_low = np.full(9, -tf_model.MAX_TORQUE_NM, np.float32)
    jtorque_high = np.full(9, tf_model.MAX_TORQUE_NM, np.float32)
    obj_pos_low = np.array([-0.3, -0.3, 0.0], np.float32)
    obj_pos_high = np.array([0.3, 0.3, 0.3], np.float32)
    ori_low = -np.ones(4, np.float32)
    ori_high = np.ones(4, np.float32)
    stiffness_low = np.tile([1.0, 1.0, 1.0], 3).astype(np.float32)
    stiffness_high = np.tile([50.0, 50.0, 50.0], 3).astype(np.float32)

    if static.command_mode == "position":
        act_low, act_high = jpos_low, jpos_high
    elif static.command_mode == "torque":
        act_low, act_high = jtorque_low, jtorque_high
    elif static.command_mode == "position_impedance":
        act_low = np.concatenate([jpos_low, stiffness_low])
        act_high = np.concatenate([jpos_high, stiffness_high])
    else:
        raise ValueError(
            f"Invalid command mode: {static.command_mode!r} not in "
            "['torque', 'position', 'position_impedance']."
        )

    if static.normalize_action:
        obs_act_low = np.full(static.action_dim, -1.0, np.float32)
        obs_act_high = np.full(static.action_dim, 1.0, np.float32)
    else:
        obs_act_low, obs_act_high = act_low, act_high

    obs_low = np.concatenate(
        [jpos_low, jvel_low, obj_pos_low, ori_low, obj_pos_low, ori_low, obs_act_low]
    )
    obs_high = np.concatenate(
        [jpos_high, jvel_high, obj_pos_high, ori_high, obj_pos_high, ori_high, obs_act_high]
    )
    if static.use_keypoint_obs:
        # 8 object + 8 goal cube corners: position limits expanded by the
        # cube half-diagonal
        pad = float(object_dims.radius_3d)
        kp_low = np.tile(obj_pos_low - pad, 8).astype(np.float32)
        kp_high = np.tile(obj_pos_high + pad, 8).astype(np.float32)
        obs_low = np.concatenate([obs_low, kp_low, kp_low])
        obs_high = np.concatenate([obs_high, kp_high, kp_high])

    if static.asymmetric_obs:
        ftip_low = np.concatenate(
            [np.array([-0.4, -0.4, 0.0]), ori_low, np.full(6, -0.2)]
        ).astype(np.float32)
        ftip_high = np.concatenate(
            [np.array([0.4, 0.4, 0.5]), ori_high, np.full(6, 0.2)]
        ).astype(np.float32)
        obj_vel_low = np.full(6, -0.5, np.float32)
        obj_vel_high = np.full(6, 0.5, np.float32)
        wrench_low = np.full(6, -1.0, np.float32)
        wrench_high = np.full(6, 1.0, np.float32)
        state_low = np.concatenate(
            [obs_low, obj_vel_low, np.tile(ftip_low, 3), jtorque_low, np.tile(wrench_low, 3)]
        )
        state_high = np.concatenate(
            [obs_high, obj_vel_high, np.tile(ftip_high, 3), jtorque_high, np.tile(wrench_high, 3)]
        )
        assert state_low.shape[0] == static.state_dim
    else:
        state_low = np.zeros(0, np.float32)
        state_high = np.zeros(0, np.float32)

    assert obs_low.shape[0] == static.obs_dim
    assert act_low.shape[0] == static.action_dim

    return EnvParams(
        obs_scale_low=jnp.asarray(obs_low),
        obs_scale_high=jnp.asarray(obs_high),
        state_scale_low=jnp.asarray(state_low),
        state_scale_high=jnp.asarray(state_high),
        action_scale_low=jnp.asarray(act_low),
        action_scale_high=jnp.asarray(act_high),
        pd_stiffness=jnp.asarray(np.tile(tf_model.PD_STIFFNESS, 3)),
        pd_damping=jnp.asarray(np.tile(tf_model.PD_DAMPING, 3)),
        safety_damping=jnp.asarray(np.tile(tf_model.SAFETY_DAMPING, 3)),
        torque_low=jnp.asarray(jtorque_low),
        torque_high=jnp.asarray(jtorque_high),
        dof_default_pos=jnp.asarray(np.tile(tf_model.JOINT_POS_DEFAULT, 3)),
        dof_default_vel=jnp.zeros(9),
        max_com_distance=jnp.asarray(object_dims.max_com_distance_to_center),
        object_min_height=jnp.asarray(object_dims.min_height),
        object_max_height=jnp.asarray(object_dims.max_height),
        object_radius_3d=jnp.asarray(object_dims.radius_3d),
        object_size_z=jnp.asarray(object_dims.size[2]),
        scene_base=_scene_with_arena(
            SceneParams.default(
                object_size=object_dims.size,
                object_density=object_density,
                object_shape="sphere" if static.solver.object_shape == 1 else "box",
            ),
            arena or {},
        ),
        curriculum_level=jnp.zeros((), jnp.float32),
    )


def _scene_with_arena(scene: SceneParams, arena: dict) -> SceneParams:
    """Apply the gym `arena` config onto the scene's wall profile.

    ``arena.profile: "cone"`` (the DEFAULT since round 5) selects the
    measured reference boundary (high_table_boundary.stl: cylinder r=0.1945
    below z=0.034, flaring at dr/dz=0.577 above — scripts/asset_tools.py
    deviation, PARITY.md: max 2.3 mm from the real mesh vs up to 21 mm in
    the object band for the plain cylinder); ``arena.profile: "cylinder"``
    keeps the round-1..4 straight cylinder for continuity with earlier
    published curves and the cylinder-trained shipped policies. Explicit
    ``wall_radius`` / ``wall_slope`` / ``wall_knee_z`` keys override
    individual values."""
    known = {"profile", "wall_radius", "wall_slope", "wall_knee_z"}
    unknown = set(arena) - known
    if unknown:
        # a typo'd key silently training against the wrong arena would be
        # an invisible experiment-invalidating misconfiguration
        raise ValueError(
            f"unknown arena config key(s) {sorted(unknown)}; valid: {sorted(known)}"
        )
    profile = str(arena.get("profile", "cone"))
    if profile == "cone":
        scene = scene.replace(
            wall_radius=jnp.asarray(tf_model.WALL_CONE_BASE_RADIUS),
            wall_slope=jnp.asarray(tf_model.WALL_CONE_SLOPE),
            wall_knee_z=jnp.asarray(tf_model.WALL_CONE_KNEE_Z),
        )
    elif profile != "cylinder":
        raise ValueError(
            f"unknown arena.profile {profile!r}; valid: 'cylinder', 'cone'"
        )
    for key in ("wall_radius", "wall_slope", "wall_knee_z"):
        if key in arena:
            scene = scene.replace(**{key: jnp.asarray(float(arena[key]))})
    return scene


def _broadcast_scene(scene: SceneParams, n: int) -> SceneParams:
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), scene)


# ---------------------------------------------------------------------------
# Sampling (batched; masked application by callers)
#
# All randomness for one reset comes from ONE uniform block (n, 25) and one
# optional normal block (n, 8): a single threefry invocation pair instead of
# ~18 separate draws/splits. Column layout:
#   uniform:  0:18 robot noise | 18:21 object r,theta,yaw | 21:25 goal r,theta,z,yaw
#   normal:   0:4 goal orientation | 4:8 goal angular velocity
# ---------------------------------------------------------------------------

_N_UNIFORM = 25
_N_NORMAL = 8


def _needs_normals(static: EnvStatic) -> bool:
    return static.task_difficulty in (4, 5, 6) or static.goal_rotation_active


def _draw_reset_randoms(static: EnvStatic, key: jax.Array, n: int):
    if _needs_normals(static):
        ku, kn = jax.random.split(key)
        return (
            jax.random.uniform(ku, (n, _N_UNIFORM)),
            jax.random.normal(kn, (n, _N_NORMAL)),
        )
    return jax.random.uniform(key, (n, _N_UNIFORM)), None


def _sample_robot_state(static: EnvStatic, params: EnvParams, u: jax.Array, n: int):
    q = jnp.broadcast_to(params.dof_default_pos, (n, 9))
    qd = jnp.broadcast_to(params.dof_default_vel, (n, 9))
    if static.robot_reset_type == "random":
        noise = 2.0 * u[:, 0:18] - 1.0
        q = q + static.robot_dof_pos_stddev * noise[:, 0:9]
        qd = qd + static.robot_dof_vel_stddev * noise[:, 9:18]
    elif static.robot_reset_type not in ("default", "none"):
        raise ValueError(
            f"Invalid robot reset distribution: {static.robot_reset_type!r}"
        )
    return q, qd


def _sample_object_state(static: EnvStatic, params: EnvParams, u: jax.Array, n: int):
    """Returns (pos 3-tuple, quat 4-tuple) of (N,) component columns."""
    if static.object_reset_type == "default":
        z = jnp.broadcast_to(params.object_min_height, (n,))
        pos = (jnp.zeros(n), jnp.zeros(n), z)
        quat = sampling.default_orientation(n)
    elif static.object_reset_type in ("random", "none"):
        x, y = sampling.random_xy_from_uniform(u[:, 18:20], params.max_com_distance)
        z = jnp.broadcast_to(params.object_size_z / 2, (n,))
        pos = (x, y, z)
        quat = sampling.random_yaw_orientation_from_uniform(u[:, 20])
    else:
        raise ValueError(
            f"Invalid object reset distribution: {static.object_reset_type!r}"
        )
    return pos, tuple(quat[:, i] for i in range(4))


def _ori_difficulty_frac(static: EnvStatic, params: EnvParams, frames: jax.Array):
    """Goal-orientation curriculum fraction in [init, 1]; None when off.

    Success-gated mode reads the host-controlled ``curriculum_level``;
    otherwise the legacy frame-based linear ramp (or None = full
    difficulty, the reference behavior)."""
    if static.curriculum_success_gated:
        t = jnp.clip(params.curriculum_level, 0.0, 1.0)
    elif static.ori_difficulty_anneal_frames > 0.0:
        env_steps = frames.astype(jnp.float32) * static.num_envs
        t = jnp.clip(env_steps / static.ori_difficulty_anneal_frames, 0.0, 1.0)
    else:
        return None
    return static.ori_difficulty_init + t * (1.0 - static.ori_difficulty_init)


def _sample_goal_poses(static: EnvStatic, params: EnvParams,
                       u: jax.Array, norm, n: int, ori_frac=None):
    """Per-difficulty goal sampling (reference trifinger_env.py:1194-1265).

    Returns ``(pose_cm (7, N), angvel_cm (3, N))`` component-major arrays."""
    d = static.task_difficulty
    u_xy = u[:, 21:23]
    u_z = u[:, 23]
    u_yaw = u[:, 24]
    if d == -1:
        x, y = sampling.random_xy_from_uniform(u_xy, params.max_com_distance)
        z = jnp.broadcast_to(params.object_size_z / 2, (n,))
        ori = sampling.random_yaw_orientation_from_uniform(u_yaw)
    elif d == 1:
        x, y = sampling.random_xy_from_uniform(u_xy, params.max_com_distance)
        z = jnp.broadcast_to(params.object_size_z / 2, (n,))
        ori = sampling.default_orientation(n)
    elif d == 2:
        x = jnp.zeros(n)
        y = jnp.zeros(n)
        z = jnp.broadcast_to(params.object_min_height + 0.05, (n,))
        ori = sampling.default_orientation(n)
    elif d == 3:
        x, y = sampling.random_xy_from_uniform(u_xy, params.max_com_distance)
        z = sampling.random_z_from_uniform(
            u_z, params.object_min_height, params.object_max_height
        )
        ori = sampling.default_orientation(n)
    elif d in (4, 5):
        x, y = sampling.random_xy_from_uniform(u_xy, params.max_com_distance)
        z = sampling.random_z_from_uniform(
            u_z, params.object_radius_3d, params.object_max_height
        )
        ori = sampling.random_orientation_from_normal(norm[:, 0:4])
    elif d == 6:
        x = jnp.zeros(n)
        y = jnp.zeros(n)
        z = jnp.broadcast_to(params.object_min_height + 0.05, (n,))
        ori = sampling.random_orientation_from_normal(norm[:, 0:4])
    else:
        raise ValueError(f"Invalid difficulty index for task: {d}.")
    if ori_frac is not None and d in (4, 5, 6):
        ori = sampling.scale_orientation_swing(ori, ori_frac)
    pose_cm = jnp.stack([x, y, z, ori[:, 0], ori[:, 1], ori[:, 2], ori[:, 3]])
    if static.goal_rotation_active:
        angvel = sampling.random_angular_vel_from_normal(
            norm[:, 4:8], static.goal_rate_magnitude
        )
        angvel_cm = angvel.T
    else:
        angvel_cm = jnp.zeros((3, n))
    return pose_cm, angvel_cm


# ---------------------------------------------------------------------------
# Torque pipeline (reference _pre_step, trifinger_env.py:442-498)
# ---------------------------------------------------------------------------


def compute_torque(
    static: EnvStatic, params: EnvParams,
    action_buf: jax.Array, q: jax.Array, qd: jax.Array,
    pd_scale: jax.Array | None = None,
) -> jax.Array:
    if static.normalize_action:
        action_tf = unscale_transform(
            action_buf, params.action_scale_low, params.action_scale_high
        )
    else:
        action_tf = action_buf

    if pd_scale is None:
        kp_s = kd_s = 1.0
    else:
        kp_s, kd_s = pd_scale[..., 0:1], pd_scale[..., 1:2]

    if static.command_mode == "torque":
        computed = action_tf
    elif static.command_mode == "position":
        computed = (
            kp_s * params.pd_stiffness * (action_tf - q)
            - kd_s * params.pd_damping * qd
        )
    elif static.command_mode == "position_impedance":
        desired = action_tf[..., 0:9]
        stiffness = action_tf[..., 9:18]
        computed = stiffness * (desired - q) - kd_s * params.pd_damping * qd
    else:
        raise ValueError(f"Invalid command mode: {static.command_mode!r}")

    applied = saturate(computed, params.torque_low, params.torque_high)
    if static.apply_safety_damping:
        applied = applied - params.safety_damping * qd
        applied = saturate(applied, params.torque_low, params.torque_high)
    return applied


# ---------------------------------------------------------------------------
# Simulation + observation assembly
# ---------------------------------------------------------------------------

_batched_physics_step = jax.vmap(physics_step, in_axes=(0, 0, 0, None, None))
_batched_physics_step_v2 = jax.vmap(physics_step_v2, in_axes=(0, 0, 0, None, None))


def _simulate(static: EnvStatic, physics: PhysicsState, tau: jax.Array,
              scene: SceneParams, n_calls: int):
    if static.engine == "pallas":
        from leibnizgym_tpu.ops.pallas_engine import physics_step_pallas

        step = lambda ph, t, sc, cfg, dt: physics_step_pallas(ph, t, sc, cfg, dt)  # noqa: E731
    elif static.engine == "soa":
        step = _batched_physics_step_v2
    else:
        step = _batched_physics_step
    wrench = jnp.zeros((tau.shape[0], 3, 6))
    for _ in range(n_calls):
        physics, wrench = step(physics, tau, scene, static.solver, static.dt)
    return physics, wrench


def _fingertip_components(physics: PhysicsState):
    """Fingertip state components — 3-tuple of (pos3, quat4, lin3, ang3)
    component tuples of (N,) columns, via the scalar FK path (engine_v2
    discipline: no (N, 3, 13) lane-padded tensors). The scalar FK is pure
    kinematics from q/qd and therefore engine-independent."""
    from leibnizgym_tpu.ops.engine_v2 import fingertip_components_v2

    q_cols = tuple(physics.q[:, i] for i in range(9))
    qd_cols = tuple(physics.qd[:, i] for i in range(9))
    return fingertip_components_v2(q_cols, qd_cols)


def _object_components(physics: PhysicsState):
    """(pos3, quat4, linvel3, angvel3) component tuples of the object."""
    return (
        tuple(physics.cube_pos[:, i] for i in range(3)),
        tuple(physics.cube_quat[:, i] for i in range(4)),
        tuple(physics.cube_linvel[:, i] for i in range(3)),
        tuple(physics.cube_angvel[:, i] for i in range(3)),
    )


_KP_SIGN_TUPLES = tuple(
    (sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)
)


def _cube_keypoint_cols(pos, quat, half):
    """24 component columns: 8 cube-corner world positions, corner-major —
    all inputs component tuples of (N,) columns."""
    from leibnizgym_tpu.envs.trifinger.rewards import quat_rotate_c

    cols = []
    for sx, sy, sz in _KP_SIGN_TUPLES:
        local = (sx * half[0], sy * half[1], sz * half[2])
        cx, cy, cz = quat_rotate_c(quat, local)
        cols.extend((pos[0] + cx, pos[1] + cy, pos[2] + cz))
    return cols


def _assemble_obs_raw(
    static: EnvStatic, state_scene: SceneParams, physics: PhysicsState,
    obj_pos, obj_quat, goal_pos, goal_quat, action_buf: jax.Array,
):
    """Unnormalized observation (N, 41|50|89|98): [q | qd | object pose |
    goal pose | action (| object keypoints | goal keypoints)]. Component
    columns are stacked once at the end — the only (N, obs_dim) tensor
    the obs path materializes."""
    pose_cols = list(obj_pos) + list(obj_quat) + list(goal_pos) + list(goal_quat)
    if static.use_keypoint_obs:
        half = tuple(state_scene.cube_half_extents[:, i] for i in range(3))
        kp_cols = _cube_keypoint_cols(obj_pos, obj_quat, half) + \
            _cube_keypoint_cols(goal_pos, goal_quat, half)
        parts = [physics.q, physics.qd, jnp.stack(pose_cols, axis=-1),
                 action_buf, jnp.stack(kp_cols, axis=-1)]
    else:
        parts = [physics.q, physics.qd, jnp.stack(pose_cols, axis=-1), action_buf]
    return jnp.concatenate(parts, axis=-1)


def _fill_observations(
    static: EnvStatic, params: EnvParams, physics: PhysicsState,
    obj_pos, obj_quat, goal_pos, goal_quat, action_buf: jax.Array,
    scene: SceneParams,
):
    obs = _assemble_obs_raw(
        static, scene, physics, obj_pos, obj_quat, goal_pos, goal_quat, action_buf
    )
    if static.normalize_obs:
        obs = scale_transform(obs, params.obs_scale_low, params.obs_scale_high)
    return obs


def _fill_states(
    static: EnvStatic, params: EnvParams, obs_raw: jax.Array,
    obj_linvel, obj_angvel, tips,
    applied_torque: jax.Array, tip_wrench: jax.Array,
):
    """Asymmetric 113-dim privileged state (reference trifinger_env.py:1021-1051).

    ``obs_raw`` must be the *unnormalized* observation (the reference copies
    the obs buffer before normalization happens in place). ``tips`` is the
    fingertip component structure from :func:`_fingertip_components`;
    ``tip_wrench`` is (N, 18)."""
    if not static.asymmetric_obs:
        return jnp.zeros(obs_raw.shape[:-1] + (0,))
    tip_cols = []
    for (tp, tq, tl, ta) in tips:
        tip_cols.extend(tp)
        tip_cols.extend(tq)
        tip_cols.extend(tl)
        tip_cols.extend(ta)
    states = jnp.concatenate(
        [
            obs_raw,
            jnp.stack(list(obj_linvel) + list(obj_angvel), axis=-1),
            jnp.stack(tip_cols, axis=-1),
            applied_torque,
            tip_wrench,
        ],
        axis=-1,
    )
    if static.normalize_obs:
        states = scale_transform(states, params.state_scale_low, params.state_scale_high)
    return states


# ---------------------------------------------------------------------------
# Reset / step cores
# ---------------------------------------------------------------------------


def _masked_full_reset(
    static: EnvStatic, params: EnvParams, state: EnvState,
    mask: jax.Array, key: jax.Array,
) -> EnvState:
    """Functionally apply a full reset to envs selected by ``mask`` (N,)."""
    n = static.num_envs
    if static.dr_activate:
        key, k_dr = jax.random.split(key)
    u, norm = _draw_reset_randoms(static, key, n)
    q_s, qd_s = _sample_robot_state(static, params, u, n)
    obj_pos_s, obj_quat_s = _sample_object_state(static, params, u, n)
    goal_cm_s, angvel_cm_s = _sample_goal_poses(
        static, params, u, norm, n,
        ori_frac=_ori_difficulty_frac(static, params, state.frames),
    )

    m1 = mask[:, None]
    mrow = mask[None, :]
    physics = state.physics
    if static.robot_reset_type != "none":
        physics = physics.replace(
            q=jnp.where(m1, q_s, physics.q),
            qd=jnp.where(m1, qd_s, physics.qd),
        )
    if static.object_reset_type != "none":
        physics = physics.replace(
            cube_pos=jnp.where(m1, jnp.stack(obj_pos_s, axis=-1), physics.cube_pos),
            cube_quat=jnp.where(m1, jnp.stack(obj_quat_s, axis=-1), physics.cube_quat),
            cube_linvel=jnp.where(m1, 0.0, physics.cube_linvel),
            cube_angvel=jnp.where(m1, 0.0, physics.cube_angvel),
        )

    # reference quirk: a full reset refreshes the object history slot with
    # the sampled pose (so this step's delta rewards see prev = sampled), but
    # leaves the fingertip history stale (trifinger_env.py:373-423 resets
    # only the deques it writes)
    obj_posquat_prev_cm = state.obj_posquat_prev_cm
    if static.object_reset_type != "none":
        obj_posquat_prev_cm = jnp.where(
            mrow, jnp.stack(obj_pos_s + obj_quat_s), obj_posquat_prev_cm
        )

    scene = state.scene
    pd_scale = state.pd_scale
    if static.dr_activate:
        from leibnizgym_tpu.dr import sample_scene_params  # local import: avoid cycle

        k_dr, k_pd = jax.random.split(k_dr)
        scene_s = sample_scene_params(
            k_dr, n, params.scene_base,
            ranges={name: (lo, hi) for name, lo, hi in static.dr_ranges},
        )
        scene = jax.tree.map(
            lambda new, old: jnp.where(
                mask.reshape((n,) + (1,) * (new.ndim - 1)), new, old
            ),
            scene_s, scene,
        )
        lo, hi = static.dr_pd_gain_scale
        pd_s = jax.random.uniform(k_pd, (n, 2), minval=lo, maxval=hi)
        pd_scale = jnp.where(mask[:, None], pd_s, pd_scale)

    return state.replace(
        physics=physics,
        scene=scene,
        pd_scale=pd_scale,
        goal_pose_cm=jnp.where(mrow, goal_cm_s, state.goal_pose_cm),
        goal_angvel_cm=jnp.where(mrow, angvel_cm_s, state.goal_angvel_cm),
        obj_posquat_prev_cm=obj_posquat_prev_cm,
        reset_buf=jnp.where(mask, False, state.reset_buf),
        steps_count=jnp.where(mask, 0, state.steps_count),
        successes=jnp.where(mask, 0, state.successes),
    )


def _masked_goal_reset(
    static: EnvStatic, params: EnvParams, state: EnvState,
    mask: jax.Array, key: jax.Array,
) -> EnvState:
    n = static.num_envs
    u, norm = _draw_reset_randoms(static, key, n)
    goal_cm_s, angvel_cm_s = _sample_goal_poses(
        static, params, u, norm, n,
        ori_frac=_ori_difficulty_frac(static, params, state.frames),
    )
    mrow = mask[None, :]
    return state.replace(
        goal_pose_cm=jnp.where(mrow, goal_cm_s, state.goal_pose_cm),
        goal_angvel_cm=jnp.where(mrow, angvel_cm_s, state.goal_angvel_cm),
        goal_reset_buf=jnp.where(mask, False, state.goal_reset_buf),
    )


def _check_termination(static: EnvStatic, obj_pos, obj_quat, goal_pos,
                       goal_quat, reward, goal_reset_buf, successes, info,
                       env_steps_count=None, curriculum_level=None):
    """Success termination (+bonus) — reference trifinger_env.py:1053-1099.

    With ``tolerance_anneal_frames > 0`` the tolerances ramp linearly from
    their ``*_init`` values to the final values over env-steps — the
    curriculum mechanism for 6-DoF reposing (early loose successes provide
    the bonus gradient that fixed tight tolerances never fire). In
    success-gated mode (``static.curriculum_success_gated``) the same lerp
    is driven by the host-controlled ``curriculum_level`` instead of
    frames, so the difficulty can hold or retreat."""
    pos_tol = jnp.asarray(static.position_tolerance)
    ori_tol = jnp.asarray(static.orientation_tolerance)
    if static.curriculum_success_gated and curriculum_level is not None:
        frac = jnp.clip(curriculum_level, 0.0, 1.0)
    elif static.tolerance_anneal_frames > 0.0 and env_steps_count is not None:
        frac = jnp.clip(env_steps_count / static.tolerance_anneal_frames, 0.0, 1.0)
    else:
        frac = None
    if frac is not None:
        pos_tol = static.position_tolerance_init + frac * (
            static.position_tolerance - static.position_tolerance_init
        )
        ori_tol = static.orientation_tolerance_init + frac * (
            static.orientation_tolerance - static.orientation_tolerance_init
        )
        info["env/position_tolerance"] = pos_tol
        info["env/orientation_tolerance"] = ori_tol
    dx = goal_pos[0] - obj_pos[0]
    dy = goal_pos[1] - obj_pos[1]
    dz = goal_pos[2] - obj_pos[2]
    pos_dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    goal_position_reset = pos_dist <= pos_tol
    info["env/current_position_goal/count"] = jnp.sum(goal_position_reset)
    ori_dist = quat_diff_rad_c(obj_quat, goal_quat)
    goal_orientation_reset = ori_dist <= ori_tol
    info["env/current_orientation_goal/count"] = jnp.sum(goal_orientation_reset)
    info["env/pos_dist_mean"] = jnp.mean(pos_dist)
    info["env/ori_dist_mean"] = jnp.mean(ori_dist)
    if static.curriculum_success_gated and curriculum_level is not None:
        # strict-tolerance telemetry: fraction of envs meeting the FINAL
        # tolerances right now, independent of the loosened curriculum
        # tolerances — the honest capability metric for best-checkpoint
        # selection and the RESULTS.md success curve
        strict = (pos_dist <= static.position_tolerance) & (
            ori_dist <= static.orientation_tolerance
        )
        info["env/strict_success_frac"] = jnp.mean(strict.astype(jnp.float32))
        info["env/curriculum_level"] = jnp.clip(curriculum_level, 0.0, 1.0)

    if static.task_difficulty < 4:
        completion = goal_position_reset
    elif static.task_difficulty == 4:
        completion = goal_position_reset & goal_orientation_reset
    else:
        completion = goal_orientation_reset

    if static.termination_activate:
        reward = reward + static.termination_bonus * completion.astype(reward.dtype)
        goal_reset_buf = completion
        successes = successes + completion.astype(successes.dtype)
    else:
        # reference quirk: logical_and makes _successes a BOOL (0/1), not a
        # count, when termination is off (trifinger_env.py:1096)
        successes = (goal_reset_buf & (successes > 0)).astype(successes.dtype)
    info["env/average_consecutive_success"] = jnp.mean(successes.astype(jnp.float32))
    return reward, goal_reset_buf, successes, info


def env_step(static: EnvStatic, params: EnvParams, state: EnvState,
             action: jax.Array):
    """One MDP step for all envs (reference env_base.py:345-401 order)."""
    n = static.num_envs
    info: Dict[str, jax.Array] = {}
    if static.obs_noise_std > 0.0:
        key, k_reset, k_goal, k_obs = jax.random.split(state.key, 4)
    else:
        # keep the 3-way split so noise-free runs stay bit-identical with
        # earlier versions (golden-trajectory regression)
        key, k_reset, k_goal = jax.random.split(state.key, 3)
        k_obs = None
    state = state.replace(key=key)

    # reset envs first (observations need post-reset physics; see the note at
    # env_base.py:370-373)
    reset_mask = state.reset_buf
    goal_mask = state.goal_reset_buf
    action_buf = jnp.where(reset_mask[:, None], 0.0, action)
    state = _masked_full_reset(static, params, state, reset_mask, k_reset)
    state = _masked_goal_reset(static, params, state, goal_mask, k_goal)

    # pre-step: PD/torque pipeline
    tau = compute_torque(
        static, params, action_buf, state.physics.q, state.physics.qd,
        state.pd_scale,
    )

    # physics
    physics, tip_wrench6 = _simulate(
        static, state.physics, tau, state.scene, static.control_decimation
    )
    tip_wrench = tip_wrench6.reshape(n, 18)
    frames = state.frames + static.control_decimation

    # goal movement (reference __update_goal_movement_pre/post: the goal body
    # integrates its angular velocity inside the sim). Component-form
    # first-order update q' = normalize(q + 0.5*dt * omega_quat * q) — no
    # lane-padded (N, 4) round trip in the hot step (see the EnvState note)
    goal_pose_cm = state.goal_pose_cm
    if static.goal_rotation_active:
        h = static.dt * static.control_decimation
        q = tuple(goal_pose_cm[3 + i] for i in range(4))
        wx, wy, wz = (state.goal_angvel_cm[i] for i in range(3))
        dqx, dqy, dqz, dqw = _qmul_c((wx, wy, wz, jnp.zeros_like(wx)), q)
        nq = (q[0] + 0.5 * h * dqx, q[1] + 0.5 * h * dqy,
              q[2] + 0.5 * h * dqz, q[3] + 0.5 * h * dqw)
        inv = jax.lax.rsqrt(nq[0] ** 2 + nq[1] ** 2 + nq[2] ** 2 + nq[3] ** 2)
        goal_pose_cm = jnp.concatenate(
            [goal_pose_cm[0:3], jnp.stack([c * inv for c in nq])], axis=0
        )
    goal_pos = tuple(goal_pose_cm[i] for i in range(3))
    goal_quat = tuple(goal_pose_cm[i] for i in range(3, 7))

    # post-step: rewards + termination on component columns (see the EnvState
    # layout note — no lane-padded (N, 3, 13) intermediates)
    tips = _fingertip_components(physics)
    obj_pos, obj_quat, obj_linvel, obj_angvel = _object_components(physics)
    tip_pos = tuple(t[0] for t in tips)
    tip_pos_prev = tuple(
        tuple(state.tip_pos_prev_cm[3 * f + c] for c in range(3))
        for f in range(3)
    )
    obj_pos_prev = tuple(state.obj_posquat_prev_cm[i] for i in range(3))
    obj_quat_prev = tuple(state.obj_posquat_prev_cm[i] for i in range(3, 7))

    # cast BEFORE multiplying: frames * n in int32 overflows past 2.1B env
    # steps and silently flips every scheduled reward window (float32 spacing
    # at 1e10 is ~1e3 — irrelevant vs the 1e7-scale thresholds)
    env_steps_count = frames.astype(jnp.float32) * n
    half_cols = tuple(state.scene.cube_half_extents[:, i] for i in range(3))
    reward, term_values = compute_rewards_c(
        static.reward_spec_dict(),
        static.dt,
        env_steps_count,
        tip_pos, tip_pos_prev,
        obj_pos, obj_quat, obj_pos_prev, obj_quat_prev,
        goal_pos, goal_quat,
        half_extents=half_cols,
    )
    for name, value in term_values.items():
        info[f"env/rewards/{name}"] = jnp.mean(value)

    reward, goal_reset_buf, successes, info = _check_termination(
        static, obj_pos, obj_quat, goal_pos, goal_quat, reward,
        state.goal_reset_buf, state.successes, info, env_steps_count,
        curriculum_level=params.curriculum_level,
    )

    # timeout
    steps_count = state.steps_count + 1
    if static.episode_length:
        timeout = steps_count >= static.episode_length
        reset_buf = state.reset_buf | timeout
    else:
        reset_buf = state.reset_buf

    if static.dones_mode == "and":
        dones = reset_buf & goal_reset_buf
    else:
        dones = reset_buf | goal_reset_buf

    obs_raw = _assemble_obs_raw(
        static, state.scene, physics, obj_pos, obj_quat, goal_pos, goal_quat,
        action_buf,
    )
    obs = (
        scale_transform(obs_raw, params.obs_scale_low, params.obs_scale_high)
        if static.normalize_obs
        else obs_raw
    )
    if static.obs_noise_std > 0.0:
        noise = static.obs_noise_std * jax.random.normal(k_obs, obs.shape)
        if not static.normalize_obs:
            # std is defined in normalized units; map to raw units
            noise = noise * (params.obs_scale_high - params.obs_scale_low) * 0.5
        obs = obs + noise
    states = _fill_states(
        static, params, obs_raw, obj_linvel, obj_angvel, tips, tau, tip_wrench
    )

    new_state = state.replace(
        physics=physics,
        goal_pose_cm=goal_pose_cm,
        action_buf=action_buf,
        applied_torque=tau,
        tip_wrench=tip_wrench,
        reset_buf=reset_buf,
        goal_reset_buf=goal_reset_buf,
        steps_count=steps_count,
        successes=successes,
        tip_pos_prev_cm=jnp.stack([tip_pos[f][c] for f in range(3) for c in range(3)]),
        obj_posquat_prev_cm=jnp.stack(list(obj_pos) + list(obj_quat)),
        frames=frames,
    )
    return new_state, obs, states, reward, dones, info


def env_reset(static: EnvStatic, params: EnvParams, key: jax.Array):
    """Full reset of all envs (reference env_base.py:322-343: reset, apply a
    zero-action pre-step, ONE simulate call, fill observations)."""
    n = static.num_envs
    key, k_init = jax.random.split(key)
    scene = _broadcast_scene(params.scene_base, n)
    state = EnvState(
        physics=PhysicsState.default((n,)),
        scene=scene,
        pd_scale=jnp.ones((n, 2)),
        goal_pose_cm=jnp.tile(
            jnp.array([[0.0], [0.0], [0.0], [0.0], [0.0], [0.0], [1.0]]), (1, n)
        ),
        goal_angvel_cm=jnp.zeros((3, n)),
        action_buf=jnp.zeros((n, static.action_dim)),
        applied_torque=jnp.zeros((n, 9)),
        tip_wrench=jnp.zeros((n, 18)),
        reset_buf=jnp.zeros(n, bool),
        goal_reset_buf=jnp.zeros(n, bool),
        steps_count=jnp.zeros(n, jnp.int32),
        successes=jnp.zeros(n, jnp.int32),
        tip_pos_prev_cm=jnp.zeros((9, n)),
        obj_posquat_prev_cm=jnp.zeros((7, n)),
        frames=jnp.zeros((), jnp.int32),
        key=key,
    )
    state = _masked_full_reset(
        static, params, state, jnp.ones(n, bool), k_init
    )
    tau = compute_torque(
        static, params, state.action_buf, state.physics.q, state.physics.qd,
        state.pd_scale,
    )
    physics, tip_wrench6 = _simulate(static, state.physics, tau, state.scene, 1)
    frames = state.frames + 1

    tips = _fingertip_components(physics)
    obj_pos, obj_quat, _, _ = _object_components(physics)
    goal_pos = tuple(state.goal_pose_cm[i] for i in range(3))
    goal_quat = tuple(state.goal_pose_cm[i] for i in range(3, 7))
    obs = _fill_observations(
        static, params, physics, obj_pos, obj_quat, goal_pos, goal_quat,
        state.action_buf, state.scene,
    )
    if static.obs_noise_std > 0.0:
        key, k_obs = jax.random.split(state.key)
        noise = static.obs_noise_std * jax.random.normal(k_obs, obs.shape)
        if not static.normalize_obs:
            noise = noise * (params.obs_scale_high - params.obs_scale_low) * 0.5
        obs = obs + noise
        state = state.replace(key=key)
    state = state.replace(
        physics=physics,
        applied_torque=tau,
        tip_wrench=tip_wrench6.reshape(n, 18),
        tip_pos_prev_cm=jnp.stack(
            [tips[f][0][c] for f in range(3) for c in range(3)]
        ),
        obj_posquat_prev_cm=jnp.stack(list(obj_pos) + list(obj_quat)),
        frames=frames,
    )
    return state, obs


# ---------------------------------------------------------------------------
# Stateful convenience wrapper (reference-compatible interface)
# ---------------------------------------------------------------------------


from leibnizgym_tpu.envs.env_base import EnvBase


class TrifingerEnv(EnvBase):
    """Stateful wrapper with the reference's public surface
    (``reset()``, ``step(action)``, buffer properties, ``dump_config``).

    The functional core (`env_step` / `env_reset`) is jitted once per config;
    pass ``device=`` a jax.Device to pin placement (optional).
    """

    def __init__(self, config: Optional[dict] = None, device=None,
                 verbose: bool = True, visualize: bool = False):
        merged = merged_dict(dict(SIM_DEFAULT_CONFIG_DICT), TRIFINGER_DEFAULT_CONFIG_DICT)
        if config is not None:
            merged = merged_dict(merged, config)
        if merged["asymmetric_obs"]:
            merged["enable_ft_sensors"] = True

        # configurable object dimensions (realizes the reference TODO at
        # trifinger_env.py:139-143; scalar = cube edge / sphere diameter,
        # [x, y, z] = cuboid)
        object_type = str(merged.get("object_type", "cube"))
        object_size = merged.get(
            "object_size",
            2 * tf_model.BALL_RADIUS if object_type == "sphere" else 0.065,
        )
        dims_cls = SphereObject if object_type == "sphere" else CuboidalObject
        self._object_dims = dims_cls(
            float(object_size) if np.isscalar(object_size)
            else tuple(float(s) for s in object_size)
        )
        self.static = build_static(merged)
        density = merged.get("object_density")
        self.params = build_params(
            self.static, self._object_dims, arena=merged.get("arena"),
            object_density=None if density is None else float(density),
        )

        obs_spec = {
            "robot_q": 9, "robot_u": 9, "object_q": 7, "object_q_des": 7,
            "command": self.static.action_dim,
        }
        if self.static.use_keypoint_obs:
            obs_spec["object_keypoints"] = 24
            obs_spec["goal_keypoints"] = 24
        action_spec = {"command": self.static.action_dim}
        if self.static.asymmetric_obs:
            state_spec = {
                **obs_spec,
                "object_u": 6, "fingertip_state": 39, "robot_a": 9,
                "fingertip_wrench": 18,
            }
        else:
            state_spec = {}

        EnvBase.__init__(
            self, obs_spec, action_spec, state_spec, merged,
            device=device, verbose=False, visualize=visualize,
        )
        self.verbose = verbose

        self._step_fn = jax.jit(env_step, static_argnums=0)
        self._reset_fn = jax.jit(env_reset, static_argnums=0)

        if verbose:
            print_info(
                f"TrifingerEnv[TPU]: N={self.static.num_envs} "
                f"difficulty={self.static.task_difficulty} "
                f"obs={self.static.obs_dim} states={self.static.state_dim} "
                f"actions={self.static.action_dim}"
            )

    # -- operations ---------------------------------------------------------

    def reset(self):
        self._key, sub = jax.random.split(self._key)
        self._state, obs = self._reset_fn(self.static, self.params, sub)
        self._last = (obs, None, None, None, {})
        return obs

    def step(self, action):
        action = jnp.asarray(action)
        expected = (self.static.num_envs, self.static.action_dim)
        if tuple(action.shape) != expected:
            raise ValueError(
                f"Invalid shape for tensor `action`. Input: {tuple(action.shape)}"
                f" != {expected}."
            )
        self._state, obs, states, reward, dones, info = self._step_fn(
            self.static, self.params, self._state, action
        )
        self._last = (obs, states, reward, dones, info)
        return obs, reward, dones, info

    def get_state(self):
        return self._last[1]
