"""Modular reward terms for the TriFinger task.

TPU-native re-design of the reference's TorchScript reward modules
(/root/reference/leibnizgym/envs/trifinger/rewards.py:20-263): each term is a
pure batched function plus a static spec dataclass (weight / activation /
schedule). Terms compose inside a single jitted step — XLA fuses them into the
surrounding elementwise pipeline, so there is no per-term kernel overhead.

Schedule semantics match the reference exactly:
  - ``object_dist`` / ``object_rot`` / ``finger_reach_object_rate`` use a
    *window indicator* (1 inside [sched_start, sched_end], 0 outside)
    (reference rewards.py:58, 125, 231).
  - ``object_rot_delta`` uses *linear interpolation* of the schedule
    (reference rewards.py:170).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.utils.math import quat_diff_rad


@dataclasses.dataclass(frozen=True)
class RewardTermSpec:
    """Static configuration of one reward term (hashable; safe as jit static)."""

    name: str
    activate: bool
    weight: float
    # optional knobs (used by a subset of terms)
    norm_p: int = 2
    epsilon: float = 0.1
    scale: float = 1.0
    sched_start: float = 0.0
    sched_end: float = 0.0

    @property
    def sched_enabled(self) -> bool:
        return self.sched_start != self.sched_end

    @classmethod
    def from_config(cls, name: str, conf: dict) -> "RewardTermSpec":
        """Build a spec from a reference-style config dict for one term."""
        return cls(
            name=name,
            activate=bool(conf.get("activate", False)),
            weight=float(conf.get("weight", 0.0)),
            norm_p=int(conf.get("norm_p", 2)),
            epsilon=float(conf.get("epsilon", 0.1)),
            scale=float(conf.get("scale", 1.0)),
            sched_start=float(
                conf.get("thresh_sched_start", conf.get("linear_schedule_start", 0.0))
            ),
            sched_end=float(
                conf.get("thresh_sched_end", conf.get("linear_schedule_end", 0.0))
            ),
        )


def lgsk_kernel(x: jax.Array, scale: float = 50.0) -> jax.Array:
    """Logistic kernel bounding input to (0, 0.25] (arXiv:1901.08652, p.15)."""
    scaled = x * scale
    return 1.0 / (jnp.exp(scaled) + 2.0 + jnp.exp(-scaled))


def _window_sched(spec: RewardTermSpec, step: jax.Array) -> jax.Array:
    """Indicator of ``step`` in [sched_start, sched_end] (1.0 if disabled)."""
    if not spec.sched_enabled:
        return jnp.asarray(1.0)
    inside = (step >= spec.sched_start) & (step <= spec.sched_end)
    return inside.astype(jnp.float32)


def _linear_sched(spec: RewardTermSpec, step: jax.Array) -> jax.Array:
    """Linear ramp of ``step`` across [sched_start, sched_end] (1.0 if disabled)."""
    if not spec.sched_enabled:
        return jnp.asarray(1.0)
    val = (step - spec.sched_start) / (spec.sched_end - spec.sched_start)
    return jnp.clip(val, 0.0, 1.0)


def object_dist(
    spec: RewardTermSpec, dt: float, step: jax.Array,
    object_state: jax.Array, goal_pose: jax.Array,
) -> jax.Array:
    """Logistic-kernel reward for object-to-goal distance (reference :54-63)."""
    sched = _window_sched(spec, step)
    dist = jnp.linalg.norm(object_state[..., 0:3] - goal_pose[..., 0:3], axis=-1)
    return spec.weight * dt * sched * lgsk_kernel(dist)


def object_move(
    spec: RewardTermSpec,
    object_state: jax.Array, last_object_state: jax.Array, goal_pose: jax.Array,
) -> jax.Array:
    """Delta of object-to-goal distance between steps (reference :76-91)."""
    curr = jnp.linalg.norm(object_state[..., 0:3] - goal_pose[..., 0:3], axis=-1)
    prev = jnp.linalg.norm(last_object_state[..., 0:3] - goal_pose[..., 0:3], axis=-1)
    return spec.weight * (curr - prev)


def object_rot(
    spec: RewardTermSpec, dt: float, step: jax.Array,
    object_state: jax.Array, goal_pose: jax.Array,
) -> jax.Array:
    """Inverse-angle orientation reward (reference :120-139)."""
    sched = _window_sched(spec, step)
    angles = quat_diff_rad(object_state[..., 3:7], goal_pose[..., 3:7])
    rot_rew = sched * dt / (spec.scale * jnp.abs(angles) + spec.scale)
    return spec.weight * rot_rew


def object_rot_delta(
    spec: RewardTermSpec, dt: float, step: jax.Array,
    object_state: jax.Array, last_object_state: jax.Array, goal_pose: jax.Array,
) -> jax.Array:
    """Delta of orientation error between steps, linearly scheduled (reference :166-184)."""
    sched = _linear_sched(spec, step)
    last_angles = jnp.abs(quat_diff_rad(last_object_state[..., 3:7], goal_pose[..., 3:7]))
    angles = jnp.abs(quat_diff_rad(object_state[..., 3:7], goal_pose[..., 3:7]))
    return spec.weight * sched * (angles - last_angles)


def finger_reach_object_rate(
    spec: RewardTermSpec, step: jax.Array,
    fingertip_state: jax.Array, last_fingertip_state: jax.Array,
    object_state: jax.Array, last_object_state: jax.Array,
) -> jax.Array:
    """Delta of per-finger distance to the object centroid (reference :205-235).

    Shapes: fingertip_state (..., 3, 13), object_state (..., 13).
    """
    ord_p = spec.norm_p
    curr = jnp.linalg.norm(
        fingertip_state[..., :, 0:3] - object_state[..., None, 0:3], ord=ord_p, axis=-1
    )
    prev = jnp.linalg.norm(
        last_fingertip_state[..., :, 0:3] - last_object_state[..., None, 0:3],
        ord=ord_p, axis=-1,
    )
    sched = _window_sched(spec, step)
    return spec.weight * sched * jnp.sum(curr - prev, axis=-1)


def finger_move_penalty(
    spec: RewardTermSpec, dt: float,
    fingertip_state: jax.Array, last_fingertip_state: jax.Array,
) -> jax.Array:
    """Squared fingertip velocity penalty (reference :249-263)."""
    fingertip_vel = (fingertip_state[..., :, 0:3] - last_fingertip_state[..., :, 0:3]) / dt
    sq = jnp.square(fingertip_vel)
    return spec.weight * jnp.sum(sq.reshape(sq.shape[:-2] + (9,)), axis=-1)


# numpy so importing never touches the accelerator backend
_KP_SIGNS = np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]
)


def keypoint_dist(
    spec: RewardTermSpec, dt: float, step: jax.Array,
    object_state: jax.Array, goal_pose: jax.Array, half_extents: jax.Array,
) -> jax.Array:
    """Cube-corner keypoint reward (TPU-build extension, inactive by default).

    Mean logistic-kernel reward over the 8 corner-pair distances between the
    object and goal poses — a single smooth signal that captures position AND
    orientation jointly. This is the fix the TriFinger literature applies for
    6-DoF reposing where separate pos/rot terms fail to shape rotation
    (the reference's own difficulty-4 preset is annotated as experimental).
    ``spec.scale`` is the lgsk kernel sharpness (default 1.0 -> use 30).
    """
    from leibnizgym_tpu.utils.math import quat_rotate

    sched = _window_sched(spec, step)
    corners_local = _KP_SIGNS * half_extents[..., None, :]
    obj_c = object_state[..., None, 0:3] + quat_rotate(
        object_state[..., None, 3:7], corners_local
    )
    goal_c = goal_pose[..., None, 0:3] + quat_rotate(
        goal_pose[..., None, 3:7], corners_local
    )
    dists = jnp.linalg.norm(obj_c - goal_c, axis=-1)  # (..., 8)
    kernel_scale = spec.scale if spec.scale != 1.0 else 30.0
    return spec.weight * dt * sched * jnp.mean(
        lgsk_kernel(dists, scale=kernel_scale), axis=-1
    )


# Names of terms, in the aggregation order used by the reference env
# (trifinger_env.py:511-550).
REWARD_TERM_NAMES = (
    "finger_reach_object_rate",
    "finger_move_penalty",
    "object_dist",
    "object_rot",
    "object_rot_delta",
    "object_move",
    "keypoint_dist",  # TPU-build extension, inactive unless configured
)


def build_reward_specs(reward_config: Dict[str, dict]) -> Dict[str, RewardTermSpec]:
    """Create all specs from the env's ``reward_terms`` config section.
    Terms missing from the config are created inactive."""
    return {
        name: RewardTermSpec.from_config(
            name, reward_config.get(name, {"activate": False})
        )
        for name in REWARD_TERM_NAMES
    }


# ---------------------------------------------------------------------------
# Component (SoA) API — identical math on (N,) component arrays.
#
# The AoS functions above operate on (..., 13)/(..., 3, 13) state tensors
# whose minor dims pad to full TPU lanes (13 -> 128); the env layer's hot
# step uses this component form instead so every intermediate is an (N,)
# array (the engine_v2 discipline). The AoS API stays as the readable oracle
# and for the hand-computed-value unit tests; test_rewards.py asserts the
# two paths agree.
# ---------------------------------------------------------------------------


def _qmul_c(a, b):
    """Hamilton product on (x, y, z, w) component 4-tuples."""
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return (
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    )


def quat_diff_rad_c(qa, qb):
    """2 * asin(clamp(|vec(qa * conj(qb))|, max=1)) on component tuples."""
    bx, by, bz, bw = qb
    mx, my, mz, _ = _qmul_c(qa, (-bx, -by, -bz, bw))
    vec_norm = jnp.sqrt(mx * mx + my * my + mz * mz)
    return 2.0 * jnp.arcsin(jnp.clip(vec_norm, max=1.0))


def quat_rotate_c(q, v):
    """Rotate component vec3 ``v`` by component quaternion ``q``."""
    qx, qy, qz, qw = q
    vx, vy, vz = v
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    return (
        vx + qw * tx + (qy * tz - qz * ty),
        vy + qw * ty + (qz * tx - qx * tz),
        vz + qw * tz + (qx * ty - qy * tx),
    )


def _dist3_c(a, b):
    dx, dy, dz = a[0] - b[0], a[1] - b[1], a[2] - b[2]
    return jnp.sqrt(dx * dx + dy * dy + dz * dz)


def _norm_p_c(dx, dy, dz, p: int):
    if p == 2:
        return jnp.sqrt(dx * dx + dy * dy + dz * dz)
    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    if p == 1:
        return ax + ay + az
    s = ax ** p + ay ** p + az ** p
    return s ** (1.0 / p)


def compute_rewards_c(
    specs: Dict[str, RewardTermSpec],
    dt: float,
    env_steps_count: jax.Array,
    tip_pos,            # 3-tuple of vec3 component tuples of (N,)
    tip_pos_prev,       # 3-tuple of vec3 component tuples of (N,)
    obj_pos, obj_quat,  # vec3 / quat4 component tuples
    obj_pos_prev, obj_quat_prev,
    goal_pos, goal_quat,
    half_extents=None,  # vec3 component tuple (per-env DR'd half extents)
):
    """Component-form twin of :func:`compute_rewards` (same semantics,
    reference trifinger_env.py:511-554)."""
    step = env_steps_count.astype(jnp.float32)
    values = {}

    spec = specs["finger_reach_object_rate"]
    sched = _window_sched(spec, step)
    total_rate = 0.0
    for f in range(3):
        curr = _norm_p_c(
            tip_pos[f][0] - obj_pos[0], tip_pos[f][1] - obj_pos[1],
            tip_pos[f][2] - obj_pos[2], spec.norm_p,
        )
        prev = _norm_p_c(
            tip_pos_prev[f][0] - obj_pos_prev[0],
            tip_pos_prev[f][1] - obj_pos_prev[1],
            tip_pos_prev[f][2] - obj_pos_prev[2], spec.norm_p,
        )
        total_rate = total_rate + (curr - prev)
    values["finger_reach_object_rate"] = spec.weight * sched * total_rate

    spec = specs["finger_move_penalty"]
    sq = 0.0
    for f in range(3):
        for c in range(3):
            v = (tip_pos[f][c] - tip_pos_prev[f][c]) / dt
            sq = sq + v * v
    values["finger_move_penalty"] = spec.weight * sq

    spec = specs["object_dist"]
    dist = _dist3_c(obj_pos, goal_pos)
    values["object_dist"] = (
        spec.weight * dt * _window_sched(spec, step) * lgsk_kernel(dist)
    )

    spec = specs["object_rot"]
    angles = quat_diff_rad_c(obj_quat, goal_quat)
    values["object_rot"] = spec.weight * (
        _window_sched(spec, step) * dt / (spec.scale * jnp.abs(angles) + spec.scale)
    )

    spec = specs["object_rot_delta"]
    last_angles = jnp.abs(quat_diff_rad_c(obj_quat_prev, goal_quat))
    values["object_rot_delta"] = spec.weight * _linear_sched(spec, step) * (
        jnp.abs(angles) - last_angles
    )

    spec = specs["object_move"]
    values["object_move"] = spec.weight * (
        dist - _dist3_c(obj_pos_prev, goal_pos)
    )

    spec = specs["keypoint_dist"]
    if spec.activate:
        if half_extents is None:
            raise ValueError("keypoint_dist reward requires half_extents")
        kernel_scale = spec.scale if spec.scale != 1.0 else 30.0
        acc = 0.0
        for sx in (-1.0, 1.0):
            for sy in (-1.0, 1.0):
                for sz in (-1.0, 1.0):
                    local = (
                        sx * half_extents[0],
                        sy * half_extents[1],
                        sz * half_extents[2],
                    )
                    oc = quat_rotate_c(obj_quat, local)
                    gc = quat_rotate_c(goal_quat, local)
                    d = jnp.sqrt(
                        (obj_pos[0] + oc[0] - goal_pos[0] - gc[0]) ** 2
                        + (obj_pos[1] + oc[1] - goal_pos[1] - gc[1]) ** 2
                        + (obj_pos[2] + oc[2] - goal_pos[2] - gc[2]) ** 2
                    )
                    acc = acc + lgsk_kernel(d, scale=kernel_scale)
        values["keypoint_dist"] = (
            spec.weight * dt * _window_sched(spec, step) * (acc / 8.0)
        )
    else:
        values["keypoint_dist"] = jnp.zeros_like(values["object_dist"])

    total = jnp.zeros_like(values["object_dist"])
    active_values = {}
    for name in REWARD_TERM_NAMES:
        if specs[name].activate:
            total = total + values[name]
            active_values[name] = values[name]
    return total, active_values


def compute_rewards(
    specs: Dict[str, RewardTermSpec],
    dt: float,
    env_steps_count: jax.Array,
    fingertip_state: jax.Array,
    last_fingertip_state: jax.Array,
    object_state: jax.Array,
    last_object_state: jax.Array,
    goal_pose: jax.Array,
    half_extents: jax.Array | None = None,
):
    """Compute total reward and the per-term breakdown.

    Mirrors the aggregation in reference trifinger_env.py:511-554: every term
    is evaluated, but only active terms are summed (and logged).
    """
    step = env_steps_count.astype(jnp.float32)
    values = {
        "finger_reach_object_rate": finger_reach_object_rate(
            specs["finger_reach_object_rate"], step,
            fingertip_state, last_fingertip_state, object_state, last_object_state,
        ),
        "finger_move_penalty": finger_move_penalty(
            specs["finger_move_penalty"], dt, fingertip_state, last_fingertip_state
        ),
        "object_dist": object_dist(
            specs["object_dist"], dt, step, object_state, goal_pose
        ),
        "object_rot": object_rot(
            specs["object_rot"], dt, step, object_state, goal_pose
        ),
        "object_rot_delta": object_rot_delta(
            specs["object_rot_delta"], dt, step, object_state, last_object_state, goal_pose
        ),
        "object_move": object_move(
            specs["object_move"], object_state, last_object_state, goal_pose
        ),
    }
    if specs["keypoint_dist"].activate:
        if half_extents is None:
            raise ValueError("keypoint_dist reward requires half_extents")
        values["keypoint_dist"] = keypoint_dist(
            specs["keypoint_dist"], dt, step, object_state, goal_pose, half_extents
        )
    else:
        values["keypoint_dist"] = jnp.zeros_like(values["object_dist"])
    total = jnp.zeros_like(values["object_dist"])
    active_values = {}
    for name in REWARD_TERM_NAMES:
        if specs[name].activate:
            total = total + values[name]
            active_values[name] = values[name]
    return total, active_values
