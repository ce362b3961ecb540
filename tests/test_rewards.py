"""Unit tests for reward terms against hand-computed values
(reference rewards.py semantics)."""

import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.envs.trifinger import rewards as rw


def spec(name, **kw):
    base = dict(activate=True, weight=1.0)
    base.update(kw)
    return rw.RewardTermSpec.from_config(name, base)


def obj_state(pos, quat=(0, 0, 0, 1)):
    return jnp.concatenate([jnp.asarray(pos, jnp.float32).reshape(1, 3),
                            jnp.asarray(quat, jnp.float32).reshape(1, 4),
                            jnp.zeros((1, 6))], axis=-1)


def goal(pos, quat=(0, 0, 0, 1)):
    return jnp.concatenate([jnp.asarray(pos, jnp.float32).reshape(1, 3),
                            jnp.asarray(quat, jnp.float32).reshape(1, 4)], axis=-1)


class TestLgskKernel:
    def test_bounds_and_peak(self):
        x = jnp.linspace(-2, 2, 101)
        y = np.asarray(rw.lgsk_kernel(x))
        assert y.max() <= 0.25 + 1e-6
        assert abs(float(rw.lgsk_kernel(jnp.array(0.0))) - 0.25) < 1e-6
        assert float(rw.lgsk_kernel(jnp.array(1.0))) < 1e-5  # scale 50 decays fast


class TestObjectDist:
    def test_value(self):
        sp = spec("object_dist", weight=2000)
        r = rw.object_dist(sp, 0.02, jnp.array(0.0), obj_state([0.1, 0, 0.0325]),
                           goal([0.0, 0, 0.0325]))
        expected = 2000 * 0.02 * float(rw.lgsk_kernel(jnp.array(0.1)))
        assert abs(float(r[0]) - expected) < 1e-5

    def test_window_schedule(self):
        sp = spec("object_dist", weight=2000, thresh_sched_start=10, thresh_sched_end=20)
        args = (0.02, obj_state([0.1, 0, 0]), goal([0, 0, 0]))
        assert float(rw.object_dist(sp, args[0], jnp.array(5.0), *args[1:])[0]) == 0.0
        assert float(rw.object_dist(sp, args[0], jnp.array(15.0), *args[1:])[0]) != 0.0
        assert float(rw.object_dist(sp, args[0], jnp.array(25.0), *args[1:])[0]) == 0.0


class TestObjectMove:
    def test_delta_distance(self):
        sp = spec("object_move", weight=-750)
        r = rw.object_move(sp, obj_state([0.1, 0, 0]), obj_state([0.2, 0, 0]),
                           goal([0, 0, 0]))
        assert abs(float(r[0]) - (-750 * (0.1 - 0.2))) < 1e-5


class TestObjectRot:
    def test_inverse_angle(self):
        from scipy.spatial.transform import Rotation as R

        sp = spec("object_rot", weight=300, scale=3.0)
        q = R.from_rotvec([0, 0, 0.5]).as_quat()
        r = rw.object_rot(sp, 0.02, jnp.array(0.0), obj_state([0, 0, 0], q),
                          goal([0, 0, 0]))
        expected = 300 * 0.02 / (3.0 * 0.5 + 3.0)
        assert abs(float(r[0]) - expected) < 1e-4


class TestObjectRotDelta:
    def test_linear_schedule(self):
        from scipy.spatial.transform import Rotation as R

        sp = spec("object_rot_delta", weight=-250,
                  linear_schedule_start=0, linear_schedule_end=100)
        q1 = R.from_rotvec([0, 0, 0.3]).as_quat()
        q0 = R.from_rotvec([0, 0, 0.5]).as_quat()
        r = rw.object_rot_delta(sp, 0.02, jnp.array(50.0),
                                obj_state([0, 0, 0], q1), obj_state([0, 0, 0], q0),
                                goal([0, 0, 0]))
        expected = -250 * 0.5 * (0.3 - 0.5)
        assert abs(float(r[0]) - expected) < 1e-3


class TestFingerTerms:
    def test_reach_rate(self):
        sp = spec("finger_reach_object_rate", weight=-750, norm_p=2)
        tips_t = jnp.zeros((1, 3, 13)).at[:, :, 0].set(jnp.array([0.1, 0.2, 0.3]))
        tips_p = jnp.zeros((1, 3, 13)).at[:, :, 0].set(jnp.array([0.2, 0.3, 0.4]))
        r = rw.finger_reach_object_rate(
            sp, jnp.array(0.0), tips_t, tips_p,
            obj_state([0, 0, 0]), obj_state([0, 0, 0]))
        expected = -750 * ((0.1 + 0.2 + 0.3) - (0.2 + 0.3 + 0.4))
        assert abs(float(r[0]) - expected) < 1e-4

    def test_move_penalty(self):
        sp = spec("finger_move_penalty", weight=-0.1)
        tips_t = jnp.zeros((1, 3, 13)).at[:, :, 2].set(0.02)
        tips_p = jnp.zeros((1, 3, 13))
        r = rw.finger_move_penalty(sp, 0.02, tips_t, tips_p)
        expected = -0.1 * 3 * (0.02 / 0.02) ** 2
        assert abs(float(r[0]) - expected) < 1e-5


def test_compute_rewards_sums_active_only():
    config = {
        "finger_reach_object_rate": {"activate": True, "weight": -750, "norm_p": 2},
        "finger_move_penalty": {"activate": True, "weight": -0.1},
        "object_dist": {"activate": True, "weight": 2000},
        "object_rot": {"activate": False, "weight": 300},
        "object_rot_delta": {"activate": False, "weight": -250},
        "object_move": {"activate": False, "weight": -750},
    }
    specs = rw.build_reward_specs(config)
    total, terms = rw.compute_rewards(
        specs, 0.02, jnp.array(0.0),
        jnp.zeros((2, 3, 13)), jnp.zeros((2, 3, 13)),
        jnp.zeros((2, 13)), jnp.zeros((2, 13)), jnp.zeros((2, 7)),
    )
    assert set(terms) == {"finger_reach_object_rate", "finger_move_penalty", "object_dist"}
    assert np.allclose(np.asarray(total), sum(np.asarray(v) for v in terms.values()))


class TestKeypointDist:
    def test_zero_at_goal_max_elsewhere(self):
        import jax.numpy as jnp

        sp = spec("keypoint_dist", weight=2000, scale=30.0)
        half = jnp.full((1, 3), 0.0325)
        # object exactly at goal pose: all 8 corner distances 0 -> lgsk peak 0.25
        r_at = rw.keypoint_dist(sp, 0.02, jnp.array(0.0),
                                obj_state([0.1, 0, 0.0325]),
                                goal([0.1, 0, 0.0325]), half)
        assert abs(float(r_at[0]) - 2000 * 0.02 * 0.25) < 1e-4
        # rotated 180deg about z at same position: corners swap -> nonzero dists
        from scipy.spatial.transform import Rotation as R

        q = R.from_rotvec([0, 0, np.pi]).as_quat()
        r_rot = rw.keypoint_dist(sp, 0.02, jnp.array(0.0),
                                 obj_state([0.1, 0, 0.0325], q),
                                 goal([0.1, 0, 0.0325]), half)
        assert float(r_rot[0]) < float(r_at[0]) * 0.5, \
            "rotation misalignment must reduce the keypoint reward"

    def test_missing_config_key_inactive(self):
        specs = rw.build_reward_specs({
            "finger_reach_object_rate": {"activate": True, "weight": -750},
            "finger_move_penalty": {"activate": True, "weight": -0.1},
            "object_dist": {"activate": True, "weight": 2000},
            "object_rot": {"activate": False},
            "object_rot_delta": {"activate": False},
            "object_move": {"activate": False},
        })
        assert specs["keypoint_dist"].activate is False


def test_component_api_matches_aos():
    """compute_rewards_c (the SoA hot path) must agree with compute_rewards
    (the AoS oracle) for every term, active schedules included."""
    import numpy as np

    rng = np.random.RandomState(3)
    n = 64
    fingertip = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3, 13)).astype(np.float32))
    fingertip_prev = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3, 13)).astype(np.float32))

    def rand_state():
        st = rng.uniform(-0.3, 0.3, (n, 13)).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        st[:, 3:7] = q / np.linalg.norm(q, axis=-1, keepdims=True)
        return jnp.asarray(st)

    obj, obj_prev = rand_state(), rand_state()
    goal = rand_state()[:, 0:7]
    half = jnp.full((n, 3), 0.0325)
    specs = {
        name: rw.RewardTermSpec(
            name=name, activate=True, weight=123.0, norm_p=2, scale=3.0,
            sched_start=0.0, sched_end=1e9,
        )
        for name in rw.REWARD_TERM_NAMES
    }
    step = jnp.asarray(5e8)
    total_a, vals_a = rw.compute_rewards(
        specs, 0.02, step, fingertip, fingertip_prev, obj, obj_prev, goal,
        half_extents=half,
    )
    cols = lambda arr, idx: tuple(arr[:, i] for i in idx)
    tips = tuple(tuple(fingertip[:, f, c] for c in range(3)) for f in range(3))
    tips_p = tuple(tuple(fingertip_prev[:, f, c] for c in range(3)) for f in range(3))
    total_c, vals_c = rw.compute_rewards_c(
        specs, 0.02, step,
        tips, tips_p,
        cols(obj, range(3)), cols(obj, range(3, 7)),
        cols(obj_prev, range(3)), cols(obj_prev, range(3, 7)),
        cols(goal, range(3)), cols(goal, range(3, 7)),
        half_extents=tuple(half[:, c] for c in range(3)),
    )
    assert set(vals_a) == set(vals_c)
    for name in vals_a:
        # rotation terms pass through 2*asin(|vec|) whose derivative diverges
        # at |vec| -> 1 (angle pi): float-eps differences in the norm order
        # amplify to ~sqrt(eps) rad there, times the 123 weight
        atol = 0.3 if "rot" in name else 1e-6
        np.testing.assert_allclose(
            np.asarray(vals_a[name]), np.asarray(vals_c[name]),
            rtol=1e-5, atol=atol, err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(total_a), np.asarray(total_c),
                               rtol=1e-5, atol=0.5)
