"""Domain randomization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.dr import sample_scene_params
from leibnizgym_tpu.envs import TrifingerEnv
from leibnizgym_tpu.ops.types import SceneParams
import pytest


class TestSampler:
    def test_ranges_and_derived_inertia(self):
        base = SceneParams.default()
        n = 512
        sp = sample_scene_params(jax.random.PRNGKey(0), n, base)
        mass = np.asarray(sp.cube_mass)
        assert mass.min() >= float(base.cube_mass) * 0.8 - 1e-6
        assert mass.max() <= float(base.cube_mass) * 1.2 + 1e-6
        # inertia must be consistent with randomized mass AND size
        half = np.asarray(sp.cube_half_extents)
        side = 2 * half
        expected = mass[:, None] / 12.0 * np.stack(
            [side[:, 1] ** 2 + side[:, 2] ** 2,
             side[:, 0] ** 2 + side[:, 2] ** 2,
             side[:, 0] ** 2 + side[:, 1] ** 2], axis=-1)
        assert np.allclose(np.asarray(sp.cube_inertia), expected, rtol=1e-5)

    def test_custom_ranges(self):
        base = SceneParams.default()
        sp = sample_scene_params(
            jax.random.PRNGKey(1), 256, base,
            ranges={"friction_scale": (0.5, 0.5)},
        )
        mu = np.asarray(sp.mu_tip_cube)
        assert np.allclose(mu, float(base.mu_tip_cube) * 0.5, rtol=1e-5)


@pytest.mark.slow  # full-env XLA compile
class TestEnvIntegration:
    def test_config_ranges_reach_sampler(self):
        """Configured domain_randomization ranges must be honored, not
        silently replaced by DR_DEFAULTS (round-1 advisor finding)."""
        env = TrifingerEnv(
            config={"num_instances": 64, "command_mode": "position",
                    "domain_randomization": {
                        "activate": True,
                        "cube_mass_scale": [2.0, 2.0],  # far outside defaults
                        "pd_gain_scale": [0.5, 0.5],
                    },
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        env.reset()
        masses = np.asarray(env.state.scene.cube_mass)
        base_mass = float(SceneParams.default().cube_mass)
        assert np.allclose(masses, 2.0 * base_mass, rtol=1e-4), (
            "configured cube_mass_scale ignored")
        # pd_gain_scale is applied per env at reset
        assert np.allclose(np.asarray(env.state.pd_scale), 0.5, rtol=1e-5)
        obs, rew, dones, info = env.step(jnp.zeros((64, 9)))
        assert bool(jnp.isfinite(obs).all())

    def test_pd_gain_scale_changes_torque(self):
        from leibnizgym_tpu.envs.trifinger.env import compute_torque

        env = TrifingerEnv(
            config={"num_instances": 4, "command_mode": "position",
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        env.reset()
        from leibnizgym_tpu.utils.math import scale_transform

        q = env.state.physics.q
        qd = env.state.physics.qd
        # target slightly away from q so the PD torque is small (unsaturated);
        # a big error would saturate both variants to +-0.36 identically
        act = scale_transform(
            q + 0.02, env.params.action_scale_low, env.params.action_scale_high
        )
        tau_1 = compute_torque(env.static, env.params, act, q, qd,
                               jnp.ones((4, 2)))
        tau_half = compute_torque(env.static, env.params, act, q, qd,
                                  jnp.full((4, 2), 0.5))
        assert float(jnp.abs(tau_1 - tau_half).max()) > 1e-4

    def test_dr_env_runs_and_varies(self):
        env = TrifingerEnv(
            config={"num_instances": 32, "command_mode": "torque",
                    "domain_randomization": {"activate": True},
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        env.reset()
        masses = np.asarray(env.state.scene.cube_mass)
        assert masses.std() > 1e-4, "DR should vary cube mass across envs"
        obs, rew, dones, info = env.step(jnp.zeros((32, 9)))
        assert bool(jnp.isfinite(obs).all())

    def test_dr_off_uniform_scene(self):
        env = TrifingerEnv(
            config={"num_instances": 8, "command_mode": "torque",
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        env.reset()
        masses = np.asarray(env.state.scene.cube_mass)
        assert masses.std() == 0.0


@pytest.mark.slow  # full-env XLA compile
class TestDRPreset:
    def test_d3_dr_preset_builds_and_steps(self):
        import copy

        import jax.numpy as jnp

        from leibnizgym_tpu.config.presets import GYM_PRESETS
        from leibnizgym_tpu.envs import TrifingerEnv

        cfg = copy.deepcopy(GYM_PRESETS["trifinger_difficulty_3_dr"])
        cfg["num_instances"] = 8
        env = TrifingerEnv(config=cfg, verbose=False)
        assert env.static.dr_activate
        assert env.static.obs_noise_std == 0.01
        obs = env.reset()
        obs2, rew, dones, info = env.step(jnp.zeros((8, 9)))
        assert np.isfinite(np.asarray(obs2)).all()
        # obs noise makes two observations of an identical state differ:
        # zero action twice from reset, envs share nothing -> just sanity
        assert obs2.shape == obs.shape
