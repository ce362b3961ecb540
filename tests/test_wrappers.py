"""Tests for VecTask and FrameStack wrappers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leibnizgym_tpu.envs import TrifingerEnv
from leibnizgym_tpu.wrappers.frame_stack import FrameStack
from leibnizgym_tpu.wrappers.vec_task import VecTaskPython

# full-env XLA compiles / multi-process: full-suite only
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def env():
    return TrifingerEnv(
        config={"num_instances": 4, "command_mode": "torque",
                "asymmetric_obs": True, "sim": {"substeps": 2}},
        verbose=False,
    )


class TestVecTask:
    def test_spaces_and_clipping(self, env):
        vec = VecTaskPython(env, clip_obs=5.0, clip_actions=1.0)
        assert vec.num_envs == 4
        assert vec.num_obs == 41
        assert vec.num_states == 113
        assert vec.num_actions == 9
        if vec.observation_space is not None:
            assert vec.observation_space.shape == (41,)
            assert float(vec.action_space.high[0]) == 1.0
        obs = vec.reset()
        assert float(jnp.abs(obs).max()) <= 5.0
        obs, rew, done, info = vec.step(jnp.full((4, 9), 10.0))  # out-of-range
        assert float(jnp.abs(obs).max()) <= 5.0
        st = vec.get_state()
        assert st.shape == (4, 113)
        assert float(jnp.abs(st).max()) <= 5.0


class TestFrameStack:
    def test_stacking(self, env):
        vec = VecTaskPython(env)
        fs = FrameStack(vec, 3)
        obs = fs.reset()
        assert obs.shape == (4, 41 * 3)
        # initially all frames identical
        assert np.allclose(np.asarray(obs[:, :41]), np.asarray(obs[:, 41:82]))
        prev = np.asarray(obs)
        obs, *_ = fs.step(jnp.zeros((4, 9)))
        # frames shifted: new obs's middle block == previous newest block
        assert np.allclose(np.asarray(obs[:, 41:82]), prev[:, 82:123])
