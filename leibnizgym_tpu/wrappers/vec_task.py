"""Vectorized-task wrapper: gym-style spaces + obs/action clipping.

Capability parity with the reference VecTask/VecTaskPython
(/root/reference/leibnizgym/wrappers/vec_task.py:26-170). On TPU there is no
sim/RL device split — arrays already live on the accelerator — so the
``rl_device`` transfer becomes a no-op and is kept only for signature
compatibility.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

try:
    from gymnasium import spaces
except ImportError:  # pragma: no cover
    spaces = None

from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv


class VecTask:
    """Wraps an env with clipping bounds and gym spaces."""

    def __init__(self, task: TrifingerEnv, rl_device: str = "tpu",
                 clip_obs: float = 5.0, clip_actions: float = 1.0):
        assert isinstance(task, TrifingerEnv)
        self._task = task
        self._clip_obs = float(clip_obs)
        self._clip_actions = float(clip_actions)
        self._rl_device = rl_device
        if spaces is not None:
            self._obs_space = spaces.Box(
                np.full(self.num_obs, -self._clip_obs, np.float32),
                np.full(self.num_obs, self._clip_obs, np.float32),
            )
            self._state_space = spaces.Box(
                np.full(self.num_states, -self._clip_obs, np.float32),
                np.full(self.num_states, self._clip_obs, np.float32),
            )
            self._act_space = spaces.Box(
                np.full(self.num_actions, -self._clip_actions, np.float32),
                np.full(self.num_actions, self._clip_actions, np.float32),
            )
        else:
            self._obs_space = self._state_space = self._act_space = None

    def __str__(self) -> str:
        return (
            f"Vectorized Environment around task: {type(self._task).__name__} \n"
            f"\t Number of instances   : {self.num_envs} \n"
            f"\t Number of observations: {self.num_obs} \n"
            f"\t Number of states      : {self.num_states} \n"
            f"\t Number of actions     : {self.num_actions} \n"
            f"\t Observation clipping  : {self._clip_obs} \n"
            f"\t Actions clipping      : {self._clip_actions} \n"
        )

    def get_number_of_agents(self) -> int:
        return 1

    @property
    def num_envs(self) -> int:
        return self._task.get_num_instances()

    @property
    def num_states(self) -> int:
        return self._task.get_state_dim()

    @property
    def num_obs(self) -> int:
        return self._task.get_obs_dim()

    @property
    def num_actions(self) -> int:
        return self._task.get_action_dim()

    @property
    def observation_space(self):
        return self._obs_space

    @property
    def state_space(self):
        return self._state_space

    @property
    def action_space(self):
        return self._act_space

    def dump_config(self, filename: str):
        self._task.dump_config(filename)

    def reset(self):
        raise NotImplementedError

    def step(self, actions):
        raise NotImplementedError


class VecTaskPython(VecTask):
    """Concrete wrapper over the jitted TPU env."""

    def get_state(self):
        states = self._task.get_state()
        if states is None:
            return None
        return jnp.clip(states, -self._clip_obs, self._clip_obs)

    def reset(self):
        obs = self._task.reset()
        return jnp.clip(obs, -self._clip_obs, self._clip_obs)

    def step(self, actions) -> Tuple:
        actions = jnp.clip(jnp.asarray(actions), -self._clip_actions, self._clip_actions)
        obs, rew, is_done, info = self._task.step(actions)
        obs = jnp.clip(obs, -self._clip_obs, self._clip_obs)
        return obs, rew, is_done, info
