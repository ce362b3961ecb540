"""Frame-stacking wrapper (rl_games wrappers.FrameStack parity).

The reference optionally stacks observation frames before the learner
(rlg_train.py:83-86: ``wrappers.FrameStack(env, frames, False)``). This
version keeps the stack on-device as a rolling buffer.
"""

from __future__ import annotations

import jax.numpy as jnp


class FrameStack:
    """Stacks the last ``num_frames`` observations along the feature axis."""

    def __init__(self, env, num_frames: int, flatten: bool = True):
        self.env = env
        self.num_frames = int(num_frames)
        self.flatten = flatten
        self._buf = None

    @property
    def num_envs(self):
        return self.env.num_envs

    @property
    def num_obs(self):
        return self.env.num_obs * self.num_frames

    @property
    def num_states(self):
        return self.env.num_states

    @property
    def num_actions(self):
        return self.env.num_actions

    def _stacked(self):
        if self.flatten:
            n = self._buf.shape[1]
            return jnp.transpose(self._buf, (1, 0, 2)).reshape(n, -1)
        return self._buf

    def reset(self):
        obs = self.env.reset()
        self._buf = jnp.stack([obs] * self.num_frames, axis=0)
        return self._stacked()

    def step(self, actions):
        obs, rew, done, info = self.env.step(actions)
        self._buf = jnp.concatenate([self._buf[1:], obs[None]], axis=0)
        return self._stacked(), rew, done, info

    def get_state(self):
        return self.env.get_state()

    def __getattr__(self, name):
        return getattr(self.env, name)


def stack_if_frames(env, frames: int):
    """Apply FrameStack when a policy was trained with ``frames > 1``
    (reference rlg_train.py:83-86) — the single inference-side hook shared
    by Runner.play/eval and the replay viewer. The jitted learner rolls the
    equivalent stack inside its rollout scan (ppo.PPOConfig.frames)."""
    return FrameStack(env, frames, flatten=True) if frames > 1 else env
