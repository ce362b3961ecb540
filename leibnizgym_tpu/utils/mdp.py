"""MDP datatypes shared by environments.

The reference's ``RewardTerm`` (torch.nn.Module for TorchScript,
/root/reference/leibnizgym/utils/mdp.py:11-66) maps to the pure-function +
frozen-spec pattern in ``envs.trifinger.rewards``; this module re-exports the
spec type and defines the step output container.
"""

from __future__ import annotations

from typing import Dict

import jax
from flax import struct

from leibnizgym_tpu.envs.trifinger.rewards import RewardTermSpec  # noqa: F401


@struct.dataclass
class Transition:
    """One environment transition (batched over envs)."""

    obs: jax.Array
    states: jax.Array
    reward: jax.Array
    done: jax.Array
    info: Dict[str, jax.Array]
