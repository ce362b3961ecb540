"""leibnizgym_tpu: TPU-native TriFinger RL environment suite.

A from-scratch JAX/XLA re-design with the capabilities of pairlab/leibnizgym:
batched rigid-body physics (replacing IsaacGym PhysX), the TriFinger
cube-manipulation task with 4 difficulty levels, modular reward terms,
goal/reset samplers, a vectorized-task wrapper, and a PPO training stack
(replacing rl_games) sharded over TPU meshes.
"""

__version__ = "0.1.0"
