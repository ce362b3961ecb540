"""Environments."""

from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv

__all__ = ["TrifingerEnv"]
