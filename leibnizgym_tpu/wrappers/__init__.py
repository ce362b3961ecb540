"""Env wrappers."""

from leibnizgym_tpu.wrappers.frame_stack import FrameStack
from leibnizgym_tpu.wrappers.vec_task import VecTask, VecTaskPython

__all__ = ["FrameStack", "VecTask", "VecTaskPython"]
