"""Physics compute path: kinematics, dynamics, contacts, engine."""

from leibnizgym_tpu.ops.engine import physics_step
from leibnizgym_tpu.ops.types import PhysicsState, SceneParams, SolverConfig

__all__ = ["physics_step", "PhysicsState", "SceneParams", "SolverConfig"]
