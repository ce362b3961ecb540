"""Device mesh + sharding helpers for env-axis data parallelism.

Parallelism design (SURVEY.md §2.3 "Parallelism"): the reference is single-
process single-GPU; scale-out here is new scope. The natural axis for this
workload is the env batch — rollout physics is embarrassingly parallel, so a
1-axis ``data`` mesh shards every per-env leaf (EnvState, obs, trajectories)
while learner parameters stay replicated. Under jit, XLA inserts psum for the
gradient all-reduce and the few scalar metrics; rollout itself is
communication-free. ICI carries the all-reduce within a slice; multi-host
joins via jax.distributed (DCN only at initialization and checkpointing).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def shard_batch_pytree(tree, mesh: Mesh, batch_size: int, axis_name: str = "data"):
    """Place every leaf with a batch_size-sized axis on the data axis;
    replicate everything else (scalars, parameters, RNG keys).

    Row-major leaves (batch leading, e.g. obs (N, 41)) shard axis 0;
    component-major ``_cm`` leaves (batch last, e.g. goal_pose_cm (7, N) —
    the env axis lives in the TPU lane dimension) shard the last axis."""

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            if leaf.shape[0] == batch_size:
                return jax.device_put(leaf, NamedSharding(mesh, P(axis_name)))
            if leaf.ndim >= 2 and leaf.shape[-1] == batch_size:
                spec = P(*([None] * (leaf.ndim - 1) + [axis_name]))
                return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host entry: call once per process before device use.

    With no arguments, jax.distributed auto-detects the environment (TPU pod
    metadata); arguments allow manual rendezvous for CPU/GPU test clusters.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
