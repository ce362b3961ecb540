"""Device mesh, sharding, and distributed utilities."""

from leibnizgym_tpu.parallel.mesh import (
    initialize_distributed,
    make_mesh,
    shard_batch_pytree,
)

__all__ = ["initialize_distributed", "make_mesh", "shard_batch_pytree"]
