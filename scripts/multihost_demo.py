#!/usr/bin/env python
"""Multi-host (multi-process) training demo/validation worker.

Runs the full sharded PPO train step across N processes with jax.distributed
— the actual multi-host path (rollout sharded per process, gradients
all-reduced across the global mesh). On a TPU pod slice each process is one
host; for CI-style validation this also runs as N CPU processes on one
machine (gloo collectives):

    # terminal A                          # terminal B
    python scripts/multihost_demo.py 0 2  python scripts/multihost_demo.py 1 2

or let the test spawn both (tests/test_multihost.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

from leibnizgym_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

import jax


def main():
    rank = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    nprocs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    coordinator = os.environ.get("COORD_ADDR", "localhost:9911")
    envs_per_device = int(os.environ.get("ENVS_PER_DEVICE", 8))

    if nprocs > 1:
        jax.distributed.initialize(coordinator, num_processes=nprocs, process_id=rank)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv
    from leibnizgym_tpu.learning.ppo import (
        PPOConfig, init_train_state, train_iteration,
    )
    from leibnizgym_tpu.parallel.mesh import make_mesh

    n_devices = len(jax.devices())
    n = envs_per_device * n_devices
    print(f"[{rank}] {len(jax.local_devices())} local / {n_devices} global "
          f"devices; {n} envs", flush=True)

    mesh = make_mesh()
    env = TrifingerEnv(
        config={"num_instances": n, "command_mode": "torque",
                "asymmetric_obs": True, "sim": {"substeps": 2}},
        verbose=False,
    )
    cfg = PPOConfig(horizon=4, minibatch_size=n, mini_epochs=2,
                    cv_minibatch_size=n, cv_mini_epochs=2)

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def out_shard(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == n:
            return data
        return repl

    # init the train state SPMD: each process computes its shard
    ts = jax.jit(init_train_state, static_argnums=(0, 1))(
        cfg, env.static, env.params, jax.random.PRNGKey(0)
    )
    ts = jax.tree.map(
        lambda x: jax.device_put(x, out_shard(x)) if hasattr(x, "ndim") else x, ts
    )

    step = jax.jit(train_iteration, static_argnums=(0, 1))
    for i in range(3):
        ts, metrics = step(cfg, env.static, env.params, ts)
    jax.block_until_ready(ts.lr)
    total = float(jax.device_get(metrics["losses/total"]))
    kl = float(jax.device_get(metrics["info/kl"]))
    print(f"[{rank}] 3 sharded train steps OK: loss {total:.6f} kl {kl:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
