#!/usr/bin/env python
"""Scaling benchmark: env + PPO throughput vs device count on a data mesh.

Measures rollout and full-train-step throughput for 1..K devices (real chips
on a pod slice, or virtual CPU devices for harness validation) and reports
scaling efficiency — the 1 host -> N hosts efficiency target in BASELINE.md.

    # virtual validation (8 CPU devices)
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/scaling_bench.py --envs-per-device 64 --train

    # on a real slice
    python scripts/scaling_bench.py --envs-per-device 8192
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from leibnizgym_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

import jax
import numpy as np


def bench_devices(num_devices: int, envs_per_device: int, steps: int,
                  do_train: bool):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv, env_reset, env_step
    from leibnizgym_tpu.parallel.mesh import shard_batch_pytree

    devices = jax.devices()[:num_devices]
    mesh = Mesh(np.asarray(devices), axis_names=("data",))
    n = envs_per_device * num_devices
    env = TrifingerEnv(
        config={"num_instances": n, "command_mode": "torque",
                "asymmetric_obs": do_train, "sim": {"substeps": 2}},
        verbose=False,
    )
    static, params = env.static, env.params

    state, _ = env_reset(static, params, jax.random.PRNGKey(0))
    state = shard_batch_pytree(state, mesh, n)

    @jax.jit
    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            action = jax.random.uniform(
                k, (n, static.action_dim), minval=-1.0, maxval=1.0
            )
            action = jax.lax.with_sharding_constraint(
                action, NamedSharding(mesh, P("data"))
            )
            state, *_ = env_step(static, params, state, action)
            return (state, key), None

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=steps)
        return state, key

    key = jax.random.PRNGKey(1)
    state, key = rollout(state, key)
    jax.block_until_ready(state.physics.q)
    t0 = time.perf_counter()
    state, key = rollout(state, key)
    jax.block_until_ready(state.physics.q)
    rollout_sps = n * steps / (time.perf_counter() - t0)

    train_sps = None
    if do_train:
        from leibnizgym_tpu.learning.ppo import (
            PPOConfig, init_train_state, train_iteration,
        )

        cfg = PPOConfig(horizon=8, minibatch_size=max(n, 32),
                        mini_epochs=2, cv_minibatch_size=max(n, 32), cv_mini_epochs=2)
        ts = init_train_state(cfg, static, params, jax.random.PRNGKey(0))
        ts = ts.replace(
            env_state=shard_batch_pytree(ts.env_state, mesh, n),
            obs=jax.device_put(ts.obs, NamedSharding(mesh, P("data"))),
            states=jax.device_put(ts.states, NamedSharding(mesh, P("data"))),
            ep_return=jax.device_put(ts.ep_return, NamedSharding(mesh, P("data"))),
            ep_len=jax.device_put(ts.ep_len, NamedSharding(mesh, P("data"))),
        )
        step_fn = jax.jit(train_iteration, static_argnums=(0, 1))
        ts, _ = step_fn(cfg, static, params, ts)
        jax.block_until_ready(ts.lr)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            ts, _ = step_fn(cfg, static, params, ts)
        jax.block_until_ready(ts.lr)
        train_sps = n * cfg.horizon * iters / (time.perf_counter() - t0)
    return rollout_sps, train_sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs-per-device", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--device-counts", type=int, nargs="*", default=None)
    args = ap.parse_args()

    total = len(jax.devices())
    counts = args.device_counts or sorted(
        {1, 2, 4, 8, total} & set(range(1, total + 1))
    )
    print(f"devices available: {total} ({jax.devices()[0].platform})")
    base = None
    for k in counts:
        r_sps, t_sps = bench_devices(k, args.envs_per_device, args.steps, args.train)
        if base is None:
            base = r_sps
        eff = r_sps / (base * k) * 100.0
        line = (f"devices={k}: rollout {r_sps:,.0f} env-steps/s "
                f"(scaling eff {eff:.0f}%)")
        if t_sps is not None:
            line += f" | train {t_sps:,.0f} env-steps/s"
        print(line)


if __name__ == "__main__":
    main()
