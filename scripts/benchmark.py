#!/usr/bin/env python
"""Benchmark harness: env-step throughput sweep over env counts.

Implements the benchmarking capability the reference only scaffolded
(config_utils.py:275-286: --num_proc/--random_actions/--bench_len/--bench_file
flags with no harness behind them).

    python scripts/benchmark.py --num_envs_sweep 1024 4096 8192 16384 \
        --bench_len 100 --bench_file /tmp/bench.yaml
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
import jax.numpy as jnp
import yaml

from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv, env_reset, env_step
from leibnizgym_tpu.utils import print_info


def bench_one(num_envs: int, bench_len: int, substeps: int, random_actions: bool):
    env = TrifingerEnv(
        config={"num_instances": num_envs, "command_mode": "torque",
                "sim": {"substeps": substeps}},
        verbose=False,
    )
    static, params = env.static, env.params
    state, _ = env_reset(static, params, jax.random.PRNGKey(0))

    @jax.jit
    def chunk(state, key):
        def body(carry, _):
            state, key = carry
            if random_actions:
                key, k = jax.random.split(key)
                action = jax.random.uniform(
                    k, (num_envs, static.action_dim), minval=-1.0, maxval=1.0
                )
            else:
                action = jnp.zeros((num_envs, static.action_dim))
            state, *_ = env_step(static, params, state, action)
            return (state, key), None

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=bench_len)
        return state, key

    key = jax.random.PRNGKey(1)
    state, key = chunk(state, key)
    jax.block_until_ready(state.physics.q)
    t0 = time.perf_counter()
    state, key = chunk(state, key)
    jax.block_until_ready(state.physics.q)
    dt = time.perf_counter() - t0
    return num_envs * bench_len / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs_sweep", type=int, nargs="+",
                    default=[1024, 4096, 8192, 16384])
    ap.add_argument("--bench_len", type=int, default=100)
    ap.add_argument("--substeps", type=int, default=2)
    ap.add_argument("--random_actions", action="store_true", default=True)
    ap.add_argument("--bench_file", type=str, default=None)
    args = ap.parse_args()

    results = {}
    for n in args.num_envs_sweep:
        sps = bench_one(n, args.bench_len, args.substeps, args.random_actions)
        results[n] = round(sps, 1)
        print_info(f"num_envs={n}: {sps:,.0f} env-steps/s "
                   f"({sps / n:,.1f} steps/s/env)")
    if args.bench_file:
        payload = {
            "device": str(jax.devices()[0]),
            "substeps": args.substeps,
            "bench_len": args.bench_len,
            "env_steps_per_sec": results,
        }
        with open(args.bench_file, "w") as f:
            yaml.dump(payload, f)
        print_info(f"wrote {args.bench_file}")


if __name__ == "__main__":
    main()
