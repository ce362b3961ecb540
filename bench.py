"""Benchmark: env-steps/s of the batched TriFinger env on one chip.

Prints ONE JSON line. Baseline: the reference paper (arXiv:2108.09779,
README.md:100-109) reports ~100k env-steps/s on one NVIDIA GPU at 16k envs —
the only throughput number that exists for the reference (SURVEY.md §6).
``vs_baseline`` is measured throughput / 100k.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 100_000.0
NUM_ENVS = 8192
WARMUP_STEPS = 3
MEASURE_ROUNDS = 5
STEPS_PER_ROUND = 20


def main():
    from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv, env_reset, env_step

    env = TrifingerEnv(
        config={
            "num_instances": NUM_ENVS,
            "command_mode": "torque",
            "asymmetric_obs": True,
            "sim": {"substeps": 2},
        },
        verbose=False,
    )
    static, params = env.static, env.params
    state, _ = env_reset(static, params, jax.random.PRNGKey(0))

    @jax.jit
    def rollout_chunk(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            action = jax.random.uniform(
                k, (NUM_ENVS, static.action_dim), minval=-1.0, maxval=1.0
            )
            state, obs, states, reward, dones, info = env_step(
                static, params, state, action
            )
            return (state, key), reward[0]

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=STEPS_PER_ROUND)
        return state, key

    key = jax.random.PRNGKey(1)
    # warmup/compile; the scalar device_get forces full materialization
    # (block_until_ready alone can return early on remote-tunnel backends)
    state, key = rollout_chunk(state, key)
    _ = float(state.physics.q[0, 0])

    t0 = time.perf_counter()
    for _ in range(MEASURE_ROUNDS):
        state, key = rollout_chunk(state, key)
    _ = float(state.physics.q[0, 0])
    elapsed = time.perf_counter() - t0

    total_env_steps = NUM_ENVS * STEPS_PER_ROUND * MEASURE_ROUNDS
    steps_per_sec = total_env_steps / elapsed
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s @ 8192 envs, 1 chip, random torque actions",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
