#!/usr/bin/env python
"""Random-action throughput demo (reference scripts/trifinger_random_action.py:11-37).

Steps 8192 env instances with uniform random torque actions and prints
throughput every chunk. Ctrl-C to stop.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from leibnizgym_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

import jax

from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv, env_reset, env_step
from leibnizgym_tpu.utils import print_info

NUM_ENVS = int(os.environ.get("NUM_ENVS", 8192))
CHUNK = 50


def main():
    env = TrifingerEnv(
        config={"num_instances": NUM_ENVS, "command_mode": "torque",
                "sim": {"substeps": 2}},
        verbose=True,
    )
    static, params = env.static, env.params
    state, _ = env_reset(static, params, jax.random.PRNGKey(0))

    @jax.jit
    def chunk(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            action = jax.random.uniform(
                k, (NUM_ENVS, static.action_dim), minval=-1.0, maxval=1.0
            )
            state, *_ = env_step(static, params, state, action)
            return (state, key), None

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=CHUNK)
        return state, key

    key = jax.random.PRNGKey(1)
    state, key = chunk(state, key)  # compile
    jax.block_until_ready(state.physics.q)
    print_info("compiled; entering loop (Ctrl-C to stop)")
    while True:
        t0 = time.perf_counter()
        state, key = chunk(state, key)
        jax.block_until_ready(state.physics.q)
        dt = time.perf_counter() - t0
        print_info(f"{NUM_ENVS * CHUNK / dt:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
