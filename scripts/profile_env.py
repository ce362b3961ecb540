#!/usr/bin/env python
"""Profiling harness: capture a jax.profiler trace of the env / train step.

The reference has no profiling tooling (torch JIT profiling is explicitly
disabled, env_base.py:147-149); on TPU the first-class equivalent is an XLA
trace viewable in TensorBoard / Perfetto.

    python scripts/profile_env.py --trace-dir /tmp/jax_trace --what env
    python scripts/profile_env.py --what train
    # then: tensorboard --logdir /tmp/jax_trace  (Profile tab)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from leibnizgym_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

import jax
import jax.numpy as jnp

from leibnizgym_tpu.utils import print_info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", type=str, default="/tmp/jax_trace")
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--what", choices=["env", "physics", "train"], default="env")
    args = ap.parse_args()

    from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv, env_reset, env_step

    n = args.num_envs
    env = TrifingerEnv(
        config={"num_instances": n, "command_mode": "torque",
                "asymmetric_obs": args.what == "train", "sim": {"substeps": 2}},
        verbose=False,
    )
    static, params = env.static, env.params

    if args.what == "train":
        from leibnizgym_tpu.learning.ppo import (
            PPOConfig, init_train_state, train_iteration,
        )

        cfg = PPOConfig(minibatch_size=n)
        ts = init_train_state(cfg, static, params, jax.random.PRNGKey(0))
        step = jax.jit(train_iteration, static_argnums=(0, 1))
        ts, _ = step(cfg, static, params, ts)  # compile
        jax.block_until_ready(ts.lr)
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                ts, _ = step(cfg, static, params, ts)
            jax.block_until_ready(ts.lr)
    elif args.what == "physics":
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2
        from leibnizgym_tpu.ops.types import PhysicsState, SceneParams, SolverConfig

        state = PhysicsState.default((n,))
        scene = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), SceneParams.default()
        )
        tau = jnp.zeros((n, 9))
        cfg = SolverConfig(substeps=2, solver_iterations=4)
        f = jax.jit(jax.vmap(lambda s, t, sc: physics_step_v2(s, t, sc, cfg, 0.02)))
        out = f(state, tau, scene)
        jax.block_until_ready(out)
        with jax.profiler.trace(args.trace_dir):
            for _ in range(args.steps):
                out = f(*((out[0], tau, scene)))
            jax.block_until_ready(out)
    else:
        state, _ = env_reset(static, params, jax.random.PRNGKey(0))
        step = jax.jit(env_step, static_argnums=0)
        action = jnp.zeros((n, static.action_dim))
        out = step(static, params, state, action)
        jax.block_until_ready(out[1])
        with jax.profiler.trace(args.trace_dir):
            for _ in range(args.steps):
                out = step(static, params, out[0], action)
            jax.block_until_ready(out[1])
    print_info(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
