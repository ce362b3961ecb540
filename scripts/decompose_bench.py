#!/usr/bin/env python
"""Decompose the env-step cost on the chip: physics vs MDP layer, per engine.

Times, inside a lax.scan like bench.py: (a) the bare physics step (engine_v2
or pallas), (b) the full env step. The difference is the obs/reward/reset
(MDP) layer. Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from leibnizgym_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

import jax
import jax.numpy as jnp


def _time_scan(fn, carry, rounds=5, length=20):
    compiled = jax.jit(
        lambda c: jax.lax.scan(lambda cc, _: (fn(cc), None), c, None,
                               length=length)[0]
    ).lower(carry).compile()
    carry = compiled(carry)
    jax.block_until_ready(jax.tree.leaves(carry)[0])
    t0 = time.perf_counter()
    for _ in range(rounds):
        carry = compiled(carry)
    jax.block_until_ready(jax.tree.leaves(carry)[0])
    return (time.perf_counter() - t0) / (rounds * length)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--substeps", type=int, default=2)
    ap.add_argument("--what", default="all",
                    choices=["all", "physics", "physics_pallas", "env"])
    args = ap.parse_args()
    n = args.num_envs
    out = {"num_envs": n, "substeps": args.substeps}

    if args.what in ("all", "physics", "physics_pallas"):
        from leibnizgym_tpu.ops.types import (
            PhysicsState, SceneParams, SolverConfig,
        )

        scene = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)),
            SceneParams.default(),
        )
        cfg = SolverConfig(substeps=args.substeps, solver_iterations=8)
        tau = jnp.zeros((n, 9))
        state0 = PhysicsState.default((n,))

        if args.what in ("all", "physics"):
            from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

            f = jax.vmap(lambda s, t, sc: physics_step_v2(s, t, sc, cfg, 0.02))
            dt = _time_scan(lambda s: f(s, tau, scene)[0], state0)
            out["physics_soa_ms"] = round(dt * 1e3, 4)
            out["physics_soa_steps_per_s"] = round(n / dt)

        if args.what in ("all", "physics_pallas"):
            try:
                from leibnizgym_tpu.ops.pallas_engine import physics_step_pallas

                f = lambda s, t, sc: physics_step_pallas(s, t, sc, cfg, 0.02)  # noqa: E731
                dt = _time_scan(lambda s: f(s, tau, scene)[0], state0)
                out["physics_pallas_ms"] = round(dt * 1e3, 4)
                out["physics_pallas_steps_per_s"] = round(n / dt)
            except Exception as e:  # Mosaic unavailable off-TPU
                out["physics_pallas_error"] = str(e)[:120]

    if args.what in ("all", "env"):
        from leibnizgym_tpu.envs.trifinger.env import (
            TrifingerEnv, env_reset, env_step,
        )

        env = TrifingerEnv(
            config={"num_instances": n, "command_mode": "torque",
                    "asymmetric_obs": True,
                    "sim": {"substeps": args.substeps}},
            verbose=False,
        )
        static, params = env.static, env.params
        state, _ = env_reset(static, params, jax.random.PRNGKey(0))
        action = jnp.zeros((n, static.action_dim))
        dt = _time_scan(
            lambda s: env_step(static, params, s, action)[0], state
        )
        out["env_ms"] = round(dt * 1e3, 4)
        out["env_steps_per_s"] = round(n / dt)
        if "physics_soa_ms" in out:
            out["mdp_layer_ms"] = round(out["env_ms"] - out["physics_soa_ms"], 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
