#!/usr/bin/env python
"""Decompose the env-step cost on the chip: physics vs MDP layer, per engine.

Times, inside a lax.scan like bench.py: (a) the bare physics step under the
ENV'S OWN SolverConfig (same solver type, iterations, substeps, gates — the
env is built first and its `static.solver` is reused, so the subtraction is
apples-to-apples), for both the XLA-SoA and pallas engines, and (b) the full
env step. env_ms - physics_<default engine>_ms is the obs/reward/reset (MDP)
layer. Prints one JSON line.
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
    ap.add_argument("--substeps", type=int, default=4)
    ap.add_argument("--what", default="all",
                    choices=["all", "physics", "physics_pallas", "env"])
    args = ap.parse_args()
    n = args.num_envs

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
    cfg = static.solver  # the env's exact solver config, gates included
    out = {"num_envs": n, "substeps": args.substeps,
           "solver_type": cfg.solver_type, "iterations": cfg.solver_iterations,
           "env_default_engine": static.engine}

    if args.what in ("all", "physics", "physics_pallas"):
        from leibnizgym_tpu.ops.types import PhysicsState, SceneParams

        scene = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)),
            SceneParams.default(),
        )
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
        state, _ = env_reset(static, params, jax.random.PRNGKey(0))
        action = jnp.zeros((n, static.action_dim))
        dt = _time_scan(
            lambda s: env_step(static, params, s, action)[0], state
        )
        out["env_ms"] = round(dt * 1e3, 4)
        out["env_steps_per_s"] = round(n / dt)
        phys_key = {"pallas": "physics_pallas_ms", "soa": "physics_soa_ms"}.get(
            static.engine
        )
        if phys_key and phys_key in out:
            out["mdp_layer_ms"] = round(out["env_ms"] - out[phys_key], 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
