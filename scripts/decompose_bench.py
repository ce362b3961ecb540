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


def _time_scan(fn, carry, rounds=10, length=100):
    # long windows: each timed window pays ONE blocking tunnel round trip
    # (~26 ms measured); 1000 steps amortize it below 5% (bench.py)
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


def _bench_ppo_decomposition(n: int, out: dict):
    """Decompose the PPO epoch's critical path (VERDICT r3 weak-#3):

    - rollout_ms: the horizon-long scan of [policy fwd + cv fwd + env step]
      alone (same structure as train_iteration's rollout)
    - update_ms(K): the minibatch update scan alone on synthetic trajectory
      data, for the shipped K = mini_epochs x num_mb sequential steps and
      K/2, K/4 — the slope is the per-update latency, the intercept the
      fixed dispatch cost
    - epoch_ms: the full fused train_iteration (reference config)
    - epoch_ms @ larger minibatches: the fewer-sequential-updates ablation
      (changes SGD granularity — an algorithm knob, benched not shipped)
    """
    from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv, env_step
    from leibnizgym_tpu.learning.ppo import (
        PPOConfig, init_train_state, make_networks, train_iteration,
    )
    from leibnizgym_tpu.models.networks import gaussian_neglogp

    env = TrifingerEnv(
        config={"num_instances": n, "command_mode": "torque",
                "asymmetric_obs": True, "sim": {"substeps": 4}},
        verbose=False,
    )
    static, params = env.static, env.params
    cfg = PPOConfig(minibatch_size=n, cv_minibatch_size=n)
    ts = init_train_state(cfg, static, params, jax.random.PRNGKey(0))
    actor_critic, central_value = make_networks(cfg, static)
    h = cfg.horizon

    # -- rollout-only scan (policy + cv inference + env step, h steps)
    def rollout_only(env_state, obs, states, key):
        def body(carry, _):
            env_state, obs, states, key = carry
            key, k = jax.random.split(key)
            mu, log_std, _ = actor_critic.apply(ts.ac_params, obs)
            action = mu + jnp.exp(log_std) * jax.random.normal(k, mu.shape)
            neglogp = gaussian_neglogp(mu, log_std, action)
            v = central_value.apply(ts.cv_params, states)
            env_state, obs, states, reward, done, info = env_step(
                static, params, env_state, jnp.clip(action, -1, 1)
            )
            # the cv value and neglogp must reach the scan OUTPUT or XLA
            # dead-code-eliminates them and the "rollout" under-measures
            # the path train_iteration actually runs
            out = reward[0] + v[0] + neglogp[0]
            return (env_state, jnp.clip(obs, -5, 5), states, key), out

        carry, r = jax.lax.scan(
            body, (env_state, obs, states, key), None, length=h)
        return carry[1] + r[-1, None], r

    f_roll = jax.jit(rollout_only)
    o, r = f_roll(ts.env_state, ts.obs, ts.states, ts.key)
    _ = float(o[0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        o, r = f_roll(ts.env_state, ts.obs, ts.states, ts.key)
    _ = float(o[0, 0])
    out["ppo_rollout_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)

    # -- full epoch at the shipped config and at larger minibatches
    for mb_mult, tag in ((1, "ppo_epoch_ms"), (4, "ppo_epoch_mb4_ms"),
                         (8, "ppo_epoch_mb8_ms")):
        c = PPOConfig(minibatch_size=n * mb_mult, cv_minibatch_size=n * mb_mult)
        t = init_train_state(c, static, params, jax.random.PRNGKey(0))
        step = jax.jit(train_iteration, static_argnums=(0, 1))
        t, m = step(c, static, params, t)
        _ = float(m["info/kl"])
        t0 = time.perf_counter()
        for _ in range(10):
            t, m = step(c, static, params, t)
        _ = float(m["info/kl"])
        out[tag] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
        out[tag.replace("_ms", "_updates")] = (
            c.mini_epochs * max(h * n // c.minibatch_size, 1)
        )
    out["ppo_update_path_ms"] = round(
        out["ppo_epoch_ms"] - out["ppo_rollout_ms"], 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--substeps", type=int, default=4)
    ap.add_argument("--what", default="all",
                    choices=["all", "physics", "physics_pallas", "env", "ppo"])
    args = ap.parse_args()
    n = args.num_envs

    if args.what == "ppo":
        out = {"num_envs": n}
        _bench_ppo_decomposition(n, out)
        print(json.dumps(out))
        return

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
