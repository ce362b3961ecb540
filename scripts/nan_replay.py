#!/usr/bin/env python
"""Replay a nan-halt dump (runner nan_prev_ts.pkl) step by step.

The runner's nan halt (learning/runner.py, config nan_telemetry) pickles the
last all-finite PPOTrainState. This tool replays the fatal epoch's rollout
outside the fused train_iteration, locating the first step and the exact env
whose physics state goes non-finite, and dumps that (state, action) pair to
an .npz microscope file for substep-level analysis.

Usage:
    JAX_PLATFORMS=cpu python scripts/nan_replay.py <run_logdir> [--steps 64]
    (run_logdir is the timestamped directory holding nan_prev_ts.pkl and
     env_config.yaml)
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from leibnizgym_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--steps", type=int, default=64,
                    help="max rollout steps to replay (epoch horizon is 32; "
                    "more catches nans that need a second epoch)")
    ap.add_argument("--out", default="nan_microscope.npz")
    args = ap.parse_args()

    from leibnizgym_tpu.envs import TrifingerEnv
    from leibnizgym_tpu.envs.trifinger.env import env_step
    from leibnizgym_tpu.learning.ppo import PPOConfig, make_networks

    with open(os.path.join(args.logdir, "nan_prev_ts.pkl"), "rb") as fh:
        ts = pickle.load(fh)
    with open(os.path.join(args.logdir, "env_config.yaml")) as fh:
        task_cfg = yaml.safe_load(fh)
    with open(os.path.join(args.logdir, "agent_config.yaml")) as fh:
        agent_params = yaml.safe_load(fh)

    env = TrifingerEnv(config=task_cfg, verbose=False)
    static, env_params = env.static, env.params
    cfg = PPOConfig.from_rlg_params(agent_params, static.num_envs)
    actor_critic, _ = make_networks(cfg, static)

    print(f"replaying from epoch {int(ts.epoch)} frame {int(ts.frame)} "
          f"({static.num_envs} envs) on {jax.devices()[0].platform}")

    env_state, obs, key = ts.env_state, ts.obs, ts.key

    @jax.jit
    def step(env_state, obs, key):
        key, k_act = jax.random.split(key)
        mu, log_std, _ = actor_critic.apply(ts.ac_params, obs)
        noise = jax.random.normal(k_act, mu.shape)
        action = mu + jnp.exp(log_std) * noise
        clipped = jnp.clip(action, -cfg.clip_actions, cfg.clip_actions)
        new_env_state, next_obs, next_states, reward, done, info = env_step(
            static, env_params, env_state, clipped
        )
        next_obs = jnp.clip(next_obs, -cfg.clip_obs, cfg.clip_obs)
        return new_env_state, next_obs, key, clipped, reward

    n_envs = static.num_envs

    def bad_envs(state):
        """Per-env any-nonfinite mask over all float leaves.

        Handles both layouts: env-axis-leading (N, ...) and the
        component-major ``_cm`` leaves (k, N) with the env axis LAST."""
        masks = []
        for leaf in jax.tree_util.tree_leaves(state):
            if not jnp.issubdtype(leaf.dtype, jnp.inexact):
                continue
            a = np.asarray(leaf)
            if a.ndim >= 1 and a.shape[0] == n_envs:
                flat = a.reshape(n_envs, -1)
            elif a.ndim >= 2 and a.shape[-1] == n_envs:
                flat = np.moveaxis(a, -1, 0).reshape(n_envs, -1)
            else:
                continue  # scalar leaves (frames, key) have no env axis
            masks.append(~np.isfinite(flat).all(axis=1))
        return np.logical_or.reduce(masks)

    prev_state = env_state
    for i in range(args.steps):
        new_state, obs, key, act, reward = step(env_state, obs, key)
        mask = bad_envs(new_state)
        rew_bad = ~np.isfinite(np.asarray(reward))
        if mask.any() or rew_bad.any():
            idx = int(np.argmax(mask | rew_bad))
            print(f"step {i}: {mask.sum()} envs non-finite (+{rew_bad.sum()} "
                  f"bad rewards); first bad env = {idx}")
            n = static.num_envs

            def leaves_of(tree, prefix):
                out = {}
                flat, _ = jax.tree_util.tree_flatten_with_path(tree)
                for path, leaf in flat:
                    name = prefix + "_".join(
                        str(getattr(p, "name", getattr(p, "idx", p)))
                        for p in path
                    )
                    leaf = np.asarray(leaf)
                    if leaf.ndim >= 1 and leaf.shape[0] == n:
                        out[name] = leaf[idx]
                    elif leaf.ndim >= 2 and leaf.shape[-1] == n:
                        out[name] = leaf[..., idx]  # component-major (_cm)
                    else:
                        out[name] = leaf
                return out

            np.savez(
                args.out,
                action=np.asarray(act[idx]),
                reward=float(np.asarray(reward)[idx]),
                step=i,
                env_index=idx,
                **leaves_of(prev_state, "pre_"),
                **leaves_of(new_state, "post_"),
            )
            print(f"microscope dump -> {args.out}")
            pre = leaves_of(prev_state, "")
            for name in sorted(pre):
                if pre[name].size <= 16:
                    print(f"  pre.{name} = {pre[name]}")
            return
        prev_state, env_state = new_state, new_state
    print(f"no non-finite state in {args.steps} replay steps "
          f"(platform numerics may differ from the failing device)")


if __name__ == "__main__":
    main()
