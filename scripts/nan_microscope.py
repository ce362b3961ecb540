#!/usr/bin/env python
"""Single-env, single-step replay of a nan_replay.py microscope dump.

Rebuilds the exact pre-NaN EnvState for the one bad env from the .npz that
``scripts/nan_replay.py`` wrote, re-runs env_step on the current platform
(CPU by default — local, fast, debuggable), and if the blowup reproduces,
walks the physics substeps one by one printing per-stage finiteness and
magnitudes.

Usage:
    JAX_PLATFORMS=cpu python scripts/nan_microscope.py <dump.npz> <run_logdir>
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
import numpy as np
import yaml


def build_state(d, env, prefix="pre_"):
    """Reconstruct a 1-env EnvState from npz leaves named by tree path."""
    from leibnizgym_tpu.envs.trifinger.env import env_reset

    template, _ = env_reset(env.static, env.params, jax.random.PRNGKey(0))

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        name = prefix + "_".join(
            str(getattr(p, "name", getattr(p, "idx", p))) for p in path
        )
        if name not in d:
            raise KeyError(f"{name} missing from dump")
        v = jnp.asarray(d[name])
        # template leaves are batched (1, ...) row-major or (..., 1)
        # component-major (_cm, env axis last) — or unbatched scalars like
        # `frames`/broadcast scene scalars; dump leaves are per-env.
        if leaf.ndim == v.ndim + 1 and leaf.shape[0] == 1:
            v = v[None]
        elif leaf.ndim == v.ndim + 1 and leaf.shape[-1] == 1:
            v = v[..., None]
        v = v.astype(leaf.dtype)
        assert v.shape == leaf.shape, (name, v.shape, leaf.shape)
        leaves.append(v)
    return jax.tree_util.tree_unflatten(treedef, [l for _, l in flat]), \
        jax.tree_util.tree_unflatten(treedef, leaves)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("logdir")
    args = ap.parse_args()

    from leibnizgym_tpu.envs import TrifingerEnv
    from leibnizgym_tpu.envs.trifinger.env import env_step

    d = np.load(args.dump)
    with open(os.path.join(args.logdir, "env_config.yaml")) as fh:
        task_cfg = yaml.safe_load(fh)
    task_cfg["num_instances"] = 1

    env = TrifingerEnv(config=task_cfg, verbose=False)
    _, state = build_state(d, env)
    action = jnp.asarray(d["action"])[None]

    print(f"platform={jax.devices()[0].platform}  engine={env.static.engine}")
    new_state, obs, states, reward, done, info = jax.jit(
        env_step, static_argnums=0
    )(env.static, env.params, state, action)

    bad = [
        "_".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        for path, leaf in jax.tree_util.tree_flatten_with_path(new_state)[0]
        if jnp.issubdtype(leaf.dtype, jnp.inexact)
        and not bool(jnp.isfinite(leaf).all())
    ]
    print("reward:", float(reward[0]), " nonfinite fields:", bad or "none")
    if not bad:
        print("did NOT reproduce on this platform/engine")
        return

    # ---- substep walk on the raw engine (unbatched scalar core) ------------
    from leibnizgym_tpu.ops import engine_v2

    cfg = env.static.solver
    print("solver config:", cfg)
    unbatch = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)  # noqa: E731
    phys = unbatch(state.physics)
    scene1 = unbatch(state.scene)
    torque = unbatch(new_state.applied_torque)  # post-PD, finite per dump
    print("applied torque:", np.asarray(torque))
    h = env.static.dt / cfg.substeps
    sub = jax.jit(lambda p, t: engine_v2._substep_scalar(p, t, scene1, cfg, h))
    for i in range(cfg.substeps * env.static.control_decimation):
        phys_new, _imp_f, _imp_t = sub(phys, torque)
        flags = {
            f: bool(jnp.isfinite(getattr(phys_new, f)).all())
            for f in ("q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                      "cube_angvel")
        }
        print(f"substep {i}: " + "  ".join(
            f"{k}={'ok' if v else 'NAN'}" for k, v in flags.items()
        ))
        if not all(flags.values()):
            for f in ("q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                      "cube_angvel"):
                print(f"  pre  {f} = {np.asarray(getattr(phys, f))}")
                print(f"  post {f} = {np.asarray(getattr(phys_new, f))}")
            break
        phys = phys_new


if __name__ == "__main__":
    main()
