#!/usr/bin/env python
"""On-chip probe for the pallas-engine vreg layout (1d vs 2d).

Runs SACRIFICIALLY (wrap in `timeout`; the round-3 2d compile attempt wedged
the remote-compile tunnel). In one process: compiles + times the bare pallas
physics step under the env-default solver config for each requested layout
(monkeypatching pallas_engine.LAYOUT between runs), checks on-chip numerical
equivalence of the first step, and prints one JSON line per configuration.

Usage:
    timeout 1200 python scripts/probe_layout.py --tiles 1024 2048 \
        --layouts 1d 2d --substeps 4
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
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--substeps", type=int, default=4)
    ap.add_argument("--tiles", type=int, nargs="+", default=[2048])
    ap.add_argument("--layouts", nargs="+", default=["1d", "2d"])
    # long windows: each timed window pays ONE blocking tunnel round trip
    # (~26 ms measured); 1000 steps amortize it below 5% (bench.py)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--length", type=int, default=100)
    args = ap.parse_args()
    n = args.num_envs

    from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv
    from leibnizgym_tpu.ops import pallas_engine as pe
    from leibnizgym_tpu.ops.types import PhysicsState, SceneParams

    env = TrifingerEnv(
        config={"num_instances": n, "command_mode": "torque",
                "asymmetric_obs": True, "sim": {"substeps": args.substeps}},
        verbose=False,
    )
    cfg = env.static.solver

    rng = np.random.default_rng(3)
    state0 = PhysicsState.default((n,)).replace(
        q=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 9)).astype(np.float32)),
        qd=jnp.asarray(rng.uniform(-1, 1, (n, 9)).astype(np.float32)),
        cube_pos=jnp.asarray(np.stack(
            [rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
             rng.uniform(0.03, 0.08, n)], -1).astype(np.float32)),
        cube_linvel=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)),
        cube_angvel=jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32)),
    )
    scene = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)),
        SceneParams.default(),
    )
    tau = jnp.asarray(rng.uniform(-0.36, 0.36, (n, 9)).astype(np.float32))

    reference_q = {}
    for tile in args.tiles:
        for layout in args.layouts:
            pe.TILE = tile
            pe.LAYOUT = layout
            pe.physics_step_pallas.clear_cache()
            out = {"tile": tile, "layout": layout, "substeps": args.substeps,
                   "num_envs": n, "solver_type": cfg.solver_type,
                   "iterations": cfg.solver_iterations}
            try:
                t0 = time.perf_counter()
                step = jax.jit(
                    lambda s: jax.lax.scan(
                        lambda c, _: (pe.physics_step_pallas(
                            c, tau, scene, cfg, 0.02)[0], None),
                        s, None, length=args.length)[0]
                ).lower(state0).compile()
                out["compile_s"] = round(time.perf_counter() - t0, 1)
                # single-step output for cross-layout equivalence
                s1, _ = pe.physics_step_pallas(state0, tau, scene, cfg, 0.02)
                q1 = np.asarray(s1.q)
                if tile in reference_q:
                    out["max_abs_diff_vs_first_layout"] = float(
                        np.abs(q1 - reference_q[tile]).max())
                else:
                    reference_q[tile] = q1
                carry = step(state0)
                _ = float(carry.q[0, 0])  # force materialization
                t0 = time.perf_counter()
                for _ in range(args.rounds):
                    carry = step(carry)
                _ = float(carry.q[0, 0])
                dt = (time.perf_counter() - t0) / (args.rounds * args.length)
                out["step_ms"] = round(dt * 1e3, 4)
                out["steps_per_s"] = round(n / dt)
            except Exception as e:
                out["error"] = f"{type(e).__name__}: {e}"[:300]
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
