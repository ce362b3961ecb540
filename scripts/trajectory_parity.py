#!/usr/bin/env python
"""Fixed-seed trajectory dump & comparison harness.

BASELINE.md correctness config: "trifinger_difficulty_1, 64 envs,
random-action rollout, fixed-seed trajectory parity". This tool produces a
trajectory dump in a documented format and diffs two dumps — usable for
(a) regression parity between engine versions/commits of this framework and
(b) cross-simulator comparison when a matching dump from the reference
(IsaacGym) is available.

    python scripts/trajectory_parity.py dump --out /tmp/traj_a.npz
    python scripts/trajectory_parity.py dump --engine reference --out /tmp/traj_b.npz
    python scripts/trajectory_parity.py compare /tmp/traj_a.npz /tmp/traj_b.npz

Dump format (npz): per-step arrays of shape (T, N, ...):
  q (T,N,9), qd (T,N,9), cube_pos (T,N,3), cube_quat (T,N,4),
  cube_linvel (T,N,3), cube_angvel (T,N,3), obs (T,N,obs), reward (T,N),
  action (T,N,A)  + metadata in meta.json-style arrays.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from leibnizgym_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

import jax
import numpy as np

from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv
from leibnizgym_tpu.utils import print_info


def dump(args):
    config = {
        "num_instances": args.num_envs,
        "task_difficulty": args.difficulty,
        "command_mode": "torque",
        "seed": args.seed,
        "engine": args.engine,
        "sim": {"substeps": args.substeps,
                "physx": {"num_position_iterations": args.iterations,
                          "tpu_solver": args.solver}},
    }
    if args.arena:
        config["arena"] = {"profile": args.arena}
    env = TrifingerEnv(config=config, verbose=False)
    # record the RESOLVED wall profile so dumps are self-describing and
    # independent of the build's default (round-5 flip to the measured cone)
    arena_profile = (
        "cone" if float(env.params.scene_base.wall_slope) != 0.0
        else "cylinder"
    )
    obs = env.reset()
    key = jax.random.PRNGKey(args.action_seed)
    rec = {k: [] for k in ("q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                           "cube_angvel", "obs", "reward", "action")}
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        action = jax.random.uniform(
            k, (args.num_envs, env.get_action_dim()), minval=-1.0, maxval=1.0
        )
        obs, reward, dones, info = env.step(action)
        st = env.state.physics
        rec["q"].append(np.asarray(st.q))
        rec["qd"].append(np.asarray(st.qd))
        rec["cube_pos"].append(np.asarray(st.cube_pos))
        rec["cube_quat"].append(np.asarray(st.cube_quat))
        rec["cube_linvel"].append(np.asarray(st.cube_linvel))
        rec["cube_angvel"].append(np.asarray(st.cube_angvel))
        rec["obs"].append(np.asarray(obs))
        rec["reward"].append(np.asarray(reward))
        rec["action"].append(np.asarray(action))
    arrays = {k: np.stack(v) for k, v in rec.items()}
    meta = dict(
        num_envs=args.num_envs, steps=args.steps, seed=args.seed,
        action_seed=args.action_seed, difficulty=args.difficulty,
        engine=args.engine, substeps=args.substeps, iterations=args.iterations,
        solver=args.solver, arena=arena_profile, framework="leibnizgym_tpu",
    )
    np.savez_compressed(args.out, meta=json.dumps(meta), **arrays)
    print_info(f"wrote {args.out}: "
               + ", ".join(f"{k}{v.shape}" for k, v in arrays.items()))


def compare(args):
    a = np.load(args.file_a, allow_pickle=True)
    b = np.load(args.file_b, allow_pickle=True)
    meta_a, meta_b = json.loads(str(a["meta"])), json.loads(str(b["meta"]))
    print(f"A: {meta_a}\nB: {meta_b}")
    fields = [k for k in a.files if k != "meta" and k in b.files]
    worst = 0.0
    divergence_step = None
    incomparable = False
    for k in fields:
        xa, xb = a[k], b[k]
        if xa.shape != xb.shape:
            print(f"{k}: SHAPE MISMATCH {xa.shape} vs {xb.shape}")
            incomparable = True
            continue
        err = np.abs(xa - xb)
        per_step = err.reshape(err.shape[0], -1).max(axis=1)
        first_div = int(np.argmax(per_step > args.tol)) if (per_step > args.tol).any() else None
        print(f"{k}: max {err.max():.3e}  mean {err.mean():.3e}"
              + (f"  first>tol at step {first_div}" if first_div is not None else ""))
        worst = max(worst, float(err.max()))
        if first_div is not None:
            divergence_step = (first_div if divergence_step is None
                               else min(divergence_step, first_div))
    if incomparable:
        print("verdict: INCOMPARABLE (shape mismatch — different rollout configs)")
        return 2
    verdict = "PARITY" if worst <= args.tol else f"DIVERGED (step {divergence_step})"
    print(f"verdict: {verdict} (tol {args.tol}, worst {worst:.3e})")
    return 0 if worst <= args.tol else 1


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--num-envs", type=int, default=64)
    d.add_argument("--steps", type=int, default=100)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--action-seed", type=int, default=1)
    d.add_argument("--difficulty", type=int, default=1)
    d.add_argument("--engine", type=str, default="soa")
    d.add_argument("--solver", type=str, default="tgs",
                   help="tpu_solver mode recorded in the dump (tgs|pgs)")
    d.add_argument("--substeps", type=int, default=2)
    d.add_argument("--iterations", type=int, default=4)
    d.add_argument("--arena", type=str, default=None,
                   choices=("cylinder", "cone"),
                   help="wall profile (default: the build default; the "
                        "RESOLVED profile is recorded in the dump meta)")
    d.add_argument("--out", type=str, required=True)
    c = sub.add_parser("compare")
    c.add_argument("file_a")
    c.add_argument("file_b")
    c.add_argument("--tol", type=float, default=1e-4)
    args = ap.parse_args()
    if args.cmd == "dump":
        dump(args)
    else:
        sys.exit(compare(args))


if __name__ == "__main__":
    main()
