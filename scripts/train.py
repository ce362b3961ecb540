#!/usr/bin/env python
"""Training CLI — the rlg_hydra.py equivalent.

Usage (same override surface as the reference, README.md:70-97):

    python scripts/train.py gym=trifinger_difficulty_2 args.num_envs=8192
    python scripts/train.py gym=trifinger_difficulty_1 args.play=True \
        args.checkpoint=logs/<stamp>/nn/best

Hydra is replaced by an equivalent preset + dot-override parser
(leibnizgym_tpu.config.presets); wandb is optional and off by default.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from leibnizgym_tpu.utils.platform import ensure_requested_platform

ensure_requested_platform()

from leibnizgym_tpu.config.presets import parse_cli, update_cfg
from leibnizgym_tpu.learning.train import run_training
from leibnizgym_tpu.utils import print_dict, print_info


def main(argv):
    cfg = update_cfg(parse_cli(argv))
    args = cfg["args"]

    if args.get("multihost"):
        from leibnizgym_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.get("coordinator_address"),
            num_processes=args.get("num_processes"),
            process_id=args.get("process_id"),
        )

    if args["wandb_log"]:
        try:
            import wandb

            wandb.init(
                project=args["wandb_project_name"],
                config=cfg,
                sync_tensorboard=True,
                id=os.environ.get("SLURM_JOB_ID"),
                resume="allow",
            )
        except ImportError:
            print_info("wandb not installed; continuing without it")

    if args["verbose"]:
        print_info("Full configuration:")
        print_dict(cfg)

    return run_training(
        task_cfg=cfg["gym"],
        agent_cfg=cfg["rlg"],
        logdir=args["logdir"],
        seed=args["seed"],
        train=args["train"],
        checkpoint=args["checkpoint"],
        max_epochs=args["max_epochs"],
        play_steps=args["play_steps"],
        verbose=args["verbose"],
        watchdog_timeout=args.get("watchdog_timeout"),
        visualize=not args.get("headless", True),
    )


if __name__ == "__main__":
    main(sys.argv[1:])
