"""Summarize a training run's TensorBoard scalars as a progress table.

Usage:
    python scripts/run_summary.py <logdir> [--tags t1,t2,...] [--points N]

Walks the newest ``*/summaries`` event file under ``<logdir>`` (the Runner's
layout) and prints selected scalar tags downsampled to N rows — the quick
look at a run (success counts, pos/ori distance, KL, LR, episode reward)
that otherwise needs a TensorBoard server.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

DEFAULT_TAGS = [
    "rewards0/frame",
    "env/current_position_goal/count",
    "env/current_orientation_goal/count",
    "env/pos_dist_mean",
    "env/ori_dist_mean",
    "env/average_consecutive_success",
    "info/kl",
    "info/lr",
    "performance/fps",
]


def load_scalars(event_file: str, tags: list[str]) -> dict[str, list[tuple[int, float]]]:
    """Read scalar series from one event file (tensorboardX/TF event format)."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(event_file, size_guidance={"scalars": 0})
    acc.Reload()
    available = set(acc.Tags().get("scalars", []))
    out = {}
    for tag in tags:
        if tag in available:
            out[tag] = [(ev.step, ev.value) for ev in acc.Scalars(tag)]
    return out, sorted(available)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--tags", default=None, help="comma-separated scalar tags")
    ap.add_argument("--points", type=int, default=20)
    ap.add_argument("--list", action="store_true", help="list available tags")
    args = ap.parse_args()

    candidates = sorted(
        glob.glob(os.path.join(args.logdir, "**", "summaries", "events.*"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not candidates:
        candidates = sorted(glob.glob(os.path.join(args.logdir, "events.*")),
                            key=os.path.getmtime)
    if not candidates:
        sys.exit(f"no event files under {args.logdir}")
    event_file = candidates[-1]
    print(f"# {event_file}")

    tags = args.tags.split(",") if args.tags else DEFAULT_TAGS
    series, available = load_scalars(event_file, tags)
    if args.list:
        print("\n".join(available))
        return
    if not series:
        sys.exit(f"none of {tags} found; available: {available}")

    # downsample every series onto a common frame grid
    frames = sorted({s for v in series.values() for s, _ in v})
    idx = np.linspace(0, len(frames) - 1, min(args.points, len(frames))).astype(int)
    grid = [frames[i] for i in idx]
    cols = list(series)
    short = [c.split("/")[-2] + "/" + c.split("/")[-1] if "/" in c else c
             for c in cols]
    print(f"{'frame':>12} | " + " | ".join(f"{s:>18}" for s in short))
    for g in grid:
        row = []
        for c in cols:
            vals = [v for s, v in series[c] if s <= g]
            row.append(f"{vals[-1]:>18.4g}" if vals else f"{'-':>18}")
        print(f"{g:>12} | " + " | ".join(row))


if __name__ == "__main__":
    main()
