#!/usr/bin/env python
"""Render a training run's TensorBoard scalars to a RESULTS-ready PNG.

The reference repo ships a TensorBoard screenshot of its difficulty-1 run
(/root/reference/images/trifinger_vanilla_train.png, referenced in SURVEY §6);
this produces the equivalent artifact from our own event files — small
multiples of episode reward, success counts, goal distances, and (when
present) the curriculum level, all against env frames.

Usage:
    python scripts/plot_training.py <logdir> [--out images/run_train.png]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from run_summary import load_scalars  # noqa: E402


def find_event_file(logdir: str) -> str | None:
    """Newest TB event file under the Runner's <stamp>/summaries layout."""
    candidates = sorted(
        glob.glob(os.path.join(logdir, "**", "summaries", "events.*"),
                  recursive=True),
        key=os.path.getmtime,
    ) or sorted(glob.glob(os.path.join(logdir, "events.*")),
                key=os.path.getmtime)
    return candidates[-1] if candidates else None

# chart tokens (light surface; palette validated by the design-system checks)
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e6e5e2"
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]  # fixed order, never cycled

# (panel title, [(tag, label)], y-label)
PANELS = [
    ("Episode reward", [("rewards0/frame", None)], "mean episode reward"),
    ("Successes per step (of N envs)",
     [("env/current_position_goal/count", "position"),
      ("env/current_orientation_goal/count", "orientation")], "count"),
    ("Goal distance", [("env/pos_dist_mean", "position (m)"),
                       ("env/ori_dist_mean", "orientation (rad)")], "mean distance"),
    ("Curriculum level", [("curriculum/level_target", None)], "level (0-1)"),
    ("Successes per finished episode", [("curriculum/success_per_episode", None)],
     "successes / episode"),
    ("Throughput", [("performance/fps", None)], "env frames / s"),
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdir")
    ap.add_argument("--out", default=None, help="output PNG (default images/<run>_train.png)")
    ap.add_argument("--smooth", type=int, default=21,
                    help="odd moving-average window for noisy series (1 = off)")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    event_file = find_event_file(args.logdir)
    if not event_file:
        print(f"no event file under {args.logdir}", file=sys.stderr)
        return 1
    tags = [t for _, specs, _ in PANELS for t, _ in specs]
    # frames axis: rewards0/frame is logged with step = env frames
    data, _available = load_scalars(event_file, tags)

    panels = [(title, [(t, lbl) for t, lbl in specs if data.get(t)], ylab)
              for title, specs, ylab in PANELS]
    panels = [p for p in panels if p[1]]
    ncol = 3
    nrow = (len(panels) + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(4.2 * ncol, 3.0 * nrow),
                             facecolor=SURFACE, squeeze=False)

    def smooth(y: np.ndarray) -> np.ndarray:
        w = args.smooth
        if w <= 1 or len(y) < 3 * w:
            return y
        k = np.ones(w) / w
        return np.convolve(y, k, mode="same") / np.convolve(np.ones_like(y), k, mode="same")

    for ax, (title, specs, ylab) in zip(axes.flat, panels):
        ax.set_facecolor(SURFACE)
        for i, (tag, label) in enumerate(specs):
            pts = np.asarray(data[tag], dtype=float)
            steps, vals = pts[:, 0], smooth(pts[:, 1])
            ax.plot(steps / 1e6, vals, color=SERIES[i], lw=2.0,
                    label=label, solid_capstyle="round")
        ax.set_title(title, color=TEXT, fontsize=11, loc="left")
        ax.set_xlabel("env frames (M)", color=TEXT_2, fontsize=9)
        ax.set_ylabel(ylab, color=TEXT_2, fontsize=9)
        ax.grid(True, color=GRID, lw=0.6)
        ax.tick_params(colors=TEXT_2, labelsize=8)
        for s in ax.spines.values():
            s.set_visible(False)
        if len(specs) > 1:
            ax.legend(frameon=False, fontsize=8, labelcolor=TEXT_2)
    for ax in axes.flat[len(panels):]:
        ax.set_visible(False)

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "images",
        os.path.basename(os.path.normpath(args.logdir)) + "_train.png")
    out_dir = os.path.dirname(out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, dpi=130, facecolor=SURFACE)
    print(f"wrote {out} ({len(panels)} panels from {event_file})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
