#!/usr/bin/env python
"""Multi-seed training overlay: one panel per scalar, one line per seed.

Companion to plot_training.py (same surface/ink/series tokens — the
repo's validated categorical theme, fixed order) for the round-5
multi-seed D4 validation: curriculum level and episode reward vs frames
for each seed's merged (restart-aware) event stream.

Usage:
    python scripts/plot_multiseed.py runs/r5/d4_s7 runs/r5/d4_s42 \
        runs/r5/d4_s123 --labels "seed 7" "seed 42" "seed 123" \
        --out images/trifinger_d4_multiseed_train.png
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from run_summary import load_scalars  # noqa: E402
from plot_training import GRID, SERIES, SURFACE, TEXT, TEXT_2  # noqa: E402

PANELS = [
    ("Curriculum level", "curriculum/level_target", "level (0-1)"),
    ("Episode reward", "rewards0/frame", "mean episode reward"),
]


def merged_scalars(logdir: str, tags):
    """Scalars merged across ALL event files (supervisor restarts), by step.

    A restart resumes from a checkpoint that lags the crash by up to
    save_frequency epochs, so the resumed event file RE-LOGS those steps
    with different values; keep only the newest file's point per step
    (later files win) or the overlap draws as a sawtooth."""
    out = {t: {} for t in tags}
    for f in sorted(glob.glob(
            os.path.join(logdir, "**", "summaries", "events.*"),
            recursive=True), key=os.path.getmtime):
        data, _ = load_scalars(f, tags)
        for t in tags:
            for step, val in data.get(t) or []:
                out[t][step] = val  # later event files overwrite
    return {t: sorted(d.items()) for t, d in out.items()}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdirs", nargs="+")
    ap.add_argument("--labels", nargs="*", default=None)
    ap.add_argument("--out", default="images/multiseed_train.png")
    ap.add_argument("--smooth", type=int, default=21)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = args.labels or [os.path.basename(d.rstrip("/")) for d in args.logdirs]
    if len(args.logdirs) > len(SERIES):
        print(f"warning: {len(args.logdirs)} runs > {len(SERIES)} series "
              "colors — colors will repeat", file=sys.stderr)
    tags = [t for _, t, _ in PANELS]
    runs = [merged_scalars(d, tags) for d in args.logdirs]

    fig, axes = plt.subplots(
        1, len(PANELS), figsize=(5.2 * len(PANELS), 3.6), facecolor=SURFACE
    )
    for ax, (title, tag, ylab) in zip(np.atleast_1d(axes), PANELS):
        ax.set_facecolor(SURFACE)
        for i, (run, label) in enumerate(zip(runs, labels)):
            pts = run.get(tag) or []
            if not pts:
                continue
            x = np.array([p[0] for p in pts], float) / 1e9
            y = np.array([p[1] for p in pts], float)
            if args.smooth > 1 and len(y) > args.smooth and "level" not in tag:
                k = args.smooth
                # edge-corrected moving average (mode="same" with a ones
                # kernel fabricates a dip at the ends)
                y = (np.convolve(y, np.ones(k), mode="same")
                     / np.convolve(np.ones_like(y), np.ones(k), mode="same"))
            ax.plot(x, y, color=SERIES[i % len(SERIES)], lw=2, label=label)
        ax.set_title(title, color=TEXT, fontsize=11, loc="left")
        ax.set_xlabel("env frames (billions)", color=TEXT_2, fontsize=9)
        ax.set_ylabel(ylab, color=TEXT_2, fontsize=9)
        ax.grid(color=GRID, lw=0.8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.tick_params(colors=TEXT_2, labelsize=8)
        ax.legend(frameon=False, fontsize=8, labelcolor=TEXT_2)
    fig.tight_layout()
    fig.savefig(args.out, dpi=160, facecolor=SURFACE)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
