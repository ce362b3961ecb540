#!/usr/bin/env python
"""Asset tooling: derive analytic collision primitives from mesh files.

The reference ships mesh-prep scripts (split_objfile.py, convert_stl2obj.py,
convex_decomposition.py — V-HACD convex pieces for PhysX). The TPU engine
uses analytic primitives instead of convex meshes, so the equivalent tooling
derives those primitives FROM the meshes: bounding spheres (fingertips),
bounding cylinders (arena wall), and bounding boxes — the numbers baked into
models/trifinger.py (TIP_SPHERE_RADIUS, WALL_INNER_RADIUS) were produced this
way.

    python scripts/asset_tools.py sphere path/to/tip.obj
    python scripts/asset_tools.py cylinder path/to/boundary_dir/
    python scripts/asset_tools.py box path/to/cube.obj
"""

from __future__ import annotations

import argparse
import glob
import os


import numpy as np


def load_obj_vertices(path: str) -> np.ndarray:
    """Vertices of an OBJ file (or all OBJ files in a directory)."""
    paths = (
        sorted(glob.glob(os.path.join(path, "*.obj")))
        if os.path.isdir(path)
        else [path]
    )
    verts = []
    for p in paths:
        with open(p) as f:
            for line in f:
                if line.startswith("v "):
                    verts.append([float(x) for x in line.split()[1:4]])
    if not verts:
        raise ValueError(f"no vertices found under {path}")
    return np.asarray(verts)


def load_stl_vertices(path: str) -> np.ndarray:
    """Vertices of a binary STL file."""
    with open(path, "rb") as f:
        header = f.read(80)
        if header[:5] == b"solid":
            # ASCII STL
            f.seek(0)
            verts = []
            for line in f.read().decode(errors="ignore").splitlines():
                parts = line.split()
                if parts[:1] == ["vertex"]:
                    verts.append([float(x) for x in parts[1:4]])
            return np.asarray(verts)
        import struct

        (n_tri,) = struct.unpack("<I", f.read(4))
        data = np.frombuffer(f.read(n_tri * 50), dtype=np.uint8)
        tri = data.reshape(n_tri, 50)
        floats = tri[:, :48].copy().view("<f4").reshape(n_tri, 12)
        return floats[:, 3:12].reshape(-1, 3).astype(np.float64)


def load_vertices(path: str) -> np.ndarray:
    if os.path.isfile(path) and path.lower().endswith(".stl"):
        return load_stl_vertices(path)
    return load_obj_vertices(path)


def fit_sphere(verts: np.ndarray):
    center = (verts.min(0) + verts.max(0)) / 2
    radii = np.linalg.norm(verts - center, axis=1)
    return center, float(radii.max()), float(radii.mean())


def fit_cylinder(verts: np.ndarray, z_floor: float = 0.005):
    """Inner/outer radius + height of a z-aligned annular wall."""
    above = verts[verts[:, 2] > z_floor]
    rho = np.hypot(above[:, 0], above[:, 1])
    return float(rho.min()), float(rho.max()), float(above[:, 2].max())


def fit_box(verts: np.ndarray):
    lo, hi = verts.min(0), verts.max(0)
    return lo, hi, hi - lo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["sphere", "cylinder", "box"])
    ap.add_argument("path")
    args = ap.parse_args()
    verts = load_vertices(args.path)
    print(f"{len(verts)} vertices from {args.path}")
    if args.kind == "sphere":
        center, r_max, r_mean = fit_sphere(verts)
        print(f"bounding sphere: center {np.round(center, 5).tolist()} "
              f"r_max {r_max:.5f} r_mean {r_mean:.5f}")
    elif args.kind == "cylinder":
        r_in, r_out, height = fit_cylinder(verts)
        print(f"wall cylinder: inner_radius {r_in:.4f} outer_radius {r_out:.4f} "
              f"height {height:.4f}")
    else:
        lo, hi, size = fit_box(verts)
        print(f"bounding box: min {np.round(lo, 5).tolist()} "
              f"max {np.round(hi, 5).tolist()} size {np.round(size, 5).tolist()}")


if __name__ == "__main__":
    main()
