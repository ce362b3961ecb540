#!/usr/bin/env python
"""Bake the framework's self-contained asset set into resources/assets/.

The reference ships ~225 asset files (URDFs + meshes, SURVEY.md §2.2); the
TPU build's engine consumes model TABLES, not meshes, so its asset set is a
collection of clean-room URDFs serialized from those tables:

- robots/: every robot variant of the trifinger family, exported via
  models.urdf.export_chain_urdf from the ChainModel tables (parsed once from
  the reference mount when available; the committed files are the shipped
  assets and tests run against them without the mount).
- objects/: the task objects (cube variants, ball) written from their spec
  constants (box size / density / mass — reference objects/urdf/*.urdf).
- stage/: the arena as the analytic geometry the engine actually simulates
  (table plane + boundary cylinder of ARENA_RADIUS), replacing the
  reference's 40-piece V-HACD convex decomposition.

Run with the reference mounted to (re)generate robots/; objects/ and stage/
are written unconditionally from constants.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ASSETS = os.path.join(REPO, "resources", "assets")
_REF_URDF = (
    "/root/reference/resources/assets/trifinger/robot_properties_fingers/urdf"
)

# (reference variant path, shipped name)
ROBOT_VARIANTS = [
    ("pro/trifingerpro.urdf", "trifingerpro.urdf"),
    ("pro/fingerpro.urdf", "fingerpro.urdf"),
    ("pro/trifingerpro_with_stage.urdf", "trifingerpro_with_stage.urdf"),
    ("edu/trifingeredu.urdf", "trifingeredu.urdf"),
    ("edu/fingeredu.urdf", "fingeredu.urdf"),
    ("edu/trifingeredu_with_stage.urdf", "trifingeredu_with_stage.urdf"),
    ("trifinger.urdf", "trifinger.urdf"),
    ("trifinger_with_stage.urdf", "trifinger_with_stage.urdf"),
    ("finger.urdf", "finger.urdf"),
    ("finger_with_stage.urdf", "finger_with_stage.urdf"),
]

# Task objects: (filename, kind, size, mass_or_density)
# Spec constants from the reference's objects/urdf/ (SURVEY.md §2.2); these
# numbers ARE the task spec (object dims drive reward/obs scales).
OBJECTS = [
    ("cube_multicolor_rrc.urdf", "box", 0.065, ("density", 291.3)),
    ("cube_goal_multicolor.urdf", "box", 0.05, ("density", 567.0)),
    ("cube_multicolor.urdf", "box", 0.065, ("density", 291.3)),
    ("ball.urdf", "sphere", 0.0375, ("mass", 0.25)),
]


def write_object_urdf(path: str, kind: str, size: float, massing) -> None:
    name = os.path.splitext(os.path.basename(path))[0]
    if kind == "box":
        geom = f'<box size="{size} {size} {size}"/>'
        volume = size ** 3
    else:
        geom = f'<sphere radius="{size}"/>'
        volume = 4.0 / 3.0 * 3.141592653589793 * size ** 3
    how, value = massing
    mass = value if how == "mass" else value * volume
    # solid uniform body inertia about COM
    if kind == "box":
        i = mass * (size ** 2 + size ** 2) / 12.0
        ixx = iyy = izz = i
    else:
        ixx = iyy = izz = 2.0 / 5.0 * mass * size ** 2
    density_el = (
        f"\n      <density value=\"{value}\"/>" if how == "density" else ""
    )
    body = f"""<?xml version="1.0"?>
<robot name="{name}">
  <link name="object">
    <inertial>{density_el}
      <mass value="{mass:.10g}"/>
      <inertia ixx="{ixx:.10g}" iyy="{iyy:.10g}" izz="{izz:.10g}"
               ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <geometry>{geom}</geometry>
    </collision>
  </link>
</robot>
"""
    with open(path, "w") as f:
        f.write(body)


def write_stage_urdf(path: str) -> None:
    from leibnizgym_tpu.envs.trifinger.dims import ARENA_RADIUS

    body = f"""<?xml version="1.0"?>
<robot name="trifinger_stage_tpu">
  <!-- analytic arena the TPU engine simulates: table plane at z=0 plus a
       boundary cylinder wall of ARENA_RADIUS (reference utils.py:54);
       replaces high_table_boundary.urdf's 40 V-HACD convex pieces -->
  <link name="table">
    <collision>
      <origin xyz="0 0 -0.005"/>
      <geometry><box size="1.0 1.0 0.01"/></geometry>
    </collision>
  </link>
  <link name="boundary">
    <collision>
      <origin xyz="0 0 0.15"/>
      <geometry><cylinder radius="{ARENA_RADIUS}" length="0.3"/></geometry>
    </collision>
  </link>
  <joint name="table_to_boundary" type="fixed">
    <parent link="table"/>
    <child link="boundary"/>
    <origin xyz="0 0 0"/>
  </joint>
</robot>
"""
    with open(path, "w") as f:
        f.write(body)


def main() -> int:
    from leibnizgym_tpu.models.chain import chain_from_urdf
    from leibnizgym_tpu.models.urdf import (
        export_chain_urdf,
        export_trifinger_urdf,
    )

    for sub in ("robots", "objects", "stage"):
        os.makedirs(os.path.join(ASSETS, sub), exist_ok=True)

    for fname, kind, size, massing in OBJECTS:
        path = os.path.join(ASSETS, "objects", fname)
        write_object_urdf(path, kind, size, massing)
        print(f"wrote {os.path.relpath(path, REPO)}")

    write_stage_urdf(os.path.join(ASSETS, "stage", "trifinger_stage_tpu.urdf"))
    print("wrote resources/assets/stage/trifinger_stage_tpu.urdf")

    # canonical env robot (from baked tables; no reference needed)
    export_trifinger_urdf(os.path.join(ASSETS, "trifinger_tpu.urdf"))
    print("wrote resources/assets/trifinger_tpu.urdf")

    if not os.path.isdir(_REF_URDF):
        print("reference mount absent: keeping committed robots/ as-is")
        return 0

    for ref_rel, out_name in ROBOT_VARIANTS:
        chain = chain_from_urdf(os.path.join(_REF_URDF, ref_rel))
        out = os.path.join(ASSETS, "robots", out_name)
        export_chain_urdf(chain, out)
        print(f"wrote {os.path.relpath(out, REPO)} "
              f"({chain.num_fingers} finger(s))")
    return 0


if __name__ == "__main__":
    sys.exit(main())
