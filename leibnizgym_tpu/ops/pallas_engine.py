"""Pallas TPU mega-kernel for the physics substep loop.

One `pallas_call` advances a TILE of envs through ALL substeps of a control
step: state loads from HBM to VMEM once, every substep's ~8k scalar ops run
on (TILE,)-shaped registers (TILE=1024 = one native 8x128 vector register
per quantity), and results store once. This removes the per-substep HBM
round-trips and kernel-launch boundaries the XLA-fused engine still pays.

The physics itself is the SAME code as engine_v2 (`_substep_fields`) — the
scalar-component formulation is Pallas-ready by construction: inside the
kernel, state/params fields are tuples of (TILE,) vectors and the core
function never notices. Numerical equivalence is enforced by tests.

Data layout: component-major (C, N) f32 arrays
  state  (31, N): q(9) | qd(9) | cube_pos(3) | cube_quat(4) | v(3) | w(3)
  params (PARAM_ROWS, N): see _PARAM_FIELDS (one row per scalar component)
  tau    (9, N); outputs: state' (31, N), tip wrench impulses (18, N)
"""

from __future__ import annotations

import functools
import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leibnizgym_tpu.ops.engine_v2 import _substep_fields
from leibnizgym_tpu.ops.types import PhysicsState, SceneParams, SolverConfig

# Envs per kernel instance. Each quantity is TILE/1024 native 8x128 f32
# vregs; round-3 on-chip sweep (RESULTS.md), per 8192-env substeps=4 step:
# 512 -> 1.08 ms, 1024 -> 0.66 ms, 2048 -> 0.56 ms, >=4096 -> compile
# failure (VMEM). Round-4 re-measurement (2d layout): 1024 -> 0.68 ms,
# 2048 -> 0.58 ms. 2048 ships as the default; batches smaller than a tile
# use a 1024 floor (keeps interpret-mode tests cheap). Overridable for
# tuning on other TPU generations.
TILE = int(os.environ.get("LEIBNIZ_PALLAS_TILE", "2048"))
_TILE_FLOOR = 1024

# Vector-register layout of the env axis inside the kernel. "2d" views each
# tile of envs as (8, tile/8) so every per-env quantity fills all 8 sublanes
# of the native (8, 128) f32 vregs; "1d" keeps (tile,) rows. Pure relabeling
# of the env axis — bit-identical results (equivalence tests cover both;
# on-chip max_abs_diff was exactly 0.0, scripts/probe_layout.py). Round-4
# on-chip sweep with RTT-amortized 1000-step windows (v5e, 8192 envs,
# substeps=4, TGS): 2d and 1d are within noise of each other at both tiles
# (0.3565 vs 0.3572 ms at TILE=2048) — Mosaic already packs the 1d rows
# across sublanes, so the 8x occupancy win the layout was designed for does
# not materialize. 2d ships as the default (marginally ahead at the shipped
# tile); the negative result is recorded in RESULTS.md.
LAYOUT = os.environ.get("LEIBNIZ_PALLAS_LAYOUT", "2d")
SUBLANES = 8


def _effective_tile(n: int) -> int:
    return TILE if n > _TILE_FLOOR else min(TILE, _TILE_FLOOR)


STATE_ROWS = 31
WRENCH_ROWS = 18

# (field name, length) in packing order; every entry is per-env batched
_PARAM_FIELDS = (
    ("gravity", 3),
    ("link_masses", 3),
    ("joint_damping", 3),
    ("armature", 3),
    ("velocity_limit", 1),
    ("cube_mass", 1),
    ("cube_half_extents", 3),
    ("cube_inertia", 3),
    ("cube_linear_damping", 1),
    ("cube_angular_damping", 1),
    ("mu_tip_cube", 1),
    ("mu_cube_ground", 1),
    ("mu_cube_wall", 1),
    ("mu_tip_ground", 1),
    ("restitution_tip_cube", 1),
    ("restitution_cube_ground", 1),
    ("restitution_tip_ground", 1),
    ("tip_radius", 1),
    ("bounce_threshold", 1),
    ("wall_radius", 1),
    ("wall_slope", 1),
    ("wall_knee_z", 1),
    ("mu_tip_wall", 1),
    ("restitution_tip_wall", 1),
    ("mu_link_cube", 1),
    ("restitution_link_cube", 1),
    ("mu_torsion", 1),
    ("torsion_patch_radius", 1),
)
PARAM_ROWS = sum(k for _, k in _PARAM_FIELDS)


def pack_state(ps: PhysicsState) -> jax.Array:
    """(N,)-batched PhysicsState -> (31, N)."""
    return jnp.concatenate(
        [ps.q.T, ps.qd.T, ps.cube_pos.T, ps.cube_quat.T,
         ps.cube_linvel.T, ps.cube_angvel.T], axis=0
    )


def unpack_state(arr: jax.Array) -> PhysicsState:
    return PhysicsState(
        q=arr[0:9].T, qd=arr[9:18].T, cube_pos=arr[18:21].T,
        cube_quat=arr[21:25].T, cube_linvel=arr[25:28].T, cube_angvel=arr[28:31].T,
    )


def pack_params(sp: SceneParams, n: int) -> jax.Array:
    """(N,)-batched (or broadcastable) SceneParams -> (PARAM_ROWS, N)."""
    rows = []
    for name, k in _PARAM_FIELDS:
        leaf = jnp.asarray(getattr(sp, name))
        if k == 1:
            # scalar field: () unbatched or (n,) batched
            rows.append(jnp.broadcast_to(leaf, (n,))[None, :])
        else:
            # vector field: (k,) unbatched or (n, k) batched
            if leaf.ndim == 1:
                leaf = jnp.broadcast_to(leaf, (n, k))
            rows.append(leaf.T)
    return jnp.concatenate(rows, axis=0)


def _kernel(cfg: SolverConfig, h: float, state_ref, params_ref, tau_ref,
            out_ref, wrench_ref):
    # unpack rows into component tuples of (TILE,) or (8, TILE/8) vectors —
    # the physics core is elementwise over envs, so it never sees the shape
    rows = [state_ref[i] for i in range(STATE_ROWS)]
    state = SimpleNamespace(
        q=tuple(rows[0:9]),
        qd=tuple(rows[9:18]),
        cube_pos=tuple(rows[18:21]),
        cube_quat=tuple(rows[21:25]),
        cube_linvel=tuple(rows[25:28]),
        cube_angvel=tuple(rows[28:31]),
    )
    tau = tuple(tau_ref[i] for i in range(9))
    p_rows = [params_ref[i] for i in range(PARAM_ROWS)]
    fields = {}
    off = 0
    for name, k in _PARAM_FIELDS:
        fields[name] = tuple(p_rows[off:off + k]) if k > 1 else p_rows[off]
        off += k
    params = SimpleNamespace(**fields)

    zero = jnp.zeros_like(rows[0])
    carry0 = (
        state.q + state.qd + state.cube_pos + state.cube_quat
        + state.cube_linvel + state.cube_angvel
        + tuple(zero for _ in range(WRENCH_ROWS))
    )

    def body(_, carry):
        s = SimpleNamespace(
            q=carry[0:9], qd=carry[9:18], cube_pos=carry[18:21],
            cube_quat=carry[21:25], cube_linvel=carry[25:28],
            cube_angvel=carry[28:31],
        )
        acc = carry[31:31 + WRENCH_ROWS]
        q, qd, pos, quat, v, w, tip_imp, tip_timp = _substep_fields(
            s, tau, params, cfg, h
        )
        imp_flat = tuple(tip_imp[f][i] for f in range(3) for i in range(3))
        timp_flat = tuple(tip_timp[f][i] for f in range(3) for i in range(3))
        new_acc = tuple(
            acc[j] + (imp_flat + timp_flat)[j] for j in range(WRENCH_ROWS)
        )
        return q + qd + pos + quat + v + w + new_acc

    carry = jax.lax.fori_loop(0, cfg.substeps, body, carry0)
    for i in range(STATE_ROWS):
        out_ref[i] = carry[i]
    for j in range(WRENCH_ROWS):
        wrench_ref[j] = carry[STATE_ROWS + j]


@functools.partial(
    jax.jit, static_argnames=("cfg", "dt", "interpret")
)
def physics_step_pallas(
    state: PhysicsState,
    tau: jax.Array,
    params: SceneParams,
    cfg: SolverConfig,
    dt: float = 0.02,
    interpret: bool = False,
):
    """Drop-in batched replacement for vmap(physics_step_v2).

    Args: state (N,)-batched, tau (N, 9), params batched or broadcastable.
    Returns (new_state, tip_wrench (N, 3, 6)).
    """
    n = state.q.shape[0]
    tile = _effective_tile(n)
    pad = (-n) % tile
    np_ = n + pad

    packed = pack_state(state)
    tau_t = tau.T
    pparams = pack_params(params, n)
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
        tau_t = jnp.pad(tau_t, ((0, 0), (0, pad)))
        # pad params with the LAST env's values (avoids zero mass/inertia nans)
        pparams = jnp.concatenate(
            [pparams, jnp.repeat(pparams[:, -1:], pad, axis=1)], axis=1
        )
        # quat must stay unit in the padding
        packed = packed.at[24, n:].set(1.0)

    h = dt / cfg.substeps
    grid = (np_ // tile,)
    kernel = functools.partial(_kernel, cfg, h)
    two_d = LAYOUT == "2d" and tile % SUBLANES == 0
    if two_d:
        # view the padded env axis as (8, np_/8): flat env j sits at
        # (j // (np_/8), j % (np_/8)); the inverse reshape after the call
        # restores the order exactly, so this is a pure register-layout
        # change (all 8 sublanes of every f32 vreg carry live envs)
        lanes = tile // SUBLANES
        cols = np_ // SUBLANES

        def _block(rows_):
            return pl.BlockSpec((rows_, SUBLANES, lanes), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)

        packed = packed.reshape(STATE_ROWS, SUBLANES, cols)
        pparams = pparams.reshape(PARAM_ROWS, SUBLANES, cols)
        tau_t = tau_t.reshape(9, SUBLANES, cols)
        out_shapes = (
            jax.ShapeDtypeStruct((STATE_ROWS, SUBLANES, cols), jnp.float32),
            jax.ShapeDtypeStruct((WRENCH_ROWS, SUBLANES, cols), jnp.float32),
        )
    else:
        def _block(rows_):
            return pl.BlockSpec((rows_, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        out_shapes = (
            jax.ShapeDtypeStruct((STATE_ROWS, np_), jnp.float32),
            jax.ShapeDtypeStruct((WRENCH_ROWS, np_), jnp.float32),
        )
    out, wrench = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[_block(STATE_ROWS), _block(PARAM_ROWS), _block(9)],
        out_specs=(_block(STATE_ROWS), _block(WRENCH_ROWS)),
        interpret=interpret,
    )(packed, pparams, tau_t)

    if two_d:
        out = out.reshape(STATE_ROWS, np_)
        wrench = wrench.reshape(WRENCH_ROWS, np_)
    if pad:
        out = out[:, :n]
        wrench = wrench[:, :n]
    new_state = unpack_state(out)
    tip_wrench = jnp.stack(
        [
            jnp.stack([wrench[3 * f + i] for i in range(3)]
                      + [wrench[9 + 3 * f + i] for i in range(3)], axis=-1)
            for f in range(3)
        ],
        axis=1,
    ) / dt
    return new_state, tip_wrench
