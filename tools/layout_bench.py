#!/usr/bin/env python
"""Microbenchmark: batch-first vs batch-last layouts for physics patterns.

The physics state is small per env (~60 floats) but the math is dense in tiny
(3,) / (3,3) quantities. On TPU the minor-most dim maps to the 128-wide lane
axis: batch-first (N, 3, 3) arrays waste ~42x of each vector register, while
batch-last (3, 3, N) puts the env batch on lanes — perfect utilization.
This tool measures the real gap on the attached chip to justify (or reject)
an SoA engine rewrite.

Run:  python tools/layout_bench.py            (on the TPU)
      JAX_PLATFORMS=cpu python tools/layout_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = 8192
REPS = 60  # chained op repetitions inside one jit


def timeit(name, f, *args, n=20):
    jf = jax.jit(f)
    out = jf(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s}: {dt*1e3:8.3f} ms")
    return dt


def main():
    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    # --- pattern 1: matvec chains (rotation composition), AoS vs SoA -------
    m_first = jax.random.normal(k1, (N, 3, 3))
    v_first = jax.random.normal(k2, (N, 3))

    def aos_matvec_chain(m, v):
        for _ in range(REPS):
            v = jnp.einsum("nij,nj->ni", m, v)
            v = v / (1.0 + jnp.sum(v * v, axis=-1, keepdims=True))
        return v

    m_last = jnp.transpose(m_first, (1, 2, 0))  # (3, 3, N)
    v_last = jnp.transpose(v_first, (1, 0))  # (3, N)

    def soa_matvec_chain(m, v):
        for _ in range(REPS):
            v = jnp.stack(
                [
                    m[0, 0] * v[0] + m[0, 1] * v[1] + m[0, 2] * v[2],
                    m[1, 0] * v[0] + m[1, 1] * v[1] + m[1, 2] * v[2],
                    m[2, 0] * v[0] + m[2, 1] * v[1] + m[2, 2] * v[2],
                ]
            )
            v = v / (1.0 + (v[0] * v[0] + v[1] * v[1] + v[2] * v[2]))
        return v

    t_aos = timeit("matvec chain AoS (N,3,3)x(N,3)", aos_matvec_chain, m_first, v_first)
    t_soa = timeit("matvec chain SoA (3,3,N)x(3,N)", soa_matvec_chain, m_last, v_last)
    print(f"  -> SoA speedup: {t_aos / t_soa:.1f}x")

    # --- pattern 2: cross-product + dot chains (contact math) --------------
    a_first = jax.random.normal(k3, (N, 3))
    b_first = v_first

    def aos_cross_chain(a, b):
        for _ in range(REPS):
            c = jnp.cross(a, b)
            s = jnp.sum(c * b, axis=-1, keepdims=True)
            a = c + 0.1 * s * b
        return a

    a_last, b_last = a_first.T, b_first.T

    def soa_cross_chain(a, b):
        for _ in range(REPS):
            c = jnp.stack(
                [
                    a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0],
                ]
            )
            s = c[0] * b[0] + c[1] * b[1] + c[2] * b[2]
            a = c + 0.1 * s * b
        return a

    t_aos = timeit("cross chain AoS (N,3)", aos_cross_chain, a_first, b_first)
    t_soa = timeit("cross chain SoA (3,N)", soa_cross_chain, a_last, b_last)
    print(f"  -> SoA speedup: {t_aos / t_soa:.1f}x")

    # --- pattern 3: the real engine step ------------------------------------
    from leibnizgym_tpu.ops.engine import physics_step
    from leibnizgym_tpu.ops.types import PhysicsState, SceneParams, SolverConfig

    state = PhysicsState.default((N,))
    scene = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (N,) + jnp.shape(x)), SceneParams.default()
    )
    tau = jnp.zeros((N, 9))
    cfg = SolverConfig(substeps=2, solver_iterations=4)
    t_step = timeit(
        "physics_step (current, vmap axis 0)",
        jax.vmap(lambda s, t, sc: physics_step(s, t, sc, cfg, 0.02)),
        state, tau, scene, n=10,
    )
    print(f"  -> {N / t_step:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
