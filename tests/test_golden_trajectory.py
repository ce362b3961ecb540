"""Golden-trajectory regression test.

A fixed-seed 16-env, 50-step random-action rollout of difficulty 1 is stored
at tests/golden/traj_d1_seed0.npz (created with scripts/trajectory_parity.py
on CPU). Any physics/env change that shifts trajectories beyond float noise
fails here — the in-repo stand-in for BASELINE.md's fixed-seed parity config.

To intentionally re-baseline after a behavior-changing fix:
    JAX_PLATFORMS=cpu python scripts/trajectory_parity.py dump \
        --num-envs 16 --steps 50 --out tests/golden/traj_d1_seed0.npz
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from leibnizgym_tpu.envs import TrifingerEnv
import pytest

# full-env XLA compiles / multi-process: full-suite only
pytestmark = pytest.mark.slow

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("fname", ["traj_d1_seed0.npz", "traj_d1_seed0_cone.npz"])
def test_trajectory_matches_golden(fname):
    path = os.path.join(_GOLDEN_DIR, fname)
    if not os.path.exists(path):
        pytest.skip(f"golden {fname} not recorded")
    data = np.load(path, allow_pickle=True)
    meta = json.loads(str(data["meta"]))
    env = TrifingerEnv(
        config={
            "num_instances": meta["num_envs"],
            "task_difficulty": meta["difficulty"],
            "command_mode": "torque",
            "seed": meta["seed"],
            "engine": meta["engine"],
            # dumps predating the arena field were recorded under the
            # round-1..4 default cylinder; the profile is pinned explicitly
            # so goldens are independent of the build default
            "arena": {"profile": meta.get("arena", "cylinder")},
            "sim": {"substeps": meta["substeps"],
                    # dumps predating the solver field were recorded under
                    # the then-default velocity-level PGS
                    "physx": {"num_position_iterations": meta["iterations"],
                              "tpu_solver": meta.get("solver", "pgs")}},
        },
        verbose=False,
    )
    obs = env.reset()
    key = jax.random.PRNGKey(meta["action_seed"])
    for t in range(meta["steps"]):
        key, k = jax.random.split(key)
        action = jax.random.uniform(
            k, (meta["num_envs"], 9), minval=-1.0, maxval=1.0
        )
        obs, reward, dones, info = env.step(action)
        st = env.state.physics
        assert np.allclose(np.asarray(action), data["action"][t], atol=1e-6), \
            f"action stream diverged at step {t} (RNG change?)"
        for name, arr in (("q", st.q), ("cube_pos", st.cube_pos),
                          ("cube_quat", st.cube_quat), ("reward", reward)):
            err = np.abs(np.asarray(arr) - data[name][t]).max()
            assert err < 2e-4, f"{name} diverged at step {t}: {err:.2e}"
