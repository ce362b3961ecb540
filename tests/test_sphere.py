"""Sphere object (ball.urdf variant) tests.

Reference: resources/assets/trifinger/objects/urdf/ball.urdf (radius 0.0375 m,
mass 0.25, declared inertia 1e-4) — one of the shipped object assets
(SURVEY.md §2.2). Selected via ``object_type: sphere``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leibnizgym_tpu.models import trifinger as tf_model
from leibnizgym_tpu.ops.engine import physics_step
from leibnizgym_tpu.ops.engine_v2 import physics_step_v2
from leibnizgym_tpu.ops.types import PhysicsState, SceneParams, SolverConfig

# full-env XLA compiles / multi-process: full-suite only
pytestmark = pytest.mark.slow

CFG = SolverConfig(object_shape=1)
STEPPERS = {"reference": physics_step, "soa": physics_step_v2}


def ball_params():
    return SceneParams.default(object_shape="sphere")


@pytest.fixture(params=["reference", "soa"])
def step_fn(request):
    stepper = STEPPERS[request.param]
    params = ball_params()
    return jax.jit(lambda s, t: stepper(s, t, params, CFG, 0.02))


class TestBallParams:
    def test_urdf_values(self):
        p = ball_params()
        assert abs(float(p.cube_mass) - 0.25) < 1e-6
        assert abs(float(p.cube_half_extents[0]) - 0.0375) < 1e-6
        # declared URDF inertia, not the solid-sphere formula
        assert np.allclose(np.asarray(p.cube_inertia), 1e-4)


class TestBallDynamics:
    def test_drop_and_rest(self, step_fn):
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.2]),
        )
        for _ in range(80):
            state, _ = step_fn(state, jnp.zeros(9))
        # rests exactly on its radius (single lowest-point contact)
        assert abs(float(state.cube_pos[2]) - 0.0375) < 1e-3
        assert float(jnp.linalg.norm(state.cube_linvel)) < 0.02

    def test_stays_in_arena(self, step_fn):
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.1, 0.0, 0.0375]),
            cube_linvel=jnp.array([1.5, 0.0, 0.0]),
        )
        for _ in range(80):
            state, _ = step_fn(state, jnp.zeros(9))
            rho = float(jnp.linalg.norm(state.cube_pos[0:2]))
            assert rho < 0.195 + 1e-3, "ball escaped the arena wall"

    def test_rolling_ball_slows(self, step_fn):
        """Sliding friction converts the slide to a roll; torsional friction
        and damping bleed energy — the ball must not accelerate."""
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([-0.1, 0.0, 0.0375]),
            cube_linvel=jnp.array([0.6, 0.0, 0.0]),
        )
        v0 = float(jnp.linalg.norm(state.cube_linvel))
        for _ in range(40):
            state, _ = step_fn(state, jnp.zeros(9))
        v1 = float(jnp.linalg.norm(state.cube_linvel))
        assert v1 < v0 + 1e-3
        # slide -> roll: contact-point slip velocity ~ 0 (v = w x r)
        slip = state.cube_linvel + jnp.cross(
            state.cube_angvel, jnp.array([0.0, 0.0, -0.0375])
        )
        assert float(jnp.linalg.norm(slip[:2])) < 0.05

    def test_no_nans_under_stress(self, step_fn):
        key = jax.random.PRNGKey(0)
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.0375]),
        )
        for _ in range(50):
            key, k = jax.random.split(key)
            tau = jax.random.uniform(k, (9,), minval=-0.36, maxval=0.36)
            state, _ = step_fn(state, tau)
        for leaf in jax.tree_util.tree_leaves(state):
            assert bool(jnp.isfinite(leaf).all())

    def test_tip_at_ball_center_stays_finite(self, step_fn):
        """Degenerate probe-at-center query must produce a finite contact."""
        from leibnizgym_tpu.ops import kinematics as K

        q9 = jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3)
        tips, _, _ = K.all_tips_world(q9)
        state = PhysicsState.default(()).replace(q=q9, cube_pos=tips[0])
        for _ in range(20):
            state, _ = step_fn(state, jnp.zeros(9))
        for leaf in jax.tree_util.tree_leaves(state):
            assert bool(jnp.isfinite(leaf).all())


class TestBallEngineEquivalence:
    def test_single_step_match(self):
        params = ball_params()
        cfg = SolverConfig(substeps=2, solver_iterations=4, object_shape=1)
        rng = np.random.default_rng(0)
        f1 = jax.jit(lambda s, t: physics_step(s, t, params, cfg, 0.02))
        f2 = jax.jit(lambda s, t: physics_step_v2(s, t, params, cfg, 0.02))
        for _ in range(5):
            state = PhysicsState.default(()).replace(
                q=jnp.asarray(
                    (np.tile(tf_model.JOINT_POS_DEFAULT, 3)
                     + rng.uniform(-0.3, 0.3, 9)).astype(np.float32)),
                qd=jnp.asarray(rng.uniform(-2, 2, 9).astype(np.float32)),
                cube_pos=jnp.asarray(np.array(
                    [rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                     rng.uniform(0.03, 0.08)]).astype(np.float32)),
                cube_linvel=jnp.asarray(rng.uniform(-0.5, 0.5, 3).astype(np.float32)),
                cube_angvel=jnp.asarray(rng.uniform(-2, 2, 3).astype(np.float32)),
            )
            tau = jnp.asarray(rng.uniform(-0.36, 0.36, 9).astype(np.float32))
            s1, w1 = f1(state, tau)
            s2, w2 = f2(state, tau)
            for name in ["q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                         "cube_angvel"]:
                err = float(jnp.abs(getattr(s1, name) - getattr(s2, name)).max())
                assert err < 1e-4, f"{name}: {err}"
            assert float(jnp.abs(w1 - w2).max()) < 1e-2

    def test_pallas_matches_engine_v2(self):
        from leibnizgym_tpu.ops.pallas_engine import physics_step_pallas

        cfg = SolverConfig(substeps=2, solver_iterations=4, object_shape=1)
        n = 8
        rng = np.random.default_rng(1)
        params = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), ball_params()
        )
        state = PhysicsState.default((n,)).replace(
            q=jnp.asarray((np.tile(tf_model.JOINT_POS_DEFAULT, 3)
                           + rng.uniform(-0.3, 0.3, (n, 9))).astype(np.float32)),
            qd=jnp.asarray(rng.uniform(-2, 2, (n, 9)).astype(np.float32)),
            cube_pos=jnp.asarray(np.stack(
                [rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
                 rng.uniform(0.03, 0.08, n)], -1).astype(np.float32)),
            cube_linvel=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)),
            cube_angvel=jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32)),
        )
        tau = jnp.asarray(rng.uniform(-0.36, 0.36, (n, 9)).astype(np.float32))
        v2 = jax.jit(jax.vmap(lambda s, t, p: physics_step_v2(s, t, p, cfg, 0.02)))
        vp = jax.jit(lambda s, t, p: physics_step_pallas(
            s, t, p, cfg, 0.02, interpret=True))
        s2, _ = v2(state, tau, params)
        sp, _ = vp(state, tau, params)
        assert float(jnp.abs(s2.cube_pos - sp.cube_pos).max()) < 1e-4
        assert float(jnp.abs(s2.q - sp.q).max()) < 1e-4


class TestBallEnv:
    def test_env_smoke(self):
        from leibnizgym_tpu.envs import TrifingerEnv

        env = TrifingerEnv(
            config={"num_instances": 4, "object_type": "sphere",
                    "asymmetric_obs": True, "sim": {"substeps": 2}},
            verbose=False,
        )
        obs = env.reset()
        assert obs.shape == (4, 41)
        for _ in range(10):
            obs, rew, dones, info = env.step(jnp.zeros((4, 9)))
        assert bool(jnp.isfinite(obs).all())
        assert bool(jnp.isfinite(rew).all())
        assert env.get_state().shape == (4, 113)

    def test_env_dr_smoke(self):
        from leibnizgym_tpu.envs import TrifingerEnv

        env = TrifingerEnv(
            config={"num_instances": 4, "object_type": "sphere",
                    "domain_randomization": {"activate": True},
                    "sim": {"substeps": 2}},
            verbose=False,
        )
        env.reset()
        for _ in range(5):
            obs, rew, dones, info = env.step(jnp.zeros((4, 9)))
        assert bool(jnp.isfinite(obs).all())
