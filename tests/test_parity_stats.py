"""Distribution-level simulator parity evidence (BASELINE config-0 substitute).

IsaacGym cannot run in this environment, so fixed-seed trajectory parity
against the reference simulator is impossible to produce here. These tests
are the documented substitute (VERDICT round-1 item 8): statistical and
analytic checks that pin the TPU engine to the same physical behavior the
reference's PhysX configuration produces — integrator semantics, material
parameters as configured in trifinger_env.py:360-367/874-937, actuator
pipeline gains (trifinger_env.py:216-224), and robot geometry
(pro/trifingerpro.urdf). RESULTS.md §Parity documents the companion
reward-curve overlay vs the reference's published training PNG.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leibnizgym_tpu.models import trifinger as tf_model
from leibnizgym_tpu.ops import kinematics as K
from leibnizgym_tpu.ops.engine_v2 import physics_step_v2
from leibnizgym_tpu.ops.types import PhysicsState, SceneParams, SolverConfig

# full-env XLA compiles / multi-process: full-suite only
pytestmark = pytest.mark.slow

CFG = SolverConfig()  # training default: substeps 4, 8 iterations
DT = 0.02


class TestFreeFall:
    """Gravity + integrator semantics: a cube clear of all geometry must follow
    semi-implicit Euler with h = dt/substeps exactly (PhysX uses the same
    scheme; reference sim.dt=0.02, substeps=4, gravity -9.81)."""

    def test_matches_semi_implicit_euler(self):
        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.30]),
        )
        f = jax.jit(lambda s: physics_step_v2(s, jnp.zeros(9), params, CFG, DT))
        n_steps = 5
        for _ in range(n_steps):
            state, _ = f(state)
        # analytic semi-implicit Euler at substep granularity
        h = DT / CFG.substeps
        z, v = 0.30, 0.0
        for _ in range(n_steps * CFG.substeps):
            v += h * -9.81
            z += h * v
        assert abs(float(state.cube_pos[2]) - z) < 1e-5
        assert abs(float(state.cube_linvel[2]) - v) < 1e-5


class TestSettleStatistics:
    """Drop statistics over 64 randomized envs: every cube must come to rest
    at z = s/2 = 0.0325 within 0.5 s with no residual motion (PhysX behavior
    for restitution-0 box on the friction-0.1 ground plane)."""

    def test_settle_height_and_time(self):
        n = 64
        params = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)),
            SceneParams.default(),
        )
        key = jax.random.PRNGKey(7)
        k1, k2, k3 = jax.random.split(key, 3)
        yaw = jax.random.uniform(k1, (n,), minval=0.0, maxval=2 * np.pi)
        quat = jnp.stack([
            jnp.zeros(n), jnp.zeros(n), jnp.sin(yaw / 2), jnp.cos(yaw / 2)
        ], axis=-1)
        state = PhysicsState.default((n,)).replace(
            cube_pos=jnp.stack([
                jax.random.uniform(k2, (n,), minval=-0.05, maxval=0.05),
                jax.random.uniform(k3, (n,), minval=-0.05, maxval=0.05),
                jnp.full((n,), 0.07),
            ], axis=-1),
            cube_quat=quat,
        )
        step = jax.jit(jax.vmap(
            lambda s, p: physics_step_v2(s, jnp.zeros(9), p, CFG, DT)
        ))
        for _ in range(25):  # 0.5 s
            state, _ = step(state, params)
        z = np.asarray(state.cube_pos[:, 2])
        v = np.asarray(jnp.linalg.norm(state.cube_linvel, axis=-1))
        assert np.all(np.abs(z - 0.0325) < 2e-3), (z.min(), z.max())
        assert np.all(v < 0.02), v.max()

    def test_no_ground_bounce(self):
        """restitution_cube_ground = 0 (reference object restitution 0.0,
        trifinger_env.py:932-937): a cube dropped from 10 cm must not rebound
        above ~5% of its drop height."""
        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.10]),
        )
        f = jax.jit(lambda s: physics_step_v2(s, jnp.zeros(9), params, CFG, DT))
        max_z_after_impact = 0.0
        impacted = False
        for _ in range(60):
            state, _ = f(state)
            z = float(state.cube_pos[2])
            if impacted:
                max_z_after_impact = max(max_z_after_impact, z)
            if z < 0.034:
                impacted = True
        assert impacted
        assert max_z_after_impact < 0.0325 + 0.05 * (0.10 - 0.0325)


class TestFrictionEnvelope:
    """Sliding deceleration must match mu * g for the configured pair
    coefficient: ground plane friction 0.1 x object friction 1.0, PhysX
    'average' combine -> mu = 0.55 (reference _setup_sim:360-367)."""

    def test_slide_deceleration_rate(self):
        params = SceneParams.default()
        mu = float(params.mu_cube_ground)
        v0 = 0.8
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([-0.12, 0.0, 0.0325]),
            cube_linvel=jnp.array([v0, 0.0, 0.0]),
        )
        f = jax.jit(lambda s: physics_step_v2(s, jnp.zeros(9), params, CFG, DT))
        t, vx = 0.0, v0
        while vx > 0.25 and t < 0.4:
            state, _ = f(state)
            vx = float(state.cube_linvel[0])
            t += DT
        # v(t) = v0 - mu g t  ->  t_pred for the measured drop
        t_pred = (v0 - vx) / (mu * 9.81)
        assert abs(t - t_pred) / t_pred < 0.25, (t, t_pred)


class TestAngularDamping:
    """PhysX-style per-substep angular damping factor (1 - c*h), c = 0.5
    (gymapi AssetOptions default the reference never overrides)."""

    def test_free_spin_decay(self):
        params = SceneParams.default()
        w0 = 3.0
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.25]),  # airborne
            cube_angvel=jnp.array([0.0, 0.0, w0]),
        )
        f = jax.jit(lambda s: physics_step_v2(s, jnp.zeros(9), params, CFG, DT))
        n_steps = 10
        for _ in range(n_steps):
            state, _ = f(state)
        h = DT / CFG.substeps
        w_pred = w0 * (1.0 - 0.5 * h) ** (n_steps * CFG.substeps)
        assert abs(float(state.cube_angvel[2]) - w_pred) < 1e-4


class TestReachEnvelope:
    """Tip positions over dense random joint samples must never exceed the
    URDF chain's analytic reach and must attain most of it (validates link
    offsets against pro/trifingerpro.urdf:161-189)."""

    def test_tip_reach(self):
        rng = np.random.default_rng(3)
        n = 4096
        low = np.asarray(tf_model.JOINT_POS_LOW)
        high = np.asarray(tf_model.JOINT_POS_HIGH)
        q = jnp.asarray(rng.uniform(low, high, (n, 3)).astype(np.float32))
        fk = jax.jit(jax.vmap(K.finger_fk))(q)
        # reach measured from the middle joint (the shoulder of the 2-link
        # planar chain formed by joints 2 and 3)
        mid = np.asarray(jax.vmap(lambda f: f.joint_pos[1])(fk))
        tips = np.asarray(fk.tip_pos)
        reach = np.linalg.norm(tips - mid, axis=-1)
        # analytic chain: middle->lower offset + lower->tip offset
        l1 = float(np.linalg.norm([0.04922, 0.0, 0.16]))
        l2 = float(np.linalg.norm([0.0185, 0.0, 0.1626]))
        r_max = l1 + l2
        assert reach.max() <= r_max + 1e-4
        assert reach.max() > 0.95 * r_max  # envelope actually attained


class TestActuatorPipeline:
    """Position-command PD parity: kp=10, kd=0.1 + safety damping
    (reference trifinger_env.py:216-224, _pre_step:442-498) must drive a
    perturbed joint back to the default pose, settled, within 0.5 s."""

    def test_pd_step_response(self):
        from leibnizgym_tpu.envs import TrifingerEnv

        env = TrifingerEnv(
            config={"num_instances": 4, "command_mode": "position",
                    "normalize_action": False,
                    "reset_distribution": {
                        "robot_initial_state": {"type": "random"},
                        "object_initial_state": {"type": "default"},
                    },
                    "sim": {"substeps": 4}},
            verbose=False,
        )
        env.reset()
        target = jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3)
        cmd = jnp.broadcast_to(target, (4, 9))
        for _ in range(25):  # 0.5 s transient
            obs, rew, dones, info = env.step(cmd)
        # NOTE on expectations: torque is computed once per 20 ms env step and
        # held (reference set_dof_actuation_force_tensor semantics,
        # trifinger_env.py:496) — with kd as small as 0.001 on joint 3 the
        # discrete PD loop is a bounded, torque-saturated limit cycle, not an
        # asymptotically settled system. Parity check = the TIME-AVERAGED pose
        # tracks the command; instantaneous qd may ride the oscillation.
        errs = []
        for _ in range(10):
            env.step(cmd)
            q = np.asarray(env._state.physics.q)
            errs.append(np.abs(q - np.asarray(target)))
        mean_err = np.mean(errs, axis=0)
        assert mean_err.max() < 0.25, mean_err.max()
        # bounded: the velocity clamp (reference _max_velocity_radps=10) holds
        qd = np.asarray(env._state.physics.qd)
        assert np.abs(qd).max() <= 10.0 + 1e-5


class TestRestitutionSweep:
    """Restitution implementation vs analytic rebound (VERDICT r2 weak-#5).

    PhysX semantics reproduced by the engine: restitution activates only
    above bounce_threshold_velocity (0.5 m/s, rlg_hydra.py:32) and targets
    v_out = -e * v_in at the first contact substep. A flat cube dropped at
    v_in ~ 1.7 m/s must leave the impact with v_out/v_in within a few % of
    the configured pair coefficient. (The pair value is post-combine; PhysX
    default combine = average, SceneParams.default applies it.)"""

    @pytest.mark.parametrize("e", [0.0, 0.4, 0.8])
    def test_rebound_ratio(self, e):
        params = SceneParams.default().replace(
            restitution_cube_ground=jnp.asarray(e),
            cube_linear_damping=jnp.asarray(0.0),
        )
        drop_h = 0.15  # impact speed sqrt(2*g*h) ~ 1.7 m/s >> threshold
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.0325 + drop_h]),
        )
        f = jax.jit(lambda s: physics_step_v2(s, jnp.zeros(9), params, CFG, DT))
        v_prev = 0.0
        v_out = None
        for _ in range(30):  # 0.6 s
            state, _ = f(state)
            vz = float(state.cube_linvel[2])
            if v_prev < -1.0 and vz > v_prev + 0.5:
                # impact happened inside this step; vz is the outgoing speed
                v_out = vz
                v_in = -v_prev
                break
            v_prev = vz
        assert v_out is not None, "no impact detected"
        if e == 0.0:
            assert v_out < 0.05  # kills the bounce entirely
        else:
            # the impact substep consumes some incoming speed integrating
            # gravity across dt; allow 10% + a small absolute slack
            assert abs(v_out - e * v_in) < 0.1 * e * v_in + 0.05, (
                f"e={e}: v_in={v_in:.3f}, v_out={v_out:.3f}"
            )

    def test_restitution_inactive_below_threshold(self):
        """An impact slower than bounce_threshold must not rebound even at
        e = 0.8 (PhysX bounce_threshold_velocity semantics)."""
        params = SceneParams.default().replace(
            restitution_cube_ground=jnp.asarray(0.8),
        )
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.0325 + 0.008]),  # v_in ~ 0.4 m/s
        )
        f = jax.jit(lambda s: physics_step_v2(s, jnp.zeros(9), params, CFG, DT))
        max_vz_after = 0.0
        touched = False
        for _ in range(25):
            state, _ = f(state)
            if touched:
                max_vz_after = max(max_vz_after, float(state.cube_linvel[2]))
            if float(state.cube_pos[2]) < 0.034:
                touched = True
        assert touched
        assert max_vz_after < 0.05


class TestTipping:
    """Static-stability parity in the contact regime difficulty-4 lives in:
    a cube balanced on an edge falls toward the side its COM overhangs.
    Critical angle for a uniform cube is 45 deg about the resting edge."""

    def _drop_tilted(self, theta_deg):
        th = np.deg2rad(theta_deg)
        s = 0.0325  # half extent
        # rotate about y by theta; rest the low edge on the ground
        quat = jnp.array([0.0, np.sin(th / 2), 0.0, np.cos(th / 2)])
        z0 = s * (abs(np.cos(th)) + abs(np.sin(th)))
        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, z0 + 1e-4]),
            cube_quat=quat,
        )
        f = jax.jit(lambda s_: physics_step_v2(s_, jnp.zeros(9), params, CFG, DT))
        for _ in range(60):  # 1.2 s, enough to settle either way
            state, _ = f(state)
        qx, qy, qz, qw = [float(v) for v in state.cube_quat]
        # final tilt about y (rotation angle, folded to [0, pi])
        angle = 2.0 * np.arccos(min(1.0, abs(qw)))
        return np.rad2deg(angle), float(state.cube_pos[2])

    def test_subcritical_falls_back(self):
        angle, z = self._drop_tilted(30.0)
        # settles flat on the original face: rotation ~ 0 (mod 90)
        assert min(angle % 90.0, 90.0 - angle % 90.0) < 8.0
        assert angle < 45.0, f"tipped the wrong way: {angle:.1f} deg"
        assert abs(z - 0.0325) < 0.004

    def test_supercritical_tips_over(self):
        angle, z = self._drop_tilted(60.0)
        assert abs(angle - 90.0) < 8.0, f"did not tip over: {angle:.1f} deg"
        assert abs(z - 0.0325) < 0.004


class TestTorsionQuantitative:
    """Yaw-spin decay vs the PhysX patch-torsion model (VERDICT r2 weak-#5).

    A spinning CUBE is stopped almost instantly by ordinary corner friction
    (the 4 sliding support corners have a ~3 cm lever arm), so it cannot
    distinguish the torsion term. The clean probe is the sphere object: one
    contact point with zero lever arm about the spin axis -> only patch
    torsion (limit mu_t * r_patch * N) decelerates it. On a resting sphere
    N = m g, so alpha = mu_t * r_p * m * g / I_zz."""

    _SPHERE_CFG = SolverConfig(object_shape=1)

    def _spin_down(self, mu_t, n_steps, w0=6.0):
        params = SceneParams.default(object_shape="sphere").replace(
            mu_torsion=jnp.asarray(mu_t),
            torsion_patch_radius=jnp.asarray(0.01),
            cube_angular_damping=jnp.asarray(0.0),
        )
        r = float(params.cube_half_extents[0])
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, r]),
            cube_angvel=jnp.array([0.0, 0.0, w0]),
        )
        f = jax.jit(lambda s: physics_step_v2(
            s, jnp.zeros(9), params, self._SPHERE_CFG, DT
        ))
        for _ in range(n_steps):
            state, _ = f(state)
        izz = float(np.asarray(params.cube_inertia)[2])
        m = float(params.cube_mass)
        return float(state.cube_angvel[2]), m, izz

    def test_spin_decel_matches_patch_model(self):
        mu_t, r_p, w0, n_steps = 0.5, 0.01, 6.0, 10
        w1, m, izz = self._spin_down(mu_t, n_steps, w0)
        alpha = mu_t * r_p * m * 9.81 / izz
        expected = max(0.0, w0 - alpha * n_steps * DT)
        assert abs(w1 - expected) < 0.15 * w0, (
            f"w1={w1:.2f}, expected={expected:.2f} (alpha={alpha:.2f})"
        )

    def test_no_torsion_no_decel(self):
        w1, _, _ = self._spin_down(0.0, 10, w0=4.0)
        # zero lever arm: without the torsion term nothing opposes the spin
        assert w1 > 3.9
