"""Physics engine tests: kinematics, dynamics, and contact behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leibnizgym_tpu.models import trifinger as tf_model
from leibnizgym_tpu.ops import dynamics as D
from leibnizgym_tpu.ops import kinematics as K
from leibnizgym_tpu.ops.engine import physics_step
from leibnizgym_tpu.ops.types import PhysicsState, SceneParams, SolverConfig

GRAV = jnp.array([0.0, 0.0, -9.81])


class TestKinematics:
    def test_zero_pose_tip(self):
        """Hand-computed FK at q=0 from the URDF chain offsets."""
        fk = K.finger_fk(jnp.zeros(3))
        expected = np.array([0.01685 + 0.04922 + 0.0185, 0.0505, -0.16 - 0.1626])
        assert np.allclose(np.asarray(fk.tip_pos), expected, atol=1e-6)

    def test_default_pose_tips_above_table(self):
        q9 = jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3)
        tips, _, _ = K.all_tips_world(q9)
        tips = np.asarray(tips)
        assert np.all(tips[:, 2] > 0.0)  # above the table
        assert np.all(np.hypot(tips[:, 0], tips[:, 1]) < 0.195)  # inside arena
        # three-fold symmetry: all tips at the same radius and height
        r = np.hypot(tips[:, 0], tips[:, 1])
        assert np.allclose(r, r[0], atol=1e-6)
        assert np.allclose(tips[:, 2], tips[0, 2], atol=1e-6)

    def test_jacobian_matches_autodiff(self):
        q = jnp.array([0.3, 0.7, -1.2])
        jac = K.tip_jacobian(K.finger_fk(q))
        jac_ad = jax.jacfwd(lambda qq: K.finger_fk(qq).tip_pos)(q)
        assert np.allclose(np.asarray(jac), np.asarray(jac_ad), atol=1e-5)

    def test_tip_angular_velocity_matches_rotation_derivative(self):
        """omega from the axis sum must equal vee(dR/dt R^T)."""
        rng = np.random.default_rng(11)
        for _ in range(5):
            q0 = jnp.asarray(rng.uniform(-1.5, 1.0, 3))
            qd0 = jnp.asarray(rng.uniform(-3, 3, 3))

            def rot(q):
                return K.finger_fk(q).link_rot[2]

            dr = jax.jacfwd(rot)(q0) @ qd0
            omega_skew = dr @ rot(q0).T
            omega_fd = jnp.array(
                [omega_skew[2, 1], omega_skew[0, 2], omega_skew[1, 0]]
            )
            omega = K.tip_angular_velocity(K.finger_fk(q0), qd0)
            assert np.allclose(np.asarray(omega), np.asarray(omega_fd), atol=1e-4)

    def test_fingertip_states_v2_matches_aos(self):
        from leibnizgym_tpu.ops.engine_v2 import fingertip_states_v2
        from leibnizgym_tpu.utils.math import matrix_to_quat

        rng = np.random.default_rng(12)
        q9 = jnp.asarray(rng.uniform(-1.5, 1.0, 9).astype(np.float32))
        qd9 = jnp.asarray(rng.uniform(-3, 3, 9).astype(np.float32))
        soa = fingertip_states_v2(q9, qd9)
        tips_w, tip_rot_w, fk = K.all_tips_world(q9)
        qd_f = qd9.reshape(3, 3)
        jac_w = jnp.einsum("fij,fjk->fik", K.MOUNT_ROTS, K.tip_jacobian(fk))
        lin = jnp.einsum("fij,fj->fi", jac_w, qd_f)
        ang = jnp.einsum("fij,fj->fi", K.MOUNT_ROTS, K.tip_angular_velocity(fk, qd_f))
        quat = matrix_to_quat(tip_rot_w)
        assert np.allclose(np.asarray(soa[:, 0:3]), np.asarray(tips_w), atol=1e-5)
        qd_err = np.minimum(
            np.abs(np.asarray(soa[:, 3:7]) - np.asarray(quat)).max(-1),
            np.abs(np.asarray(soa[:, 3:7]) + np.asarray(quat)).max(-1),
        )
        assert qd_err.max() < 1e-4  # quats equal up to sign
        assert np.allclose(np.asarray(soa[:, 7:10]), np.asarray(lin), atol=1e-4)
        assert np.allclose(np.asarray(soa[:, 10:13]), np.asarray(ang), atol=1e-4)

    def test_batched_fk_consistent(self):
        qs = jax.random.uniform(jax.random.PRNGKey(0), (16, 3), minval=-1, maxval=1)
        batched = K.finger_fk(qs).tip_pos
        single = jnp.stack([K.finger_fk(q).tip_pos for q in qs])
        assert np.allclose(np.asarray(batched), np.asarray(single), atol=1e-6)


class TestDynamics:
    def test_mass_matrix_spd(self):
        for seed in range(5):
            q = jax.random.uniform(jax.random.PRNGKey(seed), (3,), minval=-2, maxval=1.5)
            m = np.asarray(D.mass_matrix(q))
            assert np.allclose(m, m.T, atol=1e-7)
            assert np.linalg.eigvalsh(m).min() > 0

    def test_gravity_equilibrium(self):
        """Applying tau = dV/dq exactly cancels gravity => qdd = 0."""
        q = jnp.array([0.1, 0.5, -1.0])
        tau = jax.grad(lambda qq: D.potential_energy(qq, GRAV))(q)
        qdd = D.forward_dynamics(q, jnp.zeros(3), tau, GRAV)
        # float32 roundoff between the autodiff gravity torque and the RNEA
        # bias path; 1e-4 rad/s^2 residual is physically negligible
        assert np.allclose(np.asarray(qdd), 0.0, atol=1e-4)

    def test_energy_conservation(self):
        """Zero torque, no contacts: total energy is conserved."""

        def energy(q, qd):
            return 0.5 * qd @ D.mass_matrix(q) @ qd + D.potential_energy(q, GRAV)

        @jax.jit
        def rollout(q, qd):
            def body(_, c):
                q, qd = c
                qdd = D.forward_dynamics(q, qd, jnp.zeros(3), GRAV)
                qd = qd + 1e-4 * qdd
                return q + 1e-4 * qd, qd

            return jax.lax.fori_loop(0, 2000, body, (q, qd))

        q0 = jnp.array([0.1, 0.5, -1.0])
        qd0 = jnp.array([0.2, -0.3, 0.4])
        q1, qd1 = rollout(q0, qd0)
        e0, e1 = float(energy(q0, qd0)), float(energy(q1, qd1))
        assert abs(e1 - e0) / max(abs(e0), 1e-9) < 1e-3

    def test_rnea_matches_lagrangian_oracle(self):
        """Hand-derived RNEA bias == autodiff Euler-Lagrange bias."""
        rng = np.random.default_rng(3)
        for _ in range(10):
            q = jnp.asarray(rng.uniform(-2, 1.5, 3).astype(np.float32))
            qd = jnp.asarray(rng.uniform(-5, 5, 3).astype(np.float32))
            lm = jnp.asarray(
                (np.array([0.26, 0.25, 0.052]) * rng.uniform(0.8, 1.2, 3)).astype(np.float32)
            )
            b_rnea = np.asarray(D.bias_forces(q, qd, GRAV, lm))
            b_lagr = np.asarray(D.bias_forces_lagrangian(q, qd, GRAV, lm))
            assert np.allclose(b_rnea, b_lagr, atol=1e-4), (b_rnea, b_lagr)

    def test_bias_matches_finite_difference(self):
        """b(q, qd) from the Lagrangian equals numerical d/dt(M qd) - dT/dq + dV/dq."""
        q = jnp.array([0.2, 0.6, -0.9])
        qd = jnp.array([0.5, -0.2, 0.8])
        b = np.asarray(D.bias_forces(q, qd, GRAV))
        eps = 1e-5

        def m_qd(qq):
            return np.asarray(D.mass_matrix(jnp.asarray(qq)) @ qd)

        dmqd = np.stack(
            [(m_qd(np.asarray(q) + eps * np.eye(3)[i]) - m_qd(np.asarray(q) - eps * np.eye(3)[i]))
             / (2 * eps) for i in range(3)], axis=1)

        def kin(qq):
            return float(0.5 * qd @ D.mass_matrix(jnp.asarray(qq)) @ qd)

        def pot(qq):
            return float(D.potential_energy(jnp.asarray(qq), GRAV))

        grad_t = np.array([(kin(np.asarray(q) + eps * np.eye(3)[i]) - kin(np.asarray(q) - eps * np.eye(3)[i])) / (2 * eps) for i in range(3)])
        grad_v = np.array([(pot(np.asarray(q) + eps * np.eye(3)[i]) - pot(np.asarray(q) - eps * np.eye(3)[i])) / (2 * eps) for i in range(3)])
        expected = dmqd @ np.asarray(qd) - grad_t + grad_v
        # float32 finite differences: tolerance dominated by FD noise
        assert np.allclose(b, expected, atol=5e-3)


@pytest.fixture(scope="module")
def step_fn():
    cfg = SolverConfig(substeps=2, solver_iterations=8)
    return jax.jit(lambda s, t, p: physics_step(s, t, p, cfg, 0.02))


class TestContacts:
    def test_cube_drop_and_rest(self, step_fn):
        """Cube dropped from above settles at z = half-size on the ground."""
        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.1]),
            q=jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3),
        )
        tau_g = gravity_hold_torque()
        for _ in range(100):
            state, _ = step_fn(state, tau_g, params)
        z = float(state.cube_pos[2])
        assert abs(z - 0.0325) < 3e-3, f"cube rest height {z}"
        assert float(jnp.linalg.norm(state.cube_linvel)) < 0.05

    def test_cube_stays_in_arena(self, step_fn):
        """Cube slid outward is stopped by the boundary wall."""
        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.12, 0.0, 0.0325]),
            cube_linvel=jnp.array([1.0, 0.0, 0.0]),
            q=jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3),
        )
        tau_g = gravity_hold_torque()
        for _ in range(100):
            state, _ = step_fn(state, tau_g, params)
        rho = float(jnp.linalg.norm(state.cube_pos[0:2]))
        assert rho < float(params.wall_radius) + 0.01

    def test_ground_friction_stops_sliding(self, step_fn):
        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([-0.1, 0.0, 0.0325]),
            cube_linvel=jnp.array([0.5, 0.0, 0.0]),
            q=jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3),
        )
        tau_g = gravity_hold_torque()
        # mu ~ 0.55 => decel 5.4 m/s^2 => stops within ~0.1 s
        for _ in range(25):
            state, _ = step_fn(state, tau_g, params)
        assert float(jnp.linalg.norm(state.cube_linvel[0:2])) < 0.05

    def test_joint_limits_enforced(self, step_fn):
        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            q=jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3),
        )
        tau = jnp.full(9, 0.36)  # slam into upper limits
        for _ in range(100):
            state, _ = step_fn(state, tau, params)
        q = np.asarray(state.q)
        lower = np.tile(tf_model.JOINT_POS_LOW, 3)
        upper = np.tile(tf_model.JOINT_POS_HIGH, 3)
        assert np.all(q >= lower - 1e-5) and np.all(q <= upper + 1e-5)

    def test_tip_pushes_cube(self, step_fn):
        """A finger commanded into the cube moves it: tip-cube coupling works."""
        params = SceneParams.default()
        # cube placed in front of finger 0's workspace
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.07, 0.05, 0.0325]),
            q=jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3),
        )
        # flex joint 2 down / extend joint 3 so the tip drives into the cube
        # (the original +0.3/-0.2 torque swings the finger up AWAY from the
        # cube; it only "passed" pre-round-2 through the speculative
        # restitution bug that applied impulses at a distance)
        tau = jnp.zeros(9).at[1].set(-0.3).at[2].set(0.2)
        moved = False
        for _ in range(150):
            state, wrench = step_fn(state, tau, params)
            if float(jnp.linalg.norm(state.cube_pos[0:2] - jnp.array([0.07, 0.05]))) > 0.01:
                moved = True
                break
        assert moved, "cube never moved despite finger contact"

    def test_free_fall_not_decelerated_at_distance(self, step_fn):
        """Speculative contacts must not brake an approach before touching.

        Pre-round-2 the restitution target fired on separated contacts,
        capping any approach faster than the 0.5 m/s bounce threshold — a
        cube dropped from 10 cm must hit the ground at ~sqrt(2 g h), not 0.5.
        """
        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.1]),
            q=jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3),
        )
        tau_g = gravity_hold_torque()
        max_speed = 0.0
        for _ in range(12):
            state, _ = step_fn(state, tau_g, params)
            max_speed = max(max_speed, -float(state.cube_linvel[2]))
        # free fall over ~6.4 cm before contact -> ~1.1 m/s peak approach
        assert max_speed > 0.9, f"fall speed capped at {max_speed}"

    def test_torsional_friction_damps_spin(self, step_fn):
        """A cube spinning about z on its face spins down faster with a
        larger torsional coefficient (reference object torsion_friction,
        trifinger_env.py:932-937)."""
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.0325]),
            cube_angvel=jnp.array([0.0, 0.0, 4.0]),
            q=jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3),
        )
        tau_g = gravity_hold_torque()

        def final_spin(mu_torsion):
            params = SceneParams.default().replace(
                mu_torsion=jnp.asarray(mu_torsion),
                # corner tangential friction also damps spin; zero it so the
                # torsional channel is isolated
                mu_cube_ground=jnp.asarray(0.0),
            )
            s = state
            for _ in range(30):
                s, _ = step_fn(s, tau_g, params)
            return float(s.cube_angvel[2])

        w_no = final_spin(0.0)
        w_tor = final_spin(0.5)
        assert w_no > 2.0, w_no  # only air damping acts without torsion
        assert w_tor < 0.5, w_tor  # torsional impulses spin the cube down

    def test_tip_stopped_by_wall(self, step_fn):
        """A finger driven outward is stopped by the arena boundary at
        rho <= wall_radius - tip_radius (new tip-vs-wall pair)."""
        from leibnizgym_tpu.ops.engine import _finger_precompute, _TIP_LOCAL_OFFSET

        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([-0.12, 0.0, 0.0325]),  # out of the way
            q=jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3),
        )
        # drive finger 0 outward hard (joint 1 swings the finger out)
        tau = jnp.zeros(9).at[0].set(0.36).at[1].set(-0.36)
        max_rho = 0.0
        for _ in range(100):
            state, _ = step_fn(state, tau, params)
            pre = _finger_precompute(state.q.reshape(3, 3), params)
            tip = np.asarray(pre.tip_pos_w[0] + _TIP_LOCAL_OFFSET)
            max_rho = max(max_rho, float(np.hypot(tip[0], tip[1])))
        limit = float(params.wall_radius) - float(params.tip_radius)
        assert max_rho <= limit + 0.005, (max_rho, limit)

    def test_lower_link_blocks_cube(self, step_fn):
        """The lower-link shaft collides with the cube: a cube thrown at a
        raised forearm bounces back instead of passing through (new
        link-vs-cube pair; reference collides the full finger V-HACD meshes)."""
        from leibnizgym_tpu.ops.engine import _finger_precompute

        params = SceneParams.default()
        # pose finger 0 with the forearm hanging across the cube's path
        q0 = jnp.array([0.0, 0.2, -1.4])
        state = PhysicsState.default(()).replace(
            q=jnp.concatenate([q0, jnp.asarray(tf_model.JOINT_POS_DEFAULT),
                               jnp.asarray(tf_model.JOINT_POS_DEFAULT)]),
        )
        pre = _finger_precompute(state.q.reshape(3, 3), params)
        samp = np.asarray(pre.samp_pos_w[0])  # (S, 3) shaft sample centers
        target = samp.mean(axis=0)
        # launch the cube straight at the shaft mid-point from outside
        start = target + np.array([0.9, 0.0, 0.0]) * 0.12
        vel = (target - start) / np.linalg.norm(target - start) * 1.2
        state = state.replace(
            cube_pos=jnp.asarray(start.astype(np.float32)),
            cube_linvel=jnp.asarray(vel.astype(np.float32)),
        )
        # hold the finger pose stiffly via strong PD-like gravity hold
        tau = jnp.zeros(9)
        passed_through = False
        for _ in range(40):
            state, _ = step_fn(state, tau, params)
            # relative to the launch axis: did the cube travel past the shaft?
            along = float((np.asarray(state.cube_pos) - target) @ np.array([0.9, 0.0, 0.0]))
            if along < -0.05:
                passed_through = True
        assert not passed_through, "cube tunneled through the lower link"

    def test_no_nans_under_stress(self, step_fn):
        params = SceneParams.default()
        key = jax.random.PRNGKey(0)
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, 0.0325]),
        )
        for i in range(50):
            key, k = jax.random.split(key)
            tau = jax.random.uniform(k, (9,), minval=-0.36, maxval=0.36)
            state, _ = step_fn(state, tau, params)
        assert bool(jnp.isfinite(state.q).all())
        assert bool(jnp.isfinite(state.cube_pos).all())
        assert bool(jnp.isfinite(state.cube_quat).all())
        assert abs(float(jnp.linalg.norm(state.cube_quat)) - 1.0) < 1e-4


@pytest.mark.slow  # full-env XLA compile
class TestSingularContacts:
    """Finger-only contacts (tip-ground, tip-wall) at the kinematic
    singularity: a fully extended finger pressing the arena wall makes
    n^T (J M^-1 J^T) n -> ~1e-9, and an unfloored PGS impulse
    (target - u)/w explodes to inf/NaN (the round-2 difficulty-4 training
    NaN at epoch 52). cfg.w_min floors the effective inverse mass and
    cfg.finger_bias_cap bounds the depenetration kick."""

    @pytest.mark.parametrize("engine", ["reference", "soa"])
    def test_extended_finger_at_wall_stays_finite(self, engine):
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        stepper = physics_step if engine == "reference" else physics_step_v2
        cfg = SolverConfig()
        params = SceneParams.default()
        fast = jax.jit(lambda s, t: stepper(s, t, params, cfg, 0.02))
        # outward torque drives the finger into full extension against the
        # wall; sweep configurations straddling the singular q2 limit
        for q2 in (1.40, 1.55, 1.57):
            state = PhysicsState.default(()).replace(
                q=jnp.array([-0.0636, q2, -0.02, 0.0, 0.9, -1.7, 0.0, 0.9, -1.7]),
                cube_pos=jnp.array([0.0, 0.0, 0.0325]),
            )
            tau = jnp.array([0.0, 0.36, 0.36, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
            for _ in range(60):
                state, _ = fast(state, tau)
            for leaf in jax.tree_util.tree_leaves(state):
                assert bool(jnp.isfinite(leaf).all()), (engine, q2)
            # velocity-limit clamp must also have contained the kick
            assert float(jnp.max(jnp.abs(state.qd))) <= 10.0 + 1e-5


@pytest.mark.slow  # full-env XLA compile
class TestDegenerateTipContact:
    """Tip center exactly on/inside the cube: the closest-point delta is
    exactly zero, and the `outside` predicate must not classify it as
    outside (which would emit a zero contact normal whose torsional spin
    mass divides 0/0 -> NaN). On TPU, sqrt(max(0, 1e-18)) rounds one ulp
    ABOVE f32(1e-9) so a sqrt-based predicate flips there — the round-2
    difficulty-4 NaN at epoch 34 (nan_microscope repro). The predicate is
    now sqrt-free on squared distance in all engines."""

    def test_closest_point_on_box_degenerate(self):
        from leibnizgym_tpu.ops.contact import closest_point_on_box

        half = jnp.array([0.0325, 0.0325, 0.0325])
        probes = [
            jnp.array([0.0325, 0.0, 0.0]),      # exactly on a face
            jnp.array([0.0325, 0.0325, 0.0325]),  # exactly at a corner
            jnp.array([0.0, 0.0, 0.0]),          # at the center
            jnp.array([0.0325 + 1e-10, 0.0, 0.0]),  # epsilon outside
        ]
        for center in probes:
            n, sdist, surf = closest_point_on_box(center, half)
            assert bool(jnp.isfinite(n).all()), center
            assert abs(float(jnp.linalg.norm(n)) - 1.0) < 1e-5, (
                "degenerate contact must still produce a unit normal",
                center,
                np.asarray(n),
            )
            assert bool(jnp.isfinite(sdist)) and bool(jnp.isfinite(surf).all())

    @pytest.mark.parametrize("engine", ["reference", "soa"])
    def test_tip_buried_in_cube_stays_finite(self, engine):
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        stepper = physics_step if engine == "reference" else physics_step_v2
        cfg = SolverConfig()
        params = SceneParams.default()
        q9 = jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3)
        tips, _, _ = K.all_tips_world(q9)
        # cube centered exactly on finger-0's tip center: delta == 0 in the
        # closest-point query, the historical 0/0 torsion NaN trigger
        state = PhysicsState.default(()).replace(
            q=q9, cube_pos=tips[0],
        )
        fast = jax.jit(lambda s, t: stepper(s, t, params, cfg, 0.02))
        for _ in range(20):
            state, _ = fast(state, jnp.zeros(9))
        for leaf in jax.tree_util.tree_leaves(state):
            assert bool(jnp.isfinite(leaf).all()), engine


@pytest.mark.slow  # full-env XLA compile
class TestTGS:
    """solver_type 1 (TGS mini-step mode, reference rlg_hydra.py:27-29):
    per-iteration pose integration with live depth updates."""

    def _drop(self, stepper, cfg, z0, steps):
        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.0, 0.0, z0]),
            q=jnp.tile(jnp.asarray(tf_model.JOINT_POS_DEFAULT), 3),
        )
        fast = jax.jit(lambda s: stepper(s, jnp.zeros(9), params, cfg, 0.02))
        zs = []
        for _ in range(steps):
            state, _ = fast(state)
            zs.append(float(state.cube_pos[2]))
        return state, zs

    def test_penetration_recovery_no_bounce(self):
        """5 mm interpenetration: TGS must correct geometrically without
        launching the cube (no Baumgarte energy injection above rest+slop)."""
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        cfg = SolverConfig(solver_type=1)
        state, zs = self._drop(physics_step_v2, cfg, 0.0325 - 0.005, 25)
        assert max(zs) < 0.0325 + 0.0015, f"bounced to {max(zs)}"
        # recovered to within the contact slop band
        assert zs[-1] > 0.0325 - SolverConfig().contact_slop - 1e-4

    def test_settle_matches_pgs_within_slop(self):
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        _, zs_pgs = self._drop(physics_step_v2, SolverConfig(solver_type=0), 0.1, 100)
        _, zs_tgs = self._drop(physics_step_v2, SolverConfig(solver_type=1), 0.1, 100)
        assert abs(zs_pgs[-1] - zs_tgs[-1]) < SolverConfig().contact_slop

    def test_engines_match_under_tgs(self):
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        cfg = SolverConfig(substeps=2, solver_iterations=8, solver_type=1)
        params = SceneParams.default()
        rng = np.random.default_rng(7)
        f1 = jax.jit(lambda s, t: physics_step(s, t, params, cfg, 0.02))
        f2 = jax.jit(lambda s, t: physics_step_v2(s, t, params, cfg, 0.02))
        for _ in range(5):
            state = PhysicsState.default(()).replace(
                q=jnp.asarray((np.tile(tf_model.JOINT_POS_DEFAULT, 3)
                               + rng.uniform(-0.3, 0.3, 9)).astype(np.float32)),
                qd=jnp.asarray(rng.uniform(-1, 1, 9).astype(np.float32)),
                cube_pos=jnp.asarray([rng.uniform(-0.05, 0.05),
                                      rng.uniform(-0.05, 0.05), 0.034],
                                     dtype=jnp.float32),
                cube_linvel=jnp.asarray(rng.uniform(-0.5, 0.5, 3).astype(np.float32)),
            )
            tau = jnp.asarray(rng.uniform(-0.36, 0.36, 9).astype(np.float32))
            s1, _ = f1(state, tau)
            s2, _ = f2(state, tau)
            for a, b in zip(jax.tree_util.tree_leaves(s1),
                            jax.tree_util.tree_leaves(s2)):
                assert float(jnp.max(jnp.abs(a - b))) < 1e-4

    def test_pallas_matches_engine_v2_under_tgs(self):
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2
        from leibnizgym_tpu.ops.pallas_engine import physics_step_pallas

        cfg = SolverConfig(substeps=2, solver_iterations=4, solver_type=1)
        n = 8
        rng = np.random.default_rng(3)
        state = PhysicsState.default((n,)).replace(
            q=jnp.asarray((np.tile(tf_model.JOINT_POS_DEFAULT, 3)
                           + rng.uniform(-0.3, 0.3, (n, 9))).astype(np.float32)),
            qd=jnp.asarray(rng.uniform(-2, 2, (n, 9)).astype(np.float32)),
            cube_pos=jnp.asarray(np.stack(
                [rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
                 rng.uniform(0.03, 0.08, n)], -1).astype(np.float32)),
            cube_linvel=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)),
        )
        scene = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), SceneParams.default()
        )
        tau = jnp.asarray(rng.uniform(-0.36, 0.36, (n, 9)).astype(np.float32))
        ref = jax.vmap(physics_step_v2, in_axes=(0, 0, 0, None, None))(
            state, tau, scene, cfg, 0.02)
        pal = physics_step_pallas(state, tau, scene, cfg, 0.02, interpret=True)
        for name in ["q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                     "cube_angvel"]:
            err = float(jnp.abs(getattr(ref[0], name) - getattr(pal[0], name)).max())
            assert err < 1e-5, f"{name}: {err}"


@pytest.mark.slow  # full-env XLA compile
class TestEngineEquivalence:
    """The SoA hot-path engine must match the readable reference engine."""

    def test_single_step_match(self):
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        cfg = SolverConfig(substeps=2, solver_iterations=4)
        params = SceneParams.default()
        rng = np.random.default_rng(0)
        f1 = jax.jit(lambda s, t, p: physics_step(s, t, p, cfg, 0.02))
        f2 = jax.jit(lambda s, t, p: physics_step_v2(s, t, p, cfg, 0.02))
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
            s1, w1 = f1(state, tau, params)
            s2, w2 = f2(state, tau, params)
            for name in ["q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                         "cube_angvel"]:
                err = float(jnp.abs(getattr(s1, name) - getattr(s2, name)).max())
                assert err < 1e-4, f"{name}: {err}"
            assert float(jnp.abs(w1 - w2).max()) < 1e-2

    def test_batched_match(self):
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        cfg = SolverConfig(substeps=2, solver_iterations=4)
        n = 16
        params = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), SceneParams.default()
        )
        key = jax.random.PRNGKey(0)
        state = PhysicsState.default((n,)).replace(
            cube_pos=jnp.stack([
                jax.random.uniform(key, (n,), minval=-0.1, maxval=0.1),
                jax.random.uniform(jax.random.fold_in(key, 1), (n,), minval=-0.1, maxval=0.1),
                jax.random.uniform(jax.random.fold_in(key, 2), (n,), minval=0.03, maxval=0.08),
            ], axis=-1),
        )
        tau = jax.random.uniform(jax.random.fold_in(key, 3), (n, 9),
                                 minval=-0.36, maxval=0.36)
        v1 = jax.jit(jax.vmap(lambda s, t, p: physics_step(s, t, p, cfg, 0.02)))
        v2 = jax.jit(jax.vmap(lambda s, t, p: physics_step_v2(s, t, p, cfg, 0.02)))
        s1, _ = v1(state, tau, params)
        s2, _ = v2(state, tau, params)
        assert float(jnp.abs(s1.q - s2.q).max()) < 1e-4
        assert float(jnp.abs(s1.cube_pos - s2.cube_pos).max()) < 1e-4


def gravity_hold_torque():
    """Torque that holds the default pose against gravity (keeps fingers out
    of the way in cube-only tests)."""
    q = jnp.asarray(tf_model.JOINT_POS_DEFAULT)
    tau3 = jax.grad(lambda qq: D.potential_energy(qq, GRAV))(q)
    return jnp.tile(tau3, 3)


@pytest.mark.slow  # full-env XLA compile
class TestPallasEngine:
    """Pallas mega-kernel must match the SoA engine (interpret mode on CPU)."""

    def test_matches_engine_v2(self):
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2
        from leibnizgym_tpu.ops.pallas_engine import physics_step_pallas

        cfg = SolverConfig(substeps=2, solver_iterations=4)
        n = 8  # exercises the padding path (8 -> TILE)
        rng = np.random.default_rng(1)
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
        scene = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), SceneParams.default()
        )
        tau = jnp.asarray(rng.uniform(-0.36, 0.36, (n, 9)).astype(np.float32))
        ref = jax.vmap(physics_step_v2, in_axes=(0, 0, 0, None, None))(
            state, tau, scene, cfg, 0.02)
        pal = physics_step_pallas(state, tau, scene, cfg, 0.02, interpret=True)
        for name in ["q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                     "cube_angvel"]:
            err = float(jnp.abs(getattr(ref[0], name) - getattr(pal[0], name)).max())
            assert err < 1e-5, f"{name}: {err}"
        assert float(jnp.abs(ref[1] - pal[1]).max()) < 1e-4

    def test_2d_layout_matches_1d(self, monkeypatch):
        """LEIBNIZ_PALLAS_LAYOUT=2d is a pure register-relabeling of the env
        axis — results must be bit-identical to the 1d layout, including the
        padding tail handling (n not a multiple of 8*lanes)."""
        from leibnizgym_tpu.ops import pallas_engine as pe

        cfg = SolverConfig(substeps=2, solver_iterations=4, solver_type=1)
        n = 12  # not a multiple of SUBLANES: exercises pad + 2d reshape
        rng = np.random.default_rng(7)
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
        scene = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), SceneParams.default()
        )
        tau = jnp.asarray(rng.uniform(-0.36, 0.36, (n, 9)).astype(np.float32))
        # Pin BOTH layouts explicitly so the comparison cannot turn vacuous
        # under ambient LEIBNIZ_PALLAS_LAYOUT/TILE env vars (the 2d path only
        # engages when the tile divides into sublanes — assert it does)
        assert pe._effective_tile(n) % pe.SUBLANES == 0
        monkeypatch.setattr(pe, "LAYOUT", "1d")
        pe.physics_step_pallas.clear_cache()
        ref = pe.physics_step_pallas(state, tau, scene, cfg, 0.02, interpret=True)
        monkeypatch.setattr(pe, "LAYOUT", "2d")
        pe.physics_step_pallas.clear_cache()
        try:
            two = pe.physics_step_pallas(state, tau, scene, cfg, 0.02,
                                         interpret=True)
        finally:
            pe.physics_step_pallas.clear_cache()
        for name in ["q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                     "cube_angvel"]:
            a, b = getattr(ref[0], name), getattr(two[0], name)
            assert float(jnp.abs(a - b).max()) == 0.0, name
        assert float(jnp.abs(ref[1] - two[1]).max()) == 0.0


def test_sphere_cone_wall_no_spurious_spin():
    """Frictionless sphere pressed into the cone wall ABOVE the knee must not
    spin: the contact point lies along the contact normal (center - n*radius),
    so a pure normal impulse has zero lever arm about the sphere center.
    Regression for the round-4 advisor finding (the old horizontally-offset
    point gave the tilted cone normal a spurious r x n torque). Checked in
    BOTH the oracle and SoA engines — a shared error would evade the
    cross-engine equivalence suite."""
    from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

    cfg = SolverConfig(substeps=2, solver_iterations=8, object_shape=1)
    base = SceneParams.default(object_shape="sphere").replace(
        wall_radius=jnp.asarray(tf_model.WALL_CONE_BASE_RADIUS),
        wall_slope=jnp.asarray(tf_model.WALL_CONE_SLOPE),
        wall_knee_z=jnp.asarray(tf_model.WALL_CONE_KNEE_Z),
        gravity=jnp.zeros(3),
        mu_cube_wall=jnp.zeros(()),
        mu_cube_ground=jnp.zeros(()),
        mu_torsion=jnp.zeros(()),
    )
    n = 1
    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), base
    )
    radius = float(base.cube_half_extents[0])
    z = 0.15  # well above the knee (0.034): the cone normal is tilted here
    r_eff = (
        float(base.wall_radius)
        + float(base.wall_slope) * (z - float(base.wall_knee_z))
    )
    inv_len = 1.0 / np.sqrt(1.0 + float(base.wall_slope) ** 2)
    # center placed so the perpendicular gap is radius - 5 mm (penetrating)
    rho = r_eff - (radius - 0.005) / inv_len
    state = PhysicsState.default((n,)).replace(
        q=jnp.asarray(np.tile(tf_model.JOINT_POS_DEFAULT, (n, 3)), jnp.float32),
        cube_pos=jnp.asarray([[rho, 0.0, z]], jnp.float32),
        cube_linvel=jnp.asarray([[0.5, 0.0, 0.0]], jnp.float32),
    )
    tau = jnp.zeros((n, 9))
    f_o = jax.jit(jax.vmap(lambda s, t, p: physics_step(s, t, p, cfg, 0.02)))
    f_s = jax.jit(jax.vmap(lambda s, t, p: physics_step_v2(s, t, p, cfg, 0.02)))
    s_o, s_s = state, state
    for _ in range(10):
        s_o, _ = f_o(s_o, tau, params)
        s_s, _ = f_s(s_s, tau, params)
    for s in (s_o, s_s):
        # the tilted wall normal engaged: outward motion largely arrested,
        # tangential slide redirected up the frictionless flare ...
        assert float(s.cube_linvel[0, 0]) < 0.3
        assert float(s.cube_linvel[0, 2]) > 0.01
        # ... without inducing any spin on the frictionless sphere.
        # Residual is f32 roundoff on the contact point (~2e-5 rad/s);
        # the pre-fix lever arm (r x n ~ 0.019 m) spun it at ~10 rad/s.
        assert float(jnp.abs(s.cube_angvel).max()) < 1e-3


@pytest.mark.slow  # full-env XLA compile
class TestConeWall:
    """Piecewise cylinder+cone arena wall (SceneParams.wall_slope /
    wall_knee_z), fitted to the reference high_table_boundary.stl inner
    envelope (scripts/asset_tools.py deviation: cone max dev 2.3 mm vs
    80 mm for the default cylinder). Default (slope 0) must stay
    bit-identical to the historical cylinder."""

    def _cone_params(self):
        return SceneParams.default().replace(
            wall_radius=jnp.asarray(tf_model.WALL_CONE_BASE_RADIUS),
            wall_slope=jnp.asarray(tf_model.WALL_CONE_SLOPE),
            wall_knee_z=jnp.asarray(tf_model.WALL_CONE_KNEE_Z),
        )

    def test_gap_helper_analytics(self):
        """_wall_gap_s against hand-computed cone geometry."""
        from leibnizgym_tpu.ops.engine_v2 import _wall_gap_s

        p = self._cone_params()
        r0, s, zk = 0.1945, 0.577, 0.034
        # below the knee: plain cylinder
        gap, n = _wall_gap_s(jnp.asarray(0.15), jnp.asarray(0.0),
                             jnp.asarray(0.02), p)
        assert abs(float(gap) - (r0 - 0.15)) < 1e-6
        assert abs(float(n[0]) + 1.0) < 1e-6 and abs(float(n[2])) < 1e-6
        # above the knee: flared surface, perpendicular distance + tilted n
        z = 0.134
        r_eff = r0 + s * (z - zk)
        inv_len = 1.0 / np.sqrt(1.0 + s * s)
        gap, n = _wall_gap_s(jnp.asarray(0.15), jnp.asarray(0.0),
                             jnp.asarray(z), p)
        assert abs(float(gap) - (r_eff - 0.15) * inv_len) < 1e-6
        assert abs(float(n[0]) + inv_len) < 1e-6
        assert abs(float(n[2]) - s * inv_len) < 1e-6

    def test_slope_zero_matches_historical_cylinder_algebra(self):
        """With slope=0 the gap helper must reproduce the historical
        cylinder expressions EXACTLY: gap == wall_radius - rho (one
        subtraction, no extra roundoff) and a purely radial normal.

        Note the refactor's depth COMPOSITION at the call sites changed
        from `(rho + R) - wall_radius` to `R - (wall_radius - rho)`, which
        differs by <=1 ulp on some inputs — the slope-0 default is
        numerically identical to the round-1..3 cylinder at that level
        (golden trajectory + full cross-engine suite pass unchanged), not
        bit-for-bit. This test pins the part that IS exact."""
        from leibnizgym_tpu.ops.engine_v2 import _wall_gap_s

        p = SceneParams.default()
        rng = np.random.default_rng(5)
        for _ in range(50):
            px = float(rng.uniform(-0.2, 0.2))
            py = float(rng.uniform(-0.2, 0.2))
            pz = float(rng.uniform(0.0, 0.2))
            gap, n = _wall_gap_s(jnp.float32(px), jnp.float32(py),
                                 jnp.float32(pz), p)
            rho = np.sqrt(np.maximum(
                np.float32(px) * np.float32(px)
                + np.float32(py) * np.float32(py), np.float32(1e-18)))
            expect_gap = np.float32(p.wall_radius) - np.float32(rho)
            assert np.float32(gap) == expect_gap  # exact, not approx
            inv_rho = np.float32(1.0) / np.float32(rho)
            assert np.float32(n[0]) == np.float32(-np.float32(px) * inv_rho * np.float32(1.0))
            assert float(n[2]) == 0.0

    def test_tip_wall_contact_respects_flare(self):
        """A tip held above the knee near rho=0.2 penetrates the DEFAULT
        cylinder (r=0.191) but is free under the cone profile (true wall is
        ~0.25 out there): the cone must produce no wall impulse."""
        from leibnizgym_tpu.ops.engine_v2 import _wall_gap_s

        p_cyl = SceneParams.default()
        p_cone = self._cone_params()
        # direct gap check at a realistic high-tip position
        px, py, pz = jnp.asarray(0.2), jnp.asarray(0.0), jnp.asarray(0.12)
        gap_cyl, _ = _wall_gap_s(px, py, pz, p_cyl)
        gap_cone, _ = _wall_gap_s(px, py, pz, p_cone)
        tip_r = float(SceneParams.default().tip_radius)
        assert float(gap_cyl) < tip_r  # cylinder: in contact
        assert float(gap_cone) > tip_r  # cone: clear of the real wall

    def test_cone_engine_equivalence(self):
        """Cube thrown at the wall under the cone profile: oracle, SoA and
        pallas(interpret) engines agree."""
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2
        from leibnizgym_tpu.ops.pallas_engine import physics_step_pallas

        cfg = SolverConfig(substeps=2, solver_iterations=8)
        n = 4
        rng = np.random.default_rng(11)
        base = self._cone_params()
        params = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), base
        )
        state = PhysicsState.default((n,)).replace(
            q=jnp.asarray(np.tile(tf_model.JOINT_POS_DEFAULT, (n, 3)),
                          jnp.float32),
            cube_pos=jnp.asarray(np.stack(
                [rng.uniform(0.10, 0.15, n), rng.uniform(-0.02, 0.02, n),
                 rng.uniform(0.0325, 0.10, n)], -1).astype(np.float32)),
            cube_linvel=jnp.asarray(np.stack(
                [rng.uniform(0.8, 1.5, n), np.zeros(n), np.zeros(n)],
                -1).astype(np.float32)),
        )
        tau = jnp.zeros((n, 9))
        f_o = jax.jit(jax.vmap(lambda s, t, p: physics_step(s, t, p, cfg, 0.02)))
        f_s = jax.jit(jax.vmap(lambda s, t, p: physics_step_v2(s, t, p, cfg, 0.02)))
        s_o, s_s = state, state
        for _ in range(30):
            s_o, _ = f_o(s_o, tau, params)
            s_s, _ = f_s(s_s, tau, params)
        assert float(jnp.abs(s_o.cube_pos - s_s.cube_pos).max()) < 1e-4
        s_p, _ = physics_step_pallas(state, tau, params, cfg, 0.02,
                                     interpret=True)
        s_s1, _ = f_s(state, tau, params)
        assert float(jnp.abs(s_p.cube_pos - s_s1.cube_pos).max()) < 1e-5
        # the wall must actually engage in this scenario (not vacuous): under
        # the cone the cube still cannot escape the base-radius cylinder band
        rho = jnp.linalg.norm(s_s.cube_pos[:, 0:2], axis=-1)
        assert float(rho.max()) < tf_model.WALL_CONE_BASE_RADIUS + 0.02

    def test_env_arena_config(self):
        """gym config arena.profile='cone' reaches the scene params."""
        from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv

        env = TrifingerEnv(
            config={"num_instances": 2, "command_mode": "torque",
                    "sim": {"substeps": 2},
                    "arena": {"profile": "cone"}},
            verbose=False,
        )
        sb = env.params.scene_base
        assert abs(float(sb.wall_slope) - tf_model.WALL_CONE_SLOPE) < 1e-6
        assert abs(float(sb.wall_radius) - tf_model.WALL_CONE_BASE_RADIUS) < 1e-6
        env2 = TrifingerEnv(
            config={"num_instances": 2, "command_mode": "torque",
                    "sim": {"substeps": 2},
                    "arena": {"profile": "cone", "wall_slope": 0.5}},
            verbose=False,
        )
        assert abs(float(env2.params.scene_base.wall_slope) - 0.5) < 1e-6


@pytest.mark.slow  # full-env XLA compile
class TestContactPairGating:
    """Trace-time contact-group gates (SolverConfig.enable_*): a disabled
    group is not built at all — zero cost — and disabling groups a scenario
    cannot activate must not change its trajectory."""

    _GATES_OFF = dict(
        enable_cube_wall=False, enable_tip_ground=False,
        enable_tip_wall=False, enable_link_cube=False, enable_torsion=False,
    )

    def _trajectories(self, cfg_a, cfg_b, steps=10):
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        params = SceneParams.default()
        # resting non-spinning cube at center, fingers held at the default
        # raised pose by gravity-compensation torque: the tips stay well
        # above ground/cube and far from the wall -> every gated group
        # stays inactive
        q_def = jnp.asarray(tf_model.JOINT_POS_DEFAULT, dtype=jnp.float32)
        tau_g = jax.grad(lambda qq: D.potential_energy(qq, GRAV))(q_def)
        state0 = PhysicsState.default(()).replace(
            q=jnp.tile(q_def, 3),
            cube_pos=jnp.array([0.0, 0.0, 0.0325]),
        )
        tau = jnp.tile(tau_g, 3)
        outs = []
        for cfg in (cfg_a, cfg_b):
            f = jax.jit(lambda s, t, p, c=cfg: physics_step_v2(s, t, p, c, 0.02))
            s = state0
            for _ in range(steps):
                s, _ = f(s, tau, params)
            outs.append(s)
        return outs

    def test_inactive_groups_do_not_change_trajectory(self):
        """Geometric gates are exactly trajectory-neutral when their pair
        cannot occur. Torsion is excluded from the exact claim: a resting
        contact's torsion sweep actively damps numerical spin noise, so
        turning it off perturbs at float-noise scale (checked loosely)."""
        full = SolverConfig(substeps=2, solver_iterations=4)
        geo_off = dict(self._GATES_OFF)
        geo_off.pop("enable_torsion")
        gated = SolverConfig(substeps=2, solver_iterations=4, **geo_off)
        s_full, s_gated = self._trajectories(full, gated)
        for name in ["q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                     "cube_angvel"]:
            err = float(jnp.abs(getattr(s_full, name) - getattr(s_gated, name)).max())
            assert err == 0.0, f"{name}: {err}"
        all_off = SolverConfig(substeps=2, solver_iterations=4,
                               **self._GATES_OFF)
        s_full, s_all = self._trajectories(full, all_off)
        for name in ["q", "qd", "cube_pos", "cube_quat", "cube_linvel",
                     "cube_angvel"]:
            err = float(jnp.abs(getattr(s_full, name) - getattr(s_all, name)).max())
            assert err < 1e-3, f"{name}: {err}"

    def test_wall_gate_really_removes_the_wall(self):
        """With cube_wall off the boundary does not exist: a fast cube exits
        the arena (proof the group is absent, not merely zero-force)."""
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.15, 0.0, 0.0325]),
            cube_linvel=jnp.array([1.5, 0.0, 0.0]),
        )
        tau = jnp.zeros(9)
        for should_escape in (True, False):
            cfg = SolverConfig(substeps=2, solver_iterations=4,
                               enable_cube_wall=not should_escape)
            f = jax.jit(lambda s, t, p, c=cfg: physics_step_v2(s, t, p, c, 0.02))
            s = state
            for _ in range(25):
                s, _ = f(s, tau, params)
            rho = float(jnp.linalg.norm(s.cube_pos[:2]))
            if should_escape:
                assert rho > float(params.wall_radius) + 0.05
            else:
                assert rho <= float(params.wall_radius) + 0.01

    def test_oracle_engine_honors_gates(self):
        full = SolverConfig(substeps=2, solver_iterations=4)
        gated = SolverConfig(substeps=2, solver_iterations=4,
                             **self._GATES_OFF)
        from leibnizgym_tpu.ops.engine_v2 import physics_step_v2

        params = SceneParams.default()
        state = PhysicsState.default(()).replace(
            cube_pos=jnp.array([0.15, 0.0, 0.0325]),
            cube_linvel=jnp.array([1.5, 0.0, 0.0]),
        )
        tau = jnp.zeros(9)
        for stepper in (physics_step, physics_step_v2):
            f = jax.jit(lambda s, t, p: stepper(s, t, p, gated, 0.02))
            s = state
            for _ in range(25):
                s, _ = f(s, tau, params)
            assert float(jnp.linalg.norm(s.cube_pos[:2])) > float(
                params.wall_radius
            ) + 0.05, stepper.__name__

    def test_pallas_engine_honors_gates(self):
        """The Mosaic kernel inherits gating through the shared
        _substep_fields; interpret mode checks the packed path end-to-end
        (CLAUDE.md invariant: all engines must agree)."""
        from leibnizgym_tpu.ops.pallas_engine import physics_step_pallas

        gated = SolverConfig(substeps=2, solver_iterations=4,
                             **self._GATES_OFF)
        params = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (8,) + jnp.shape(x)),
            SceneParams.default(),
        )
        state = PhysicsState.default((8,)).replace(
            cube_pos=jnp.broadcast_to(jnp.array([0.15, 0.0, 0.0325]), (8, 3)),
            cube_linvel=jnp.broadcast_to(jnp.array([1.5, 0.0, 0.0]), (8, 3)),
        )
        tau = jnp.zeros((8, 9))
        s = state
        for _ in range(25):
            s, _ = physics_step_pallas(s, tau, params, gated, 0.02,
                                       interpret=True)
        rho = float(jnp.linalg.norm(s.cube_pos[0, :2]))
        assert rho > float(params.wall_radius[0]) + 0.05  # wall truly absent

    def test_env_config_plumbs_gates(self):
        from leibnizgym_tpu.config.presets import GYM_PRESETS
        from leibnizgym_tpu.envs.trifinger.config import (
            SIM_DEFAULT_CONFIG_DICT,
            TRIFINGER_DEFAULT_CONFIG_DICT,
        )
        from leibnizgym_tpu.envs.trifinger.env import build_static
        from leibnizgym_tpu.utils.helpers import merged_dict
        import copy

        base = merged_dict(
            dict(SIM_DEFAULT_CONFIG_DICT), TRIFINGER_DEFAULT_CONFIG_DICT
        )
        cfg = merged_dict(base, copy.deepcopy(GYM_PRESETS["trifinger_difficulty_1"]))
        cfg["num_instances"] = 4
        st = build_static(cfg)
        assert st.solver.enable_cube_wall and st.solver.enable_torsion

        cfg["sim"]["contact_pairs"] = {"cube_wall": False, "torsion": False}
        st = build_static(cfg)
        assert not st.solver.enable_cube_wall
        assert not st.solver.enable_torsion
        assert st.solver.enable_tip_wall  # untouched gates stay on

        cfg["sim"]["contact_pairs"] = {"bogus": False}
        with pytest.raises(ValueError, match="contact_pairs"):
            build_static(cfg)
