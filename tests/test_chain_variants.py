"""Robot URDF variant support (models/chain.py + ops/generic_chain.py).

The reference ships 16 robot URDF variants but only ever simulates
trifingerpro (trifinger_env.py:135). Round 1 could parse all of them; these
tests assert every variant is now *simulable* at the physics level via the
generic-chain path, and that the generic FK/dynamics agree with the
trifingerpro-specialized implementations.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leibnizgym_tpu.models import trifinger as tf_model
from leibnizgym_tpu.models.chain import ChainModel, chain_from_urdf
from leibnizgym_tpu.ops import dynamics
from leibnizgym_tpu.ops.generic_chain import (
    chain_default_state,
    chain_physics_step,
    finger_fk_chain,
    tips_world_chain,
)
from leibnizgym_tpu.ops.kinematics import finger_fk

# the repo's own shipped asset set (clean-room exports from the parsed model
# tables — scripts/export_assets.py); tests run standalone, no reference
# mount required
_URDF_DIR = os.path.join(
    os.path.dirname(__file__), "..", "resources", "assets", "robots"
)
_STAGE_URDF = os.path.join(
    os.path.dirname(__file__), "..", "resources", "assets", "stage",
    "trifinger_stage_tpu.urdf",
)
# every ROBOT variant (stage-only URDFs carry no fingers and are covered by
# the arena geometry path; the reference's finger_macro.urdf is a xacro macro
# include, not a robot)
_VARIANTS = [
    "trifingerpro.urdf",
    "fingerpro.urdf",
    "trifingerpro_with_stage.urdf",
    "trifingeredu.urdf",
    "fingeredu.urdf",
    "trifingeredu_with_stage.urdf",
    "trifinger.urdf",
    "trifinger_with_stage.urdf",
    "finger.urdf",
    "finger_with_stage.urdf",
]

# optional cross-check against the read-only reference mount; the
# shipped-name -> reference-path mapping's single source of truth is
# scripts/export_assets.py (loaded by path so no scripts/ package needed)
_REF_URDF_DIR = (
    "/root/reference/resources/assets/trifinger/robot_properties_fingers/urdf"
)


def _load_ref_variants():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_export_assets",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "export_assets.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return {out: ref for ref, out in mod.ROBOT_VARIANTS}


_REF_VARIANTS = _load_ref_variants()
# the exporter's variant list and this file's simulability list must cover
# the same assets — drift in either direction is an immediate failure
assert sorted(_REF_VARIANTS) == sorted(_VARIANTS), (
    "tests/_VARIANTS and scripts/export_assets.ROBOT_VARIANTS diverged"
)

needs_assets = pytest.mark.skipif(
    not os.path.isdir(_URDF_DIR), reason="shipped assets missing"
)
needs_reference = pytest.mark.skipif(
    not os.path.isdir(_REF_URDF_DIR), reason="reference assets not mounted"
)


def _pro() -> ChainModel:
    return chain_from_urdf(os.path.join(_URDF_DIR, "trifingerpro.urdf"))


@needs_assets
class TestProChainMatchesBakedTables:
    def test_tables(self):
        c = _pro()
        assert c.num_fingers == 3
        np.testing.assert_allclose(c.joint_xyz, tf_model.JOINT_OFFSETS, atol=1e-6)
        np.testing.assert_allclose(c.joint_axis, tf_model.JOINT_AXES, atol=1e-6)
        np.testing.assert_allclose(c.tip_xyz, tf_model.TIP_OFFSET, atol=1e-6)
        np.testing.assert_allclose(c.link_masses, tf_model.LINK_MASSES, rtol=1e-5)
        np.testing.assert_allclose(c.link_coms, tf_model.LINK_COMS, atol=1e-6)
        np.testing.assert_allclose(
            c.link_inertias, tf_model.LINK_INERTIAS, rtol=1e-4, atol=1e-9
        )
        np.testing.assert_allclose(c.joint_lower, tf_model.URDF_JOINT_LOWER)
        np.testing.assert_allclose(c.joint_upper, tf_model.URDF_JOINT_UPPER)
        np.testing.assert_allclose(c.mount_pos[:, 2], tf_model.MOUNT_HEIGHT,
                                   atol=1e-6)

    def test_fk_matches_specialized(self):
        c = _pro()
        rng = np.random.RandomState(0)
        q = jnp.asarray(
            rng.uniform(c.joint_lower, c.joint_upper, (64, 3)).astype(np.float32)
        )
        fk_gen = finger_fk_chain(q, c)
        fk_ref = finger_fk(q)
        for name in fk_ref._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(fk_gen, name)),
                np.asarray(getattr(fk_ref, name)),
                atol=2e-5, err_msg=name,
            )

    def test_dynamics_matches_specialized(self):
        c = _pro()
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.uniform(-1.0, 0.5, 3).astype(np.float32))
        qd = jnp.asarray(rng.uniform(-2, 2, 3).astype(np.float32))
        tau = jnp.asarray(rng.uniform(-0.3, 0.3, 3).astype(np.float32))
        g = jnp.array([0.0, 0.0, -9.81])
        qdd_ref = dynamics.forward_dynamics(q, qd, tau, g)
        qdd_gen = dynamics.forward_dynamics(
            q, qd, tau, g,
            fk=finger_fk_chain(q, c),
            base_masses=jnp.asarray(c.link_masses),
            base_inertias=jnp.asarray(c.link_inertias),
        )
        np.testing.assert_allclose(
            np.asarray(qdd_gen), np.asarray(qdd_ref), rtol=2e-3, atol=2e-3
        )


@needs_assets
class TestAllVariantsSimulable:
    @pytest.mark.parametrize("rel", _VARIANTS)
    def test_builds_and_steps(self, rel):
        c = chain_from_urdf(os.path.join(_URDF_DIR, rel))
        assert c.num_fingers in (1, 3)
        n = 4
        state = chain_default_state(c, n)
        tips0 = tips_world_chain(state.q, c)
        step = jax.jit(
            lambda s: chain_physics_step(
                s, jnp.zeros((n, 3 * c.num_fingers)), c, joint_damping=0.05
            )
        )
        for _ in range(50):
            state = step(state)
        assert np.isfinite(np.asarray(state.q)).all()
        assert np.isfinite(np.asarray(state.qd)).all()
        # joint limits respected
        lo = np.tile(np.asarray(c.joint_lower), c.num_fingers) - 1e-5
        hi = np.tile(np.asarray(c.joint_upper), c.num_fingers) + 1e-5
        qn = np.asarray(state.q)
        assert (qn >= lo).all() and (qn <= hi).all()
        tips1 = tips_world_chain(state.q, c)
        # something moved under gravity (free fall from mid-range pose)
        assert float(jnp.abs(tips1 - tips0).max()) > 1e-4

    def test_stage_only_urdf_rejected_cleanly(self):
        with pytest.raises(ValueError, match="no 3-DoF finger chains"):
            chain_from_urdf(_STAGE_URDF)

    def test_edu_differs_from_pro(self):
        pro = _pro()
        edu = chain_from_urdf(os.path.join(_URDF_DIR, "trifingeredu.urdf"))
        assert not np.allclose(pro.joint_axis, edu.joint_axis)
        assert not np.allclose(pro.mount_pos, edu.mount_pos)
        q = jnp.zeros((1, 9))
        tp = tips_world_chain(q, pro)
        te = tips_world_chain(q, edu)
        assert float(jnp.abs(tp - te).max()) > 1e-3


@needs_reference
class TestShippedMatchesReference:
    """The committed clean-room exports must rebuild the same chain tables
    as parsing the reference URDFs directly (only runs with the mount)."""

    @pytest.mark.parametrize("rel", _VARIANTS)
    def test_tables_equal(self, rel):
        import dataclasses

        shipped = chain_from_urdf(os.path.join(_URDF_DIR, rel))
        ref = chain_from_urdf(os.path.join(_REF_URDF_DIR, _REF_VARIANTS[rel]))
        assert shipped.num_fingers == ref.num_fingers
        for f in dataclasses.fields(shipped):
            if f.name in ("name", "num_fingers"):
                continue
            np.testing.assert_allclose(
                np.asarray(getattr(shipped, f.name)),
                np.asarray(getattr(ref, f.name)),
                atol=2e-6, err_msg=f"{rel}: {f.name}",
            )
