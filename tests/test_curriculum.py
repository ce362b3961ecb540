"""Success-gated curriculum (round-2 D4 recipe v2).

The frame-annealed curriculum collapsed (RESULTS.md): the ramp outpaced
learning and could not retreat. These tests cover the gated replacement:
EnvParams.curriculum_level drives goal-orientation difficulty and success
tolerances; a host controller in the Runner moves the level on measured
successes-per-episode; the level round-trips through checkpoints.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leibnizgym_tpu.config.presets import GYM_PRESETS, parse_cli
from leibnizgym_tpu.envs.trifinger.env import (
    TrifingerEnv,
    _ori_difficulty_frac,
)

# full-env XLA compiles / multi-process: full-suite only
pytestmark = pytest.mark.slow


def _make_env(n=8, **over):
    cfg = copy.deepcopy(GYM_PRESETS["trifinger_difficulty_4_curriculum"])
    cfg["num_instances"] = n
    cfg["episode_length"] = 20
    cfg.pop("rlg_overrides", None)
    cfg.update(over)
    return TrifingerEnv(config=cfg, verbose=False)


def test_gated_static_flags():
    env = _make_env()
    assert env.static.curriculum_success_gated
    assert float(env.params.curriculum_level) == 0.0
    # preset carries the agent-side overrides for parse_cli to apply
    cfg = parse_cli(["gym=trifinger_difficulty_4_curriculum"])
    assert "rlg_overrides" not in cfg["gym"]
    assert cfg["rlg"]["params"]["config"]["log_std_min"] == -1.6


def test_level_drives_tolerances():
    env = _make_env()
    act = jnp.zeros((8, env.static.action_dim))
    env.reset()
    out = {}
    for lvl in (0.0, 0.5, 1.0):
        env.params = env.params.replace(curriculum_level=jnp.asarray(lvl))
        _, _, _, info = env.step(act)
        out[lvl] = (
            float(info["env/position_tolerance"]),
            float(info["env/orientation_tolerance"]),
            float(info["env/curriculum_level"]),
        )
        assert "env/strict_success_frac" in info
    assert out[0.0][:2] == pytest.approx((0.05, 0.8), rel=1e-5)
    assert out[1.0][:2] == pytest.approx((0.02, 0.25), rel=1e-5)
    assert out[0.5][0] == pytest.approx(0.035, rel=1e-5)
    assert out[0.5][2] == 0.5
    # out-of-range host values clamp instead of extrapolating
    env.params = env.params.replace(curriculum_level=jnp.asarray(3.0))
    _, _, _, info = env.step(act)
    assert float(info["env/orientation_tolerance"]) == pytest.approx(0.25, rel=1e-5)


def test_level_drives_goal_orientation_difficulty():
    env = _make_env()
    frames = jnp.zeros((), jnp.int32)
    lo = _ori_difficulty_frac(
        env.static, env.params.replace(curriculum_level=jnp.asarray(0.0)), frames
    )
    hi = _ori_difficulty_frac(
        env.static, env.params.replace(curriculum_level=jnp.asarray(1.0)), frames
    )
    assert float(lo) == pytest.approx(env.static.ori_difficulty_init)
    assert float(hi) == pytest.approx(1.0)


def test_frame_anneal_still_works_when_not_gated():
    env = _make_env(goal_curriculum={
        "orientation_difficulty_init": 0.3, "anneal_frames": 1000.0 * 8,
    })
    assert not env.static.curriculum_success_gated
    frac0 = _ori_difficulty_frac(env.static, env.params, jnp.asarray(0, jnp.int32))
    frac1 = _ori_difficulty_frac(env.static, env.params, jnp.asarray(10**6, jnp.int32))
    assert float(frac0) == pytest.approx(0.3)
    assert float(frac1) == pytest.approx(1.0)


def test_ungated_env_has_no_curriculum_metrics():
    cfg = copy.deepcopy(GYM_PRESETS["trifinger_difficulty_1"])
    cfg["num_instances"] = 8
    cfg["episode_length"] = 20
    env = TrifingerEnv(config=cfg, verbose=False)
    env.reset()
    _, _, _, info = env.step(jnp.zeros((8, env.static.action_dim)))
    assert "env/strict_success_frac" not in info
    assert "env/curriculum_level" not in info


def test_controller_moves_level_and_checkpoints_it(tmp_path):
    from leibnizgym_tpu.learning.runner import Runner

    cfg = parse_cli([
        "gym=trifinger_difficulty_4_curriculum",
        "rlg.params.config.horizon_length=8",
        "rlg.params.config.minibatch_size=32",
    ])
    gym_cfg = cfg["gym"]
    gym_cfg["num_instances"] = 8
    gym_cfg["episode_length"] = 16
    r = Runner(gym_cfg, cfg["rlg"]["params"], logdir=str(tmp_path), seed=0,
               verbose=False)
    assert r._cur_gated
    # controller math: raise only on a full window above threshold
    r._suc_win.extend([0.8] * r._cur_window)
    lvl0 = r._cur_level
    r._set_curriculum_level(lvl0 + r._cur_up_step)
    assert float(r.env_params.curriculum_level) == pytest.approx(
        lvl0 + r._cur_up_step
    )
    # level survives a save/restore roundtrip (supervised resume path)
    r.reset()
    r._set_curriculum_level(0.42)
    path = r.save("last")
    r2 = Runner(gym_cfg, cfg["rlg"]["params"], logdir=str(tmp_path), seed=1,
                verbose=False)
    r2.restore(path)
    assert r2._cur_level == pytest.approx(0.42)
    assert float(r2.env_params.curriculum_level) == pytest.approx(0.42)


def test_gated_train_epoch_produces_controller_signal(tmp_path):
    """One real jitted train iteration emits the controller's inputs."""
    from leibnizgym_tpu.learning.ppo import train_iteration
    from leibnizgym_tpu.learning.runner import Runner

    cfg = parse_cli([
        "gym=trifinger_difficulty_4_curriculum",
        "rlg.params.config.horizon_length=24",
        "rlg.params.config.minibatch_size=32",
    ])
    gym_cfg = cfg["gym"]
    gym_cfg["num_instances"] = 8
    gym_cfg["episode_length"] = 16  # episodes finish inside the horizon
    r = Runner(gym_cfg, cfg["rlg"]["params"], logdir=str(tmp_path), seed=0,
               verbose=False)
    r.reset()
    ts, metrics = jax.jit(train_iteration, static_argnums=(0, 1))(
        r.ppo_cfg, r.static, r.env_params, r.ts
    )
    metrics = jax.device_get(metrics)
    assert float(metrics["episodes/finished_count"]) > 0
    assert np.isfinite(float(metrics["episodes/finished_success_sum"]))
    assert "env/strict_success_frac" in metrics
    assert float(metrics["env/curriculum_level"]) == 0.0
