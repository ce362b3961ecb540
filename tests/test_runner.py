"""Runner-level unit tests (fast; no training loops)."""

import numpy as np

from leibnizgym_tpu.config.presets import rlg_asymm_config
from leibnizgym_tpu.learning.ppo import PPOConfig
from leibnizgym_tpu.learning.runner import AverageMeter


class TestAverageMeter:
    def test_window(self):
        m = AverageMeter(maxlen=3)
        assert m.get_mean() == 0.0 and m.current_size == 0
        m.update([1.0, 2.0, 3.0, 4.0])  # window keeps last 3
        assert m.current_size == 3
        assert np.isclose(m.get_mean(), 3.0)

    def test_scalar_update(self):
        m = AverageMeter()
        m.update(5.0)
        assert m.get_mean() == 5.0


class TestConfigKnobs:
    def test_score_to_win_and_games_to_track(self):
        params = rlg_asymm_config()["params"]
        params["config"]["score_to_win"] = 1234.0
        params["config"]["games_to_track"] = 7
        cfg = PPOConfig.from_rlg_params(params, 64)
        assert cfg.score_to_win == 1234.0
        assert cfg.games_to_track == 7

    def test_network_dtype_mapping(self):
        params = rlg_asymm_config()["params"]
        params["config"]["mixed_precision"] = True
        cfg = PPOConfig.from_rlg_params(params, 64)
        assert cfg.network_dtype == "bfloat16"


# ---------------------------------------------------------------------------
# Train-loop unit tests: stubbed Runner (no env, no PPO) exercising the
# pipelined host loop (learning/runner.py:286-462) — metric/ts pairing at
# depth>1, nan-halt checkpoint/dump, watchdog re-arm, drain, early stop.
# ---------------------------------------------------------------------------

import dataclasses
import os

import jax.numpy as jnp

from leibnizgym_tpu.learning.runner import Runner
import pytest


class _StubTS:
    """Stands in for PPOTrainState; identity = the epoch that produced it."""

    def __init__(self, epoch):
        self.epoch = epoch
        self.frame = epoch * 100


class _StubStatic:
    num_envs = 8


class _StubParams:
    """EnvParams stand-in for the curriculum controller's .replace()."""

    def __init__(self):
        self.curriculum_level = 0.0

    def replace(self, **kw):
        new = _StubParams()
        new.curriculum_level = float(kw.get("curriculum_level", self.curriculum_level))
        return new


def _metrics(epoch, kl=0.01, ep_return=None, cur=None):
    m = {
        "info/frames": np.float32(epoch * 100),
        "info/kl": np.float32(kl),
        "info/lr": np.float32(3e-4),
        "episodes/finished_returns": np.zeros(8, np.float32),
        "episodes/finished_n": np.zeros(8, np.int32),
    }
    if ep_return is not None:
        m["episodes/finished_returns"] = np.full(8, ep_return, np.float32)
        m["episodes/finished_n"] = np.ones(8, np.int32)
    if cur is not None:
        m["episodes/finished_count"] = np.float32(8.0)
        m["episodes/finished_success_sum"] = np.float32(8.0 * cur)
        m["env/strict_success_frac"] = np.float32(0.5)
        m["env/curriculum_level"] = np.float32(0.0)
    return m


def _stub_runner(tmp_path, cfg, metrics_for_epoch, cur_gated=False):
    """Build a Runner skeleton without an env: only the attributes the
    train() loop touches, with _train_iter and save() stubbed."""
    r = Runner.__new__(Runner)
    r.verbose = False
    r.ppo_cfg = cfg
    r.static = _StubStatic()
    r.env_params = _StubParams()
    r.seed = 0
    r.logdir = str(tmp_path)
    r.nn_dir = os.path.join(str(tmp_path), "nn")
    os.makedirs(r.nn_dir, exist_ok=True)
    r.writer = None
    r.game_rewards = __import__(
        "leibnizgym_tpu.learning.runner", fromlist=["AverageMeter"]
    ).AverageMeter(cfg.games_to_track)
    r.ts = _StubTS(0)
    r._cur_gated = cur_gated
    if cur_gated:
        import collections as _c

        r._cur_level = 0.0
        r._cur_up_thresh = 0.5
        r._cur_down_thresh = 0.1
        r._cur_up_step = 0.1
        r._cur_down_step = 0.2
        r._cur_window = 2
        r._suc_win = _c.deque(maxlen=2)
        r._strict_win = _c.deque(maxlen=64)
        r._best_cur_score = float("inf")  # suppress best_curriculum saves
        r._last_cur_save = 0.0

    calls = {"iters": 0, "saves": [], "flushes": [0]}

    def train_iter(cfg_, static_, params_, ts):
        calls["iters"] += 1
        e = calls["iters"]
        return _StubTS(e), metrics_for_epoch(e)

    r._train_iter = train_iter
    r.save = lambda name, ts=None, wait=False: calls["saves"].append(
        (name, None if ts is None else ts.epoch, wait)
    )
    r.flush_saves = lambda: calls["flushes"].__setitem__(
        0, calls["flushes"][0] + 1
    )
    return r, calls


def _loop_cfg(**kw):
    base = dict(
        host_pipeline_depth=4, save_best_after=1, save_frequency=0,
        score_to_win=1e9, games_to_track=100, nan_telemetry=False,
        horizon=32, max_epochs=100000,
    )
    base.update(kw)
    return dataclasses.replace(PPOConfig(), **base)


class TestTrainLoopPipelining:
    def test_best_save_holds_the_epoch_that_earned_it(self, tmp_path):
        """With depth=4, 'best' must checkpoint the ts of the epoch whose
        metrics triggered it — not the pipeline head 3 epochs ahead."""
        cfg = _loop_cfg()
        # reward improves every epoch -> best fires on every processed epoch
        r, calls = _stub_runner(
            tmp_path, cfg, lambda e: _metrics(e, ep_return=float(e))
        )
        r.train(max_epochs=10)
        best = [(ts_e,) for name, ts_e, _ in calls["saves"] if name == "best"]
        assert [b[0] for b in best] == list(range(1, 11))
        # the device ran ahead: at the time epoch 1 was processed, 4 epochs
        # had been dispatched — the pairing is what protects 'best'
        assert calls["iters"] == 10

    def test_drain_processes_every_epoch_once(self, tmp_path):
        cfg = _loop_cfg(save_frequency=1)
        r, calls = _stub_runner(tmp_path, cfg, lambda e: _metrics(e))
        r.train(max_epochs=6)
        last = [ts_e for name, ts_e, _ in calls["saves"] if name == "last"]
        assert last == [1, 2, 3, 4, 5, 6]  # tail drained, in order, once each

    def test_max_epochs_is_cumulative_across_resume(self, tmp_path):
        """A supervisor restart restores ts.epoch from the checkpoint; the
        loop must finish the REMAINING budget, not train max_epochs more
        epochs (the pre-round-5 per-process count silently extended every
        auto-restarted run)."""
        cfg = _loop_cfg()
        r, calls = _stub_runner(tmp_path, cfg, lambda e: _metrics(e))
        r.ts = _StubTS(7)  # as restored from a checkpoint
        r.train(max_epochs=10)
        assert calls["iters"] == 3
        # fully-consumed budget: train() is a no-op AND must not overwrite
        # the finished run's final checkpoint with the just-restored state
        r2, calls2 = _stub_runner(tmp_path, cfg, lambda e: _metrics(e))
        r2.ts = _StubTS(10)
        r2.train(max_epochs=10)
        assert calls2["iters"] == 0
        assert calls2["saves"] == []

    def test_watchdog_tightens_on_resumed_run(self, tmp_path):
        """After a supervisor resume the first PROCESSED epoch is
        start_epoch+1, not 1 — the watchdog must still drop from the
        first-epoch compile floor back to the caller's timeout."""
        cfg = _loop_cfg()
        r, calls = _stub_runner(tmp_path, cfg, lambda e: _metrics(e))
        r.ts = _StubTS(7)  # as restored from a checkpoint
        r.train(max_epochs=10, watchdog_timeout=10.0)
        assert r._watchdog_timeout == 10.0  # not stuck at the 1800s floor
        assert r._watchdog_armed is False

    def test_nan_halt_saves_first_bad_epoch_and_stops(self, tmp_path):
        cfg = _loop_cfg()
        bad = 5

        def metrics(e):
            return _metrics(e, kl=float("nan") if e >= bad else 0.01)

        r, calls = _stub_runner(tmp_path, cfg, metrics)
        r.train(max_epochs=20)
        nan_saves = [ts_e for name, ts_e, _ in calls["saves"]
                     if name == "nan_halt"]
        assert nan_saves == [bad]  # the FIRST nan epoch, not the head
        # loop stopped: device dispatched at most bad+depth-1 epochs
        assert calls["iters"] <= bad + cfg.host_pipeline_depth - 1
        assert calls["flushes"][0] >= 1  # finally-block flushed async saves

    def test_nan_telemetry_dumps_pre_nan_state(self, tmp_path):
        cfg = _loop_cfg(nan_telemetry=True)  # forces depth 1

        def metrics(e):
            return _metrics(e, kl=float("nan") if e == 3 else 0.01)

        r, calls = _stub_runner(tmp_path, cfg, metrics)
        r.train(max_epochs=10)
        dump = os.path.join(str(tmp_path), "nan_prev_ts.pkl")
        assert os.path.exists(dump)
        import pickle

        with open(dump, "rb") as fh:
            prev = pickle.load(fh)
        assert prev.epoch == 2  # the state BEFORE the first bad epoch

    def test_watchdog_rearm_after_first_epoch(self, tmp_path):
        """The watchdog arms loose for the first-epoch compile, tightens to
        the caller's timeout once epoch 1 completes, and is DISARMED when
        train() returns (a live watchdog would os._exit(42) this pytest
        process once the stub run's _last_progress goes stale)."""
        cfg = _loop_cfg()
        r, calls = _stub_runner(tmp_path, cfg, lambda e: _metrics(e))
        r.train(max_epochs=3, watchdog_timeout=10.0)
        assert r._watchdog_timeout == 10.0  # re-armed from the 1800s floor
        assert r._watchdog_armed is False  # disarmed on exit

    def test_score_to_win_early_stop(self, tmp_path):
        cfg = _loop_cfg(score_to_win=50.0)
        r, calls = _stub_runner(
            tmp_path, cfg, lambda e: _metrics(e, ep_return=float(e * 10))
        )
        r.train(max_epochs=100)
        # reward mean crosses 50 around epoch 5-6; far fewer than 100 iters
        assert calls["iters"] < 20


class TestCurriculumController:
    def _run(self, tmp_path, spes):
        """Drive the success-gated controller with a scripted
        successes-per-episode sequence; return the level trajectory."""
        cfg = _loop_cfg()
        levels = []

        def metrics(e):
            spe = spes[min(e - 1, len(spes) - 1)]
            return _metrics(e, cur=spe)

        r, calls = _stub_runner(tmp_path, cfg, metrics, cur_gated=True)
        orig = r._set_curriculum_level

        def record(level):
            Runner._set_curriculum_level(r, level)
            levels.append(r._cur_level)

        r._set_curriculum_level = record
        r.train(max_epochs=len(spes))
        return r, levels

    def test_level_advances_on_sustained_success(self, tmp_path):
        r, levels = self._run(tmp_path, [2.0] * 10)
        assert levels and levels[-1] > 0.5  # climbed (window=2, +0.1/sample)
        assert all(b >= a for a, b in zip(levels, levels[1:]))

    def test_level_retreats_on_collapse(self, tmp_path):
        r, levels = self._run(tmp_path, [2.0] * 6 + [0.0] * 6)
        assert max(levels) > 0.3
        assert levels[-1] < max(levels)  # retreated after collapse

    def test_device_params_track_level(self, tmp_path):
        r, levels = self._run(tmp_path, [2.0] * 8)
        assert abs(float(r.env_params.curriculum_level) - r._cur_level) < 1e-6


@pytest.mark.slow  # full-env XLA compile
class TestCLITrainSmoke:
    """End-to-end: the normal CLI config path (presets -> update_cfg ->
    run_training) trains a short D1 run with frame stacking engaged
    (VERDICT r3 missing-#3: `frames` must be reachable from the config
    surface, reference rlg_train.py:83-86)."""

    def test_d1_frames2_trains_through_cli(self, tmp_path):
        import numpy as np

        from leibnizgym_tpu.config.presets import parse_cli, update_cfg
        from leibnizgym_tpu.learning.train import run_training

        cfg = update_cfg(parse_cli([
            "gym=trifinger_difficulty_1", "args.num_envs=8",
            f"args.logdir={tmp_path}", "gym.sim.substeps=2",
            "rlg.params.config.frames=2", "rlg.params.config.steps_num=4",
            "rlg.params.config.mini_epochs=2",
            "rlg.params.config.save_frequency=0",
        ]))
        assert cfg["rlg"]["params"]["config"]["frames"] == 2
        result = run_training(
            task_cfg=cfg["gym"], agent_cfg=cfg["rlg"],
            logdir=str(tmp_path), seed=0, train=True, max_epochs=2,
        )
        assert np.isfinite(result)
