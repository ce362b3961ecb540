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
