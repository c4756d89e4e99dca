"""HNS utilities (the reference's headline metric family, README.md:14)."""

import numpy as np
import pytest

from cleanba_tpu.envs import NATIVE_ATARI_TASKS
from cleanba_tpu.hns import ATARI_SCORES, aggregate_hns, human_normalized_score


def test_every_native_atari_task_has_anchors():
    for task in NATIVE_ATARI_TASKS:
        assert task in ATARI_SCORES, f"missing HNS anchors for {task}"


def test_hns_definition():
    # 0 at random, 1 at human, linear in between.
    assert human_normalized_score("Breakout-v5", 1.7) == 0.0
    assert human_normalized_score("Breakout-v5", 30.5) == 1.0
    assert human_normalized_score("Freeway-v5", 14.8) == pytest.approx(0.5)


def test_aggregate_median_and_mean():
    agg = aggregate_hns({
        "Breakout-v5": [30.5, 30.5],     # 1.0
        "Freeway-v5": [29.6],            # 1.0
        "Pong-v5": [-20.7],              # 0.0
    })
    assert agg["num_games"] == 3
    assert agg["median_hns"] == pytest.approx(1.0)
    assert agg["mean_hns"] == pytest.approx(2.0 / 3.0)


def test_unknown_game_raises():
    with pytest.raises(KeyError):
        human_normalized_score("NotAGame-v5", 0.0)
