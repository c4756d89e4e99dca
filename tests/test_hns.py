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


def test_hns_aggregate_script_end_to_end(tmp_path):
    """scripts/hns_aggregate.py turns orchestrator run dirs into HNS.md +
    JSON: tail-mean scoring, per-seed grouping, anchor filtering."""
    import json
    import subprocess
    import sys
    import os

    from tensorboardX import SummaryWriter

    def write_run(name, values):
        d = tmp_path / name
        w = SummaryWriter(str(d))
        for i, v in enumerate(values):
            w.add_scalar("charts/avg_episodic_return", v, (i + 1) * 1000)
        w.close()

    # Two seeds of Breakout (tail-10% means 300 and 400 -> mean 350) and one
    # of Pong; a run without anchors must be excluded from the aggregate.
    # The tail window is the last 10% of steps (steps 9000 and 10000 here).
    write_run("hns_Breakout-v5_s1", [10.0] * 8 + [300.0, 300.0])
    write_run("hns_Breakout-v5_s2", [10.0] * 8 + [400.0, 400.0])
    write_run("hns_Pong-v5_s1", [-21.0] * 8 + [14.6, 14.6])
    write_run("hns_NotAGame-v5_s1", [5.0] * 10)

    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "scripts", "hns_aggregate.py")
    out_md = tmp_path / "HNS.md"
    out_json = tmp_path / "hns.json"
    subprocess.run(
        [sys.executable, script, "--runs", str(tmp_path / "hns_*"),
         "--out", str(out_md), "--json", str(out_json)],
        check=True, capture_output=True,
    )
    payload = json.loads(out_json.read_text())
    assert payload["aggregate"]["num_games"] == 2
    assert payload["per_game"]["Breakout-v5"]["mean_return"] == 350.0
    assert abs(payload["per_game"]["Pong-v5"]["hns"] - 1.0) < 1e-6
    assert "NotAGame" not in payload["per_game"]
    md = out_md.read_text()
    assert "Median HNS" in md and "Breakout-v5" in md
