"""HNS utilities (the reference's headline metric family, README.md:14)."""

import numpy as np
import pytest

from cleanba_tpu.envs import NATIVE_ATARI_TASKS
from cleanba_tpu.hns import ATARI_SCORES, aggregate_hns, human_normalized_score


def test_every_native_atari_task_has_anchors():
    for task in NATIVE_ATARI_TASKS:
        assert task in ATARI_SCORES, f"missing HNS anchors for {task}"


# Independently-typed copy of the canonical (random, human) anchor table
# (Mnih et al. 2015 extended to Atari-57 by Badia et al. 2020, as reproduced
# by rliable / openrlbenchmark — the table the reference's plot.sh consumes).
# Guards ATARI_SCORES against single-entry typos (ADVICE r4: Robotank human
# was 8.9 instead of 11.9).
CANONICAL_ATARI57 = {
    "Alien": (227.8, 7127.7),
    "Amidar": (5.8, 1719.5),
    "Assault": (222.4, 742.0),
    "Asterix": (210.0, 8503.3),
    "Asteroids": (719.1, 47388.7),
    "Atlantis": (12850.0, 29028.1),
    "BankHeist": (14.2, 753.1),
    "BattleZone": (2360.0, 37187.5),
    "BeamRider": (363.9, 16926.5),
    "Berzerk": (123.7, 2630.4),
    "Bowling": (23.1, 160.7),
    "Boxing": (0.1, 12.1),
    "Breakout": (1.7, 30.5),
    "Centipede": (2090.9, 12017.0),
    "ChopperCommand": (811.0, 7387.8),
    "CrazyClimber": (10780.5, 35829.4),
    "Defender": (2874.5, 18688.9),
    "DemonAttack": (152.1, 1971.0),
    "DoubleDunk": (-18.6, -16.4),
    "Enduro": (0.0, 860.5),
    "FishingDerby": (-91.7, -38.7),
    "Freeway": (0.0, 29.6),
    "Frostbite": (65.2, 4334.7),
    "Gopher": (257.6, 2412.5),
    "Gravitar": (173.0, 3351.4),
    "Hero": (1027.0, 30826.4),
    "IceHockey": (-11.2, 0.9),
    "Jamesbond": (29.0, 302.8),
    "Kangaroo": (52.0, 3035.0),
    "Krull": (1598.0, 2665.5),
    "KungFuMaster": (258.5, 22736.3),
    "MontezumaRevenge": (0.0, 4753.3),
    "MsPacman": (307.3, 6951.6),
    "NameThisGame": (2292.3, 8049.0),
    "Phoenix": (761.4, 7242.6),
    "Pitfall": (-229.4, 6463.7),
    "Pong": (-20.7, 14.6),
    "PrivateEye": (24.9, 69571.3),
    "Qbert": (163.9, 13455.0),
    "Riverraid": (1338.5, 17118.0),
    "RoadRunner": (11.5, 7845.0),
    "Robotank": (2.2, 11.9),
    "Seaquest": (68.4, 42054.7),
    "Skiing": (-17098.1, -4336.9),
    "Solaris": (1236.3, 12326.7),
    "SpaceInvaders": (148.0, 1668.7),
    "StarGunner": (664.0, 10250.0),
    "Surround": (-10.0, 6.5),
    "Tennis": (-23.8, -8.3),
    "TimePilot": (3568.0, 5229.2),
    "Tutankham": (11.4, 167.6),
    "UpNDown": (533.4, 11693.2),
    "Venture": (0.0, 1187.5),
    "VideoPinball": (16256.9, 17667.9),
    "WizardOfWor": (563.5, 4756.5),
    "YarsRevenge": (3092.9, 54576.9),
    "Zaxxon": (32.5, 9173.3),
}


def test_anchor_table_matches_canonical_atari57():
    assert len(CANONICAL_ATARI57) == 57
    for game, (rnd, human) in CANONICAL_ATARI57.items():
        key = f"{game}-v5"
        assert key in ATARI_SCORES, f"missing anchors for {key}"
        assert ATARI_SCORES[key] == (rnd, human), (
            f"{key}: ATARI_SCORES has {ATARI_SCORES[key]}, canonical is {(rnd, human)}"
        )


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
