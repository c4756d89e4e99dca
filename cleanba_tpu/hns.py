"""Human-normalized score (HNS) utilities.

The reference reports median HNS over Atari-57 via openrlbenchmark/rliable
(README.md:14, static/plot.sh). This module provides the standard per-game
random/human reference scores (Mnih et al. 2015 / Badia et al. 2020 tables)
for the games the engine ships, plus aggregate helpers, so runs here report
the same metric family.

    hns = human_normalized_score("Breakout-v5", raw_return)
    agg = aggregate_hns({"Breakout-v5": [320.5, 290.1], ...})
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping

import numpy as np

__all__ = ["ATARI_SCORES", "human_normalized_score", "aggregate_hns"]

# (random, human) raw-score anchors — standard published table values.
ATARI_SCORES: Dict[str, tuple] = {
    "Breakout-v5": (1.7, 30.5),
    "Pong-v5": (-20.7, 14.6),
    "SpaceInvaders-v5": (148.0, 1668.7),
    "BeamRider-v5": (363.9, 16926.5),
    "Freeway-v5": (0.0, 29.6),
    "Boxing-v5": (0.1, 12.1),
    "Seaquest-v5": (68.4, 42054.7),
    "Qbert-v5": (163.9, 13455.0),
    "Asterix-v5": (210.0, 8503.3),
    "MsPacman-v5": (307.3, 6951.6),
    "DemonAttack-v5": (152.1, 1971.0),
    "Enduro-v5": (0.0, 860.5),
    "Atlantis-v5": (12850.0, 29028.1),
    "Bowling-v5": (23.1, 160.7),
    "FishingDerby-v5": (-91.7, -38.7),
    "CrazyClimber-v5": (10780.5, 35829.4),
    "Assault-v5": (222.4, 742.0),
    "Phoenix-v5": (761.4, 7242.6),
    "Gopher-v5": (257.6, 2412.5),
    "NameThisGame-v5": (2292.3, 8049.0),
    "Riverraid-v5": (1338.5, 17118.0),
    "KungFuMaster-v5": (258.5, 22736.3),
    "Tennis-v5": (-23.8, -8.3),
    "StarGunner-v5": (664.0, 10250.0),
    "Amidar-v5": (5.8, 1719.5),
    "BankHeist-v5": (14.2, 753.1),
    "UpNDown-v5": (533.4, 11693.2),
    "TimePilot-v5": (3568.0, 5229.2),
    "Alien-v5": (227.8, 7127.7),
    "RoadRunner-v5": (11.5, 7845.0),
    "Skiing-v5": (-17098.1, -4336.9),
    "Frostbite-v5": (65.2, 4334.7),
    "Kangaroo-v5": (52.0, 3035.0),
    "ChopperCommand-v5": (811.0, 7387.8),
    "Jamesbond-v5": (29.0, 302.8),
    "Zaxxon-v5": (32.5, 9173.3),
    "Berzerk-v5": (123.7, 2630.4),
    "WizardOfWor-v5": (563.5, 4756.5),
    "Asteroids-v5": (719.1, 47388.7),
    "Centipede-v5": (2090.9, 12017.0),
    "Tutankham-v5": (11.4, 167.6),
    "Venture-v5": (0.0, 1187.5),
    "IceHockey-v5": (-11.2, 0.9),
    "BattleZone-v5": (2360.0, 37187.5),
    "Surround-v5": (-10.0, 6.5),
    "Defender-v5": (2874.5, 18688.9),
    "Robotank-v5": (2.2, 11.9),
    "Gravitar-v5": (173.0, 3351.4),
    "DoubleDunk-v5": (-18.6, -16.4),
    "Hero-v5": (1027.0, 30826.4),
    "YarsRevenge-v5": (3092.9, 54576.9),
    "Krull-v5": (1598.0, 2665.5),
    "MontezumaRevenge-v5": (0.0, 4753.3),
    "Pitfall-v5": (-229.4, 6463.7),
    "PrivateEye-v5": (24.9, 69571.3),
    "Solaris-v5": (1236.3, 12326.7),
    "VideoPinball-v5": (16256.9, 17667.9),
}


def human_normalized_score(env_id: str, raw_return: float) -> float:
    """(score - random) / (human - random); 1.0 = human level."""
    if env_id not in ATARI_SCORES:
        raise KeyError(f"no HNS anchors for {env_id!r}")
    random_score, human_score = ATARI_SCORES[env_id]
    return (raw_return - random_score) / (human_score - random_score)


def aggregate_hns(returns_by_game: Mapping[str, Iterable[float]]) -> Dict[str, float]:
    """Median/mean HNS across games (per-game mean over seeds first)."""
    per_game = [
        human_normalized_score(g, float(np.mean(list(rs))))
        for g, rs in returns_by_game.items()
    ]
    return {
        "median_hns": float(np.median(per_game)),
        "mean_hns": float(np.mean(per_game)),
        "num_games": len(per_game),
    }
