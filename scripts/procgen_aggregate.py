"""Aggregate procgen training runs into PROCGEN.md.

Reads each run's `charts/avg_episodic_return` tfevents (mean of the last
tail fraction = the run's score) and tabulates against approximate published
PPO baselines from Cobbe et al. 2020 ("Leveraging Procedural Generation to
Benchmark Reinforcement Learning", easy mode, 25M env-steps, values read
from the paper's per-game figures — approximate by nature). The reference
trains procgen through the same algorithm family
(legacy_scripts/cleanba_ppo_envpool_procgen.py) but publishes no procgen
score table, so the paper baseline is the available anchor.

    python scripts/procgen_aggregate.py --runs 'runs/procgen_train/pg_*' \
        --out PROCGEN.md
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cleanba_tpu.plot import read_scalars  # noqa: E402

# Approximate PPO@25M easy-mode returns, Cobbe et al. 2020 figures.
PPO_25M_EASY = {
    "Bigfish-v0": 9.0,
    "Starpilot-v0": 26.0,
    "Chaser-v0": 5.0,
    "Fruitbot-v0": 26.0,
    "Maze-v0": 9.0,
    "Leaper-v0": 4.5,
    "Coinrun-v0": 8.5,
    "Miner-v0": 9.0,
    "Heist-v0": 7.0,
    "Jumper-v0": 8.3,
    "Ninja-v0": 6.0,
}

# Official easy-mode (R_min, R_max) normalization constants from Cobbe et
# al. 2020 (the paper's normalized-return protocol): norm = (R - R_min) /
# (R_max - R_min), so 0 = random and 1 = the theoretical max.
NORM_EASY = {
    "Coinrun-v0": (5.0, 10.0),
    "Starpilot-v0": (2.5, 64.0),
    "Caveflyer-v0": (3.5, 12.0),
    "Dodgeball-v0": (1.5, 19.0),
    "Fruitbot-v0": (-1.5, 32.4),
    "Chaser-v0": (0.5, 13.0),
    "Miner-v0": (1.5, 13.0),
    "Jumper-v0": (3.0, 10.0),
    "Leaper-v0": (3.0, 10.0),
    "Maze-v0": (5.0, 10.0),
    "Bigfish-v0": (1.0, 40.0),
    "Heist-v0": (3.5, 10.0),
    "Climber-v0": (2.0, 12.6),
    "Plunder-v0": (4.5, 30.0),
    "Ninja-v0": (3.5, 10.0),
    "Bossfight-v0": (0.5, 13.0),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", default="runs/procgen_train/pg_*")
    p.add_argument("--out", default="PROCGEN.md")
    p.add_argument("--tail-frac", type=float, default=0.1)
    args = p.parse_args()

    rows = []
    for run_dir in sorted(glob.glob(args.runs)):
        m = re.search(r"pg_(.+?)_s(\d+)", os.path.basename(run_dir))
        if not m:
            continue
        env_id, seed = m.group(1), int(m.group(2))
        steps, values = read_scalars(run_dir, "charts/avg_episodic_return")
        if len(steps) == 0:
            print(f"skip {run_dir}: no return scalars", file=sys.stderr)
            continue
        cutoff = steps[-1] * (1.0 - args.tail_frac)
        score = float(np.mean(values[steps >= cutoff]))
        rows.append((env_id, seed, score, int(steps[-1])))

    max_steps = max((last for *_x, last in rows), default=0)
    normed = []
    with open(args.out, "w") as f:
        f.write("# Procgen learning evidence\n\n")
        f.write(
            "Trained with the Anakin PPO path (`train_ppo_anakin`, pure-JAX\n"
            "procgen twins on-device) through the benchmark orchestrator\n"
            "(`scripts/run_procgen_train.sh`), procgen-protocol contract:\n"
            "64x64x3 RGB, 15 actions, raw rewards, procedural levels. The\n"
            "baseline column is PPO@25M easy from Cobbe et al. 2020 (values\n"
            "read from the paper's figures — approximate); our runs are\n"
            "shorter, so treat the comparison as a trajectory check, not a\n"
            "final-score match. Score = mean return over the last 10% of\n"
            "training. The `norm` column is the paper's normalized-return\n"
            "protocol ((R - R_min)/(R_max - R_min), easy-mode constants):\n"
            "0 = random play, 1 = theoretical max. Rows marked `*` were\n"
            "budget-capped below the full step target — treat their scores\n"
            "as mid-curve.\n\n"
        )
        f.write("| game | seed | steps | final return | norm | PPO@25M easy (approx) |\n")
        f.write("|---|---|---|---|---|---|\n")
        for env_id, seed, score, last in rows:
            base = PPO_25M_EASY.get(env_id)
            base_s = f"{base:.1f}" if base is not None else "—"
            capped = "*" if last < 0.9 * max_steps else ""
            if env_id in NORM_EASY:
                lo, hi = NORM_EASY[env_id]
                nval = (score - lo) / (hi - lo)
                normed.append(nval)
                norm_s = f"{nval:.2f}"
            else:
                norm_s = "—"
            f.write(f"| {env_id}{capped} | {seed} | {last:,} | {score:.2f} "
                    f"| {norm_s} | {base_s} |\n")
        if normed:
            f.write(
                f"\n**Mean normalized return over {len(normed)} trained games: "
                f"{float(np.mean(normed)):.3f}** (Cobbe et al. report ~0.35-0.5 "
                "for PPO@25M easy across the 16-game suite).\n"
            )
        f.write(
            "\nThe post-training eval harness (`evaluate.py`, the procgen\n"
            "RGB path of the reference's cleanba_ppo_envpool_procgen_eval)\n"
            "runs automatically after each job via `--save-model`; eval\n"
            "returns land in each run's `eval/episodic_return` scalars.\n"
        )
    print(f"wrote {args.out} with {len(rows)} rows")


if __name__ == "__main__":
    main()
