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
            "training.\n\n"
        )
        f.write("| game | seed | steps | final return | PPO@25M easy (approx) |\n")
        f.write("|---|---|---|---|---|\n")
        for env_id, seed, score, last in rows:
            base = PPO_25M_EASY.get(env_id)
            base_s = f"{base:.1f}" if base is not None else "—"
            f.write(f"| {env_id} | {seed} | {last:,} | {score:.2f} | {base_s} |\n")
        f.write(
            "\nThe post-training eval harness (`evaluate.py`, the procgen\n"
            "RGB path of the reference's cleanba_ppo_envpool_procgen_eval)\n"
            "runs automatically after each job via `--save-model`; eval\n"
            "returns land in each run's `eval/episodic_return` scalars.\n"
        )
    print(f"wrote {args.out} with {len(rows)} rows")


if __name__ == "__main__":
    main()
