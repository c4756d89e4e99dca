"""Sebulba PPO trainer entry point (reference cleanba/cleanba_ppo.py).

    python -m cleanba_tpu.train_ppo --env-id Breakout-v5 --local-num-envs 64 ...
"""

from cleanba_tpu.config import PPOConfig
from cleanba_tpu.runtime.trainer import train
from cleanba_tpu.utils.cli import parse_cli


def main(argv=None):
    cfg = parse_cli(PPOConfig, argv, description="TPU-native Sebulba PPO (cleanba parity)")
    train(cfg)


if __name__ == "__main__":
    main()
