"""Sebulba IMPALA trainer entry point (reference cleanba/cleanba_impala.py).

    python -m cleanba_tpu.train_impala --env-id Breakout-v5 --local-num-envs 64 ...
"""

from cleanba_tpu.config import ImpalaConfig
from cleanba_tpu.runtime.trainer import train
from cleanba_tpu.utils.cli import parse_cli


def main(argv=None):
    cfg = parse_cli(ImpalaConfig, argv, description="TPU-native Sebulba IMPALA (cleanba parity)")
    train(cfg)


if __name__ == "__main__":
    main()
