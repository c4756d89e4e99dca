"""Metrics/observability: TensorBoard writer with optional wandb mirroring.

Parity with the reference's scalar families `charts/*`, `stats/*`, `losses/*`
(cleanba_ppo.py:378-406, 728-749) and its rank-0-only real writer plus
`dummy_writer` null object for secondary actor threads (cleanba_ppo.py:664-665).
wandb is optional in this environment; when absent, `track=True` degrades to
TensorBoard-only with a warning.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Mapping, Optional

logger = logging.getLogger(__name__)

__all__ = ["MetricsWriter", "DummyWriter", "make_writer", "hyperparams_table"]


def hyperparams_table(cfg: Mapping[str, Any]) -> str:
    """Markdown hyperparameter table (reference cleanba_ppo.py:460-463)."""
    rows = "\n".join(f"|{k}|{v}|" for k, v in sorted(cfg.items()))
    return f"|param|value|\n|-|-|\n{rows}"


class DummyWriter:
    """No-op writer handed to non-primary actor threads (cleanba_ppo.py:664-665)."""

    def add_scalar(self, tag: str, value: Any, step: int) -> None:
        pass

    def add_text(self, tag: str, text: str, step: int = 0) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass


class MetricsWriter:
    """TensorBoard scalar writer, optionally mirrored to wandb.

    Uses tensorboardX like the reference (cleanba_ppo.py:457) and, when wandb is
    installed and `track` is on, wandb's tensorboard sync so both sinks see the
    same scalars (cleanba_ppo.py:447-456).
    """

    def __init__(
        self,
        logdir: str,
        config: Optional[Mapping[str, Any]] = None,
        track: bool = False,
        wandb_project: str = "cleanba_tpu",
        wandb_entity: Optional[str] = None,
        run_name: str = "",
    ) -> None:
        self._wandb = None
        if track:
            try:
                import wandb  # type: ignore

                wandb.init(
                    project=wandb_project,
                    entity=wandb_entity,
                    sync_tensorboard=True,
                    config=dict(config or {}),
                    name=run_name,
                    save_code=True,
                )
                self._wandb = wandb
            except ImportError:
                logger.warning("wandb not installed; --track falls back to TensorBoard only")
        from tensorboardX import SummaryWriter

        os.makedirs(logdir, exist_ok=True)
        self._tb = SummaryWriter(logdir)
        if config is not None:
            self._tb.add_text("hyperparameters", hyperparams_table(config))

    def add_scalar(self, tag: str, value: Any, step: int) -> None:
        self._tb.add_scalar(tag, value, step)

    def add_text(self, tag: str, text: str, step: int = 0) -> None:
        self._tb.add_text(tag, text, step)

    def flush(self) -> None:
        self._tb.flush()

    def close(self) -> None:
        self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


def make_writer(cfg, is_primary: bool):
    """Real writer for the primary (rank 0, thread 0) context, dummy otherwise."""
    if not is_primary:
        return DummyWriter()
    return MetricsWriter(
        logdir=cfg.run_path,
        config=cfg.asdict(),
        track=cfg.track,
        wandb_project=cfg.wandb_project_name,
        wandb_entity=cfg.wandb_entity,
        run_name=cfg.run_name,
    )
