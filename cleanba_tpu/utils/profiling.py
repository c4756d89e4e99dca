"""jax.profiler trace hooks.

Reference schedules a Perfetto trace between learner updates 4 and 15
(legacy_scripts/..._asap_profile.py:282-286, 429-433). On TPU the native
XPlane/TensorBoard trace is the useful artifact, so we emit that (the trace dir
can be opened with `tensorboard --logdir`), with Perfetto output kept as an
option.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)

__all__ = ["TraceWindow"]

TRACE_START_UPDATE = 4
TRACE_STOP_UPDATE = 15


class TraceWindow:
    """Starts/stops a jax.profiler trace over a window of learner updates."""

    def __init__(self, trace_dir: str, start: int = TRACE_START_UPDATE, stop: int = TRACE_STOP_UPDATE):
        self.trace_dir = trace_dir
        self.start_update = start
        self.stop_update = stop
        self._active = False

    def step(self, update: int) -> None:
        if not self.trace_dir:
            return
        if update == self.start_update and not self._active:
            logger.info("starting jax.profiler trace -> %s", self.trace_dir)
            jax.profiler.start_trace(self.trace_dir, create_perfetto_trace=True)
            self._active = True
        elif update == self.stop_update and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("stopped jax.profiler trace")

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
