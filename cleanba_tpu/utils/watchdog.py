"""Stall watchdog: periodic all-thread stack dumps.

The reference has no in-code failure detection (SURVEY.md §5 — SLURM requeue
only). This watchdog covers the gap for a multi-threaded actor-learner
process: when enabled (`CLEANBA_WATCHDOG=<seconds>` or `start_watchdog()`),
it dumps every thread's Python stack to stderr at the given interval so hangs
(queue deadlocks, stuck device calls, wedged env engines) are diagnosable
from logs alone.
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading

__all__ = [
    "start_watchdog",
    "maybe_start_watchdog_from_env",
    "ProgressGuard",
    "progress_guard_from_env",
    "heartbeat_guard",
]

_started = False


def start_watchdog(interval_s: float, file=None) -> None:
    """Dump all thread stacks every `interval_s` seconds (repeating)."""
    global _started
    if _started:
        return
    _started = True
    faulthandler.dump_traceback_later(interval_s, repeat=True, file=file or sys.stderr)


def maybe_start_watchdog_from_env() -> None:
    val = os.environ.get("CLEANBA_WATCHDOG", "")
    if val:
        try:
            start_watchdog(float(val))
        except ValueError:
            pass


class ProgressGuard:
    """Abort the process (stack dumps + nonzero exit) if `beat()` is not
    called within `timeout_s` — fail-fast for wedged device backends.

    On a remote/tunneled chip a device fetch can stall indefinitely when the
    transport degrades; under an orchestrator with retries+resume
    (`cleanba_tpu.benchmark --retries`, checkpointed runs) dying promptly and
    being relaunched loses minutes, not a whole job timeout. Enable in the
    trainers with CLEANBA_PROGRESS_TIMEOUT=<seconds>; beats happen at every
    log/checkpoint sync. A no-op when timeout_s <= 0.
    """

    def __init__(self, timeout_s: float):
        self.timeout_s = float(timeout_s)

    def beat(self) -> None:
        if self.timeout_s > 0:
            faulthandler.dump_traceback_later(self.timeout_s, exit=True)

    def close(self) -> None:
        if self.timeout_s > 0:
            faulthandler.cancel_dump_traceback_later()


def progress_guard_from_env() -> ProgressGuard:
    try:
        timeout = float(os.environ.get("CLEANBA_PROGRESS_TIMEOUT", "0"))
    except ValueError:
        timeout = 0.0
    return ProgressGuard(timeout)


def heartbeat_guard(timeout_s: float):
    """Context manager: abort the process with stack dumps if the block runs
    longer than `timeout_s` (used around collective/bring-up phases)."""

    class _Guard:
        def __enter__(self):
            faulthandler.dump_traceback_later(timeout_s, exit=True)
            return self

        def __exit__(self, *exc):
            faulthandler.cancel_dump_traceback_later()
            return False

    return _Guard()
