"""Parameter delivery strategies for actor threads.

Two protocols from the reference:
- **Handshake** (default): maxsize-1 params queue with the one-version-behind
  `update != 2` pipelining trick (cleanba_ppo.py:287-305).
- **ASAP** (fully async): no handshake — actors self-serve the latest params
  from a shared latest-only store the learner refreshes after every update
  (legacy_scripts/..._actor_threads_asap.py:600-647, `agent_state_store` as a
  collections.deque(maxlen=1)).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import jax

__all__ = ["QueueParamSource", "ParamStore", "StoreParamSource"]


class QueueParamSource:
    """The default maxsize-1 handshake (see module docstring)."""

    def __init__(self, params_queue: queue.Queue, concurrency: bool):
        self.params_queue = params_queue
        self.concurrency = concurrency

    def get(self, update: int):
        """Returns fresh params or None (skip-fetch at update==2 when
        pipelined). Blocks the learner's pace otherwise."""
        if self.concurrency and update == 2:
            return None
        params = self.params_queue.get()
        # Block so our pending device program doesn't serialize the other
        # actor threads' jit dispatch (reference NOTE + excalidraw diagram).
        jax.block_until_ready(jax.tree.leaves(params)[0])
        return params


class ParamStore:
    """Latest-only published params + a finished flag (ASAP mode)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._params = {}     # actor device -> params
        self._version = 0
        self.finished = threading.Event()
        self.global_step = 0  # shared step counter (reference global_step_store)

    def publish(self, params_by_device: dict, version: int) -> None:
        with self._lock:
            self._params = params_by_device
            self._version = version

    def latest(self, device) -> tuple:
        with self._lock:
            return self._params.get(device), self._version


class StoreParamSource:
    """ASAP: non-blocking read of the latest published params."""

    def __init__(self, store: ParamStore, device):
        self.store = store
        self.device = device
        self._seen_version = -1

    def get(self, update: int):
        params, version = self.store.latest(self.device)
        while params is None:  # only before the first publish
            time.sleep(0.001)
            params, version = self.store.latest(self.device)
        if version == self._seen_version:
            return None
        self._seen_version = version
        return params
