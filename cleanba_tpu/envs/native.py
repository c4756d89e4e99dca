"""ctypes binding to the C++ batched environment engine (csrc/).

Loads `csrc/build/libcleanba_envs.so`, building it with `make` on first use if
the toolchain is available. The binding is zero-copy on the Python side: numpy
output buffers are preallocated once and handed to C++ to fill.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

from cleanba_tpu.envs.api import BatchedEnv, EnvSpec, StepOutput

logger = logging.getLogger(__name__)

__all__ = ["NativeBatchedEnv", "load_library", "native_available"]

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC_DIR, "build", "libcleanba_envs.so")
_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class _CConfig(ctypes.Structure):
    _fields_ = [
        ("num_envs", ctypes.c_int32),
        ("batch_size", ctypes.c_int32),
        ("num_threads", ctypes.c_int32),
        ("seed", ctypes.c_int64),
        ("max_episode_steps", ctypes.c_int32),
        ("repeat_action_probability", ctypes.c_float),
        ("episodic_life", ctypes.c_int32),
        ("noop_max", ctypes.c_int32),
        ("full_action_space", ctypes.c_int32),
        ("reward_clip", ctypes.c_int32),
        ("frame_stack", ctypes.c_int32),
        ("frame_skip", ctypes.c_int32),
    ]


def _build_library() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _CSRC_DIR, "-j2"], check=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        err = getattr(e, "stderr", b"") or b""
        logger.warning("native env engine build failed: %s %s", e, err.decode(errors="replace")[-2000:])
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the engine library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_library():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cb_make.restype = ctypes.c_void_p
        lib.cb_make.argtypes = [ctypes.c_char_p, ctypes.POINTER(_CConfig)]
        lib.cb_close.argtypes = [ctypes.c_void_p]
        lib.cb_obs_ndim.restype = ctypes.c_int32
        lib.cb_obs_ndim.argtypes = [ctypes.c_void_p]
        lib.cb_obs_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        lib.cb_obs_dtype.restype = ctypes.c_int32
        lib.cb_obs_dtype.argtypes = [ctypes.c_void_p]
        lib.cb_num_actions.restype = ctypes.c_int32
        lib.cb_num_actions.argtypes = [ctypes.c_void_p]
        lib.cb_reset.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.cb_step.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
        lib.cb_async_reset.argtypes = [ctypes.c_void_p]
        lib.cb_send.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
        lib.cb_recv.restype = ctypes.c_int32
        lib.cb_recv.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeBatchedEnv(BatchedEnv):
    """EnvPool-style batched env backed by the C++ engine."""

    def __init__(
        self,
        env_id: str,
        num_envs: int,
        batch_size: int = 0,
        num_threads: int = 0,
        seed: int = 0,
        max_episode_steps: int = 27000,
        repeat_action_probability: float = 0.25,
        episodic_life: bool = False,
        noop_max: int = 1,
        full_action_space: bool = True,
        reward_clip: bool = True,
        frame_stack: int = 4,
        frame_skip: int = 4,
    ):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native env engine unavailable (build failed)")
        self._lib = lib
        cfg = _CConfig(
            num_envs=num_envs,
            batch_size=batch_size if batch_size > 0 else num_envs,
            num_threads=num_threads,
            seed=seed,
            max_episode_steps=max_episode_steps,
            repeat_action_probability=repeat_action_probability,
            episodic_life=int(episodic_life),
            noop_max=noop_max,
            full_action_space=int(full_action_space),
            reward_clip=int(reward_clip),
            frame_stack=frame_stack,
            frame_skip=frame_skip,
        )
        handle = lib.cb_make(env_id.encode(), ctypes.byref(cfg))
        if not handle:
            raise ValueError(f"unknown task for native engine: {env_id!r}")
        self._h = ctypes.c_void_p(handle)

        ndim = lib.cb_obs_ndim(self._h)
        shape_buf = (ctypes.c_int64 * ndim)()
        lib.cb_obs_shape(self._h, shape_buf)
        obs_shape = tuple(int(s) for s in shape_buf)
        obs_dtype = np.dtype(np.uint8) if lib.cb_obs_dtype(self._h) == 0 else np.dtype(np.float32)
        self.spec = EnvSpec(
            env_id=env_id,
            num_envs=num_envs,
            batch_size=batch_size if batch_size > 0 else num_envs,
            obs_shape=obs_shape,
            obs_dtype=obs_dtype,
            num_actions=int(lib.cb_num_actions(self._h)),
        )
        n, b = num_envs, self.spec.batch_size
        self._obs_n = np.zeros((n, *obs_shape), obs_dtype)
        self._rew_n = np.zeros(n, np.float32)
        self._raw_n = np.zeros(n, np.float32)
        self._term_n = np.zeros(n, np.uint8)
        self._trunc_n = np.zeros(n, np.uint8)
        self._elapsed_n = np.zeros(n, np.int32)
        self._obs_b = np.zeros((b, *obs_shape), obs_dtype)
        self._rew_b = np.zeros(b, np.float32)
        self._raw_b = np.zeros(b, np.float32)
        self._term_b = np.zeros(b, np.uint8)
        self._trunc_b = np.zeros(b, np.uint8)
        self._elapsed_b = np.zeros(b, np.int32)
        self._ids_b = np.zeros(b, np.int32)
        self._env_ids = np.arange(n, dtype=np.int32)

    # -- sync --
    def reset(self) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        self._lib.cb_reset(self._h, _ptr(self._obs_n))
        info = {"env_ids": self._env_ids, "elapsed_step": np.zeros(self.spec.num_envs, np.int32)}
        return self._obs_n.copy(), info

    def step(self, actions: np.ndarray) -> StepOutput:
        actions = np.ascontiguousarray(actions, np.int32)
        self._lib.cb_step(
            self._h, _ptr(actions), _ptr(self._obs_n), _ptr(self._rew_n), _ptr(self._raw_n),
            _ptr(self._term_n), _ptr(self._trunc_n), _ptr(self._elapsed_n),
        )
        info = {
            "env_ids": self._env_ids,
            "elapsed_step": self._elapsed_n.copy(),
            "reward": self._raw_n.copy(),
        }
        return (
            self._obs_n.copy(), self._rew_n.copy(),
            self._term_n.astype(bool), self._trunc_n.astype(bool), info,
        )

    # -- async --
    def async_reset(self) -> None:
        self._lib.cb_async_reset(self._h)

    def send(self, actions: np.ndarray, env_ids: np.ndarray) -> None:
        actions = np.ascontiguousarray(actions, np.int32)
        env_ids = np.ascontiguousarray(env_ids, np.int32)
        self._lib.cb_send(self._h, _ptr(env_ids), _ptr(actions), len(actions))

    def recv(self) -> StepOutput:
        self._lib.cb_recv(
            self._h, _ptr(self._ids_b), _ptr(self._obs_b), _ptr(self._rew_b), _ptr(self._raw_b),
            _ptr(self._term_b), _ptr(self._trunc_b), _ptr(self._elapsed_b),
        )
        info = {
            "env_ids": self._ids_b.copy(),
            "elapsed_step": self._elapsed_b.copy(),
            "reward": self._raw_b.copy(),
        }
        return (
            self._obs_b.copy(), self._rew_b.copy(),
            self._term_b.astype(bool), self._trunc_b.astype(bool), info,
        )

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.cb_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
