"""ctypes binding of the native C++ replay store (native/fastbuffer.cpp).

Drop-in accelerator for the dataset hot path: O(1) vectorized ring append,
Welford mean/std, weighted sampling and contiguous gather — the role the
vendored native infra (torch dataloaders) plays in the reference. Builds on
first use with `make -C native` (g++ in the image); callers can fall back to
learning.database.Database when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastbuffer.so")
_lib = None


def _ensure_built() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    c_i64, c_dp, c_ip = ctypes.c_int64, ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64)
    lib.fb_create.restype = ctypes.c_void_p
    lib.fb_create.argtypes = [c_i64] * 4
    lib.fb_destroy.argtypes = [ctypes.c_void_p]
    lib.fb_len.restype = c_i64
    lib.fb_len.argtypes = [ctypes.c_void_p]
    lib.fb_append.argtypes = [ctypes.c_void_p, c_i64, c_dp, c_dp, c_dp, c_ip, c_dp]
    lib.fb_mean_std.argtypes = [ctypes.c_void_p, c_dp, c_dp]
    lib.fb_gather.argtypes = [ctypes.c_void_p, c_ip, c_i64, c_dp, c_dp, c_dp, c_dp]
    lib.fb_sample_indices.argtypes = [ctypes.c_void_p, c_i64, c_dp, ctypes.c_uint64, c_ip]
    lib.fb_save.restype = c_i64
    lib.fb_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fb_load.restype = ctypes.c_void_p
    lib.fb_load.argtypes = [ctypes.c_char_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _ensure_built()
        return True
    except Exception:
        return False


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


class FastDatabase:
    """Native-backed replay store with the Database sampling surface."""

    def __init__(self, limit: int, state_dim: int = 44, action_dim: int = 12,
                 goal_dim: int = 3, _handle=None):
        self._lib = _ensure_built()
        self.state_dim, self.action_dim, self.goal_dim = state_dim, action_dim, goal_dim
        self.limit = int(limit)
        self._h = _handle if _handle is not None else self._lib.fb_create(
            self.limit, state_dim, action_dim, goal_dim
        )

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.fb_destroy(self._h)
        except Exception:
            pass

    def __len__(self):
        return int(self._lib.fb_len(self._h))

    def append(self, states, actions, goals=None, traj_ids=None, times=None):
        states = np.ascontiguousarray(np.atleast_2d(states), dtype=np.float64)
        actions = np.ascontiguousarray(np.atleast_2d(actions), dtype=np.float64)
        n = len(states)
        g = (np.ascontiguousarray(np.atleast_2d(goals), dtype=np.float64)
             if goals is not None else None)
        ids = (np.ascontiguousarray(traj_ids, dtype=np.int64)
               if traj_ids is not None else None)
        ts = (np.ascontiguousarray(times, dtype=np.float64)
              if times is not None else None)
        self._lib.fb_append(
            self._h, n, _dptr(states), _dptr(actions),
            _dptr(g) if g is not None else None,
            _iptr(ids) if ids is not None else None,
            _dptr(ts) if ts is not None else None,
        )

    def mean_std(self):
        mean = np.zeros(self.state_dim)
        std = np.zeros(self.state_dim)
        self._lib.fb_mean_std(self._h, _dptr(mean), _dptr(std))
        return mean, std

    def sample(self, n: int, weights: Optional[np.ndarray] = None, seed: int = 0):
        """Weighted sample of n rows -> (states, actions, goals)."""
        idx = np.zeros(n, dtype=np.int64)
        w = (np.ascontiguousarray(weights, dtype=np.float64)
             if weights is not None else None)
        self._lib.fb_sample_indices(
            self._h, n, _dptr(w) if w is not None else None,
            ctypes.c_uint64(seed), _iptr(idx),
        )
        return self.gather(idx)

    def gather(self, idx: np.ndarray):
        idx = np.ascontiguousarray(idx, dtype=np.int64)
        n = len(idx)
        s = np.zeros((n, self.state_dim))
        a = np.zeros((n, self.action_dim))
        g = np.zeros((n, self.goal_dim))
        t = np.zeros(n)
        self._lib.fb_gather(self._h, _iptr(idx), n, _dptr(s), _dptr(a), _dptr(g), _dptr(t))
        return s, a, g

    def save(self, path: str) -> None:
        rc = self._lib.fb_save(self._h, path.encode())
        if rc != 0:
            raise IOError(f"fb_save failed for {path}")

    @classmethod
    def load(cls, path: str, state_dim=44, action_dim=12, goal_dim=3):
        lib = _ensure_built()
        h = lib.fb_load(path.encode())
        if not h:
            raise IOError(f"fb_load failed for {path}")
        out = cls(1, state_dim, action_dim, goal_dim, _handle=h)
        return out
