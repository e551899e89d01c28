"""ctypes bindings for the native (C++) motion data plane.

See ``native/motionio.cc``: .npy decode + random crop/pad + feat_bias
z-normalization in GIL-free C++ threads, writing directly into the numpy
batch buffer handed to ``jax.device_put``. Auto-builds the shared library
with the baked-in g++ on first use; callers should fall back to the
pure-Python path (:mod:`dataset`/:mod:`loader`) when
:func:`native_available` is False.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmotionio.so")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> bool:
    """Run ``make`` under an inter-process file lock: concurrent processes
    (subprocess-spawning CLI tests, bench runs) would otherwise race on
    rebuilding the .so after a source change, and one could dlopen a
    partially written library."""
    global _build_error
    lock_path = os.path.join(_NATIVE_DIR, ".build.lock")
    try:
        import fcntl

        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, text=True)
                return True
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    except (subprocess.CalledProcessError, FileNotFoundError, OSError,
            ImportError) as e:  # ImportError: no fcntl (non-POSIX)
        _build_error = getattr(e, "stderr", str(e)) or str(e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    # always invoke make: it is a no-op when the .so is fresh and rebuilds
    # it when motionio.cc changed (a stale binary would silently diverge)
    built = _build()
    if not built and not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.motionio_create.restype = ctypes.c_void_p
    lib.motionio_destroy.argtypes = [ctypes.c_void_p]
    lib.motionio_add_file.restype = ctypes.c_int64
    lib.motionio_add_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.motionio_add_array.restype = ctypes.c_int64
    lib.motionio_add_array.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64]
    lib.motionio_num_items.restype = ctypes.c_int64
    lib.motionio_num_items.argtypes = [ctypes.c_void_p]
    lib.motionio_item_rows.restype = ctypes.c_int64
    lib.motionio_item_rows.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.motionio_assemble_batch.restype = ctypes.c_int
    lib.motionio_assemble_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    return _build_error


class NativeMotionStore:
    """In-memory motion store with C++ batch assembly."""

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native motionio unavailable: {_build_error}")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.motionio_create())

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.motionio_destroy(self._h)
            self._h = None

    # ------------------------------------------------------------------
    def add_file(self, path: str) -> int:
        idx = self._lib.motionio_add_file(self._h, path.encode("utf-8"))
        if idx < 0:
            raise IOError(f"failed to load npy: {path}")
        return int(idx)

    def add_array(self, motion: np.ndarray) -> int:
        motion = np.ascontiguousarray(motion, dtype=np.float32)
        assert motion.ndim == 2
        idx = self._lib.motionio_add_array(
            self._h, motion.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            motion.shape[0], motion.shape[1])
        return int(idx)

    def __len__(self) -> int:
        return int(self._lib.motionio_num_items(self._h))

    def item_length(self, idx: int) -> int:
        return int(self._lib.motionio_item_rows(self._h, idx))

    # ------------------------------------------------------------------
    def assemble_batch(self, indices: Sequence[int], max_len: int,
                       mean: np.ndarray, std: np.ndarray, seed: int = 0,
                       num_threads: int = 4
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """(motions [B, max_len, D] normalized f32, lengths [B] i32)."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        mean = np.ascontiguousarray(mean, dtype=np.float32)
        std = np.ascontiguousarray(std, dtype=np.float32)
        B = len(idx)
        D = mean.shape[0]
        out = np.empty((B, max_len, D), np.float32)
        lengths = np.empty((B,), np.int32)
        rc = self._lib.motionio_assemble_batch(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            B, max_len, D,
            mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_uint64(seed),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num_threads)
        if rc == -2:
            raise ValueError(
                f"assemble_batch: an item's feature dim differs from the "
                f"normalizer's ({D}) — mixed-dim store or wrong mean/std")
        if rc != 0:
            raise ValueError("assemble_batch failed (bad index?)")
        return out, lengths
