"""ctypes bindings for the native frame-preprocessing pipeline.

Compiles frame_pipeline.cpp on first use (g++ -O3 -shared) and caches the
shared object next to the source; falls back to a numpy implementation
when no compiler is available, so nothing else in the framework depends
on the toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "frame_pipeline.cpp")
_SO = os.path.join(_DIR, "libframe_pipeline.so")
_HASH = _SO + ".srchash"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        # staleness gate on source-content hash, not mtimes: the binary is
        # never committed, and fresh checkouts get arbitrary mtimes
        want = _src_hash()
        have = None
        if os.path.exists(_SO) and os.path.exists(_HASH):
            try:
                with open(_HASH) as f:
                    have = f.read().strip()
            except OSError:
                have = None
        if have != want:
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC, "-lpthread"],
                    check=True, capture_output=True, timeout=120,
                )
                with open(_HASH, "w") as f:
                    f.write(want)
            except Exception:
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.fp_create.restype = ctypes.c_void_p
        lib.fp_create.argtypes = [ctypes.c_int] * 4 + [ctypes.c_void_p] * 4 + [ctypes.c_int]
        lib.fp_destroy.argtypes = [ctypes.c_void_p]
        lib.fp_process.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.fp_prefetcher_create.restype = ctypes.c_void_p
        lib.fp_prefetcher_create.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fp_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        lib.fp_submit.restype = ctypes.c_int
        lib.fp_submit.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.fp_poll.restype = ctypes.c_int
        lib.fp_poll.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class FramePipeline:
    """Fused gamma + vignette + remap, native when possible."""

    def __init__(self, remap_x: np.ndarray, remap_y: np.ndarray,
                 gamma_lut: np.ndarray, vignette_inv: np.ndarray | None,
                 in_hw: tuple, n_threads: int = 4, n_slots: int = 4):
        self.h_in, self.w_in = in_hw
        self.h_out, self.w_out = remap_x.shape
        self.remap_x = np.ascontiguousarray(remap_x, np.float32)
        self.remap_y = np.ascontiguousarray(remap_y, np.float32)
        self.gamma = np.ascontiguousarray(gamma_lut[:256], np.float32)
        self.vig = (np.ascontiguousarray(vignette_inv, np.float32)
                    if vignette_inv is not None else None)
        self._lib = _load()
        self._handle = None
        self._prefetcher = None
        if self._lib is not None:
            vig_ptr = self.vig.ctypes.data_as(ctypes.c_void_p) if self.vig is not None else None
            self._handle = self._lib.fp_create(
                self.w_in, self.h_in, self.w_out, self.h_out,
                self.remap_x.ctypes.data_as(ctypes.c_void_p),
                self.remap_y.ctypes.data_as(ctypes.c_void_p),
                self.gamma.ctypes.data_as(ctypes.c_void_p),
                vig_ptr, n_threads,
            )
            self._prefetcher = self._lib.fp_prefetcher_create(self._handle, n_slots)

    def __del__(self):
        if getattr(self, "_lib", None) is not None:
            if self._prefetcher:
                self._lib.fp_prefetcher_destroy(self._prefetcher)
            if self._handle:
                self._lib.fp_destroy(self._handle)

    # -- synchronous --------------------------------------------------------
    def process(self, raw_u8: np.ndarray) -> np.ndarray:
        raw = np.ascontiguousarray(raw_u8, np.uint8)
        if self._handle:
            out = np.empty((self.h_out, self.w_out), np.float32)
            self._lib.fp_process(
                self._handle,
                raw.ctypes.data_as(ctypes.c_void_p),
                out.ctypes.data_as(ctypes.c_void_p),
            )
            return out
        return self._process_numpy(raw)

    def _process_numpy(self, raw: np.ndarray) -> np.ndarray:
        corrected = self.gamma[raw]
        if self.vig is not None:
            corrected = corrected * self.vig
        x0 = np.clip(self.remap_x.astype(int), 0, self.w_in - 1)
        y0 = np.clip(self.remap_y.astype(int), 0, self.h_in - 1)
        x1 = np.minimum(x0 + 1, self.w_in - 1)
        y1 = np.minimum(y0 + 1, self.h_in - 1)
        dx = np.clip(self.remap_x - x0, 0, 1)
        dy = np.clip(self.remap_y - y0, 0, 1)
        out = (corrected[y0, x0] * (1 - dx) * (1 - dy)
               + corrected[y0, x1] * dx * (1 - dy)
               + corrected[y1, x0] * (1 - dx) * dy
               + corrected[y1, x1] * dx * dy).astype(np.float32)
        out[(self.remap_x < 0) | (self.remap_y < 0)] = 0
        return out

    # -- async prefetch ------------------------------------------------------
    def submit(self, raw_u8: np.ndarray) -> int:
        """Queue a frame; returns a slot id (-1 = queue full, process sync)."""
        if not self._prefetcher:
            return -1
        raw = np.ascontiguousarray(raw_u8, np.uint8)
        return self._lib.fp_submit(self._prefetcher,
                                   raw.ctypes.data_as(ctypes.c_void_p))

    def poll(self, slot: int):
        """Returns the processed frame or None when still running."""
        if not self._prefetcher:
            return None
        out = np.empty((self.h_out, self.w_out), np.float32)
        if self._lib.fp_poll(self._prefetcher, slot,
                             out.ctypes.data_as(ctypes.c_void_p)):
            return out
        return None
