"""ctypes bindings for the native audio runtime (native/semi_audio.cc).

Provides GIL-free WAV decode + resample and a threaded prefetch pool
for the input pipeline. Builds the shared library on first use if the
toolchain is available; callers fall back to the scipy path
(semi_tpu/data/wav.py) when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "wav_read", "wav_write", "resample", "PrefetchPool"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsemi_audio.so"))
_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.sa_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int64)]
        lib.sa_wav_read.restype = ctypes.c_int64
        lib.sa_wav_read.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int)]
        lib.sa_wav_write.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64, ctypes.c_int]
        lib.sa_resample.argtypes = [ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64, ctypes.c_int, ctypes.c_int]
        lib.sa_pool_create.restype = ctypes.c_int64
        lib.sa_pool_submit.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_char_p, ctypes.c_int]
        lib.sa_pool_wait.restype = ctypes.c_int64
        lib.sa_pool_wait.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
        lib.sa_pool_destroy.argtypes = [ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def wav_read(path: str, sample_rate: int | None = None):
    """Read mono float32; resample to ``sample_rate`` if given.
    Returns (wav, native_sr)."""
    lib = _load()
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    frames = ctypes.c_int64(0)
    if lib.sa_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                       ctypes.byref(frames)) != 0:
        raise IOError(f"cannot read wav: {path}")
    buf = np.empty(frames.value, np.float32)
    n = lib.sa_wav_read(path.encode(),
                        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        frames.value, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"cannot read wav: {path}")
    wav = buf[:n]
    if sample_rate and sr.value != sample_rate:
        wav = resample(wav, sample_rate, sr.value)
    return wav, sr.value


def wav_write(path: str, wav: np.ndarray, sample_rate: int = 16000):
    lib = _load()
    wav = np.ascontiguousarray(wav, np.float32)
    if lib.sa_wav_write(path.encode(),
                        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        len(wav), sample_rate) != 0:
        raise IOError(f"cannot write wav: {path}")


def resample(wav: np.ndarray, up: int, down: int) -> np.ndarray:
    import math

    lib = _load()
    g = math.gcd(up, down)
    up, down = up // g, down // g
    wav = np.ascontiguousarray(wav, np.float32)
    out_len = -(-len(wav) * up // down)
    out = np.empty(out_len, np.float32)
    lib.sa_resample(wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    len(wav),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    out_len, up, down)
    return out


class PrefetchPool:
    """Async decode pool: submit paths, collect mono float32 at target sr."""

    def __init__(self, num_threads: int = 4, target_sr: int = 16000,
                 max_seconds: float = 120.0):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native audio library unavailable")
        self._pool = self._lib.sa_pool_create(num_threads)
        self._target_sr = target_sr
        self._max_len = int(max_seconds * target_sr)
        self._next_job = 0
        self._local = threading.Lock()

    def submit(self, path: str) -> int:
        with self._local:
            job = self._next_job
            self._next_job += 1
        rc = self._lib.sa_pool_submit(self._pool, job, path.encode(),
                                      self._target_sr)
        if rc != 0:
            raise RuntimeError("submit failed")
        return job

    def wait(self, job: int) -> np.ndarray:
        buf = np.empty(self._max_len, np.float32)
        n = self._lib.sa_pool_wait(
            self._pool, job,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self._max_len)
        if n < 0:
            raise IOError(f"decode job {job} failed ({n})")
        return buf[:n].copy()

    def close(self):
        if self._pool is not None:
            self._lib.sa_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
