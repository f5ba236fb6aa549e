"""Host-side WAV IO (scipy-based; no libsndfile/librosa dependency).

Replaces the reference's soundfile/librosa readers (data_c.py:129-133).
Resampling to the pipeline rate uses the same polyphase resampler as
the device code, executed eagerly on host arrays.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.io import wavfile

from semi_tpu.ops.resample import resample_poly

__all__ = ["read_wav", "write_wav"]


def read_wav(path: str, sample_rate: int = 16000) -> tuple[np.ndarray, int]:
    """Read a wav file as float32 mono at ``sample_rate``; returns (wav, len)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data[:, 0]
    if sr != sample_rate:
        g = math.gcd(sample_rate, sr)
        data = np.asarray(resample_poly(data, sample_rate // g, sr // g))
    return data, len(data)


def write_wav(path: str, wav: np.ndarray, sample_rate: int = 16000) -> None:
    wav = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    wavfile.write(path, sample_rate, (wav * 32767.0).astype(np.int16))
