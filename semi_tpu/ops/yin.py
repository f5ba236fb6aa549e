"""YIN fundamental-frequency estimation (reference: utility.py:920-1011).

Numpy implementation (an offline analysis tool in the reference,
unused by the active training path; kept for inventory parity).
Operates on pre-framed audio ``[frame_length, n_frames]``.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-8

__all__ = ["yin"]


def yin(y_frames: np.ndarray, fmin: float, fmax: float, sr: int = 16000,
        frame_length: int = 3200, win_length: int = 400,
        trough_threshold: float = 0.1) -> np.ndarray:
    """Per-frame f0 via the cumulative mean normalized difference."""
    if win_length is None:
        win_length = frame_length // 2

    min_period = max(int(np.floor(sr / fmax)), 1)
    max_period = min(int(np.ceil(sr / fmin)), frame_length - win_length - 1)

    # difference function via autocorrelation
    a = np.fft.rfft(y_frames, frame_length, axis=0)
    b = np.fft.rfft(y_frames[win_length::-1, :], frame_length, axis=0)
    acf = np.fft.irfft(a * b, frame_length, axis=0)[win_length:]
    acf[np.abs(acf) < 1e-6] = 0

    energy = np.cumsum(y_frames ** 2, axis=0)
    energy = energy[win_length:, :] - energy[:-win_length, :]
    energy[np.abs(energy) < 1e-6] = 0

    diff = energy[0, :] + energy - 2 * acf

    # cumulative mean normalized difference
    tau = np.arange(1, max_period + 1)[:, None]
    cum_mean = np.cumsum(diff[1: max_period + 1, :], axis=0) / tau
    cmnd = diff[min_period: max_period + 1, :] / \
        (cum_mean[min_period - 1: max_period, :] + EPS)

    # parabolic interpolation around minima
    shifts = np.zeros_like(cmnd)
    pa = (cmnd[:-2, :] + cmnd[2:, :] - 2 * cmnd[1:-1, :]) / 2
    pb = (cmnd[2:, :] - cmnd[:-2, :]) / 2
    shifts[1:-1, :] = -pb / (2 * pa + EPS)
    shifts[np.abs(shifts) > 1] = 0

    # local minima below threshold; else global minimum
    padded = np.pad(cmnd, ((1, 1), (0, 0)), mode="edge")
    is_trough = (cmnd < padded[:-2]) & (cmnd <= padded[2:])
    is_trough[0, :] = cmnd[0, :] < cmnd[1, :]
    below = is_trough & (cmnd < trough_threshold)
    global_min = np.argmin(cmnd, axis=0)
    period = np.argmax(below, axis=0)
    none_below = np.all(~below, axis=0)
    period[none_below] = global_min[none_below]

    period = (min_period + period +
              shifts[period, range(cmnd.shape[1])])
    return sr / period
