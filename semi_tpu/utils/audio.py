"""Waveform batch utilities (reference: utility.py:154-204, 451-462).

``pad_sequence`` / ``get_mask`` / ``collate`` mirror the reference's
batch plumbing; ``tailor_db_fs`` and ``median_filter`` are the small
analysis helpers from the same module.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pad_sequence", "get_mask", "collate", "tailor_db_fs",
           "median_filter"]


def pad_sequence(arrays: list[np.ndarray], pad_value: float = 0.0) -> np.ndarray:
    """Right-pad a list of ``[..., T_i]`` arrays to the max length and stack."""
    max_len = max(a.shape[-1] for a in arrays)
    out = []
    for a in arrays:
        pad = [(0, 0)] * (a.ndim - 1) + [(0, max_len - a.shape[-1])]
        out.append(np.pad(a, pad, constant_values=pad_value))
    return np.stack(out, axis=0)


def get_mask(batch_shape: tuple, length: np.ndarray) -> np.ndarray:
    """[B, ..., T] validity mask from per-item lengths."""
    total = batch_shape[-1]
    mask = (np.arange(total)[None, :] < np.asarray(length)[:, None])
    extra = len(batch_shape) - 2
    return mask.reshape((batch_shape[0],) + (1,) * extra + (total,)).astype(
        np.float32)


def collate(items: list[dict]) -> dict:
    """Batch a list of dataset items (reference collate_fn, utility.py:154-163)."""
    mix = pad_sequence([it["mix"][0] for it in items])
    source = pad_sequence([it["source"][0] for it in items])
    noise = pad_sequence([it["noise"][0] for it in items])
    length = np.concatenate([np.asarray(it["length"]) for it in items])
    return {"mix": mix, "source": source, "noise": noise, "length": length,
            "flag": items[0]["flag"]}


def tailor_db_fs(y: np.ndarray, target_db_fs: float = -25.0, eps: float = 1e-6):
    """Scale to a target dBFS RMS; returns (scaled, rms, scalar)."""
    rms = np.sqrt(np.mean(y ** 2))
    scalar = 10 ** (target_db_fs / 20) / (rms + eps)
    return y * scalar, rms, scalar


def median_filter(x: np.ndarray, kernel_size: int = 3) -> np.ndarray:
    from scipy.ndimage import median_filter as _mf

    return _mf(x, size=kernel_size, mode="nearest")
