"""Chunking of waveforms into 50%-overlapping segments and overlap-add.

Reproduces the reference runtime's chunk protocol (reference:
utility.py:312-403): a ``[B, C, L]`` waveform is padded with ``P = K//2``
zeros front/back plus a tail gap so the body divides evenly into chunks
of ``K`` samples, then two phase-shifted views (offset 0 and offset P)
are interleaved, producing ``2N`` chunks per item with an effective hop
of ``P``. ``over_add`` averages the two phase streams back together.

Chunk ordering matters for streaming state: chunks are emitted in
time order (phase-0 then phase-1 of the same window), so a model
consuming them serially advances its state by P samples per step.

All shapes are static in L, so these trace into a single fused XLA
program; no per-chunk Python looping anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["segment_gap", "pad_for_segmentation", "segmentation", "over_add"]


def segment_gap(length: int, chunk: int) -> int:
    """Tail padding so ``P + L + gap`` is a multiple of ``K``.

    Matches the reference formula (utility.py:329): gap is in ``[1, K]``
    (a full extra chunk is padded when the remainder is already zero).
    """
    p = chunk // 2
    return chunk - (p + length % chunk) % chunk


def pad_for_segmentation(x: jax.Array, chunk: int) -> tuple[jax.Array, int]:
    """Pad ``[B, C, L]`` to ``[B, C, P + L + gap + P]``; returns (padded, gap)."""
    length = x.shape[-1]
    p = chunk // 2
    gap = segment_gap(length, chunk)
    pads = [(0, 0)] * (x.ndim - 1) + [(p, gap + p)]
    return jnp.pad(x, pads), gap


def segmentation(x: jax.Array, chunk: int) -> tuple[jax.Array, int]:
    """Split ``[B, C, L]`` into interleaved 50%-overlap chunks.

    Returns:
        (chunks ``[B * 2N, C, K]``, gap). Row order is
        ``(b * N + n) * 2 + phase`` — time-ordered per batch item.
    """
    b, c, _ = x.shape
    p = chunk // 2
    xp, gap = pad_for_segmentation(x, chunk)
    body = xp.shape[-1] - p  # = P + L + gap, multiple of K
    n = body // chunk
    x1 = xp[..., :-p].reshape(b, c, n, chunk)
    x2 = xp[..., p:].reshape(b, c, n, chunk)
    out = jnp.stack([x1, x2], axis=3)  # [B, C, N, 2, K]
    out = out.transpose(0, 2, 3, 1, 4).reshape(b * n * 2, c, chunk)
    return out, gap


def over_add(x: jax.Array, gap: int) -> jax.Array:
    """Merge interleaved phase chunks ``[B, 2N, K]`` back to ``[B, L]``.

    Averages the two 50%-overlapping phase streams and trims the pad
    (reference: utility.py:373-403).
    """
    b, n2, chunk = x.shape
    p = chunk // 2
    x = x.reshape(b, n2 // 2, 2 * chunk)
    x1 = x[:, :, :chunk].reshape(b, -1)[:, p:]
    x2 = x[:, :, chunk:].reshape(b, -1)[:, :-p]
    out = (x1 + x2) * 0.5
    if gap > 0:
        out = out[:, :-gap]
    return out
