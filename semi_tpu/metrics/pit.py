"""Permutation-invariant training utilities (reference: utility.py:226-308).

Multi-speaker support for ``spk_num > 1`` configs: pairwise SI-SNR over
all source/estimate pairs, max over permutations, and source reordering.
Unused at the reference's active ``spk_num=1`` but part of the API.
"""

from __future__ import annotations

from itertools import permutations

import numpy as np

import jax
import jax.numpy as jnp

EPS = 1e-8

__all__ = ["cal_si_snr_with_pit", "reorder_source", "pit_si_snr_loss"]


def _masked(x, mask):
    return x * mask


def cal_si_snr_with_pit(separated: jax.Array, source: jax.Array,
                        length: jax.Array):
    """Max-over-permutations SI-SNR.

    Args:
        separated, source: ``[B, N, T]``; length: ``[B]``.
    Returns:
        (max_snr ``[B, 1]``, perms ``[N!, N]``, max_snr_idx ``[B]``).
    """
    b, n, total = source.shape
    mask = (jnp.arange(total)[None, None, :] <
            length[:, None, None]).astype(source.dtype)
    separated = separated * mask
    num = length[:, None, None].astype(source.dtype)
    zm_t = (source - jnp.sum(source, -1, keepdims=True) / num) * mask
    zm_s = (separated - jnp.sum(separated, -1, keepdims=True) / num) * mask

    s_t = zm_t[:, None, :, :]   # [B, 1, N, T]
    s_s = zm_s[:, :, None, :]   # [B, N, 1, T]
    dot = jnp.sum(s_s * s_t, -1, keepdims=True)
    energy = jnp.sum(s_t ** 2, -1, keepdims=True) + EPS
    proj = dot * s_t / energy
    e = s_s - proj
    pair_snr = jnp.sum(proj ** 2, -1) / (jnp.sum(e ** 2, -1) + EPS)
    pair_snr = 10 * jnp.log10(pair_snr + EPS)  # [B, N, N]

    perms = jnp.asarray(list(permutations(range(n))), jnp.int32)  # [N!, N]
    one_hot = jax.nn.one_hot(perms, n)  # [N!, N, N]
    snr_set = jnp.einsum("bij,pij->bp", pair_snr, one_hot)
    max_idx = jnp.argmax(snr_set, axis=1)
    max_snr = jnp.max(snr_set, axis=1, keepdims=True) / n
    return max_snr, perms, max_idx


def reorder_source(source: jax.Array, perms: jax.Array,
                   max_snr_idx: jax.Array) -> jax.Array:
    """Reorder estimates by the best permutation (utility.py:278-296)."""
    best = perms[max_snr_idx]  # [B, N]
    return jnp.take_along_axis(source, best[:, :, None], axis=1)


def pit_si_snr_loss(separated, source, length):
    max_snr, perms, idx = cal_si_snr_with_pit(separated, source, length)
    return -jnp.mean(max_snr), perms, idx


def calc_sdr(estimation: jax.Array, origin: jax.Array, mask=None) -> jax.Array:
    """Batch scale-invariant SDR (utility.py:66-97). Inputs ``[B, T]``."""
    estimation = estimation - jnp.mean(estimation, 1, keepdims=True)
    origin = origin - jnp.mean(origin, 1, keepdims=True)
    if mask is not None:
        estimation = estimation * mask
        origin = origin * mask
    power = jnp.sum(origin ** 2, 1, keepdims=True) + EPS
    scale = jnp.sum(origin * estimation, 1, keepdims=True) / power
    true = scale * origin
    res = estimation - true
    return 10 * jnp.log10(jnp.sum(true ** 2, 1) + EPS) - \
        10 * jnp.log10(jnp.sum(res ** 2, 1) + EPS)


def batch_sdr(estimation: jax.Array, origin: jax.Array, mask=None,
              return_perm: bool = False):
    """Permutation-search SDR over sources (utility.py:100-145).

    estimation/origin: ``[B, S, T]``; returns best mean SDR ``[B]``
    (and the best permutation index when ``return_perm``).
    """
    b, s, _ = estimation.shape
    est = estimation - jnp.mean(estimation, 2, keepdims=True)
    ori = origin - jnp.mean(origin, 2, keepdims=True)
    pair = jnp.stack([
        jnp.stack([calc_sdr(est[:, i], ori[:, j], mask) for j in range(s)], 1)
        for i in range(s)], 1)  # [B, S, S]
    perms = sorted(set(permutations(range(s))))
    scores = jnp.stack([
        sum(pair[:, idx, p[idx]] for idx in range(s)) for p in perms], 1)
    best = jnp.max(scores, 1) / s
    if return_perm:
        return best, jnp.argmax(scores, 1)
    return best
