"""Compressed complex ideal ratio mask (cIRM) codec and complex mask apply.

Semantics follow the reference (utility.py:406-448): the cIRM is the
complex ratio clean/noisy per TF bin, compressed through a scaled tanh
``K * tanh(C/2 * m)`` written in its exp form, decompressed with a
±``limit`` clamp. Mask application is a complex multiply on the
real/imag-stacked layout.

All ops are elementwise → fused by XLA into neighboring kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8

__all__ = [
    "build_complex_ideal_ratio_mask",
    "compress_cirm",
    "decompress_cirm",
    "complex_mul",
    "apply_mask",
]


def compress_cirm(mask: jax.Array, k: float = 10.0, c: float = 0.1) -> jax.Array:
    """Compress an unbounded mask to ``(-K, K)`` (utility.py:426-436)."""
    mask = jnp.where(mask <= -100.0, -100.0, mask)
    e = jnp.exp(-c * mask)
    return k * (1.0 - e) / (1.0 + e)


def decompress_cirm(
    mask: jax.Array, k: float = 10.0, limit: float = 9.9
) -> jax.Array:
    """Invert :func:`compress_cirm` with a ±limit clamp (utility.py:439-442)."""
    mask = jnp.clip(mask, -limit, limit)
    return -k * jnp.log((k - mask) / (k + mask))


def build_complex_ideal_ratio_mask(
    noisy: jax.Array, clean: jax.Array, k: float = 10.0, c: float = 0.1
) -> jax.Array:
    """Compressed cIRM from noisy/clean spectra.

    Args:
        noisy, clean: ``[..., 2, F, T]`` real/imag on axis -3
        (layout per utility.py:406-423).
    Returns:
        compressed mask, same shape.
    """
    nr, ni = noisy[..., 0, :, :], noisy[..., 1, :, :]
    cr, ci = clean[..., 0, :, :], clean[..., 1, :, :]
    denom = nr * nr + ni * ni + EPS
    mr = (nr * cr + ni * ci) / denom
    mi = (nr * ci - ni * cr) / denom
    return compress_cirm(jnp.stack([mr, mi], axis=-3), k=k, c=c)


def complex_mul(
    ar: jax.Array, ai: jax.Array, br: jax.Array, bi: jax.Array
) -> tuple[jax.Array, jax.Array]:
    return ar * br - ai * bi, ar * bi + ai * br


def apply_mask(spec: jax.Array, mask: jax.Array) -> jax.Array:
    """Complex-multiply ``spec`` by ``mask``; both ``[..., 2]`` real/imag last."""
    r, i = complex_mul(mask[..., 0], mask[..., 1], spec[..., 0], spec[..., 1])
    return jnp.stack([r, i], axis=-1)
