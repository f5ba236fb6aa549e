"""Tests for the cIRM codec and complex mask application (utility.py:406-448)."""

import numpy as np

import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.core

from semi_tpu.ops.mask import (
    apply_mask,
    build_complex_ideal_ratio_mask,
    complex_mul,
    compress_cirm,
    decompress_cirm,
)


def test_compress_decompress_inverse():
    rng = np.random.default_rng(0)
    m = rng.uniform(-50, 50, size=(4, 16)).astype(np.float32)
    comp = compress_cirm(jnp.asarray(m))
    assert float(jnp.max(jnp.abs(comp))) < 10.0
    dec = decompress_cirm(comp)
    small = np.abs(m) < 30  # clamp at ±9.9 saturates very large masks
    np.testing.assert_allclose(np.asarray(dec)[small], m[small], rtol=2e-3, atol=2e-3)


def test_compress_matches_reference_formula():
    m = np.linspace(-120, 60, 64).astype(np.float32)
    ours = np.asarray(compress_cirm(jnp.asarray(m)))
    mm = np.where(m <= -100, -100.0, m)
    ref = 10.0 * (1 - np.exp(-0.1 * mm)) / (1 + np.exp(-0.1 * mm))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_ideal_mask_reconstructs_clean():
    """decompress(build(noisy, clean)) * noisy == clean where mask is unclipped."""
    rng = np.random.default_rng(1)
    noisy = rng.standard_normal((2, 2, 8, 5)).astype(np.float32)
    clean = noisy + 0.1 * rng.standard_normal((2, 2, 8, 5)).astype(np.float32)
    cmask = build_complex_ideal_ratio_mask(jnp.asarray(noisy), jnp.asarray(clean))
    mask = decompress_cirm(cmask)
    er, ei = complex_mul(
        mask[:, 0], mask[:, 1], jnp.asarray(noisy[:, 0]), jnp.asarray(noisy[:, 1])
    )
    np.testing.assert_allclose(np.asarray(er), clean[:, 0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ei), clean[:, 1], rtol=1e-3, atol=1e-3)


def test_apply_mask_layout():
    rng = np.random.default_rng(2)
    spec = jnp.asarray(rng.standard_normal((3, 8, 5, 2)).astype(np.float32))
    mask = jnp.asarray(rng.standard_normal((3, 8, 5, 2)).astype(np.float32))
    out = apply_mask(spec, mask)
    zr = spec[..., 0] * mask[..., 0] - spec[..., 1] * mask[..., 1]
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(zr), atol=1e-6)
