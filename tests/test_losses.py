"""Differentiable loss tests: SI-SNR numpy-oracle parity, STOI/PESQ
golden values from the reference docstrings, monotonicity, gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.metrics.losses import pesq_loss, si_snr, stoi_loss


def np_si_snr(sep, src, length, eps=1e-8):
    """Independent numpy derivation of masked SI-SNR (mean over batch)."""
    vals = []
    for i in range(sep.shape[0]):
        s = sep[i, : length[i]] - sep[i, : length[i]].mean()
        t = src[i, : length[i]] - src[i, : length[i]].mean()
        proj = (s @ t) * t / ((t @ t) + eps)
        vals.append(20 * np.log10(eps + np.linalg.norm(proj) /
                                  (np.linalg.norm(s - proj) + eps)))
    return np.mean(vals)


def test_si_snr_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((3, 4000)).astype(np.float32)
    sep = src + 0.3 * rng.standard_normal((3, 4000)).astype(np.float32)
    length = np.array([4000, 3200, 2500])
    # zero padding beyond length, as the data pipeline produces
    for i in range(3):
        src[i, length[i]:] = 0
        sep[i, length[i]:] = 0
    ours = float(si_snr(jnp.asarray(sep), jnp.asarray(src), jnp.asarray(length)))
    ref = np_si_snr(sep, src, length)
    assert abs(ours - ref) < 1e-3


def test_si_snr_monotonic_in_noise():
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    hi = float(si_snr(src + 0.01 * noise, src))
    lo = float(si_snr(src + 0.5 * noise, src))
    assert hi > lo > 0


def test_stoi_loss_reference_docstring_value():
    """-stoi_loss(sin, sin + 1e-3) ~ 0.7 (utility.py:840-843)."""
    a = jnp.sin(jnp.arange(16000, dtype=jnp.float32))[None]
    b = a + 0.001
    val = -float(stoi_loss(b, a, jnp.asarray([16000])))
    assert 0.55 < val < 0.85


def test_stoi_loss_clean_speechlike():
    """A modulated tone against itself scores ~1 and beats a noisy copy."""
    t = jnp.arange(32000, dtype=jnp.float32) / 16000.0
    x = jnp.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * jnp.sin(2 * np.pi * 3 * t))
    x = x[None]
    clean = -float(stoi_loss(x, x, jnp.asarray([32000])))
    rng = np.random.default_rng(2)
    noisy = x + 0.8 * jnp.asarray(rng.standard_normal((1, 32000)).astype(np.float32))
    deg = -float(stoi_loss(x, noisy, jnp.asarray([32000])))
    assert clean > 0.95
    assert deg < clean - 0.1


def test_stoi_loss_grad_finite():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32))
    y = x + 0.1 * jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32))

    g = jax.grad(lambda p: stoi_loss(x, p, jnp.asarray([16000])))(y)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_pesq_loss_ordering_and_grad():
    t = jnp.arange(32000, dtype=jnp.float32) / 16000.0
    x = (jnp.sin(2 * np.pi * 300 * t) * (0.5 + 0.5 * jnp.sin(2 * np.pi * 2 * t)))[None]
    rng = np.random.default_rng(4)
    noise = jnp.asarray(rng.standard_normal((1, 32000)).astype(np.float32))
    clean_score = -float(pesq_loss(x, x))
    mid_score = -float(pesq_loss(x, x + 0.05 * noise))
    bad_score = -float(pesq_loss(x, x + 0.5 * noise))
    assert clean_score > mid_score > bad_score
    assert clean_score <= 4.5 + 1e-5

    g = jax.grad(lambda p: pesq_loss(x, p))(x + 0.05 * noise)
    assert np.all(np.isfinite(np.asarray(g)))


def test_kldiv_loss():
    from semi_tpu.metrics.losses import kldiv_loss

    logits = jnp.log(jnp.asarray([[[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]]))
    targets = jnp.asarray([[0, 1]])
    # near-perfect predictions -> small loss; pad positions masked
    small = float(kldiv_loss(logits, targets, pad_idx=2))
    assert 0 < small < 1.0
    masked = float(kldiv_loss(logits, jnp.asarray([[0, 0]]), pad_idx=0))
    assert masked == 0.0
