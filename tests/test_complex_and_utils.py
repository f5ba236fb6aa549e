"""Complex layer variants, PIT, yin, audio utils tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.layers.complex import (
    ComplexGlobalLayerNorm, ComplexSequenceModel, ComplexTemporalConv2d,
    ComplexTemporalConvTranspose2d)
from semi_tpu.metrics.pit import cal_si_snr_with_pit, reorder_source
from semi_tpu.ops.yin import yin
from semi_tpu.utils.audio import get_mask, pad_sequence, tailor_db_fs


def test_complex_gln_whitens():
    norm = ComplexGlobalLayerNorm(4, time=False)
    params = norm.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # partially-correlated real/imag input (non-singular covariance)
    r = rng.standard_normal((2, 4, 8, 10)).astype(np.float32)
    i = 0.4 * r + rng.standard_normal((2, 4, 8, 10)).astype(np.float32)
    x = jnp.asarray(np.stack([r * 2 + 1, i - 1], axis=-1))
    y, _ = norm.apply(params, {}, x)
    y = np.asarray(y)
    # whitened: near zero mean, decorrelated re/im
    assert abs(y.mean()) < 0.05
    cov = np.mean(y[..., 0] * y[..., 1])
    assert abs(cov) < 0.1


def test_complex_gln_time_merge():
    norm = ComplexGlobalLayerNorm(4, time=True)
    params = norm.init(jax.random.PRNGKey(0))
    st = norm.init_state(1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 3, 12, 2))
    _, st = norm.apply(params, st, x[:, :, :, :6])
    _, st = norm.apply(params, st, x[:, :, :, 6:])
    mean_direct = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    np.testing.assert_allclose(np.asarray(st["mean"]),
                               np.asarray(mean_direct), atol=1e-5)


def test_complex_sequence_model():
    m = ComplexSequenceModel(12, 12, 8, 1)
    params = m.init(jax.random.PRNGKey(0))
    st = m.init_state(2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 6, 2))
    y, st2 = m.apply(params, st, x)
    assert y.shape == (2, 12, 6, 2)
    assert np.all(np.isfinite(np.asarray(y)))


def test_complex_conv_streaming():
    m = ComplexTemporalConv2d(3, 4, (5, 3), (2, 1), (1, 2), (2, 4))
    params = m.init(jax.random.PRNGKey(0))
    st = m.init_state(1, num_freqs=21)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 21, 7, 2))
    y, st2 = m.apply(params, st, x)
    assert y.shape == (1, 4, 11, 7, 2)
    assert st2["real"].shape == (1, 3, 21, 4)


def test_complex_crn_end_to_end():
    from semi_tpu.models.complex_crn import ComplexTemporalCRN

    m = ComplexTemporalCRN(num_channels=[4, 8], num_freqs=201, hidden=16,
                           segment_length=3200, num_layers=1, num_inputs=3,
                           kernel_size=3)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3200)) * 0.1
    y, _ = m.realtime_process(params, None, x, flag=False)
    assert y.shape == (1, 3200)
    assert np.all(np.isfinite(np.asarray(y)))


def test_pit_finds_permutation():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((1, 2, 4000)).astype(np.float32))
    sep = src[:, ::-1, :]  # swapped estimates
    length = jnp.asarray([4000])
    max_snr, perms, idx = cal_si_snr_with_pit(sep, src, length)
    assert float(max_snr[0, 0]) > 50  # perfect after permutation
    fixed = reorder_source(sep, perms, idx)
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(src), atol=1e-6)


def test_yin_tracks_pitch():
    sr, f0 = 16000, 220.0
    t = np.arange(6400) / sr
    sig = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    frames = sig.reshape(2, 3200).T  # [frame_length, n_frames]
    est = yin(frames, fmin=80, fmax=500, sr=sr, frame_length=3200,
              win_length=400)
    np.testing.assert_allclose(est, f0, rtol=0.02)


def test_audio_utils():
    a = [np.ones((2, 5)), np.ones((2, 8))]
    padded = pad_sequence(a)
    assert padded.shape == (2, 2, 8)
    assert padded[0, 0, 6] == 0

    mask = get_mask((2, 1, 8), np.array([5, 8]))
    assert mask.shape == (2, 1, 8)
    assert mask[0, 0, 5] == 0 and mask[1, 0, 7] == 1

    y, rms, scalar = tailor_db_fs(np.ones(100) * 0.5)
    target_rms = 10 ** (-25 / 20)
    assert abs(np.sqrt(np.mean(y ** 2)) - target_rms) < 1e-3


def test_batch_sdr_permutation():
    from semi_tpu.metrics.pit import batch_sdr

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((2, 2, 4000)).astype(np.float32))
    est = src[:, ::-1, :]
    sdr, perm = batch_sdr(est, src, return_perm=True)
    assert float(jnp.min(sdr)) > 30
    assert np.all(np.asarray(perm) == 1)  # the swapped permutation wins


def test_compute_snr():
    from semi_tpu.metrics.eval import compute_snr

    rng = np.random.default_rng(1)
    s = rng.standard_normal(4000).astype(np.float32)
    n = rng.standard_normal(4000).astype(np.float32)
    snr = compute_snr(s + 0.1 * n, s)
    assert 18 < snr < 22
