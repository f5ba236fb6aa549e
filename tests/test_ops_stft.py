"""Golden-value tests for STFT/iSTFT against torch.stft/istft.

The reference uses speechbrain's STFT/ISTFT (CRN_ELU.py:9, 329-333),
which wraps torch.stft/istft with a periodic Hamming window,
center=True, pad_mode='constant', onesided=True. We test our jnp
implementation directly against torch with that parameterization.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from semi_tpu.ops import stft as jstft_mod
from semi_tpu.ops.stft import StftConfig, hamming_window, istft, stft

pytestmark = pytest.mark.core

N_FFT, HOP, WIN = 400, 160, 400


def torch_stft(x: np.ndarray) -> np.ndarray:
    """[B, L] -> [B, T, F, 2] as speechbrain's STFT returns."""
    w = torch.hamming_window(WIN)
    s = torch.stft(
        torch.from_numpy(x).float(),
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=w,
        center=True,
        pad_mode="constant",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    s = torch.view_as_real(s)  # [B, F, T, 2]
    return s.permute(0, 2, 1, 3).numpy()  # [B, T, F, 2]


def torch_istft(spec_btf2: np.ndarray, length: int) -> np.ndarray:
    w = torch.hamming_window(WIN)
    s = torch.from_numpy(spec_btf2).float().permute(0, 2, 1, 3)  # [B,F,T,2]
    z = torch.view_as_complex(s.contiguous())
    return torch.istft(
        z, n_fft=N_FFT, hop_length=HOP, win_length=WIN, window=w,
        center=True, normalized=False, onesided=True, length=length,
    ).numpy()


def test_hamming_matches_torch():
    ours = np.asarray(hamming_window(400))
    theirs = torch.hamming_window(400).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("length", [3200, 4800, 16000])
def test_stft_matches_torch(length):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, length)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft=N_FFT, hop=HOP))
    ref = torch_stft(x)
    assert ours.shape == ref.shape == (2, length // HOP + 1, N_FFT // 2 + 1, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("length", [3200, 16000])
def test_istft_matches_torch(length):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, length)).astype(np.float32)
    spec = torch_stft(x)
    ours = np.asarray(istft(jnp.asarray(spec), n_fft=N_FFT, hop=HOP, length=length))
    ref = torch_istft(spec, length)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3200)).astype(np.float32)
    spec = stft(jnp.asarray(x), n_fft=N_FFT, hop=HOP)
    y = np.asarray(istft(spec, n_fft=N_FFT, hop=HOP, length=3200))
    np.testing.assert_allclose(y, x, atol=1e-4, rtol=1e-4)


def test_config_geometry():
    cfg = StftConfig(sample_rate=16000, win_length=25, hop_length=10, n_fft=400)
    assert cfg.win_samples == 400 and cfg.hop == 160 and cfg.num_freqs == 201
    # The reference chunk: 3200 samples -> 21 frames (GeneralBeamformer.py:280)
    assert cfg.num_frames(3200) == 21


def test_istft_default_length():
    spec = stft(jnp.zeros((1, 3200)), n_fft=N_FFT, hop=HOP)
    y = istft(spec, n_fft=N_FFT, hop=HOP)
    assert y.shape == (1, 3200)


def test_matmul_dft_matches_fft():
    from semi_tpu.ops.stft import istft_matmul, stft_matmul

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 3200)).astype(np.float32))
    a, b = stft(x), stft_matmul(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    ya = istft(a, length=3200)
    yb = istft_matmul(a, length=3200)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-5)
