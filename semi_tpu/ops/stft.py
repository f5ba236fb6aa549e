"""STFT / iSTFT for 16 kHz streaming enhancement, TPU-first.

Parameterization mirrors the reference's feature extractor (reference:
CRN_ELU.py:329-333 builds speechbrain STFT/ISTFT with sample_rate=16000,
win_length=25 ms, hop_length=10 ms, n_fft=400): periodic Hamming window,
center padding with zeros, one-sided spectrum, layout ``[..., T, F, 2]``
with ``T = L // hop + 1`` and ``F = n_fft // 2 + 1``.

Implementation notes (TPU):
- Framing is expressed as a gather with a static ``[T, n_fft]`` index
  matrix; XLA lowers this to an efficient dynamic-slice loop and fuses
  the window multiply into the surrounding computation.
- The rFFT runs as a single batched ``jnp.fft.rfft`` over all frames —
  one big batched kernel instead of a Python frame loop.
- Everything is shape-static so the whole pipeline jits once per
  utterance-length bucket.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hamming_window",
    "stft",
    "istft",
    "StftConfig",
    "dft_matrices",
    "stft_matmul",
    "istft_matmul",
]


def hamming_window(n: int, periodic: bool = True, dtype=jnp.float32) -> jax.Array:
    """Periodic Hamming window (matches ``torch.hamming_window`` defaults)."""
    m = n + 1 if periodic else n
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(m) / (m - 1))
    if periodic:
        w = w[:-1]
    return jnp.asarray(w, dtype=dtype)


class StftConfig:
    """Static STFT geometry resolved from the reference's ms-style config.

    Args mirror the reference constructor kwargs (sample_rate, win_length
    in ms, hop_length in ms, n_fft) so YAML model sections stay drop-in.
    """

    def __init__(
        self,
        sample_rate: int = 16000,
        win_length: float = 25,
        hop_length: float = 10,
        n_fft: int = 400,
    ):
        self.sample_rate = int(sample_rate)
        self.win_samples = int(round(sample_rate * win_length / 1000))
        self.hop = int(round(sample_rate * hop_length / 1000))
        self.n_fft = int(n_fft)
        self.num_freqs = self.n_fft // 2 + 1

    def num_frames(self, length: int) -> int:
        return length // self.hop + 1

    def __repr__(self):
        return (
            f"StftConfig(sr={self.sample_rate}, win={self.win_samples}, "
            f"hop={self.hop}, n_fft={self.n_fft})"
        )


@functools.lru_cache(maxsize=64)
def _frame_indices(num_frames: int, n_fft: int, hop: int) -> np.ndarray:
    t = np.arange(num_frames)[:, None] * hop
    k = np.arange(n_fft)[None, :]
    return t + k  # [T, n_fft]


def _frame(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Center-pad and slice ``x[..., L]`` into frames ``[..., T, n_fft]``."""
    length = x.shape[-1]
    num_frames = length // hop + 1
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    xp = jnp.pad(x, pad)
    idx = jnp.asarray(_frame_indices(num_frames, n_fft, hop))
    return xp[..., idx]


def stft(
    x: jax.Array,
    n_fft: int = 400,
    hop: int = 160,
    window: jax.Array | None = None,
) -> jax.Array:
    """Short-time Fourier transform.

    Args:
        x: waveform ``[..., L]``.
    Returns:
        ``[..., T, F, 2]`` real/imag, ``T = L // hop + 1``, ``F = n_fft//2+1``.
    """
    if window is None:
        window = hamming_window(n_fft, dtype=x.dtype)
    frames = _frame(x, n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.stack([spec.real, spec.imag], axis=-1).astype(x.dtype)


@functools.lru_cache(maxsize=8)
def _dft_np(n_fft: int):
    """Real DFT as matrices: fwd [n_fft, 2F] (cos|-sin), inv [2F, n_fft]."""
    f = n_fft // 2 + 1
    k = np.arange(f)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    fwd = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # [n_fft, 2F]
    # inverse: x[n] = (1/N) * sum_k w_k (re_k cos - im_k sin), w = 2 except DC/Nyq
    w = np.full((f,), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    inv = np.concatenate([
        (np.cos(ang) * w[None, :]).T,          # [F, n_fft] from real part
        (-np.sin(ang) * w[None, :]).T,         # [F, n_fft] from imag part
    ], axis=0) / n_fft                          # [2F, n_fft]
    return fwd.astype(np.float32), inv.astype(np.float32)


def dft_matrices(n_fft: int):
    fwd, inv = _dft_np(n_fft)
    return jnp.asarray(fwd), jnp.asarray(inv)


def stft_matmul(
    x: jax.Array,
    n_fft: int = 400,
    hop: int = 160,
    window: jax.Array | None = None,
) -> jax.Array:
    """STFT with the rFFT expressed as one MXU matmul.

    Numerically identical to :func:`stft` (exact real-DFT matrix); for
    the 400-point transform on many small frames the systolic-array
    matmul beats XLA's generic small-batch FFT. Layout ``[..., T, F, 2]``.
    """
    if window is None:
        window = hamming_window(n_fft, dtype=x.dtype)
    frames = _frame(x, n_fft, hop) * window          # [..., T, n_fft]
    fwd, _ = dft_matrices(n_fft)
    spec = frames @ fwd.astype(x.dtype)               # [..., T, 2F]
    f = n_fft // 2 + 1
    return jnp.stack([spec[..., :f], spec[..., f:]], axis=-1)


def istft_matmul(
    spec: jax.Array,
    n_fft: int = 400,
    hop: int = 160,
    window: jax.Array | None = None,
    length: int | None = None,
    eps: float = 1e-11,
) -> jax.Array:
    """iSTFT with the irFFT as one MXU matmul (see :func:`istft`)."""
    if window is None:
        window = hamming_window(n_fft, dtype=spec.dtype)
    num_frames = spec.shape[-3]
    _, inv = dft_matrices(n_fft)
    flat = jnp.concatenate([spec[..., 0], spec[..., 1]], axis=-1)  # [..., T, 2F]
    frames = (flat @ inv.astype(spec.dtype)) * window              # [..., T, n_fft]

    total = n_fft + (num_frames - 1) * hop
    idx = jnp.asarray(_frame_indices(num_frames, n_fft, hop))
    lead = frames.shape[:-2]
    ff = frames.reshape((-1, num_frames, n_fft))
    out = jnp.zeros((ff.shape[0], total), dtype=spec.dtype)
    out = out.at[:, idx.reshape(-1)].add(ff.reshape(ff.shape[0], -1))
    wsq = jnp.zeros((total,), dtype=spec.dtype)
    wsq = wsq.at[idx.reshape(-1)].add(jnp.tile(window * window, (num_frames,)))
    out = out / (wsq[None, :] + eps)
    if length is None:
        length = (num_frames - 1) * hop
    start = n_fft // 2
    return out[:, start: start + length].reshape(lead + (length,))


def istft(
    spec: jax.Array,
    n_fft: int = 400,
    hop: int = 160,
    window: jax.Array | None = None,
    length: int | None = None,
    eps: float = 1e-11,
) -> jax.Array:
    """Inverse STFT with windowed overlap-add and window-square normalization.

    Args:
        spec: ``[..., T, F, 2]`` real/imag one-sided spectrum.
        length: output length; defaults to ``(T - 1) * hop`` (center trim).
    Returns:
        waveform ``[..., length]``.
    """
    if window is None:
        window = hamming_window(n_fft, dtype=spec.dtype)
    num_frames = spec.shape[-3]
    z = jax.lax.complex(spec[..., 0], spec[..., 1])
    frames = jnp.fft.irfft(z, n=n_fft, axis=-1) * window  # [..., T, n_fft]

    total = n_fft + (num_frames - 1) * hop
    idx = jnp.asarray(_frame_indices(num_frames, n_fft, hop))  # [T, n_fft]

    lead = frames.shape[:-2]
    flat = frames.reshape((-1, num_frames, n_fft))
    out = jnp.zeros((flat.shape[0], total), dtype=spec.dtype)
    out = out.at[:, idx.reshape(-1)].add(
        flat.reshape(flat.shape[0], -1), unique_indices=False
    )

    wsq = jnp.zeros((total,), dtype=spec.dtype)
    wsq = wsq.at[idx.reshape(-1)].add(
        jnp.tile(window * window, (num_frames,)), unique_indices=False
    )
    out = out / (wsq[None, :] + eps)

    if length is None:
        length = (num_frames - 1) * hop
    start = n_fft // 2
    out = out[:, start : start + length]
    return out.reshape(lead + (length,))
