"""Differentiable training losses: SI-SNR, STOI, PESQ.

JAX ports of the reference's loss stack with two structural upgrades:

- **No host sync.** The reference STOI/PESQ losses force ``.cpu()``
  every step (utility.py:714, 845); here everything is jnp, jit-safe,
  and batch-vectorized via ``vmap``.
- **Static shapes.** The reference's silent-frame removal physically
  shortens the signal (data-dependent shape, utility.py:521-571); here
  kept frames are scatter-compacted into a fixed-size buffer and a
  valid-frame count masks downstream statistics. Numerics match except
  at the last ~2 spectrogram frames (the reference reflect-pads around
  the dynamic length; we zero-pad) — negligible against the 40 dB VAD.

Reference quirks intentionally kept: STOI/PESQ internals follow
utility.py:615-916 (thirdoct bands, 40 dB VAD, clipped envelope
correlation; bark binning, level/time-freq equalization, Zwicker
loudness, asymmetric disturbance). One deviation: the reference PESQ
loop returns only the LAST batch item (utility.py:723-814, batch_size=1
in practice); we return the batch mean.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

from semi_tpu.ops.resample import resample_poly, resampled_length

EPS = 1e-8
SMALL = float(np.finfo("float").eps)

__all__ = ["si_snr", "stoi_loss", "pesq_loss"]


# --------------------------------------------------------------------
# SI-SNR (utility.py:207-223), masked instead of per-item sliced
# --------------------------------------------------------------------

def si_snr(separated: jax.Array, source: jax.Array, length=None, eps: float = 1e-8):
    """Mean scale-invariant SNR in dB over the batch. Inputs ``[B, L]``."""
    b, total = separated.shape
    if length is None:
        mask = jnp.ones((b, total), separated.dtype)
        n = jnp.full((b, 1), float(total), separated.dtype)
    else:
        mask = (jnp.arange(total)[None, :] < length[:, None]).astype(separated.dtype)
        n = length[:, None].astype(separated.dtype)

    sep = (separated - jnp.sum(separated * mask, -1, keepdims=True) / n) * mask
    src = (source - jnp.sum(source * mask, -1, keepdims=True) / n) * mask

    dot = jnp.sum(sep * src, -1, keepdims=True)
    src_energy = jnp.sum(src * src, -1, keepdims=True) + eps
    true = dot * src / src_energy
    t_norm = jnp.sqrt(jnp.sum(true * true, -1))
    e_norm = jnp.sqrt(jnp.sum((sep - true) ** 2, -1))
    val = 20.0 * jnp.log10(eps + t_norm / (e_norm + eps))
    return jnp.mean(val)


# --------------------------------------------------------------------
# shared: power spectrogram (torchaudio.Spectrogram parameterization)
# --------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _hann_padded(win_length: int, n_fft: int) -> np.ndarray:
    m = win_length + 1
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(m) / win_length))[:-1]
    pad = (n_fft - win_length) // 2
    return np.pad(w, (pad, pad)).astype(np.float32)


def power_spectrogram(x: jax.Array, n_fft: int, win_length: int, hop: int):
    """``[..., L]`` -> power spectrum ``[..., F, T]`` (center, reflect pad)."""
    length = x.shape[-1]
    t = length // hop + 1
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)],
                 mode="reflect")
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xp[..., idx] * jnp.asarray(_hann_padded(win_length, n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    return (spec.real**2 + spec.imag**2).swapaxes(-1, -2)  # [..., F, T]


# --------------------------------------------------------------------
# STOI loss (utility.py:480-571, 821-916)
# --------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _thirdoct(fs: int, nfft: int, num_bands: int, min_freq: int) -> np.ndarray:
    """1/3-octave band matrix (utility.py:480-518)."""
    f = np.linspace(0, fs, nfft + 1)[: nfft // 2 + 1]
    k = np.arange(num_bands).astype(float)
    freq_low = min_freq * np.power(2.0, (2 * k - 1) / 6)
    freq_high = min_freq * np.power(2.0, (2 * k + 1) / 6)
    obm = np.zeros((num_bands, len(f)), dtype=np.float32)
    for i in range(num_bands):
        fl = int(np.argmin(np.square(f - freq_low[i])))
        fh = int(np.argmin(np.square(f - freq_high[i])))
        obm[i, fl:fh] = 1.0
    return obm


def _remove_silent_frames(x, y, valid_len, dyn_range=40.0, n=256, hop=128):
    """Static-shape port of utility.py:521-571.

    Returns (x_sil, y_sil, n_kept) where the first ``n_kept * hop + hop``
    samples of the outputs are the silent-removed reconstruction.
    """
    length = x.shape[-1]
    num_frames = length // n + max(0, (length - hop)) // n
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(n)[None, :]
    w = jnp.asarray(np.hanning(n).astype(np.float32))

    xf = x[idx]  # [T, n]
    yf = y[idx]
    frame_valid = jnp.asarray(starts + n)[None, :] <= valid_len  # [1, T]
    frame_valid = frame_valid[0]

    energy = 20.0 * jnp.log10(
        jnp.sqrt(jnp.sum((w * xf) ** 2, -1)) / 16.0 + SMALL
    )
    max_energy = jnp.max(jnp.where(frame_valid, energy, -jnp.inf))
    keep = frame_valid & (energy - max_energy + dyn_range > 0)

    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1  # target slot per kept frame
    pos = jnp.clip(pos, 0, num_frames - 1)
    scatter_idx = (pos[:, None] * hop + np.arange(n)[None, :]).reshape(-1)
    kf = keep[:, None].astype(x.dtype)

    x_sil = jnp.zeros((length,), x.dtype).at[scatter_idx].add(
        ((w * xf) * kf).reshape(-1))
    y_sil = jnp.zeros((length,), y.dtype).at[scatter_idx].add(
        ((w * yf) * kf).reshape(-1))
    return x_sil, y_sil, jnp.sum(keep.astype(jnp.int32))


def _stoi_item(y_true, y_pred, valid_len):
    """One item's (negated) STOI intelligibility measure. Inputs at 10 kHz."""
    n_env = 30  # envelope length
    num_bands = 15
    c = 5.62341325  # 10^(-Beta/20), Beta = -15

    x_sil, y_sil, n_kept = _remove_silent_frames(y_true, y_pred, valid_len)

    spec_x = power_spectrogram(x_sil, 512, 256, 128)  # [257, T]
    spec_y = power_spectrogram(y_sil, 512, 256, 128)
    obm = jnp.asarray(_thirdoct(10000, 512, num_bands, 150))
    oct_x = jnp.sqrt(obm @ spec_x + 1e-14)  # [15, T]
    oct_y = jnp.sqrt(obm @ spec_y + 1e-14)

    t_spec = spec_x.shape[-1]
    t_valid = n_kept + 2  # frames covering the length-(n_kept+1)*hop signal
    m_max = t_spec - (n_env - 1)
    widx = np.arange(m_max)[:, None] + np.arange(n_env)[None, :]  # [M, 30]
    xw = oct_x[:, widx].transpose(1, 0, 2)  # [M, 15, 30]
    yw = oct_y[:, widx].transpose(1, 0, 2)
    m_valid = jnp.asarray(widx[:, -1])[None, :] < t_valid
    m_valid = m_valid[0]

    alpha = jnp.linalg.norm(xw, axis=-1, keepdims=True) / (
        jnp.linalg.norm(yw, axis=-1, keepdims=True) + SMALL)
    ay = yw * alpha
    yc = jnp.minimum(ay, xw + xw * c)

    xn = xw - jnp.mean(xw, -1, keepdims=True)
    xn = xn / (jnp.linalg.norm(xn, axis=-1, keepdims=True) + SMALL)
    yn = yc - jnp.mean(yc, -1, keepdims=True)
    yn = yn / (jnp.linalg.norm(yn, axis=-1, keepdims=True) + SMALL)

    corr = jnp.sum(xn * yn, axis=(1, 2))  # [M]
    m_count = jnp.sum(m_valid.astype(jnp.int32))
    d = jnp.sum(jnp.where(m_valid, corr, 0.0)) / (
        num_bands * jnp.maximum(m_count, 1))
    # degenerate short signals score 0.99 (utility.py:871-872)
    short = (n_kept * 128 + 128 <= 512) | (m_count <= 0)
    return jnp.where(short, 0.99, d)


def stoi_loss(y_true: jax.Array, y_pred: jax.Array, length=None):
    """Negative mean STOI over the batch. Inputs ``[B, L]`` at 16 kHz."""
    if length is None:
        length = jnp.full((y_true.shape[0],), y_true.shape[-1], jnp.int32)
    total = y_true.shape[-1]
    mask = (jnp.arange(total)[None, :] < length[:, None]).astype(y_true.dtype)
    yt = resample_poly(y_true * mask, 5, 8)
    yp = resample_poly(y_pred * mask, 5, 8)
    len10 = (length * 5) // 8
    d = jax.vmap(_stoi_item)(yt, yp, len10)
    return -jnp.mean(d)


# --------------------------------------------------------------------
# PESQ loss (utility.py:615-814)
# --------------------------------------------------------------------

_N_BARK = 49

_ABS_THRESH_POWER = np.array([
    51286152.0, 2454709.5, 70794.59375, 4897.788574, 1174.897705,
    389.045166, 104.71286, 45.70882, 17.782795, 9.772372,
    4.897789, 3.090296, 1.905461, 1.258925, 0.977237,
    0.724436, 0.562341, 0.457088, 0.389045, 0.331131,
    0.295121, 0.269153, 0.25704, 0.251189, 0.251189,
    0.251189, 0.251189, 0.263027, 0.288403, 0.30903,
    0.338844, 0.371535, 0.398107, 0.436516, 0.467735,
    0.489779, 0.501187, 0.501187, 0.512861, 0.524807,
    0.524807, 0.524807, 0.512861, 0.47863, 0.42658,
    0.371535, 0.363078, 0.416869, 0.537032], dtype=np.float32)

_POW_DENS_CORRECTION = np.array([
    100.0, 99.999992, 100.0, 100.000008, 100.000008,
    100.000015, 99.999992, 99.999969, 50.000027, 100.0,
    99.999969, 100.000015, 99.999947, 100.000061, 53.047077,
    110.000046, 117.991989, 65.0, 68.760147, 69.999931,
    71.428818, 75.000038, 76.843384, 80.968781, 88.646126,
    63.864388, 68.15535, 72.547775, 75.584831, 58.379192,
    80.950836, 64.135651, 54.384785, 73.821884, 64.437073,
    59.176456, 65.521278, 61.399822, 58.144047, 57.004543,
    64.126297, 54.311001, 61.114979, 55.077751, 56.849335,
    55.628868, 53.137054, 54.985844, 79.546974], dtype=np.float32)

_H_LOUDNESS = np.array([
    2.0, 2.0, 2.0, 2.0, 1.82, 1.66, 1.51, 1.39, 1.29, 1.2,
    1.12, 1.05, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
    1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
    1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
    1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0], dtype=np.float32)

_WIDTH_OF_BAND_BARK = np.array([
    0.157344, 0.317994, 0.322441, 0.326934, 0.331474,
    0.336061, 0.340697, 0.345381, 0.350114, 0.354897,
    0.359729, 0.364611, 0.369544, 0.374529, 0.379565,
    0.384653, 0.389794, 0.394989, 0.400236, 0.405538,
    0.410894, 0.416306, 0.421773, 0.427297, 0.432877,
    0.438514, 0.444209, 0.449962, 0.455774, 0.461645,
    0.467577, 0.473569, 0.479621, 0.485736, 0.491912,
    0.498151, 0.504454, 0.510819, 0.51725, 0.523745,
    0.530308, 0.536934, 0.543629, 0.55039, 0.55722,
    0.564119, 0.571085, 0.578125, 0.585232], dtype=np.float32)


@functools.lru_cache(maxsize=2)
def _bark_matrix(fs: int = 16000, n_fft: int = 1024) -> np.ndarray:
    """[49, F] binary band-sum matrix from the bark2hz bin edges."""
    edges = []
    for k in np.linspace(0, 21, _N_BARK + 1):
        if k < 2:
            k = (k - 0.3) / 0.85
        elif k > 20.1:
            k = (k + 4.422) / 1.22
        h = 1960 * (k + 0.53) / (26.28 - k)
        edges.append(int(2 * h / fs * (n_fft // 2 + 1)))
    mat = np.zeros((_N_BARK, n_fft // 2 + 1), dtype=np.float32)
    for j in range(_N_BARK):
        mat[j, edges[j]: edges[j + 1]] = 1.0
    return mat


def _pesq_item(y_true, y_pred):
    n_fft, fs = 1024, 16000
    sp, sl, zwicker = 6.910853e-1, 1.866055e-1, 0.23

    stft_true = power_spectrogram(y_true, n_fft, n_fft // 2, n_fft // 4)
    stft_pred = power_spectrogram(y_pred, n_fft, n_fft // 2, n_fft // 4)
    t = stft_true.shape[-1]

    # Level alignment over 300-3000 Hz
    low_f = int(2 * 300 / fs * (n_fft // 2 + 1))
    high_f = int(2 * 3000 / fs * (n_fft // 2 + 1))
    stft_true = stft_true * 1e7 / (jnp.mean(stft_true[low_f:high_f]) + 1e-14)
    stft_pred = stft_pred * 1e7 / (jnp.mean(stft_pred[low_f:high_f]) + 1e-14)

    # Bark power densities
    bark = jnp.asarray(_bark_matrix(fs, n_fft))
    pdcf = jnp.asarray(_POW_DENS_CORRECTION)[:, None]
    b_true = (bark @ stft_true) * pdcf * sp  # [49, T]
    b_pred = (bark @ stft_pred) * pdcf * sp

    threshold = jnp.asarray(_ABS_THRESH_POWER)[:, None] * 1e4
    mask_true = (b_true > threshold).astype(b_true.dtype)
    mask_pred = (b_pred > threshold).astype(b_pred.dtype)
    total_true = jnp.sum(b_true * mask_true, axis=0)
    nsilence = (total_true > 1e7).astype(b_true.dtype)

    # Time-frequency equalization
    avg_true = jnp.mean(b_true * mask_true * nsilence, axis=1, keepdims=True)
    avg_pred = jnp.mean(b_pred * mask_pred * nsilence, axis=1, keepdims=True)
    scale = jnp.clip((avg_pred + 1e3) / (avg_true + 1e3), 0.01, 100.0)
    b_true = b_true * scale
    mask_true = (b_true > threshold).astype(b_true.dtype)
    mask_pred = (b_pred > threshold).astype(b_pred.dtype)
    total_true = jnp.sum(b_true * mask_true, axis=0)
    total_pred = jnp.sum(b_pred * mask_pred, axis=0)

    # Serial gain smoothing (IIR over frames) -> lax.scan
    def gain_step(s, tp):
        tt, tpd = tp
        s = 0.2 * s + (tt + 5e3) / (tpd + 5e3)
        return s, jnp.clip(s, 3e-4, 5.0)

    _, gain = jax.lax.scan(gain_step, jnp.asarray(1.0), (total_true, total_pred))
    b_pred = b_pred * gain[None, :]

    # Zwicker loudness mapping
    mzp = (jnp.asarray(_H_LOUDNESS) ** 0.15 * zwicker)[:, None]
    b_pred = (2 * threshold) ** mzp * (
        (0.5 + 0.5 * b_pred / threshold) ** mzp - 1) * mask_pred * sl
    b_true = (2 * threshold) ** mzp * (
        (0.5 + 0.5 * b_true / threshold) ** mzp - 1) * mask_true * sl

    # Disturbance with dead-zone
    d = b_pred - b_true
    m = jnp.minimum(b_pred, b_true) * 0.25
    distance = jnp.where(d > m, d - m, 0.0) + jnp.where(d < -m, d + m, 0.0)

    w = jnp.asarray(_WIDTH_OF_BAND_BARK)[:, None]
    w_sum = jnp.sum(w)
    da = jnp.abs(distance)
    sym = (jnp.sum((da * w) ** 2, axis=0) / w_sum) ** 0.5 * w_sum

    ratio = (b_pred + 50.0) / (b_true + 50.0)
    hr = ratio ** 1.2
    hr = jnp.where(hr < 3.0, 0.0, hr)
    hr = jnp.clip(hr, 0.0, 12.0)
    da = jnp.abs(distance * hr)
    asym = (jnp.sum(da * w, axis=0) / w_sum) * w_sum

    # Aggregation over syllable windows
    hfac = ((total_true + 1e5) / 1e7) ** 0.04
    sym = jnp.minimum(sym / hfac, 45.0)
    asym = jnp.minimum(asym / hfac, 45.0)

    win, hop2 = 20, 10
    k = max(1, (t - win) // hop2 + 1)
    fidx = np.arange(k)[:, None] * hop2 + np.arange(win)[None, :]
    left = t - k * hop2
    tail = slice(-left, None) if left > 0 else slice(None)
    sframe = jnp.concatenate([
        jnp.mean(sym[fidx] ** 6, axis=1),
        jnp.mean(sym[tail] ** 6)[None],
    ]) + 1e-8
    asframe = jnp.concatenate([
        jnp.mean(asym[fidx] ** 6, axis=1),
        jnp.mean(asym[tail] ** 6)[None],
    ]) + 1e-8
    sres = (jnp.mean((sframe ** (1.0 / 6)) ** 2) + 1e-8) ** 0.5
    asres = (jnp.mean((asframe ** (1.0 / 6)) ** 2) + 1e-8) ** 0.5
    return 4.5 - 0.1 * sres - 0.0309 * asres


def pesq_loss(y_true: jax.Array, y_pred: jax.Array, length=None):
    """Negative mean PESQ-approximation over the batch. Inputs ``[B, L]``.

    Like the reference (utility.py:615-814) the ``length`` argument is
    accepted but unused — the full (padded) signals are scored.
    """
    del length
    scores = jax.vmap(_pesq_item)(y_true, y_pred)
    return -jnp.mean(scores)


# --------------------------------------------------------------------
# Label-smoothed KL-divergence (utility.py:573-611; ASR leftover in the
# reference, unused by the active enhancement path — kept for inventory)
# --------------------------------------------------------------------

def kldiv_loss(log_probabilities, targets, length=None,
               label_smoothing: float = 0.0, pad_idx: int = 0,
               reduction: str = "mean"):
    """KL divergence against a label-smoothed one-hot distribution.

    Args:
        log_probabilities: ``[B, T, K]`` log-probs.
        targets: ``[B, T]`` int labels; ``pad_idx`` positions are masked.
    """
    if log_probabilities.ndim == 2:
        log_probabilities = log_probabilities[:, None, :]
    b, t, k = log_probabilities.shape
    targets = targets.astype(jnp.int32).reshape(-1)
    logp = log_probabilities.reshape(-1, k)

    confidence = 1.0 - label_smoothing
    smooth = label_smoothing / (k - 1)
    ignore = targets == pad_idx
    tgt = jnp.where(ignore, 0, targets)
    true_dist = jnp.full((b * t, k), smooth, logp.dtype)
    true_dist = true_dist.at[jnp.arange(b * t), tgt].set(confidence)

    # kl_div(log_input, target) elementwise: target * (log(target) - input)
    loss = true_dist * (jnp.log(jnp.maximum(true_dist, 1e-12)) - logp)
    loss = jnp.where(ignore[:, None], 0.0, loss)

    if reduction == "mean" or reduction == "sum":
        return jnp.sum(loss)
    if reduction == "batchmean":
        return jnp.sum(loss) / b
    if reduction == "batch":
        return loss.reshape(b, -1).sum(1) / length
    return loss
