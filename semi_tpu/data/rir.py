"""Image-source room impulse response simulation in JAX.

TPU-native replacement for gpuRIR (reference: multichannel.py:37-103),
which pinned a whole CUDA device for preprocessing (multichannel.py:8,
README.md:24). Here RIR synthesis is a batched jnp computation that
runs on-device inside the input pipeline — no dedicated chip.

Method (hybrid, like gpuRIR):
- Image-source method up to ``Tdiff`` = att2t_Sabine(15 dB, T60) with a
  static reflection-order grid sized for the worst case, masked per
  sample. Fractional delays use linear interpolation between adjacent
  taps (gpuRIR uses a sinc kernel; at 16 kHz augmentation this is an
  inaudible difference, documented deviation).
- Diffuse tail after ``Tdiff``: exponentially decaying noise with decay
  matched to T60 and energy matched to the ISM segment at the
  transition (gpuRIR's diffuse model).

Geometry sampling matches config.yaml:77-88: room 3-4 x 3-5 x 2.5-3 m,
T60 0.2-1.0 s, wall beta 0.5-1.0, 3-mic array, uniform source positions.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

SPEED_OF_SOUND = 343.0

__all__ = ["RoomConfig", "RoomSample", "sample_room", "simulate_rir", "fft_convolve"]


class RoomConfig(NamedTuple):
    room_limit: tuple
    t60_limit: tuple
    beta_limit: tuple
    array_limit: tuple
    mic_limit: tuple
    source_limit: tuple
    num_src: int
    num_mic: int
    fs: int


class RoomSample(NamedTuple):
    room: jax.Array        # [3]
    t60: jax.Array         # []
    beta: jax.Array        # [6] wall reflection coefficients
    mic_pos: jax.Array     # [M, 3]
    src_pos: jax.Array     # [S, 3] (num_src + 1 for the noise source)


def att2t_sabine(att_db: float, t60):
    """Time for ``att_db`` of decay given T60 (gpuRIR att2t_SabineEstimator)."""
    return att_db / 60.0 * t60


def sample_room(key: jax.Array, cfg: RoomConfig) -> RoomSample:
    """Sample room geometry like MultiChannel.simulate (multichannel.py:37-57)."""
    ks = jax.random.split(key, 5)
    lo = jnp.asarray(cfg.room_limit[0], jnp.float32)
    hi = jnp.asarray(cfg.room_limit[1], jnp.float32)
    room = jax.random.uniform(ks[0], (3,)) * (hi - lo) + lo

    t60 = jax.random.uniform(ks[1], ()) * (
        cfg.t60_limit[1] - cfg.t60_limit[0]) + cfg.t60_limit[0]

    blo = jnp.asarray(cfg.beta_limit[0], jnp.float32)
    bhi = jnp.asarray(cfg.beta_limit[1], jnp.float32)
    beta = jax.random.uniform(ks[2], (6,)) * (bhi - blo) + blo

    alo = jnp.asarray(cfg.array_limit[0], jnp.float32)
    ahi = jnp.asarray(cfg.array_limit[1], jnp.float32)
    mlo = jnp.asarray(cfg.mic_limit[0], jnp.float32)
    mhi = jnp.asarray(cfg.mic_limit[1], jnp.float32)
    k_arr, k_mic = jax.random.split(ks[3])
    array_pos = (jax.random.uniform(k_arr, (3,)) * (ahi - alo) + alo) * room
    mic_off = jax.random.uniform(k_mic, (cfg.num_mic, 3)) * (mhi - mlo) + mlo
    mic_pos = array_pos[None, :] + mic_off

    slo = jnp.asarray(cfg.source_limit[0], jnp.float32)
    shi = jnp.asarray(cfg.source_limit[1], jnp.float32)
    n_src = cfg.num_src + 1  # +1 noise source (multichannel.py:69-72)
    src_pos = (jax.random.uniform(ks[4], (n_src, 3)) * (shi - slo) + slo) * room[None]
    return RoomSample(room=room, t60=t60, beta=beta, mic_pos=mic_pos, src_pos=src_pos)


def _max_order(t60_max: float, room_min: float) -> int:
    tdiff = att2t_sabine(15.0, t60_max)
    return int(math.ceil(SPEED_OF_SOUND * tdiff / (2.0 * room_min))) + 1


def simulate_rir(key: jax.Array, sample: RoomSample, cfg: RoomConfig,
                 rir_len: int | None = None) -> jax.Array:
    """Render RIRs for every (source, mic) pair.

    Returns ``[S, M, rir_len]`` at ``cfg.fs``. ``rir_len`` defaults to
    covering the configured maximum T60.
    """
    fs = cfg.fs
    if rir_len is None:
        rir_len = int(math.ceil(cfg.t60_limit[1] * fs))
    n_order = _max_order(cfg.t60_limit[1], min(cfg.room_limit[0]))

    # Static image grid [-n..n]^3
    r = np.arange(-n_order, n_order + 1)
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    grid = jnp.asarray(
        np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.int32))  # [G, 3]

    room = sample.room
    t60 = jnp.maximum(sample.t60, 1e-3)
    tdiff = att2t_sabine(15.0, t60)
    tmax = att2t_sabine(60.0, t60)
    # short rooms: pure ISM window extends to Tmax (multichannel.py:50-51)
    tdiff = jnp.where(t60 < 0.15, tmax, tdiff)

    # static bound on ISM tap indices: tdiff <= max(att2t(15, t60_max),
    # 0.15 s) over both branches above; square bin grid (w_bins^2 = nb)
    tdiff_bound = max(att2t_sabine(15.0, cfg.t60_limit[1]), 0.15)
    w_bins = max(8, int(math.ceil(math.sqrt(tdiff_bound * fs + 2))))
    nb = w_bins * w_bins

    def one_pair(src, mic):
        # Image positions per axis: even n -> n*L + s; odd n -> (n+1)*L - s
        # (mirrors across the walls at 0 and L).
        n = grid.astype(jnp.float32)  # [G, 3]
        even = (grid % 2) == 0
        img = jnp.where(even, n * room[None, :] + src[None, :],
                        (n + 1.0) * room[None, :] - src[None, :])
        # An axis-index n contributes |n| wall reflections. Symmetric
        # absorption simplification: beta_axis = sqrt(b_lo * b_hi),
        # amplitude = prod beta_axis^{|n|} (exact wall-by-wall bookkeeping
        # differs negligibly over the sampled beta range 0.5-1.0).
        nx = jnp.abs(grid).astype(jnp.float32)
        beta_axis = jnp.sqrt(sample.beta[0::2] * sample.beta[1::2])  # [3]
        amp_refl = jnp.prod(beta_axis[None, :] ** nx, axis=1)

        dist = jnp.linalg.norm(img - mic[None, :], axis=1) + 1e-3
        delay = dist / SPEED_OF_SOUND
        amp = amp_refl / (4.0 * jnp.pi * dist)

        keep = (delay < tdiff).astype(jnp.float32)
        amp = amp * keep

        # Linear fractional-delay binning. A scatter-add here is ~6 ms
        # per utterance on TPU (XLA lowers data-dependent scatters
        # poorly); instead bin via a two-level one-hot MATMUL: with
        # tap = hi*W + lo, rir2d[hi, lo] = (onehot_hi * amp)^T @
        # onehot_lo — one [W, G] @ [G, W] contraction on the MXU,
        # mathematically identical to the scatter (float summation
        # order aside). ISM taps are bounded by tdiff <= 0.25 s, so
        # only the first `nb` bins can be hit (amp is already zeroed
        # past tdiff); the diffuse tail fills the rest.
        tap = delay * fs
        i0 = jnp.clip(tap.astype(jnp.int32), 0, nb - 1)
        frac = tap - i0.astype(jnp.float32)

        def bin_matmul(vals, taps):
            hi = taps // w_bins
            lo = taps % w_bins
            iota = jnp.arange(w_bins, dtype=jnp.int32)
            oh_hi = (hi[:, None] == iota[None, :]).astype(jnp.float32)
            oh_lo = (lo[:, None] == iota[None, :]).astype(jnp.float32)
            return ((oh_hi * vals[:, None]).T @ oh_lo).reshape(nb)

        rir_ism = bin_matmul(amp * (1.0 - frac), i0) + \
            bin_matmul(amp * frac, jnp.clip(i0 + 1, 0, nb - 1))
        if nb >= rir_len:
            return rir_ism[:rir_len]
        return jnp.pad(rir_ism, (0, rir_len - nb))

    rirs = jax.vmap(
        lambda s: jax.vmap(lambda m: one_pair(s, m))(sample.mic_pos)
    )(sample.src_pos)  # [S, M, rir_len]

    # Diffuse tail: decaying noise after tdiff, energy-matched at the seam
    t = jnp.arange(rir_len, dtype=jnp.float32) / fs
    decay = jnp.exp(-6.907755 * t / t60)  # 60 dB over t60
    tail_mask = (t >= tdiff) & (t < tmax)
    noise = jax.random.normal(key, rirs.shape)

    # match RMS of the last ISM millisecond before the seam
    seam = (t >= jnp.maximum(tdiff - 0.005, 0.0)) & (t < tdiff)
    seam_count = jnp.maximum(jnp.sum(seam.astype(jnp.float32)), 1.0)
    seam_rms = jnp.sqrt(
        jnp.sum(rirs**2 * seam[None, None, :], axis=-1, keepdims=True) / seam_count)
    decay_at_seam = jnp.exp(-6.907755 * tdiff / t60)
    tail = noise * (decay / jnp.maximum(decay_at_seam, 1e-6))[None, None, :] * seam_rms
    short = t60 < 0.15  # pure-ISM branch has no tail
    return rirs + jnp.where(short, 0.0, 1.0) * tail * tail_mask[None, None, :]


def fft_convolve(signal: jax.Array, rir: jax.Array) -> jax.Array:
    """Batched FFT convolution: ``signal[..., L] * rir[..., R] -> [..., L]``.

    Full convolution truncated to the signal length (gpuRIR's
    simulateTrajectory keeps the leading L samples).
    """
    length = signal.shape[-1]
    n = length + rir.shape[-1] - 1
    nfft = 1 << (n - 1).bit_length()
    spec = jnp.fft.rfft(signal, nfft) * jnp.fft.rfft(rir, nfft)
    return jnp.fft.irfft(spec, nfft)[..., :length]
