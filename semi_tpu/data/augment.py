"""Device-side waveform augmentation, driven by explicit PRNG keys.

Functional ports of the reference augmenters (augment.py:12-787), each
``fn(key, x, ...) -> x`` with jit-safe static shapes:

- ``add_noise``     SNR mixing with speechbrain's amplitude convention
- ``drop_freq``     1-4 sinc notch filters (freq masking)
- ``drop_chunk``    random zero spans, counts scaled by length
- ``do_clip``       random amplitude clamp
- ``extend_noise``  Hann-crossfade looping of short noise
- ``speed_perturb`` polyphase resampling at {90,95,105,110}%

Probabilistic gating (``*_prob``) uses ``jnp.where`` on the full
computation (compute-always, select) — branchless and fusable, the
standard TPU trade.

Determinism is structural: a single key threads through the pipeline
(reference relied on global torch/numpy seeding, SURVEY.md §5.2).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from semi_tpu.ops.resample import resample_poly

__all__ = [
    "compute_amplitude", "add_noise", "add_reverb", "drop_freq", "drop_chunk",
    "do_clip", "extend_noise", "speed_perturb", "notch_kernel",
]


def compute_amplitude(x: jax.Array) -> jax.Array:
    """speechbrain 'avg' amplitude: mean absolute value over time."""
    return jnp.mean(jnp.abs(x), axis=-1, keepdims=True)


def add_noise(key, clean: jax.Array, noise: jax.Array,
              snr_low: float = -5.0, snr_high: float = 25.0,
              mix_prob: float = 1.0, length=None):
    """Mix ``noise`` into ``clean`` at a sampled SNR (augment.py:29-77).

    Shapes ``[..., L]`` (broadcastable). Returns (noisy, scaled_noise).

    ``length``: active sample count along the last axis. The reference
    mixes exact-length tensors; our device mixer zero-pads utterances to
    a static ``mix_len``, which would dilute the mean-|x| amplitudes and
    silently raise the realized SNR (~+2 dB at 80% fill) — masking the
    amplitude estimate to the active region restores the reference's
    convention under static shapes.
    """
    k_p, k_snr = jax.random.split(key)
    snr = jax.random.uniform(k_snr, ()) * (snr_high - snr_low) + snr_low
    factor = 1.0 / (10.0 ** (snr / 20.0) + 1.0)
    if length is None:
        clean_amp = jnp.mean(jnp.abs(clean))
        noise_amp = jnp.mean(jnp.abs(noise))
    else:
        mask = (jnp.arange(clean.shape[-1]) < length).astype(clean.dtype)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        clean_amp = jnp.mean(jnp.abs(clean) * mask) * clean.shape[-1] / denom
        noise_amp = jnp.mean(jnp.abs(noise) * mask) * noise.shape[-1] / denom
    target_amp = factor * clean_amp

    scaled_clean = clean * (1.0 - factor)
    scaled_noise = noise * (target_amp / (noise_amp + 1e-8))
    noisy = scaled_clean + scaled_noise

    # normalize to prevent clipping (per-timestep max over leading dims)
    abs_max = jnp.max(jnp.abs(noisy))
    noisy = noisy / jnp.maximum(abs_max, 1.0)

    skip = jax.random.uniform(k_p, ()) > mix_prob
    return (jnp.where(skip, clean, noisy),
            jnp.where(skip, jnp.zeros_like(scaled_noise), scaled_noise))


def notch_kernel(freq, filter_width: int = 101, notch_width: float = 0.05):
    """Sinc-based band-rejection kernel (speechbrain notch_filter port).

    ``freq`` in [0, 1] (1 = Nyquist); returns ``[filter_width]``.
    """
    pad = filter_width // 2
    inp = jnp.arange(filter_width, dtype=jnp.float32) - pad
    freq = jnp.asarray(freq, jnp.float32) + notch_width  # keep above floor
    win = jnp.blackman(filter_width).astype(jnp.float32)

    def sinc(x):
        return jnp.where(x == 0, 1.0, jnp.sin(x) / jnp.where(x == 0, 1.0, x))

    hlpf = sinc(3.0 * (freq - notch_width) * inp) * win
    hlpf = hlpf / jnp.sum(hlpf)
    hhpf = sinc(3.0 * (freq + notch_width) * inp) * win
    hhpf = hhpf / -jnp.sum(hhpf)
    hhpf = hhpf.at[pad].add(1.0)
    return hlpf + hhpf


def _conv_same(x: jax.Array, kernel: jax.Array) -> jax.Array:
    pad = kernel.shape[-1] // 2
    lead = x.shape[:-1]
    y = jax.lax.conv_general_dilated(
        x.reshape(-1, 1, x.shape[-1]), kernel.reshape(1, 1, -1),
        window_strides=(1,), padding=((pad, pad),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y[:, 0].reshape(lead + (x.shape[-1],))


def drop_freq(key, x: jax.Array, drop_freq_low=1e-4, drop_freq_high=1.0,
              drop_count_low=1, drop_count_high=4, drop_width=0.05,
              drop_prob=0.5):
    """Notch out 1-4 random frequencies (augment.py:547-611)."""
    k_p, k_c, k_f = jax.random.split(key, 3)
    count = jax.random.randint(k_c, (), drop_count_low, drop_count_high + 1)
    freqs = jax.random.uniform(k_f, (drop_count_high,)) * (
        drop_freq_high - drop_freq_low) + drop_freq_low

    pad = 50
    delta = jnp.zeros((101,), jnp.float32).at[pad].set(1.0)

    def body(i, filt):
        active = i < count
        nk = notch_kernel(freqs[i], 101, drop_width)
        convolved = jnp.convolve(filt, nk, mode="same")
        return jnp.where(active, convolved, filt)

    filt = jax.lax.fori_loop(0, drop_count_high, body, delta)
    y = _conv_same(x, filt)
    skip = jax.random.uniform(k_p, ()) > drop_prob
    return jnp.where(skip, x, y)


def drop_chunk(key, x: jax.Array, drop_length_low=100, drop_length_high=500,
               drop_count_low_rate=2e-5, drop_count_high_rate=2e-4,
               drop_prob=0.5, max_drops: int = 16):
    """Zero random time spans; counts scale with length (augment.py:614-726).

    ``max_drops`` statically bounds the reference's dynamic drop count
    (at 60 000 samples the high rate gives 12 drops).
    """
    length = x.shape[-1]
    lo = max(1, int(drop_count_low_rate * length))
    hi = max(lo, int(drop_count_high_rate * length))
    hi = min(hi, max_drops)
    lo = min(lo, hi)

    k_p, k_n, k_l, k_s = jax.random.split(key, 4)
    n_drops = jax.random.randint(k_n, (), lo, hi + 1)
    lens = jax.random.randint(k_l, (max_drops,), drop_length_low,
                              drop_length_high + 1)
    start_max = max(1, length - drop_length_high)
    starts = jax.random.randint(k_s, (max_drops,), 0, start_max)

    t = jnp.arange(length)
    active = (jnp.arange(max_drops) < n_drops)[:, None]
    in_span = (t[None, :] >= starts[:, None]) & (t[None, :] < (starts + lens)[:, None])
    dropped = jnp.any(in_span & active, axis=0)
    y = x * (1.0 - dropped.astype(x.dtype))
    skip = jax.random.uniform(k_p, ()) > drop_prob
    return jnp.where(skip, x, y)


def do_clip(key, x: jax.Array, clip_low=0.5, clip_high=1.0, clip_prob=0.5):
    """Random symmetric clamp (augment.py:729-787)."""
    k_p, k_v = jax.random.split(key)
    clip = jax.random.uniform(k_v, ()) * (clip_high - clip_low) + clip_low
    y = jnp.clip(x, -clip, clip)
    skip = jax.random.uniform(k_p, ()) > clip_prob
    return jnp.where(skip, x, y)


def extend_noise(noise: np.ndarray, target_len: int, sr: int = 16000) -> np.ndarray:
    """Loop short noise with a Hann crossfade (augment.py:103-128).

    Host-side numpy (runs during item prep where lengths are dynamic).
    """
    if len(noise) >= target_len:
        return noise
    window = np.hanning(sr + 1).astype(np.float32)
    if len(noise) < sr + 1:
        gs = np.random.default_rng(0).standard_normal(sr + 1).astype(np.float32)
        gs[: len(noise)] += noise
        noise = gs
    i_w = window[: len(window) // 2 + 1]
    d_w = i_w[::-1]
    out = noise
    while len(out) < target_len:
        head = out[: len(out) - len(d_w)]
        fade = out[len(out) - len(d_w):] * d_w + noise[: len(i_w)] * i_w
        out = np.concatenate([head, fade, noise[len(i_w):]])
    return out


def add_reverb(key, x: jax.Array, rir: jax.Array, reverb_prob: float = 1.0):
    """Convolve with a measured RIR, peak-aligned, amplitude-rescaled
    (augment.py:131-180 / speechbrain reverberate, rescale_amp='avg').

    x: [..., L]; rir: [R]. Not used in the reference's active path
    (data_c.py:219-220 commented) but part of the augmenter inventory.
    """
    from semi_tpu.data.rir import fft_convolve

    k_p = key
    orig_amp = compute_amplitude(x)
    # align the direct path: shift so the RIR peak hits lag zero
    peak = jnp.argmax(jnp.abs(rir))
    length = x.shape[-1]
    wet = fft_convolve(x, rir[None] if x.ndim > 1 else rir)
    wet = jnp.roll(wet, -peak, axis=-1)
    wet = wet * (orig_amp / (compute_amplitude(wet) + 1e-14))
    skip = jax.random.uniform(k_p, ()) > reverb_prob
    return jnp.where(skip, x, wet[..., :length])


SPEEDS = (90, 95, 105, 110)


def speed_perturb(x: jax.Array, speed: int, orig_freq: int = 16000) -> jax.Array:
    """Resample to ``orig_freq * speed / 100`` (augment.py:183-230).

    ``speed`` is STATIC (host-sampled); output length differs per speed,
    so each speed compiles its own variant (4 total).
    """
    new_freq = orig_freq * speed // 100
    g = math.gcd(orig_freq, new_freq)
    return resample_poly(x, new_freq // g, orig_freq // g)
