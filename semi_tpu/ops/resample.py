"""Polyphase sinc resampling as a single dilated convolution.

TPU-native replacement for the reference's two resamplers: torchaudio's
``Resample`` used inside the STOI loss (utility.py:860) and the
Kaldi-style polyphase speed perturbation (augment.py:234-544). Both are
windowed-sinc low-pass interpolators; here the up/down conversion is
one ``lax.conv_general_dilated`` with ``lhs_dilation=up`` and
``window_strides=down`` — a form XLA pipelines well — with a
Hann-windowed sinc kernel (lowpass_filter_width zero crossings,
rolloff-scaled cutoff).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample_kernel", "resample_poly", "resampled_length"]


@functools.lru_cache(maxsize=32)
def _kernel_np(up: int, down: int, width: int, rolloff: float) -> np.ndarray:
    """Windowed-sinc low-pass at the upsampled rate, scaled by ``up``."""
    cutoff = rolloff * 0.5 / max(up, down)  # cycles/sample at rate fs*up
    half = int(math.ceil(width / (2.0 * cutoff)))
    n = np.arange(-half, half + 1, dtype=np.float64)
    sinc = 2.0 * cutoff * np.sinc(2.0 * cutoff * n)
    win = np.hanning(2 * half + 1 + 2)[1:-1]  # open Hann window
    return (up * sinc * win).astype(np.float32)


def resample_kernel(up: int, down: int, width: int = 6, rolloff: float = 0.99):
    return jnp.asarray(_kernel_np(up, down, width, rolloff))


def resampled_length(length: int, up: int, down: int) -> int:
    return int(math.ceil(length * up / down))


def resample_poly(x: jax.Array, up: int, down: int, width: int = 6,
                  rolloff: float = 0.99) -> jax.Array:
    """Resample ``x[..., L]`` by ``up/down``; output ``[..., ceil(L*up/down)]``."""
    if up == down:
        return x
    g = math.gcd(up, down)
    up, down = up // g, down // g
    k = resample_kernel(up, down, width, rolloff)
    half = (k.shape[0] - 1) // 2

    lead = x.shape[:-1]
    length = x.shape[-1]
    out_len = resampled_length(length, up, down)
    xf = x.reshape((-1, 1, length))
    # Align output sample i at input time i*down/up: left-pad by `half`
    # at the upsampled rate, right-pad enough to cover the last output.
    total_up = (out_len - 1) * down + k.shape[0]
    right = max(0, total_up - half - ((length - 1) * up + 1))
    y = jax.lax.conv_general_dilated(
        xf, k.reshape(1, 1, -1),
        window_strides=(down,),
        padding=((half, right),),
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y[:, 0, :out_len].reshape(lead + (out_len,))
