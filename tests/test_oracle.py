"""Oracle-cIRM ceiling eval (tools/eval_oracle.py).

The oracle mask built from ground truth, passed through the same
compress/decompress codec as every model's predicted mask, must nearly
recover the clean signal on an easy mixture — and the exact ratio mask
must recover it to STFT round-trip precision. This pins the tool that
anchors the "fraction of oracle" honesty analysis in BENCHMARKS.md.
"""

import os
import sys

import numpy as np

from semi_tpu.metrics.eval import si_sdr

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from eval_oracle import oracle_enhance  # noqa: E402


def _mixture(snr_db: float = 0.0, n: int = 16000, seed: int = 0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    clean = np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    clean = clean.astype(np.float32)
    noise = rng.normal(size=n).astype(np.float32)
    noise *= np.linalg.norm(clean) / np.linalg.norm(noise) * 10 ** (-snr_db / 20)
    return clean, (clean + noise).astype(np.float32)


def test_oracle_cirm_near_ceiling():
    clean, noisy = _mixture(snr_db=0.0)
    enh = oracle_enhance(noisy, clean, clamp=True)
    assert enh.shape == noisy.shape
    base = si_sdr(clean, noisy)
    got = si_sdr(clean, enh)
    # 0 dB in -> the clamped oracle recovers a large margin
    assert base < 1.0
    assert got > base + 15.0


def test_exact_ratio_mask_is_stft_roundtrip():
    clean, noisy = _mixture(snr_db=-5.0, seed=1)
    enh = oracle_enhance(noisy, clean, clamp=False)
    # exact mask == clean spectrum; only OLA edges differ
    assert si_sdr(clean, enh) > 40.0


def test_clamp_costs_at_most_a_little():
    """The ±9.9 codec clamp binds only where |mask| is huge; on a real
    mixture the clamped oracle tracks the exact one closely."""
    clean, noisy = _mixture(snr_db=5.0, seed=2)
    e1 = oracle_enhance(noisy, clean, clamp=True)
    e2 = oracle_enhance(noisy, clean, clamp=False)
    assert si_sdr(clean, e1) > si_sdr(clean, e2) - 25.0
