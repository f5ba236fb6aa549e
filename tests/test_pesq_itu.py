"""Independent PESQ oracle (semi_tpu/metrics/pesq_itu.py).

Pins the properties that distinguish the oracle from the training
approximation (VERDICT.md missing #3): MOS-LQO output range, time-
alignment invariance, level invariance, and SNR monotonicity.
"""

import numpy as np
import pytest

from semi_tpu.metrics.pesq_itu import align_delay, pesq_nb, pesq_wb


def _speech(seed=0, n=48000, fs=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * t))
    ph = 2 * np.pi * np.cumsum(f0) / fs
    sig = sum(np.sin(h * ph) / h for h in range(1, 8))
    sig *= 0.5 * (1 + np.sin(2 * np.pi * 3 * t)) * 0.3
    return sig + 0.01 * rng.standard_normal(n)


def _noisy(clean, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(len(clean))
    k = np.exp(-np.arange(64) / 16.0)
    w = np.convolve(w, k / k.sum(), mode="same")
    w *= np.linalg.norm(clean) / np.linalg.norm(w) / 10 ** (snr_db / 20)
    return clean + w


def test_identical_scores_ceiling():
    c = _speech()
    assert pesq_wb(c, c) > 4.5
    assert pesq_nb(c, c) > 4.0


def test_mos_lqo_range():
    c = _speech()
    for snr in (30, 10, -5):
        s = pesq_wb(c, _noisy(c, snr))
        assert 1.0 <= s <= 4.65


def test_snr_monotonic():
    c = _speech()
    scores = [pesq_wb(c, _noisy(c, snr)) for snr in (40, 25, 10)]
    assert scores[0] > scores[1] >= scores[2]


def test_time_alignment_invariance():
    """A delayed copy must score the ceiling — the property the
    frame-synchronous training approximation does NOT have."""
    c = _speech()
    for d in (32, 128, 400):
        shifted = np.concatenate([np.zeros(d), c])[: len(c)]
        assert pesq_wb(c, shifted) > 4.5
    assert align_delay(c, np.concatenate([np.zeros(128), c])) == 128


def test_level_invariance():
    c = _speech()
    deg = _noisy(c, 20)
    base = pesq_wb(c, deg)
    assert abs(pesq_wb(c, deg * 0.1) - base) < 0.05
    assert abs(pesq_wb(c * 3.0, deg) - base) < 0.05


def test_independent_of_training_loss():
    """The oracle module must not touch semi_tpu.metrics.losses."""
    import ast
    import semi_tpu.metrics.pesq_itu as mod

    tree = ast.parse(open(mod.__file__).read())
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            names = [a.name for a in node.names]
            mods = [getattr(node, "module", "") or ""] + names
            assert not any("losses" in m for m in mods), (
                "pesq_itu must stay independent of the training loss")


def test_degenerate_short_input():
    c = _speech(n=256)
    assert 1.0 <= pesq_wb(c, c) <= 4.65
