"""Materialize a FIXED on-disk corpus + CSV manifests for parity runs.

The reference trains on LibriParty-style CSV manifests of clean/noise
wavs (reference: data_c.py:18-60, config.yaml dataset section); that
corpus ("Chinese_data") is not distributable. This tool synthesizes a
fixed, disjoint train/dev/test corpus of speech-like utterances and
shaped-noise files, writes them as 16-bit wavs, and emits manifests in
the exact schema `LibriPartyDataset._load_manifests` consumes — so
training/eval exercise the full CSV → wav-decode → dynamic-mix path
end-to-end, and the test split is a FIXED held-out set rather than
re-sampled synthetic audio.

The clean generator is a richer voice model than the dataset's hermetic
fallback (`_synthetic_clean`): pitch-drifting glottal harmonics shaped
by 3 random formant resonators, interleaved consonant noise bursts, and
syllabic gating. Splits use disjoint seed ranges.

    python tools/generate_corpus.py --out_dir data/corpus \
        --train_clean 2000 --train_noise 300

Writes ./data/*.csv matching config.yaml's manifest paths when
--csv_dir data is given (default).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.signal import lfilter

FS = 16000


def _formant_filter(rng: np.random.Generator, x: np.ndarray) -> np.ndarray:
    """Cascade of 3 random two-pole resonators (vowel-tract stand-in)."""
    out = x
    for lo, hi in ((250, 850), (850, 2400), (2200, 3400)):
        f = rng.uniform(lo, hi)
        bw = rng.uniform(60, 160)
        r = np.exp(-np.pi * bw / FS)
        theta = 2 * np.pi * f / FS
        a = [1.0, -2 * r * np.cos(theta), r * r]
        out = lfilter([1.0 - r], a, out)
    return out.astype(np.float32)


def synth_speech(rng: np.random.Generator, length: int) -> np.ndarray:
    """Speech-like utterance: voiced syllables + consonant bursts."""
    t = np.arange(length) / FS
    # pitch: male/female register, slow contour + jitter
    f0_base = rng.choice([rng.uniform(85, 155), rng.uniform(165, 255)])
    contour = 1.0 + 0.15 * np.sin(2 * np.pi * rng.uniform(0.2, 0.9) * t +
                                  rng.uniform(0, 2 * np.pi))
    jitter = 1.0 + 0.01 * rng.standard_normal(length)
    phase = 2 * np.pi * np.cumsum(f0_base * contour * jitter) / FS
    # glottal source: decaying harmonic comb
    voiced = np.zeros(length, np.float32)
    for h in range(1, 12):
        voiced += (1.0 / h) * np.sin(h * phase).astype(np.float32)
    voiced = _formant_filter(rng, voiced)

    # syllabic gate at 2-5 Hz with soft edges
    rate = rng.uniform(2.0, 5.0)
    gate = (np.sin(2 * np.pi * rate * t + rng.uniform(0, 2 * np.pi)) >
            rng.uniform(-0.9, -0.3)).astype(np.float32)
    k = np.hanning(321).astype(np.float32)
    gate = np.convolve(gate, k / k.sum(), mode="same")
    sig = voiced * gate

    # consonant bursts: short filtered-noise transients at syllable edges
    n_bursts = int(length / FS * rng.uniform(1.0, 4.0))
    for _ in range(n_bursts):
        pos = int(rng.integers(0, max(1, length - 800)))
        dur = min(int(rng.uniform(0.02, 0.08) * FS), length - pos)
        burst = rng.standard_normal(dur).astype(np.float32)
        hp = lfilter([1, -0.97], [1], burst).astype(np.float32)
        env = np.exp(-np.arange(dur) / (0.25 * dur)).astype(np.float32)
        sig[pos:pos + dur] += rng.uniform(0.1, 0.5) * hp * env

    # pause structure: zero out 0-2 random gaps
    for _ in range(int(rng.integers(0, 3))):
        pos = int(rng.integers(0, max(1, length - FS // 2)))
        gap = int(rng.uniform(0.1, 0.4) * FS)
        sig[pos:pos + gap] *= np.linspace(1, 0, gap, dtype=np.float32) ** 2

    peak = np.abs(sig).max() + 1e-8
    return (rng.uniform(0.15, 0.5) * sig / peak).astype(np.float32)


def synth_noise(rng: np.random.Generator, length: int) -> np.ndarray:
    """Stationary + nonstationary noise mixture."""
    kind = rng.integers(0, 4)
    white = rng.standard_normal(length).astype(np.float32)
    if kind == 0:  # pink-ish
        sig = lfilter([0.05], [1, -0.98], white)
    elif kind == 1:  # band-limited hum + hiss
        f = rng.uniform(80, 400)
        sig = (0.6 * np.sin(2 * np.pi * f * np.arange(length) / FS) +
               0.4 * white)
    elif kind == 2:  # amplitude-modulated babble-ish
        k = np.exp(-np.arange(128) / rng.uniform(4.0, 48.0)).astype(np.float32)
        shaped = np.convolve(white, k / k.sum(), mode="same")
        am = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(0.5, 3.0) *
                               np.arange(length) / FS))
        sig = shaped * am
    else:  # impulsive clatter over hiss
        sig = 0.2 * white
        for _ in range(int(length / FS * rng.uniform(0.5, 3.0))):
            pos = int(rng.integers(0, max(1, length - 1600)))
            dur = int(rng.uniform(0.01, 0.1) * FS)
            env = np.exp(-np.arange(dur) / (0.2 * dur))
            sig[pos:pos + dur] += rng.uniform(0.5, 2.0) * \
                rng.standard_normal(dur) * env
    sig = np.asarray(sig, np.float32)
    return (0.4 * sig / (np.abs(sig).max() + 1e-8)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="data/corpus")
    ap.add_argument("--csv_dir", default="data")
    ap.add_argument("--train_clean", type=int, default=2000)
    ap.add_argument("--train_noise", type=int, default=300)
    ap.add_argument("--dev_clean", type=int, default=200)
    ap.add_argument("--dev_noise", type=int, default=50)
    ap.add_argument("--test_clean", type=int, default=300)
    ap.add_argument("--test_noise", type=int, default=60)
    args = ap.parse_args()

    from semi_tpu.data.wav import write_wav

    os.makedirs(args.csv_dir, exist_ok=True)
    splits = {
        "train": (args.train_clean, args.train_noise, 1000),
        "dev": (args.dev_clean, args.dev_noise, 2000),
        "test": (args.test_clean, args.test_noise, 3000),
    }
    # manifest filenames match config.yaml's dataset section
    csv_names = {
        ("train", "clean"): "final_train.csv",
        ("train", "noise"): "final_train_noise.csv",
        ("dev", "clean"): "final_dev.csv",
        ("dev", "noise"): "final_dev_noise.csv",
        ("test", "clean"): "final_test.csv",
        ("test", "noise"): "DNS_test_noise.csv",
    }
    for split, (n_clean, n_noise, seed0) in splits.items():
        for kind, n in (("clean", n_clean), ("noise", n_noise)):
            d = os.path.join(args.out_dir, split, kind)
            os.makedirs(d, exist_ok=True)
            paths = []
            for i in range(n):
                rng = np.random.default_rng(
                    np.random.SeedSequence([seed0, i, hash(kind) & 0xFFFF]))
                if kind == "clean":
                    length = int(rng.uniform(2.0, 6.0) * FS)
                    wav = synth_speech(rng, length)
                else:
                    length = int(rng.uniform(8.0, 15.0) * FS)
                    wav = synth_noise(rng, length)
                p = os.path.abspath(os.path.join(d, f"{split}_{kind}_{i:05d}.wav"))
                write_wav(p, wav, FS)
                paths.append(p)
            csv_path = os.path.join(args.csv_dir, csv_names[(split, kind)])
            with open(csv_path, "w") as f:
                f.write("path\n")
                f.writelines(p + "\n" for p in paths)
            print(f"{split}/{kind}: {n} files -> {csv_path}", flush=True)


if __name__ == "__main__":
    main()
