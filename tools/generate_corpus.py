"""Materialize a FIXED on-disk corpus + CSV manifests for parity runs.

The reference trains on LibriParty-style CSV manifests of clean/noise
wavs (reference: data_c.py:18-60, config.yaml dataset section); that
corpus ("Chinese_data") is not distributable. This tool synthesizes a
fixed, disjoint train/dev/test corpus of speech-like utterances and
noise files, writes them as 16-bit wavs, and emits manifests in the
exact schema `LibriPartyDataset._load_manifests` consumes — so
training/eval exercise the full CSV → wav-decode → dynamic-mix path
end-to-end, and the test split is a FIXED held-out set rather than
re-sampled synthetic audio.

Corpus v2 (round 3). The round-2 corpus was too easy to discriminate
enhancement quality on: sparse tonal voices against dense noise meant
the amplitude-convention SNR mixing (reference augment.py:29-77,
speechbrain form — a pinned quirk) realized ~+12.7 dB above nominal in
the power domain, leaving the noisy baseline at STOI 0.96 / SI-SDR
+23 dB — saturated (VERDICT round-2 missing #1). v2 targets the
reference's operating point (noisy STOI ≈ 0.80-0.90, PESQ ≈ 1.3-1.8,
SI-SDR ≈ 5-12 dB at the same nominal 0-25 dB test range) by fixing the
corpus audio, not the pinned mixing convention:

- **dense voicing**: continuous glottal excitation with syllabic
  amplitude modulation that never gates to zero mid-phrase, a breathy
  aspiration floor, and at most one short pause — the crest factor of
  real connected speech instead of beeps with silence;
- **time-varying vowels**: formant targets interpolate every syllable,
  spreading energy across third-octave bands (what STOI scores);
- **babble noise**: half the noise files are a sum of detuned voices
  from the same synthesizer — crest factor and spectrum MATCH speech,
  so amplitude-SNR ≈ power-SNR and the masking is spectrally
  competitive (the other kinds: pink, hum+hiss, AM babble-ish,
  impulsive clatter).

Reproducibility (VERDICT round-2 missing #3): seeds derive from a
STABLE split/kind tag (zlib.crc32), never python's salted ``hash()``;
manifests are written with paths RELATIVE to the csv dir (portable,
committable); a ``corpus_fingerprint.json`` with per-file sha256 of the
wav bytes is written next to the manifests so a fresh checkout can
verify bit-identical regeneration.

    python tools/generate_corpus.py --out_dir data/corpus \
        --train_clean 2000 --train_noise 300

Writes ./data/*.csv matching config.yaml's manifest paths when
--csv_dir data is given (default).
"""

import argparse
import hashlib
import json
import os
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.signal import lfilter

FS = 16000

# vowel formant targets (F1, F2, F3) — coarse /a e i o u/ grid
VOWELS = (
    (730, 1090, 2440),
    (530, 1840, 2480),
    (270, 2290, 3010),
    (570, 840, 2410),
    (300, 870, 2240),
)


def _resonator(f: float, bw: float, x: np.ndarray) -> np.ndarray:
    r = np.exp(-np.pi * bw / FS)
    theta = 2 * np.pi * f / FS
    a = [1.0, -2 * r * np.cos(theta), r * r]
    return lfilter([1.0 - r], a, x)


def _tract_filter(rng: np.random.Generator, x: np.ndarray,
                  syl_rate: float, fscale: float = 1.0,
                  bwscale: float = 1.0) -> np.ndarray:
    """Time-varying vowel tract: formants interpolate between random
    vowel targets each 'syllable', jittered ±10%. Piecewise-constant
    filtering per 40 ms block keeps lfilter usable (state carried).

    ``fscale``/``bwscale`` (corpus v3): per-SPEAKER vocal-tract-length
    and bandwidth factors applied to the formant grid. Defaults of 1.0
    preserve the v2 path bit-for-bit (no extra rng draws)."""
    length = len(x)
    block = 640  # 40 ms
    n_blocks = (length + block - 1) // block
    syl_len = max(1, int(FS / syl_rate / block))  # blocks per syllable
    # vowel index per syllable, linear interpolation of formants per block
    n_syl = n_blocks // syl_len + 2
    targets = np.array([VOWELS[int(rng.integers(len(VOWELS)))]
                        for _ in range(n_syl)], np.float64)
    targets *= rng.uniform(0.9, 1.1, size=targets.shape)
    targets *= fscale
    out = np.zeros(length, np.float64)
    zis = [None, None, None]
    for b in range(n_blocks):
        pos = b / syl_len
        i0 = min(int(pos), n_syl - 2)
        w = pos - i0
        fmts = (1 - w) * targets[i0] + w * targets[i0 + 1]
        seg = x[b * block:(b + 1) * block]
        acc = seg
        for j, (f, bw) in enumerate(zip(fmts, (90.0 * bwscale,
                                               110.0 * bwscale,
                                               170.0 * bwscale))):
            r = np.exp(-np.pi * bw / FS)
            theta = 2 * np.pi * f / FS
            a = [1.0, -2 * r * np.cos(theta), r * r]
            bcoef = [1.0 - r]
            if zis[j] is None:
                zis[j] = np.zeros(2)
            acc, zis[j] = lfilter(bcoef, a, acc, zi=zis[j])
        out[b * block:(b + 1) * block] = acc
    return out.astype(np.float32)


def synth_speech(rng: np.random.Generator, length: int) -> np.ndarray:
    """Connected-speech-like utterance: dense voicing, moving vowels,
    aspiration floor, consonant bursts, at most one short pause."""
    t = np.arange(length) / FS
    f0_base = rng.choice([rng.uniform(85, 155), rng.uniform(165, 255)])
    contour = 1.0 + 0.15 * np.sin(2 * np.pi * rng.uniform(0.2, 0.9) * t +
                                  rng.uniform(0, 2 * np.pi))
    jitter = 1.0 + 0.01 * rng.standard_normal(length)
    phase = 2 * np.pi * np.cumsum(f0_base * contour * jitter) / FS
    # glottal source: decaying harmonic comb with DISPERSED phases (a
    # zero-phase comb is an impulse train whose crest factor inflates
    # the amplitude-convention SNR) + aspiration noise floor
    voiced = np.zeros(length, np.float32)
    for h in range(1, 16):
        voiced += (1.0 / h) * np.sin(
            h * phase + rng.uniform(0, 2 * np.pi)).astype(np.float32)
    asp = lfilter([1, -0.95], [1], rng.standard_normal(length))
    source = voiced + 0.2 * np.asarray(asp, np.float32)

    syl_rate = rng.uniform(2.5, 5.0)
    sig = _tract_filter(rng, source.astype(np.float64), syl_rate)

    # syllabic amplitude modulation: dips, never full gating
    depth = rng.uniform(0.1, 0.3)
    am = 1.0 - depth * 0.5 * (1 + np.sin(
        2 * np.pi * syl_rate * t + rng.uniform(0, 2 * np.pi)))
    slow = 0.85 + 0.15 * np.sin(2 * np.pi * rng.uniform(0.15, 0.5) * t +
                                rng.uniform(0, 2 * np.pi))
    sig = sig * (am * slow).astype(np.float32)

    # consonant bursts at ~syllable rate
    n_bursts = int(length / FS * rng.uniform(2.0, 5.0))
    for _ in range(n_bursts):
        pos = int(rng.integers(0, max(1, length - 800)))
        dur = min(int(rng.uniform(0.02, 0.08) * FS), length - pos)
        burst = rng.standard_normal(dur).astype(np.float32)
        hp = lfilter([1, -0.97], [1], burst).astype(np.float32)
        env = np.exp(-np.arange(dur) / (0.25 * dur)).astype(np.float32)
        sig[pos:pos + dur] += rng.uniform(0.1, 0.4) * hp * env * \
            np.abs(sig[pos:pos + dur]).mean() / 0.05

    # at most one brief pause (breath), cosine-tapered
    if rng.uniform() < 0.25:
        pos = int(rng.integers(FS // 2, max(FS // 2 + 1, length - FS // 2)))
        gap = int(rng.uniform(0.08, 0.2) * FS)
        end = min(pos + gap, length)
        w = 0.5 * (1 + np.cos(np.linspace(0, 2 * np.pi, end - pos)))
        sig[pos:end] *= (1 - 0.95 * w).astype(np.float32)

    # mild power-law companding (broadcast-style level compression, as
    # recorded corpora typically have): lowers the crest factor so the
    # amplitude-convention SNR mixing realizes near-nominal power SNR
    peak = np.abs(sig).max() + 1e-8
    sig = np.sign(sig) * np.abs(sig / peak) ** 0.6
    peak = np.abs(sig).max() + 1e-8
    return (rng.uniform(0.3, 0.7) * sig / peak).astype(np.float32)


# -- corpus v3: speaker-keyed voices -----------------------------------
#
# Round-3 verdict: the whole remaining quality gap is target IDENTITY
# under same-synthesizer babble, and the round-3 speaker-conditioning
# result rested on self-enrollment (target leakage) because v2 has one
# utterance per voice. v3 makes voice identity a STABLE property of a
# per-speaker parameter vector so each speaker contributes >=2
# utterances and enrollment can come from a DIFFERENT utterance of the
# target speaker (deployable conditioning, zero leakage).
#
# Identity lives in long-term-average-spectrum attributes a time-pooled
# log-magnitude encoder can measure: f0 register, vocal-tract length
# (formant scale), spectral tilt of the glottal comb, aspiration level,
# bandwidth scale — plus prosodic tendencies (syllable rate, AM depth).
# Utterance-level realization (vowel sequence, contour phase, bursts,
# pauses) stays random per utterance, so two utterances of one speaker
# share identity but not content.

def draw_voice(rng: np.random.Generator) -> dict:
    """Per-speaker identity parameters, drawn once per speaker."""
    low_register = rng.uniform() < 0.5
    return {
        "f0": float(rng.uniform(80, 160) if low_register
                    else rng.uniform(165, 260)),
        "fscale": float(rng.uniform(0.80, 1.28)),   # vocal tract length
        "bwscale": float(rng.uniform(0.75, 1.3)),
        "tilt": float(rng.uniform(0.7, 1.6)),       # harmonic decay 1/h^tilt
        "asp": float(rng.uniform(0.05, 0.4)),       # aspiration floor
        "syl": float(rng.uniform(2.8, 4.6)),        # syllable rate mean
        "depth": float(rng.uniform(0.1, 0.3)),      # AM depth mean
        "jitter": float(rng.uniform(0.005, 0.02)),
        "compand": float(rng.uniform(0.5, 0.7)),
        "contour": float(rng.uniform(0.08, 0.2)),   # f0 contour depth
    }


def synth_speech_v3(rng: np.random.Generator, length: int,
                    voice: dict) -> np.ndarray:
    """Connected-speech utterance in a FIXED speaker's voice.

    Same synthesis stages as :func:`synth_speech` (dense voicing,
    moving vowels, bursts, <=1 pause, companding) with the identity
    attributes pinned to ``voice`` and only realization drawn from
    ``rng`` (small per-utterance drift around the speaker means)."""
    t = np.arange(length) / FS
    f0_base = voice["f0"] * rng.uniform(0.97, 1.03)
    contour = 1.0 + voice["contour"] * np.sin(
        2 * np.pi * rng.uniform(0.2, 0.9) * t + rng.uniform(0, 2 * np.pi))
    jitter = 1.0 + voice["jitter"] * rng.standard_normal(length)
    phase = 2 * np.pi * np.cumsum(f0_base * contour * jitter) / FS
    voiced = np.zeros(length, np.float32)
    for h in range(1, 16):
        voiced += (1.0 / h ** voice["tilt"]) * np.sin(
            h * phase + rng.uniform(0, 2 * np.pi)).astype(np.float32)
    asp = lfilter([1, -0.95], [1], rng.standard_normal(length))
    source = voiced + voice["asp"] * np.asarray(asp, np.float32)

    syl_rate = voice["syl"] * rng.uniform(0.85, 1.15)
    sig = _tract_filter(rng, source.astype(np.float64), syl_rate,
                        fscale=voice["fscale"], bwscale=voice["bwscale"])

    depth = voice["depth"] * rng.uniform(0.8, 1.2)
    am = 1.0 - depth * 0.5 * (1 + np.sin(
        2 * np.pi * syl_rate * t + rng.uniform(0, 2 * np.pi)))
    slow = 0.85 + 0.15 * np.sin(2 * np.pi * rng.uniform(0.15, 0.5) * t +
                                rng.uniform(0, 2 * np.pi))
    sig = sig * (am * slow).astype(np.float32)

    n_bursts = int(length / FS * rng.uniform(2.0, 5.0))
    for _ in range(n_bursts):
        pos = int(rng.integers(0, max(1, length - 800)))
        dur = min(int(rng.uniform(0.02, 0.08) * FS), length - pos)
        burst = rng.standard_normal(dur).astype(np.float32)
        hp = lfilter([1, -0.97], [1], burst).astype(np.float32)
        env = np.exp(-np.arange(dur) / (0.25 * dur)).astype(np.float32)
        sig[pos:pos + dur] += rng.uniform(0.1, 0.4) * hp * env * \
            np.abs(sig[pos:pos + dur]).mean() / 0.05

    if rng.uniform() < 0.25:
        pos = int(rng.integers(FS // 2, max(FS // 2 + 1, length - FS // 2)))
        gap = int(rng.uniform(0.08, 0.2) * FS)
        end = min(pos + gap, length)
        w = 0.5 * (1 + np.cos(np.linspace(0, 2 * np.pi, end - pos)))
        sig[pos:end] *= (1 - 0.95 * w).astype(np.float32)

    peak = np.abs(sig).max() + 1e-8
    sig = np.sign(sig) * np.abs(sig / peak) ** voice["compand"]
    peak = np.abs(sig).max() + 1e-8
    return (rng.uniform(0.3, 0.7) * sig / peak).astype(np.float32)


def synth_noise_v3(rng: np.random.Generator, length: int) -> np.ndarray:
    """v3 noise inventory: same kinds as :func:`synth_noise`, but babble
    talkers are RANDOM v3 speakers — spectrally matched to the v3 clean
    distribution while (almost surely) distinct from any target voice,
    so enrollment identity is the only cue separating target from
    babble."""
    kind = rng.integers(0, 8)
    white = rng.standard_normal(length).astype(np.float32)
    if kind < 3:
        sig = synth_impulse_train(rng, length)
    elif kind < 6:  # continuous babble, 2-5 random v3 voices
        sig = np.zeros(length, np.float32)
        for _ in range(int(rng.integers(2, 6))):
            sig += synth_speech_v3(rng, length, draw_voice(rng)) * \
                rng.uniform(0.5, 1.0)
    elif kind == 6:
        k = np.exp(-np.arange(128) / rng.uniform(4.0, 48.0)).astype(np.float32)
        shaped = np.convolve(white, k / k.sum(), mode="same")
        am = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2.0, 8.0) *
                               np.arange(length) / FS))
        sig = shaped * (0.3 + 0.7 * am)
    else:
        sig = lfilter([0.05], [1, -0.98], white)
    sig = np.asarray(sig, np.float32)
    return (0.4 * sig / (np.abs(sig).max() + 1e-8)).astype(np.float32)


def synth_talkers(rng: np.random.Generator, length: int,
                  n_lo: int, n_hi: int) -> np.ndarray:
    """Continuous competing-talker babble from the same voice
    synthesizer — crest factor and spectrum MATCH speech, so the
    amplitude-convention mixing realizes near-nominal power SNR and
    the masking is spectrally competitive."""
    sig = np.zeros(length, np.float32)
    for _ in range(int(rng.integers(n_lo, n_hi + 1))):
        sig += synth_speech(rng, length) * rng.uniform(0.5, 1.0)
    return sig


def synth_impulse_train(rng: np.random.Generator, length: int) -> np.ndarray:
    """Rain/typing/applause-like noise: dense Poisson impulse train over
    a quiet hiss bed.

    The masker that makes the amplitude-convention mixing bite: crest
    factor is HIGH at the sample level (so ``add_noise`` scales it to
    high power at a given nominal SNR) while the impulses are DENSE at
    the 384 ms envelope scale STOI scores (so, unlike pause-y maskers,
    no analysis segment is left clean). Long-pause maskers were tried
    and *raised* noisy STOI — clean segments score 1.0."""
    rate = rng.uniform(15.0, 60.0)  # impulses per second
    n_imp = int(length / FS * rate)
    sig = 0.03 * rng.standard_normal(length).astype(np.float32)
    bp_a = rng.uniform(0.3, 0.9)  # per-file spectral tilt of the bursts
    for _ in range(n_imp):
        pos = int(rng.integers(0, max(1, length - 1600)))
        dur = int(rng.uniform(0.003, 0.05) * FS)
        env = np.exp(-np.arange(dur) / (0.25 * dur)).astype(np.float32)
        burst = rng.standard_normal(dur).astype(np.float32)
        burst = lfilter([1.0, -bp_a], [1.0], burst).astype(np.float32)
        sig[pos:pos + dur] += rng.uniform(0.4, 1.5) * burst * env
    return sig


def synth_noise(rng: np.random.Generator, length: int) -> np.ndarray:
    """Noise inventory: impulse trains / babble / modulated / stationary."""
    kind = rng.integers(0, 8)
    white = rng.standard_normal(length).astype(np.float32)
    if kind < 3:  # dense impulse train — high crest, envelope-dense
        sig = synth_impulse_train(rng, length)
    elif kind < 6:  # continuous babble, 2-5 talkers
        sig = synth_talkers(rng, length, 2, 5)
    elif kind == 6:  # syllable-rate AM shaped hiss (envelope-corrupting)
        k = np.exp(-np.arange(128) / rng.uniform(4.0, 48.0)).astype(np.float32)
        shaped = np.convolve(white, k / k.sum(), mode="same")
        am = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2.0, 8.0) *
                               np.arange(length) / FS))
        sig = shaped * (0.3 + 0.7 * am)
    else:  # pink-ish (stationary, the easy end)
        sig = lfilter([0.05], [1, -0.98], white)
    sig = np.asarray(sig, np.float32)
    return (0.4 * sig / (np.abs(sig).max() + 1e-8)).astype(np.float32)


def stable_tag(s: str) -> int:
    """Process-stable string tag (python hash() is salted — the exact
    bug class fixed in dataset.py:207-217, VERDICT round-2 missing #3)."""
    return zlib.crc32(s.encode()) & 0xFFFF


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
    ap.add_argument("--version", type=int, default=2, choices=(2, 3),
                    help="2: one random voice per utterance (round-3 "
                         "committed corpus); 3: speaker-keyed voices, "
                         "spk_utts utterances per speaker, spk column "
                         "in the clean manifests")
    ap.add_argument("--spk_utts", type=int, default=8,
                    help="v3: utterances per speaker (train; dev/test "
                         "use min(spk_utts, 4))")
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
    v3 = args.version == 3
    fingerprint = {"version": args.version, "files": {}}
    if v3:
        # record the exact regeneration args so ensure_corpus can replay
        # them (one guard serves v2 and v3 corpora side by side)
        fingerprint["sizes"] = {}
        fingerprint["generator_args"] = [
            "--version", "3", "--spk_utts", str(args.spk_utts),
            "--train_clean", str(args.train_clean),
            "--train_noise", str(args.train_noise),
            "--dev_clean", str(args.dev_clean),
            "--dev_noise", str(args.dev_noise),
            "--test_clean", str(args.test_clean),
            "--test_noise", str(args.test_noise)]
    for split, (n_clean, n_noise, seed0) in splits.items():
        for kind, n in (("clean", n_clean), ("noise", n_noise)):
            d = os.path.join(args.out_dir, split, kind)
            os.makedirs(d, exist_ok=True)
            relpaths = []
            spk_ids = []
            if v3 and kind == "clean":
                # speaker-keyed: n = n_spk * utts utterances; voice
                # parameters drawn ONCE per speaker, content per utterance
                utts = args.spk_utts if split == "train" \
                    else min(args.spk_utts, 4)
                n_spk = max(1, n // utts)
                items = [(s, u) for s in range(n_spk) for u in range(utts)]
            else:
                items = [(i, None) for i in range(n)]
            for s, u in items:
                if v3:
                    if kind == "clean":
                        v_rng = np.random.default_rng(np.random.SeedSequence(
                            [seed0, s, stable_tag("voice"), 3]))
                        rng = np.random.default_rng(np.random.SeedSequence(
                            [seed0, s, u, stable_tag(kind), 3]))
                        length = int(rng.uniform(2.0, 6.0) * FS)
                        wav = synth_speech_v3(rng, length, draw_voice(v_rng))
                        name = f"{split}_clean_s{s:04d}_u{u:02d}.wav"
                        spk_ids.append(f"{split}_s{s:04d}")
                    else:
                        rng = np.random.default_rng(np.random.SeedSequence(
                            [seed0, s, stable_tag(kind), 3]))
                        length = int(rng.uniform(8.0, 15.0) * FS)
                        wav = synth_noise_v3(rng, length)
                        name = f"{split}_{kind}_{s:05d}.wav"
                else:
                    rng = np.random.default_rng(np.random.SeedSequence(
                        [seed0, s, stable_tag(kind), 2]))
                    if kind == "clean":
                        length = int(rng.uniform(2.0, 6.0) * FS)
                        wav = synth_speech(rng, length)
                    else:
                        length = int(rng.uniform(8.0, 15.0) * FS)
                        wav = synth_noise(rng, length)
                    name = f"{split}_{kind}_{s:05d}.wav"
                p = os.path.join(d, name)
                write_wav(p, wav, FS)
                rel = os.path.relpath(p, args.csv_dir)
                relpaths.append(rel)
                with open(p, "rb") as fh:
                    fingerprint["files"][rel] = hashlib.sha256(
                        fh.read()).hexdigest()
                if v3:
                    fingerprint["sizes"][rel] = os.path.getsize(p)
            csv_path = os.path.join(args.csv_dir, csv_names[(split, kind)])
            with open(csv_path, "w") as f:
                if spk_ids:
                    f.write("path,spk\n")
                    f.writelines(f"{p},{s}\n"
                                 for p, s in zip(relpaths, spk_ids))
                else:
                    f.write("path\n")
                    f.writelines(p + "\n" for p in relpaths)
            print(f"{split}/{kind}: {len(relpaths)} files -> {csv_path}",
                  flush=True)

    fp_path = os.path.join(args.csv_dir, "corpus_fingerprint.json")
    blob = json.dumps(fingerprint, sort_keys=True, indent=1)
    fingerprint["corpus_sha256"] = hashlib.sha256(blob.encode()).hexdigest()
    with open(fp_path, "w") as f:
        json.dump(fingerprint, f, sort_keys=True, indent=1)
    print(f"fingerprint ({len(fingerprint['files'])} files, "
          f"corpus_sha256={fingerprint['corpus_sha256'][:16]}...) -> {fp_path}")


if __name__ == "__main__":
    main()
