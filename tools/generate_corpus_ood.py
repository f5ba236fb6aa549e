"""Out-of-distribution EVAL corpus from a structurally different
synthesizer (round 5, VERDICT r4 next #3).

The verdict's concern: every quality number in the repo rests on
same-synthesizer synthetic audio, and the zero-egress host has no real
recorded speech anywhere (searched: no wav/flac outside the repo except
scipy's test tones, no HF/torch caches, reference Chinese_data is
empty). A real-recorded-speech eval is therefore IMPOSSIBLE in this
environment; this tool is the honest substitute: an eval-only corpus
whose speech and noise come from a DIFFERENT production model than the
v2/v3 training corpus, so scoring the committed checkpoints on it
measures transfer under distribution shift rather than same-synthesizer
circularity. What transfers (or doesn't) is reported in
docs/BENCHMARKS.md "OOD transfer"; the remaining gap to real
recordings is stated there, not papered over.

How it differs from tools/generate_corpus.py (v2/v3):

speech — v2/v3 build a harmonic comb in the frequency domain (sum of
phase-dispersed sines, 1/h^tilt decay), run it through a time-varying
vowel cascade, syllabic AM that never gates, <=1 pause, and power-law
companding. Here instead:
  * time-domain Rosenberg/LF-style glottal PULSES (speaker open
    quotient + return phase), pitch-synchronous concatenation with
    jitter AND shimmer;
  * an explicit phoneme-segment inventory: vowels, unvoiced fricatives
    (shaped noise with speaker-scaled spectral peaks — zero voicing),
    stops (closure silence + burst + aspiration), nasals (low murmur
    resonance + anti-resonance notch);
  * word structure with REAL inter-word gaps and phrase-final
    lengthening + f0 declination (v2/v3 deliberately avoided gating);
  * no companding: a gentle tanh mic-chain drive instead, so the crest
    factor distribution differs from the training corpus.

noise — v2/v3 kinds are dense impulse trains over hiss, same-synth
babble, syllable-rate AM hiss, pink. Here: gusty wind turbulence
(integrated noise with slow gust envelope), machinery (inharmonic
partial stack with speed wobble + resonances), traffic-like band-passed
swells with whoosh events, modal clatter (sparse heavy-tailed impacts
ringing exponentially decaying modes), and crowd babble from the OOD
speech synthesizer (keeps the babble/identity failure-mode probe under
shift). The noise KIND is written into the filename
(``test_noise_<kind>_NNNNN.wav``) so per-masker analysis needs no rng
replay (analyze_eval --kind_from_name).

Speaker-keyed like v3 (spk column, >=2 utterances per speaker) so
separate-utterance enrollment works for the conditioning-transfer test.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
        tools/generate_corpus_ood.py --csv_dir data_ood \
        --out_dir data_ood/corpus

Reference parity note: the reference evaluates on held-out recorded
wavs via CSV manifests (data_c.py:103-126); this writes the same
manifest schema (final_test.csv with spk column, DNS_test_noise.csv).
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

# vowel formant targets (F1, F2, F3) — same physical grid as any
# vocal-tract model (physical constants, not code reuse)
VOWELS = (
    (730, 1090, 2440),
    (530, 1840, 2480),
    (270, 2290, 3010),
    (570, 840, 2410),
    (300, 870, 2240),
)
# unvoiced fricative spectral peaks (center, bandwidth, gain-tilt)
FRICS = ((4800, 2400), (2800, 1600), (6400, 3000), (1800, 1200))


def _resonate(x, f, bw, zi=None):
    r = np.exp(-np.pi * bw / FS)
    th = 2 * np.pi * f / FS
    a = [1.0, -2 * r * np.cos(th), r * r]
    if zi is None:
        zi = np.zeros(2)
    y, zo = lfilter([1.0 - r], a, x, zi=zi)
    return y, zo


def _notch(x, f, bw):
    r = np.exp(-np.pi * bw / FS)
    th = 2 * np.pi * f / FS
    b = [1.0, -2 * np.cos(th), 1.0]
    a = [1.0, -2 * r * np.cos(th), r * r]
    return lfilter(b, a, x)


def glottal_pulse(n: int, oq: float, rq: float) -> np.ndarray:
    """One Rosenberg-style glottal flow-derivative pulse of n samples:
    rising open phase (fraction oq), sharp return (fraction rq of the
    open phase), closed phase zero. Differentiated flow = the familiar
    negative spike at closure — a completely different source waveform
    from v2/v3's phase-dispersed harmonic comb."""
    no = max(2, int(n * oq))
    nr = max(1, int(no * rq))
    t_o = np.linspace(0, np.pi, no)
    flow = 0.5 * (1 - np.cos(t_o))            # rising open phase
    ret = flow[-1] * np.cos(np.linspace(0, np.pi / 2, nr)) ** 2
    pulse = np.zeros(n)
    pulse[:no] = flow
    pulse[no:no + len(ret[:n - no])] = ret[:n - no]
    return np.diff(pulse, prepend=0.0).astype(np.float64)


def draw_voice_ood(rng: np.random.Generator) -> dict:
    low = rng.uniform() < 0.5
    return {
        "f0": float(rng.uniform(85, 150) if low else rng.uniform(170, 250)),
        "oq": float(rng.uniform(0.45, 0.75)),     # open quotient
        "rq": float(rng.uniform(0.1, 0.4)),       # return quotient
        "fscale": float(rng.uniform(0.82, 1.25)),  # vocal tract length
        "bw": float(rng.uniform(0.8, 1.3)),
        "breath": float(rng.uniform(0.02, 0.15)),
        "rate": float(rng.uniform(2.2, 4.2)),     # syllables/s
        "shimmer": float(rng.uniform(0.02, 0.10)),
        "jitter": float(rng.uniform(0.004, 0.02)),
        "fric_scale": float(rng.uniform(0.8, 1.3)),
        "drive": float(rng.uniform(0.8, 2.2)),    # mic-chain tanh drive
        "decl": float(rng.uniform(0.1, 0.3)),     # f0 declination depth
    }


def _voiced_segment(rng, voice, dur, f0, vowel_a, vowel_b, nasal=False):
    """Pitch-synchronous pulse-train vowel (or nasal murmur) segment."""
    n = int(dur * FS)
    src = np.zeros(n + 400)
    pos = 0
    while pos < n:
        f = f0 * (1 + voice["jitter"] * rng.standard_normal())
        period = max(32, int(FS / max(40.0, f)))
        amp = 1.0 + voice["shimmer"] * rng.standard_normal()
        src[pos:pos + period] += amp * glottal_pulse(
            period, voice["oq"], voice["rq"])
        pos += period
    src = src[:n]
    src += voice["breath"] * rng.standard_normal(n)
    # formant interpolation vowel_a -> vowel_b across the segment
    out = np.zeros(n)
    block = 320
    zis = [None, None, None]
    for b0 in range(0, n, block):
        w = b0 / max(1, n)
        fmts = [(1 - w) * fa + w * fb for fa, fb in zip(vowel_a, vowel_b)]
        seg = src[b0:b0 + block]
        acc = seg
        for j, (f, bw) in enumerate(zip(fmts, (80.0, 100.0, 160.0))):
            acc, zis[j] = _resonate(acc, f * voice["fscale"],
                                    bw * voice["bw"], zis[j])
        out[b0:b0 + block] = acc
    if nasal:
        out, _ = _resonate(out, 280 * voice["fscale"], 60)
        out = _notch(out, 800 * voice["fscale"], 150)
    # level calibration: the resonator cascade's (1-r)^3 passband gain
    # leaves vowels ~50 dB under the single-resonator fricatives —
    # normalize to unit RMS here and let the caller set relative phone
    # levels (vowels loudest, as in real speech)
    out = out / (np.sqrt((out ** 2).mean()) + 1e-9)
    env = np.ones(n)
    e = min(160, n // 4)
    env[:e] = np.linspace(0, 1, e)
    env[-e:] = np.linspace(1, 0, e)
    return out * env


def _fric_segment(rng, voice, dur):
    n = int(dur * FS)
    f, bw = FRICS[int(rng.integers(len(FRICS)))]
    x = rng.standard_normal(n)
    y, _ = _resonate(x, min(7600, f * voice["fric_scale"]), bw)
    y = y - lfilter([1], [1, -0.9], y) * 0.6        # thin out the lows
    y = y / (np.sqrt((y ** 2).mean()) + 1e-9)
    env = np.ones(n)
    e = min(240, n // 3)
    env[:e] = np.linspace(0, 1, e) ** 2
    env[-e:] = np.linspace(1, 0, e) ** 2
    return y * env * 0.35                            # ~-9 dB vs vowels


def _stop_segment(rng, voice):
    """closure silence + burst + short aspiration"""
    clo = np.zeros(int(rng.uniform(0.02, 0.06) * FS))
    nb = int(rng.uniform(0.005, 0.02) * FS)
    burst = rng.standard_normal(nb) * np.exp(-np.arange(nb) / (0.2 * nb))
    f, bw = FRICS[int(rng.integers(len(FRICS)))]
    burst, _ = _resonate(burst, min(7600, f * voice["fric_scale"]), bw * 1.5)
    burst = burst / (np.sqrt((burst ** 2).mean()) + 1e-9)
    na = int(rng.uniform(0.01, 0.04) * FS)
    asp = 0.3 * rng.standard_normal(na) * np.exp(-np.arange(na) / (0.5 * na))
    return np.concatenate([clo, burst * 0.8, asp])  # burst ~-2 dB vs vowels


def synth_speech_ood(rng: np.random.Generator, length: int,
                     voice: dict) -> np.ndarray:
    """Phrase = words of 1-4 syllables with inter-word gaps; each
    syllable = optional onset (stop|fricative|nasal) + vowel (moving
    target); f0 declines across the phrase, final syllable lengthens."""
    target = length
    parts = []
    total = 0
    f0_top = voice["f0"] * (1 + 0.1 * rng.standard_normal())
    syl_dur0 = 1.0 / voice["rate"]
    phrase_pos = 0.0
    while total < target:
        n_syl = int(rng.integers(1, 5))
        for s in range(n_syl):
            phrase_pos = min(1.0, total / max(1, target))
            f0 = f0_top * (1 - voice["decl"] * phrase_pos)
            kind = rng.uniform()
            if kind < 0.35:
                parts.append(_stop_segment(rng, voice))
            elif kind < 0.6:
                parts.append(_fric_segment(
                    rng, voice, rng.uniform(0.05, 0.12)))
            elif kind < 0.75:
                va = VOWELS[int(rng.integers(len(VOWELS)))]
                parts.append(0.6 * _voiced_segment(
                    rng, voice, rng.uniform(0.04, 0.08), f0, va, va,
                    nasal=True))
            dur = syl_dur0 * rng.uniform(0.6, 1.4)
            if total > 0.85 * target:
                dur *= 1.5                       # phrase-final lengthening
            va = VOWELS[int(rng.integers(len(VOWELS)))]
            vb = VOWELS[int(rng.integers(len(VOWELS)))]
            parts.append(_voiced_segment(rng, voice,
                                         min(dur, 0.35), f0, va, vb))
            total = sum(len(p) for p in parts)
            if total >= target:
                break
        # REAL inter-word gap (the envelope statistic v2/v3 avoids)
        parts.append(np.zeros(int(rng.uniform(0.04, 0.18) * FS)))
        total = sum(len(p) for p in parts)
    sig = np.concatenate(parts)[:target]
    sig = sig / (np.abs(sig).std() * 6 + 1e-8)
    # mic-chain saturation instead of power-law companding
    sig = np.tanh(voice["drive"] * sig) / voice["drive"]
    peak = np.abs(sig).max() + 1e-8
    return (rng.uniform(0.3, 0.7) * sig / peak).astype(np.float32)


# -- OOD noise inventory ------------------------------------------------

NOISE_KINDS = ("wind", "machine", "traffic", "clatter", "crowd")


def synth_noise_ood(rng: np.random.Generator, length: int,
                    kind: str) -> np.ndarray:
    t = np.arange(length) / FS
    if kind == "wind":
        # integrated (brownian) turbulence with gusty envelope
        x = np.cumsum(rng.standard_normal(length))
        x = x - lfilter([1], [1, -0.999], x) * 0.999
        gust = lfilter([1], [1, -0.9995],
                       np.abs(rng.standard_normal(length)))
        gust = gust / (np.abs(gust).max() + 1e-8)
        sig = x * (0.25 + 0.75 * gust)
    elif kind == "machine":
        base = rng.uniform(40, 120)
        wobble = 1 + 0.02 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * t)
        sig = np.zeros(length)
        for k in range(1, 12):
            part = base * k * rng.uniform(0.98, 1.02)   # inharmonicity
            if part > 7600:
                break
            sig += rng.uniform(0.2, 1.0) / k * np.sin(
                2 * np.pi * np.cumsum(part * wobble) / FS)
        hiss, _ = _resonate(rng.standard_normal(length),
                            rng.uniform(800, 3000), 400)
        sig += 0.4 * hiss
    elif kind == "traffic":
        lo = lfilter([0.05], [1, -0.985], rng.standard_normal(length))
        swell = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(0.05, 0.25) * t +
                                  rng.uniform(0, 6.3)))
        sig = lo * (0.4 + 0.6 * swell)
        for _ in range(int(length / FS / rng.uniform(2.0, 5.0)) + 1):
            pos = int(rng.integers(0, max(1, length - FS)))
            dur = int(rng.uniform(0.4, 1.2) * FS)
            end = min(pos + dur, length)
            wh = rng.standard_normal(end - pos)
            env = np.sin(np.linspace(0, np.pi, end - pos)) ** 2
            sig[pos:end] += 0.5 * wh * env
    elif kind == "clatter":
        # sparse heavy-tailed impacts ringing 2-4 decaying modes
        sig = 0.01 * rng.standard_normal(length)
        n_hit = int(length / FS * rng.uniform(1.0, 6.0)) + 1
        for _ in range(n_hit):
            pos = int(rng.integers(0, max(1, length - 3200)))
            amp = rng.pareto(1.5) + 0.5
            dur = int(rng.uniform(0.05, 0.2) * FS)
            ring = np.zeros(dur)
            for _m in range(int(rng.integers(2, 5))):
                fm = rng.uniform(300, 5000)
                tau = rng.uniform(0.005, 0.05) * FS
                ring += np.sin(2 * np.pi * fm * np.arange(dur) / FS +
                               rng.uniform(0, 6.3)) * \
                    np.exp(-np.arange(dur) / tau)
            sig[pos:pos + dur] += min(amp, 6.0) * 0.3 * ring
    else:  # crowd: 3-6 OOD voices summed
        sig = np.zeros(length)
        for _ in range(int(rng.integers(3, 7))):
            v = draw_voice_ood(rng)
            sig += synth_speech_ood(rng, length, v) * rng.uniform(0.5, 1.0)
    sig = np.asarray(sig, np.float32)
    return (0.4 * sig / (np.abs(sig).max() + 1e-8)).astype(np.float32)


def stable_tag(s: str) -> int:
    return zlib.crc32(s.encode()) & 0xFFFF


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="data_ood/corpus")
    ap.add_argument("--csv_dir", default="data_ood")
    ap.add_argument("--n_spk", type=int, default=40)
    ap.add_argument("--spk_utts", type=int, default=3)
    ap.add_argument("--test_noise", type=int, default=60)
    args = ap.parse_args()

    from semi_tpu.data.wav import write_wav

    os.makedirs(args.csv_dir, exist_ok=True)
    fingerprint = {"version": "ood-1", "files": {}}
    seed0 = 7000

    d = os.path.join(args.out_dir, "test", "clean")
    os.makedirs(d, exist_ok=True)
    relpaths, spk_ids = [], []
    for s in range(args.n_spk):
        v_rng = np.random.default_rng(np.random.SeedSequence(
            [seed0, s, stable_tag("voice"), 101]))
        voice = draw_voice_ood(v_rng)
        for u in range(args.spk_utts):
            rng = np.random.default_rng(np.random.SeedSequence(
                [seed0, s, u, stable_tag("clean"), 101]))
            length = int(rng.uniform(2.5, 6.0) * FS)
            wav = synth_speech_ood(rng, length, voice)
            name = f"test_clean_s{s:04d}_u{u:02d}.wav"
            p = os.path.join(d, name)
            write_wav(p, wav, FS)
            rel = os.path.relpath(p, args.csv_dir)
            relpaths.append(rel)
            spk_ids.append(f"ood_s{s:04d}")
            with open(p, "rb") as fh:
                fingerprint["files"][rel] = hashlib.sha256(
                    fh.read()).hexdigest()
    with open(os.path.join(args.csv_dir, "final_test.csv"), "w") as f:
        f.write("path,spk\n")
        f.writelines(f"{p},{s}\n" for p, s in zip(relpaths, spk_ids))

    d = os.path.join(args.out_dir, "test", "noise")
    os.makedirs(d, exist_ok=True)
    relpaths = []
    for i in range(args.test_noise):
        rng = np.random.default_rng(np.random.SeedSequence(
            [seed0, i, stable_tag("noise"), 101]))
        length = int(rng.uniform(8.0, 15.0) * FS)
        kind = NOISE_KINDS[int(rng.integers(len(NOISE_KINDS)))]
        wav = synth_noise_ood(rng, length, kind)
        name = f"test_noise_{kind}_{i:05d}.wav"
        p = os.path.join(d, name)
        write_wav(p, wav, FS)
        rel = os.path.relpath(p, args.csv_dir)
        relpaths.append(rel)
        with open(p, "rb") as fh:
            fingerprint["files"][rel] = hashlib.sha256(
                fh.read()).hexdigest()
    with open(os.path.join(args.csv_dir, "DNS_test_noise.csv"), "w") as f:
        f.write("path\n")
        f.writelines(f"{p}\n" for p in relpaths)

    # train/dev manifests point at the same test files (predict.py only
    # reads the test split; LibriPartyDataset wants the sections present)
    for name in ("final_train.csv", "final_dev.csv"):
        with open(os.path.join(args.csv_dir, name), "w") as f:
            f.write("path,spk\n")
            f.writelines(f"{p},{s}\n" for p, s in zip(
                [r for r in fingerprint["files"] if "clean" in r][:8],
                spk_ids[:8]))
    for name in ("final_train_noise.csv", "final_dev_noise.csv"):
        with open(os.path.join(args.csv_dir, name), "w") as f:
            f.write("path\n")
            f.writelines(f"{p}\n" for p in relpaths[:4])

    with open(os.path.join(args.csv_dir, "corpus_fingerprint.json"),
              "w") as f:
        json.dump(fingerprint, f, indent=1, sort_keys=True)
    print(f"OOD corpus: {args.n_spk * args.spk_utts} cleans "
          f"({args.n_spk} speakers), {args.test_noise} noises "
          f"-> {args.out_dir}")


if __name__ == "__main__":
    main()
