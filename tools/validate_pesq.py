"""Correlation validation: independent PESQ oracle vs training approximation.

Port of the reference's validation protocol (data_c.py:326-343), which
scored its differentiable PESQ approximation against the compiled ITU
oracle by rank/linear correlation over a spread of degradation
conditions. Here the roles are: oracle = semi_tpu.metrics.pesq_itu
(host-side P.862 structure + MOS-LQO mapping), candidate = the training
loss approximation (losses._pesq_item, raw score).

Conditions: additive shaped noise over an SNR sweep, low-pass filtering,
hard clipping, spectral-mask attenuation, and small delays — the
degradation families enhancement outputs actually exhibit.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/validate_pesq.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_speech(rng, n=48000, fs=16000):
    sys.path.insert(0, os.path.dirname(__file__))
    from generate_corpus import synth_speech
    return synth_speech(rng, n).astype(np.float64)


def degrade(rng, clean, kind, level):
    fs = 16000
    if kind == "noise":
        w = rng.standard_normal(len(clean))
        k = np.exp(-np.arange(64) / rng.uniform(2, 32))
        w = np.convolve(w, k / k.sum(), mode="same")
        w *= np.linalg.norm(clean) / (np.linalg.norm(w) + 1e-12) / 10 ** (level / 20)
        return clean + w
    if kind == "lowpass":
        from scipy.signal import butter, lfilter
        b, a = butter(4, level / (fs / 2))
        return lfilter(b, a, clean)
    if kind == "clip":
        c = level * np.abs(clean).max()
        return np.clip(clean, -c, c)
    if kind == "mask":
        # STFT magnitude attenuation — what an enhancement net does wrong
        from numpy.fft import irfft, rfft
        n = 512
        t = (len(clean) - n) // 256 + 1
        out = np.zeros(len(clean))
        win = np.hanning(n)
        norm = np.zeros(len(clean))
        for i in range(t):
            seg = clean[i * 256: i * 256 + n] * win
            spec = rfft(seg)
            g = np.clip(rng.uniform(level, 1.0, len(spec)), 0, 1)
            out[i * 256: i * 256 + n] += irfft(spec * g, n) * win
            norm[i * 256: i * 256 + n] += win ** 2
        return out / np.maximum(norm, 1e-8)
    if kind == "delay":
        d = int(level)
        return np.concatenate([np.zeros(d), clean])[: len(clean)]
    raise ValueError(kind)


def main():
    import jax.numpy as jnp

    from semi_tpu.metrics.losses import _pesq_item
    from semi_tpu.metrics.pesq_itu import pesq_nb, pesq_wb

    rng = np.random.default_rng(7)
    conditions = (
        [("noise", snr) for snr in (40, 30, 25, 20, 15, 10, 5, 0)] +
        [("lowpass", f) for f in (6000, 4000, 3000, 2000, 1000)] +
        [("clip", c) for c in (0.8, 0.5, 0.3, 0.15)] +
        [("mask", g) for g in (0.8, 0.5, 0.2, 0.05)] +
        [("delay", d) for d in (32, 128, 512)]
    )
    n_utts = 4
    cleans = [make_speech(np.random.default_rng(100 + u)) for u in range(n_utts)]
    oracle, nb_oracle, approx, kinds = [], [], [], []
    for kind, level in conditions:
        os_, ns_, as_ = [], [], []
        for u, clean in enumerate(cleans):
            deg = degrade(np.random.default_rng(1000 + u), clean, kind, level)
            os_.append(pesq_wb(clean, deg))
            ns_.append(pesq_nb(clean, deg))
            as_.append(float(_pesq_item(jnp.asarray(clean, jnp.float32),
                                        jnp.asarray(deg, jnp.float32))))
        o, nbo, a = float(np.mean(os_)), float(np.mean(ns_)), float(np.mean(as_))
        oracle.append(o)
        nb_oracle.append(nbo)
        approx.append(a)
        kinds.append(kind)
        print(f"{kind:8s} {level:8.2f}  oracle(MOS-LQO)={o:6.3f} "
              f"nb={nbo:6.3f} approx(raw)={a:7.3f}", flush=True)

    from scipy.stats import pearsonr, spearmanr
    o = np.array(oracle)
    a = np.array(approx)
    aligned = np.array([k != "delay" for k in kinds])
    for name, sel in (("all conditions", slice(None)),
                      ("aligned conditions (eval regime)", aligned)):
        pr = pearsonr(o[sel], a[sel])
        sr = spearmanr(o[sel], a[sel])
        print(f"\n{name}: n={len(o[sel])}")
        print(f"  Pearson r = {pr.statistic:.4f}  (p={pr.pvalue:.2e})")
        print(f"  Spearman rho = {sr.statistic:.4f}  (p={sr.pvalue:.2e})")
    nb = np.array(nb_oracle)
    # narrowband vs wideband: must RANK degradations consistently where
    # the telephone band carries the damage (all conditions here do)
    sr_nb = spearmanr(o, nb)
    print(f"\nNB-vs-WB oracle Spearman rho = {sr_nb.statistic:.4f} "
          f"(p={sr_nb.pvalue:.2e})")
    print("\n(delay rows: the oracle's time alignment holds the score at "
          "the ceiling; the frame-synchronous approximation collapses — "
          "the two are independent implementations.)")


if __name__ == "__main__":
    main()
