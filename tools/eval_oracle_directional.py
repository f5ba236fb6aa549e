#!/usr/bin/env python
"""Directional-oracle ceiling: how much of the babble gap can DIRECTION close?

The failure-mode analysis (docs/BENCHMARKS.md) isolated the remaining
stress gap to same-synthesizer talker babble and argued it is a
target-IDENTIFICATION problem: the full oracle cIRM gets +39.7 dB
dSI-SDR on the babble items, but it knows the answer ("which voice")
per TF bin. The queued TemporalCRN_dir experiment bets that explicit
spatial features (cos/sin IPD + ILD) let a model resolve the ambiguity,
because the corpus spatializes the masker through its own RIR at a
position distinct from the target.

This tool measures the ceiling of that bet WITHOUT training: a mask
computed from spatial cues ALONE —

  1. per-frequency target steering phasors u_i(f) from the clean
     reverberant image at the mics (energy-weighted time average of
     C_0 * conj(C_i), i = 1..M-1): "oracle direction knowledge";
  2. per-TF mixture pairwise phasors v_i(t,f) = unit(X_0 * conj(X_i));
  3. directional score s(t,f) = mean_i Re(v_i * conj(u_i)) in [-1, 1]
     — the cosine of the IPD mismatch to the target direction;
  4. a magnitude mask from s only (no access to clean magnitudes):
     binary s > theta, or soft ((1+s)/2)^p.

If the directional oracle scores far above the models' ~+1 dB on the
babble items, direction cues carry real headroom at this array
geometry/reverb level and the dir-features hypothesis is live; if it
sits near the models, the IPD smearing from reverb + the small array
already caps what input-feature conditioning can do, and the fix must
be stronger (speaker conditioning / attractors). Either result is
decision-grade for round 4.

CPU-runnable (no TPU claim):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tools/eval_oracle_directional.py ./config_parity.yaml \
        --num_items 100 --snr_low -5 --snr_high 5

No reference analog (/root/reference has no spatial-oracle analysis).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp  # noqa: E402

from semi_tpu.metrics.eval import si_sdr, stoi  # noqa: E402
from semi_tpu.ops.stft import istft, stft  # noqa: E402

EPS = 1e-8


def spec_c(wav: np.ndarray) -> np.ndarray:
    """[L] -> complex [T, F]."""
    s = np.asarray(stft(jnp.asarray(wav, jnp.float32)))
    return s[..., 0] + 1j * s[..., 1]


def directional_score(mix: np.ndarray, clean_img: np.ndarray) -> tuple:
    """(mix [M, L], clean image [M, L]) -> (s_ipd, s_ild [T, F], X0)."""
    X = np.stack([spec_c(mix[m]) for m in range(mix.shape[0])])   # [M,T,F]
    C = np.stack([spec_c(clean_img[m]) for m in range(clean_img.shape[0])])
    # per-frequency target steering phasor per pair, energy-weighted
    # over time (the RIR makes it frame-dependent; the average is the
    # direct-path-dominant signature)
    cross_t = C[:1] * np.conj(C[1:])                              # [M-1,T,F]
    u = cross_t.sum(axis=1)                                       # [M-1,F]
    u /= np.abs(u) + EPS
    cross_m = X[:1] * np.conj(X[1:])                              # [M-1,T,F]
    v = cross_m / (np.abs(cross_m) + EPS)
    s_ipd = np.real(v * np.conj(u[:, None, :])).mean(axis=0)      # [T,F]
    # ILD match: per-frequency target level signature (energy-weighted)
    # vs the mixture's per-bin level difference, scored through a 6 dB
    # Gaussian — mirrors the ILD channels TemporalCRN_dir sees
    ild_t = (np.log(np.abs(C[1:]) ** 2 + EPS)
             - np.log(np.abs(C[:1]) ** 2 + EPS))                  # [M-1,T,F]
    w = (np.abs(C[:1]) * np.abs(C[1:]))                           # weights
    sig = (ild_t * w).sum(axis=1) / (w.sum(axis=1) + EPS)         # [M-1,F]
    ild_m = (np.log(np.abs(X[1:]) ** 2 + EPS)
             - np.log(np.abs(X[:1]) ** 2 + EPS))                  # [M-1,T,F]
    d = ild_m - sig[:, None, :]
    s_ild = np.exp(-(d ** 2) / (2.0 * 1.5 ** 2)).mean(axis=0)     # [T,F]
    return s_ipd, s_ild, X[0]


def apply_mask(X0: np.ndarray, mask: np.ndarray, length: int) -> np.ndarray:
    spec = X0 * mask
    return np.asarray(istft(
        jnp.stack([jnp.asarray(spec.real, jnp.float32),
                   jnp.asarray(spec.imag, jnp.float32)], axis=-1),
        length=length))


VARIANTS = (
    ("ipd binary s>0.5", lambda si, sl: (si > 0.5).astype(np.float32)),
    ("ipd binary s>0.8", lambda si, sl: (si > 0.8).astype(np.float32)),
    ("ipd soft ((1+s)/2)^2", lambda si, sl: ((1.0 + si) / 2.0) ** 2),
    ("ipd soft ((1+s)/2)^4", lambda si, sl: ((1.0 + si) / 2.0) ** 4),
    ("ild soft", lambda si, sl: sl),
    ("ipd*ild", lambda si, sl: ((1.0 + si) / 2.0) ** 2 * sl),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--num_items", type=int, default=100)
    ap.add_argument("--snr_low", type=float, default=-5.0)
    ap.add_argument("--snr_high", type=float, default=5.0)
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args()

    from analyze_eval import (check_replay_against_fingerprint, kind_name,
                              noise_kind)
    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.utils.config import load_config

    config = load_config(args.config)
    ds = LibriPartyDataset(config)
    ds.set_attribute("test", augment=False, perturb=False,
                     snr_low=args.snr_low, snr_high=args.snr_high)
    ds.init_seed(0)

    # record which noise file each item draws (same replay contract as
    # analyze_eval, fingerprint-pinned below)
    reads: list = []
    orig = ds._read_cached
    ds._read_cached = lambda p: (reads.append(p), orig(p))[1]

    kinds, rows = [], []
    checked = False
    for i in range(args.num_items):
        reads.clear()
        data = ds[i]
        noise = [p for p in reads if "noise" in os.path.basename(p)]
        if not noise:
            raise SystemExit("no noise file read — corpus manifests absent")
        nidx = int(noise[-1].rsplit("_", 1)[-1].split(".")[0])
        if not checked:
            check_replay_against_fingerprint(nidx)
            checked = True
        kinds.append(noise_kind(nidx))

        mix = np.asarray(data["mix"][0])          # [M, L]
        img = np.asarray(data["source"][0, 0])    # [M, L] clean image
        src = img[0]                              # scoring target = mic 0
        L = mix.shape[-1]
        s_ipd, s_ild, X0 = directional_score(mix, img)
        row = {"kind": kinds[-1],
               "b_sisdr": float(si_sdr(src, mix[0])),
               "b_stoi": float(stoi(src, mix[0]))}
        for name, fn in VARIANTS:
            enh = apply_mask(X0, fn(s_ipd, s_ild), L)
            row[name] = {"sisdr": float(si_sdr(src, enh)),
                         "stoi": float(stoi(src, enh))}
        rows.append(row)
        if (i + 1) % 10 == 0:
            print(f"[{i + 1}/{args.num_items}]", flush=True)

    print(f"\nDirectional oracle (IPD-only mask, steering from the clean "
          f"image), snr {args.snr_low}..{args.snr_high}:")
    for name, _ in VARIANTS:
        print(f"  variant: {name}")
        for k in ("impulse", "babble", "am", "pink"):
            g = [r for r in rows if r["kind"] == k]
            if not g:
                continue
            dsis = np.mean([r[name]["sisdr"] - r["b_sisdr"] for r in g])
            dst = np.mean([r[name]["stoi"] - r["b_stoi"] for r in g])
            print(f"    {k:8s} n={len(g):3d}  dSI-SDR {dsis:6.2f}  "
                  f"dSTOI {dst:+.4f}")

    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"model": "OracleDirectional",
                       "test_snr": [args.snr_low, args.snr_high],
                       "num_items": args.num_items,
                       "variants": [n for n, _ in VARIANTS],
                       "items": rows}, f, indent=1)
        print(f"wrote {args.out_json}")


if __name__ == "__main__":
    main()
