#!/usr/bin/env python
"""Oracle-cIRM ceiling eval: the achievable upper bound on this corpus.

VERDICT r2 asked for enhancement deltas "of reference magnitude ... or
an honest analysis of why not". The honest analysis needs a ceiling:
every model in the zoo (reference and rebuild alike) enhances by
predicting a *compressed cIRM* (utility.py:406-442) and applying it to
the noisy mic-0 spectrum — so the best any of them can possibly do is
the ORACLE mask built from the ground-truth spectra, pushed through the
same compress→decompress(±9.9 clamp) codec and the same 400/160 STFT.
This tool scores that oracle on the same held-out mixtures / metrics /
JSON schema as the model evals, at both protocols. A model delta is
then honestly reported as a fraction of the oracle delta, which is a
corpus-independent statement.

Two rows are emitted:
  - OracleCIRM: compressed+clamped cIRM (the mask-family ceiling)
  - OracleSTFT: raw ratio mask = exact clean spectrum (STFT round-trip
    sanity; should be ~perfect on SI-SDR/STOI)

CPU-runnable (no TPU claim needed):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/eval_oracle.py \
        ./config_parity.yaml --num_items 100 --out_json runs/eval_oracle.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from semi_tpu.data.dataset import LibriPartyDataset  # noqa: E402
from semi_tpu.metrics.eval import nb_pesq, si_sdr, stoi, wb_pesq  # noqa: E402
from semi_tpu.ops.mask import (  # noqa: E402
    build_complex_ideal_ratio_mask, decompress_cirm)
from semi_tpu.ops.stft import istft, stft  # noqa: E402


def oracle_enhance(noisy: np.ndarray, clean: np.ndarray,
                   clamp: bool = True) -> np.ndarray:
    """Enhance ``noisy`` with the ideal cIRM built from ``clean``.

    Same 400/160 STFT and (when ``clamp``) the same compress→decompress
    ±9.9 codec every model's predicted mask passes through
    (utility.py:426-442) — so this is the exact ceiling of the
    mask-prediction family, not a generic upper bound.
    """
    length = noisy.shape[-1]
    nspec = stft(jnp.asarray(noisy, jnp.float32))   # [T, F, 2]
    cspec = stft(jnp.asarray(clean, jnp.float32))
    # ops.mask wants real/imag on axis -3; the trailing F/T order is
    # irrelevant (every op is elementwise per TF bin)
    n_l = jnp.moveaxis(nspec, -1, -3)               # [2, T, F]
    c_l = jnp.moveaxis(cspec, -1, -3)
    if clamp:
        m = decompress_cirm(build_complex_ideal_ratio_mask(n_l, c_l))
    else:
        from semi_tpu.ops.mask import EPS
        nr, ni = n_l[..., 0, :, :], n_l[..., 1, :, :]
        cr, ci = c_l[..., 0, :, :], c_l[..., 1, :, :]
        denom = nr * nr + ni * ni + EPS
        m = jnp.stack([(nr * cr + ni * ci) / denom,
                       (nr * ci - ni * cr) / denom], axis=-3)
    mr, mi = m[..., 0, :, :], m[..., 1, :, :]
    nr, ni = n_l[..., 0, :, :], n_l[..., 1, :, :]
    er = mr * nr - mi * ni
    ei = mr * ni + mi * nr
    espec = jnp.stack([er, ei], axis=-1)            # [T, F, 2] again
    return np.asarray(istft(espec, length=length))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--num_items", type=int, default=100)
    ap.add_argument("--snr_low", type=float, default=0.0)
    ap.add_argument("--snr_high", type=float, default=25.0)
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args()

    from semi_tpu.utils.config import load_config
    config = load_config(args.config)
    dataset = LibriPartyDataset(config)
    dataset.set_attribute("test", augment=False, perturb=False,
                          snr_low=args.snr_low, snr_high=args.snr_high)
    dataset.init_seed(0)

    keys = ("sisdr", "stoi", "pesq", "npesq")
    sums = {f"{p}_{k}": 0.0 for k in keys for p in ("d", "b", "a")}
    sums_exact = dict(sums)
    rows = []
    for i in range(args.num_items):
        data = dataset[i]
        noisy = np.asarray(data["mix"][0, 0])
        src = np.asarray(data["source"][0, 0, 0])
        enh = oracle_enhance(noisy, src, clamp=True)
        enh_exact = oracle_enhance(noisy, src, clamp=False)

        row = {}
        for tag, est, acc in (("", enh, sums), ("x", enh_exact, sums_exact)):
            vals = {
                "sisdr": (si_sdr(src, est), si_sdr(src, noisy)),
                "stoi": (stoi(src, est), stoi(src, noisy)),
                "pesq": (wb_pesq(src, est), wb_pesq(src, noisy)),
                "npesq": (nb_pesq(src, est), nb_pesq(src, noisy)),
            }
            for k, (a, b) in vals.items():
                acc[f"a_{k}"] += a
                acc[f"b_{k}"] += b
                acc[f"d_{k}"] += a - b
                if not tag:
                    row[k] = (round(b, 4), round(a, 4))
        rows.append(row)
        if (i + 1) % 10 == 0:
            n = i + 1
            print(f"[{n}/{args.num_items}] oracle d_sisdr="
                  f"{sums['d_sisdr']/n:+.2f} dB d_stoi="
                  f"{sums['d_stoi']/n:+.4f} d_pesq="
                  f"{sums['d_pesq']/n:+.3f}", flush=True)

    n = float(args.num_items)
    means = {k: v / n for k, v in sums.items()}
    means_exact = {k: v / n for k, v in sums_exact.items()}
    print("\nOracleCIRM (compress/decompress ±9.9 — the mask-family "
          "ceiling):")
    for k in keys:
        print(f"  {k}: {means[f'b_{k}']:.4f} -> {means[f'a_{k}']:.4f} "
              f"(d {means[f'd_{k}']:+.4f})")
    print("OracleSTFT (exact ratio mask — STFT round-trip sanity):")
    for k in keys:
        print(f"  {k}: {means_exact[f'b_{k}']:.4f} -> "
              f"{means_exact[f'a_{k}']:.4f} "
              f"(d {means_exact[f'd_{k}']:+.4f})")

    if args.out_json:
        out = {"model": "OracleCIRM",
               "num_items": args.num_items,
               "test_snr": [args.snr_low, args.snr_high],
               "means": means,
               "means_exact_ratio_mask": means_exact}
        os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"\nwrote {args.out_json}")


if __name__ == "__main__":
    main()
