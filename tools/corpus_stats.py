"""Measure the REALIZED operating point of a split's mixtures.

VERDICT round-2 missing #1: the nominal SNR config (uniform 0-25 dB at
test, data_c.py:37,48-50 in the reference) is an *amplitude-convention*
target (augment.py add_noise, speechbrain form); the realized
power-domain SNR depends on the crest factor / sparsity of the corpus
audio and was never logged. This tool runs the actual dataset pipeline
(same rng chain as training/eval) over N items of a split and reports:

- realized power SNR: 10*log10(P_source / P_noise) from the mixer's own
  source/noise components (power over the whole mixture), plus an
  active-region variant (frames where the source carries energy);
- noisy-baseline oracles vs the mic-0 reverberant target: SI-SDR, STOI,
  WB-PESQ (independent P.862 implementation);
- distribution stats (mean / p10 / p50 / p90).

Writes one JSON to --out (default runs/corpus_stats_<split>.json).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python tools/corpus_stats.py ./config.yaml --split test --num_items 50
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _pct(a, q):
    return float(np.percentile(np.asarray(a, np.float64), q))


def summarize(name, vals):
    vals = np.asarray(vals, np.float64)
    return {
        "metric": name,
        "mean": float(vals.mean()),
        "p10": _pct(vals, 10),
        "p50": _pct(vals, 50),
        "p90": _pct(vals, 90),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config_path", type=str)
    ap.add_argument("--split", default="test")
    ap.add_argument("--num_items", type=int, default=50)
    ap.add_argument("--out", default=None)
    ap.add_argument("--with_pesq", action="store_true",
                    help="include WB-PESQ (slow: ~1 s/item)")
    args = ap.parse_args()

    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.metrics.eval import si_sdr, stoi, wb_pesq
    from semi_tpu.utils.config import load_config

    config = load_config(args.config_path)
    dataset = LibriPartyDataset(config)
    # test split keeps utterances whole + fixed 0-25 dB SNR; train/dev use
    # the augment.addnoise range — exactly what training sees
    dataset.set_attribute(args.split, augment=False, perturb=False)
    dataset.init_seed(0)

    rows = {k: [] for k in ("snr_pow", "snr_act", "sisdr", "stoi", "pesq")}
    for i in range(args.num_items):
        data = dataset[i]
        src = np.asarray(data["source"][0, 0, 0], np.float64)   # mic0 reverberant
        noise = np.asarray(data["noise"][0, 0], np.float64)     # mic0 scaled noise
        noisy = np.asarray(data["mix"][0, 0], np.float64)

        p_src = np.mean(src ** 2)
        p_noise = np.mean(noise ** 2) + 1e-12
        rows["snr_pow"].append(10 * np.log10(p_src / p_noise + 1e-12))

        # active-region SNR: 20 ms frames where the source holds energy
        # within 40 dB of its own max (the region STOI/PESQ actually score)
        f = 320
        n = (len(src) // f) * f
        fs_pow = (src[:n] ** 2).reshape(-1, f).mean(-1)
        fn_pow = (noise[:n] ** 2).reshape(-1, f).mean(-1)
        act = fs_pow > fs_pow.max() * 1e-4
        if act.any():
            rows["snr_act"].append(
                10 * np.log10(fs_pow[act].mean() / (fn_pow[act].mean() + 1e-12)
                              + 1e-12))

        rows["sisdr"].append(si_sdr(src, noisy))
        rows["stoi"].append(stoi(src.astype(np.float32),
                                 noisy.astype(np.float32), 16000))
        if args.with_pesq:
            rows["pesq"].append(wb_pesq(src.astype(np.float32),
                                        noisy.astype(np.float32)))
        print(f"[{i+1}/{args.num_items}] powSNR {rows['snr_pow'][-1]:+.1f} dB "
              f"actSNR {rows['snr_act'][-1]:+.1f} dB "
              f"SI-SDR {rows['sisdr'][-1]:+.1f} STOI {rows['stoi'][-1]:.3f}"
              + (f" PESQ {rows['pesq'][-1]:.2f}" if args.with_pesq else ""),
              flush=True)

    report = {
        "split": args.split,
        "num_items": args.num_items,
        "nominal_snr_range": [dataset.snr_low, dataset.snr_high],
        "stats": [summarize(k, v) for k, v in rows.items() if v],
    }
    out = args.out or f"runs/corpus_stats_{args.split}.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report["stats"], indent=2))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
