"""Per-masker failure-mode breakdown of an eval artifact.

Joins a committed eval JSON (runs/eval_*.json, schema pinned by
tests/test_predict_eval.py) against the corpus generator's masker
inventory: the noise file an eval item used is recovered by replaying
the dataset's deterministic per-index rng chain (dataset.py _rng), and
that file's masker kind by replaying the generator's per-file seed
(tools/generate_corpus.py:272 SeedSequence([seed0, i, tag, 2]) — the
length draw precedes the kind draw in synth_noise).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tools/analyze_eval.py runs/eval_distill_stress.json \
        --config config_parity.yaml --snr_low -5 --snr_high 5

The mixing protocol flags MUST match the ones the artifact was made
with (they are pinned inside it as `test_snr`; the tool checks).
"""

import argparse
import json
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

KINDS = ("impulse", "babble", "am", "pink")


def kind_name(k: int) -> str:
    # inventory split in generate_corpus.synth_noise: 0-2 impulse train,
    # 3-5 talker babble, 6 syllable-rate AM hiss, 7 pink
    return "impulse" if k < 3 else ("babble" if k < 6 else
                                    ("am" if k == 6 else "pink"))


# MUST equal generate_corpus.stable_tag("noise") — crc32 masked to 16
# bits. (A first version of this tool used the unmasked crc32: every
# replayed kind was then drawn from a different rng stream, producing a
# deterministic but WRONG grouping. The fingerprint self-check below
# now pins the replay to the committed corpus bytes.)
NOISE_TAG = zlib.crc32(b"noise") & 0xFFFF


def noise_kind(idx: int, seed0: int = 3000, version: int = 2) -> str:
    # the version is the LAST SeedSequence element (generate_corpus.py
    # main(): [...: stable_tag(kind), args.version]); kind inventory
    # split is identical in synth_noise and synth_noise_v3
    rng = np.random.default_rng(
        np.random.SeedSequence([seed0, idx, NOISE_TAG, version]))
    rng.uniform(8.0, 15.0)  # the length draw comes first
    return kind_name(int(rng.integers(0, 8)))


def check_replay_against_fingerprint(idx: int, seed0: int = 3000,
                                     csv_dir: str = "data") -> None:
    """Regenerate test-noise file ``idx`` from the replayed seed chain
    and require its bytes to match <csv_dir>/corpus_fingerprint.json —
    proof the kind replay reads the SAME rng stream that made the
    corpus (v2 and v3 corpora both supported; version comes from the
    fingerprint)."""
    import hashlib
    import importlib.util
    import tempfile

    spec = importlib.util.spec_from_file_location(
        "gcorp", os.path.join(os.path.dirname(__file__),
                              "generate_corpus.py"))
    gc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gc)
    from semi_tpu.data.wav import write_wav

    fpj = json.load(open(os.path.join(csv_dir, "corpus_fingerprint.json")))
    version = fpj.get("version", 2)
    assert gc.stable_tag("noise") == NOISE_TAG, "tag drifted vs generator"
    rng = np.random.default_rng(
        np.random.SeedSequence([seed0, idx, NOISE_TAG, version]))
    length = int(rng.uniform(8.0, 15.0) * gc.FS)
    wav = gc.synth_noise(rng, length) if version == 2 \
        else gc.synth_noise_v3(rng, length)
    with tempfile.NamedTemporaryFile(suffix=".wav") as t:
        write_wav(t.name, wav, gc.FS)
        h = hashlib.sha256(open(t.name, "rb").read()).hexdigest()
    fp = fpj["files"]
    rel = f"corpus/test/noise/test_noise_{idx:05d}.wav"
    assert fp[rel] == h, f"replayed {rel} does not match the fingerprint"


def item_noise_indices(config, n: int, snr_low: float, snr_high: float):
    """Replay the eval dataset and record which noise file each item drew."""
    from semi_tpu.data.dataset import LibriPartyDataset

    ds = LibriPartyDataset(config)
    ds.set_attribute("test", augment=False, perturb=False,
                     snr_low=snr_low, snr_high=snr_high)
    ds.init_seed(0)
    reads: list = []
    orig = ds._read_cached
    ds._read_cached = lambda p: (reads.append(p), orig(p))[1]
    out = []
    for i in range(n):
        reads.clear()
        _ = ds[i]
        noise = [p for p in reads if "noise" in os.path.basename(p)]
        if not noise:  # synthetic fallback corpus: no manifest on disk
            raise SystemExit("no noise file read — corpus manifests absent")
        out.append(noise[-1])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--config", default="./config_parity.yaml")
    ap.add_argument("--csv_dir", default="data",
                    help="manifest dir whose fingerprint pins the replay "
                         "(data = corpus v2, data_v3 = speaker-keyed v3)")
    ap.add_argument("--snr_low", type=float, default=None,
                    help="default: the artifact's pinned test_snr")
    ap.add_argument("--snr_high", type=float, default=None)
    ap.add_argument("--absolute", action="store_true",
                    help="also print ABSOLUTE enhanced scores per "
                         "subset (overall / non-babble / babble) for "
                         "the side-by-side vs reference README.md:56")
    ap.add_argument("--kind_from_name", action="store_true",
                    help="OOD corpus: masker kind is embedded in the "
                         "noise FILENAME (test_noise_<kind>_NNNNN.wav) "
                         "— no rng replay / fingerprint check needed")
    args = ap.parse_args()

    from semi_tpu.utils.config import load_config

    art = json.load(open(args.artifact))
    lo = args.snr_low if args.snr_low is not None else art["test_snr"][0]
    hi = args.snr_high if args.snr_high is not None else art["test_snr"][1]
    assert [lo, hi] == art["test_snr"], (
        f"protocol mismatch: artifact pinned {art['test_snr']}, got {[lo, hi]}")

    config = load_config(args.config)
    paths = item_noise_indices(config, len(art["items"]), lo, hi)
    if args.kind_from_name:
        # OOD corpus: kind is the filename token, crowd == babble-class
        kinds = tuple(sorted({os.path.basename(p).split("_")[2]
                              for p in paths}))
        item_kinds = [os.path.basename(p).split("_")[2] for p in paths]
        babble_kind = "crowd"
    else:
        version = json.load(open(os.path.join(
            args.csv_dir, "corpus_fingerprint.json"))).get("version", 2)
        idxs = [int(p.rsplit("_", 1)[-1].split(".")[0]) for p in paths]
        check_replay_against_fingerprint(idxs[0], csv_dir=args.csv_dir)
        kinds = KINDS
        item_kinds = [noise_kind(i, version=version) for i in idxs]
        babble_kind = "babble"

    groups: dict = {k: [] for k in kinds}
    for row, k in zip(art["items"], item_kinds):
        d = row["enhanced"]
        b = row["noisy"]
        groups[k].append(
            (d["sisdr"] - b["sisdr"], d["stoi"] - b["stoi"],
             d["pesq"] - b["pesq"]))
    print(f"{art['model']}  ({os.path.basename(args.artifact)}, "
          f"snr {lo}..{hi})")
    for k in kinds:
        a = np.array(groups[k])
        if not len(a):
            continue
        print(f"  {k:8s} n={len(a):3d}  dSI-SDR {a[:, 0].mean():6.2f}  "
              f"dSTOI {a[:, 1].mean():+.4f}  dPESQ {a[:, 2].mean():+.3f}")

    if args.absolute:
        # VERDICT r4 next #7: ABSOLUTE enhanced scores (not deltas), to
        # read directly against the reference's published test table
        # (README.md:56 — SISDR 20.52 / STOI 0.9244 / PESQ 2.7129 on
        # its recorded-Chinese+DNS corpus). Subsets: overall, babble,
        # and non-babble (the masker classes matching the reference's
        # DNS-style inventory; babble is the known identity-capacity
        # failure mode, docs/BENCHMARKS.md).
        subsets = {
            "overall": kinds,
            "non-babble": tuple(k for k in kinds if k != babble_kind),
            "babble": (babble_kind,),
        }
        abs_groups: dict = {k: [] for k in kinds}
        for row, k in zip(art["items"], item_kinds):
            d, b = row["enhanced"], row["noisy"]
            abs_groups[k].append(
                (d["sisdr"], d["stoi"], d["pesq"], d.get("npesq", np.nan),
                 b["sisdr"], b["stoi"], b["pesq"]))
        print("  -- absolute enhanced scores "
              "(reference README.md:56: 20.52 / 0.9244 / 2.7129) --")
        for name, kinds in subsets.items():
            a = np.array(sum((abs_groups[k] for k in kinds), []))
            if not len(a):
                continue
            print(f"  {name:10s} n={len(a):3d}  "
                  f"SI-SDR {a[:, 0].mean():6.2f}  "
                  f"STOI {a[:, 1].mean():.4f}  "
                  f"PESQ {a[:, 2].mean():.4f}  "
                  f"(noisy: {a[:, 4].mean():5.2f} / "
                  f"{a[:, 5].mean():.4f} / {a[:, 6].mean():.4f})")


if __name__ == "__main__":
    main()
