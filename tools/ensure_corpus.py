"""Guard: make sure the synthetic corpus exists before a run chain.

The corpus wavs (``data/corpus``, ~450 MB) are gitignored; only the
manifests and ``data/corpus_fingerprint.json`` are committed. A fresh
checkout — or a wiped workspace, the failure actually hit in round 3:
the run chain crashed on the first wav read after the environment
recycled — must regenerate them before any train/predict CLI runs.

This script is cheap when the corpus is present: existence check, plus
a byte-size check when the fingerprint records sizes (v3+ fingerprints
do; the committed v2 one predates sizes and gets existence only — pass
``--hash`` to verify content sha256 of every file, ~10 s). When
anything is missing it regenerates bit-for-bit via
tools/generate_corpus.py (crc32-seeded, ~90 s; the regenerated
corpus_sha256 is asserted against the committed one, and the committed
fingerprint file is restored on mismatch so the NEXT chain's guard
still detects the drift — ADVICE r3).

Versioned corpora: the fingerprint may carry ``generator_args`` (the
exact extra CLI args of its generate_corpus.py invocation); they are
replayed on regeneration so one guard serves v2 (data/) and v3
(data_v3/, speaker-keyed) side by side.

Run CPU-only (no TPU claim):
    PALLAS_AXON_POOL_IPS= python tools/ensure_corpus.py
Chain scripts call this before their first TPU process.
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv_dir", default=os.path.join(ROOT, "data"))
    ap.add_argument("--hash", action="store_true",
                    help="verify per-file sha256, not just existence")
    ap.add_argument("--check_only", action="store_true",
                    help="exit 3 when incomplete instead of regenerating")
    args = ap.parse_args()

    fp_path = os.path.join(args.csv_dir, "corpus_fingerprint.json")
    with open(fp_path) as f:
        fp = json.load(f)

    sizes = fp.get("sizes", {})
    missing = 0
    for rel, sha in fp["files"].items():
        # fingerprint paths are relative to csv_dir (e.g. "corpus/dev/...")
        path = os.path.join(args.csv_dir, rel)
        if not os.path.exists(path):
            missing += 1
        elif rel in sizes and os.path.getsize(path) != sizes[rel]:
            print(f"size mismatch: {rel}", file=sys.stderr)
            missing += 1
        elif args.hash:
            with open(path, "rb") as fh:
                if hashlib.sha256(fh.read()).hexdigest() != sha:
                    print(f"content mismatch: {rel}", file=sys.stderr)
                    missing += 1
    if not missing:
        print(f"corpus ok ({len(fp['files'])} files, "
              f"{fp['corpus_sha256'][:16]}...)")
        return

    print(f"corpus incomplete ({missing}/{len(fp['files'])} files missing"
          f"{' or mismatched' if args.hash else ''})"
          + (":" if args.check_only else " — regenerating..."))
    if args.check_only:
        sys.exit(3)
    want = fp["corpus_sha256"]
    committed_blob = json.dumps(fp, sort_keys=True, indent=1)
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "tools", "generate_corpus.py"),
                    "--csv_dir", args.csv_dir,
                    "--out_dir", os.path.join(args.csv_dir, "corpus")]
                   + list(fp.get("generator_args", [])),
                   check=True)
    with open(fp_path) as f:
        got = json.load(f)["corpus_sha256"]
    if got != want:
        # ADVICE r3: regeneration overwrote the fingerprint with the
        # drifted one — restore the committed fingerprint so the next
        # chain's guard invocation still detects the drift instead of
        # silently matching the drifted corpus on disk.
        with open(fp_path, "w") as f:
            f.write(committed_blob)
        raise AssertionError(
            f"regenerated corpus fingerprint {got[:16]} != committed "
            f"{want[:16]} — generator or environment drifted; do NOT train "
            "against the committed eval artifacts (committed fingerprint "
            "restored)")
    print(f"regenerated bit-for-bit ({got[:16]}...)")


if __name__ == "__main__":
    main()
