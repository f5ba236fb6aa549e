"""Guard: make sure the synthetic corpus exists before a run chain.

The corpus wavs (``data/corpus``, ~450 MB) are gitignored; only the
manifests and ``data/corpus_fingerprint.json`` are committed. A fresh
checkout — or a wiped workspace, the failure actually hit in round 3:
the run chain crashed on the first wav read after the environment
recycled — must regenerate them before any train/predict CLI runs.

This script is cheap when the corpus is present (existence + size check
against the committed fingerprint; pass ``--hash`` to verify content
sha256 of every file, ~10 s) and regenerates bit-for-bit via
tools/generate_corpus.py when anything is missing (crc32-seeded, ~90 s;
the regenerated corpus_sha256 is asserted against the committed one).

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

    missing = 0
    for rel, sha in fp["files"].items():
        # fingerprint paths are relative to csv_dir (e.g. "corpus/dev/...")
        path = os.path.join(args.csv_dir, rel)
        if not os.path.exists(path):
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
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "tools", "generate_corpus.py"),
                    "--csv_dir", args.csv_dir,
                    "--out_dir", os.path.join(args.csv_dir, "corpus")],
                   check=True)
    with open(fp_path) as f:
        got = json.load(f)["corpus_sha256"]
    assert got == want, (
        f"regenerated corpus fingerprint {got[:16]} != committed "
        f"{want[:16]} — generator or environment drifted; do NOT train "
        "against the committed eval artifacts")
    print(f"regenerated bit-for-bit ({got[:16]}...)")


if __name__ == "__main__":
    main()
