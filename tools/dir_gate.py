"""Gate for the directional-probe experiment: extend or stop?

Reads a stress-protocol eval artifact of TemporalCRN_dir, replays the
masker kinds (same fingerprint-pinned machinery as analyze_eval), and
exits 0 ("extend to the full regimen") iff the babble-row dSI-SDR
clears the threshold. The threshold defaults to +2.0 dB: every
reference architecture sits at +0.3..+1.1 dB on the babble items at
every training depth measured (BENCHMARKS failure-mode analysis), and
the directional-oracle ceiling analysis predicts the probe lands
there too — so clearing +2 dB would mean the trained model extracts
directional value the per-bin oracle cannot, and the remaining 36
epochs are worth their TPU hours.

    python tools/dir_gate.py runs/eval_dir_probe_stress.json \
        && echo EXTEND || echo STOP
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--config", default="./config_parity.yaml")
    ap.add_argument("--threshold_db", type=float, default=2.0)
    args = ap.parse_args()

    from analyze_eval import (check_replay_against_fingerprint,
                              item_noise_indices, noise_kind)
    from semi_tpu.utils.config import load_config

    art = json.load(open(args.artifact))
    lo, hi = art["test_snr"]
    config = load_config(args.config)
    idxs = item_noise_indices(config, len(art["items"]), lo, hi)
    check_replay_against_fingerprint(idxs[0])

    deltas = [r["enhanced"]["sisdr"] - r["noisy"]["sisdr"]
              for r, i in zip(art["items"], idxs)
              if noise_kind(i) == "babble"]
    babble = float(np.mean(deltas))
    print(f"babble n={len(deltas)} dSI-SDR {babble:+.2f} dB "
          f"(threshold {args.threshold_db:+.2f})")
    return 0 if babble >= args.threshold_db else 1


if __name__ == "__main__":
    sys.exit(main())
