"""Paired per-item comparison of two eval artifacts.

Every eval artifact (predict.py --out_json) scores the same fixed
held-out items in the same order, with the same per-item mixing draws
pinned by the corpus fingerprint + `test_snr` protocol — so two
artifacts at the SAME protocol are a paired sample: for each item i,
delta_i = improvement_B(i) - improvement_A(i), where improvement =
enhanced - noisy. The mean of delta_i with its stderr (and a sign
test) says whether B actually beats A, which the difference of two
table means cannot (between-item mixture variance dominates).

Usage:
    python tools/compare_evals.py runs/eval_A.json runs/eval_B.json

Prints, per axis (SI-SDR / STOI / WB-PESQ / NB-PESQ): mean paired
delta, stderr, the 95% CI, win/loss/tie counts, and a two-sided sign
test p-value (normal approximation). Refuses to compare artifacts with
different protocols (`test_snr`) or item counts — such a comparison
would not be paired.

No reference analog: /root/reference reports single-run means only.
"""

import json
import math
import sys

AXES = ["sisdr", "stoi", "pesq", "npesq"]


def paired_deltas(a, b):
    """Per-item (improvement_b - improvement_a) for each axis."""
    out = {ax: [] for ax in AXES}
    for ia, ib in zip(a["items"], b["items"]):
        if ia["item"] != ib["item"]:
            raise SystemExit(
                f"item mismatch: {ia['item']} vs {ib['item']} — artifacts "
                "do not score the same held-out sequence")
        # the NOISY columns must agree: same item + same protocol =>
        # identical mixture. A drift here means the corpus or mixing
        # changed between runs and the pairing is void.
        for ax in AXES:
            if abs(ia["noisy"][ax] - ib["noisy"][ax]) > 1e-6:
                raise SystemExit(
                    f"noisy {ax} differs on item {ia['item']} "
                    f"({ia['noisy'][ax]} vs {ib['noisy'][ax]}) — not the "
                    "same mixtures; refusing the paired comparison")
        for ax in AXES:
            imp_a = ia["enhanced"][ax] - ia["noisy"][ax]
            imp_b = ib["enhanced"][ax] - ib["noisy"][ax]
            out[ax].append(imp_b - imp_a)
    return out


def sign_test_p(wins, losses):
    """Two-sided sign test, normal approximation with continuity corr."""
    n = wins + losses
    if n == 0:
        return 1.0
    z = (abs(wins - n / 2.0) - 0.5) / math.sqrt(n / 4.0)
    # two-sided tail of the standard normal
    return max(0.0, min(1.0, math.erfc(z / math.sqrt(2.0))))


def main(path_a, path_b):
    a = json.load(open(path_a))
    b = json.load(open(path_b))
    proto_a, proto_b = a.get("test_snr"), b.get("test_snr")
    if proto_a is not None and proto_b is not None and proto_a != proto_b:
        raise SystemExit(
            f"protocol mismatch: {path_a} test_snr={proto_a} vs "
            f"{path_b} test_snr={proto_b} — a paired comparison needs "
            "the same mixing protocol")
    if proto_a is None or proto_b is None:
        # pre-pin artifact: the per-item noisy-column identity check
        # below still guarantees the mixtures are the same
        print("note: test_snr missing on one artifact (pre-pin); "
              "pairing validated by the per-item noisy columns instead")
    if len(a["items"]) != len(b["items"]):
        raise SystemExit(
            f"item count mismatch: {len(a['items'])} vs {len(b['items'])}")
    deltas = paired_deltas(a, b)
    n = len(a["items"])
    print(f"B - A paired on {n} items, protocol test_snr={proto_a}")
    print(f"  A = {a['model']}  {path_a}")
    print(f"  B = {b['model']}  {path_b}")
    for ax in AXES:
        d = deltas[ax]
        mean = sum(d) / n
        var = sum((x - mean) ** 2 for x in d) / (n - 1)
        se = math.sqrt(var / n)
        wins = sum(1 for x in d if x > 0)
        losses = sum(1 for x in d if x < 0)
        p = sign_test_p(wins, losses)
        lo, hi = mean - 1.96 * se, mean + 1.96 * se
        verdict = "B wins" if lo > 0 else ("A wins" if hi < 0 else "tie")
        print(f"  {ax:6s} mean {mean:+.4f}  se {se:.4f}  "
              f"95% [{lo:+.4f}, {hi:+.4f}]  W/L {wins}/{losses}  "
              f"sign-p {p:.3f}  -> {verdict}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2])
