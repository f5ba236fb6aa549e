"""Shared eval loop (predict.evaluate_streaming): artifact schema and
metric accounting.

Pins the per-item JSON artifact contract every predict CLI emits —
including both PESQ modes, mirroring the reference report
(predict.py:105-118: WB- and NB-PESQ for enhanced AND noisy).
"""

import copy
import json

import numpy as np

from tests.test_trainer import TINY_CONFIG

METRIC_KEYS = ("sisdr", "stoi", "pesq", "npesq")


def test_eval_artifact_schema(tmp_path):
    from predict import evaluate_streaming

    cfg = copy.deepcopy(TINY_CONFIG)

    # identity "model": return mic 0 of the mixture unchanged
    def run(params, mix):
        return np.asarray(mix)[:, 0]

    out = tmp_path / "eval.json"
    means = evaluate_streaming(run, None, cfg, "Identity", "none",
                               num_items=2, out_json=str(out))

    art = json.loads(out.read_text())
    assert art["model"] == "Identity" and art["num_items"] == 2
    # mixing range is part of the artifact: evals at different operating
    # points (e.g. the -5..5 dB stress protocol) must be distinguishable
    assert art["test_snr"] == [0.0, 25.0]
    assert len(art["items"]) == 2
    for row in art["items"]:
        for side in ("noisy", "enhanced"):
            assert sorted(row[side]) == sorted(METRIC_KEYS)
            # identity enhancement: both sides scored on the same signal
            for k in METRIC_KEYS:
                assert np.isclose(row[side][k], row["noisy"][k]), (side, k)

    # means: d_* = a_* - b_* per metric, all present plus rtf
    expect = {f"{p}_{k}" for p in "dba" for k in METRIC_KEYS} | {"rtf"}
    assert set(means) == expect == set(art["means"])
    for k in METRIC_KEYS:
        assert abs(means[f"d_{k}"]) < 1e-9  # identity => zero delta
        got = np.mean([r["noisy"][k] for r in art["items"]])
        assert np.isclose(means[f"b_{k}"], got)


def test_eval_snr_override_changes_operating_point(tmp_path):
    """--snr_low/--snr_high actually re-pin the test mixing range: the
    same items mixed at -5..-5 dB must score a much lower noisy SI-SDR
    than at +25..+25 dB (stress protocol vs near-clean)."""
    from predict import evaluate_streaming

    cfg = copy.deepcopy(TINY_CONFIG)

    def run(params, mix):
        return np.asarray(mix)[:, 0]

    lo = evaluate_streaming(run, None, cfg, "Identity", "none", num_items=2,
                            out_json=str(tmp_path / "lo.json"),
                            snr_low=-5.0, snr_high=-5.0)
    hi = evaluate_streaming(run, None, cfg, "Identity", "none", num_items=2,
                            out_json=str(tmp_path / "hi.json"),
                            snr_low=25.0, snr_high=25.0)
    assert lo["b_sisdr"] < hi["b_sisdr"] - 10.0
    art = json.loads((tmp_path / "lo.json").read_text())
    assert art["test_snr"] == [-5.0, -5.0]
