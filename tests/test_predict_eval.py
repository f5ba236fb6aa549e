"""Shared eval loop (predict.evaluate_streaming): artifact schema and
metric accounting.

Pins the per-item JSON artifact contract every predict CLI emits —
including both PESQ modes, mirroring the reference report
(predict.py:105-118: WB- and NB-PESQ for enhanced AND noisy).
"""

import copy
import json

import numpy as np
import pytest

from tests.test_trainer import TINY_CONFIG

pytestmark = pytest.mark.core

METRIC_KEYS = ("sisdr", "stoi", "pesq", "npesq", "mcd")


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


def test_compare_evals_paired_guards_and_stats(tmp_path, capsys):
    """tools/compare_evals.py: paired per-item stats with hard pairing
    guards — refuses protocol or mixture drift, reports the paired mean
    (NOT the difference of means, which between-item variance washes
    out)."""
    import pytest

    from tools.compare_evals import main as compare

    def art(path, test_snr, enh_shift, noisy_jitter=0.0):
        rows = []
        for i in range(12):
            noisy = {k: 1.0 + 0.5 * i + noisy_jitter for k in METRIC_KEYS}
            enh = {k: noisy[k] + 0.2 + (enh_shift if k == "sisdr" else 0.0)
                   for k in METRIC_KEYS}
            rows.append({"item": i, "noisy": noisy, "enhanced": enh})
        (tmp_path / path).write_text(json.dumps(
            {"model": "T", "test_snr": test_snr, "items": rows}))
        return str(tmp_path / path)

    a = art("a.json", [0.0, 25.0], enh_shift=0.0)
    b = art("b.json", [0.0, 25.0], enh_shift=0.1)
    compare(a, b)
    out = capsys.readouterr().out
    # constant +0.1 sisdr paired delta, zero variance, B wins; the other
    # axes are exact ties
    assert "sisdr  mean +0.1000" in out and "B wins" in out
    assert "stoi   mean +0.0000" in out

    # protocol drift refused
    c = art("c.json", [-5.0, 5.0], enh_shift=0.0)
    with pytest.raises(SystemExit, match="protocol mismatch"):
        compare(a, c)

    # same protocol label but different mixtures: noisy columns differ
    d = art("d.json", [0.0, 25.0], enh_shift=0.0, noisy_jitter=0.01)
    with pytest.raises(SystemExit, match="noisy sisdr differs"):
        compare(a, d)
