"""Smoke coverage for the benchmark tools' driving machinery.

tools/bench_latency.py is a TPU timing tool; its *numbers* only mean
anything on hardware, but the harness around them (model construction
from config.yaml, the scan-carried continuation loop, the JSON
artifact) must keep working as the models evolve. SEMI_LAT_SMOKE runs
the identical code path with tiny K on CPU.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_latency_smoke(tmp_path):
    out = tmp_path / "lat.json"
    env = dict(os.environ,
               SEMI_LAT_SMOKE="1",
               SEMI_LAT_OUT=str(out),
               JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_latency.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        f"bench_latency failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")

    rows = json.loads(out.read_text())
    assert [r["model"] for r in rows] == ["TemporalCRN", "DistilledStudent"]
    for r in rows:
        # both models must actually run the chained continuation loop
        assert r.get("note") is None
        assert r["latency_ms"] is not None and r["latency_ms"] > 0
        assert r["chunk_ms"] == 200.0


def test_analyze_eval_replay_pins_fingerprint(tmp_path):
    """tools/analyze_eval.py must refuse to report if its seed replay
    drifts from the committed corpus (the crc32-vs-stable_tag bug
    class). Runs only when the generated corpus is on disk."""
    import pytest

    if not os.path.exists(os.path.join(REPO, "data", "corpus", "test",
                                       "noise", "test_noise_00000.wav")):
        pytest.skip("generated corpus not on disk")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "analyze_eval.py"),
         os.path.join(REPO, "runs", "eval_distill_stress.json"),
         "--config", os.path.join(REPO, "config_parity.yaml")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # all four masker kinds reported
    for k in ("impulse", "babble", "am", "pink"):
        assert k in proc.stdout


def test_mfu_helper_counts_flops():
    """semi_tpu.utils.mfu: HLO cost analysis sees the matmul FLOPs and
    the utilization arithmetic is sane (VERDICT r3 weak #3)."""
    import jax
    import jax.numpy as jnp

    from semi_tpu.utils.mfu import V5E_PEAK_FLOPS, forward_flops, mfu

    n = 256
    a = jnp.ones((n, n), jnp.float32)
    f = forward_flops(lambda x: x @ x, a)
    # a matmul is 2*n^3 FLOPs; cost analysis must land within 2x
    assert f is not None and 0.5 * 2 * n**3 <= f <= 2 * 2 * n**3
    # 1 GFLOP in 1 s on a 197 TFLOP/s chip
    assert abs(mfu(1e9, 1.0) - 1e9 / V5E_PEAK_FLOPS["bfloat16"]) < 1e-12
    assert mfu(None, 1.0) is None
