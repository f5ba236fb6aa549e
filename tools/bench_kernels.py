"""Measure the fused Pallas recurrent kernels vs the XLA scan path.

Round-3 method (VERDICT r2 weak #2 — device-side numbers, not the
relay dispatch floor): run each path over a LONG sequence (T=8610,
10x the 3-s utterance) in ONE call so device compute dominates the
~40 ms dispatch floor, fetch only the tiny final hidden state (a large
output fetch would re-add link time), and subtract a measured
null-dispatch floor (a trivial jit timed the same way). Report
per-861-step times. This avoids the scan-of-pallas chains whose
compiles were pathologically slow through the relay compiler.

Writes runs/bench_kernels.json. Run when the TPU is free.

    python tools/bench_kernels.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

T_LONG = 8610  # 10 x (41 chunks x 21 frames)


def timed_h(fn, *args, reps=3):
    """Median wall seconds per call; syncs by fetching only arg-0 of the
    SMALL hidden-state output."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def dispatch_floor():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    return timed_h(f, x)


def bench_rnn(cell: str, rows: int, h: int, floor: float):
    from semi_tpu.ops.pallas.rnn_seq import (
        gru2_seq, gru2_seq_reference, lstm2_seq, lstm2_seq_reference)

    g = 3 if cell == "gru" else 4
    rng = np.random.default_rng(0)
    u = lambda *s: jnp.asarray(rng.uniform(-1, 1, s).astype(np.float32) /
                               np.sqrt(h))
    w = (u(h, g * h), u(g * h), u(h, g * h), u(g * h), u(h, g * h), u(g * h))
    # Scale T so the input stays ~<600 MB: big-rows cases have enough
    # device work per step that a shorter chain still swamps the floor.
    t_long = T_LONG
    while t_long > 861 and t_long * rows * g * h * 4 > 6e8:
        t_long //= 2
    # generate the long gate-input sequence ON DEVICE — shipping
    # multi-GB host arrays through the relay would dwarf the benchmark
    key = jax.random.PRNGKey(0)
    gi1 = jax.jit(lambda k: jax.random.uniform(
        k, (t_long, rows, g * h), jnp.float32, -1, 1) / np.sqrt(h))(key)
    np.asarray(gi1.ravel()[0])  # materialize before timing
    h0 = u(2, rows, h)
    c0 = u(2, rows, h)

    if cell == "gru":
        ker = jax.jit(lambda gi, hh: gru2_seq(gi, *w, hh)[1])
        ref = jax.jit(lambda gi, hh: gru2_seq_reference(gi, *w, hh)[1])
        t_k = timed_h(ker, gi1, h0)
        t_r = timed_h(ref, gi1, h0)
    else:
        ker = jax.jit(lambda gi, hh, cc: lstm2_seq(gi, *w, hh, cc)[1])
        ref = jax.jit(lambda gi, hh, cc: lstm2_seq_reference(gi, *w, hh, cc)[1])
        t_k = timed_h(ker, gi1, h0, c0)
        t_r = timed_h(ref, gi1, h0, c0)

    scale = 861 / t_long  # report per 3-s utterance worth of steps
    dk = max(t_k - floor, 1e-9) * scale
    dr = max(t_r - floor, 1e-9) * scale
    row = {"cell": cell, "rows": rows, "H": h, "T": t_long,
           "pallas_ms_per_861": dk * 1000, "xla_scan_ms_per_861": dr * 1000,
           "device_speedup": dr / dk,
           "wall_pallas_ms": t_k * 1000, "wall_xla_ms": t_r * 1000,
           "floor_ms": floor * 1000}
    print(f"{cell.upper()} rows={rows} H={h}: device/861 steps "
          f"pallas {dk*1000:7.2f} ms  xla-scan {dr*1000:7.2f} ms  "
          f"speedup {dr/dk:5.2f}x  (floor {floor*1000:.1f} ms)", flush=True)
    return row


def main():
    floor = dispatch_floor()
    print(f"dispatch floor: {floor*1000:.1f} ms", flush=True)
    cases = [
        # CRN bottleneck: H=512 GRU, rows = B streams
        ("gru", 1, 512), ("gru", 8, 512),
        # FullSubNet sub-band LSTM (B=1) and full-band LSTM
        ("lstm", 201, 384), ("lstm", 8, 512),
    ]
    rows = []
    for cell, r, h in cases:
        try:
            rows.append(bench_rnn(cell, r, h, floor))
        except Exception as e:
            print(f"{cell.upper()} rows={r} H={h}: UNSUPPORTED "
                  f"({type(e).__name__})", flush=True)
            rows.append({"cell": cell, "rows": r, "H": h,
                         "pallas_ms_per_861": None, "note": str(type(e).__name__)})
    # VMEM-envelope fallbacks, documented rather than timed
    rows.append({"cell": "gru", "rows": 32, "H": 512, "pallas_ms_per_861": None,
                 "note": "VMEM envelope — falls back to the XLA scan"})
    rows.append({"cell": "lstm", "rows": 804, "H": 384, "pallas_ms_per_861": None,
                 "note": "VMEM envelope — falls back to the XLA scan"})
    os.makedirs("runs", exist_ok=True)
    with open("runs/bench_kernels.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("-> runs/bench_kernels.json")


if __name__ == "__main__":
    main()
