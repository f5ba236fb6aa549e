"""Measure the fused Pallas recurrent kernels vs the XLA scan path.

Honest value-fetch timing (block_until_ready lies through the relay;
see docs/BENCHMARKS.md). Run AFTER training frees the TPU.

    python tools/bench_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
    r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0].ravel()[:2]))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = fn(*args)
        float(jnp.sum(jax.tree.leaves(r)[0].ravel()[-2:]))
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def bench_rnn(cell: str, t: int, rows: int, h: int, in_dim: int = 0):
    from semi_tpu.ops.pallas.rnn_seq import (
        gru2_seq, gru2_seq_reference, lstm2_seq, lstm2_seq_reference)

    g = 3 if cell == "gru" else 4
    rng = np.random.default_rng(0)
    u = lambda *s: jnp.asarray(rng.uniform(-1, 1, s).astype(np.float32) /
                               np.sqrt(h))
    w = (u(h, g * h), u(g * h), u(h, g * h), u(g * h), u(h, g * h), u(g * h))
    gi1 = u(t, rows, g * h)
    h0 = u(2, rows, h)

    if cell == "gru":
        ker = jax.jit(lambda gi, h0: gru2_seq(gi, *w, h0))
        ref = jax.jit(lambda gi, h0: gru2_seq_reference(gi, *w, h0))
        t_k = timed(ker, gi1, h0)
        t_r = timed(ref, gi1, h0)
    else:
        c0 = u(2, rows, h)
        ker = jax.jit(lambda gi, h0, c0: lstm2_seq(gi, *w, h0, c0))
        ref = jax.jit(lambda gi, h0, c0: lstm2_seq_reference(gi, *w, h0, c0))
        t_k = timed(ker, gi1, h0, c0)
        t_r = timed(ref, gi1, h0, c0)
    print(f"{cell.upper()} T={t} rows={rows} H={h}: "
          f"pallas {t_k*1000:7.2f} ms  xla-scan {t_r*1000:7.2f} ms  "
          f"speedup {t_r/t_k:5.2f}x", flush=True)


def main():
    cases = [
        # CRN bottleneck: H=512 GRU, T = 41 chunks x 21 frames, B rows
        ("gru", 861, 1, 512), ("gru", 861, 8, 512), ("gru", 861, 32, 512),
        # FullSubNet sub-band LSTM: H=384, rows = B*201 sub-bands
        ("lstm", 861, 201, 384), ("lstm", 861, 804, 384),
        # FullSubNet full-band LSTM: H=512
        ("lstm", 861, 8, 512),
    ]
    for cell, t, rows, h in cases:
        try:
            bench_rnn(cell, t, rows, h, h)
        except Exception as e:
            print(f"{cell.upper()} T={t} rows={rows} H={h}: "
                  f"UNSUPPORTED ({type(e).__name__}: VMEM envelope)",
                  flush=True)


if __name__ == "__main__":
    main()
