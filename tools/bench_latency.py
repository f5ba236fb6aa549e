"""Per-chunk streaming LATENCY (slope method) — the deployment metric
xRT doesn't show.

xRT (bench.py, tools/bench_families.py) is throughput over a whole 3-s
utterance; a live streaming deployment instead feeds one 200 ms
segment (3200 samples, the reference's streaming unit, CRN_ELU.py
segment_length) per step with ``flag=True`` state carry, and cares
about the wall budget per step: the chunk must return in well under
200 ms or the stream falls behind.

Methodology: K continuation steps chained into one jit via lax.scan
with the streaming state as the scan carry — exactly the deployed
loop — and per-chunk latency = slope between a K1- and K2-step run
(cancels the relay round trip, see CLAUDE.md). This is device-side
step latency; a remote client would add its own link RTT on top.

    python tools/bench_latency.py       # TPU, ~10 min of compiles
Writes runs/bench_latency.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

CHUNK = 3200            # 200 ms @ 16 kHz — the streaming feed unit
CHUNK_MS = CHUNK / 16.0
# per-chunk work is ~0.1-2 ms, so the K gap must dwarf relay jitter
K1, K2 = 4, 404
if os.environ.get("SEMI_LAT_SMOKE"):  # CPU correctness smoke, not a timing
    K1, K2 = 2, 6


def slope_latency_ms(model, params):
    state0 = model.init_state(1)

    def make(k):
        xs = jax.random.normal(jax.random.PRNGKey(1), (k, 1, 3, CHUNK)) * 0.1

        @jax.jit
        def run(p):
            def body(carry, x):
                acc, st = carry
                y, st = model.realtime_process(p, st, x, flag=True)
                return (acc + jnp.sum(y.astype(jnp.float32)), st), None

            (total, _), _ = jax.lax.scan(body, (jnp.zeros(()), state0), xs)
            return total

        return run

    def timed(run, reps=3):
        float(run(params))  # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make(K1))
    t2 = timed(make(K2))
    return max((t2 - t1) / (K2 - K1), 1e-9) * 1e3


def main():
    from semi_tpu.utils.config import load_config
    from semi_tpu.models import build_model
    from semi_tpu.models.distillation import DistillationCRN

    config = load_config("./config.yaml")
    rows = []

    def bench(name, model):
        params = model.init(jax.random.PRNGKey(0))
        ms = slope_latency_ms(model, params)
        rows.append({
            "model": name,
            "chunk_ms": CHUNK_MS,
            "latency_ms": round(ms, 3),
            "headroom": round(CHUNK_MS / ms, 1),
        })
        print(f"{name}: {ms:.3f} ms per {CHUNK_MS:.0f} ms chunk "
              f"({CHUNK_MS / ms:.0f}x headroom)", flush=True)

    # flagship at inference settings (bf16, no remat, XLA scan — the
    # predict.py defaults; see bench.py for the kernel/dtype rationale)
    sect = dict(config["TemporalCRN"])
    sect["remat"] = False
    try:
        bench("TemporalCRN", build_model("TemporalCRN", sect))
    except Exception as e:
        rows.append({"model": "TemporalCRN", "latency_ms": None,
                     "note": f"{type(e).__name__}: {e}"})
        print(f"TemporalCRN: FAILED ({type(e).__name__}: {e})", flush=True)

    # the 0.8M distilled student — the production serving model
    try:
        m = DistillationCRN(**dict(config["TemporalCRN"]))
        bench("DistilledStudent", m)
    except Exception as e:
        rows.append({"model": "DistilledStudent", "latency_ms": None,
                     "note": f"{type(e).__name__}: {e}"})
        print(f"DistilledStudent: FAILED ({type(e).__name__}: {e})",
              flush=True)

    out = os.environ.get("SEMI_LAT_OUT", "runs/bench_latency.json")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
