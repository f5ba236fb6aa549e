"""Serving-throughput benchmark: many concurrent streams per core.

bench.py measures single-stream latency (xRT); production serving
batches independent streams, riding the MXU's batch dimension. This
reports enhanced audio-seconds per wall-second per core AND the model
FLOP utilization (MFU) at each batch size — executing the roofline
conclusion of docs/BENCHMARKS.md "MFU accounting" (single-stream
streaming is latency-bound at ~3.6%; the batch dimension is the lever,
VERDICT r4 next #4).

Env:
    SEMI_BENCH_DTYPE=float32|bfloat16   network compute (default bf16)
    SEMI_BENCH_STFT_DTYPE=bfloat16      bf16 end-to-end (DFT matmuls too)

Run standalone (one TPU process at a time):
    python benchmarks/throughput.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp


def main():
    from semi_tpu.models.crn import TemporalCRN
    from semi_tpu.utils.mfu import forward_flops, mfu

    dtype = os.environ.get("SEMI_BENCH_DTYPE", "bfloat16")
    stft_dtype = os.environ.get("SEMI_BENCH_STFT_DTYPE") or None
    model = TemporalCRN(
        num_channels=[16, 32, 64, 128], num_freqs=201, hidden=512,
        segment_length=3200, num_layers=2, num_inputs=3, kernel_size=3,
        remat=False, compute_dtype=dtype, stft_dtype=stft_dtype,
    )
    params = model.init(jax.random.PRNGKey(0))
    seconds = 3.0
    length = int(seconds * 16000)

    x1 = jax.random.normal(jax.random.PRNGKey(2), (1, 3, length)) * 0.1
    flops1 = forward_flops(
        lambda p, x: model.realtime_process(p, None, x, flag=False)[0],
        params, x1)

    # inputs passed as runtime ARGS, not closure constants: baked
    # constants ship to the remote compile service and large batches
    # trip its request-body limit (HTTP 413)
    @jax.jit
    def run_batch(p, xs):
        def body(acc, x):
            y, _ = model.realtime_process(p, None, x, flag=False)
            return acc + jnp.sum(y), None
        s, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return s

    for batch in (1, 4, 16, 32, 64, 128):
        def make(k):
            xs = jax.device_put(
                jax.random.normal(jax.random.PRNGKey(1),
                                  (k, batch, 3, length),
                                  dtype=jnp.float32) * 0.1)
            return lambda p: run_batch(p, xs)

        def timed(run, reps=3):
            float(run(params))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run(params))
                best = min(best, time.perf_counter() - t0)
            return best

        # keep the iteration-count gap wide enough to swamp relay
        # jitter but bound the on-device input buffer at large B
        k1 = 2
        k2 = k1 + max(6, 192 // batch)
        per_iter = (timed(make(k2)) - timed(make(k1))) / (k2 - k1)
        util = mfu(flops1 * batch, per_iter,
                   dtype=("bfloat16" if dtype == "bfloat16" else "float32"))
        print(json.dumps({
            "metric": f"serving_throughput_b{batch}",
            "value": round(batch * seconds / per_iter, 1),
            "unit": "audio_s/s",
            "mfu": round(util, 4) if util is not None else None,
            "compute_dtype": dtype,
            "stft_dtype": stft_dtype or "follow-input(f32)",
        }), flush=True)


if __name__ == "__main__":
    main()
