"""Serving-throughput benchmark: many concurrent streams per core.

bench.py measures single-stream latency (xRT); production serving
batches independent streams, riding the MXU's batch dimension. This
reports enhanced audio-seconds per wall-second per core at several
batch sizes.

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

    model = TemporalCRN(
        num_channels=[16, 32, 64, 128], num_freqs=201, hidden=512,
        segment_length=3200, num_layers=2, num_inputs=3, kernel_size=3,
        remat=False,
    )
    params = model.init(jax.random.PRNGKey(0))
    seconds = 3.0
    length = int(seconds * 16000)

    results = {}
    for batch in (1, 4, 16):
        def make(k):
            xs = jax.random.normal(jax.random.PRNGKey(1),
                                   (k, batch, 3, length)) * 0.1

            @jax.jit
            def run(p):
                def body(acc, x):
                    y, _ = model.realtime_process(p, None, x, flag=False)
                    return acc + jnp.sum(y), None
                s, _ = jax.lax.scan(body, jnp.zeros(()), xs)
                return s
            return run

        def timed(run, reps=3):
            float(run(params))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run(params))
                best = min(best, time.perf_counter() - t0)
            return best

        k1, k2 = 3, 13
        per_iter = (timed(make(k2)) - timed(make(k1))) / (k2 - k1)
        results[batch] = batch * seconds / per_iter

    for b, xrt in results.items():
        print(json.dumps({"metric": f"throughput_audio_seconds_per_second_b{b}",
                          "value": round(xrt, 1), "unit": "audio_s/s"}))


if __name__ == "__main__":
    main()
