"""Slope-method bench: int8-resident vs f32 student streaming inference.

Measures the distilled student (reference config: channels [8,16,32,64],
hidden 256 — predict_distillation regime) running `realtime_process`
over a 3 s / 3-mic utterance, comparing:

- f32 params (baseline)
- int8-resident params ({"q" int8, "scale"} as the compiled program's
  inputs, dequant traced into the program — ops/quant.py)

Timing uses the slope method (K1- vs K2-chained iterations inside one
jit; cancels the ~30 ms relay round trip — see CLAUDE.md). The chain
carries an accumulator that perturbs the input (dynamic value, not
constant-foldable) so every iteration re-executes the full forward.
Weight bytes are the device-resident parameter sizes.

    python tools/bench_int8.py          # needs the TPU (one process!)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def slope_time(make_step, params, k1=4, k2=16):
    """Seconds per iteration via chained-scan slope. ``make_step(p)``
    returns ``step(acc) -> acc`` — the unit of work, data-dependent on
    ``acc`` so the chain cannot collapse."""
    def chain(p, k):
        step = make_step(p)

        def body(acc, _):
            return step(acc), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=k)
        return acc

    j1 = jax.jit(lambda p: chain(p, k1))
    j2 = jax.jit(lambda p: chain(p, k2))
    for j in (j1, j2):
        np.asarray(j(params))  # compile + full sync (value fetch)
    ts = []
    for j in (j1, j2):
        t0 = time.perf_counter()
        np.asarray(j(params))
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (k2 - k1)


def main():
    from semi_tpu.models.crn import TemporalCRN
    from semi_tpu.ops.quant import dequantize_tree, quantize_tree

    model = TemporalCRN(num_channels=[8, 16, 32, 64], num_freqs=201,
                        hidden=256, segment_length=3200, num_layers=1,
                        num_inputs=3)
    params = model.init(jax.random.PRNGKey(0))
    qparams, _ = quantize_tree(params)
    mix = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 3, 48000)), jnp.float32) * 0.1

    def nbytes(tree):
        return sum(l.size * l.dtype.itemsize
                   for l in jax.tree_util.tree_leaves(tree))

    def step_f32(p):
        def step(acc):
            pred = model.realtime_process(
                p, None, mix + acc * 1e-30, flag=False)[0]
            return jnp.sum(pred)
        return step

    def step_int8(qp):
        def step(acc):
            pred = model.realtime_process(
                dequantize_tree(qp), None, mix + acc * 1e-30,
                flag=False)[0]
            return jnp.sum(pred)
        return step

    t_f32 = slope_time(step_f32, params)
    t_int8 = slope_time(step_int8, qparams)

    audio_s = mix.shape[-1] / 16000.0
    rows = [
        {"path": "f32", "s_per_call": t_f32, "xRT": audio_s / t_f32,
         "weight_bytes": nbytes(params)},
        {"path": "int8_resident", "s_per_call": t_int8,
         "xRT": audio_s / t_int8, "weight_bytes": nbytes(qparams)},
    ]
    for r in rows:
        print(json.dumps(r))
    out = "runs/bench_int8.json"
    os.makedirs("runs", exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
