"""Evaluation / streaming-serve CLI, mirroring the reference predict.py.

Usage (reference: predict.py:182-191):
    python predict.py ./config.yaml TemporalCRN --user_defined_name crn

Streams the test split through ``realtime_process``, measures the
real-time factor (RTF = wall x 16000 / samples, predict.py:91-94), and
reports SI-SDR / STOI / PESQ for enhanced vs noisy with running
delta/before/after means (predict.py:105-148). RTF is a first-class
reported stat (the BASELINE.json north-star metric).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from semi_tpu.data.dataset import LibriPartyDataset
from semi_tpu.metrics.eval import mcd, nb_pesq, si_sdr, stoi, wb_pesq
from semi_tpu.models import build_model
from semi_tpu.train.checkpoint import load_pytree
from semi_tpu.utils.config import load_config


def evaluate_streaming(run, params, config, model_name: str, ckpt: str,
                       num_items: int | None = None,
                       profile_dir: str | None = None,
                       dump_dir: str | None = None,
                       out_json: str | None = None,
                       snr_low: float = 0.0, snr_high: float = 25.0,
                       enroll_len: int = 0, enroll_mode: str = "self"):
    """Shared eval loop: stream the test split through ``run(params, mix)``.

    Reports SI-SDR / STOI / PESQ before/after and RTF (compile excluded),
    and optionally writes the committable per-item JSON artifact. Reused
    by predict.py and predict_distillation.py so every family's eval
    produces the same artifact schema.

    snr_low/snr_high re-pin the test split's mixing range (the
    reference's 0-25 dB, data_c.py:48-50, is the default); a narrow low
    range (e.g. -5..5) is the stress protocol that evaluates at the
    noisy operating point instead of diluting deltas with near-clean
    items.
    """
    dataset = LibriPartyDataset(config)
    dataset.set_attribute("test", augment=False, perturb=False,
                          snr_low=snr_low, snr_high=snr_high)
    dataset.init_seed(0)

    total = num_items or len(dataset)
    sums = {k: 0.0 for k in
            ("d_sisdr", "b_sisdr", "a_sisdr", "d_stoi", "b_stoi", "a_stoi",
             "d_pesq", "b_pesq", "a_pesq",
             "d_npesq", "b_npesq", "a_npesq",
             "d_mcd", "b_mcd", "a_mcd")}
    rtf_acc, count, rtf_count = 0.0, 0, 0
    seen_lengths: set = set()
    rows: list = []

    for i in range(total):
        data = dataset[i]
        mix = jnp.asarray(data["mix"])          # [1, M, L]
        src = np.asarray(data["source"][0, 0, 0])  # mic0 reverberant target
        noisy = np.asarray(data["mix"][0, 0])
        if enroll_len:
            # speaker-conditioned families (wants_enroll): append the
            # enrollment channel. Modes:
            #   self      — last enroll_len ACTIVE samples of the
            #               reverberant target image (round-3 upper
            #               bound; leaks the target)
            #   separate  — dry clean wav of a DIFFERENT utterance of
            #               the target speaker (deployable; corpus v3)
            #   nontarget — a different SPEAKER's utterance (negative
            #               control: identity-using models must degrade)
            chan = np.zeros((1, 1, mix.shape[-1]), np.float32)
            if enroll_mode == "self":
                nz = np.nonzero(np.abs(src) > 1e-7)[0]
                end = int(nz[-1]) + 1 if len(nz) else len(src)
                el = min(enroll_len, end)
                chan[0, 0, :el] = src[end - el:end]
            else:
                enr = dataset.enroll_for_item(i, enroll_mode, enroll_len)
                # ADVICE r4: clamp like the self branch — a test piece
                # shorter than enroll_len must not broadcast-error
                el = min(enroll_len, mix.shape[-1])
                chan[0, 0, :el] = enr[:el]
            mix = jnp.concatenate([mix, jnp.asarray(chan)], axis=1)

        # first occurrence of a length compiles; exclude it from RTF
        warm = mix.shape[-1] in seen_lengths
        seen_lengths.add(mix.shape[-1])

        # profiling hook (SURVEY.md §5.1: first-class tracing): capture a
        # device trace of one representative utterance
        if profile_dir and i == 1:
            with jax.profiler.trace(profile_dir):
                jax.block_until_ready(run(params, mix))
            print(f"profiler trace written to {profile_dir}")

        t0 = time.perf_counter()
        pred = np.asarray(run(params, mix))[0]
        dt = time.perf_counter() - t0
        if warm:
            rtf_acc += dt * 16000.0 / mix.shape[-1]
            rtf_count += 1

        if dump_dir:
            from semi_tpu.data.wav import write_wav

            os.makedirs(dump_dir, exist_ok=True)
            write_wav(os.path.join(dump_dir, f"{i}_enhanced.wav"), pred)
            write_wav(os.path.join(dump_dir, f"{i}_noisy.wav"), noisy)
            write_wav(os.path.join(dump_dir, f"{i}_ref.wav"), src)

        # both PESQ modes, like the reference report (predict.py:105-118):
        # wb = P.862.2, npesq = true 8 kHz 42-band narrowband P.862
        m_after = {
            "sisdr": si_sdr(src, pred),
            "stoi": stoi(src, pred, 16000),
            "pesq": wb_pesq(src, pred),
            "npesq": nb_pesq(src, pred),
            "mcd": mcd(src, pred),
        }
        m_before = {
            "sisdr": si_sdr(src, noisy),
            "stoi": stoi(src, noisy, 16000),
            "pesq": wb_pesq(src, noisy),
            "npesq": nb_pesq(src, noisy),
            "mcd": mcd(src, noisy),
        }
        count += 1
        for k in ("sisdr", "stoi", "pesq", "npesq", "mcd"):
            sums[f"b_{k}"] += m_before[k]
            sums[f"a_{k}"] += m_after[k]
            sums[f"d_{k}"] += m_after[k] - m_before[k]
        rows.append({"item": i,
                     "noisy": {k: float(v) for k, v in m_before.items()},
                     "enhanced": {k: float(v) for k, v in m_after.items()}})

        print(f"[{i+1}/{total}] RTF={rtf_acc/max(rtf_count,1):.4f} "
              f"SI-SDR {sums['b_sisdr']/count:+.2f} -> {sums['a_sisdr']/count:+.2f} "
              f"(d {sums['d_sisdr']/count:+.2f}) | "
              f"STOI {sums['b_stoi']/count:.4f} -> {sums['a_stoi']/count:.4f} "
              f"(d {sums['d_stoi']/count:+.4f}) | "
              f"PESQ~ {sums['b_pesq']/count:.3f} -> {sums['a_pesq']/count:.3f} "
              f"(d {sums['d_pesq']/count:+.3f}) | "
              f"NB {sums['b_npesq']/count:.3f} -> {sums['a_npesq']/count:.3f} "
              f"(d {sums['d_npesq']/count:+.3f}) | "
              f"MCD {sums['b_mcd']/count:.2f} -> {sums['a_mcd']/count:.2f} "
              f"(d {sums['d_mcd']/count:+.2f})", flush=True)

    rtf = rtf_acc / max(rtf_count, 1)
    print(f"\nFinal over {count} items ({rtf_count} timed, compile excluded): "
          f"RTF={rtf:.4f} ({1.0/max(rtf,1e-9):.1f}x real-time)")
    result = {k: v / max(count, 1) for k, v in sums.items()} | {
        "rtf": rtf_acc / max(rtf_count, 1)}
    if out_json:
        # committable eval artifact (reproducibility: VERDICT r2 missing #3)
        import json

        os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
        with open(out_json, "w") as f:
            json.dump({"model": model_name, "weights": ckpt,
                       "num_items": count,
                       "test_snr": [snr_low, snr_high],
                       "enroll_mode": enroll_mode if enroll_len else None,
                       "items": rows,
                       "means": result}, f, indent=2)
        print(f"eval artifact -> {out_json}")
    return result


def predict(config_path: str, model_name: str, user_defined_name: str,
            num_items: int | None = None, weights: str | None = None,
            profile_dir: str | None = None, dump_dir: str | None = None,
            out_json: str | None = None, quantize: bool = False,
            snr_low: float = 0.0, snr_high: float = 25.0,
            enroll_mode: str = "self", stft_dtype: str | None = None):
    config = load_config(config_path)
    from semi_tpu.models import MODEL_REGISTRY

    if model_name not in config:
        raise SystemExit(
            f"error: no config section for model '{model_name}'; "
            f"registered models: {sorted(MODEL_REGISTRY)}")
    # Inference default: XLA scan. The fused Pallas kernels win in
    # isolation at rows<=8 but HALVE whole-model xRT when composed
    # into the CRN program (custom-call fusion barrier; measured
    # 1118x -> 560x — rnn_seq.pallas_profitable CAVEAT). Opt in per
    # model section with use_pallas_gru/use_pallas_rnn for standalone
    # RNN serving.
    section = dict(config[model_name])
    model = build_model(model_name, section)
    if stft_dtype:
        # bf16 end-to-end inference (VERDICT r4 next #4): DFT matmuls
        # at this dtype; quality parity measured by the paired
        # runs/eval_bf16_stft* artifacts, not assumed
        import jax.numpy as _jnp
        model.stft_dtype = _jnp.dtype(stft_dtype)
    params = model.init(jax.random.PRNGKey(0))

    ckpt = weights or os.path.join(
        config["config"]["checkpoint_dir"], "denoise", user_defined_name,
        model_name + ".npz")
    if os.path.exists(ckpt):
        params = load_pytree(ckpt, params)
        print(f"loaded weights from {ckpt}")
    else:
        print(f"WARNING: no checkpoint at {ckpt}; evaluating random init")

    tag = model_name
    if quantize:
        # int8-RESIDENT inference for ANY family (generalizes the
        # distilled student's path, predict_distillation.py): RNN/Linear
        # 2-D weights live in HBM as int8 + per-row scales and are the
        # jitted program's INPUTS; dequantization compiles into the
        # consuming matmuls. On the weight-bandwidth-bound streaming GRU
        # chain this halves recurrent weight traffic vs bf16.
        from semi_tpu.ops.quant import dequantize_tree, quantize_tree

        def _bytes(tree):
            return sum(l.size * l.dtype.itemsize
                       for l in jax.tree_util.tree_leaves(tree))

        f32_bytes = _bytes(params)
        params, _ = quantize_tree(params)
        print(f"int8-resident {model_name}: device weight bytes "
              f"{f32_bytes} -> {_bytes(params)} "
              f"({_bytes(params) / f32_bytes:.2f}x)")
        run = jax.jit(lambda qp, x: model.realtime_process(
            dequantize_tree(qp), None, x, flag=False)[0])
        tag = model_name + "[int8]"
    else:
        run = jax.jit(
            lambda p, x: model.realtime_process(p, None, x, flag=False)[0])
    return evaluate_streaming(run, params, config, tag, ckpt,
                              num_items=num_items, profile_dir=profile_dir,
                              dump_dir=dump_dir, out_json=out_json,
                              snr_low=snr_low, snr_high=snr_high,
                              enroll_len=(model.enroll_len if
                                          getattr(model, "wants_enroll",
                                                  False) else 0),
                              enroll_mode=enroll_mode)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="default")
    parser.add_argument("config_path", type=str)
    parser.add_argument("name", type=str, help="Model name")
    parser.add_argument("--user_defined_name", default="model", type=str)
    parser.add_argument("--num_items", default=None, type=int,
                        help="Limit number of test items (default: full split)")
    parser.add_argument("--weights", default=None, type=str,
                        help="Explicit checkpoint path override")
    parser.add_argument("--profile_dir", default=None, type=str,
                        help="Write a jax.profiler trace of one utterance")
    parser.add_argument("--dump_dir", default=None, type=str,
                        help="Write enhanced/noisy/ref wavs per item")
    parser.add_argument("--out_json", default=None, type=str,
                        help="Write per-item + mean metrics as JSON")
    parser.add_argument("--quantize", action="store_true",
                        help="int8-resident RNN/Linear weights "
                             "(dequant fused into the compiled program)")
    parser.add_argument("--snr_low", default=0.0, type=float,
                        help="Test-split mixing SNR low bound (dB)")
    parser.add_argument("--snr_high", default=25.0, type=float,
                        help="Test-split mixing SNR high bound (dB)")
    parser.add_argument("--stft_dtype", default=None, type=str,
                        choices=(None, "bfloat16", "float32"),
                        help="run the DFT matmuls at this dtype "
                             "(bfloat16 = fully-bf16 inference program)")
    parser.add_argument("--enroll_mode", default="self", type=str,
                        choices=("self", "separate", "nontarget"),
                        help="speaker-conditioned families: enrollment "
                             "source (self=target's own image [leaks], "
                             "separate=sibling utterance, nontarget="
                             "different speaker [negative control])")
    args = parser.parse_args()
    predict(args.config_path, args.name, args.user_defined_name,
            num_items=args.num_items, weights=args.weights,
            profile_dir=args.profile_dir, dump_dir=args.dump_dir,
            out_json=args.out_json, quantize=args.quantize,
            snr_low=args.snr_low, snr_high=args.snr_high,
            enroll_mode=args.enroll_mode, stft_dtype=args.stft_dtype)
