"""HiFi-GAN evaluation CLI (reference: Hifi-GAN/predict.py:15-126).

Loads the per-stage generator checkpoint and scores the post-postnet
output against the test pipeline, with the same RTF + metric deltas as
predict.py.
"""

from __future__ import annotations

import argparse
import os

import jax

from semi_tpu.models.hifigan import HifiGAN
from semi_tpu.train.checkpoint import load_pytree
from semi_tpu.utils.config import load_config, validate_model_section


def main():
    parser = argparse.ArgumentParser(description="default")
    parser.add_argument("config_path", type=str)
    parser.add_argument("--stage", default=2, type=int, choices=(1, 2, 3))
    parser.add_argument("--user_defined_name", default="model", type=str)
    parser.add_argument("--num_items", default=None, type=int)
    parser.add_argument("--out_json", default=None, type=str,
                        help="Write per-item + mean metrics as JSON")
    parser.add_argument("--snr_low", default=0.0, type=float,
                        help="Test-split mixing SNR low bound (dB)")
    parser.add_argument("--snr_high", default=25.0, type=float,
                        help="Test-split mixing SNR high bound (dB)")
    args = parser.parse_args()

    config = load_config(args.config_path)
    section = validate_model_section(HifiGAN, config["Hifi_GAN"], "Hifi_GAN")
    model = HifiGAN(**section)
    params = model.init(jax.random.PRNGKey(0))

    ckpt = os.path.join(config["config"]["checkpoint_dir"],
                        f"stage{args.stage}", args.user_defined_name,
                        "Hifi_GAN.npz")
    if os.path.exists(ckpt):
        params = load_pytree(ckpt, params)
        print(f"loaded weights from {ckpt}")
    else:
        print(f"WARNING: no checkpoint at {ckpt}; evaluating random init")

    run = jax.jit(lambda p, x: model.realtime_process(p, None, x,
                                                      flag=False)[0])
    from predict import evaluate_streaming

    evaluate_streaming(run, params, config, f"Hifi_GAN[stage{args.stage}]",
                       ckpt, num_items=args.num_items,
                       out_json=args.out_json,
                       snr_low=args.snr_low, snr_high=args.snr_high)


if __name__ == "__main__":
    main()
