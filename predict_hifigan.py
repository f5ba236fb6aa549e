"""HiFi-GAN evaluation CLI (reference: Hifi-GAN/predict.py:15-126).

Loads the per-stage generator checkpoint and scores the post-postnet
output against the test pipeline, with the same RTF + metric deltas as
predict.py.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from semi_tpu.data.dataset import LibriPartyDataset
from semi_tpu.metrics.eval import si_sdr, stoi, wb_pesq
from semi_tpu.models.hifigan import HifiGAN
from semi_tpu.train.checkpoint import load_pytree
from semi_tpu.utils.config import load_config, validate_model_section


def main():
    parser = argparse.ArgumentParser(description="default")
    parser.add_argument("config_path", type=str)
    parser.add_argument("--stage", default=2, type=int, choices=(1, 2, 3))
    parser.add_argument("--user_defined_name", default="model", type=str)
    parser.add_argument("--num_items", default=None, type=int)
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

    dataset = LibriPartyDataset(config)
    dataset.set_attribute("test", augment=False, perturb=False)
    dataset.init_seed(0)

    run = jax.jit(lambda p, x: model.realtime_process(p, None, x,
                                                      flag=False)[0])
    total = args.num_items or len(dataset)
    d_sisdr = d_stoi = d_pesq = 0.0
    rtf_acc, rtf_count = 0.0, 0
    seen: set = set()
    for i in range(total):
        data = dataset[i]
        mix = jnp.asarray(data["mix"])
        src = np.asarray(data["source"][0, 0, 0])
        noisy = np.asarray(data["mix"][0, 0])
        warm = mix.shape[-1] in seen
        seen.add(mix.shape[-1])
        t0 = time.perf_counter()
        pred = np.asarray(run(params, mix))[0]
        if warm:
            rtf_acc += (time.perf_counter() - t0) * 16000.0 / mix.shape[-1]
            rtf_count += 1
        d_sisdr += si_sdr(src, pred) - si_sdr(src, noisy)
        d_stoi += stoi(src, pred) - stoi(src, noisy)
        d_pesq += wb_pesq(src, pred) - wb_pesq(src, noisy)
        n = i + 1
        print(f"[{n}/{total}] RTF={rtf_acc/max(rtf_count,1):.4f} "
              f"dSI-SDR={d_sisdr/n:+.2f} dSTOI={d_stoi/n:+.4f} "
              f"dPESQ~={d_pesq/n:+.3f}", flush=True)


if __name__ == "__main__":
    main()
