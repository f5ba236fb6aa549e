"""Materialize noisy/reference wav pairs from the test pipeline
(reference: data_c.py:256-264 generate_testdataset).

    python tools/generate_testdataset.py ./config.yaml --out_dir data/testset \
        --num_items 100
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config_path", type=str)
    parser.add_argument("--out_dir", default="./testset", type=str)
    parser.add_argument("--num_items", default=100, type=int)
    args = parser.parse_args()

    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.data.wav import write_wav
    from semi_tpu.metrics.eval import si_sdr
    from semi_tpu.utils.config import load_config

    config = load_config(args.config_path)
    dataset = LibriPartyDataset(config)
    dataset.set_attribute("test", augment=False)
    dataset.init_seed(0)

    os.makedirs(os.path.join(args.out_dir, "noisy"), exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "ref"), exist_ok=True)

    for i in range(args.num_items):
        data = dataset[i]
        noisy = np.asarray(data["mix"][0, 0])
        ref = np.asarray(data["source"][0, 0, 0])
        snr = si_sdr(ref, noisy)
        write_wav(os.path.join(args.out_dir, "noisy", f"{i}_{snr:.1f}.wav"),
                  noisy, config["config"]["sample_rate"])
        write_wav(os.path.join(args.out_dir, "ref", f"{i}_{snr:.1f}.wav"),
                  ref, config["config"]["sample_rate"])
        print(f"item {i}: SI-SDR(noisy) = {snr:.2f} dB", flush=True)


if __name__ == "__main__":
    main()
