"""HiFi-GAN training CLI (reference: Hifi-GAN/train.py:321-336).

Usage:
    python train_hifigan.py ./config.yaml --stage 1 --user_defined_name gan
    python train_hifigan.py ./config.yaml --stage 3 --load_model True
"""

import argparse

from semi_tpu.train.gan import GanProcessor


def main():
    parser = argparse.ArgumentParser(description="default")
    parser.add_argument("config_path", type=str)
    parser.add_argument("--stage", default=1, type=int, choices=(1, 2, 3))
    parser.add_argument("--resume", default=False, type=bool)
    parser.add_argument("--load_model", default=False, type=bool,
                        help="Warm-start stage N from stage N-1's checkpoint")
    parser.add_argument("--user_defined_name", default="model", type=str)
    parser.add_argument("--gpu", type=int, nargs="+", default=None,
                        help="(ignored; kept for CLI parity)")
    args = parser.parse_args()

    proc = GanProcessor(args.config_path,
                        user_defined_name=args.user_defined_name)
    proc.train(stage=args.stage, resume=args.resume,
               load_model=args.load_model)


if __name__ == "__main__":
    main()
