"""Training CLI, argument-compatible with the reference train.py.

Usage (reference: train.py:271-282):
    python train.py TemporalCRN ./config.yaml --user_defined_name crn \
        [--resume True] [--stage 0]

``--gpu`` and ``--local_rank`` are accepted for CLI parity and ignored:
device placement is JAX's job (the local mesh is used automatically;
see semi_tpu/parallel for multi-chip).
"""

import argparse

from semi_tpu.train.processor import Processor


def main():
    parser = argparse.ArgumentParser(description="default")
    parser.add_argument("name", type=str,
                        help="Model name, e.g. TemporalCRN / GTSA / FullSubNet")
    parser.add_argument("config_path", type=str, help='Config path of "*.yaml"')
    parser.add_argument("--gpu", type=int, nargs="+", default=None,
                        help="(ignored; kept for CLI parity)")
    parser.add_argument("--stage", default=0, type=int,
                        help="Training stage, 0 for denoise")
    parser.add_argument("--resume", default=False, type=bool,
                        help="Continue from saved checkpoints")
    parser.add_argument("--user_defined_name", default="model", type=str,
                        help="Run name for logs and checkpoints")
    parser.add_argument("--local_rank", default=-1, type=int,
                        help="(ignored; kept for CLI parity)")
    args = parser.parse_args()

    processor = Processor(args.name, args.config_path,
                          user_defined_name=args.user_defined_name)
    processor.train(stage=args.stage, resume=args.resume)


if __name__ == "__main__":
    main()
