"""Distillation training CLI (reference: train_distillation.py:263-276).

Builds DistillationCRN from the TemporalCRN config section with the
teacher checkpoint under ``modules/denoise/<udn>/TemporalCRN.npz``,
trains the student + connectors, and saves under ``dillations/``.
"""

import argparse

from semi_tpu.train.processor import Processor

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="default")
    parser.add_argument("name", type=str, nargs="?", default="DistillationCRN")
    parser.add_argument("config_path", type=str)
    parser.add_argument("--stage", default=0, type=int)
    parser.add_argument("--resume", default=False, type=bool)
    parser.add_argument("--user_defined_name", default="model", type=str)
    parser.add_argument("--gpu", type=int, nargs="+", default=None)
    parser.add_argument("--local_rank", default=-1, type=int)
    args = parser.parse_args()
    Processor("DistillationCRN", args.config_path,
              user_defined_name=args.user_defined_name).train(
        stage=args.stage, resume=args.resume)
