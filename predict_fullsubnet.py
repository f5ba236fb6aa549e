"""FullSubNet evaluation CLI (reference: predict_fullsubnet.py:14-149).

Same harness as predict.py, pointed at FullSubNet. The reference's
latent bug — passing snr kwargs to a no-arg dataset constructor
(predict_fullsubnet.py:35 vs data_c.py:19) — is fixed here: the test
SNR range goes through set_attribute, which is where the reference's
values actually came from (data_c.py:37, 48-50).
"""

import argparse

from predict import predict

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="default")
    parser.add_argument("config_path", type=str)
    parser.add_argument("--user_defined_name", default="model", type=str)
    parser.add_argument("--num_items", default=None, type=int)
    parser.add_argument("--weights", default=None, type=str)
    parser.add_argument("--out_json", default=None, type=str)
    parser.add_argument("--snr_low", default=0.0, type=float)
    parser.add_argument("--snr_high", default=25.0, type=float)
    args = parser.parse_args()
    predict(args.config_path, "FullSubNet", args.user_defined_name,
            num_items=args.num_items, weights=args.weights,
            out_json=args.out_json,
            snr_low=args.snr_low, snr_high=args.snr_high)
