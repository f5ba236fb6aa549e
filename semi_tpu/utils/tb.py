"""TensorBoard-compatible scalar logging.

Uses torch.utils.tensorboard when available (tag-compatible with the
reference's dashboards: ``{mode}_loss/{mode}_{loss,logmse,sisnr}``,
train.py:216-234), otherwise falls back to a JSONL writer with the same
tag structure so logs are never silently dropped.
"""

from __future__ import annotations

import json
import os
import time

__all__ = ["ScalarWriter"]


class ScalarWriter:
    def __init__(self, log_dir: str, purge_step: int | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir, purge_step=purge_step)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}) + "\n")

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
        else:
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.close()
