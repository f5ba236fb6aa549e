"""Checkpointing with the reference's directory contract.

Layout (reference: train.py:77-126):
    ``<checkpoint_dir>/<stage>/<user_defined_name>/``
        ``<ModelName>.npz``   — model params (saved on dev-loss improvement)
        ``optimizer.npz``     — full TrainState minus params
        ``Epoch.json``        — {Epoch, Train_Step, Dev_Step, Last_Loss}

Pytrees are stored as flat npz with key-path names (no pickle), restored
against a template so dtype/shape mismatches fail loudly.
"""

from __future__ import annotations

import concurrent.futures
import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "save_counters", "load_counters",
           "AsyncCheckpointWriter"]


def _flatten(tree) -> dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves:
        out[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return out


def _write_npz(path: str, flat: dict[str, np.ndarray]) -> None:
    # atomic: a crash mid-save must never corrupt the previous good
    # checkpoint (np.savez truncates in place otherwise)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"  # .npz suffix so np.savez appends nothing
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def save_pytree(path: str, tree: Any) -> None:
    _write_npz(path, _flatten(tree))


def load_pytree(path: str, template: Any) -> Any:
    data = np.load(path)
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for key_path, tmpl in paths:
        key = jax.tree_util.keystr(key_path)
        if key not in data.files:
            raise KeyError(f"checkpoint {path} missing leaf {key}")
        arr = data[key]
        if tuple(arr.shape) != tuple(np.shape(tmpl)):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs template "
                f"{np.shape(tmpl)}")
        leaves.append(arr.astype(np.asarray(tmpl).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_counters(path: str, epoch: int, train_step: int, dev_step: int,
                  last_loss: float) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"Epoch": epoch, "Train_Step": train_step,
                   "Dev_Step": dev_step, "Last_Loss": last_loss}, f)
    os.replace(tmp, path)


def load_counters(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


class AsyncCheckpointWriter:
    """Single-worker asynchronous checkpoint writer (``config.async_ckpt``).

    TPU-native training wants checkpoint serialization off the step
    loop's critical path (what orbax's async checkpointer does for
    sharded arrays; a thread suffices for this repo's ≤100 MB npz
    states). The device→host pull (``np.asarray`` inside ``_flatten``)
    stays on the caller's thread — it is ordered with the in-flight
    step stream through the relay and snapshots the values at submit
    time — while the zip/serialize/disk half runs on ONE background
    worker.

    Ordering contract: saves execute strictly in submission order on a
    single worker, and counters files route through the same queue, so
    ``Epoch.json`` can never point at weights that have not landed.
    File-level atomicity is inherited from the tmp + ``os.replace``
    protocol above. Worker exceptions are re-raised at the next
    ``submit``/``wait`` — a failed save must fail the run, not vanish
    into a thread.
    """

    def __init__(self) -> None:
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer")
        self._pending: list[concurrent.futures.Future] = []

    def _reap(self, block: bool) -> None:
        keep = []
        for fut in self._pending:
            if block or fut.done():
                fut.result()  # re-raises worker exceptions in order
            else:
                keep.append(fut)
        self._pending = keep

    def save_pytree(self, path: str, tree: Any) -> None:
        self._reap(block=False)
        # device_get + snapshot on caller thread. np.asarray ALIASES
        # host-resident numpy leaves, so force a copy — the caller may
        # mutate (donated buffers, in-place updates) before the worker
        # serializes.
        flat = {k: np.array(v) for k, v in _flatten(tree).items()}
        self._pending.append(self._pool.submit(_write_npz, path, flat))

    def save_counters(self, path: str, epoch: int, train_step: int,
                      dev_step: int, last_loss: float) -> None:
        self._reap(block=False)
        self._pending.append(self._pool.submit(
            save_counters, path, epoch, train_step, dev_step, last_loss))

    def submit(self, fn, *args) -> None:
        """Run an arbitrary write through the ordered queue."""
        self._reap(block=False)
        self._pending.append(self._pool.submit(fn, *args))

    def wait(self) -> None:
        """Drain the queue; call before reads and at train() exit."""
        self._reap(block=True)
