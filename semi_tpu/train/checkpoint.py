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

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "save_counters", "load_counters"]


def _flatten(tree) -> dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves:
        out[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return out


def save_pytree(path: str, tree: Any) -> None:
    # atomic: a crash mid-save must never corrupt the previous good
    # checkpoint (np.savez truncates in place otherwise)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"  # .npz suffix so np.savez appends nothing
    np.savez(tmp, **_flatten(tree))
    os.replace(tmp, path)


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
