"""Device mesh and sharding helpers.

The reference's parallelism story is vestigial NCCL DDP, fully
commented out (reference: train.py:170-174, 251-257); its de-facto
topology was one training GPU + one preprocessing GPU pinned by gpuRIR
(multichannel.py:8). Here distribution is structural: a 1-D
data-parallel mesh over ICI, with the batch dimension sharded and
gradients all-reduced by XLA-inserted psums. Augmentation (RIR
synthesis + mixing) runs inside the sharded step, so no device is ever
dedicated to preprocessing.

At these model scales (<10M params) TP/PP would be pure overhead — the
natural additional axes are the utterance batch and FullSubNet's
201-row sub-band batch, both of which shard over ``dp`` for free.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "P"]


def make_mesh(n_devices: int | None = None, axis: str = "dp",
              devices=None) -> Mesh:
    """1-D mesh over ``n_devices`` of ``devices`` (default: all local).

    Raises if fewer devices exist than requested — a silently smaller
    mesh would invalidate any multi-chip claim built on it.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"requested a {n_devices}-device mesh but only {len(devices)} "
            f"devices are available (platform="
            f"{devices[0].platform if devices else 'none'})")
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "dp") -> NamedSharding:
    """Shard dim 0 (batch) over the mesh axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Device-put a pytree with batch-dim-0 sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim, axis)), tree
    )


def state_sharding(mesh: Mesh, leaf, batch: int, axis: str = "dp") -> NamedSharding:
    """Shard a streaming-state leaf on its batch axis.

    State pytrees mix layouts (conv buffers ``[B, C, F, pad]``, RNN
    hidden ``[layers, B, H]``, scalar step counters) — shard the first
    axis whose extent equals ``batch``, replicate otherwise.
    """
    for d, size in enumerate(getattr(leaf, "shape", ())):
        if size == batch:
            spec = [None] * leaf.ndim
            spec[d] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def shard_state(mesh: Mesh, state, batch: int, axis: str = "dp"):
    return jax.tree.map(
        lambda x: jax.device_put(x, state_sharding(mesh, x, batch, axis)), state
    )
