"""Optimizer, schedulers, and gradient accumulation.

Reproduces the reference's training recipe (train.py:198-204, 259-261):
Adam(lr, betas=(0.9, 0.999)), gradient accumulation over N micro-steps,
global-norm clip at 5, and ReduceLROnPlateau(factor=0.5, patience=2,
min_lr=1e-7) stepped on the dev loss — plus speechbrain's NoamScheduler
used by the HiFi-GAN trainer (Hifi-GAN/train.py:307-309).

All scheduler state is a pytree so it checkpoints with everything else.
The learning rate lives in train state (not baked into the optax
chain) so plateau decisions made on host after a dev epoch apply
without recompilation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "make_optimizer",
    "PlateauState",
    "plateau_init",
    "plateau_step",
    "noam_lr",
]


def make_optimizer(max_grad_norm: float = 5.0, b1: float = 0.9, b2: float = 0.999):
    """Clip + Adam moments; the caller scales updates by -lr."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.scale_by_adam(b1=b1, b2=b2),
    )


class PlateauState(NamedTuple):
    lr: jax.Array
    best: jax.Array
    num_bad: jax.Array


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.asarray(0, jnp.int32),
    )


def plateau_step(state: PlateauState, dev_loss, factor=0.5, patience=2,
                 min_lr=1e-7, threshold=1e-4) -> PlateauState:
    """torch ReduceLROnPlateau semantics (mode=min, rel threshold)."""
    dev_loss = jnp.asarray(dev_loss, jnp.float32)
    improved = dev_loss < state.best * (1.0 - threshold)
    best = jnp.where(improved, dev_loss, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce = num_bad > patience
    lr = jnp.where(reduce, jnp.maximum(state.lr * factor, min_lr), state.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(lr=lr, best=best, num_bad=num_bad)


def noam_lr(step, lr_initial: float, n_warmup_steps: int):
    """speechbrain NoamScheduler: peak ``lr_initial`` at the warmup end."""
    step = jnp.maximum(step, 1).astype(jnp.float32)
    w = float(n_warmup_steps)
    return lr_initial * (w ** 0.5) * jnp.minimum(step ** -0.5, step * w ** -1.5)
