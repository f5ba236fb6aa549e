"""Functional module system for streaming-stateful layers.

Design: in the reference, streaming state (conv ring buffers, RNN
hidden, running norm stats, KV caches) lives in mutable module
attributes, forcing a Python-serial chunk loop (reference:
CRN_ELU.py:485-489). Here every layer is a pure function

    ``apply(params, state, x) -> (y, new_state)``

with ``params`` and ``state`` as pytrees. The chunk loop then becomes a
single ``jax.lax.scan`` with the state pytree as carry — jit-compiled
once, differentiable, shardable with pjit.

State pytrees are shape-static (zeros instead of the reference's
``None`` lazy-init, which is numerically identical for every layer:
zero ring buffers == zero left-padding, zero RNN hidden == torch's
default, step==0 running norms fall back to per-chunk stats).

Truncated-BPTT semantics: the reference detaches state at every chunk
boundary (CRN_ELU.py:173, 243). Layers here apply ``stop_gradient``
when *writing* new state, which reproduces that exactly.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = Any
State = Any

__all__ = ["Module", "uniform_init", "kaiming_conv_init", "linear_init", "rnn_init", "detach"]


def detach(tree):
    return jax.tree.map(jax.lax.stop_gradient, tree)


class Module:
    """Base for all layers. Subclasses hold only *static* config."""

    def init(self, key: jax.Array) -> Params:
        """Create the parameter pytree."""
        raise NotImplementedError

    def init_state(self, batch: int, dtype=jnp.float32) -> State:
        """Create the streaming-state pytree (empty dict if stateless)."""
        return {}

    def apply(self, params: Params, state: State, x, **kwargs):
        raise NotImplementedError

    def __call__(self, params, state, x, **kwargs):
        return self.apply(params, state, x, **kwargs)


def uniform_init(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_conv_init(key, out_ch, in_ch, kh, kw, dtype=jnp.float32):
    """Conv weight+bias with torch's default fan-in uniform bound."""
    kw_, kb_ = jax.random.split(key)
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    w = uniform_init(kw_, (out_ch, in_ch, kh, kw), bound, dtype)
    b = uniform_init(kb_, (out_ch,), bound, dtype)
    return w, b


def linear_init(key, in_features, out_features, dtype=jnp.float32):
    kw_, kb_ = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    w = uniform_init(kw_, (out_features, in_features), bound, dtype)
    b = uniform_init(kb_, (out_features,), bound, dtype)
    return w, b


def rnn_init(key, gates, in_features, hidden, dtype=jnp.float32):
    """One RNN layer's (w_ih, w_hh, b_ih, b_hh), torch layout [G*H, ...]."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "w_ih": uniform_init(k1, (gates * hidden, in_features), bound, dtype),
        "w_hh": uniform_init(k2, (gates * hidden, hidden), bound, dtype),
        "b_ih": uniform_init(k3, (gates * hidden,), bound, dtype),
        "b_hh": uniform_init(k4, (gates * hidden,), bound, dtype),
    }
