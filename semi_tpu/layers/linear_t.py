"""Circular time-as-feature linear layer (reference: CRN_ELU.py:63-96).

Treats time as a feature axis: each call consumes the next ``T`` weight
columns (with wraparound) and accumulates outputs across calls. Present
in the reference layer library but unused by the active models; kept
for inventory parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.module import Module, detach, linear_init

__all__ = ["LinearT"]


class LinearT(Module):
    def __init__(self, in_features: int, out_features: int):
        self.in_features = in_features
        self.out_features = out_features

    def init(self, key):
        w, b = linear_init(key, self.in_features, self.out_features)
        return {"w": w, "b": b}

    def init_state(self, batch: int, lead_shape=(), dtype=jnp.float32):
        return {
            "out": jnp.zeros((batch,) + lead_shape + (self.out_features,), dtype),
            "step": jnp.zeros((), jnp.int32),
            "started": jnp.zeros((), jnp.bool_),
        }

    def apply(self, params, state, x):
        # x: [..., T]; selects weight columns [step : step+T] circularly
        t = x.shape[-1]
        w = params["w"]  # [out, in]
        idx = (state["step"] + jnp.arange(t)) % self.in_features
        w_t = w[:, idx]  # [out, T]
        y = x @ w_t.T
        # First call adds the bias; later calls accumulate bias-free
        # (reference: CRN_ELU.py:85-88).
        out = jnp.where(state["started"], state["out"] + y, y + params["b"])
        new_step = (state["step"] + t) % self.in_features
        return out, {
            "out": detach(out),
            "step": new_step,
            "started": jnp.ones((), jnp.bool_),
        }
