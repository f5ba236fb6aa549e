"""Running normalization layers.

``GlobalLayerNorm`` reproduces the reference's streaming layer norm
(CRN_ELU.py:13-61): per-call mean/var over all non-batch dims; with
``time=True`` the stats are merged with history using frame-count
weights ``alpha = step / (step + T)`` including the variance-shift
correction. Most model instances use ``time=False`` (pure per-chunk
stats) per the reference author's finding that the sliding average hurt
(CRN.py:412).

``CumLayerNorm`` is FullSubNet's mean-only running normalization
``x / mean`` with the step count capped at 80 (fullsubnet.py:177-205).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.module import Module, detach

EPS = 1e-8


class GlobalLayerNorm(Module):
    """Streaming global layer norm over ``[B, C, F, T]``.

    Args:
        dim: size of the affine axis (C when ``last=False``, else the
            trailing axis).
        last: affine params on the last axis instead of channel axis.
        time: carry running mean/var across calls (frame-count merge).
    """

    def __init__(self, dim: int, last: bool = False, time: bool = True):
        self.dim = dim
        self.last = last
        self.time = time

    def init(self, key):
        shape = (1, 1, 1, self.dim) if self.last else (1, self.dim, 1, 1)
        return {"weight": jnp.ones(shape), "bias": jnp.zeros(shape)}

    def init_state(self, batch: int, dtype=jnp.float32):
        if not self.time:
            return {}
        return {
            "mean": jnp.zeros((batch, 1, 1, 1), dtype),
            "var": jnp.zeros((batch, 1, 1, 1), dtype),
            "step": jnp.zeros((), jnp.int32),
        }

    def apply(self, params, state, x):
        # x: [B, C, F, T]
        t = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2, 3), keepdims=True)

        if self.time:
            step = state["step"].astype(x.dtype)
            alpha = step / (step + t)
            m_old, v_old = state["mean"], state["var"]
            g_mean = alpha * m_old + (1.0 - alpha) * mean
            g_var = alpha * (v_old + jnp.square(g_mean - m_old)) + (1.0 - alpha) * (
                var + jnp.square(g_mean - mean)
            )
            new_state = {
                "mean": detach(g_mean),
                "var": detach(g_var),
                "step": state["step"] + t,
            }
        else:
            g_mean, g_var = mean, var
            new_state = state

        y = (x - g_mean) / (jnp.sqrt(g_var + EPS) + EPS)
        y = y * params["weight"] + params["bias"]
        return y, new_state


class CumLayerNorm(Module):
    """FullSubNet's capped running mean-only norm ``x / mean``.

    Per-call means are merged with ``alpha = step / (step + 1)`` and the
    call counter saturates at ``max_step`` (fullsubnet.py:184-201).
    Works on rank-3 ``[B, F, T]`` or rank-4 ``[B, C, F, T]`` inputs.
    """

    def __init__(self, max_step: int = 80, ndim: int = 4):
        self.max_step = max_step
        self.ndim = ndim

    def init(self, key):
        return {}

    def init_state(self, batch: int, dtype=jnp.float32):
        # per-stream step counter (shape [B]) so multi-stream resets
        # restart each stream's running mean independently
        return {
            "mean": jnp.zeros((batch,) + (1,) * (self.ndim - 1), dtype),
            "step": jnp.zeros((batch,), jnp.int32),
        }

    def _alpha(self, step, dtype, ndim):
        a = step.astype(dtype) / (step.astype(dtype) + 1.0)
        return a.reshape((-1,) + (1,) * (ndim - 1))

    def apply(self, params, state, x):
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        alpha = self._alpha(state["step"], x.dtype, x.ndim)
        g_mean = detach(alpha * state["mean"] + (1.0 - alpha) * mean)
        new_step = jnp.minimum(state["step"] + 1, self.max_step)
        y = x / (g_mean + EPS)
        return y, {"mean": g_mean, "step": new_step}

    def apply_stacked(self, params, state, x):
        """Stacked-chunk variant: x ``[N, B, ...]``.

        The running-mean recurrence is over per-chunk scalars, so it
        runs as a tiny scan while the heavy division batches over all
        chunks — exactly equivalent to per-chunk apply."""
        axes = tuple(range(2, x.ndim))
        means = jnp.mean(x, axis=axes, keepdims=True)  # [N, B, 1...]

        def step_fn(carry, m):
            g_prev, step = carry
            alpha = self._alpha(step, x.dtype, x.ndim - 1)
            g = detach(alpha * g_prev + (1.0 - alpha) * m)
            return (g, jnp.minimum(step + 1, self.max_step)), g

        (g_last, step_last), g_means = jax.lax.scan(
            step_fn, (state["mean"], state["step"]), means)
        y = x / (g_means + EPS)
        return y, {"mean": g_last, "step": step_last}
