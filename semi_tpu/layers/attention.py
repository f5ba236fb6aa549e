"""Streaming Gaussian-weighted multi-head attention (T-GSA style).

Reproduces the reference's KV-ring-buffer attention
(GTSA_original.py:139-203): a fixed ``maxlen``-frame KV cache is shifted
left by T each call (drop-oldest), scores are
``|Q K^T * exp(-(i-j)^2 / delta^2) / sqrt(d_model)|`` with a learnable
Gaussian width ``delta``, softmax over the full cache. Zero cache
entries at cold start receive softmax weight — this warmup transient is
reference behavior and kept.

The cache update is functional (the new K/V tensors become the state,
detached for TBPTT). Heads split the feature dim and stack onto batch,
so the two matmuls are large batched MXU contractions.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from semi_tpu.layers.module import Module, detach, linear_init
from semi_tpu.layers.norms import GlobalLayerNorm

EPS = 1e-8

__all__ = ["MultiheadAttention", "TransformerLayer"]


class MultiheadAttention(Module):
    def __init__(self, num_heads: int, model_dim: int, maxlen: int):
        self.num_heads = num_heads
        self.model_dim = model_dim
        self.maxlen = maxlen
        self.head_dim = model_dim // num_heads
        # -(i-j)^2 distance grid over the cache window (static)
        ind = np.arange(1, maxlen + 1)[:, None].repeat(maxlen, 1)
        self.ind = jnp.asarray(-((ind - ind.T) ** 2), dtype=jnp.float32)
        self.scale = float(np.sqrt(model_dim))

    def init(self, key):
        ks = jax.random.split(key, 4)
        p = {}
        for name, k in zip(["ql", "kl", "vl", "out"], ks):
            w, b = linear_init(k, self.model_dim, self.model_dim)
            p[name] = {"w": w, "b": b}
        p["delta"] = jnp.ones((1,))
        return p

    def init_state(self, batch: int, dtype=jnp.float32):
        shape = (batch * self.num_heads, self.maxlen, self.head_dim)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    def _split_heads(self, x):
        # [B, T, F] -> [H*B, T, F/H] (head-major stacking like the reference)
        if self.num_heads == 1:
            return x
        parts = jnp.split(x, self.num_heads, axis=-1)
        return jnp.concatenate(parts, axis=0)

    def _merge_heads(self, x, batch):
        if self.num_heads == 1:
            return x
        parts = jnp.split(x, self.num_heads, axis=0)
        return jnp.concatenate(parts, axis=-1)

    def apply(self, params, state, x):
        # x: [B, T, F]
        b, t, _ = x.shape
        q = self._split_heads(x @ params["ql"]["w"].T + params["ql"]["b"])
        k = self._split_heads(x @ params["kl"]["w"].T + params["kl"]["b"])
        v = self._split_heads(x @ params["vl"]["w"].T + params["vl"]["b"])

        k = jnp.concatenate([state["k"][:, t:], k], axis=1)  # [HB, maxlen, d]
        v = jnp.concatenate([state["v"][:, t:], v], axis=1)

        delta2 = jnp.square(params["delta"]) + EPS
        gauss = jnp.exp(self.ind[-t:] / delta2)  # [T, maxlen]

        scores = jnp.abs(
            jnp.einsum("btd,bsd->bts", q, k) * gauss[None] / self.scale
        )
        attn = jax.nn.softmax(scores, axis=-1)
        y = jnp.einsum("bts,bsd->btd", attn, v)
        y = self._merge_heads(y, b)
        y = y @ params["out"]["w"].T + params["out"]["b"]
        return y, {"k": detach(k), "v": detach(v)}

    def apply_stacked(self, params, state, x):
        """All chunks at once: x ``[N, B, T, F]``.

        The drop-oldest KV cache over a stacked chunk axis is a sliding
        window on the key timeline ``[initial_cache | k_0 .. k_{N-1}]``:
        chunk n attends to timeline[(n+1)*T : (n+1)*T + maxlen]. K/V/Q
        projections batch over all chunks; attention is one batched
        einsum. Exactly equivalent to chunk-serial apply.
        """
        n, b, t, _ = x.shape
        flat = x.reshape(n * b, t, -1)
        q = self._split_heads(flat @ params["ql"]["w"].T + params["ql"]["b"])
        k = self._split_heads(flat @ params["kl"]["w"].T + params["kl"]["b"])
        v = self._split_heads(flat @ params["vl"]["w"].T + params["vl"]["b"])
        hb = b * self.num_heads
        # [N*B*H, T, d] -> [N, HB, T, d] (head-major within each chunk)
        q = q.reshape(self.num_heads, n, b, t, -1).transpose(1, 0, 2, 3, 4) \
            .reshape(n, hb, t, -1)
        k = k.reshape(self.num_heads, n, b, t, -1).transpose(1, 0, 2, 3, 4) \
            .reshape(n, hb, t, -1)
        v = v.reshape(self.num_heads, n, b, t, -1).transpose(1, 0, 2, 3, 4) \
            .reshape(n, hb, t, -1)

        # key timeline [HB, maxlen + N*T, d]; chunk n's window starts at
        # (n+1)*T and its LAST T entries are chunk n's own (live) keys —
        # everything earlier is detached, matching the reference's
        # detached cache (GTSA_original.py:186-198)
        tl_k = jnp.concatenate(
            [state["k"], k.transpose(1, 0, 2, 3).reshape(hb, n * t, -1)], axis=1)
        tl_v = jnp.concatenate(
            [state["v"], v.transpose(1, 0, 2, 3).reshape(hb, n * t, -1)], axis=1)
        win = jnp.arange(n)[:, None] * t + t + \
            jnp.arange(self.maxlen - t)[None, :]
        kw_hist = detach(tl_k)[:, win].transpose(1, 0, 2, 3)  # [N, HB, maxlen-T, d]
        vw_hist = detach(tl_v)[:, win].transpose(1, 0, 2, 3)
        kw = jnp.concatenate([kw_hist, k], axis=2)  # [N, HB, maxlen, d]
        vw = jnp.concatenate([vw_hist, v], axis=2)

        delta2 = jnp.square(params["delta"]) + EPS
        gauss = jnp.exp(self.ind[-t:] / delta2)  # [T, maxlen]
        scores = jnp.abs(
            jnp.einsum("nbtd,nbsd->nbts", q, kw) * gauss[None, None] / self.scale)
        attn = jax.nn.softmax(scores, axis=-1)
        y = jnp.einsum("nbts,nbsd->nbtd", attn, vw)

        # back to [N*B, T, F] with head merge
        y = y.reshape(n, self.num_heads, b, t, -1).transpose(1, 0, 2, 3, 4) \
            .reshape(self.num_heads * n * b, t, -1)
        y = self._merge_heads(y, n * b)
        y = y @ params["out"]["w"].T + params["out"]["b"]
        new_state = {"k": detach(tl_k[:, -self.maxlen:]),
                     "v": detach(tl_v[:, -self.maxlen:])}
        return y.reshape(n, b, t, -1), new_state


class TransformerLayer(Module):
    """Attention + FFN with per-chunk global layer norms (GTSA_original.py:206-242)."""

    def __init__(self, num_heads, model_dim, fn_dim, maxlen=500):
        self.attention = MultiheadAttention(num_heads, model_dim, maxlen)
        self.model_dim = model_dim
        self.fn_dim = fn_dim
        self.norm_a = GlobalLayerNorm(model_dim, last=True, time=False)
        self.norm_i = GlobalLayerNorm(model_dim, last=True, time=False)

    def init(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        wi, bi = linear_init(k2, self.model_dim, self.fn_dim)
        wo, bo = linear_init(k3, self.fn_dim, self.model_dim)
        return {
            "attention": self.attention.init(k1),
            "lin_in": {"w": wi, "b": bi},
            "lin_out": {"w": wo, "b": bo},
            "norm_a": self.norm_a.init(k4),
            "norm_i": self.norm_i.init(k5),
        }

    def init_state(self, batch: int, dtype=jnp.float32):
        return self.attention.init_state(batch, dtype)

    def _norm3d(self, module, p, x):
        # GLN over a [B, T, F] tensor == 4-D [B, 1, T, F] with last=True
        y, _ = module.apply(p, {}, x[:, None])
        return y[:, 0]

    def apply(self, params, state, x):
        # x: [B, F, T] -> [B, F, T]
        y = x.transpose(0, 2, 1)  # [B, T, F]
        a, new_state = self.attention.apply(params["attention"], state, y)
        y = self._norm3d(self.norm_a, params["norm_a"], a + y)
        res = y
        h = jax.nn.relu(y @ params["lin_in"]["w"].T + params["lin_in"]["b"])
        y = h @ params["lin_out"]["w"].T + params["lin_out"]["b"] + res
        y = self._norm3d(self.norm_i, params["norm_i"], y)
        return y.transpose(0, 2, 1), new_state

    def apply_stacked(self, params, state, x):
        """All chunks at once: x ``[N, B, F, T]`` (per-chunk norms fold
        the chunk axis into batch)."""
        n, b, f, t = x.shape
        y = x.transpose(0, 1, 3, 2)  # [N, B, T, F]
        a, new_state = self.attention.apply_stacked(params["attention"],
                                                    state, y)
        y = (a + y).reshape(n * b, t, f)
        y = self._norm3d(self.norm_a, params["norm_a"], y)
        res = y
        h = jax.nn.relu(y @ params["lin_in"]["w"].T + params["lin_in"]["b"])
        y = h @ params["lin_out"]["w"].T + params["lin_out"]["b"] + res
        y = self._norm3d(self.norm_i, params["norm_i"], y)
        return y.reshape(n, b, t, f).transpose(0, 1, 3, 2), new_state
