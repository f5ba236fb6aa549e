"""Streaming GRU/LSTM and the SequenceModel wrapper.

Replaces the reference's cuDNN ``nn.GRU/nn.LSTM`` (CRN_ELU.py:98-191)
with a TPU-friendly formulation: for each layer, the input projection
for ALL timesteps is computed as one large batched matmul (MXU work),
and only the small recurrent matmul runs inside a ``lax.scan`` over
time. Gate math matches torch exactly (gate order r,z,n for GRU and
i,f,g,o for LSTM) so training dynamics are comparable.

``SequenceModel`` mirrors the reference wrapper: RNN → Linear →
activation → GlobalLayerNorm(last=True, time=False) over the (T, F)
dims, with hidden state carried across chunks and detached at the
chunk boundary (CRN_ELU.py:173, 182-185).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.module import Module, detach, linear_init, rnn_init
from semi_tpu.layers.norms import GlobalLayerNorm

__all__ = ["GRU", "LSTM", "SequenceModel"]


def _gru_layer(params, h0, x):
    """One GRU layer. x: [B, T, F]; h0: [B, H] -> (y [B, T, H], h [B, H])."""
    hidden = h0.shape[-1]
    # Input projection for all timesteps at once: [B, T, 3H]
    gi = jnp.einsum("btf,gf->btg", x, params["w_ih"]) + params["b_ih"]

    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def step(h, gi_t):
        gh = h @ w_hh.T + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_last, ys = jax.lax.scan(step, h0, gi.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2), h_last


def _lstm_layer(params, carry0, x):
    """One LSTM layer. carry0: (h [B,H], c [B,H])."""
    gi = jnp.einsum("btf,gf->btg", x, params["w_ih"]) + params["b_ih"]
    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def step(carry, gi_t):
        h, c = carry
        gh = h @ w_hh.T + b_hh
        g = gi_t + gh
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        gg = jnp.tanh(gg)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    carry, ys = jax.lax.scan(step, carry0, gi.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2), carry


def _gru_layer_stacked(params, h0, x, detach_chunks=True):
    """GRU layer over stacked chunks ``[N, B, T, F]``, carry detached at
    chunk boundaries (the reference's per-call TBPTT truncation).

    Input projections for ALL N*T frames run as one MXU matmul; only the
    small recurrent matmul stays in the scan.
    """
    n, b, t, _ = x.shape
    gi = jnp.einsum("nbtf,gf->nbtg", x, params["w_ih"]) + params["b_ih"]
    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def cell(h, gi_t):
        gh = h @ w_hh.T + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        nn = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * nn + z * h
        return h_new, h_new

    def chunk_step(h, gi_chunk):  # gi_chunk: [B, T, 3H]
        h, ys = jax.lax.scan(cell, h, gi_chunk.transpose(1, 0, 2))
        if detach_chunks:
            h = detach(h)
        return h, ys.transpose(1, 0, 2)

    h_last, ys = jax.lax.scan(chunk_step, h0, gi)
    return ys, h_last


class GRU(Module):
    """Multi-layer unidirectional GRU, state carried and detached per call."""

    def __init__(self, input_size, hidden_size, num_layers):
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers

    def init(self, key):
        keys = jax.random.split(key, self.num_layers)
        return [
            rnn_init(keys[i], 3, self.input_size if i == 0 else self.hidden_size,
                     self.hidden_size)
            for i in range(self.num_layers)
        ]

    def init_state(self, batch: int, dtype=jnp.float32):
        return {"h": jnp.zeros((self.num_layers, batch, self.hidden_size), dtype)}

    def apply(self, params, state, x):
        # x: [B, T, F]
        hs = []
        y = x
        for i in range(self.num_layers):
            y, h = _gru_layer(params[i], state["h"][i], y)
            hs.append(h)
        return y, {"h": detach(jnp.stack(hs))}

    def apply_stacked(self, params, state, x):
        """x: ``[N, B, T, F]`` stacked chunks; carry detached per chunk."""
        hs = []
        y = x
        for i in range(self.num_layers):
            y, h = _gru_layer_stacked(params[i], state["h"][i], y)
            hs.append(h)
        return y, {"h": detach(jnp.stack(hs))}


def _lstm_layer_stacked(params, carry0, x, detach_chunks=True):
    """LSTM layer over stacked chunks ``[N, B, T, F]`` (see GRU variant)."""
    gi = jnp.einsum("nbtf,gf->nbtg", x, params["w_ih"]) + params["b_ih"]
    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def cell(carry, gi_t):
        h, c = carry
        g = gi_t + h @ w_hh.T + b_hh
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    def chunk_step(carry, gi_chunk):
        carry, ys = jax.lax.scan(cell, carry, gi_chunk.transpose(1, 0, 2))
        if detach_chunks:
            carry = detach(carry)
        return carry, ys.transpose(1, 0, 2)

    carry, ys = jax.lax.scan(chunk_step, carry0, gi)
    return ys, carry


class LSTM(Module):
    def __init__(self, input_size, hidden_size, num_layers):
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers

    def init(self, key):
        keys = jax.random.split(key, self.num_layers)
        return [
            rnn_init(keys[i], 4, self.input_size if i == 0 else self.hidden_size,
                     self.hidden_size)
            for i in range(self.num_layers)
        ]

    def init_state(self, batch: int, dtype=jnp.float32):
        z = jnp.zeros((self.num_layers, batch, self.hidden_size), dtype)
        return {"h": z, "c": z}

    def apply(self, params, state, x):
        hs, cs = [], []
        y = x
        for i in range(self.num_layers):
            y, (h, c) = _lstm_layer(params[i], (state["h"][i], state["c"][i]), y)
            hs.append(h)
            cs.append(c)
        return y, {"h": detach(jnp.stack(hs)), "c": detach(jnp.stack(cs))}

    def apply_stacked(self, params, state, x):
        """x: ``[N, B, T, F]`` stacked chunks; carry detached per chunk."""
        hs, cs = [], []
        y = x
        for i in range(self.num_layers):
            y, (h, c) = _lstm_layer_stacked(
                params[i], (state["h"][i], state["c"][i]), y)
            hs.append(h)
            cs.append(c)
        return y, {"h": detach(jnp.stack(hs)), "c": detach(jnp.stack(cs))}


class SequenceModel(Module):
    """RNN + Linear + activation + per-chunk layer norm (CRN_ELU.py:98-191).

    Input/output layout ``[B, F, T]`` (feature-major like the reference).
    """

    def __init__(self, input_size, output_size, hidden_size, num_layers,
                 sequence_model="GRU", output_activate_function="Tanh",
                 linear=True):
        self.linear = linear
        if not linear:
            hidden_size = input_size
        self.input_size = input_size
        self.output_size = output_size
        self.hidden_size = hidden_size
        cls = {"GRU": GRU, "LSTM": LSTM}[sequence_model]
        self.rnn = cls(input_size, hidden_size, num_layers)
        self.act = {
            "Tanh": jnp.tanh,
            "ReLU": jax.nn.relu,
            "Sigmoid": jax.nn.sigmoid,
            "ELU": jax.nn.elu,
            None: None,
            False: None,
        }[output_activate_function]
        self.norm = GlobalLayerNorm(output_size, last=True, time=False)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = {"rnn": self.rnn.init(k1), "norm": self.norm.init(k3)}
        if self.linear:
            w, b = linear_init(k2, self.hidden_size, self.output_size)
            p["fc"] = {"w": w, "b": b}
        return p

    def init_state(self, batch: int, dtype=jnp.float32):
        return self.rnn.init_state(batch, dtype)

    def apply(self, params, state, x, return_feature: bool = False):
        # x: [B, F, T] -> [B, F_out, T]
        y = x.transpose(0, 2, 1)  # [B, T, F]
        y, new_state = self.rnn.apply(params["rnn"], state, y)
        if self.linear:
            y = y @ params["fc"]["w"].T + params["fc"]["b"]
        feature = y  # pre-activation fc output [B, T, F_out]
        if self.act is not None:
            y = self.act(y)
        y, _ = self.norm.apply(params["norm"], {}, y[:, None])  # [B,1,T,F]
        y = y[:, 0].transpose(0, 2, 1)
        if return_feature:
            return y, new_state, feature
        return y, new_state

    def apply_stacked(self, params, state, x, use_pallas: bool = False,
                      return_feature: bool = False):
        """Stacked-chunk variant: x ``[N, B, F, T]`` -> ``[N, B, F_out, T]``.

        Only the recurrent core is chunk-serial; the fc/activation run
        batched over all frames and the GLN normalizes per chunk exactly
        like per-call apply (time=False stats over one chunk).

        ``use_pallas=True`` runs the whole recurrent sequence in ONE
        fused TPU kernel (inference only: it does not truncate gradients
        at chunk boundaries; 2-layer GRU/LSTM — ops/pallas/rnn_seq.py,
        grid-pipelined so any T and row count work). ``"auto"`` resolves
        by backend + measured win region (rnn_seq.pallas_profitable)."""
        n, b, f, t = x.shape
        if use_pallas == "auto":
            from semi_tpu.ops.pallas.rnn_seq import pallas_profitable

            use_pallas = pallas_profitable(b, self.rnn.num_layers)
        y = x.transpose(0, 1, 3, 2)  # [N, B, T, F]
        if use_pallas and self.rnn.num_layers == 2:
            p0, p1 = params["rnn"]
            gi1 = jnp.einsum("nbtf,gf->nbtg", y, p0["w_ih"]) + p0["b_ih"]
            gi1 = gi1.transpose(0, 2, 1, 3).reshape(n * t, b, -1)
            if isinstance(self.rnn, GRU):
                from semi_tpu.ops.pallas.rnn_seq import gru2_seq

                ys, h_last = gru2_seq(
                    gi1, p0["w_hh"].T, p0["b_hh"], p1["w_ih"].T,
                    p1["b_ih"], p1["w_hh"].T, p1["b_hh"], state["h"])
                new_state = {"h": h_last}
            else:
                from semi_tpu.ops.pallas.rnn_seq import lstm2_seq

                ys, h_last, c_last = lstm2_seq(
                    gi1, p0["w_hh"].T, p0["b_hh"], p1["w_ih"].T,
                    p1["b_ih"], p1["w_hh"].T, p1["b_hh"],
                    state["h"], state["c"])
                new_state = {"h": h_last, "c": c_last}
            y = ys.reshape(n, t, b, -1).transpose(0, 2, 1, 3)
        else:
            y, new_state = self.rnn.apply_stacked(params["rnn"], state, y)
        if self.linear:
            y = y @ params["fc"]["w"].T + params["fc"]["b"]
        feature = y  # pre-activation fc output [N, B, T, F_out]
        if self.act is not None:
            y = self.act(y)
        # per-chunk GLN: fold N into batch, norm over (T, F)
        flat = y.reshape(n * b, 1, t, y.shape[-1])
        flat, _ = self.norm.apply(params["norm"], {}, flat)
        y = flat.reshape(n, b, t, -1).transpose(0, 1, 3, 2)
        if return_feature:
            return y, new_state, feature
        return y, new_state
