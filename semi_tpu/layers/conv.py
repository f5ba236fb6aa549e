"""Streaming causal convolution layers.

``TemporalConv2d`` reproduces the reference encoder block
(CRN_ELU.py:194-251): left-context carried in a per-layer ring buffer of
``(k_t - 1) * dilation_t`` input frames, conv → activation → gated 1x1
(``trans(out) * sigmoid(gate(out))``) → GlobalLayerNorm. Frequency is
padded symmetrically inside the conv; time uses only the carried
context, making the layer exactly causal across chunk boundaries.

``TemporalConvTranspose2d`` reproduces the decoder block
(CRN_ELU.py:254-311): transposed conv keeping the last ``T`` frames,
activation + norm, then gated residual fusion with the encoder skip:
``mask * act(residual(res)) + (1 - mask) * out`` where
``mask = sigmoid(norm(1x1(res)))``, with frequency pad/crop to match the
skip. It carries no time state.

``TemporalConv1d`` is the 1-D variant used by GTSA's output head
(GTSA_original.py:49-99): causal conv1d with ring buffer + gated 1x1 +
GlobalLayerNorm.

TPU notes: convs lower to ``lax.conv_general_dilated`` → XLA tiles them
onto the MXU; the elementwise gate/activation fuses into the conv
epilogue. Buffers are written with ``stop_gradient`` to reproduce the
reference's truncated-BPTT-at-chunk-edge semantics (CRN_ELU.py:243).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.module import Module, detach, kaiming_conv_init
from semi_tpu.layers.norms import GlobalLayerNorm

__all__ = ["ACTIVATIONS", "TemporalConv2d", "TemporalConvTranspose2d", "TemporalConv1d"]

ACTIVATIONS = {
    "ReLU": jax.nn.relu,
    "ELU": jax.nn.elu,
    "Tanh": jnp.tanh,
    "Sigmoid": jax.nn.sigmoid,
}


def conv2d(x, w, b, stride=(1, 1), dilation=(1, 1), padding=((0, 0), (0, 0))):
    """NCHW conv with OIHW weights (torch layout)."""
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def conv_transpose2d(x, w, b, stride=(1, 1), dilation=(1, 1), padding=((0, 0), (0, 0))):
    """NCHW transposed conv matching torch.nn.ConvTranspose2d.

    ``w`` is IOHW (torch ConvTranspose layout ``[in, out, kh, kw]``);
    ``padding`` is torch-style (amount trimmed from each side of the
    full-correlation output).
    """
    kh = (w.shape[2] - 1) * dilation[0] + 1
    kw = (w.shape[3] - 1) * dilation[1] + 1
    pads = (
        (kh - 1 - padding[0][0], kh - 1 - padding[0][1]),
        (kw - 1 - padding[1][0], kw - 1 - padding[1][1]),
    )
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, (2, 3)).transpose(1, 0, 2, 3),  # IOHW -> OIHW, flipped
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=stride,
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


class TemporalConv2d(Module):
    """``gated=False`` gives the plain conv+act+norm variant used by the
    CRN v1 / GeneralBeamformer encoders (CRN.py:290-342,
    GeneralBeamformer.py:156-211)."""

    def __init__(self, n_inputs, n_outputs, kernel_size, stride, dilation,
                 padding, activation="ELU", gated=True):
        self.n_inputs = n_inputs
        self.n_outputs = n_outputs
        self.kernel = kernel_size          # (kf, kt)
        self.stride = stride               # (sf, st)
        self.dilation = dilation           # (df, dt)
        self.freq_pad = padding[0]
        self.time_pad = padding[1]         # (kt - 1) * dt
        self.act = ACTIVATIONS[activation]
        self.gated = gated
        self.norm = GlobalLayerNorm(n_outputs, time=False)

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        w, b = kaiming_conv_init(k1, self.n_outputs, self.n_inputs, *self.kernel)
        p = {"conv": {"w": w, "b": b}, "norm": self.norm.init(k4)}
        if self.gated:
            wt, bt = kaiming_conv_init(k2, self.n_outputs, self.n_outputs, 1, 1)
            wg, bg = kaiming_conv_init(k3, self.n_outputs, self.n_outputs, 1, 1)
            p["trans"] = {"w": wt, "b": bt}
            p["gate"] = {"w": wg, "b": bg}
        return p

    def init_state(self, batch: int, num_freqs: int | None = None, dtype=jnp.float32):
        assert num_freqs is not None, "TemporalConv2d state needs the input freq dim"
        return {
            "buffer": jnp.zeros((batch, self.n_inputs, num_freqs, self.time_pad), dtype)
        }

    def apply(self, params, state, x, return_feature: bool = False):
        # x: [B, C, F, T] -> [B, C', F', T]
        inp = jnp.concatenate([state["buffer"], x], axis=-1)
        feature = conv2d(
            inp, params["conv"]["w"], params["conv"]["b"],
            stride=self.stride, dilation=self.dilation,
            padding=((self.freq_pad, self.freq_pad), (0, 0)),
        )
        out = self.act(feature)
        if self.gated:
            out = conv2d(out, params["trans"]["w"], params["trans"]["b"]) * jax.nn.sigmoid(
                conv2d(out, params["gate"]["w"], params["gate"]["b"])
            )
        out, _ = self.norm.apply(params["norm"], {}, out)
        new_buffer = detach(inp[..., -self.time_pad:]) if self.time_pad > 0 else state["buffer"]
        if return_feature:
            # pre-activation tap for margin-ReLU distillation
            # (distillation_crn.py:206-215)
            return out, {"buffer": new_buffer}, feature
        return out, {"buffer": new_buffer}

    def apply_stacked(self, params, state, x, return_feature: bool = False):
        """Process ALL chunks at once with shifted-context ring buffers.

        The per-chunk ring buffer holds the last ``time_pad`` input
        frames of the previous chunk — which, over a stacked chunk axis,
        is just a shift: ``ctx[n] = x[n-1][..., -pad:]`` (zeros/carried
        buffer for n=0). This removes the chunk-serial dependency for
        convolutions entirely; only recurrent layers remain sequential.
        Exactly equivalent to chunk-by-chunk ``apply`` (state detach
        included, since the context slice is stop_gradient'ed like the
        stored buffer, CRN_ELU.py:243).

        Args:
            x: ``[N, B, C, F, T]`` stacked chunks.
        Returns:
            (y ``[N, B, C', F', T]``, new_state) — new_state holds the
            last chunk's buffer so streaming can continue. With
            ``return_feature`` also the pre-activation conv output
            ``[N*B, C', F', T]`` (distillation tap).
        """
        n, b, c, f, t = x.shape
        if self.time_pad > 0:
            prev_tail = self._chunk_context(state["buffer"], x)
            inp = jnp.concatenate([prev_tail, x], axis=-1)
            new_buffer = detach(inp[-1, ..., -self.time_pad:])
        else:
            inp = x
            new_buffer = state["buffer"]
        flat = inp.reshape((n * b,) + inp.shape[2:])
        feature = conv2d(
            flat, params["conv"]["w"], params["conv"]["b"],
            stride=self.stride, dilation=self.dilation,
            padding=((self.freq_pad, self.freq_pad), (0, 0)),
        )
        out = self.act(feature)
        if self.gated:
            out = conv2d(out, params["trans"]["w"], params["trans"]["b"]) * \
                jax.nn.sigmoid(conv2d(out, params["gate"]["w"],
                                      params["gate"]["b"]))
        out, _ = self.norm.apply(params["norm"], {}, out)
        out = out.reshape((n, b) + out.shape[1:])
        if return_feature:
            return out, {"buffer": new_buffer}, feature
        return out, {"buffer": new_buffer}

    def _chunk_context(self, buffer, x):
        """[N, B, C, F, pad] context per chunk from the previous chunk."""
        pad = self.time_pad
        if x.shape[-1] < pad:
            # never occurs with the reference geometry (T=21 > pad<=16)
            raise NotImplementedError("chunk shorter than conv context")
        prev = x[:-1, ..., -pad:]
        return detach(jnp.concatenate([buffer[None], prev], axis=0))


class TemporalConvTranspose2d(Module):
    def __init__(self, n_inputs, n_outputs, kernel_size, stride, dilation,
                 padding, activation="ELU"):
        self.n_inputs = n_inputs
        self.n_outputs = n_outputs
        self.kernel = kernel_size
        self.stride = stride
        self.dilation = dilation
        self.freq_pad = padding[0]
        self.act = ACTIVATIONS[activation]
        self.norm = GlobalLayerNorm(n_outputs, time=False)
        self.res_norm = GlobalLayerNorm(n_outputs, time=False)

    def init(self, key):
        import math
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        # torch ConvTranspose2d default init: fan_in = out_ch * kh * kw
        kf, kt = self.kernel
        fan_in = self.n_outputs * kf * kt
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(k1, (self.n_inputs, self.n_outputs, kf, kt),
                               minval=-bound, maxval=bound)
        b = jax.random.uniform(jax.random.fold_in(k1, 1), (self.n_outputs,),
                               minval=-bound, maxval=bound)
        wm, bm = kaiming_conv_init(k2, self.n_outputs, self.n_outputs, 1, 1)
        wr, br = kaiming_conv_init(k3, self.n_outputs, self.n_outputs, 1, 1)
        return {
            "deconv": {"w": w, "b": b},
            "res_mask": {"w": wm, "b": bm},
            "residual": {"w": wr, "b": br},
            "norm": self.norm.init(k4),
            "res_norm": self.res_norm.init(k5),
        }

    def apply(self, params, state, x, res=None, return_feature: bool = False):
        # x: [B, C, F, T] -> [B, C', F'', T]; keep last T frames (causal crop)
        t = x.shape[-1]
        feature = conv_transpose2d(
            x, params["deconv"]["w"], params["deconv"]["b"],
            stride=self.stride, dilation=self.dilation,
            padding=((self.freq_pad, self.freq_pad), (0, 0)),
        )[..., -t:]
        out = self.act(feature)
        out, _ = self.norm.apply(params["norm"], {}, out)
        if res is not None:
            f_res = res.shape[-2]
            f_out = out.shape[-2]
            if f_res > f_out:
                out = jnp.pad(out, ((0, 0), (0, 0), (0, f_res - f_out), (0, 0)))
            elif f_res < f_out:
                out = out[:, :, :f_res]
            m = conv2d(res, params["res_mask"]["w"], params["res_mask"]["b"])
            m, _ = self.res_norm.apply(params["res_norm"], {}, m)
            mask = jax.nn.sigmoid(m)
            gated_res = self.act(conv2d(res, params["residual"]["w"], params["residual"]["b"]))
            out = mask * gated_res + (1.0 - mask) * out
        if return_feature:
            return out, state, feature
        return out, state


class TemporalConv1d(Module):
    """Causal gated 1-D conv (GTSA output head, GTSA_original.py:11-72).

    ``activation=None`` skips the post-conv activation (the GTSA head
    uses a linear conv before the gate).
    """

    def __init__(self, n_inputs, n_outputs, kernel_size, stride, dilation,
                 padding, activation="ELU"):
        self.n_inputs = n_inputs
        self.n_outputs = n_outputs
        self.kernel = kernel_size
        self.stride = stride
        self.dilation = dilation
        self.time_pad = padding
        self.act = ACTIVATIONS[activation] if activation is not None else None
        self.norm = GlobalLayerNorm(n_outputs, time=False)

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        w, b = kaiming_conv_init(k1, self.n_outputs, self.n_inputs, 1, self.kernel)
        wt, bt = kaiming_conv_init(k2, self.n_outputs, self.n_outputs, 1, 1)
        wg, bg = kaiming_conv_init(k3, self.n_outputs, self.n_outputs, 1, 1)
        return {
            "conv": {"w": w[:, :, 0], "b": b},
            "trans": {"w": wt[:, :, 0], "b": bt},
            "gate": {"w": wg[:, :, 0], "b": bg},
            "norm": self.norm.init(k4),
        }

    def init_state(self, batch: int, dtype=jnp.float32):
        return {"buffer": jnp.zeros((batch, self.n_inputs, self.time_pad), dtype)}

    def apply(self, params, state, x):
        # x: [B, C, T]
        inp = jnp.concatenate([state["buffer"], x], axis=-1)
        y = jax.lax.conv_general_dilated(
            inp, params["conv"]["w"],
            window_strides=(self.stride,), padding=((0, 0),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + params["conv"]["b"][None, :, None]
        if self.act is not None:
            y = self.act(y)

        def conv1x1(z, p):
            return jax.lax.conv_general_dilated(
                z, p["w"], window_strides=(1,), padding=((0, 0),),
                dimension_numbers=("NCH", "OIH", "NCH"),
            ) + p["b"][None, :, None]

        y = conv1x1(y, params["trans"]) * jax.nn.sigmoid(conv1x1(y, params["gate"]))
        y, _ = self.norm.apply(params["norm"], {}, y[:, :, None, :])
        y = y[:, :, 0, :]
        new_buffer = detach(inp[..., -self.time_pad:]) if self.time_pad > 0 else state["buffer"]
        return y, {"buffer": new_buffer}

    def apply_stacked(self, params, state, x):
        """x: ``[N, B, C, T]`` stacked chunks (shifted-context buffers)."""
        n, b, c, t = x.shape
        pad = self.time_pad
        if pad > 0:
            prev = detach(jnp.concatenate(
                [state["buffer"][None], x[:-1, ..., -pad:]], axis=0))
            inp = jnp.concatenate([prev, x], axis=-1)
            new_buffer = detach(inp[-1, ..., -pad:])
        else:
            inp = x
            new_buffer = state["buffer"]
        flat = inp.reshape(n * b, c, inp.shape[-1])
        y = jax.lax.conv_general_dilated(
            flat, params["conv"]["w"], (self.stride,), ((0, 0),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + params["conv"]["b"][None, :, None]
        if self.act is not None:
            y = self.act(y)

        def conv1x1(z, p):
            return jax.lax.conv_general_dilated(
                z, p["w"], window_strides=(1,), padding=((0, 0),),
                dimension_numbers=("NCH", "OIH", "NCH"),
            ) + p["b"][None, :, None]

        y = conv1x1(y, params["trans"]) * jax.nn.sigmoid(conv1x1(y, params["gate"]))
        y, _ = self.norm.apply(params["norm"], {}, y[:, :, None, :])
        y = y[:, :, 0, :].reshape(n, b, -1, t)
        return y, {"buffer": new_buffer}
