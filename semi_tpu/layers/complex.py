"""Complex-valued streaming layers (reference: modules.py:443-761).

In the reference these exist only as an unwired design sketch for the
``Complex_TemporalCRN`` config section (config.yaml:219-231 has no
implementation behind it; modules.py is imported by nothing). Here the
layers are functional and tested, and models/complex_crn.py wires them
into a working model — completing the sketch.

All layers carry real/imag stacked on the last axis ``[..., 2]``:
- ``ComplexGlobalLayerNorm``: whitening via the inverse square root of
  the 2x2 real/imag covariance (modules.py:497-509), with the same
  frame-count running merge as the real GLN when ``time=True``.
- ``ComplexSequenceModel``: split real/imag RNNs combined by the
  complex product rule, complex linear head (modules.py:527-621).
- ``ComplexTemporalConv2d`` / ``ComplexTemporalConvTranspose2d``:
  complex convs via two real convs, ring-buffer left context, gated
  complex residual fusion (modules.py:624-761).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.conv import conv2d, conv_transpose2d
from semi_tpu.layers.module import Module, detach, kaiming_conv_init
from semi_tpu.layers.rnn import GRU, LSTM
from semi_tpu.layers.module import linear_init

EPS = 1e-8

__all__ = [
    "ComplexGlobalLayerNorm",
    "ComplexSequenceModel",
    "ComplexTemporalConv2d",
    "ComplexTemporalConvTranspose2d",
]

ACT = {"Tanh": jnp.tanh, "ReLU": jax.nn.relu, "Sigmoid": jax.nn.sigmoid,
       "ELU": jax.nn.elu}


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


class ComplexGlobalLayerNorm(Module):
    def __init__(self, dim, last=False, time=True):
        self.dim = dim
        self.last = last
        self.time = time

    def init(self, key):
        shape = (1, 1, 1, self.dim, 2) if self.last else (1, self.dim, 1, 1, 2)
        return {"weight": jnp.ones(shape), "bias": jnp.zeros(shape)}

    def init_state(self, batch, dtype=jnp.float32):
        if not self.time:
            return {}
        z = jnp.zeros((batch, 1, 1, 1), dtype)
        return {"mean": jnp.zeros((batch, 1, 1, 1, 2), dtype),
                "var_rr": z, "var_ii": z, "var_ri": z,
                "step": jnp.zeros((), jnp.int32)}

    def apply(self, params, state, x):
        # x: [B, C, F, T, 2]
        t = x.shape[3]
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        xp = x - mean
        var_rr = jnp.mean(xp[..., 0] ** 2, axis=(1, 2, 3), keepdims=True)
        var_ii = jnp.mean(xp[..., 1] ** 2, axis=(1, 2, 3), keepdims=True)
        var_ri = jnp.mean(xp[..., 0] * xp[..., 1], axis=(1, 2, 3), keepdims=True)

        if self.time:
            step = state["step"].astype(x.dtype)
            alpha = step / (step + t)
            g_mean = alpha * state["mean"] + (1 - alpha) * mean
            dh = g_mean - state["mean"]
            dn = g_mean - mean
            g_rr = alpha * (state["var_rr"] + dh[..., 0] ** 2) + \
                (1 - alpha) * (var_rr + dn[..., 0] ** 2)
            g_ii = alpha * (state["var_ii"] + dh[..., 1] ** 2) + \
                (1 - alpha) * (var_ii + dn[..., 1] ** 2)
            g_ri = alpha * (state["var_ri"] + dh[..., 0] * dh[..., 1]) + \
                (1 - alpha) * (var_ri + dn[..., 0] * dn[..., 1])
            new_state = {"mean": detach(g_mean), "var_rr": detach(g_rr),
                         "var_ii": detach(g_ii), "var_ri": detach(g_ri),
                         "step": state["step"] + t}
            xp = x - g_mean
        else:
            g_rr, g_ii, g_ri = var_rr, var_ii, var_ri
            new_state = state

        det = g_rr * g_ii - g_ri ** 2
        s = jnp.sqrt(det + EPS)
        # NOTE: the reference uses 2*var_ri here where Trabelsi's complex
        # BN uses 2*s (modules.py:500); kept verbatim.
        tt = jnp.sqrt(g_rr + g_ii + 2 * g_ri + EPS)
        inv_st = 1.0 / (s * tt + EPS)
        rrr = (g_ii + s) * inv_st
        rii = (g_rr + s) * inv_st
        rri = -g_ri * inv_st

        yr = rrr * xp[..., 0] + rri * xp[..., 1]
        yi = rri * xp[..., 0] + rii * xp[..., 1]
        y = jnp.stack([yr, yi], axis=-1)
        return y * params["weight"] + params["bias"], new_state


class ComplexSequenceModel(Module):
    def __init__(self, input_size, output_size, hidden_size, num_layers,
                 sequence_model="GRU", output_activate_function="Tanh"):
        cls = {"GRU": GRU, "LSTM": LSTM}[sequence_model]
        self.real_seq = cls(input_size, hidden_size, num_layers)
        self.img_seq = cls(input_size, hidden_size, num_layers)
        self.hidden_size = hidden_size
        self.output_size = output_size
        self.act = ACT[output_activate_function] if output_activate_function else None
        self.norm = ComplexGlobalLayerNorm(output_size, last=True)

    def init(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        wr, br = linear_init(k3, self.hidden_size, self.output_size)
        wi, bi = linear_init(k4, self.hidden_size, self.output_size)
        return {"real_seq": self.real_seq.init(k1),
                "img_seq": self.img_seq.init(k2),
                "real_fc": {"w": wr, "b": br},
                "img_fc": {"w": wi, "b": bi},
                "norm": self.norm.init(k5)}

    def init_state(self, batch, dtype=jnp.float32):
        return {"rr": self.real_seq.init_state(batch, dtype),
                "ii": self.img_seq.init_state(batch, dtype),
                "ri": self.real_seq.init_state(batch, dtype),
                "ir": self.img_seq.init_state(batch, dtype),
                "norm": self.norm.init_state(batch, dtype)}

    def apply(self, params, state, x):
        # x: [B, F, T, 2] -> [B, F_out, T, 2]
        y = x.transpose(0, 2, 1, 3)  # [B, T, F, 2]
        rr, h_rr = self.real_seq.apply(params["real_seq"], state["rr"], y[..., 0])
        ii, h_ii = self.img_seq.apply(params["img_seq"], state["ii"], y[..., 1])
        ri, h_ri = self.real_seq.apply(params["real_seq"], state["ri"], y[..., 1])
        ir, h_ir = self.img_seq.apply(params["img_seq"], state["ir"], y[..., 0])
        real = rr - ii
        img = ri + ir

        def lin(p, v):
            return v @ p["w"].T + p["b"]

        x0 = lin(params["real_fc"], real) - lin(params["img_fc"], img)
        x1 = lin(params["real_fc"], img) + lin(params["img_fc"], real)
        y = jnp.stack([x0, x1], axis=-1)
        if self.act is not None:
            y = self.act(y)
        y, norm_state = self.norm.apply(params["norm"], state["norm"],
                                        y[:, None])
        y = y[:, 0].transpose(0, 2, 1, 3)
        return y, {"rr": h_rr, "ii": h_ii, "ri": h_ri, "ir": h_ir,
                   "norm": norm_state}


class ComplexTemporalConv2d(Module):
    def __init__(self, n_inputs, n_outputs, kernel_size, stride, dilation,
                 padding, activation="ReLU"):
        self.n_inputs, self.n_outputs = n_inputs, n_outputs
        self.kernel, self.stride, self.dilation = kernel_size, stride, dilation
        self.freq_pad, self.time_pad = padding
        self.act = ACT[activation]
        self.norm = ComplexGlobalLayerNorm(n_outputs)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        wr, br = kaiming_conv_init(k1, self.n_outputs, self.n_inputs, *self.kernel)
        wi, bi = kaiming_conv_init(k2, self.n_outputs, self.n_inputs, *self.kernel)
        return {"real": {"w": wr, "b": br}, "img": {"w": wi, "b": bi},
                "norm": self.norm.init(k3)}

    def init_state(self, batch, num_freqs=None, dtype=jnp.float32):
        buf = jnp.zeros((batch, self.n_inputs, num_freqs, self.time_pad), dtype)
        return {"real": buf, "img": buf,
                "norm": self.norm.init_state(batch, dtype)}

    def _conv(self, p, v):
        return conv2d(v, p["w"], p["b"], self.stride, self.dilation,
                      ((self.freq_pad, self.freq_pad), (0, 0)))

    def apply(self, params, state, x):
        real = jnp.concatenate([state["real"], x[..., 0]], axis=-1)
        img = jnp.concatenate([state["img"], x[..., 1]], axis=-1)
        o_r = self._conv(params["real"], real) - self._conv(params["img"], img)
        o_i = self._conv(params["real"], img) + self._conv(params["img"], real)
        out = self.act(jnp.stack([o_r, o_i], axis=-1))
        out, norm_state = self.norm.apply(params["norm"], state["norm"], out)
        pad = self.time_pad
        return out, {"real": detach(real[..., -pad:]) if pad else state["real"],
                     "img": detach(img[..., -pad:]) if pad else state["img"],
                     "norm": norm_state}


class ComplexTemporalConvTranspose2d(Module):
    def __init__(self, n_inputs, n_outputs, kernel_size, stride, dilation,
                 padding, activation="ReLU"):
        self.n_inputs, self.n_outputs = n_inputs, n_outputs
        self.kernel, self.stride, self.dilation = kernel_size, stride, dilation
        self.freq_pad = padding[0]
        self.act = ACT[activation]
        self.norm = ComplexGlobalLayerNorm(n_outputs)
        self.res_norm = ComplexGlobalLayerNorm(n_outputs)

    def init(self, key):
        import math
        ks = jax.random.split(key, 8)
        kf, kt = self.kernel
        bound = 1.0 / math.sqrt(self.n_outputs * kf * kt)

        def deconv_w(k):
            w = jax.random.uniform(k, (self.n_inputs, self.n_outputs, kf, kt),
                                   minval=-bound, maxval=bound)
            b = jax.random.uniform(jax.random.fold_in(k, 1),
                                   (self.n_outputs,), minval=-bound, maxval=bound)
            return {"w": w, "b": b}

        mr, mbr = kaiming_conv_init(ks[2], self.n_outputs, self.n_outputs, 1, 1)
        mi, mbi = kaiming_conv_init(ks[3], self.n_outputs, self.n_outputs, 1, 1)
        rr, rbr = kaiming_conv_init(ks[4], self.n_outputs, self.n_outputs, 1, 1)
        ri, rbi = kaiming_conv_init(ks[5], self.n_outputs, self.n_outputs, 1, 1)
        return {"real_deconv": deconv_w(ks[0]), "img_deconv": deconv_w(ks[1]),
                "real_mask": {"w": mr, "b": mbr}, "img_mask": {"w": mi, "b": mbi},
                "real_res": {"w": rr, "b": rbr}, "img_res": {"w": ri, "b": rbi},
                "norm": self.norm.init(ks[6]),
                "res_norm": self.res_norm.init(ks[7])}

    def init_state(self, batch, dtype=jnp.float32):
        return {"norm": self.norm.init_state(batch, dtype),
                "res_norm": self.res_norm.init_state(batch, dtype)}

    def apply(self, params, state, x, res=None):
        t = x.shape[-2]

        def dconv(p, v):
            return conv_transpose2d(v, p["w"], p["b"], self.stride,
                                    self.dilation,
                                    ((self.freq_pad, self.freq_pad), (0, 0)))

        real = (dconv(params["real_deconv"], x[..., 0]) -
                dconv(params["img_deconv"], x[..., 1]))[..., -t:]
        img = (dconv(params["real_deconv"], x[..., 1]) +
               dconv(params["img_deconv"], x[..., 0]))[..., -t:]
        out = self.act(jnp.stack([real, img], axis=-1))
        out, norm_state = self.norm.apply(params["norm"], state["norm"], out)
        res_norm_state = state["res_norm"]
        if res is not None:
            f_res, f_out = res.shape[2], out.shape[2]
            if f_res > f_out:
                out = jnp.pad(out, ((0, 0), (0, 0), (0, f_res - f_out),
                                    (0, 0), (0, 0)))
            elif f_res < f_out:
                out = out[:, :, :f_res]

            def c1x1(pr, pi, v):
                r, i = _cmul_conv(pr, pi, v)
                return jnp.stack([r, i], axis=-1)

            def _cmul_conv(pr, pi, v):
                cr = conv2d(v[..., 0], pr["w"], pr["b"]) - \
                    conv2d(v[..., 1], pi["w"], pi["b"])
                ci = conv2d(v[..., 1], pr["w"], pr["b"]) + \
                    conv2d(v[..., 0], pi["w"], pi["b"])
                return cr, ci

            mask = jax.nn.sigmoid(c1x1(params["real_mask"], params["img_mask"], res))
            r = c1x1(params["real_res"], params["img_res"], res)
            out = mask * jax.nn.relu(r) + (1.0 - mask) * out
            out, res_norm_state = self.res_norm.apply(
                params["res_norm"], state["res_norm"], out)
        return out, {"norm": norm_state, "res_norm": res_norm_state}
