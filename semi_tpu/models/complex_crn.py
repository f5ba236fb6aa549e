"""Complex_TemporalCRN — complex-valued CRN wired from the sketch layers.

The reference has a ``Complex_TemporalCRN`` config section
(config.yaml:219-231) and complex layer implementations
(modules.py:443-761) but never wires them into a model. This completes
the design: complex encoder over the M mic spectra, complex GRU
bottleneck, complex decoder with gated skips, emitting the compressed
cIRM directly in the complex domain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.complex import (
    ComplexSequenceModel, ComplexTemporalConv2d, ComplexTemporalConvTranspose2d)
from semi_tpu.models.base import StreamingModel
from semi_tpu.ops.mask import complex_mul, decompress_cirm

__all__ = ["ComplexTemporalCRN"]


class ComplexTemporalCRN(StreamingModel):
    def __init__(self, num_channels, num_freqs, hidden, segment_length,
                 num_layers=1, num_inputs=3, kernel_size=3, dropout=0.0,
                 sample_rate=16000, win_length=25, hop_length=10, n_fft=400,
                 remat=True):
        super().__init__(segment_length, num_freqs, sample_rate, win_length,
                         hop_length, n_fft, remat=remat)
        self.num_inputs = num_inputs
        levels = len(num_channels)
        self.convs, deconvs = [], []
        self.enc_freqs = []
        f = num_freqs
        for i in range(levels):
            dt = 2 ** i
            in_ch = num_inputs if i == 0 else num_channels[i - 1]
            out_ch = num_channels[i]
            self.convs.append(ComplexTemporalConv2d(
                in_ch, out_ch, (5, kernel_size), (2, 1), (1, dt),
                (2, (kernel_size - 1) * dt)))
            self.enc_freqs.append(f)
            f = (f - 1) // 2 + 1
            dt_dec = 2 ** (levels - i - 1)
            dec_out = 1 if i == 0 else in_ch
            deconvs.insert(0, ComplexTemporalConvTranspose2d(
                out_ch, dec_out, (5, kernel_size), (2, 1), (1, dt_dec),
                (2, (kernel_size - 1) * dt_dec)))
        self.deconvs = deconvs
        gru_dim = f * num_channels[-1]
        self.gru = ComplexSequenceModel(gru_dim, gru_dim, hidden, num_layers)

    def init(self, key):
        n = len(self.convs) + len(self.deconvs) + 1
        it = iter(jax.random.split(key, n))
        return {"convs": [m.init(next(it)) for m in self.convs],
                "gru": self.gru.init(next(it)),
                "deconvs": [m.init(next(it)) for m in self.deconvs]}

    def init_state(self, batch, dtype=jnp.float32):
        return {"convs": [m.init_state(batch, num_freqs=f, dtype=dtype)
                          for m, f in zip(self.convs, self.enc_freqs)],
                "gru": self.gru.init_state(batch, dtype),
                "deconvs": [m.init_state(batch, dtype) for m in self.deconvs]}

    def forward(self, params, state, x):
        # x: [B, M, F, T, 2]
        noisy = x[:, 0]
        h = x
        residuals = [h]
        new_conv = []
        for m, p, st in zip(self.convs, params["convs"], state["convs"]):
            h, st2 = m.apply(p, st, h)
            residuals.append(h)
            new_conv.append(st2)

        b, c, f, t, _ = h.shape
        h = h.reshape(b, c * f, t, 2)
        h, gru_state = self.gru.apply(params["gru"], state["gru"], h)
        h = h.reshape(b, c, f, t, 2)

        idx = -2
        new_dec = []
        for m, p, st in zip(self.deconvs[:-1], params["deconvs"][:-1],
                            state["deconvs"][:-1]):
            h, st2 = m.apply(p, st, h, res=residuals[idx])
            new_dec.append(st2)
            idx -= 1
        h, st_last = self.deconvs[-1].apply(params["deconvs"][-1],
                                            state["deconvs"][-1], h)
        new_dec.append(st_last)

        mask = decompress_cirm(h[:, 0])  # [B, F, T, 2]
        er, ei = complex_mul(mask[..., 0], mask[..., 1],
                             noisy[..., 0], noisy[..., 1])
        pred = jnp.stack([er, ei], axis=-1)
        return pred, {"convs": new_conv, "gru": gru_state, "deconvs": new_dec}
