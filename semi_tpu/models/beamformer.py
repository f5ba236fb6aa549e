"""GeneralBeamformer (NN beamformer) and mask-based MVDR.

``GeneralBeamformer`` parity with the reference
(GeneralBeamformer.py:266-510): CRN-style ungated encoder/decoder emits
per-mic 3x3-neighborhood complex filters for speech and noise
(4*M*9 output channels) → filtered spectra via an unfold over the
(freq, interleaved-re/im-time) plane → spatial covariance Φ = S S^H per
TF bin → two stateful GRUs over the M² covariance features per
frequency (B*F batch rows — natural TPU batching) → a small MLP
produces complex beamforming weights → ``Σ_m w*·y``.

Reference quirks kept: phase via ``arctan(im/re)`` not atan2
(GeneralBeamformer.py:323), the unfold's 3x3 window spanning the
interleaved real/imag time axis (GeneralBeamformer.py:349-353). The
per-chunk ``torch.cuda.empty_cache()`` (GeneralBeamformer.py:483) has
no analog — XLA owns memory.

``MVDRBeamformer`` ports fullsubnet.py:25-174 to native complex64:
masked PSD estimation and w = (Φ_n⁻¹ Φ_s) u / tr(Φ_n⁻¹ Φ_s).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.conv import TemporalConv2d, TemporalConvTranspose2d, conv2d
from semi_tpu.layers.module import Module, linear_init
from semi_tpu.layers.norms import GlobalLayerNorm
from semi_tpu.layers.rnn import SequenceModel
from semi_tpu.models.base import StreamingModel

EPS = 1e-8

__all__ = ["GeneralBeamformer", "MVDRBeamformer"]


def _unfold3x3(x: jax.Array) -> jax.Array:
    """torch F.unfold(kernel=(3,3), padding=1): [B, C, H, W] -> [B, C, 9, H, W]."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    h, w = x.shape[2], x.shape[3]
    patches = [xp[:, :, i:i + h, j:j + w] for i in range(3) for j in range(3)]
    return jnp.stack(patches, axis=2)


class GeneralBeamformer(StreamingModel):
    def __init__(self, num_channels, num_freqs, hidden, segment_length,
                 num_layers=1, num_inputs=3, kernel_size=3, dropout=0.0,
                 sample_rate=16000, win_length=25, hop_length=10, n_fft=400,
                 remat=True):
        super().__init__(segment_length, num_freqs, sample_rate, win_length,
                         hop_length, n_fft, remat=remat)
        self.num_inputs = num_inputs
        self.num_time = segment_length // self.stft_cfg.hop + 1
        activation = "ReLU"
        m = num_inputs
        feat_ch = 2 * m - 1

        self.convs, deconvs = [], []
        self.enc_freqs = []
        levels = len(num_channels)
        f = num_freqs
        for i in range(levels):
            dt = 2 ** i
            in_ch = feat_ch if i == 0 else num_channels[i - 1]
            out_ch = num_channels[i]
            self.convs.append(TemporalConv2d(
                in_ch, out_ch, (5, kernel_size), (2, 1), (1, dt),
                (2, (kernel_size - 1) * dt), activation=activation, gated=False))
            self.enc_freqs.append(f)
            f = (f - 1) // 2 + 1
            dt_dec = 2 ** (levels - i - 1)
            dec_out = 4 * m * 9 if i == 0 else in_ch
            deconvs.insert(0, TemporalConvTranspose2d(
                out_ch, dec_out, (5, kernel_size), (2, 1), (1, dt_dec),
                (2, (kernel_size - 1) * dt_dec), activation=activation))
        self.deconvs = deconvs

        self.ln_s = GlobalLayerNorm(num_freqs * self.num_time, time=False)
        self.ln_n = GlobalLayerNorm(num_freqs * self.num_time, time=False)
        self.gru_s = SequenceModel(m * m, m * m, hidden, num_layers,
                                   sequence_model="GRU",
                                   output_activate_function=activation)
        self.gru_n = SequenceModel(m * m, m * m, hidden, num_layers,
                                   sequence_model="GRU",
                                   output_activate_function=activation)
        self.lin_norm = GlobalLayerNorm(num_freqs, time=False)
        self.hidden = hidden

    def init(self, key):
        n = len(self.convs) + len(self.deconvs) + 7
        keys = iter(jax.random.split(key, n))
        w1, b1 = linear_init(next(keys), 9, self.hidden)
        w2, b2 = linear_init(next(keys), self.hidden, 6)
        return {
            "convs": [c.init(next(keys)) for c in self.convs],
            "deconvs": [d.init(next(keys)) for d in self.deconvs],
            "ln_s": self.ln_s.init(next(keys)),
            "ln_n": self.ln_n.init(next(keys)),
            "gru_s": self.gru_s.init(next(keys)),
            "gru_n": self.gru_n.init(next(keys)),
            "lin": {"w1": w1, "b1": b1, "w2": w2, "b2": b2,
                    "norm": self.lin_norm.init(next(keys))},
        }

    def init_state(self, batch: int, dtype=jnp.float32):
        return {
            "convs": [c.init_state(batch, num_freqs=f, dtype=dtype)
                      for c, f in zip(self.convs, self.enc_freqs)],
            "gru_s": self.gru_s.init_state(batch * self.num_freqs, dtype),
            "gru_n": self.gru_n.init_state(batch * self.num_freqs, dtype),
        }

    def forward(self, params, state, x):
        # x: [B, M, F, T, 2]
        b, m, f, t, _ = x.shape
        noisy = x
        # reference uses arctan, not atan2 (GeneralBeamformer.py:323)
        angle = jnp.arctan(x[..., 1] / (x[..., 0] + EPS) + EPS)
        ipd = angle[:, :1] - angle[:, 1:]
        mag = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-10)
        h = jnp.concatenate([mag, ipd], axis=1)

        residuals = [h]
        new_conv = []
        for c, p, st in zip(self.convs, params["convs"], state["convs"]):
            h, st2 = c.apply(p, st, h)
            residuals.append(h)
            new_conv.append(st2)

        idx = -2
        for d, p in zip(self.deconvs[:-1], params["deconvs"][:-1]):
            h, _ = d.apply(p, {}, h, res=residuals[idx])
            idx -= 1
        h, _ = self.deconvs[-1].apply(params["deconvs"][-1], {}, h)
        # [B, 4*M*9, F, T] -> [B, 2, 2, M, 9, F*T]
        filt = h.reshape(b, 2, 2, m, 9, f * t)
        s_f = jax.lax.complex(filt[:, 0, 0], filt[:, 0, 1])  # [B, M, 9, F*T]
        n_f = jax.lax.complex(filt[:, 1, 0], filt[:, 1, 1])

        # unfold noisy over the (F, interleaved re/im time) plane
        plane = noisy.reshape(b, m, f, t * 2)
        unf = _unfold3x3(plane).reshape(b, m, 9, f * t, 2)
        y = jax.lax.complex(unf[..., 0], unf[..., 1])  # [B, M, 9, F*T]

        s = jnp.sum(s_f * y, axis=2).transpose(0, 2, 1)[..., None]  # [B, FT, M, 1]
        n = jnp.sum(n_f * y, axis=2).transpose(0, 2, 1)[..., None]
        phi_s = (s @ jnp.conjugate(s).swapaxes(-1, -2)).real  # [B, FT, M, M]
        phi_n = (n @ jnp.conjugate(n).swapaxes(-1, -2)).real

        phi_s, _ = self.ln_s.apply(params["ln_s"], {}, phi_s)
        phi_n, _ = self.ln_n.apply(params["ln_n"], {}, phi_n)

        def to_gru(p):
            return p.reshape(b, f, t, m, m).transpose(0, 1, 3, 4, 2).reshape(
                b * f, m * m, t)

        phi_s, gs_state = self.gru_s.apply(params["gru_s"], state["gru_s"],
                                           to_gru(phi_s))
        phi_n, gn_state = self.gru_n.apply(params["gru_n"], state["gru_n"],
                                           to_gru(phi_n))
        phi = (phi_s * phi_n).reshape(b, f, m * m, t).swapaxes(2, 3)  # [B,F,T,9]

        lin = params["lin"]
        w = jax.nn.relu(phi @ lin["w1"].T + lin["b1"])
        w, _ = self.lin_norm.apply(lin["norm"], {}, w)
        w = (w @ lin["w2"].T + lin["b2"]).reshape(b, f, t, m, 2)

        ny = noisy.transpose(0, 2, 3, 1, 4)  # [B, F, T, M, 2]
        real = w[..., 0] * ny[..., 0] - w[..., 1] * ny[..., 1]
        imag = w[..., 0] * ny[..., 1] + w[..., 1] * ny[..., 0]
        pred = jnp.sum(jnp.stack([real, imag], axis=-1), axis=-2)  # [B, F, T, 2]
        return pred, {"convs": new_conv, "gru_s": gs_state, "gru_n": gn_state}


    def forward_stacked(self, params, state, x):
        """All-chunks parallel forward: x ``[N, B, M, F, T, 2]``
        (equivalent to scanning :meth:`forward`; convs use shifted-
        context buffers, covariance GRUs batch their projections)."""
        n, bb, m, f, t, _ = x.shape
        noisy = x
        flat_in = x.reshape((n * bb,) + x.shape[2:])
        angle = jnp.arctan(flat_in[..., 1] / (flat_in[..., 0] + EPS) + EPS)
        ipd = angle[:, :1] - angle[:, 1:]
        mag = jnp.sqrt(flat_in[..., 0] ** 2 + flat_in[..., 1] ** 2 + 1e-10)
        h = jnp.concatenate([mag, ipd], axis=1)
        h = h.reshape((n, bb) + h.shape[1:])

        residuals = [h]
        new_conv = []
        for c, p, st in zip(self.convs, params["convs"], state["convs"]):
            h, st2 = c.apply_stacked(p, st, h)
            residuals.append(h)
            new_conv.append(st2)

        h = h.reshape((n * bb,) + h.shape[2:])
        idx = -2
        for d, p in zip(self.deconvs[:-1], params["deconvs"][:-1]):
            res = residuals[idx]
            h, _ = d.apply(p, {}, h, res=res.reshape((n * bb,) + res.shape[2:]))
            idx -= 1
        h, _ = self.deconvs[-1].apply(params["deconvs"][-1], {}, h)

        filt = h.reshape(n * bb, 2, 2, m, 9, f * t)
        s_f = jax.lax.complex(filt[:, 0, 0], filt[:, 0, 1])
        n_f = jax.lax.complex(filt[:, 1, 0], filt[:, 1, 1])
        plane = noisy.reshape(n * bb, m, f, t * 2)
        unf = _unfold3x3(plane).reshape(n * bb, m, 9, f * t, 2)
        y = jax.lax.complex(unf[..., 0], unf[..., 1])

        s = jnp.sum(s_f * y, axis=2).transpose(0, 2, 1)[..., None]
        nn = jnp.sum(n_f * y, axis=2).transpose(0, 2, 1)[..., None]
        phi_s = (s @ jnp.conjugate(s).swapaxes(-1, -2)).real
        phi_n = (nn @ jnp.conjugate(nn).swapaxes(-1, -2)).real
        phi_s, _ = self.ln_s.apply(params["ln_s"], {}, phi_s)
        phi_n, _ = self.ln_n.apply(params["ln_n"], {}, phi_n)

        def to_gru(p):
            # [N*B, FT, M, M] -> [N, B*F, M*M, T]
            return p.reshape(n, bb, f, t, m, m).transpose(0, 1, 2, 4, 5, 3) \
                .reshape(n, bb * f, m * m, t)

        phi_s, gs_state = self.gru_s.apply_stacked(params["gru_s"],
                                                   state["gru_s"], to_gru(phi_s))
        phi_n, gn_state = self.gru_n.apply_stacked(params["gru_n"],
                                                   state["gru_n"], to_gru(phi_n))
        phi = (phi_s * phi_n).reshape(n, bb, f, m * m, t).swapaxes(3, 4)

        lin = params["lin"]
        w = jax.nn.relu(phi @ lin["w1"].T + lin["b1"])
        w = w.reshape((n * bb,) + w.shape[2:])
        w, _ = self.lin_norm.apply(lin["norm"], {}, w)
        w = (w @ lin["w2"].T + lin["b2"]).reshape(n, bb, f, t, m, 2)

        ny = noisy.transpose(0, 1, 3, 4, 2, 5)  # [N, B, F, T, M, 2]
        real = w[..., 0] * ny[..., 0] - w[..., 1] * ny[..., 1]
        imag = w[..., 0] * ny[..., 1] + w[..., 1] * ny[..., 0]
        pred = jnp.sum(jnp.stack([real, imag], axis=-1), axis=-2)
        return pred, {"convs": new_conv, "gru_s": gs_state, "gru_n": gn_state}

    def realtime_process(self, params, state, mixture, flag: bool = False):
        b, m, _ = mixture.shape
        if not flag:
            pad = jnp.zeros((b, m, self.segment_length // 2), mixture.dtype)
            mixture = jnp.concatenate([pad, mixture], axis=-1)
            state = self.init_state(b, mixture.dtype)
        x, gap = self.preprocessing(mixture)
        preds, state = self.forward_stacked(params, state, x)
        wav = self.postprocessing(preds, gap)
        if not flag:
            wav = wav[..., self.segment_length // 2:]
        return wav, state

    def realtime_process_scan(self, params, state, mixture, flag: bool = False):
        return StreamingModel.realtime_process(self, params, state, mixture,
                                               flag)

    def realtime_process_batched(self, params, state, mixture, reset_mask):
        """Multi-stream runtime with a traced per-stream ``reset_mask[B]``
        (contract: TemporalCRN.realtime_process_batched; warm-up lead-in
        is the data pipeline's job). Conv ring buffers are batch-first;
        the covariance GRUs fold F into batch (``[B*F]`` rows, index
        b*F+f — see ``to_gru``), so their reset mask repeats per stream.
        """
        from semi_tpu.models.base import select_reset

        b = mixture.shape[0]
        fresh = self.init_state(b, mixture.dtype)
        mask_f = jnp.repeat(reset_mask, self.num_freqs)
        state = {
            "convs": select_reset(state["convs"], fresh["convs"], reset_mask),
            "gru_s": select_reset(state["gru_s"], fresh["gru_s"], mask_f),
            "gru_n": select_reset(state["gru_n"], fresh["gru_n"], mask_f),
        }
        x, gap = self.preprocessing(mixture)
        preds, state = self.forward_stacked(params, state, x)
        wav = self.postprocessing(preds, gap)
        return wav, state


class MVDRBeamformer:
    """Mask-based MVDR (fullsubnet.py:25-174) in native complex64."""

    def __init__(self, use_mask_norm: bool = False, eps: float = EPS):
        self.use_mask_norm = use_mask_norm
        self.eps = eps

    @staticmethod
    def estimate_psd(mask, spec, eps: float = 1e-5):
        """mask: [B, F, T] complex; spec: [B, C, F, T] complex -> [B, F, C, C]."""
        spec = spec.swapaxes(1, 2)  # [B, F, C, T]
        masked = spec * mask[:, :, None, :]
        nominator = masked @ jnp.conjugate(masked).swapaxes(-1, -2)
        mk = mask[:, :, None, :]
        denominator = jnp.conjugate(mk) @ mk.swapaxes(-1, -2)
        psd = nominator / (denominator + EPS)
        return psd + 1j * eps

    def derive_weight(self, speech_psd, noise_psd, eps: float = 1e-8):
        """[B, F, C, C] x2 -> weights [B, F, C] (reference mic 0)."""
        c = noise_psd.shape[-1]
        noise_psd = noise_psd + jnp.eye(c, dtype=noise_psd.dtype) * eps
        rn_inv_rs = jnp.linalg.solve(noise_psd, speech_psd)  # [B, F, C, C]
        tr = jnp.trace(rn_inv_rs, axis1=-2, axis2=-1) + eps  # [B, F]
        return rn_inv_rs[..., 0] / tr[..., None]  # u = e_0

    def __call__(self, speech_mask, noise_mask, spec):
        """masks [B, F, T], spec [B, C, F, T] (complex) -> [B, F, T]."""
        if self.use_mask_norm:
            def norm(m):
                mag = jnp.sqrt(m.real**2 + m.imag**2 + EPS)
                return m / (jnp.max(mag, axis=1, keepdims=True) + EPS)
            speech_mask = norm(speech_mask)
            noise_mask = norm(noise_mask)
        speech_psd = self.estimate_psd(speech_mask, spec)
        noise_psd = self.estimate_psd(noise_mask, spec)
        w = self.derive_weight(speech_psd, noise_psd, self.eps)  # [B, F, C]
        return jnp.einsum("bfc,bcft->bft", jnp.conjugate(w), spec)
