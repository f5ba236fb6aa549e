"""HiFi-GAN enhancement: streaming generator + mel/scale discriminators.

Parity with the reference (Hifi-GAN/hifigan.py):
- Generator (hifigan.py:444-656): CRN topology with weight-normalized
  self-gated convs ``act(conv(x)) * sigmoid(conv(x))`` (default Tanh, no
  layer norm), LSTM bottleneck, gated-skip decoder, and a 12-layer 1x1
  postnet refining the cIRM; ``realtime_process`` returns both post- and
  pre-postnet waveforms.
- MultiMelDiscriminator (hifigan.py:660-710): DiscriminatorM conv stacks
  over mel spectrograms at n_fft {400, 800, 1600}, 80 mels.
- MultiScaleDiscriminator (hifigan.py:713-768): DiscriminatorS grouped
  1-D conv stacks on average-pooled waveforms.
- Hifi_GAN.train_stage (hifigan.py:917-1013): stage 1 = compressed-mag
  (0.3-power) + phase STFT loss on the pre-postnet output; stage 2 =
  0.5/0.5 on both outputs; stage 3 = hinge adversarial with feature
  matching.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from semi_tpu.layers.module import Module, detach
from semi_tpu.layers.rnn import SequenceModel
from semi_tpu.models.base import StreamingModel
from semi_tpu.ops.mask import complex_mul, decompress_cirm

EPS = 1e-8
LRELU_SLOPE = 0.1

__all__ = ["Generator", "HifiGAN", "MultiMelDiscriminator",
           "MultiScaleDiscriminator", "mel_filterbank"]


# ---------------------------------------------------------------------
# weight normalization (w = g * v / ||v||, per output channel)
# ---------------------------------------------------------------------

def wn_init(key, shape, fan_in, bias_ch: int | None = None):
    """``g`` normalizes per dim 0 (torch weight_norm default); ``bias_ch``
    is the output-channel count (dim 1 for transposed IOHW weights)."""
    bound = 1.0 / math.sqrt(fan_in)
    kv, kb = jax.random.split(key)
    v = jax.random.uniform(kv, shape, minval=-bound, maxval=bound)
    axes = tuple(range(1, len(shape)))
    g = jnp.sqrt(jnp.sum(v * v, axis=axes))
    b = jax.random.uniform(kb, (bias_ch or shape[0],),
                           minval=-bound, maxval=bound)
    return {"v": v, "g": g, "b": b}


def wn_weight(p):
    axes = tuple(range(1, p["v"].ndim))
    norm = jnp.sqrt(jnp.sum(p["v"] ** 2, axis=axes, keepdims=True)) + 1e-12
    g = p["g"].reshape((-1,) + (1,) * (p["v"].ndim - 1))
    return g * p["v"] / norm


def wn_conv2d(x, p, stride=(1, 1), dilation=(1, 1), padding=((0, 0), (0, 0)),
              transpose=False):
    w = wn_weight(p)
    if not transpose:
        y = jax.lax.conv_general_dilated(
            x, w, stride, padding, rhs_dilation=dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    else:
        kh = (w.shape[2] - 1) * dilation[0] + 1
        kw = (w.shape[3] - 1) * dilation[1] + 1
        pads = ((kh - 1 - padding[0][0], kh - 1 - padding[0][1]),
                (kw - 1 - padding[1][0], kw - 1 - padding[1][1]))
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(w, (2, 3)).transpose(1, 0, 2, 3), (1, 1), pads,
            lhs_dilation=stride, rhs_dilation=dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"][None, :, None, None]


ACT = {"Tanh": jnp.tanh, "ReLU": jax.nn.relu, "Sigmoid": jax.nn.sigmoid}


class GanTemporalConv2d(Module):
    """Self-gated weight-norm conv: ``act(y) * sigmoid(y)``
    (Hifi-GAN/hifigan.py:193-249). No layer norm."""

    def __init__(self, n_in, n_out, kernel, stride, dilation, padding,
                 activation="Tanh"):
        self.n_in, self.n_out = n_in, n_out
        self.kernel, self.stride, self.dilation = kernel, stride, dilation
        self.freq_pad, self.time_pad = padding
        self.act = ACT[activation]

    def init(self, key):
        return wn_init(key, (self.n_out, self.n_in) + tuple(self.kernel),
                       self.n_in * self.kernel[0] * self.kernel[1])

    def init_state(self, batch, num_freqs=None, dtype=jnp.float32):
        if self.time_pad == 0:
            return {}
        return {"buffer": jnp.zeros((batch, self.n_in, num_freqs,
                                     self.time_pad), dtype)}

    def apply(self, params, state, x):
        if self.time_pad > 0:
            x = jnp.concatenate([state["buffer"], x], axis=-1)
            new_state = {"buffer": detach(x[..., -self.time_pad:])}
        else:
            new_state = state
        y = wn_conv2d(x, params, self.stride, self.dilation,
                      ((self.freq_pad, self.freq_pad), (0, 0)))
        return self.act(y) * jax.nn.sigmoid(y), new_state

    def apply_stacked(self, params, state, x):
        """x: ``[N, B, C, F, T]`` stacked chunks with shifted-context
        buffers (see TemporalConv2d.apply_stacked)."""
        n, b = x.shape[:2]
        if self.time_pad > 0:
            ctx = detach(jnp.concatenate(
                [state["buffer"][None], x[:-1, ..., -self.time_pad:]], axis=0))
            inp = jnp.concatenate([ctx, x], axis=-1)
            new_state = {"buffer": detach(inp[-1, ..., -self.time_pad:])}
        else:
            inp = x
            new_state = state
        flat = inp.reshape((n * b,) + inp.shape[2:])
        y = wn_conv2d(flat, params, self.stride, self.dilation,
                      ((self.freq_pad, self.freq_pad), (0, 0)))
        y = self.act(y) * jax.nn.sigmoid(y)
        return y.reshape((n, b) + y.shape[1:]), new_state


class GanTemporalConvTranspose2d(Module):
    """Self-gated weight-norm deconv with tanh-gated skip fusion
    (Hifi-GAN/hifigan.py:252-305)."""

    def __init__(self, n_in, n_out, kernel, stride, dilation, padding,
                 activation="Tanh"):
        self.n_in, self.n_out = n_in, n_out
        self.kernel, self.stride, self.dilation = kernel, stride, dilation
        self.freq_pad = padding[0]
        self.act = ACT[activation]

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "deconv": wn_init(k1, (self.n_in, self.n_out) + tuple(self.kernel),
                              self.n_out * self.kernel[0] * self.kernel[1],
                              bias_ch=self.n_out),
            "res_mask": wn_init(k2, (self.n_out, self.n_out, 1, 1), self.n_out),
            "residual": wn_init(k3, (self.n_out, self.n_out, 1, 1), self.n_out),
        }

    def apply(self, params, state, x, res=None):
        t = x.shape[-1]
        y = wn_conv2d(x, params["deconv"], self.stride, self.dilation,
                      ((self.freq_pad, self.freq_pad), (0, 0)),
                      transpose=True)[..., -t:]
        out = self.act(y) * jax.nn.sigmoid(y)
        if res is not None:
            f_res, f_out = res.shape[-2], out.shape[-2]
            if f_res > f_out:
                out = jnp.pad(out, ((0, 0), (0, 0), (0, f_res - f_out), (0, 0)))
            elif f_res < f_out:
                out = out[:, :, :f_res]
            mask = jax.nn.sigmoid(wn_conv2d(res, params["res_mask"]))
            out = mask * jnp.tanh(wn_conv2d(res, params["residual"])) + \
                (1.0 - mask) * out
        return out, state


class Generator(StreamingModel):
    def __init__(self, num_channels, num_freqs, hidden, segment_length,
                 num_layers=1, num_inputs=3, kernel_size=3, dropout=0.0,
                 sample_rate=16000, win_length=25, hop_length=10, n_fft=400,
                 remat=True):
        super().__init__(segment_length, num_freqs, sample_rate, win_length,
                         hop_length, n_fft, remat=remat)
        self.num_inputs = num_inputs
        feat_ch = 2 * num_inputs - 1
        levels = len(num_channels)

        self.convs, deconvs = [], []
        self.enc_freqs = []
        f = num_freqs
        for i in range(levels):
            dt = 2 ** i
            in_ch = feat_ch if i == 0 else num_channels[i - 1]
            out_ch = num_channels[i]
            self.convs.append(GanTemporalConv2d(
                in_ch, out_ch, (5, kernel_size), (2, 1), (1, dt),
                (2, (kernel_size - 1) * dt)))
            self.enc_freqs.append(f)
            f = (f - 1) // 2 + 1
            dt_dec = 2 ** (levels - i - 1)
            dec_out = 2 if i == 0 else in_ch
            deconvs.insert(0, GanTemporalConvTranspose2d(
                out_ch, dec_out, (5, kernel_size), (2, 1), (1, dt_dec),
                (2, (kernel_size - 1) * dt_dec)))
        self.deconvs = deconvs

        # bottleneck dim hard-codes //16 for 4 levels (hifigan.py:489)
        gru_dim = (num_freqs // 16 + 1) * num_channels[-1]
        self.gru = SequenceModel(gru_dim, gru_dim, hidden, num_layers,
                                 sequence_model="LSTM",
                                 output_activate_function="Tanh")

        post_channel = 128
        self.postnet = (
            [GanTemporalConv2d(2, post_channel, (1, 1), (1, 1), (1, 1), (0, 0))]
            + [GanTemporalConv2d(post_channel, post_channel, (1, 1), (1, 1),
                                 (1, 1), (0, 0)) for _ in range(10)]
            + [GanTemporalConv2d(post_channel, 2, (1, 1), (1, 1), (1, 1), (0, 0))]
        )

    def init(self, key):
        n = len(self.convs) + len(self.deconvs) + len(self.postnet) + 1
        it = iter(jax.random.split(key, n))
        return {
            "convs": [m.init(next(it)) for m in self.convs],
            "gru": self.gru.init(next(it)),
            "deconvs": [m.init(next(it)) for m in self.deconvs],
            "postnet": [m.init(next(it)) for m in self.postnet],
        }

    def init_state(self, batch, dtype=jnp.float32):
        return {
            "convs": [m.init_state(batch, num_freqs=f, dtype=dtype)
                      for m, f in zip(self.convs, self.enc_freqs)],
            "gru": self.gru.init_state(batch, dtype),
        }

    def features(self, x):
        # arctan phase like GeneralBeamformer (hifigan.py:505)
        angle = jnp.arctan(x[..., 1] / (x[..., 0] + EPS) + EPS)
        ipd = angle[:, :1] - angle[:, 1:]
        mag = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-10)
        return jnp.concatenate([mag, ipd], axis=1)

    def forward(self, params, state, x, post: bool = True):
        """Returns (post_pred, pre_pred, state); pre_pred is the
        pre-postnet mask applied (zeros when post=False matches the
        reference's None)."""
        noisy = x[:, 0]
        h = self.features(x)

        residuals = [h]
        new_conv = []
        for m, p, st in zip(self.convs, params["convs"], state["convs"]):
            h, st2 = m.apply(p, st, h)
            residuals.append(h)
            new_conv.append(st2)

        b, c, f, t = h.shape
        h = h.reshape(b, c * f, t)
        h, gru_state = self.gru.apply(params["gru"], state["gru"], h)
        h = h.reshape(b, c, f, t)

        idx = -2
        for m, p in zip(self.deconvs[:-1], params["deconvs"][:-1]):
            h, _ = m.apply(p, {}, h, res=residuals[idx])
            idx -= 1
        h, _ = self.deconvs[-1].apply(params["deconvs"][-1], {}, h)

        def apply_mask(mask_cft):
            mask = decompress_cirm(mask_cft.transpose(0, 2, 3, 1))
            er, ei = complex_mul(mask[..., 0], mask[..., 1],
                                 noisy[..., 0], noisy[..., 1])
            return jnp.stack([er, ei], axis=-1)

        new_state = {"convs": new_conv, "gru": gru_state}
        if not post:
            return apply_mask(h), jnp.zeros_like(apply_mask(h)), new_state

        pre = apply_mask(h)
        for m, p in zip(self.postnet, params["postnet"]):
            h, _ = m.apply(p, {}, h)
        return apply_mask(h), pre, new_state

    def forward_stacked(self, params, state, x, post: bool = True):
        """All-chunks parallel forward: x ``[N, B, M, F, T, 2]``."""
        n, bb, m, f, t, _ = x.shape
        noisy = x[:, :, 0]
        flat = x.reshape((n * bb,) + x.shape[2:])
        h = self.features(flat).reshape(n, bb, -1, f, t)

        residuals = [h]
        new_conv = []
        for mod, p, st in zip(self.convs, params["convs"], state["convs"]):
            h, st2 = mod.apply_stacked(p, st, h)
            residuals.append(h)
            new_conv.append(st2)

        _, _, c, fb, tt = h.shape
        h = h.reshape(n, bb, c * fb, tt)
        h, gru_state = self.gru.apply_stacked(params["gru"], state["gru"], h)
        h = h.reshape(n * bb, c, fb, tt)

        idx = -2
        for mod, p in zip(self.deconvs[:-1], params["deconvs"][:-1]):
            res = residuals[idx]
            h, _ = mod.apply(p, {}, h, res=res.reshape((n * bb,) + res.shape[2:]))
            idx -= 1
        h, _ = self.deconvs[-1].apply(params["deconvs"][-1], {}, h)

        def apply_mask(mask_cft):
            mask = decompress_cirm(
                mask_cft.reshape(n, bb, 2, f, t).transpose(0, 1, 3, 4, 2))
            er, ei = complex_mul(mask[..., 0], mask[..., 1],
                                 noisy[..., 0], noisy[..., 1])
            return jnp.stack([er, ei], axis=-1)

        new_state = {"convs": new_conv, "gru": gru_state}
        if not post:
            pred = apply_mask(h)
            return pred, jnp.zeros_like(pred), new_state
        pre = apply_mask(h)
        for mod, p in zip(self.postnet, params["postnet"]):
            h, _ = mod.apply(p, {}, h)
        return apply_mask(h), pre, new_state

    def realtime_process(self, params, state, mixture, post: bool = True,
                         reset: bool = False):
        """Returns (post_wav, pre_wav, state) (hifigan.py:615-656).
        Uses the parallel stacked-chunk forward."""
        b, m, _ = mixture.shape
        if reset:
            pad = jnp.zeros((b, m, self.segment_length // 2), mixture.dtype)
            mixture = jnp.concatenate([pad, mixture], axis=-1)
            state = self.init_state(b, mixture.dtype)

        x, gap = self.preprocessing(mixture)
        posts, pres, state = self.forward_stacked(params, state, x, post=post)
        wav_post = self.postprocessing(posts, gap)
        wav_pre = self.postprocessing(pres, gap)
        if reset:
            wav_post = wav_post[..., self.segment_length // 2:]
            wav_pre = wav_pre[..., self.segment_length // 2:]
        return wav_post, wav_pre, state

    def realtime_process_batched(self, params, state, mixture, reset_mask,
                                 post: bool = True):
        """Multi-stream generator runtime: B independent utterance
        streams with a traced per-stream ``reset_mask[B]`` (contract:
        TemporalCRN.realtime_process_batched; warm-up lead-in is the
        data pipeline's job). Generator state (conv ring buffers, LSTM
        hidden) is batch-first, so the plain per-stream select works.
        Returns ``(post_wav[B, L], pre_wav[B, L], state)``.
        """
        from semi_tpu.models.base import select_reset

        b = mixture.shape[0]
        state = select_reset(state, self.init_state(b, mixture.dtype),
                             reset_mask)
        x, gap = self.preprocessing(mixture)
        posts, pres, state = self.forward_stacked(params, state, x, post=post)
        wav_post = self.postprocessing(posts, gap)
        wav_pre = self.postprocessing(pres, gap)
        return wav_post, wav_pre, state

    def realtime_process_scan(self, params, state, mixture, post: bool = True,
                              reset: bool = False):
        """Chunk-scan runtime (kept for equivalence testing)."""
        b, m, _ = mixture.shape
        if reset:
            pad = jnp.zeros((b, m, self.segment_length // 2), mixture.dtype)
            mixture = jnp.concatenate([pad, mixture], axis=-1)
            state = self.init_state(b, mixture.dtype)

        x, gap = self.preprocessing(mixture)

        def step(st, xc):
            y_post, y_pre, st2 = self.forward(params, st, xc, post=post)
            return st2, (y_post, y_pre)

        if self.remat:
            step = jax.checkpoint(step)
        state, (posts, pres) = jax.lax.scan(step, state, x)

        wav_post = self.postprocessing(posts, gap)
        wav_pre = self.postprocessing(pres, gap)
        if reset:
            wav_post = wav_post[..., self.segment_length // 2:]
            wav_pre = wav_pre[..., self.segment_length // 2:]
        return wav_post, wav_pre, state


# ---------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------

def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int) -> np.ndarray:
    """HTK-scale triangular mel filterbank [n_freqs, n_mels]
    (torchaudio MelSpectrogram defaults: f_min 0, f_max sr/2, no norm)."""
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sample_rate / 2, n_freqs)

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0),
                                    hz_to_mel(sample_rate / 2), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels), np.float32)
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - freqs) / max(hi - ctr, 1e-9)
        fb[:, i] = np.maximum(0.0, np.minimum(up, down))
    return fb


def _melspec(y, sample_rate, n_fft, n_mels):
    """[B, 1, L] -> [B, 1, n_mels, T] power mel spectrogram."""
    from semi_tpu.metrics.losses import power_spectrogram

    spec = power_spectrogram(y[:, 0], n_fft, n_fft, n_fft // 2)  # [B, F, T]
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    return jnp.einsum("bft,fm->bmt", spec, fb)[:, None]


class DiscriminatorM(Module):
    """Conv2d stack on mel spectrograms (hifigan.py:660-684)."""

    SPEC = [  # (in, out, kernel, stride, pad)
        (1, 32, (3, 3), (1, 1), (1, 1)),
        (32, 32, (3, 9), (1, 1), (1, 4)),
        (32, 32, (3, 8), (1, 2), (1, 3)),
        (32, 32, (3, 8), (1, 2), (1, 3)),
        (32, 32, (3, 6), (1, 2), (1, 2)),
    ]

    def init(self, key):
        keys = jax.random.split(key, len(self.SPEC) + 1)
        convs = [wn_init(k, (o, i) + kk, i * kk[0] * kk[1])
                 for k, (i, o, kk, _, _) in zip(keys[:-1], self.SPEC)]
        post = wn_init(keys[-1], (1, 32, 32, 5), 32 * 32 * 5)
        return {"convs": convs, "post": post}

    def apply(self, params, state, x):
        fmap = []
        for p, (_, _, k, s, pad) in zip(params["convs"], self.SPEC):
            x = wn_conv2d(x, p, s, (1, 1), ((pad[0], pad[0]), (pad[1], pad[1])))
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = wn_conv2d(x, params["post"], (32, 1), (1, 1), ((0, 0), (2, 2)))
        fmap.append(x)
        # AvgPool2d((1, 2)) then flatten
        t2 = (x.shape[-1] // 2) * 2
        x = x[..., :t2].reshape(x.shape[:-1] + (t2 // 2, 2)).mean(-1)
        return x.reshape(x.shape[0], -1), fmap


def _wn_conv1d(x, p, stride=1, padding=0, groups=1):
    w = wn_weight(p)
    y = jax.lax.conv_general_dilated(
        x, w, (stride,), ((padding, padding),),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + p["b"][None, :, None]


class DiscriminatorS(Module):
    """Grouped Conv1d stack on waveforms (hifigan.py:713-740)."""

    SPEC = [  # (in, out, kernel, stride, groups, pad)
        (1, 128, 15, 1, 1, 7),
        (128, 128, 41, 2, 4, 20),
        (128, 256, 41, 2, 16, 20),
        (256, 512, 41, 4, 16, 20),
        (512, 1024, 41, 4, 16, 20),
        (1024, 1024, 41, 1, 16, 20),
        (1024, 1024, 5, 1, 1, 2),
    ]

    def init(self, key):
        keys = jax.random.split(key, len(self.SPEC) + 1)
        convs = [wn_init(k, (o, i // g, kk), (i // g) * kk)
                 for k, (i, o, kk, _, g, _) in zip(keys[:-1], self.SPEC)]
        post = wn_init(keys[-1], (1, 1024, 3), 1024 * 3)
        return {"convs": convs, "post": post}

    def apply(self, params, state, x):
        fmap = []
        for p, (_, _, _, s, g, pad) in zip(params["convs"], self.SPEC):
            x = jax.nn.leaky_relu(_wn_conv1d(x, p, s, pad, g), LRELU_SLOPE)
            fmap.append(x)
        x = _wn_conv1d(x, params["post"], 1, 1, 1)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiMelDiscriminator(Module):
    def __init__(self, sample_rate, nffts, n_mels):
        self.sample_rate = sample_rate
        self.nffts = tuple(nffts)
        self.n_mels = n_mels
        self.discs = [DiscriminatorM() for _ in nffts]

    def init(self, key):
        return [d.init(k) for d, k in
                zip(self.discs, jax.random.split(key, len(self.discs)))]

    def apply(self, params, state, y_hat, y):
        rs, gs, fr, fg = [], [], [], []
        for p, d, nfft in zip(params, self.discs, self.nffts):
            mel_r = _melspec(y, self.sample_rate, nfft, self.n_mels)
            mel_g = _melspec(y_hat, self.sample_rate, nfft, self.n_mels)
            r, fmap_r = d.apply(p, {}, mel_r)
            g, fmap_g = d.apply(p, {}, mel_g)
            rs.append(r); gs.append(g); fr.append(fmap_r); fg.append(fmap_g)
        return rs, gs, fr, fg


def _avgpool1d(x, kernel=4, stride=2, pad=2):
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    n = (xp.shape[-1] - kernel) // stride + 1
    idx = np.arange(n)[:, None] * stride + np.arange(kernel)[None, :]
    return xp[..., idx].mean(-1)


class MultiScaleDiscriminator(Module):
    def __init__(self):
        self.discs = [DiscriminatorS() for _ in range(3)]

    def init(self, key):
        return [d.init(k) for d, k in
                zip(self.discs, jax.random.split(key, 3))]

    def apply(self, params, state, y_hat, y):
        rs, gs, fr, fg = [], [], [], []
        for i, (p, d) in enumerate(zip(params, self.discs)):
            if i != 0:
                y = _avgpool1d(y)
                y_hat = _avgpool1d(y_hat)
            r, fmap_r = d.apply(p, {}, y)
            g, fmap_g = d.apply(p, {}, y_hat)
            rs.append(r); gs.append(g); fr.append(fmap_r); fg.append(fmap_g)
        return rs, gs, fr, fg


# ---------------------------------------------------------------------
# the full GAN
# ---------------------------------------------------------------------

class HifiGAN:
    def __init__(self, nffts, n_mels, num_channels, num_freqs, hidden,
                 segment_length, num_layers=1, num_inputs=3, kernel_size=3,
                 dropout=0.0, sample_rate=16000, win_length=25, hop_length=10,
                 n_fft=400, remat=True):
        self.generator = Generator(num_channels, num_freqs, hidden,
                                   segment_length, num_layers, num_inputs,
                                   kernel_size, dropout, sample_rate,
                                   win_length, hop_length, n_fft, remat=remat)
        self.mel_disc = MultiMelDiscriminator(sample_rate, nffts, n_mels)
        self.scale_disc = MultiScaleDiscriminator()
        self.segment_length = segment_length

    def init(self, key):
        kg, km, ks = jax.random.split(key, 3)
        return {"generator": self.generator.init(kg),
                "mel_disc": self.mel_disc.init(km),
                "scale_disc": self.scale_disc.init(ks)}

    def init_state(self, batch, dtype=jnp.float32):
        return self.generator.init_state(batch, dtype)

    # eval contract (Hifi-GAN/predict.py): generator post output
    def realtime_process(self, params, state, mixture, flag: bool = False):
        gen = params["generator"] if "generator" in params else params
        y, _, st = self.generator.realtime_process(
            gen, state, mixture, post=True, reset=not flag)
        return y, st

    def discriminator_forward(self, params, y_hat, y):
        r1, g1, fr1, fg1 = self.mel_disc.apply(params["mel_disc"], {}, y_hat, y)
        r2, g2, fr2, fg2 = self.scale_disc.apply(params["scale_disc"], {},
                                                 y_hat, y)
        return r1 + r2, g1 + g2, fr1 + fr2, fg1 + fg2

    # -- losses (hifigan.py:948-1013) ----------------------------------
    @staticmethod
    def stft_loss(pred, real, nfft=400, nhop=200, nwin=200, phase=False):
        from semi_tpu.ops.stft import stft as _stft

        window = jnp.concatenate([
            jnp.asarray(np.hanning(nwin + 1)[:-1], jnp.float32),
            jnp.zeros((nfft - nwin,), jnp.float32)])
        # torch.stft pads a short window symmetrically
        window = jnp.roll(window, (nfft - nwin) // 2)
        ps = _stft(pred, n_fft=nfft, hop=nhop, window=window)
        rs = _stft(real, n_fft=nfft, hop=nhop, window=window)
        pm = jnp.sqrt(jnp.maximum(ps[..., 0] ** 2 + ps[..., 1] ** 2, 1e-14))
        rm = jnp.sqrt(jnp.maximum(rs[..., 0] ** 2 + rs[..., 1] ** 2, 1e-14))
        if phase:
            pp = ps / pm[..., None]
            rp = rs / rm[..., None]
            # the reference REASSIGNS pred_mag/real_mag to the 0.3-power
            # form before the spectral-convergence term (hifigan.py:
            # 1000-1002, 1005) — at stages 1/2 SC operates on COMPRESSED
            # magnitudes; only the phase=False branch sees raw magnitudes
            pm, rm = pm ** 0.3, rm ** 0.3
            mag_loss = 0.7 * jnp.mean(jnp.abs(pm - rm)) + 0.3 * jnp.mean(
                jnp.abs(pm[..., None] * pp - rm[..., None] * rp))
        else:
            mag_loss = jnp.mean(jnp.abs(jnp.log(pm) - jnp.log(rm)))
        # reference quirks kept verbatim (hifigan.py:1005): Frobenius norm
        # over the WHOLE batch tensor (not per-item), and normalized by
        # the PREDICTION's norm (canonical SC divides by the reference's)
        sc_loss = (jnp.linalg.norm((pm - rm).reshape(-1)) /
                   (jnp.linalg.norm(pm.reshape(-1)) + 1e-12))
        return mag_loss + sc_loss

    @staticmethod
    def feature_loss(fmap_r, fmap_g):
        loss = 0.0
        for dr, dg in zip(fmap_r, fmap_g):
            for rl, gl in zip(dr, dg):
                loss = loss + jnp.mean(jnp.abs(rl - gl))
        return loss

    @staticmethod
    def discriminator_loss(real_outs, gen_outs):
        loss = 0.0
        for dr, dg in zip(real_outs, gen_outs):
            loss = loss + jnp.mean(jax.nn.relu(1.0 - dr)) + \
                jnp.mean(jax.nn.relu(1.0 + dg))
        return loss

    @staticmethod
    def generator_adv_loss(gen_outs):
        loss = 0.0
        for dg in gen_outs:
            loss = loss + jnp.mean(-dg)
        return loss

    # -- stage losses ----------------------------------------------------
    def stage_g_loss(self, params, state, x, y, stage: int, flag: bool):
        """Generator-side loss for a stage; returns (loss, y_hat, state)."""
        post = stage != 1
        y_hat, y_before, st = self.generator.realtime_process(
            params["generator"], state, x, post=post, reset=not flag)
        if stage == 1:
            return self.stft_loss(y_hat, y, phase=True), y_hat, st
        if stage == 2:
            loss = 0.5 * self.stft_loss(y_hat, y, phase=True) + \
                0.5 * self.stft_loss(y_before, y, phase=True)
            return loss, y_hat, st
        # stage 3 generator: feature match + hinge
        d_params = jax.lax.stop_gradient(
            {"mel_disc": params["mel_disc"], "scale_disc": params["scale_disc"]})
        _, g_out, fmap_r, fmap_g = self.discriminator_forward(
            d_params, y_hat[:, None], y[:, None])
        return (self.feature_loss(fmap_r, fmap_g) +
                self.generator_adv_loss(g_out)), y_hat, st

    def stage_d_loss(self, params, y_hat, y):
        """Discriminator hinge loss on a detached generator output."""
        r_out, g_out, _, _ = self.discriminator_forward(
            params, jax.lax.stop_gradient(y_hat)[:, None], y[:, None])
        return self.discriminator_loss(r_out, g_out)
