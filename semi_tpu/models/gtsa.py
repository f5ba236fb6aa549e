"""GTSA — Gaussian-weighted transformer with streaming KV caches.

Parity with the reference (GTSA_original.py:247-433): mag + IPD
features, then alternating transformer layers — even layers attend over
time with frequency features (model_dim = num_freqs, 3 heads, sequence
batched as B*C), odd layers with channel features (model_dim = 2M-1,
1 head, batched as B*F) — and a causal gated 1-D conv head producing
the compressed cIRM. Attention uses a fixed 210-frame KV ring buffer
with learnable-width Gaussian distance decay (T-GSA).

Config repair, preserving the keys-are-kwargs contract: the reference's
active YAML passes ``time_dim`` where the constructor wants
``model_dim`` — a latent TypeError (SURVEY.md §2.5). Both are accepted
here and both are IGNORED, which matches the constructor's actual
behavior (GTSA_original.py:267-273 hard-codes dims and heads).

Loss: 0.7 * PESQ + 0.3 * (-SI-SNR) (GTSA_original.py:411-433).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.attention import TransformerLayer
from semi_tpu.layers.conv import TemporalConv1d
from semi_tpu.models.base import StreamingModel
from semi_tpu.ops.mask import complex_mul, decompress_cirm

__all__ = ["GTSA"]


class GTSA(StreamingModel):
    def __init__(self, num_mics, num_freqs, segment_length, num_layers,
                 num_heads=4, model_dim=None, time_dim=None, fn_dim=1024,
                 maxlen=210, dropout=0.0, sample_rate=16000, win_length=25,
                 hop_length=10, n_fft=400, remat=True):
        super().__init__(segment_length, num_freqs, sample_rate, win_length,
                         hop_length, n_fft, remat=remat)
        del num_heads, model_dim, time_dim  # accepted-and-ignored (see docstring)
        self.num_mics = num_mics
        self.feat_ch = 2 * num_mics - 1

        self.layers = []
        for i in range(num_layers):
            if i % 2 == 0:
                self.layers.append(TransformerLayer(3, num_freqs, fn_dim, maxlen))
            else:
                self.layers.append(TransformerLayer(1, self.feat_ch, fn_dim, maxlen))
        self.last_conv = TemporalConv1d(
            num_freqs * self.feat_ch, num_freqs * 2, 3, stride=1, dilation=1,
            padding=2, activation=None)

    def init(self, key):
        keys = jax.random.split(key, len(self.layers) + 1)
        return {
            "layers": [m.init(k) for m, k in zip(self.layers, keys[:-1])],
            "last_conv": self.last_conv.init(keys[-1]),
        }

    def init_state(self, batch: int, dtype=jnp.float32):
        states = []
        for i, m in enumerate(self.layers):
            eff_batch = batch * self.feat_ch if i % 2 == 0 else batch * self.num_freqs
            states.append(m.init_state(eff_batch, dtype))
        return {
            "layers": states,
            "last_conv": self.last_conv.init_state(batch, dtype),
        }

    def features(self, x):
        angle = jnp.arctan2(x[..., 1], x[..., 0])
        ipd = angle[:, :1] - angle[:, 1:]
        mag = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-10)
        return jnp.concatenate([mag, ipd], axis=1)

    def forward(self, params, state, x):
        # x: [B, M, F, T, 2]
        noisy = x[:, 0]
        h = self.features(x)  # [B, C, F, T]
        b, c, f, t = h.shape

        new_states = []
        h = h.reshape(b, c * f, t)
        for i, (m, p, st) in enumerate(
                zip(self.layers, params["layers"], state["layers"])):
            if i % 2 == 0:
                hi = h.reshape(b * c, f, t)
            else:
                hi = h.reshape(b, c, f, t).transpose(0, 2, 1, 3).reshape(b * f, c, t)
            hi, st2 = m.apply(p, st, hi)
            new_states.append(st2)
            if i % 2 == 0:
                h = hi.reshape(b, c * f, t)
            else:
                h = hi.reshape(b, f, c, t).transpose(0, 2, 1, 3).reshape(b, c * f, t)

        mask, conv_state = self.last_conv.apply(
            params["last_conv"], state["last_conv"], h)
        mask = mask.reshape(b, 2, f, t).transpose(0, 2, 3, 1)  # [B, F, T, 2]

        mask = decompress_cirm(mask)
        er, ei = complex_mul(mask[..., 0], mask[..., 1],
                             noisy[..., 0], noisy[..., 1])
        pred = jnp.stack([er, ei], axis=-1)
        return pred, {"layers": new_states, "last_conv": conv_state}

    def forward_stacked(self, params, state, x):
        """All-chunks parallel forward: x ``[N, B, M, F, T, 2]``.

        Per-layer parallelization: every transformer layer computes its
        K/V/Q for all chunks at once and attends over sliding windows of
        the key timeline (see MultiheadAttention.apply_stacked) — layers
        are serial (6), chunks are not (N x layers in the scan path)."""
        n, bb, m, f, t, _ = x.shape
        noisy = x[:, :, 0]
        flat = x.reshape((n * bb,) + x.shape[2:])
        h = self.features(flat)  # [N*B, C, F, T]
        c = h.shape[1]
        h = h.reshape(n, bb, c * f, t)

        new_states = []
        for i, (mod, p, st) in enumerate(
                zip(self.layers, params["layers"], state["layers"])):
            if i % 2 == 0:
                hi = h.reshape(n, bb * c, f, t)
            else:
                hi = h.reshape(n, bb, c, f, t).transpose(0, 1, 3, 2, 4) \
                    .reshape(n, bb * f, c, t)
            hi, st2 = mod.apply_stacked(p, st, hi)
            new_states.append(st2)
            if i % 2 == 0:
                h = hi.reshape(n, bb, c * f, t)
            else:
                h = hi.reshape(n, bb, f, c, t).transpose(0, 1, 3, 2, 4) \
                    .reshape(n, bb, c * f, t)

        mask, conv_state = self.last_conv.apply_stacked(
            params["last_conv"], state["last_conv"], h)
        mask = mask.reshape(n, bb, 2, f, t).transpose(0, 1, 3, 4, 2)
        mask = decompress_cirm(mask)
        er, ei = complex_mul(mask[..., 0], mask[..., 1],
                             noisy[..., 0], noisy[..., 1])
        pred = jnp.stack([er, ei], axis=-1)
        return pred, {"layers": new_states, "last_conv": conv_state}

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
        from semi_tpu.models.base import StreamingModel

        return StreamingModel.realtime_process(self, params, state, mixture,
                                               flag)

    def realtime_process_batched(self, params, state, mixture, reset_mask):
        """Multi-stream runtime: B independent utterance streams with a
        traced per-stream ``reset_mask[B]`` (see
        TemporalCRN.realtime_process_batched for the contract; the
        warm-up lead-in is the data pipeline's job).

        GTSA's state batches on per-layer EFFECTIVE axes: even layers
        fold the C=2M-1 channel axis into batch (``[B*C]`` sequences,
        index b*C+c), odd layers the F axis (``[B*F]``), and attention
        KV caches are additionally head-major (``[H*B*C, maxlen, d]``,
        index h*B*C + b*C + c — layers/attention.py:51-60). The reset
        mask expands accordingly: repeat over the folded axis, tile
        over heads.
        """
        from semi_tpu.models.base import select_reset

        b = mixture.shape[0]
        fresh = self.init_state(b, mixture.dtype)
        new_layers = []
        for i, (mod, st, fr) in enumerate(
                zip(self.layers, state["layers"], fresh["layers"])):
            rep = self.feat_ch if i % 2 == 0 else self.num_freqs
            mask = jnp.tile(jnp.repeat(reset_mask, rep),
                            mod.attention.num_heads)
            new_layers.append(select_reset(st, fr, mask))
        state = {
            "layers": new_layers,
            "last_conv": select_reset(state["last_conv"],
                                      fresh["last_conv"], reset_mask),
        }
        x, gap = self.preprocessing(mixture)
        preds, state = self.forward_stacked(params, state, x)
        wav = self.postprocessing(preds, gap)
        return wav, state

    def compute_loss(self, source, pred, length):
        from semi_tpu.metrics.losses import pesq_loss, si_snr

        mae = pesq_loss(source, pred, length)
        sisnr = -si_snr(pred, source, length)
        loss = 0.7 * mae + 0.3 * sisnr
        bad = jnp.isnan(loss)
        zero = jnp.zeros_like(loss)
        return (jnp.where(bad, zero, loss), jnp.where(bad, zero, mae),
                jnp.where(bad, zero, sisnr))
