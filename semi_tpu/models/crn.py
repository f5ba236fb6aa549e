"""TemporalCRN — the flagship streaming CRN denoiser (ELU variant).

Architecture parity with the reference's best CNN/RNN model
(CRN_ELU.py:314-535): magnitude of M mics + (M-1) inter-channel phase
differences → 3 frequency-dilated 5x5 residual pre-convs → 4-level
gated causal conv encoder (freq stride 2, time dilations 1,2,4,8) →
2-layer GRU bottleneck over flattened (freq x channel) features →
mirrored gated-skip decoder → compressed cIRM → complex mask applied to
the reference mic's spectrum.

~1.55M params at the reference config (num_channels=[16,32,64,128],
num_freqs=201, hidden=512), matching the reference's "6.16 MB".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.conv import TemporalConv2d, TemporalConvTranspose2d
from semi_tpu.layers.rnn import SequenceModel
from semi_tpu.models.base import StreamingModel
from semi_tpu.ops.mask import complex_mul, decompress_cirm

__all__ = ["TemporalCRN", "TemporalCRNv1", "TemporalCRNDirectional",
           "TemporalCRNSpk", "TemporalCRNSpkDeep", "TemporalCRNSpkXAttn"]

EPS = 1e-8  # reference CRN.py:11


class TemporalCRN(StreamingModel):
    def __init__(self, num_channels, num_freqs, hidden, segment_length,
                 num_layers=1, num_inputs=3, kernel_size=3, dropout=0.0,
                 sample_rate=16000, win_length=25, hop_length=10, n_fft=400,
                 activation="ELU", remat=True, use_pallas_gru=False,
                 compute_dtype="float32", stft_dtype=None):
        super().__init__(segment_length, num_freqs, sample_rate, win_length,
                         hop_length, n_fft, remat=remat)
        # bf16 end-to-end inference (VERDICT r4 next #4): run the DFT
        # matmuls at this dtype too; None keeps the f32 STFT (training)
        self.stft_dtype = jnp.dtype(stft_dtype) if stft_dtype else None
        self.num_inputs = num_inputs
        # inference-only: fused full-sequence GRU kernel (no per-chunk
        # gradient truncation -> keep False for training)
        self.use_pallas_gru = use_pallas_gru
        # mixed precision: f32 master params/STFT/mask-apply/losses with
        # the conv/GRU/deconv network in ``compute_dtype`` (bf16 doubles
        # MXU throughput on v5e; matmuls still accumulate in f32)
        self.cdtype = jnp.dtype(compute_dtype)
        feat_ch = self.feature_channels(num_inputs)

        # 3 frequency-dilated residual pre-convs (CRN_ELU.py:335-340)
        self.preconvs = [
            TemporalConv2d(feat_ch, feat_ch, (5, 5), (1, 1), (fd, 1),
                           (2 * fd, 4), activation=activation)
            for fd in (1, 2, 4)
        ]

        # Encoder / decoder (CRN_ELU.py:342-358)
        self.convs, deconvs = [], []
        levels = len(num_channels)
        self.enc_freqs = []  # input freq dim per encoder level
        f = num_freqs
        for i in range(levels):
            dt = 2 ** i
            in_ch = feat_ch if i == 0 else num_channels[i - 1]
            out_ch = num_channels[i]
            self.convs.append(
                TemporalConv2d(in_ch, out_ch, (5, kernel_size), (2, 1), (1, dt),
                               (2, (kernel_size - 1) * dt), activation=activation)
            )
            self.enc_freqs.append(f)
            f = (f - 1) // 2 + 1
            dt_dec = 2 ** (levels - i - 1)
            dec_out = 2 if i == 0 else in_ch
            deconvs.insert(0, TemporalConvTranspose2d(
                out_ch, dec_out, (5, kernel_size), (2, 1), (1, dt_dec),
                (2, (kernel_size - 1) * dt_dec), activation=activation))
        self.deconvs = deconvs
        self.bottleneck_freqs = f  # 13 at reference config

        gru_dim = f * num_channels[-1]
        self.gru = SequenceModel(gru_dim, gru_dim, hidden, num_layers,
                                 sequence_model="GRU",
                                 output_activate_function=activation)

    def init(self, key):
        n = len(self.preconvs) + len(self.convs) + len(self.deconvs) + 1
        keys = jax.random.split(key, n)
        it = iter(keys)
        return {
            "preconvs": [m.init(next(it)) for m in self.preconvs],
            "convs": [m.init(next(it)) for m in self.convs],
            "gru": self.gru.init(next(it)),
            "deconvs": [m.init(next(it)) for m in self.deconvs],
        }

    def init_state(self, batch: int, dtype=None):
        dtype = self.cdtype if dtype is None else dtype
        return {
            "preconvs": [m.init_state(batch, num_freqs=self.num_freqs, dtype=dtype)
                         for m in self.preconvs],
            "convs": [m.init_state(batch, num_freqs=f, dtype=dtype)
                      for m, f in zip(self.convs, self.enc_freqs)],
            "gru": self.gru.init_state(batch, dtype),
        }

    def feature_channels(self, num_inputs: int) -> int:
        """Input-feature channel count; overridden by variants whose
        :meth:`features` emits a different map stack."""
        return 2 * num_inputs - 1  # M magnitudes + (M-1) phase diffs

    def features(self, x):
        """``[B, M, F, T, 2]`` -> ``[B, 2M-1, F, T]`` mag + IPD features."""
        angle = jnp.arctan2(x[..., 1], x[..., 0])
        ipd = angle[:, :1] - angle[:, 1:]
        mag = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-10)
        return jnp.concatenate([mag, ipd], axis=1)

    def _cast(self, tree):
        """Cast params/activations to the network compute dtype (no-op
        at f32). Gradients flow back through the cast, so master params
        and the optimizer stay f32."""
        if self.cdtype == jnp.float32:
            return tree
        return jax.tree.map(lambda p: p.astype(self.cdtype), tree)

    def bottleneck_pre(self, params, state, h):
        """Hook between the flattened encoder output and the GRU; ``h``
        is ``[B, C*F, T]`` (scan path) or ``[N, B, C*F, T]`` (stacked).
        Identity here; conditioned variants (TemporalCRNSpk) override."""
        return h

    def encoder_post(self, params, state, idx, h):
        """Hook after encoder conv stage ``idx``; ``h`` is
        ``[B, C, F, T]`` (scan) or ``[N, B, C, F, T]`` (stacked).
        Runs BEFORE the stage's residual is recorded, so the decoder
        skip path sees the modulated features too. Identity here;
        deep-conditioned variants (TemporalCRNSpkDeep) override."""
        return h

    def forward(self, params, state, x):
        # x: [B, M, F, T, 2]
        noisy = x[:, 0]  # [B, F, T, 2]
        params = self._cast(params)
        h = self._cast(self.features(x))

        new_pre = []
        for m, p, st in zip(self.preconvs, params["preconvs"], state["preconvs"]):
            y, st2 = m.apply(p, st, h)
            h = y + h
            new_pre.append(st2)

        residuals = [h]
        new_enc = []
        for i, (m, p, st) in enumerate(zip(self.convs, params["convs"],
                                           state["convs"])):
            h, st2 = m.apply(p, st, h)
            h = self.encoder_post(params, state, i, h)
            residuals.append(h)
            new_enc.append(st2)

        b, c, f, t = h.shape
        h = h.reshape(b, c * f, t)
        h = self.bottleneck_pre(params, state, h)
        h, gru_state = self.gru.apply(params["gru"], state["gru"], h)
        h = h.reshape(b, c, f, t)

        idx = -2
        for m, p in zip(self.deconvs[:-1], params["deconvs"][:-1]):
            h, _ = m.apply(p, {}, h, res=residuals[idx])
            idx -= 1
        h, _ = self.deconvs[-1].apply(params["deconvs"][-1], {}, h)
        mask = h.transpose(0, 2, 3, 1).astype(jnp.float32)  # [B, F, T, 2]

        mask = decompress_cirm(mask)
        er, ei = complex_mul(mask[..., 0], mask[..., 1], noisy[..., 0], noisy[..., 1])
        pred = jnp.stack([er, ei], axis=-1)
        return pred, {"preconvs": new_pre, "convs": new_enc, "gru": gru_state}

    # -- parallel (stacked-chunk) path -----------------------------------
    def forward_stacked(self, params, state, x):
        """All-chunks-at-once forward: x ``[N, B, M, F, T, 2]``.

        Numerically identical to scanning :meth:`forward` over chunks
        (verified in tests): convolutions use shifted-context ring
        buffers across the stacked chunk axis, the GRU input/output
        projections batch over all frames with only the recurrent core
        chunk-serial, and the decoder (stateless) batches entirely.
        ~95% of the wall time of the scan path was serial dispatch; this
        removes it (SURVEY.md §5.7 TPU translation).
        """
        n, b, m, f, t, _ = x.shape
        noisy = x[:, :, 0]  # [N, B, F, T, 2]
        params = self._cast(params)
        h = self._cast(self.features(x.reshape((n * b,) + x.shape[2:])))
        h = h.reshape((n, b) + h.shape[1:])  # [N, B, C, F, T]

        new_pre = []
        for mod, p, st in zip(self.preconvs, params["preconvs"],
                              state["preconvs"]):
            y, st2 = mod.apply_stacked(p, st, h)
            h = y + h
            new_pre.append(st2)

        residuals = [h]
        new_enc = []
        for i, (mod, p, st) in enumerate(zip(self.convs, params["convs"],
                                             state["convs"])):
            h, st2 = mod.apply_stacked(p, st, h)
            h = self.encoder_post(params, state, i, h)
            residuals.append(h)
            new_enc.append(st2)

        _, _, c, fb, tt = h.shape
        h = h.reshape(n, b, c * fb, tt)
        h = self.bottleneck_pre(params, state, h)
        h, gru_state = self.gru.apply_stacked(params["gru"], state["gru"], h,
                                              use_pallas=self.use_pallas_gru)
        h = h.reshape(n * b, c, fb, tt)

        idx = -2
        for mod, p in zip(self.deconvs[:-1], params["deconvs"][:-1]):
            res = residuals[idx]
            h, _ = mod.apply(p, {}, h, res=res.reshape((n * b,) + res.shape[2:]))
            idx -= 1
        h, _ = self.deconvs[-1].apply(params["deconvs"][-1], {}, h)
        mask = h.reshape(n, b, 2, f, t).transpose(0, 1, 3, 4, 2) \
            .astype(jnp.float32)

        mask = decompress_cirm(mask)
        er, ei = complex_mul(mask[..., 0], mask[..., 1],
                             noisy[..., 0], noisy[..., 1])
        pred = jnp.stack([er, ei], axis=-1)  # [N, B, F, T, 2]
        return pred, {"preconvs": new_pre, "convs": new_enc, "gru": gru_state}

    def realtime_process(self, params, state, mixture, flag: bool = False):
        """Parallel stacked-chunk runtime (overrides the base scan)."""
        b, m, _ = mixture.shape
        if not flag:
            pad = jnp.zeros((b, m, self.segment_length // 2), mixture.dtype)
            mixture = jnp.concatenate([pad, mixture], axis=-1)
            state = self.init_state(b)
        x, gap = self.preprocessing(mixture)
        preds, state = self.forward_stacked(params, state, x)
        wav = self.postprocessing(preds, gap)
        if not flag:
            wav = wav[..., self.segment_length // 2:]
        return wav, state

    def realtime_process_scan(self, params, state, mixture, flag: bool = False):
        """The chunk-scan runtime (kept for equivalence testing)."""
        return StreamingModel.realtime_process(self, params, state, mixture,
                                               flag)

    def realtime_process_batched(self, params, state, mixture, reset_mask):
        """Multi-stream runtime: B independent utterance streams.

        Unlike ``realtime_process`` (whose static ``flag`` resets ALL
        streams and pads/trims the warm-up window), this takes a traced
        per-stream ``reset_mask[B]``: masked streams restart from fresh
        state. The warm-up lead-in (segment_length//2 zeros before a new
        utterance, CRN_ELU.py:474-476) is the data pipeline's job here
        (semi_tpu/data/stream.py prepends it to each utterance before
        chopping fixed pieces), so one compiled program serves every
        step — no per-flag recompilation.
        """
        from semi_tpu.models.base import select_reset

        b = mixture.shape[0]
        state = select_reset(state, self.init_state(b), reset_mask)
        x, gap = self.preprocessing(mixture)
        preds, state = self.forward_stacked(params, state, x)
        wav = self.postprocessing(preds, gap)
        return wav, state

    # -- distillation support (reference: distillation_crn.py:337-477) ---
    def get_channel_num(self):
        """Channel widths of the 5 feature taps (distillation_crn.py:386-387)."""
        ch = [m.n_outputs for m in self.convs]
        return [ch[-1], ch[-1], ch[2], ch[1], ch[0]]

    def forward_with_features(self, params, state, x):
        """Forward that also returns the 5 pre-activation distillation taps:
        last encoder conv, GRU fc output, and the first 3 decoder deconvs."""
        noisy = x[:, 0]
        h = self.features(x)

        new_pre = []
        for m, p, st in zip(self.preconvs, params["preconvs"], state["preconvs"]):
            y, st2 = m.apply(p, st, h)
            h = y + h
            new_pre.append(st2)

        residuals = [h]
        new_enc = []
        feats = []
        ft = None
        for i, (m, p, st) in enumerate(zip(self.convs, params["convs"],
                                           state["convs"])):
            h, st2, ft = m.apply(p, st, h, return_feature=True)
            h = self.encoder_post(params, state, i, h)
            residuals.append(h)
            new_enc.append(st2)
        feats.append(ft)  # only the LAST encoder tap (distillation_crn.py:352-358)

        b, c, f, t = h.shape
        h = h.reshape(b, c * f, t)
        h = self.bottleneck_pre(params, state, h)
        h, gru_state, gru_ft = self.gru.apply(params["gru"], state["gru"], h,
                                              return_feature=True)
        h = h.reshape(b, c, f, t)
        # reference reshapes the [B, T, C*F] tap straight to [B, C, F, T]
        # without a transpose (distillation_crn.py:361-365) — kept verbatim
        feats.append(gru_ft.reshape(b, c, f, t))

        idx = -2
        for m, p in zip(self.deconvs[:-1], params["deconvs"][:-1]):
            h, _, ft = m.apply(p, {}, h, res=residuals[idx], return_feature=True)
            feats.append(ft)
            idx -= 1
        h, _ = self.deconvs[-1].apply(params["deconvs"][-1], {}, h)
        mask = h.transpose(0, 2, 3, 1)

        mask = decompress_cirm(mask)
        er, ei = complex_mul(mask[..., 0], mask[..., 1], noisy[..., 0], noisy[..., 1])
        pred = jnp.stack([er, ei], axis=-1)
        new_state = {"preconvs": new_pre, "convs": new_enc, "gru": gru_state}
        return pred, feats, new_state

    def forward_stacked_with_features(self, params, state, x):
        """Stacked-chunk forward that also returns the 5 distillation taps
        with the chunk axis folded into batch: list of ``[N*B, Ck, Fk, T]``
        (the layout the distillation loss consumes, distillation_crn.py:463).
        """
        n, b, m, f, t, _ = x.shape
        noisy = x[:, :, 0]
        # mixed precision mirrors forward_stacked: network in cdtype,
        # taps returned as f32 so the distillation loss runs f32
        params = self._cast(params)
        h = self._cast(self.features(x.reshape((n * b,) + x.shape[2:])))
        h = h.reshape((n, b) + h.shape[1:])

        new_pre = []
        for mod, p, st in zip(self.preconvs, params["preconvs"],
                              state["preconvs"]):
            y, st2 = mod.apply_stacked(p, st, h)
            h = y + h
            new_pre.append(st2)

        residuals = [h]
        new_enc = []
        feats = []
        ft = None
        for i, (mod, p, st) in enumerate(zip(self.convs, params["convs"],
                                             state["convs"])):
            h, st2, ft = mod.apply_stacked(p, st, h, return_feature=True)
            h = self.encoder_post(params, state, i, h)
            residuals.append(h)
            new_enc.append(st2)
        feats.append(ft)  # last encoder tap only (distillation_crn.py:352-358)

        _, _, c, fb, tt = h.shape
        h = h.reshape(n, b, c * fb, tt)
        h = self.bottleneck_pre(params, state, h)
        h, gru_state, gru_ft = self.gru.apply_stacked(
            params["gru"], state["gru"], h, return_feature=True)
        h = h.reshape(n * b, c, fb, tt)
        # reference reshapes the [B, T, C*F] tap straight to [B, C, F, T]
        # (distillation_crn.py:361-365) — kept verbatim per chunk
        feats.append(gru_ft.reshape(n * b, c, fb, tt))

        idx = -2
        for mod, p in zip(self.deconvs[:-1], params["deconvs"][:-1]):
            res = residuals[idx]
            h, _, ft = mod.apply(p, {}, h,
                                 res=res.reshape((n * b,) + res.shape[2:]),
                                 return_feature=True)
            feats.append(ft)
            idx -= 1
        h, _ = self.deconvs[-1].apply(params["deconvs"][-1], {}, h)
        mask = h.reshape(n, b, 2, f, t).transpose(0, 1, 3, 4, 2) \
            .astype(jnp.float32)

        mask = decompress_cirm(mask)
        er, ei = complex_mul(mask[..., 0], mask[..., 1],
                             noisy[..., 0], noisy[..., 1])
        pred = jnp.stack([er, ei], axis=-1)
        new_state = {"preconvs": new_pre, "convs": new_enc, "gru": gru_state}
        feats = [f_.astype(jnp.float32) for f_ in feats]
        return pred, feats, new_state

    def realtime_process_with_features(self, params, state, mixture,
                                       flag: bool = False):
        """Like realtime_process but also returns per-tap features with the
        chunk axis folded into batch: list of [N*B, Ck, Fk, T]. Uses the
        stacked-chunk path (also sidesteps an XLA TPU backward-of-scan
        shape bug the chunk-serial variant triggers)."""
        b, m, _ = mixture.shape
        if not flag:
            pad = jnp.zeros((b, m, self.segment_length // 2), mixture.dtype)
            mixture = jnp.concatenate([pad, mixture], axis=-1)
            state = self.init_state(b)  # compute-dtype ring buffers

        x, gap = self.preprocessing(mixture)
        preds, feats, state = self.forward_stacked_with_features(
            params, state, x)
        wav = self.postprocessing(preds, gap)
        if not flag:
            wav = wav[..., self.segment_length // 2:]
        return wav, feats, state


class TemporalCRNv1(TemporalCRN):
    """CRN v1 — the pre-ELU TemporalCRN (reference CRN.py:404-617).

    Differences from the ELU flagship, kept verbatim:
    - no frequency-dilated pre-convs (CRN.py has no preconv stack);
    - plain ungated conv encoder blocks with ReLU (CRN.py:290-342 —
      conv -> ReLU -> GlobalLayerNorm, no 1x1 trans/gate pair);
    - arctan (not atan2) phase features (CRN.py:464);
    - ReLU activations throughout (GRU output, decoder blocks).

    Published reference numbers: SISDR 20.29 / STOI 0.9225 /
    PESQ 2.6518 (reference README.md:45); superseded by the ELU
    variant (README.md:52) but a distinct member of the model family.
    All TemporalCRN runtimes (scan / stacked / multi-stream batched)
    are inherited — only the layer composition differs.
    """

    def __init__(self, num_channels, num_freqs, hidden, segment_length,
                 num_layers=1, num_inputs=3, kernel_size=3, dropout=0.0,
                 sample_rate=16000, win_length=25, hop_length=10, n_fft=400,
                 remat=True, use_pallas_gru=False):
        super().__init__(num_channels, num_freqs, hidden, segment_length,
                         num_layers, num_inputs, kernel_size, dropout,
                         sample_rate, win_length, hop_length, n_fft,
                         activation="ReLU", remat=remat,
                         use_pallas_gru=use_pallas_gru)
        self.preconvs = []
        # rebuild the encoder ungated (the decoder, GRU, and geometry
        # from the parent are already the v1 shapes at activation=ReLU)
        feat_ch = 2 * num_inputs - 1
        self.convs = []
        self.enc_freqs = []
        f = num_freqs
        for i in range(len(num_channels)):
            dt = 2 ** i
            in_ch = feat_ch if i == 0 else num_channels[i - 1]
            self.convs.append(TemporalConv2d(
                in_ch, num_channels[i], (5, kernel_size), (2, 1), (1, dt),
                (2, (kernel_size - 1) * dt), activation="ReLU", gated=False))
            self.enc_freqs.append(f)
            f = (f - 1) // 2 + 1

    def features(self, x):
        # arctan phase, kept verbatim from CRN.py:462-465 (the ELU
        # variant moved to atan2; v1 predates it)
        angle = jnp.arctan(x[..., 1] / (x[..., 0] + EPS) + EPS)
        ipd = angle[:, :1] - angle[:, 1:]
        mag = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + 1e-10)
        return jnp.concatenate([mag, ipd], axis=1)


class TemporalCRNDirectional(TemporalCRN):
    """Flagship CRN with explicit directional input features.

    BEYOND-REFERENCE variant (not in /root/reference), motivated by a
    measured failure mode: on same-synthesizer talker babble every
    reference architecture scores ~+1 dB dSI-SDR while the oracle cIRM
    gets +39.7 dB — the T-F information exists but "which voice is the
    target" is ambiguous (docs/BENCHMARKS.md "Failure-mode analysis").
    The corpus spatializes the masker through its own room impulse
    response at a position distinct from the target, so direction is
    the one causal, streaming-compatible cue that separates two voices
    from the same synthesizer.

    The reference's features (CRN_ELU.py:369-373) hand the encoder raw
    wrapped phase differences: ``angle0 - angle_i`` of atan2 angles,
    which jump by 2*pi across the wrap and are not linearly usable by
    the first conv. This variant replaces the raw IPD channels with

    - ``cos(IPD)`` and ``sin(IPD)`` per mic pair — continuous across
      the wrap, constant for a fixed direction-of-arrival per
      frequency, the standard multichannel-enhancement encoding;
    - inter-mic log-level differences (ILD) per pair — the second
      spatial cue, free given the magnitudes.

    Feature stack: M magnitudes + 2(M-1) cos/sin IPD + (M-1) ILD =
    ``4M-3`` channels (9 at M=3 vs the reference's 5). Everything
    downstream — architecture, runtimes (scan / stacked / batched
    multi-stream), distillation taps, losses — is inherited unchanged,
    so the experiment isolates the input representation.
    """

    def feature_channels(self, num_inputs: int) -> int:
        return 4 * num_inputs - 3

    def features(self, x):
        """``[B, M, F, T, 2]`` -> ``[B, 4M-3, F, T]`` directional maps."""
        re, im = x[..., 0], x[..., 1]
        mag = jnp.sqrt(re ** 2 + im ** 2 + 1e-10)
        # cos/sin of the phase difference via the complex product
        # x0 * conj(xi), normalized — avoids computing angles at all
        # (no arctan2, no wrap): x0*conj(xi) = |x0||xi| e^{j(a0-ai)}.
        cr = re[:, :1] * re[:, 1:] + im[:, :1] * im[:, 1:]
        ci = im[:, :1] * re[:, 1:] - re[:, :1] * im[:, 1:]
        denom = mag[:, :1] * mag[:, 1:]
        cos_ipd = cr / denom
        sin_ipd = ci / denom
        ild = jnp.log(mag[:, 1:]) - jnp.log(mag[:, :1])
        return jnp.concatenate([mag, cos_ipd, sin_ipd, ild], axis=1)


class TemporalCRNSpk(TemporalCRN):
    """Flagship CRN conditioned on the target speaker's voice statistics.

    BEYOND-REFERENCE variant (not in /root/reference), built from two
    measured ceilings (docs/BENCHMARKS.md): on same-synthesizer talker
    babble every reference architecture scores ~+1 dB dSI-SDR while the
    oracle cIRM gets +39.7 dB ("Failure-mode analysis"), and masks
    computed from spatial cues alone top out at +0.24 dB — direction
    cannot identify the target at this corpus geometry
    ("Directional-oracle ceiling"). What remains is target IDENTITY:
    this variant conditions the enhancer on an enrollment sample of the
    target voice.

    Mechanics:
    - the enrollment waveform rides as ONE EXTRA input channel
      (``mixture[B, M+1, L]``, channel M = enrollment, first
      ``enroll_len`` samples) so the ``realtime_process`` contract,
      every runtime, and the fused trainer stay untouched — the model
      strips it before chunking;
    - the enrollment encoder is strictly TIME-POOLED: log-magnitude
      spectrum -> mean+std over frames -> 2-layer MLP -> L2-normalized
      embedding. Pooling makes content alignment unusable by
      construction (the embedding is invariant to frame order), so
      self-enrollment — the corpus has one utterance per synthetic
      voice, so enrollment is drawn from the target utterance itself —
      can only transfer time-invariant voice statistics, exactly what a
      separate-utterance enrollment would carry;
    - conditioning is FiLM at the bottleneck (scale/shift of the
      flattened encoder features feeding the GRU), zero-initialized so
      training starts exactly at the unconditioned flagship.

    Trained/evaluated through the fused utterance engine and predict.py
    (both append the enrollment channel when the model sets
    ``wants_enroll``); the piece-mode/batched-stream engines do not
    carry enrollment and are not supported for this family.
    """

    wants_enroll = True
    # state keys the enrollment attaches and every forward must carry
    # through its scan/stacked step (variants extend: SpkXAttn adds the
    # per-frame key/value tables)
    enroll_state_keys = ("spk",)

    def __init__(self, *args, spk_dim=128, enroll_len=32000, **kwargs):
        super().__init__(*args, **kwargs)
        self.spk_dim = spk_dim
        self.enroll_len = enroll_len
        self._gru_in = self.bottleneck_freqs * self.convs[-1].n_outputs

    def init(self, key):
        base = super().init(key)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 0x5b))
        feat = 2 * self.num_freqs  # mean+std of the log-mag spectrum
        hid = 256
        base["spk"] = {
            "w1": jax.random.normal(k1, (feat, hid)) * (2.0 / feat) ** 0.5,
            "b1": jnp.zeros((hid,)),
            "w2": jax.random.normal(k2, (hid, self.spk_dim)) * (2.0 / hid) ** 0.5,
            "b2": jnp.zeros((self.spk_dim,)),
            # zero-init FiLM: gamma=1, beta=0 -> exactly the flagship
            "film_g": jnp.zeros((self.spk_dim, self._gru_in)),
            "film_b": jnp.zeros((self.spk_dim, self._gru_in)),
        }
        return base

    def init_state(self, batch: int, dtype=None):
        st = super().init_state(batch, dtype)
        st["spk"] = jnp.zeros((batch, self.spk_dim), jnp.float32)
        return st

    def encode_enroll(self, params, wav):
        """``[B, enroll_len]`` waveform -> L2-normalized ``[B, spk_dim]``.

        f32 throughout (like the STFT/mask paths); level-invariant via
        RMS normalization; strictly time-pooled (see class docstring).
        """
        from semi_tpu.ops.stft import stft_matmul

        p = params["spk"]
        wav = wav.astype(jnp.float32)
        rms = jnp.sqrt(jnp.mean(wav ** 2, axis=-1, keepdims=True) + 1e-8)
        spec = stft_matmul(wav / rms, n_fft=self.stft_cfg.n_fft,
                           hop=self.stft_cfg.hop)        # [B, T, F, 2]
        logmag = jnp.log1p(jnp.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2
                                    + 1e-10))            # [B, T, F]
        feat = jnp.concatenate([logmag.mean(axis=1), logmag.std(axis=1)],
                               axis=-1)                  # [B, 2F]
        h = jax.nn.elu(feat @ p["w1"].astype(jnp.float32) + p["b1"])
        e = h @ p["w2"].astype(jnp.float32) + p["b2"]
        return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)

    def enroll_state(self, params, e_wav):
        """Enrollment waveform -> the state entries conditioning reads
        (``enroll_state_keys``). One pooled embedding here; variants
        with richer conditioning (cross-attention) extend the dict."""
        return {"spk": self.encode_enroll(params, e_wav)}

    def _carry_enroll(self, state, st):
        """Copy the enrollment entries (computed once at stream reset)
        from the incoming state into the step's output state, so every
        runtime's scan carries them unchanged."""
        for k in self.enroll_state_keys:
            st[k] = state[k]
        return st

    def bottleneck_pre(self, params, state, h):
        # h: [B, D, T] (scan) or [N, B, D, T] (stacked); params are
        # already cast to cdtype by forward's _cast — compute FiLM in
        # f32 from the f32 embedding, apply in h's dtype
        p = params["spk"]
        e = state["spk"]
        gamma = 1.0 + e @ p["film_g"].astype(jnp.float32)   # [B, D]
        beta = e @ p["film_b"].astype(jnp.float32)
        if h.ndim == 4:
            gamma, beta = gamma[None, :, :, None], beta[None, :, :, None]
        else:
            gamma, beta = gamma[:, :, None], beta[:, :, None]
        return h * gamma.astype(h.dtype) + beta.astype(h.dtype)

    def _split(self, mixture):
        assert mixture.shape[1] == self.num_inputs + 1, (
            f"TemporalCRNSpk expects {self.num_inputs} mics + 1 enrollment "
            f"channel, got {mixture.shape[1]} channels — this family runs "
            "through the fused utterance engine / predict.py, which append "
            "the enrollment channel (wants_enroll)")
        return (mixture[:, :self.num_inputs],
                mixture[:, self.num_inputs, :self.enroll_len])

    # state carries the enrollment entries through every runtime's scan
    def forward(self, params, state, x):
        pred, st = super().forward(params, state, x)
        return pred, self._carry_enroll(state, st)

    def forward_stacked(self, params, state, x):
        pred, st = super().forward_stacked(params, state, x)
        return pred, self._carry_enroll(state, st)

    def forward_with_features(self, params, state, x):
        pred, feats, st = super().forward_with_features(params, state, x)
        return pred, feats, self._carry_enroll(state, st)

    def forward_stacked_with_features(self, params, state, x):
        pred, feats, st = super().forward_stacked_with_features(
            params, state, x)
        return pred, feats, self._carry_enroll(state, st)

    def realtime_process(self, params, state, mixture, flag: bool = False):
        mics, e_wav = self._split(mixture)
        b = mics.shape[0]
        if not flag:
            state = self.init_state(b)
            state.update(self.enroll_state(params, e_wav))
            pad = jnp.zeros((b, self.num_inputs, self.segment_length // 2),
                            mics.dtype)
            mics = jnp.concatenate([pad, mics], axis=-1)
        x, gap = self.preprocessing(mics)
        preds, state = self.forward_stacked(params, state, x)
        wav = self.postprocessing(preds, gap)
        if not flag:
            wav = wav[..., self.segment_length // 2:]
        return wav, state

    def realtime_process_scan(self, params, state, mixture,
                              flag: bool = False):
        """Chunk-serial runtime (equivalence testing vs the stacked path)."""
        mics, e_wav = self._split(mixture)
        b = mics.shape[0]
        if not flag:
            state = self.init_state(b, self.cdtype)
            state.update(self.enroll_state(params, e_wav))
            pad = jnp.zeros((b, self.num_inputs, self.segment_length // 2),
                            mics.dtype)
            mics = jnp.concatenate([pad, mics], axis=-1)
        x, gap = self.preprocessing(mics)

        def step(st, xc):
            pred, st2 = self.forward(params, st, xc)
            return st2, pred

        if self.remat:
            step = jax.checkpoint(step)
        state, preds = jax.lax.scan(step, state, x)
        wav = self.postprocessing(preds, gap)
        if not flag:
            wav = wav[..., self.segment_length // 2:]
        return wav, state

    def realtime_process_batched(self, params, state, mixture, reset_mask):
        from semi_tpu.models.base import select_reset

        mics, e_wav = self._split(mixture)
        b = mics.shape[0]
        state = select_reset(state, self.init_state(b), reset_mask)
        fresh = self.enroll_state(params, e_wav)
        # streams that reset adopt the fresh enrollment; continuing
        # streams keep the entries already in their state
        for k, v in fresh.items():
            m_ = reset_mask.reshape((-1,) + (1,) * (v.ndim - 1))
            state[k] = jnp.where(m_, v, state[k])
        x, gap = self.preprocessing(mics)
        preds, state = self.forward_stacked(params, state, x)
        wav = self.postprocessing(preds, gap)
        return wav, state


class TemporalCRNSpkDeep(TemporalCRNSpk):
    """Deep-FiLM speaker conditioning: modulate EVERY encoder stage.

    Round-4 measured motivation (docs/BENCHMARKS.md "Enrollment-quality
    bound"): with separate-utterance enrollment the babble row reaches
    +1.14 dB and SELF-enrollment does no better (+0.95) — the
    enrollment ENCODER already extracts the full identity signal, so
    the binding constraint is how much of the network the identity can
    steer. TemporalCRNSpk injects one zero-init FiLM at the bottleneck;
    this variant ADDS per-channel zero-init FiLM after every encoder
    conv stage (before the residual is recorded, so the decoder's
    gated-skip path is modulated too — see TemporalCRN.encoder_post).
    Zero-init keeps warm-start identity with the unconditioned
    flagship, exactly like the bottleneck table.
    """

    def init(self, key):
        base = super().init(key)
        base["spk"]["film_enc"] = [
            {"g": jnp.zeros((self.spk_dim, m.n_outputs)),
             "b": jnp.zeros((self.spk_dim, m.n_outputs))}
            for m in self.convs
        ]
        return base

    def encoder_post(self, params, state, idx, h):
        p = params["spk"]["film_enc"][idx]
        e = state["spk"]                                  # [B, spk_dim] f32
        gamma = 1.0 + e @ p["g"].astype(jnp.float32)      # [B, C]
        beta = e @ p["b"].astype(jnp.float32)
        if h.ndim == 5:  # stacked [N, B, C, F, T]
            gamma = gamma[None, :, :, None, None]
            beta = beta[None, :, :, None, None]
        else:            # scan [B, C, F, T]
            gamma = gamma[:, :, None, None]
            beta = beta[:, :, None, None]
        return h * gamma.astype(h.dtype) + beta.astype(h.dtype)


class TemporalCRNSpkXAttn(TemporalCRNSpkDeep):
    """Deep FiLM + bottleneck cross-attention to ENROLLMENT FRAMES.

    Round-5 measured motivation (docs/BENCHMARKS.md "Deep-FiLM
    conditioning"): deep FiLM moved stress babble +1.08 -> +1.79 dB at
    N=300, far short of the +39.7 dB cIRM oracle — and both FiLM forms
    funnel the enrollment through ONE time-pooled 128-d vector. This
    variant keeps the pooled path (FiLM everywhere, inherited) and ADDS
    a per-frame route: the enrollment's frame-level spectra become a
    static key/value memory, and every bottleneck frame of the mixture
    cross-attends to it. The model can now match mixture frames against
    actual spectral exemplars of the target voice (pitch harmonics,
    formant shapes) instead of a single summary statistic.

    TPU shape: the memory is computed ONCE at stream reset (enrollment
    is static context, so no causality interaction with streaming),
    carried in the state like the pooled embedding, and the attention
    is one [T, D]x[D, d] + [T, d]x[d, T_e] matmul pair per chunk —
    MXU-friendly, static shapes, no KV growth over time (unlike the
    GTSA self-attention KV-cache this is O(1) in stream length).

    Zero-init output projection => warm-start identity with the trained
    TemporalCRNSpkDeep checkpoint (tools/warmstart_spk.py verifies).
    """

    enroll_state_keys = ("spk", "spk_k", "spk_v")

    def __init__(self, *args, attn_dim=128, **kwargs):
        super().__init__(*args, **kwargs)
        self.attn_dim = attn_dim
        # static frame count of the enrollment memory (ops/stft._frame
        # center-pads: T = L // hop + 1)
        self.enroll_frames = self.enroll_len // self.stft_cfg.hop + 1

    def init(self, key):
        base = super().init(key)
        k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, 0xa7), 4)
        feat, hid, d = self.num_freqs, 256, self.attn_dim
        base["spk"].update({
            # per-frame enrollment encoder -> key/value tables
            "xf_w": jax.random.normal(k1, (feat, hid)) * (2.0 / feat) ** 0.5,
            "xf_b": jnp.zeros((hid,)),
            "xk_w": jax.random.normal(k2, (hid, d)) * (1.0 / hid) ** 0.5,
            "xv_w": jax.random.normal(k3, (hid, d)) * (1.0 / hid) ** 0.5,
            # mixture-side query over the flattened bottleneck features
            "xq_w": jax.random.normal(k4, (self._gru_in, d))
                    * (1.0 / self._gru_in) ** 0.5,
            "xq_b": jnp.zeros((d,)),
            # zero-init output projection: step 0 == the spk_deep source
            "xo_w": jnp.zeros((d, self._gru_in)),
        })
        return base

    def init_state(self, batch: int, dtype=None):
        st = super().init_state(batch, dtype)
        st["spk_k"] = jnp.zeros((batch, self.enroll_frames, self.attn_dim),
                                jnp.float32)
        st["spk_v"] = jnp.zeros((batch, self.enroll_frames, self.attn_dim),
                                jnp.float32)
        return st

    def enroll_state(self, params, wav):
        """Pooled embedding (FiLM) + per-frame key/value memory."""
        from semi_tpu.ops.stft import stft_matmul

        out = super().enroll_state(params, wav)
        p = params["spk"]
        wav = wav.astype(jnp.float32)
        rms = jnp.sqrt(jnp.mean(wav ** 2, axis=-1, keepdims=True) + 1e-8)
        spec = stft_matmul(wav / rms, n_fft=self.stft_cfg.n_fft,
                           hop=self.stft_cfg.hop)        # [B, T_e, F, 2]
        logmag = jnp.log1p(jnp.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2
                                    + 1e-10))            # [B, T_e, F]
        h = jax.nn.elu(logmag @ p["xf_w"].astype(jnp.float32) + p["xf_b"])
        out["spk_k"] = h @ p["xk_w"].astype(jnp.float32)  # [B, T_e, d]
        out["spk_v"] = h @ p["xv_w"].astype(jnp.float32)
        return out

    def bottleneck_pre(self, params, state, h):
        h = super().bottleneck_pre(params, state, h)      # deep FiLM path
        p = params["spk"]
        k, v = state["spk_k"], state["spk_v"]             # [B, T_e, d] f32
        stacked = h.ndim == 4
        if stacked:                                       # [N, B, D, T]
            n, b, dch, t = h.shape
            q_in = h.transpose(1, 0, 3, 2).reshape(b, n * t, dch)
        else:                                             # [B, D, T]
            b, dch, t = h.shape
            q_in = h.transpose(0, 2, 1)
        q = q_in.astype(jnp.float32) @ p["xq_w"].astype(jnp.float32) \
            + p["xq_b"].astype(jnp.float32)               # [B, T*, d]
        scores = q @ k.transpose(0, 2, 1) / (self.attn_dim ** 0.5)
        att = jax.nn.softmax(scores, axis=-1) @ v         # [B, T*, d]
        out = att @ p["xo_w"].astype(jnp.float32)         # [B, T*, D]
        if stacked:
            out = out.reshape(b, n, t, dch).transpose(1, 0, 3, 2)
        else:
            out = out.transpose(0, 2, 1)
        return h + out.astype(h.dtype)
