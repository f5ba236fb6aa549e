"""FullSubNet — full-band + sub-band fusion model (streaming realtime mod).

Parity with the reference (fullsubnet.py:685-987): magnitude spectra of
M mics → capped running mean norm → full-band LSTM (M*F → F) → the
full-band output and the mic-0 noisy magnitude are unfolded into F
per-frequency sub-band units of (2*sb_n+1) + (2*fb_n+1) features → a
shared sub-band LSTM applied with the F sub-bands folded into the batch
dim (B*F rows — a natural TPU batch) → 2-channel compressed cIRM →
complex mask on the mic-0 spectrum.

Two execution modes, as in the reference:
- ``train=True``: all chunks concatenated along time, ONE forward
  (fullsubnet.py:921-927) — a single long ``lax.scan`` over N*21 frames.
- ``train=False``: chunk-serial with carried (fh, sh, norm) state
  (fullsubnet.py:928-945) — ``lax.scan`` over chunks.

``realtime_process`` keeps the reference's deviant signature: with
``source`` given it returns the 4-tuple (pred, cIRM, source_spec,
noisy_spec) used by the 6-arg ``compute_loss`` (fullsubnet.py:903-987).

The norm zoo (fullsubnet.py:374-614) is provided as free functions for
inventory parity; the active path uses CumLayerNorm, matching the
reference (norm_type is accepted and unused there too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_tpu.layers.module import Module, detach, linear_init
from semi_tpu.layers.norms import CumLayerNorm
from semi_tpu.layers.rnn import GRU, LSTM
from semi_tpu.models.base import StreamingModel
from semi_tpu.ops.mask import complex_mul, decompress_cirm
from semi_tpu.ops.segment import segmentation
from semi_tpu.ops.stft import stft_matmul as stft

EPS = 1e-8

__all__ = [
    "FullSubNet",
    "unfold_subband",
    "offline_laplace_norm",
    "cumulative_laplace_norm",
    "offline_gaussian_norm",
    "cumulative_layer_norm",
    "forgetting_norm",
    "hybrid_norm",
    "norm_wrapper",
]


# ---------------------------------------------------------------------
# Norm zoo (fullsubnet.py:374-614)
# ---------------------------------------------------------------------

def offline_laplace_norm(x):
    """x / utterance mean over (C, F, T) (fullsubnet.py:494-509)."""
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    return x / (mu + 1e-5)


def cumulative_laplace_norm(x):
    """x / frame-cumulative mean (fullsubnet.py:511-542). x: [B, C, F, T]."""
    b, c, f, t = x.shape
    flat = x.reshape(b * c, f, t)
    csum = jnp.cumsum(jnp.sum(flat, axis=1), axis=-1)  # [BC, T]
    counts = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    mean = (csum / counts)[:, None, :]
    return (flat / (mean + EPS)).reshape(b, c, f, t)


def offline_gaussian_norm(x):
    mu = jnp.mean(x, axis=(2, 3), keepdims=True)
    std = jnp.std(x, axis=(2, 3), keepdims=True, ddof=1)
    return (x - mu) / (std + 1e-5)


def cumulative_layer_norm(x):
    """Online zero-norm via cumulative mean/var (fullsubnet.py:561-600)."""
    b, c, f, t = x.shape
    flat = x.reshape(b * c, f, t)
    s = jnp.sum(flat, axis=1)
    s2 = jnp.sum(jnp.square(flat), axis=1)
    cs = jnp.cumsum(s, axis=-1)
    cs2 = jnp.cumsum(s2, axis=-1)
    counts = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    mean = cs / counts
    var = (cs2 - 2 * mean * cs) / counts + jnp.square(mean)
    std = jnp.sqrt(var + EPS)
    out = (flat - mean[:, None, :]) / std[:, None, :]
    return out.reshape(b, c, f, t)


def forgetting_norm(x, sample_length: int = 192):
    """Frame-serial EMA mean norm as a scan (fullsubnet.py:411-446). x: [B, F, T]."""
    b, f, t = x.shape
    alpha = (sample_length - 1) / (sample_length + 1)
    frame_mean = jnp.mean(x, axis=1).T  # [T, B]
    idx = jnp.arange(t, dtype=x.dtype)
    alp_t = jnp.minimum((idx - 1) / (idx + 1), alpha)
    alp_t = jnp.where(idx < sample_length, alp_t, alpha)

    def step(mu, inp):
        alp, fm = inp
        mu = alp * mu + (1 - alp) * fm
        return mu, mu

    _, mus = jax.lax.scan(step, jnp.zeros((b,), x.dtype), (alp_t, frame_mean))
    return x / (mus.T[:, None, :] + 1e-10)


def hybrid_norm(x, sample_length: int = 192):
    """Forgetting-norm warmup, cumulative mean afterwards (fullsubnet.py:448-492)."""
    b, f, t = x.shape
    warm = forgetting_norm(x, sample_length)
    csum = jnp.cumsum(jnp.sum(x, axis=1), axis=-1)
    counts = jnp.arange(f, f * t + 1, f, dtype=x.dtype)[None, :]
    cum = x / ((csum / counts)[:, None, :] + 1e-10)
    sel = (jnp.arange(t) < sample_length)[None, None, :]
    return jnp.where(sel, warm, cum)


def norm_wrapper(norm_type: str):
    return {
        "offline_laplace_norm": offline_laplace_norm,
        "cumulative_laplace_norm": cumulative_laplace_norm,
        "offline_gaussian_norm": offline_gaussian_norm,
        "cumulative_layer_norm": cumulative_layer_norm,
    }[norm_type]


def apply_weight_init(params, key):
    """Per-type re-init (fullsubnet.py:616-681, off by default): LSTM/GRU
    input weights xavier-uniform, recurrent weights orthogonal, Linear
    xavier-uniform, biases zero."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for i, (path, leaf) in enumerate(flat):
        name = jax.tree_util.keystr(path)
        k = jax.random.fold_in(key, i)
        if leaf.ndim == 2 and "w_hh" in name:
            # orthogonal init
            a = jax.random.normal(k, (max(leaf.shape), max(leaf.shape)))
            q, _ = jnp.linalg.qr(a)
            out.append(q[: leaf.shape[0], : leaf.shape[1]].astype(leaf.dtype))
        elif leaf.ndim == 2:
            fan_in, fan_out = leaf.shape[1], leaf.shape[0]
            bound = jnp.sqrt(6.0 / (fan_in + fan_out))
            out.append(jax.random.uniform(k, leaf.shape, leaf.dtype,
                                          -bound, bound))
        elif leaf.ndim == 1:
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def unfold_subband(x: jax.Array, num_neighbor: int) -> jax.Array:
    """Split overlapped sub-band units along freq (fullsubnet.py:299-331).

    x: [B, C, F, T] -> [B, F, C, 2n+1, T] with reflect padding.
    """
    b, c, f, t = x.shape
    if num_neighbor < 1:
        return x.transpose(0, 2, 1, 3).reshape(b, f, c, 1, t)
    pad = num_neighbor
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    idx = jnp.arange(f)[:, None] + jnp.arange(2 * pad + 1)[None, :]  # [F, W]
    out = xp[:, :, idx, :]  # [B, C, F, W, T]
    return out.transpose(0, 2, 1, 3, 4)


class _FSSequence(Module):
    """RNN + Linear + optional activation, explicit h0 (fullsubnet.py:209-294)."""

    def __init__(self, input_size, output_size, hidden_size, num_layers,
                 sequence_model="LSTM", output_activate_function="ReLU"):
        cls = {"GRU": GRU, "LSTM": LSTM}[sequence_model]
        self.rnn = cls(input_size, hidden_size, num_layers)
        self.hidden_size = hidden_size
        self.output_size = output_size
        self.act = {
            "Tanh": jnp.tanh, "ReLU": jax.nn.relu,
            "ReLU6": lambda v: jnp.clip(v, 0.0, 6.0),
            "Sigmoid": jax.nn.sigmoid, False: None, None: None,
        }[output_activate_function]

    def init(self, key):
        k1, k2 = jax.random.split(key)
        w, b = linear_init(k2, self.hidden_size, self.output_size)
        return {"rnn": self.rnn.init(k1), "fc": {"w": w, "b": b}}

    def init_state(self, batch, dtype=jnp.float32):
        return self.rnn.init_state(batch, dtype)

    def apply(self, params, state, x):
        # x: [B, F, T] -> [B, F_out, T]
        y = x.transpose(0, 2, 1)
        y, new_state = self.rnn.apply(params["rnn"], state, y)
        y = y @ params["fc"]["w"].T + params["fc"]["b"]
        if self.act is not None:
            y = self.act(y)
        return y.transpose(0, 2, 1), new_state

    def apply_stacked(self, params, state, x, use_pallas: bool = False):
        """x: ``[N, B, F, T]`` stacked chunks (recurrent core chunk-serial,
        projections batched). ``use_pallas=True`` fuses the recurrent
        sequence into one TPU kernel (inference only, 2-layer;
        ops/pallas/rnn_seq.py). ``"auto"`` resolves by backend + the
        measured win region (rnn_seq.pallas_profitable): the full-band
        LSTM (rows=B) wins 1.4x, the 804-row sub-band batch measures
        0.91x and stays on the scan."""
        n, b, f, t = x.shape
        if use_pallas == "auto":
            from semi_tpu.ops.pallas.rnn_seq import pallas_profitable

            use_pallas = pallas_profitable(b, self.rnn.num_layers)
        y = x.transpose(0, 1, 3, 2)  # [N, B, T, F]
        if use_pallas and self.rnn.num_layers == 2:
            from semi_tpu.layers.rnn import GRU
            from semi_tpu.ops.pallas.rnn_seq import gru2_seq, lstm2_seq

            p0, p1 = params["rnn"]
            gi1 = jnp.einsum("nbtf,gf->nbtg", y, p0["w_ih"]) + p0["b_ih"]
            gi1 = gi1.transpose(0, 2, 1, 3).reshape(n * t, b, -1)
            if isinstance(self.rnn, GRU):
                ys, h_last = gru2_seq(
                    gi1, p0["w_hh"].T, p0["b_hh"], p1["w_ih"].T,
                    p1["b_ih"], p1["w_hh"].T, p1["b_hh"], state["h"])
                new_state = {"h": h_last}
            else:
                ys, h_last, c_last = lstm2_seq(
                    gi1, p0["w_hh"].T, p0["b_hh"], p1["w_ih"].T,
                    p1["b_ih"], p1["w_hh"].T, p1["b_hh"],
                    state["h"], state["c"])
                new_state = {"h": h_last, "c": c_last}
            y = ys.reshape(n, t, b, -1).transpose(0, 2, 1, 3)
        else:
            y, new_state = self.rnn.apply_stacked(params["rnn"], state, y)
        y = y @ params["fc"]["w"].T + params["fc"]["b"]
        if self.act is not None:
            y = self.act(y)
        return y.transpose(0, 1, 3, 2), new_state


class FullSubNet(StreamingModel):
    def __init__(self, num_freqs, look_ahead, sequence_model,
                 fb_num_neighbors, sb_num_neighbors,
                 fb_output_activate_function, sb_output_activate_function,
                 fb_model_hidden_size, sb_model_hidden_size, num_mics,
                 norm_type="offline_laplace_norm", num_groups_in_drop_band=2,
                 num_layers=2, weight_init=False, sample_rate=16000,
                 segment_length=3200, win_length=25, hop_length=10, n_fft=400,
                 remat=True, use_pallas_rnn=False):
        super().__init__(segment_length, num_freqs, sample_rate, win_length,
                         hop_length, n_fft, remat=remat)
        self.num_mics = num_mics
        self.sb_num_neighbors = sb_num_neighbors
        self.fb_num_neighbors = fb_num_neighbors
        self.look_ahead = look_ahead
        self.norm_type = norm_type  # accepted-and-unused, as in the reference
        # inference-only fused recurrent kernels (ops/pallas/rnn_seq.py)
        self.use_pallas_rnn = use_pallas_rnn

        self.fb_model = _FSSequence(num_freqs * num_mics, num_freqs,
                                    fb_model_hidden_size, num_layers,
                                    sequence_model, fb_output_activate_function)
        self.sb_model = _FSSequence(
            (sb_num_neighbors * 2 + 1) + (fb_num_neighbors * 2 + 1), 2,
            sb_model_hidden_size, num_layers, sequence_model,
            sb_output_activate_function)
        self.norm_fb = CumLayerNorm()
        self.norm_sb = CumLayerNorm()
        self.weight_init = weight_init

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params = {"fb": self.fb_model.init(k1), "sb": self.sb_model.init(k2)}
        if self.weight_init:
            params = apply_weight_init(params, key)
        return params

    def init_state(self, batch: int, dtype=jnp.float32):
        return {
            "fb": self.fb_model.init_state(batch, dtype),
            "sb": self.sb_model.init_state(batch * self.num_freqs, dtype),
            "norm_fb": self.norm_fb.init_state(batch, dtype),
            "norm_sb": self.norm_sb.init_state(batch, dtype),
        }

    # -- spectral layout: [.., 2M, F, T] real/imag split on channels ----
    def _stft_channels(self, chunks):
        """[B', M, K] -> [B', 2M, F, T]."""
        spec = stft(chunks, n_fft=self.stft_cfg.n_fft, hop=self.stft_cfg.hop)
        spec = spec.transpose(0, 1, 3, 2, 4)  # [B', M, F, T, 2]
        return jnp.concatenate([spec[..., 0], spec[..., 1]], axis=1)

    def preprocessing(self, mixture, source=None):
        b = mixture.shape[0]
        chunks, gap = segmentation(mixture, self.segment_length)
        x = self._stft_channels(chunks)
        n = x.shape[0] // b
        x = x.reshape((b, n) + x.shape[1:]).transpose(1, 0, 2, 3, 4)
        if source is None:
            return x, None, gap
        s_chunks, _ = segmentation(source, self.segment_length)
        s = self._stft_channels(s_chunks)
        s = s.reshape((b, n) + s.shape[1:]).transpose(1, 0, 2, 3, 4)
        # keep only mic 0 complex: [N, B, 2, F, T]
        s = jnp.stack([s[:, :, 0], s[:, :, self.num_mics]], axis=2)
        return x, s, gap

    def forward(self, params, state, x):
        """x: [B, 2M, F, T] complex-split channels -> (crm [B, 2, F, T], state)."""
        m = self.num_mics
        noisy = jnp.sqrt(x[:, :m] ** 2 + x[:, m:] ** 2 + EPS)  # [B, M, F, T]
        b, _, f, t = noisy.shape

        fb_in, norm_fb_state = self.norm_fb.apply({}, state["norm_fb"], noisy)
        fb_in = fb_in.reshape(b, m * f, t)
        fb_out, fb_state = self.fb_model.apply(params["fb"], state["fb"], fb_in)

        fb_unf = unfold_subband(fb_out[:, None], self.fb_num_neighbors)
        fb_unf = fb_unf.reshape(b, f, self.fb_num_neighbors * 2 + 1, t)
        noisy_unf = unfold_subband(noisy[:, :1], self.sb_num_neighbors)
        noisy_unf = noisy_unf.reshape(b, f, self.sb_num_neighbors * 2 + 1, t)

        sb_in = jnp.concatenate([noisy_unf, fb_unf], axis=2)  # [B, F, W, T]
        sb_in, norm_sb_state = self.norm_sb.apply({}, state["norm_sb"], sb_in)
        sb_in = sb_in.reshape(b * f, sb_in.shape[2], t)

        sb_mask, sb_state = self.sb_model.apply(params["sb"], state["sb"], sb_in)
        crm = sb_mask.reshape(b, f, 2, t).transpose(0, 2, 1, 3)  # [B, 2, F, T]
        new_state = {"fb": fb_state, "sb": sb_state,
                     "norm_fb": norm_fb_state, "norm_sb": norm_sb_state}
        return crm, new_state

    def forward_stacked(self, params, state, x):
        """All-chunks parallel forward: x ``[N, B, 2M, F, T]``.

        Equivalent to the chunk-serial scan (eval mode): CumLayerNorms
        run their per-chunk recurrences as tiny scans, LSTMs batch all
        input/output projections with only the cell serial."""
        n, bb, _, f, t = x.shape
        m = self.num_mics
        noisy = jnp.sqrt(x[:, :, :m] ** 2 + x[:, :, m:] ** 2 + EPS)

        fb_in, norm_fb_state = self.norm_fb.apply_stacked(
            {}, state["norm_fb"], noisy)
        fb_in = fb_in.reshape(n, bb, m * f, t)
        fb_out, fb_state = self.fb_model.apply_stacked(
            params["fb"], state["fb"], fb_in,
            use_pallas=self.use_pallas_rnn)  # [N, B, F, T]

        flat = fb_out.reshape(n * bb, 1, f, t)
        fb_unf = unfold_subband(flat, self.fb_num_neighbors)
        fb_unf = fb_unf.reshape(n, bb, f, self.fb_num_neighbors * 2 + 1, t)
        noisy_flat = noisy.reshape(n * bb, m, f, t)[:, :1]
        noisy_unf = unfold_subband(noisy_flat, self.sb_num_neighbors)
        noisy_unf = noisy_unf.reshape(n, bb, f, self.sb_num_neighbors * 2 + 1, t)

        sb_in = jnp.concatenate([noisy_unf, fb_unf], axis=3)  # [N, B, F, W, T]
        sb_in, norm_sb_state = self.norm_sb.apply_stacked(
            {}, state["norm_sb"], sb_in)
        sb_in = sb_in.reshape(n, bb * f, sb_in.shape[3], t)

        sb_mask, sb_state = self.sb_model.apply_stacked(
            params["sb"], state["sb"], sb_in,
            use_pallas=self.use_pallas_rnn)
        crm = sb_mask.reshape(n, bb, f, 2, t).transpose(0, 1, 3, 2, 4)
        new_state = {"fb": fb_state, "sb": sb_state,
                     "norm_fb": norm_fb_state, "norm_sb": norm_sb_state}
        return crm, new_state

    def realtime_process(self, params, state, mixture, flag: bool = False,
                         source=None, train: bool = False):
        b, c, _ = mixture.shape
        if not flag:
            pad = jnp.zeros((b, c, self.segment_length // 2), mixture.dtype)
            mixture = jnp.concatenate([pad, mixture], axis=-1)
            if source is not None:
                source = jnp.concatenate([pad, source], axis=-1)
            state = self.init_state(b, mixture.dtype)

        x, s, gap = self.preprocessing(mixture, source)  # [N, B, 2M, F, T]
        n, _, _, f, t = x.shape

        if train:
            # whole-sequence fast path: one forward over N*T frames
            xf = x.transpose(1, 2, 3, 0, 4).reshape(b, x.shape[2], f, n * t)
            crm_flat, state = self.forward(params, state, xf)
            pred_crm = crm_flat.reshape(b, 2, f, n, t).transpose(3, 0, 1, 2, 4)
        else:
            # chunk-semantics path, parallelized over stacked chunks
            # (equivalent to scanning self.forward; see forward_stacked)
            pred_crm, state = self.forward_stacked(params, state, x)

        crm = decompress_cirm(pred_crm)
        noisy_c = jnp.stack([x[:, :, 0], x[:, :, self.num_mics]], axis=2)
        er, ei = complex_mul(crm[:, :, 0], crm[:, :, 1],
                             noisy_c[:, :, 0], noisy_c[:, :, 1])
        # [N, B, F, T, 2]
        pred = jnp.stack([er, ei], axis=-1)
        wav = self.postprocessing(pred, gap)
        if not flag:
            wav = wav[..., self.segment_length // 2:]
        if source is None:
            return wav, state
        return (wav, pred_crm, s, noisy_c), state

    def realtime_process_batched(self, params, state, mixture, reset_mask):
        """Multi-stream runtime (see TemporalCRN.realtime_process_batched):
        per-stream reset mask, lead-in handled by the data pipeline."""
        from semi_tpu.models.base import select_reset
        from semi_tpu.ops.mask import decompress_cirm as _dec

        b = mixture.shape[0]
        fresh = self.init_state(b, mixture.dtype)
        # the sub-band LSTM batches B*num_freqs rows (layout b*F + f), so
        # its reset mask repeats per frequency
        sb_mask = jnp.repeat(reset_mask, self.num_freqs)
        state = {
            "fb": select_reset(state["fb"], fresh["fb"], reset_mask),
            "sb": select_reset(state["sb"], fresh["sb"], sb_mask),
            "norm_fb": select_reset(state["norm_fb"], fresh["norm_fb"],
                                    reset_mask),
            "norm_sb": select_reset(state["norm_sb"], fresh["norm_sb"],
                                    reset_mask),
        }
        x, _, gap = self.preprocessing(mixture)
        pred_crm, state = self.forward_stacked(params, state, x)
        crm = _dec(pred_crm)
        noisy_c = jnp.stack([x[:, :, 0], x[:, :, self.num_mics]], axis=2)
        er, ei = complex_mul(crm[:, :, 0], crm[:, :, 1],
                             noisy_c[:, :, 0], noisy_c[:, :, 1])
        wav = self.postprocessing(jnp.stack([er, ei], axis=-1), gap)
        return wav, state

    def compute_loss(self, source, pred, length, xf=None, sf=None, cirm=None):
        """6-arg-compatible loss (fullsubnet.py:964-987); spectra unused."""
        return super().compute_loss(source, pred, length)
