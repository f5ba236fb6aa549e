"""DistillationCRN — margin-ReLU feature distillation of TemporalCRN.

Parity with the reference (distillation_crn.py:504-572): a frozen
teacher (the reference CRN_ELU config) distills into a student with
channels [16, 32, 64, 64] and hidden 128 (~0.8M params, the "0.81 MB"
model — the overall best in the reference, README.md:58).
Shape-matching student params are initialized from the teacher. Five
pre-activation feature taps (last encoder conv, GRU fc, three decoder
deconvs) pass through per-tap 1x1-conv + batch-norm connectors, and the
distillation loss is Heo et al.'s margin-ReLU masked MSE: the teacher
tap is floored at the per-channel mean of its negative activations, and
positions where the student is already below a non-positive teacher are
masked out.

Total loss = student task loss (0.7 STOI + 0.3 -SI-SNR) + mean tap loss.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from semi_tpu.models.crn import TemporalCRN

EPS = 1e-8

__all__ = ["DistillationCRN"]

STUDENT_CHANNELS = [16, 32, 64, 64]
STUDENT_HIDDEN = 128


class DistillationCRN:
    def __init__(self, num_channels, num_freqs, hidden, segment_length,
                 num_layers=1, num_inputs=3, kernel_size=3, dropout=0.0,
                 sample_rate=16000, win_length=25, hop_length=10, n_fft=400,
                 path: str | None = None, remat=True,
                 compute_dtype="float32"):
        common = dict(num_freqs=num_freqs, segment_length=segment_length,
                      num_layers=num_layers, num_inputs=num_inputs,
                      kernel_size=kernel_size, dropout=dropout,
                      sample_rate=sample_rate, win_length=win_length,
                      hop_length=hop_length, n_fft=n_fft, remat=remat,
                      compute_dtype=compute_dtype)
        self.teacher = TemporalCRN(num_channels=num_channels, hidden=hidden,
                                   **common)
        self.student = TemporalCRN(num_channels=STUDENT_CHANNELS,
                                   hidden=STUDENT_HIDDEN, **common)
        self.teacher_path = path
        self.t_channels = self.teacher.get_channel_num()
        self.s_channels = self.student.get_channel_num()
        self.segment_length = segment_length

    # -- init ------------------------------------------------------------
    def _init_connector(self, key, s_ch, t_ch):
        # kaiming normal fan_out (distillation_crn.py:537-546)
        std = math.sqrt(2.0 / t_ch)
        w = jax.random.normal(key, (t_ch, s_ch, 1, 1)) * std
        return {"w": w, "bn_scale": jnp.ones((t_ch,)),
                "bn_bias": jnp.zeros((t_ch,))}

    def init(self, key):
        kt, ks, kc = jax.random.split(key, 3)
        teacher = self.teacher.init(kt)
        if self.teacher_path:
            from semi_tpu.train.checkpoint import load_pytree

            teacher = load_pytree(self.teacher_path, teacher)
        student = self.student.init(ks)
        # copy shape-matching leaves teacher -> student (distillation_crn.py:527-529)
        t_leaves, _ = jax.tree_util.tree_flatten_with_path(teacher)
        t_by_path = {jax.tree_util.keystr(p): v for p, v in t_leaves}
        s_leaves, s_def = jax.tree_util.tree_flatten_with_path(student)
        new_leaves = []
        for p, v in s_leaves:
            t = t_by_path.get(jax.tree_util.keystr(p))
            new_leaves.append(t if t is not None and t.shape == v.shape else v)
        student = jax.tree_util.tree_unflatten(s_def, new_leaves)

        keys = jax.random.split(kc, len(self.t_channels))
        connectors = [self._init_connector(k, s, t) for k, s, t in
                      zip(keys, self.s_channels, self.t_channels)]
        return {"teacher": teacher, "student": student,
                "connectors": connectors}

    def init_state(self, batch: int, dtype=None):
        # dtype=None lets each network pick its compute dtype (the
        # student's bf16 batched dev runtime needs bf16 ring buffers;
        # forcing f32 here promoted the conv input and crashed the
        # mixed-precision dev epoch)
        return {"teacher": self.teacher.init_state(batch, dtype),
                "student": self.student.init_state(batch, dtype)}

    # -- distillation loss -------------------------------------------------
    @staticmethod
    def _get_margin(ft):
        """Per-channel mean of negative activations (distillation_crn.py:549-553)."""
        mask = (ft < 0.0).astype(ft.dtype)
        return jnp.sum(ft * mask, axis=(0, 2, 3), keepdims=True) / (
            jnp.sum(mask, axis=(0, 2, 3), keepdims=True) + EPS)

    @staticmethod
    def _connector_apply(p, x):
        """1x1 conv (no bias) + training-mode batch norm."""
        y = jax.lax.conv_general_dilated(
            x, p["w"], (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        mu = jnp.mean(y, axis=(0, 2, 3), keepdims=True)
        var = jnp.var(y, axis=(0, 2, 3), keepdims=True)
        y = (y - mu) / jnp.sqrt(var + 1e-5)
        return y * p["bn_scale"][None, :, None, None] + \
            p["bn_bias"][None, :, None, None]

    def distillation_loss(self, connectors, feats_t, feats_s):
        loss = 0.0
        for p, t, s in zip(connectors, feats_t, feats_s):
            t = jax.lax.stop_gradient(t)
            margin = self._get_margin(t)
            t = jnp.maximum(t, margin)
            s = self._connector_apply(p, s)
            mask = 1.0 - ((s <= t) & (t <= 0.0)).astype(s.dtype)
            loss = loss + jnp.mean(jnp.square(s - t) * mask)
        return loss / len(feats_t)

    # -- trainer contract ---------------------------------------------------
    def train_loss(self, params, state, batch, flag: bool):
        """(loss, aux=stoi, sisnr, new_state) — distillation training step
        (distillation_crn.py:567-572, train_distillation.py:191)."""
        noisy, clean, length = batch["mix"], batch["source"], batch["length"]
        t_params = jax.lax.stop_gradient(params["teacher"])
        _, ft, t_state = self.teacher.realtime_process_with_features(
            t_params, state["teacher"], noisy, flag)
        pred, fs, s_state = self.student.realtime_process_with_features(
            params["student"], state["student"], noisy, flag)
        loss, stoi, sisnr = self.student.compute_loss(clean, pred, length)
        loss = loss + self.distillation_loss(params["connectors"], ft, fs)
        return loss, stoi, sisnr, {"teacher": t_state, "student": s_state}

    def utterance_loss(self, params, mix, target, length):
        """Fused BATCHED distillation loss over B whole (lead-padded)
        utterances — the hook the fused utterance trainer calls
        (semi_tpu/train/utterance.py) so distillation trains at the
        same multi-stream throughput as the flagship instead of
        stream-serially (round-2 limitation). Semantics match
        ``train_loss`` with flag=False: fresh state, the warm-up lead
        is already prepended by the trainer, and both networks run the
        stacked-chunk path. Returns (loss, stoi_aux, sisnr)."""
        b = mix.shape[0]
        t_params = jax.lax.stop_gradient(params["teacher"])
        x, gap = self.student.preprocessing(mix)
        # init_state() default picks each network's compute dtype
        _, ft, _ = self.teacher.forward_stacked_with_features(
            t_params, self.teacher.init_state(b), x)
        preds, fs, _ = self.student.forward_stacked_with_features(
            params["student"], self.student.init_state(b), x)
        pred = self.student.postprocessing(preds, gap)
        loss, stoi, sisnr = self.student.compute_loss(target, pred, length)
        loss = loss + self.distillation_loss(params["connectors"], ft, fs)
        return loss, stoi, sisnr

    def realtime_process_batched(self, params, state, mixture, reset_mask):
        """Multi-stream eval runtime: the student is the product
        (predict_distillation.py:84) — used by the utterance dev epoch."""
        student_params = params["student"] if "student" in params else params
        pred, new_s = self.student.realtime_process_batched(
            student_params, state["student"], mixture, reset_mask)
        return pred, {"teacher": state["teacher"], "student": new_s}

    # -- eval contract: the student is the product (predict_distillation.py:84)
    def realtime_process(self, params, state, mixture, flag: bool = False):
        student_params = params["student"] if "student" in params else params
        student_state = None if state is None else state.get("student", state)
        pred, new_s = self.student.realtime_process(
            student_params, student_state, mixture, flag)
        if state is None:
            return pred, {"student": new_s}
        state = dict(state)
        state["student"] = new_s
        return pred, state

    def compute_loss(self, source, pred, length):
        return self.student.compute_loss(source, pred, length)
