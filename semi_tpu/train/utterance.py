"""Whole-utterance fused training: mix + train K batches per dispatch.

Why this exists: the TPU here sits behind a relay where every dispatch
costs ~40 ms synchronized — and *queued* async dispatches degrade to
~650 ms each (measured; see docs/BENCHMARKS.md), so a training loop
made of many small calls is relay-bound no matter how fast the chip is.
This module folds EVERYTHING — on-device mixing (RIR + noise at sampled
SNR), warm-up lead-in, the streaming forward over all chunks, loss,
backprop, grad accumulation, and the optimizer — into ONE jit program
that processes K batches of B whole utterances per dispatch, then
synchronizes. Dispatch overhead amortizes to <5% and the in-flight
queue never exceeds one call.

Semantics vs the reference trainer (train.py:179-223): the reference
streams pieces of one utterance across dataloader items with flag
continuation; state never crosses utterances. Training on whole
utterances keeps the identical state flow (carried across chunks inside
the program, reset between utterances) and the identical per-chunk
TBPTT truncation (ring buffers/RNN state detach at chunk edges). The
one deviation: the loss aggregates over a whole utterance instead of a
random 1-3.75 s piece of it — documented in docs/PARITY.md.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from semi_tpu.data.prefetch import ThreadPrefetcher
from semi_tpu.train.optim import make_optimizer
from semi_tpu.train.step import TrainState

__all__ = ["make_utterance_train_step", "make_utterance_eval_step",
           "UtteranceBatchSampler", "shard_utterance_inputs",
           "replicate_on_mesh"]


def shard_utterance_inputs(mesh, inputs: dict, axis: str = "dp") -> dict:
    """Shard a sampler block over the mesh's data-parallel axis.

    Every leaf is ``[K, B, ...]``: K is the in-program scan dimension
    (stays local — the scan is sequential by design, one fused dispatch
    covers K batches), B is the stream batch that shards over devices.
    XLA then partitions the whole fused program (mix + forward + grads)
    along B and inserts the gradient all-reduce at the batch-mean loss —
    the DDP the reference never got working (train.py:251-257), without
    a line of collective code.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = [None] * x.ndim
        if x.ndim >= 2:
            spec[1] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return {k: put(v) for k, v in inputs.items()}


def replicate_on_mesh(mesh, tree):
    """Replicate a pytree (TrainState, device corpus) on every device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def _mixer_fn(dataset):
    """The dataset's device mixer as a pure function (same math as the
    piece pipeline — semi_tpu/data/dataset.py MixPipeline)."""
    pipeline = dataset.pipeline

    def mix(key, clean, noise_wav, snr_low, snr_high, utt_len):
        return pipeline._mix_impl(
            key, clean, noise_wav,
            jnp.asarray(snr_low, jnp.float32),
            jnp.asarray(snr_high, jnp.float32),
            jnp.asarray(utt_len, jnp.int32),
            augment=dataset.do_augment, noise=dataset.do_noise)

    return mix


class DeviceCorpus:
    """The split's decoded corpus resident on device.

    The relay's real sustained H2D bandwidth is low enough that
    re-uploading ~30 MB of wavs per fused call dominated the step
    budget. The corpus itself is small (a few hundred MB int16), so it
    is uploaded ONCE — per-call inputs shrink to index/offset/key
    vectors (a few KB) and the fused program gathers rows on device.
    """

    def __init__(self, dataset, chunk_rows: int = 256):
        clean, clean_len, noise, noise_len = dataset.corpus_tables()
        self.clean_len = clean_len
        self.noise_len = noise_len
        # upload through jit ARGS in chunks (device_put is pathological
        # on this link) and concatenate on device
        upload = jax.jit(lambda x: x + jnp.zeros((), x.dtype))
        self.clean = jnp.concatenate(
            [upload(clean[i:i + chunk_rows])
             for i in range(0, len(clean), chunk_rows)])
        self.noise = jnp.concatenate(
            [upload(noise[i:i + chunk_rows])
             for i in range(0, len(noise), chunk_rows)])
        jax.block_until_ready((self.clean, self.noise))


def _gather_inputs(corpus_clean, corpus_noise, meta, mix_len):
    """Device gather: meta indices -> (clean [B,spk,L], noise [B,L])."""
    clean = corpus_clean[meta["clean_idx"]]  # [B, spk, L] int16
    rows = corpus_noise[meta["noise_idx"]]   # [B, Lmax] int16

    def slice_one(row, off):
        return jax.lax.dynamic_slice_in_dim(row, off, mix_len)

    noise = jax.vmap(slice_one)(rows, meta["noise_off"])
    return clean, noise


def _mixed_batch(model, mixer, lead, snr, batch_k, enroll=None):
    """One batch of B utterances: device mix -> (mix, target, length).

    ``enroll`` (separate-utterance conditioning, corpus v3): ``[B, el]``
    int16 dry sibling-utterance waveforms; when given they become the
    enrollment channel instead of the self-enrollment fallback below."""
    clean, noise_wav, keys, utt_len = batch_k
    # wavs travel host->device as int16 (lossless for 16-bit corpora;
    # and the device corpus stores int16 rows)
    clean = clean.astype(jnp.float32) / 32768.0
    noise_wav = noise_wav.astype(jnp.float32) / 32768.0

    def mix_one(key, c, nz, ul):
        return mixer(key, c, nz, snr[0], snr[1], ul)

    mix, source, _ = jax.vmap(mix_one)(keys, clean, noise_wav, utt_len)
    # the model-side flag=False warm-up window becomes a per-utterance
    # zero lead-in (stream.py design note); target gets the same lead so
    # prediction and target stay aligned
    mix = jnp.pad(mix, ((0, 0), (0, 0), (lead, 0)))
    target = jnp.pad(source[:, 0, 0], ((0, 0), (lead, 0)))
    if getattr(model, "wants_enroll", False):
        chan = jnp.zeros((mix.shape[0], 1, mix.shape[-1]), mix.dtype)
        if enroll is not None:
            # deployable conditioning: dry clean wav of a DIFFERENT
            # utterance of the target speaker (zero target leakage)
            el = min(model.enroll_len, enroll.shape[-1])
            enr = enroll[:, :el].astype(jnp.float32) / 32768.0
        else:
            # self-enrollment fallback (round-3 spk_r3 upper bound):
            # the last enroll_len samples of the reverberant target
            # image at mic 0 — leaks the target; kept for compat
            # (the model's time-pooled encoder makes content alignment
            # unusable, see models/crn.py TemporalCRNSpk docstring)
            el = min(model.enroll_len, source.shape[-1])

            def enroll_slice(s, ul):
                start = jnp.maximum(ul - el, 0)
                return jax.lax.dynamic_slice_in_dim(s, start, el)

            enr = jax.vmap(enroll_slice)(source[:, 0, 0], utt_len)  # [B, el]
        chan = chan.at[:, 0, :el].set(enr)
        mix = jnp.concatenate([mix, chan], axis=1)
    return mix, target, utt_len + lead


def make_utterance_train_step(model, dataset, k_batches: int,
                              accum_every: int = 2,
                              max_grad_norm: float = 5.0,
                              use_corpus: bool = False):
    """Returns ``step(ts, inputs) -> (ts, metrics[K])`` — ONE jit program
    covering K mixed batches of B whole utterances each.

    Array mode (``use_corpus=False``): ``inputs`` = {clean [K,B,spk,L]
    int16, noise [K,B,L] int16, key [K,B,2], utt_len [K,B]}.
    Corpus mode: ``step(ts, corpus_clean, corpus_noise, inputs)`` with
    ``inputs`` = {clean_idx [K,B,spk], noise_idx [K,B], noise_off
    [K,B], key [K,B,2], utt_len [K,B]} — per-call H2D is a few KB.
    Mixing SNR bounds and augment flags bake from the dataset's current
    attributes.
    """
    tx = make_optimizer(max_grad_norm)
    mixer = _mixer_fn(dataset)
    lead = model.segment_length // 2
    snr = (float(dataset.snr_low), float(dataset.snr_high))
    mix_len = dataset.mix_len
    ds_enroll_len = dataset.enroll_len

    def one_batch(ts: TrainState, batch_k, enroll=None):
        mix, target, length = _mixed_batch(model, mixer, lead, snr, batch_k,
                                           enroll=enroll)
        b = mix.shape[0]

        def loss_fn(params):
            # models with a fused multi-network objective (DistillationCRN:
            # teacher features + student task loss) expose utterance_loss
            # instead of the 2-call realtime/compute contract
            if hasattr(model, "utterance_loss"):
                loss, aux, sisnr = model.utterance_loss(
                    params, mix, target, length)
                return loss, (aux, sisnr)
            state = model.init_state(b)
            pred, _ = model.realtime_process_batched(
                params, state, mix, jnp.ones((b,), bool))
            loss, aux, sisnr = model.compute_loss(target, pred, length)
            return loss, (aux, sisnr)

        (loss, (aux, sisnr)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)

        acc = jax.tree.map(lambda a, g: a + g / accum_every,
                           ts.grad_accum, grads)
        count = ts.accum_count + 1

        def apply_update(_):
            updates, opt_state = tx.update(acc, ts.opt_state, ts.params)
            new_params = jax.tree.map(
                lambda p, u: p - ts.plateau.lr * u, ts.params, updates)
            return new_params, opt_state, \
                jax.tree.map(jnp.zeros_like, acc), jnp.zeros((), jnp.int32)

        def skip_update(_):
            return ts.params, ts.opt_state, acc, count

        new_params, opt_state, new_acc, new_count = jax.lax.cond(
            count >= accum_every, apply_update, skip_update, None)
        new_ts = TrainState(
            params=new_params, opt_state=opt_state, grad_accum=new_acc,
            accum_count=new_count, plateau=ts.plateau, step=ts.step + 1)
        return new_ts, {"loss": loss, "aux": aux, "sisnr": sisnr}

    if not use_corpus:
        def step(ts: TrainState, inputs):
            xs = (inputs["clean"], inputs["noise"], inputs["key"],
                  inputs["utt_len"], inputs.get("enroll"))
            return jax.lax.scan(
                lambda t, x: one_batch(t, x[:4], enroll=x[4]), ts, xs)

        return step

    def step_corpus(ts: TrainState, corpus_clean, corpus_noise, inputs):
        def body(t, meta):
            clean, noise = _gather_inputs(corpus_clean, corpus_noise,
                                          meta, mix_len)
            # ADVICE r4: slice the gather to dataset.enroll_len so the
            # corpus path matches the array path's [k,b,enroll_len]
            # buffer exactly (a model with enroll_len > dataset's would
            # otherwise see full-mix_len rows here but zero-padded audio
            # there, breaking the pinned array/meta equivalence)
            enroll = corpus_clean[meta["enroll_idx"]][..., :ds_enroll_len] \
                if "enroll_idx" in meta else None
            return one_batch(t, (clean, noise, meta["key"],
                                 meta["utt_len"]), enroll=enroll)

        return jax.lax.scan(body, ts, inputs)

    return step_corpus


def make_utterance_eval_step(model, dataset, use_corpus: bool = False):
    """``eval(params, inputs) -> metrics[K]`` — mixed + scored on device,
    same program shape as the train step minus gradients (corpus mode:
    ``eval(params, corpus_clean, corpus_noise, inputs)``)."""
    mixer = _mixer_fn(dataset)
    lead = model.segment_length // 2
    snr = (float(dataset.snr_low), float(dataset.snr_high))
    mix_len = dataset.mix_len
    ds_enroll_len = dataset.enroll_len

    def one_batch(params, batch_k, enroll=None):
        from semi_tpu.metrics.losses import stoi_loss

        mix, target, length = _mixed_batch(model, mixer, lead, snr, batch_k,
                                           enroll=enroll)
        b = mix.shape[0]
        state = model.init_state(b)
        pred, _ = model.realtime_process_batched(
            params, state, mix, jnp.ones((b,), bool))
        loss, aux, sisnr = model.compute_loss(target, pred, length)
        # eval-form STOI oracle for dev gating (see train/step.py note)
        stoi = -stoi_loss(target, pred, length)
        return {"loss": loss, "aux": aux, "sisnr": sisnr, "stoi": stoi}

    if not use_corpus:
        def step(params, inputs):
            xs = (inputs["clean"], inputs["noise"], inputs["key"],
                  inputs["utt_len"], inputs.get("enroll"))
            _, ms = jax.lax.scan(
                lambda c, x: (c, one_batch(params, x[:4], enroll=x[4])),
                None, xs)
            return ms

        return step

    def step_corpus(params, corpus_clean, corpus_noise, inputs):
        def body(c, meta):
            clean, noise = _gather_inputs(corpus_clean, corpus_noise,
                                          meta, mix_len)
            # ADVICE r4: match the array path's enroll_len truncation
            # (see make_utterance_step.step_corpus)
            enroll = corpus_clean[meta["enroll_idx"]][..., :ds_enroll_len] \
                if "enroll_idx" in meta else None
            return c, one_batch(params, (clean, noise, meta["key"],
                                         meta["utt_len"]), enroll=enroll)

        _, ms = jax.lax.scan(body, None, inputs)
        return ms

    return step_corpus


class UtteranceBatchSampler:
    """Assembles {clean [K,B,spk,L], noise [K,B,L], key [K,B,2],
    utt_len [K,B]} input blocks on a producer thread (decode + numpy
    only — all mixing happens inside the fused step program).

    Multi-host (SURVEY §5.8, reference DistributedSampler analog,
    train.py:170-174 commented upstream): each host enumerates the
    *local* index space and maps it onto the global, deterministic
    per-index rng chain as ``global = local * process_count +
    process_index`` — disjoint shards whose union is the serial order.
    ``start_index`` stays in local units, so mid-epoch resume counters
    are per-host and unchanged on 1 host."""

    def __init__(self, dataset, batch: int, k_batches: int,
                 start_index: int = 0, prefetch_depth: int = 2,
                 process_index: int | None = None,
                 process_count: int | None = None):
        self.dataset = dataset
        self.batch = batch
        self.k = k_batches
        self.proc_index = jax.process_index() if process_index is None \
            else process_index
        self.proc_count = jax.process_count() if process_count is None \
            else process_count

        def gen():
            i = start_index
            while True:
                yield self._assemble(i)
                i += self.k * self.batch

        self._it = ThreadPrefetcher(gen(), depth=prefetch_depth)

    def _assemble(self, index0: int) -> dict:
        ds = self.dataset
        k, b = self.k, self.batch
        clean = np.zeros((k, b, ds.spk_num, ds.mix_len), np.int16)
        noise = np.zeros((k, b, ds.mix_len), np.int16)
        keys = np.zeros((k, b, 2), np.uint32)
        lens = np.zeros((k, b), np.int32)
        sep = ds._separate_enroll()
        enroll = np.zeros((k, b, ds.enroll_len), np.int16) if sep else None
        idx = index0
        for i in range(k):
            for j in range(b):
                out = ds.utterance_inputs(
                    idx * self.proc_count + self.proc_index)
                c, nz, key, ul = out[:4]
                clean[i, j] = np.clip(c * 32768.0, -32768, 32767)
                noise[i, j] = np.clip(nz * 32768.0, -32768, 32767)
                keys[i, j] = np.asarray(key, np.uint32)
                lens[i, j] = ul
                if sep:
                    enroll[i, j] = np.clip(out[4] * 32768.0, -32768, 32767)
                idx += 1
        out = {"clean": clean, "noise": noise, "key": keys, "utt_len": lens}
        if sep:
            out["enroll"] = enroll
        return out

    def next_batch(self) -> dict:
        return next(self._it)

    def close(self) -> None:
        self._it.close()


class UtteranceMetaSampler:
    """Index-only sampler for the device corpus: assembles
    {clean_idx [K,B,spk], noise_idx [K,B], noise_off [K,B], key [K,B,2],
    utt_len [K,B]} — per-call H2D of a few KB. Replays the array
    sampler's exact rng chain via ``dataset.utterance_meta``."""

    def __init__(self, dataset, corpus: DeviceCorpus, batch: int,
                 k_batches: int, start_index: int = 0,
                 prefetch_depth: int = 2,
                 process_index: int | None = None,
                 process_count: int | None = None):
        self.dataset = dataset
        self.corpus = corpus
        self.batch = batch
        self.k = k_batches
        self.proc_index = jax.process_index() if process_index is None \
            else process_index
        self.proc_count = jax.process_count() if process_count is None \
            else process_count

        def gen():
            i = start_index
            while True:
                yield self._assemble(i)
                i += self.k * self.batch

        self._it = ThreadPrefetcher(gen(), depth=prefetch_depth)

    def _assemble(self, index0: int) -> dict:
        ds, co = self.dataset, self.corpus
        k, b = self.k, self.batch
        ci = np.zeros((k, b, ds.spk_num), np.int32)
        ni = np.zeros((k, b), np.int32)
        off = np.zeros((k, b), np.int32)
        keys = np.zeros((k, b, 2), np.uint32)
        lens = np.zeros((k, b), np.int32)
        sep = ds._separate_enroll()
        ei = np.zeros((k, b), np.int32) if sep else None
        idx = index0
        for i in range(k):
            for j in range(b):
                out = ds.utterance_meta(
                    idx * self.proc_count + self.proc_index,
                    co.clean_len, co.noise_len)
                c_idx, n_idx, n_off, key, ul = out[:5]
                ci[i, j], ni[i, j], off[i, j] = c_idx, n_idx, n_off
                keys[i, j] = np.asarray(key, np.uint32)
                lens[i, j] = ul
                if sep:
                    ei[i, j] = out[5]
                idx += 1
        out = {"clean_idx": ci, "noise_idx": ni, "noise_off": off,
               "key": keys, "utt_len": lens}
        if sep:
            out["enroll_idx"] = ei
        return out

    def next_batch(self) -> dict:
        return next(self._it)

    def close(self) -> None:
        self._it.close()
