"""Device-resident multi-stream sampler: the input pipeline without D2H.

``MultiStreamSampler`` (semi_tpu/data/stream.py) mixes each utterance on
device, copies ~2.7 MB back to the host, slices pieces with numpy, and
re-uploads them — three trips through a multi-ms-RTT device link per
utterance, all on the training loop's critical path (VERDICT weak #2:
end-to-end training ran at ~8% of the measured step rate).

This sampler keeps utterances ON DEVICE from the mixer onward:

  host (producer thread)      device
  ----------------------      -----------------------------------------
  decode clean/noise wavs --> MixPipeline (jitted, async dispatch)
  track cursors/limits    --> scatter mix+target into [B, buf_len]
                              stream buffers (jitted, async)
  per step: upload tiny   --> gather [B, M, piece] via vmapped
  cursor/reset vectors        dynamic_slice (jitted, async)

Every device call is asynchronous — the host never blocks on a mix
result — so wav decode and mixing overlap the train step and the only
per-step H2D is a few hundred bytes of cursors. Output batches are
bit-identical to ``MultiStreamSampler`` (same compiled mixer program,
same RNG chain via ``dataset.utterance_inputs``; pinned by
tests/test_device_stream.py).

Reference analog: the gpuRIR preprocessing device + CPU mixing loop
(reference: multichannel.py:8, data_c.py:210-252) — here preprocessing
shares the training chip and hides behind its compute instead of
pinning a second device.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from semi_tpu.data.dataset import LibriPartyDataset
from semi_tpu.data.prefetch import ThreadPrefetcher

__all__ = ["DeviceStreamSampler"]


class DeviceStreamSampler:
    """Yields {mix [B,M,P], source [B,P], length [B], reset [B]} with all
    large tensors resident on device. Drop-in for MultiStreamSampler."""

    def __init__(self, dataset: LibriPartyDataset, num_streams: int,
                 piece_length: int = 16000, lead: int = 1600,
                 prefetch_depth: int = 12, start_index: int = 0,
                 process_index: int | None = None,
                 process_count: int | None = None):
        self.dataset = dataset
        # multi-host shard: local index i -> global i*pc + pi (disjoint
        # per-host coverage of the deterministic per-index rng chain);
        # start_index stays local, so resume counters are per-host
        pi = jax.process_index() if process_index is None else process_index
        pc = jax.process_count() if process_count is None else process_count
        self.proc_index, self.proc_count = pi, pc
        self.num_streams = num_streams
        self.piece_length = piece_length
        self.lead = lead
        self.buf_len = lead + dataset.mix_len

        num_mic = dataset.room_cfg.num_mic
        self._mix_buf = jnp.zeros((num_streams, num_mic, self.buf_len),
                                  jnp.float32)
        self._src_buf = jnp.zeros((num_streams, self.buf_len), jnp.float32)
        # host-side mirrors: cursor/limit are plain ints (utterance length
        # is known on host), so refill decisions never read device memory
        self._cursor = [0] * num_streams
        self._limit = [0] * num_streams
        self._fresh = [True] * num_streams
        self._next_index = start_index

        # background decode: utterance_inputs(i) for i = start_index,
        # start_index+1, ... — the host-side cost (wav reads, numpy
        # concat) off the hot loop. start_index supports mid-epoch resume.
        self._inputs = ThreadPrefetcher(
            (dataset.utterance_inputs(i * pc + pi)
             for i in _count_from(start_index)),
            depth=prefetch_depth)

        lead_ = lead

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scatter(mix_buf, src_buf, s, mix, src0):
            # mix [M, mix_len], src0 [mix_len] -> slot s with the warm-up
            # lead-in zeros prepended (stream.py design note: the model's
            # flag=False zero-pad becomes per-utterance lead samples here)
            mix_b = jnp.pad(mix, ((0, 0), (lead_, 0)))
            src_b = jnp.pad(src0, (lead_, 0))
            return mix_buf.at[s].set(mix_b), src_buf.at[s].set(src_b)

        p = piece_length

        @jax.jit
        def gather(mix_buf, src_buf, cursors):
            def one(m, v, c):
                mix = jax.lax.dynamic_slice(m, (0, c), (m.shape[0], p))
                src = jax.lax.dynamic_slice(v, (c,), (p,))
                return mix, src

            return jax.vmap(one)(mix_buf, src_buf, cursors)

        self._scatter = scatter
        self._gather = gather

    def close(self) -> None:
        self._inputs.close()

    def _refill(self, s: int) -> None:
        ds = self.dataset
        clean, noise_wav, key, utt_len = next(self._inputs)
        self._next_index += 1
        # same compiled mixer program as MultiStreamSampler/_make_utterance
        # (bit-identical values); outputs stay on device
        mix, source, _ = ds.pipeline(
            key, jnp.asarray(clean), jnp.asarray(noise_wav),
            ds.snr_low, ds.snr_high, utt_len,
            augment=ds.do_augment, noise=ds.do_noise)
        # the piece target is spk0/mic0 of the reverberant source
        # (stream.py:72); slice before scatter so only [mix_len] is stored
        self._mix_buf, self._src_buf = self._scatter(
            self._mix_buf, self._src_buf, jnp.asarray(s, jnp.int32),
            mix, source[0, 0])
        self._cursor[s] = 0
        self._limit[s] = self.lead + utt_len
        self._fresh[s] = True

    def next_batch(self) -> dict:
        p = self.piece_length
        resets = []
        for s in range(self.num_streams):
            while self._cursor[s] + p > self._limit[s]:
                self._refill(s)
            resets.append(self._fresh[s])
            self._fresh[s] = False
        cursors = jnp.asarray(np.asarray(self._cursor, np.int32))
        mix, src = self._gather(self._mix_buf, self._src_buf, cursors)
        for s in range(self.num_streams):
            self._cursor[s] += p
        return {
            "mix": mix,                                   # [B, M, P] device
            "source": src,                                # [B, P]    device
            "length": jnp.full((self.num_streams,), p, jnp.int32),
            "reset": jnp.asarray(np.asarray(resets, np.bool_)),
        }


def _count_from(start: int):
    i = start
    while True:
        yield i
        i += 1
