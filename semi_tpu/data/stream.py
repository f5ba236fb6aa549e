"""Multi-stream batched sampler: B independent utterance streams.

The reference (and the compatible single-stream Processor) trains at
batch_size=1, stream-serially (SURVEY §2.7: even dataloader parallelism
was off). The TPU-native upgrade is B utterance streams advancing in
lock-step: every step yields one fixed-length piece from each stream
plus a per-stream reset mask, feeding
``TemporalCRN.realtime_process_batched`` — one compiled program, B-way
batched MXU work, exact streaming semantics per stream.

Design notes:
- Pieces have a FIXED length (``piece_length``); the reference's random
  16k-60k piece lengths exist for variety, which utterance length
  randomness already provides. Fixed pieces make batching exact (no
  padding, no state pollution).
- The segment_length//2 warm-up zeros that ``realtime_process`` would
  prepend on flag=False (CRN_ELU.py:474-476) are prepended to each
  utterance HERE before chopping, so a stream's first piece carries its
  own lead-in. The model-side trim of the warm-up output only matters
  for loss alignment, handled by zeroing the first ``lead`` samples of
  the target (both prediction and target are silence there).
"""

from __future__ import annotations

import numpy as np

from semi_tpu.data.dataset import LibriPartyDataset

__all__ = ["MultiStreamSampler"]


class MultiStreamSampler:
    """Yields batches {mix [B,M,P], source [B,P], length [B], reset [B]}."""

    def __init__(self, dataset: LibriPartyDataset, num_streams: int,
                 piece_length: int = 16000, lead: int = 1600):
        self.dataset = dataset
        self.num_streams = num_streams
        self.piece_length = piece_length
        self.lead = lead
        self._streams: list[dict | None] = [None] * num_streams
        self._cursor = [0] * num_streams
        self._next_index = 0

    def _refill(self, s: int) -> None:
        ds = self.dataset
        idx = self._next_index
        self._next_index += 1
        mix, source, noise, utt_len = ds._make_utterance(idx)
        lead = np.zeros((mix.shape[0], self.lead), np.float32)
        src_lead = np.zeros((source.shape[0], source.shape[1], self.lead),
                            np.float32)
        self._streams[s] = {
            "mix": np.concatenate([lead, mix[:, :utt_len]], axis=-1),
            "source": np.concatenate([src_lead, source[:, :, :utt_len]],
                                     axis=-1),
            "fresh": True,
        }
        self._cursor[s] = 0

    def next_batch(self) -> dict:
        p = self.piece_length
        mixes, sources, resets = [], [], []
        for s in range(self.num_streams):
            while (self._streams[s] is None or
                   self._cursor[s] + p > self._streams[s]["mix"].shape[-1]):
                self._refill(s)
            st = self._streams[s]
            c = self._cursor[s]
            mixes.append(st["mix"][:, c:c + p])
            sources.append(st["source"][0, 0, c:c + p])  # spk0 mic0 target
            resets.append(st["fresh"])
            st["fresh"] = False
            self._cursor[s] = c + p
        return {
            "mix": np.stack(mixes),                       # [B, M, P]
            "source": np.stack(sources),                  # [B, P]
            "length": np.full(self.num_streams, p, np.int32),
            "reset": np.asarray(resets, np.bool_),
        }
