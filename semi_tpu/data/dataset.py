"""LibriPartyDataset: dynamic on-the-fly mixing with the flag protocol.

Rebuild of the reference dataset (data_c.py:18-252): CSV manifests per
split {clean, noise, rir}, virtual epochs of 30 000 train / 3 000
dev-test items, per-item dynamic mixing (perturb → masks/clip → room
simulation → noise at sampled SNR → peak normalize), long mixtures
split into 16 000-60 000-sample pieces pushed to a buffer; the first
piece of an utterance carries ``flag=False`` (reset streaming state),
later pieces ``flag=True`` (state continues across dataloader items).

TPU-first changes (documented deviations from the reference):
- The whole mix pipeline (RIR synthesis + convolution + noise + masks)
  is ONE jitted device function at a static mixture length — no
  gpuRIR preprocessing device, no CPU mixing.
- Piece lengths are drawn from 8 000-sample buckets so the train step
  compiles once per bucket (the reference's fully dynamic lengths would
  mean unbounded recompilation under XLA).
- The reference buffer pops LIFO and its split cursor advances
  ``start += end`` (data_c.py:173-177), silently skipping audio after
  the second piece; here the buffer is FIFO and the cursor is
  ``start = end`` — pieces tile the mixture.
- Randomness is an explicit PRNG key chain seeded per (seed, epoch,
  index) instead of global torch/numpy state.
- When manifests are missing, a synthetic source (harmonic "speech" +
  filtered noise) stands in so tests/benches run hermetically
  (the reference's Chinese_data symlink is dangling even upstream).
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

from semi_tpu.data.augment import (
    add_noise, do_clip, drop_chunk, drop_freq, extend_noise, speed_perturb,
    SPEEDS,
)
from semi_tpu.data.rir import RoomConfig, fft_convolve, sample_room, simulate_rir
from semi_tpu.data.wav import read_wav

MAX_AMP = 0.95

__all__ = ["LibriPartyDataset", "MixPipeline"]


class MixPipeline:
    """Jitted device-side mixer at a static mixture length."""

    def __init__(self, room_cfg: RoomConfig, augment_cfg: dict, mix_len: int):
        self.room_cfg = room_cfg
        self.augment_cfg = augment_cfg
        self.mix_len = mix_len
        self._mix = jax.jit(self._mix_impl, static_argnames=("augment", "noise"))

    def _mix_impl(self, key, clean, noise_wav, snr_low, snr_high, utt_len,
                  augment: bool, noise: bool):
        """clean: [spk, L]; noise_wav: [L]. Returns (mix[M,L], source[spk,M,L], noise[M,L]).

        ``utt_len``: active samples of the padded buffers — add_noise
        amplitude estimation masks to it (reference mixes exact-length
        tensors; see augment.add_noise)."""
        cfg = self.room_cfg
        k_room, k_rir, k_aug, k_noise = jax.random.split(key, 4)

        aug = clean
        if augment:
            ks = jax.random.split(k_aug, 3 * clean.shape[0]).reshape(
                clean.shape[0], 3, 2)

            def aug_one(keys, x):
                x = drop_freq(keys[0], x, **self.augment_cfg.get("freqmask", {}))
                x = drop_chunk(keys[1], x, **self.augment_cfg.get("timemask", {}))
                x = do_clip(keys[2], x, **self.augment_cfg.get("clip", {}))
                return x

            aug = jax.vmap(aug_one)(ks, clean)

        room = sample_room(k_room, cfg)
        rirs = simulate_rir(k_rir, room, cfg)  # [spk+1, M, R]

        # reverberant augmented sources: [spk, M, L]
        source = jax.vmap(lambda s, r: fft_convolve(s[None, :], r))(aug, rirs[:-1])
        mix = jnp.sum(source, axis=0)  # [M, L]

        if noise:
            noise_multi = fft_convolve(noise_wav[None, :], rirs[-1])  # [M, L]
            mix, noise_out = add_noise(
                k_noise, mix, noise_multi,
                snr_low=snr_low, snr_high=snr_high,
                mix_prob=self.augment_cfg.get("addnoise", {}).get("mix_prob", 1.0),
                length=utt_len)
        else:
            noise_out = jnp.zeros_like(mix)

        peak = jnp.max(jnp.abs(mix))
        scale = jnp.where(peak >= MAX_AMP, MAX_AMP / (peak + 1e-10), 1.0)
        return mix * scale, source, noise_out

    def __call__(self, key, clean, noise_wav, snr_low, snr_high, utt_len,
                 augment: bool, noise: bool):
        return self._mix(key, clean, noise_wav,
                         jnp.asarray(snr_low, jnp.float32),
                         jnp.asarray(snr_high, jnp.float32),
                         jnp.asarray(utt_len, jnp.int32),
                         augment=augment, noise=noise)


def _synthetic_clean(rng: np.random.Generator, length: int, fs: int) -> np.ndarray:
    """Harmonic 'speech-like' signal: pitch drift + formant AM + pauses."""
    t = np.arange(length) / fs
    f0 = 110.0 * 2 ** rng.uniform(-0.3, 0.8)
    drift = 1.0 + 0.08 * np.sin(2 * np.pi * rng.uniform(0.3, 1.5) * t)
    phase = 2 * np.pi * np.cumsum(f0 * drift) / fs
    sig = np.zeros(length, np.float32)
    for h in range(1, 6):
        sig += rng.uniform(0.2, 1.0) / h * np.sin(h * phase).astype(np.float32)
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t +
                            rng.uniform(0, 2 * np.pi)))
    gate = (np.sin(2 * np.pi * rng.uniform(0.2, 0.6) * t) > -0.7).astype(np.float32)
    sig = sig * (0.2 + 0.8 * env).astype(np.float32) * gate
    return (0.3 * sig / (np.abs(sig).max() + 1e-8)).astype(np.float32)


def _synthetic_noise(rng: np.random.Generator, length: int) -> np.ndarray:
    white = rng.standard_normal(length).astype(np.float32)
    k = np.exp(-np.arange(64) / rng.uniform(2.0, 32.0)).astype(np.float32)
    shaped = np.convolve(white, k / k.sum(), mode="same")
    return (shaped / (np.abs(shaped).max() + 1e-8)).astype(np.float32)


class LibriPartyDataset:
    def __init__(self, config: dict, synthetic_ok: bool = True):
        self.config = config
        self.sample_rate = config["config"]["sample_rate"]
        self.spk_num = config["config"]["spk_num"]
        self.max_length = config["config"].get("max_length", 60000)
        self.mix_len = config["config"].get("mix_length", 64000)
        self.seed = config["config"].get("seed", 0)
        self.synthetic_ok = synthetic_ok

        # separate-utterance enrollment (corpus v3, round 4): when the
        # clean manifests carry a ``spk`` column and config.enroll_mode
        # is "separate", every item also selects a DIFFERENT utterance
        # of the target speaker as the enrollment source — deployable
        # speaker conditioning with zero target leakage (the round-3
        # self-enrollment upper bound lives in train/utterance.py's
        # fallback path and stays available for spk_r3 compat).
        self.enroll_mode = config["config"].get("enroll_mode", "self")
        self.enroll_len = config["config"].get("enroll_len", 32000)

        self.all_csv = self._load_manifests(config.get("dataset", {}))
        self.buffer: list = []
        self.epoch = 0
        self._singleton_warned: set = set()
        self._wav_cache: dict = {}
        self.cache_max_files = config["config"].get("wav_cache_files", 8000)

        mc = dict(config["augment"]["multichannel"])
        self.room_cfg = RoomConfig(
            room_limit=tuple(map(tuple, mc["room_limit"])),
            t60_limit=tuple(mc["t60_limit"]),
            beta_limit=tuple(map(tuple, mc["beta_limit"])),
            array_limit=tuple(map(tuple, mc["array_limit"])),
            mic_limit=tuple(map(tuple, mc["mic_limit"])),
            source_limit=tuple(map(tuple, mc["source_limit"])),
            num_src=mc["num_src"], num_mic=mc["num_mic"], fs=mc["fs"])
        self.pipeline = MixPipeline(self.room_cfg, config["augment"], self.mix_len)

        self.set_attribute("train")

    # -- manifests ----------------------------------------------------
    def _load_manifests(self, dataset_cfg: dict) -> dict:
        out = {}
        for split in ("train", "dev", "test"):
            entry = {}
            split_cfg = dataset_cfg.get(split, {})
            for kind, paths in split_cfg.items():
                rows = []
                spk = []
                for p in paths:
                    if os.path.exists(p):
                        import pandas as pd
                        df = pd.read_csv(p)
                        base = os.path.dirname(os.path.abspath(p))
                        # manifests may carry paths relative to their own
                        # directory (portable, committable) or absolute
                        rows.extend(
                            q if os.path.isabs(q) else os.path.join(base, q)
                            for q in df["path"].dropna().tolist())
                        # optional speaker column (corpus v3 clean
                        # manifests) for separate-utterance enrollment
                        if "spk" in df.columns:
                            spk.extend(df["spk"].tolist())
                entry[kind] = rows
                if kind == "clean" and len(spk) == len(rows) and rows:
                    entry["clean_spk"] = spk
            out[split] = entry
        return out

    def _spk_siblings(self, split: str) -> dict | None:
        """spk id -> np.array of clean-manifest indices (cached)."""
        cache = getattr(self, "_spk_groups", None)
        if cache is None:
            cache = self._spk_groups = {}
        if split not in cache:
            spk = self.all_csv.get(split, {}).get("clean_spk")
            if spk is None:
                cache[split] = None
            else:
                groups: dict = {}
                for i, s in enumerate(spk):
                    groups.setdefault(s, []).append(i)
                cache[split] = {s: np.asarray(v, np.int64)
                                for s, v in groups.items()}
        return cache[split]

    def _draw_enroll_idx(self, rng: np.random.Generator,
                        target_idx: int) -> int:
        """A different utterance of target_idx's speaker (uniform over
        siblings; falls back to the target itself for singleton
        speakers — v2 manifests without a spk column never get here)."""
        spk = self.all_csv[self.dataset]["clean_spk"]
        sibs = self._spk_siblings(self.dataset)[spk[target_idx]]
        cands = sibs[sibs != target_idx]
        if len(cands) == 0:
            # ADVICE r4: the target utterance AS its own enrollment is
            # stronger leakage than self-enrollment — never let a
            # filtered/edited manifest silently violate the zero-leakage
            # property the separate mode promises. Warn loudly, once per
            # speaker, and fall back.
            key = (self.dataset, spk[target_idx])
            if key not in self._singleton_warned:
                self._singleton_warned.add(key)
                warnings.warn(
                    f"enroll_mode=separate: speaker {spk[target_idx]!r} in "
                    f"split {self.dataset!r} has a single utterance — "
                    "falling back to the target itself as enrollment "
                    "(TARGET LEAKAGE for this item)", stacklevel=2)
            return int(target_idx)
        return int(cands[int(rng.integers(len(cands)))])

    def _have_real_data(self) -> bool:
        csv = self.all_csv.get(self.dataset, {})
        return bool(csv.get("clean")) and bool(csv.get("noise"))

    # -- reference API -------------------------------------------------
    def set_attribute(self, dataset: str, augment: bool = True,
                      perturb: bool = False, rir: bool = False,
                      noise: bool = True, snr_low: float = 0,
                      snr_high: float = 25):
        self.dataset = dataset
        self.do_augment = augment
        self.do_perturb = perturb
        self.do_noise = noise
        if dataset == "test":
            self.snr_low, self.snr_high = snr_low, snr_high
        else:
            a = self.config["augment"]["addnoise"]
            self.snr_low, self.snr_high = a["snr_low"], a["snr_high"]
        self.buffer = []

    def init_seed(self, seed: int):
        self.epoch = seed

    def __len__(self):
        cfg = self.config["config"]
        if self.dataset == "train":
            return cfg.get("train_epoch_size", 30000)
        return cfg.get("eval_epoch_size", 3000)

    # -- item generation -----------------------------------------------
    def _rng(self, index: int) -> np.random.Generator:
        # stable split hash: python str hash() is SALTED per process
        # (PYTHONHASHSEED), which silently made every process draw a
        # different mixture set — train resumes and eval runs were not
        # reproducible across invocations
        import zlib

        split_tag = zlib.crc32(self.dataset.encode()) & 0x7FFFFFFF
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, index,
                                    split_tag]))

    def _read_cached(self, path: str) -> np.ndarray:
        """Decoded-wav RAM cache. The corpus is a few thousand files
        (~1 GB decoded) while decode+resample costs ~10 ms per utterance
        on this 1-CPU host — without the cache the input pipeline, not
        the TPU, bounds training throughput."""
        wav = self._wav_cache.get(path)
        if wav is None:
            wav, _ = read_wav(path, self.sample_rate)
            if len(self._wav_cache) < self.cache_max_files:
                self._wav_cache[path] = wav
        return wav

    def _load_clean(self, rng: np.random.Generator) -> np.ndarray:
        wav, _ = self._load_clean_idx(rng)
        return wav

    def _load_clean_idx(self, rng: np.random.Generator):
        """(wav, manifest index) — index is -1 for the synthetic source."""
        if self._have_real_data():
            paths = self.all_csv[self.dataset]["clean"]
            wav = np.zeros(0, np.float32)
            i = -1
            while len(wav) < 16000:
                i = int(rng.integers(len(paths)))
                wav = self._read_cached(paths[i])
            return wav, i
        length = int(rng.integers(32000, 96000))
        return _synthetic_clean(rng, length, self.sample_rate), -1

    def _load_noise(self, rng: np.random.Generator, target_len: int) -> np.ndarray:
        if self._have_real_data():
            paths = self.all_csv[self.dataset]["noise"]
            wav = self._read_cached(paths[int(rng.integers(len(paths)))])
            wav = extend_noise(wav, target_len, self.sample_rate)
        else:
            wav = _synthetic_noise(rng, target_len + int(rng.integers(0, 16000)))
        if len(wav) > target_len:
            start = int(rng.integers(len(wav) - target_len + 1))
            wav = wav[start: start + target_len]
        return wav.astype(np.float32)

    def utterance_inputs(self, index: int):
        """Host-side phase of utterance generation: decode + perturb +
        noise selection. Returns ``(clean[spk, mix_len], noise_wav[mix_len],
        key, utt_len)`` — the exact inputs of the device mixer, so callers
        (``_make_utterance`` and the device-resident sampler) share one
        deterministic RNG chain.

        With ``enroll_mode == "separate"`` (and a spk-keyed manifest) a
        fifth element ``enroll[enroll_len]`` is appended: the dry clean
        waveform of a DIFFERENT utterance of slot-0's speaker. Its draw
        comes AFTER every existing draw, so the mixture chain — and
        therefore item-for-item comparability with unconditioned runs —
        is unchanged."""
        rng = self._rng(index)
        cleans = []
        clean_idx = []
        for _ in range(self.spk_num):
            wav, ci = self._load_clean_idx(rng)
            if self.do_perturb:
                speed = SPEEDS[int(rng.integers(len(SPEEDS)))]
                wav = np.asarray(speed_perturb(jnp.asarray(wav), speed,
                                               self.sample_rate))
            cleans.append(wav)
            clean_idx.append(ci)
        self._last_clean_idx = clean_idx

        # static mixture length: trim/zero-pad to mix_len
        clean = np.zeros((self.spk_num, self.mix_len), np.float32)
        for i, wav in enumerate(cleans):
            n = min(len(wav), self.mix_len)
            clean[i, :n] = wav[:n]
        utt_len = min(max(len(w) for w in cleans), self.mix_len)

        noise_wav = self._load_noise(rng, self.mix_len)
        # pure-numpy twin of jax.random.PRNGKey (threefry layout
        # [hi, lo]): creating a real PRNGKey here would round-trip the
        # device link TWICE per utterance (H2D create + D2H read) from
        # the producer thread -- ~4 s per 128-utterance block on this
        # relay. Seeds are < 2**31 so hi is always 0.
        key = np.asarray([0, rng.integers(2**31)], np.uint32)
        if self._separate_enroll():
            sib = self._draw_enroll_idx(rng, clean_idx[0])
            wav = self._read_cached(self.all_csv[self.dataset]["clean"][sib])
            enroll = np.zeros(self.enroll_len, np.float32)
            n = min(len(wav), self.enroll_len)
            enroll[:n] = wav[:n]
            return clean, noise_wav, key, utt_len, enroll
        return clean, noise_wav, key, utt_len

    def _separate_enroll(self) -> bool:
        return (self.enroll_mode == "separate"
                and self.all_csv.get(self.dataset, {}).get("clean_spk")
                is not None)

    def corpus_tables(self):
        """Decode the ACTIVE split's whole corpus into fixed tables for
        the device-resident cache (semi_tpu/train/utterance.py
        DeviceCorpus): ``(clean_i16 [Nc, mix_len], clean_len [Nc],
        noise_i16 [Nn, Lmax], noise_len [Nn])``. Noise rows are
        pre-extended with the crossfade loop exactly as
        ``_load_noise`` would (extend_noise is deterministic), so
        index+offset lookups reproduce the array path bit-for-bit
        (int16 quantization aside — source wavs are 16-bit)."""
        assert self._have_real_data(), "device corpus needs CSV manifests"
        csv = self.all_csv[self.dataset]
        nc = len(csv["clean"])
        clean = np.zeros((nc, self.mix_len), np.int16)
        clean_len = np.zeros(nc, np.int32)
        for i, p in enumerate(csv["clean"]):
            wav = self._read_cached(p)
            n = min(len(wav), self.mix_len)
            clean[i, :n] = np.clip(wav[:n] * 32768.0, -32768, 32767)
            clean_len[i] = len(wav)
        noises = []
        for p in csv["noise"]:
            wav = extend_noise(self._read_cached(p), self.mix_len,
                               self.sample_rate)
            noises.append(wav)
        lmax = max(len(w) for w in noises)
        noise = np.zeros((len(noises), lmax), np.int16)
        noise_len = np.zeros(len(noises), np.int32)
        for i, w in enumerate(noises):
            noise[i, :len(w)] = np.clip(w * 32768.0, -32768, 32767)
            noise_len[i] = len(w)
        return clean, clean_len, noise, noise_len

    def utterance_meta(self, index: int, clean_len: np.ndarray,
                       noise_len: np.ndarray):
        """Index-only twin of :meth:`utterance_inputs` for the device
        corpus: replays the SAME rng chain (draw for draw) but returns
        ``(clean_idx [spk], noise_idx, noise_off, key, utt_len)``
        instead of decoded arrays. Equivalence pinned by
        tests/test_utterance_mode.py."""
        assert not self.do_perturb, "speed perturb needs the array path"
        rng = self._rng(index)
        clean_idx = []
        for _ in range(self.spk_num):
            # mirrors _load_clean's too-short retry loop
            while True:
                i = int(rng.integers(len(clean_len)))
                if clean_len[i] >= 16000:
                    break
            clean_idx.append(i)
        utt_len = int(min(max(clean_len[i] for i in clean_idx),
                          self.mix_len))
        i_n = int(rng.integers(len(noise_len)))
        ln = int(noise_len[i_n])
        off = int(rng.integers(ln - self.mix_len + 1)) \
            if ln > self.mix_len else 0
        # pure-numpy twin of jax.random.PRNGKey (threefry layout
        # [hi, lo]): creating a real PRNGKey here would round-trip the
        # device link TWICE per utterance (H2D create + D2H read) from
        # the producer thread -- ~4 s per 128-utterance block on this
        # relay. Seeds are < 2**31 so hi is always 0.
        key = np.asarray([0, rng.integers(2**31)], np.uint32)
        if self._separate_enroll():
            # same convention as utterance_inputs: the sibling draw is
            # the LAST draw of the chain (mixture draws unchanged)
            sib = self._draw_enroll_idx(rng, clean_idx[0])
            return (np.asarray(clean_idx, np.int32), i_n, off, key,
                    utt_len, sib)
        return (np.asarray(clean_idx, np.int32), i_n, off, key, utt_len)

    def _make_utterance(self, index: int):
        out = self.utterance_inputs(index)
        clean, noise_wav, key, utt_len = out[:4]
        # separate-utterance enrollment rides alongside for the
        # piece/eval path (predict.py fetches it via enroll_for_item)
        self._last_enroll = out[4] if len(out) > 4 else None
        mix, source, noise = self.pipeline(
            key, jnp.asarray(clean), jnp.asarray(noise_wav),
            self.snr_low, self.snr_high, utt_len,
            augment=self.do_augment, noise=self.do_noise)
        return (np.asarray(mix), np.asarray(source), np.asarray(noise), utt_len)

    def enroll_for_item(self, index: int, mode: str,
                        enroll_len: int) -> np.ndarray:
        """Eval-time enrollment for the item just produced by
        ``self[index]`` (test split maps 1:1 to utterances).

        mode "separate": the sibling drawn inside utterance_inputs.
        mode "nontarget": a DIFFERENT speaker's utterance (negative
        control — a conditioned model that truly uses identity must get
        WORSE here than with the matched enrollment), drawn from a
        dedicated rng stream keyed on the item index."""
        if mode == "separate":
            assert getattr(self, "_last_enroll", None) is not None, (
                "separate enrollment needs enroll_mode=separate and a "
                "spk-keyed manifest")
            out = np.zeros(enroll_len, np.float32)
            n = min(len(self._last_enroll), enroll_len)
            out[:n] = self._last_enroll[:n]
            return out
        assert mode == "nontarget", mode
        # ADVICE r4: fail with a clear message (not an unguarded
        # KeyError / infinite rejection loop) when the manifest can't
        # support the negative control
        spk = self.all_csv[self.dataset].get("clean_spk")
        assert spk is not None, (
            "nontarget enrollment needs a spk-keyed manifest "
            "(clean CSV with a spk column)")
        assert len(set(spk)) >= 2, (
            "nontarget enrollment needs >= 2 speakers in the manifest")
        tgt = self._last_clean_idx[0]
        rng = np.random.default_rng(np.random.SeedSequence(
            [self.seed, self.epoch, index, 0xE960]))
        while True:
            i = int(rng.integers(len(spk)))
            if spk[i] != spk[tgt]:
                break
        wav = self._read_cached(self.all_csv[self.dataset]["clean"][i])
        out = np.zeros(enroll_len, np.float32)
        n = min(len(wav), enroll_len)
        out[:n] = wav[:n]
        return out

    def _bucket(self, n: int) -> int:
        return max(16000, (n // 8000) * 8000)

    def _split_to_buffer(self, mix, source, noise, utt_len, rng):
        """Piece protocol (data_c.py:155-178) with FIFO + tiling cursor."""
        if self.dataset == "test":
            n = self._bucket(utt_len)
            self.buffer.append((mix[:, :n], source[:, :, :n], noise[:, :n],
                                n, False))
            return
        start = 0
        first = True
        while start < utt_len:
            want = int(rng.integers(16000, self.max_length))
            end = min(utt_len, start + want)
            if end - start < 16000:
                break
            n = self._bucket(end - start)
            end = start + n
            if end > utt_len:
                break
            self.buffer.append((mix[:, start:end], source[:, :, start:end],
                                noise[:, start:end], n, not first))
            start = end
            first = False

    def __getitem__(self, index: int) -> dict:
        # distinct stream from _make_utterance's content rng (same seed
        # would replay identical draws for piece lengths)
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, index, 0x5EED]))
        while not self.buffer:
            mix, source, noise, utt_len = self._make_utterance(index)
            self._split_to_buffer(mix, source, noise, utt_len, rng)
            index += 1  # advance so a rejected utterance isn't resampled
        mix, source, noise, length, flag = self.buffer.pop(0)
        return {
            "mix": mix[None],                     # [1, M, L]
            "source": source[None],               # [1, spk, M, L]
            "length": np.asarray([length]),       # [1]
            "noise": noise[None],                 # [1, M, L]
            "flag": flag,
        }

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self[i]
