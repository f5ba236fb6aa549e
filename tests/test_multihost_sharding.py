"""Multi-host input sharding (SURVEY §5.8; reference DistributedSampler
analog, train.py:170-174 — commented out upstream).

Each host's sampler maps its local item counter onto the global
deterministic per-index rng chain as ``global = local * process_count
+ process_index``. These tests simulate two hosts on one machine and
pin: (a) the per-host shards are exactly the even/odd interleave of
the serial order, so their union covers the epoch with no overlap;
(b) dev samplers stay replicated via explicit process_count=1.
"""

import copy

import numpy as np

from tests.test_trainer import TINY_CONFIG


def _collect_keys(sampler, n_calls):
    keys = []
    try:
        for _ in range(n_calls):
            inp = sampler.next_batch()
            keys.append(np.asarray(inp["key"]).reshape(-1, 2))
    finally:
        sampler.close()
    return np.concatenate(keys)


def test_utterance_sampler_two_host_shards_interleave_serial():
    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.train.utterance import UtteranceBatchSampler

    cfg = copy.deepcopy(TINY_CONFIG)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("train", augment=False)
    ds.init_seed(1)

    # serial order: global indices 0..7
    serial = _collect_keys(
        UtteranceBatchSampler(ds, batch=2, k_batches=2,
                              process_index=0, process_count=1), 2)
    host0 = _collect_keys(
        UtteranceBatchSampler(ds, batch=2, k_batches=1,
                              process_index=0, process_count=2), 2)
    host1 = _collect_keys(
        UtteranceBatchSampler(ds, batch=2, k_batches=1,
                              process_index=1, process_count=2), 2)

    np.testing.assert_array_equal(host0, serial[0::2])
    np.testing.assert_array_equal(host1, serial[1::2])
    # shards are disjoint (keys are 31-bit draws; collision over 8 items
    # would be astronomically unlikely and would indicate overlap)
    k0 = {tuple(k) for k in host0}
    k1 = {tuple(k) for k in host1}
    assert not k0 & k1


def test_device_stream_sampler_shards_utterance_stream():
    """DeviceStreamSampler on host 1 of 2 consumes global indices
    1, 3, 5, ... — its first utterance equals utterance_inputs(1)."""
    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.data.device_stream import DeviceStreamSampler

    cfg = copy.deepcopy(TINY_CONFIG)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("train", augment=False)
    ds.init_seed(1)

    expect_key = ds.utterance_inputs(1)[2]

    sampler = DeviceStreamSampler(ds, num_streams=1, piece_length=4000,
                                  lead=1600, process_index=1,
                                  process_count=2)
    try:
        got = next(sampler._inputs)
        np.testing.assert_array_equal(np.asarray(got[2]),
                                      np.asarray(expect_key))
    finally:
        sampler.close()


def test_default_process_args_are_single_host_here():
    """In this 1-host environment the defaults must reproduce the
    serial order exactly (jax.process_count() == 1)."""
    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.train.utterance import UtteranceBatchSampler

    cfg = copy.deepcopy(TINY_CONFIG)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("train", augment=False)
    ds.init_seed(1)

    default = _collect_keys(UtteranceBatchSampler(ds, batch=2,
                                                  k_batches=2), 1)
    explicit = _collect_keys(
        UtteranceBatchSampler(ds, batch=2, k_batches=2,
                              process_index=0, process_count=1), 1)
    np.testing.assert_array_equal(default, explicit)
