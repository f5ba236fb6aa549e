"""DeviceStreamSampler: bit-equivalence with the host MultiStreamSampler."""

import copy

import numpy as np

from semi_tpu.data.dataset import LibriPartyDataset
from semi_tpu.data.device_stream import DeviceStreamSampler
from semi_tpu.data.stream import MultiStreamSampler
from tests.test_trainer import TINY_CONFIG


def _fresh_dataset():
    cfg = copy.deepcopy(TINY_CONFIG)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("train", augment=False)
    ds.init_seed(1)
    return ds


def test_device_sampler_matches_host_sampler():
    """Same dataset + seed: the device-resident sampler must produce the
    exact batches of the host sampler (same mixer program, same RNG
    chain, same piece/cursor protocol) for several steps spanning
    multiple utterance refills and resets."""
    host = MultiStreamSampler(_fresh_dataset(), num_streams=3,
                              piece_length=8000)
    dev = DeviceStreamSampler(_fresh_dataset(), num_streams=3,
                              piece_length=8000)
    try:
        for step in range(8):
            bh = host.next_batch()
            bd = dev.next_batch()
            np.testing.assert_array_equal(
                np.asarray(bd["reset"]), bh["reset"],
                err_msg=f"reset mismatch at step {step}")
            np.testing.assert_array_equal(
                np.asarray(bd["length"]), bh["length"])
            np.testing.assert_allclose(
                np.asarray(bd["mix"]), bh["mix"], rtol=0, atol=0,
                err_msg=f"mix mismatch at step {step}")
            np.testing.assert_allclose(
                np.asarray(bd["source"]), bh["source"], rtol=0, atol=0,
                err_msg=f"source mismatch at step {step}")
    finally:
        dev.close()


def test_device_sampler_lead_in():
    dev = DeviceStreamSampler(_fresh_dataset(), num_streams=2,
                              piece_length=8000, lead=1600)
    try:
        b = dev.next_batch()
        assert np.all(np.asarray(b["reset"]))
        assert np.all(np.asarray(b["mix"])[:, :, :1600] == 0)
        assert np.all(np.asarray(b["source"])[:, :1600] == 0)
    finally:
        dev.close()
