"""Whole-utterance fused training mode (mix+train in one program)."""

import copy

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from tests.test_trainer import TINY_CONFIG


def test_utterance_step_matches_batched_runtime():
    """The fused program's forward == realtime_process_batched on the
    same mixed audio: loss values agree with a manually mixed batch."""
    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.models.crn import TemporalCRN
    from semi_tpu.train.step import init_train_state
    from semi_tpu.train.utterance import (
        UtteranceBatchSampler, make_utterance_eval_step)

    cfg = copy.deepcopy(TINY_CONFIG)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("train", augment=False)
    ds.init_seed(1)
    m = TemporalCRN(**{k: v for k, v in cfg["TemporalCRN"].items()})
    params = m.init(jax.random.PRNGKey(0))

    sampler = UtteranceBatchSampler(ds, batch=2, k_batches=2)
    try:
        inputs = sampler.next_batch()
    finally:
        sampler.close()
    ev = jax.jit(make_utterance_eval_step(m, ds))
    ms = ev(params, inputs)
    assert ms["loss"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(ms["loss"])))

    # manual reference for batch k=0: same mixer, same lead protocol
    lead = m.segment_length // 2
    mixer = ds.pipeline
    mixes, targets, lengths = [], [], []
    for j in range(2):
        # inputs travel as int16 (utterance.py H2D note): dequantize the
        # same way the fused program does
        mix, source, _ = mixer(
            jnp.asarray(inputs["key"][0, j]),
            jnp.asarray(inputs["clean"][0, j], jnp.float32) / 32768.0,
            jnp.asarray(inputs["noise"][0, j], jnp.float32) / 32768.0,
            ds.snr_low, ds.snr_high,
            augment=ds.do_augment, noise=ds.do_noise)
        mixes.append(jnp.pad(mix, ((0, 0), (lead, 0))))
        targets.append(jnp.pad(source[0, 0], (lead, 0)))
        lengths.append(inputs["utt_len"][0, j] + lead)
    mix_b = jnp.stack(mixes)
    pred, _ = m.realtime_process_batched(
        params, m.init_state(2), mix_b, jnp.ones((2,), bool))
    loss, _, _ = m.compute_loss(jnp.stack(targets), pred,
                                jnp.asarray(lengths))
    # the fused program compiles the mixer inside a different XLA
    # program than the standalone pipeline jit; fusion reassociation
    # moves the FFT-convolution floats by ~1e-3 relative
    np.testing.assert_allclose(float(ms["loss"][0]), float(loss),
                               rtol=3e-3, atol=1e-4)


def test_processor_utterance_mode(tmp_path):
    """End-to-end Processor training in utterance mode: epochs run,
    metrics are finite, best-dev checkpointing works."""
    from semi_tpu.train.processor import Processor

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["config"]["checkpoint_dir"] = str(tmp_path / "m")
    cfg["config"]["log_dir"] = str(tmp_path / "l")
    cfg["config"]["train_epoch_size"] = 4
    cfg["config"]["eval_epoch_size"] = 4
    cfg["denoise"]["batch_streams"] = 2
    cfg["denoise"]["batch_mode"] = "utterance"
    cfg["denoise"]["k_batches"] = 2
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    proc = Processor("TemporalCRN", str(p), user_defined_name="um")
    proc.train(stage=0, resume=False)
    assert proc.epoch == 0
    assert np.isfinite(proc.last_loss)
    import os

    d = tmp_path / "m" / "denoise" / "um"
    assert os.path.exists(d / "TemporalCRN.npz")
