"""HiFi-GAN trainer smoke: one tiny epoch per stage on synthetic data."""

import copy
import os

import numpy as np
import pytest
import yaml

from tests.test_trainer import TINY_CONFIG


@pytest.fixture()
def gan_config(tmp_path):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["config"]["checkpoint_dir"] = str(tmp_path / "modules")
    cfg["config"]["log_dir"] = str(tmp_path / "log")
    cfg["config"]["train_epoch_size"] = 2
    cfg["config"]["avg_step"] = 1
    cfg["Hifi_GAN"] = {
        "nffts": [400, 800], "n_mels": 80, "num_channels": [4, 8, 8, 8],
        "num_freqs": 201, "hidden": 16, "segment_length": 3200,
        "num_layers": 1, "num_inputs": 3, "kernel_size": 3,
        "sample_rate": 16000, "win_length": 25, "hop_length": 10,
        "n_fft": 400,
    }
    for s in (1, 2, 3):
        cfg[f"stage{s}"] = {"num_epoch": 1, "lr": 3e-4, "n_warm_steps": 100}
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p), cfg


def test_stage1_then_warmstart_stage3(gan_config):
    from semi_tpu.train.gan import GanProcessor

    path, cfg = gan_config
    proc = GanProcessor(path, user_defined_name="g")
    proc.train(stage=1, resume=False)
    ckpt = os.path.join(cfg["config"]["checkpoint_dir"], "stage1", "g",
                        "Hifi_GAN.npz")
    assert os.path.exists(ckpt)

    proc3 = GanProcessor(path, user_defined_name="g")
    proc3.train(stage=2, resume=False, load_model=True)
    assert os.path.exists(os.path.join(cfg["config"]["checkpoint_dir"],
                                       "stage2", "g", "Hifi_GAN.npz"))


def test_utterance_mode_stages(gan_config, tmp_path):
    """Round-3 fused multi-stream GAN training: stage 1 and stage 3 run
    through make_gan_utterance_step (B streams, K batches per dispatch),
    params update, per-stage checkpoints written."""
    from semi_tpu.train.gan import GanProcessor

    path, cfg = gan_config
    cfg = copy.deepcopy(cfg)
    cfg["config"]["train_epoch_size"] = 2
    cfg["config"]["eval_epoch_size"] = 2
    cfg["config"]["mix_length"] = 16000
    for s in (1, 2, 3):
        cfg[f"stage{s}"]["batch_streams"] = 2
        cfg[f"stage{s}"]["k_batches"] = 1
    p = tmp_path / "config_utt.yaml"
    p.write_text(yaml.safe_dump(cfg))

    proc = GanProcessor(str(p), user_defined_name="gu")
    proc.train(stage=1, resume=False)
    s1 = os.path.join(cfg["config"]["checkpoint_dir"], "stage1", "gu",
                      "Hifi_GAN.npz")
    assert os.path.exists(s1)

    proc3 = GanProcessor(str(p), user_defined_name="gu")
    proc3.train(stage=3, resume=False, load_model=False)
    assert os.path.exists(os.path.join(cfg["config"]["checkpoint_dir"],
                                       "stage3", "gu", "Hifi_GAN.npz"))

def test_utterance_mode_midepoch_ckpt_and_resume(gan_config, tmp_path):
    """ckpt_every_steps in the fused GAN engine: a mid-epoch kill loses
    at most ckpt_every_steps items — Step.json marks the partial epoch,
    optimizer.npz restores both optimizer states, and resume re-enters
    the epoch at the recorded item and completes it."""
    from semi_tpu.train.gan import GanProcessor

    path, cfg = gan_config
    cfg = copy.deepcopy(cfg)
    cfg["config"]["checkpoint_dir"] = str(tmp_path / "modules_mid")
    cfg["config"]["log_dir"] = str(tmp_path / "log_mid")
    cfg["config"]["train_epoch_size"] = 4
    cfg["config"]["eval_epoch_size"] = 2
    cfg["config"]["mix_length"] = 16000
    cfg["config"]["ckpt_every_steps"] = 2  # every fused call (k*b=2)
    for s in (1, 2, 3):
        cfg[f"stage{s}"]["batch_streams"] = 2
        cfg[f"stage{s}"]["k_batches"] = 1
    p = tmp_path / "config_mid.yaml"
    p.write_text(yaml.safe_dump(cfg))

    proc = GanProcessor(str(p), user_defined_name="gm")
    # simulate a crash after the first fused call: run one epoch but
    # kill via a sampler that raises after the first next_batch
    import semi_tpu.train.gan as gan_mod

    orig = gan_mod.UtteranceBatchSampler if hasattr(
        gan_mod, "UtteranceBatchSampler") else None

    class _Boom(RuntimeError):
        pass

    from semi_tpu.train import utterance as utt_mod

    real_next = utt_mod.UtteranceBatchSampler.next_batch
    calls = {"n": 0}

    def boom_next(self):
        if calls["n"] >= 1:
            raise _Boom("simulated crash")
        calls["n"] += 1
        return real_next(self)

    utt_mod.UtteranceBatchSampler.next_batch = boom_next
    try:
        with pytest.raises(_Boom):
            proc.train(stage=1, resume=False)
    finally:
        utt_mod.UtteranceBatchSampler.next_batch = real_next
    del orig

    d = os.path.join(cfg["config"]["checkpoint_dir"], "stage1", "gm")
    assert os.path.exists(os.path.join(d, "Step.json"))
    assert os.path.exists(os.path.join(d, "optimizer.npz"))

    # resume: re-enters the partial epoch at item 2 and completes
    proc2 = GanProcessor(str(p), user_defined_name="gm")
    proc2.train(stage=1, resume=True)
    assert not os.path.exists(os.path.join(d, "Step.json"))
    import json

    with open(os.path.join(d, "Epoch.json")) as f:
        counters = json.load(f)
    assert counters["Epoch"] == 0
    # full epoch = 4 items = 2 fused calls of k=1 steps each; the crash
    # consumed 1 call, resume must add only the remaining one
    assert counters["Train_Step"] == 2


def test_fused_warmup_counts_utterances(gan_config, tmp_path):
    """Regimen fidelity: the reference's NoamScheduler steps once per
    UTTERANCE (Hifi-GAN/train.py:212-217, batch_size=1), so n_warm_steps
    is an utterance count. The fused engine consumes batch_streams
    utterances per optimizer step and must shrink the warmup horizon by
    that factor (gan.py n_warm_eff) — the un-scaled horizon left stage 2
    at the warmup-floor LR for the whole run (near-identity generator)."""
    import copy as _copy

    import yaml as _yaml

    from semi_tpu.train import gan as gan_mod
    from semi_tpu.train.gan import GanProcessor

    path, cfg = gan_config
    cfg = _copy.deepcopy(cfg)
    cfg["stage1"].update({"batch_streams": 4, "k_batches": 1,
                          "n_warm_steps": 100})
    cfg["config"]["mix_length"] = 16000
    p = tmp_path / "warm.yaml"
    p.write_text(_yaml.safe_dump(cfg))

    seen = {}
    real = GanProcessor._train_utterance

    def spy(self, stage, params, g_opt, d_opt, b, k, lr, n_warm, *a, **kw):
        seen["n_warm"] = n_warm
        seen["b"] = b
        return None  # skip the actual run

    gan_mod.GanProcessor._train_utterance = spy
    try:
        GanProcessor(str(p), user_defined_name="w").train(stage=1,
                                                          resume=False)
    finally:
        gan_mod.GanProcessor._train_utterance = real

    assert seen["b"] == 4
    assert seen["n_warm"] == 100 // 4
