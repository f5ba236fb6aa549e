"""Trainer integration tests: train a tiny CRN a few steps on synthetic
data, verify loss finiteness, checkpoint/resume roundtrip, plateau
scheduler, and the predict harness."""

import copy
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.train.optim import noam_lr, plateau_init, plateau_step

TINY_CONFIG = {
    "config": {"sample_rate": 16000, "spk_num": 1, "seed": 0,
               "max_grad_norm": 5, "max_length": 24000, "mix_length": 32000,
               "avg_step": 2, "checkpoint_dir": None, "log_dir": None,
               "train_epoch_size": 3, "eval_epoch_size": 2},
    "dataset": {},
    "augment": {
        "addnoise": {"mix_prob": 1.0, "snr_low": -5, "snr_high": 25},
        "freqmask": {"drop_prob": 0.5},
        "timemask": {"drop_prob": 0.5},
        "clip": {"clip_low": 0.5, "clip_high": 1.0, "clip_prob": 0.5},
        "multichannel": {
            "room_limit": [[3, 3, 2.5], [4, 5, 3]],
            "t60_limit": [0.2, 1.0],
            "beta_limit": [[0.5] * 6, [1.0] * 6],
            "array_limit": [[0.1, 0.1, 0.2], [0.9, 0.9, 0.7]],
            "mic_limit": [[0.06, 0.06, 0.06], [0.15, 0.15, 0.15]],
            "source_limit": [[0.0, 0.0, 0.3], [1.0, 1.0, 0.7]],
            "num_src": 1, "num_mic": 3, "fs": 16000,
        },
    },
    "model": {"batch_size": 1},
    "denoise": {"batch_size": 1, "num_epoch": 1, "gradient_accumulation": 2,
                "lr": 3e-4, "n_warm_steps": 100, "num_workers": 0,
                "model_dim": 16, "num_mic": 3},
    "TemporalCRN": {
        "num_channels": [4, 8], "num_freqs": 201, "hidden": 16,
        "segment_length": 3200, "num_layers": 1, "num_inputs": 3,
        "kernel_size": 3, "sample_rate": 16000, "win_length": 25,
        "hop_length": 10, "n_fft": 400,
    },
}


@pytest.fixture()
def config(tmp_path):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["config"]["checkpoint_dir"] = str(tmp_path / "modules")
    cfg["config"]["log_dir"] = str(tmp_path / "log")
    return cfg


def _write_config(cfg, tmp_path):
    import yaml

    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_train_epoch_and_resume(config, tmp_path):
    from semi_tpu.train.processor import Processor

    path = _write_config(config, tmp_path)
    proc = Processor("TemporalCRN", path, user_defined_name="t")
    proc.train(stage=0, resume=False)
    assert proc.epoch == 0
    assert np.isfinite(proc.last_loss)
    ckpt_dir = os.path.join(config["config"]["checkpoint_dir"], "denoise", "t")
    assert os.path.exists(os.path.join(ckpt_dir, "TemporalCRN.npz"))
    assert os.path.exists(os.path.join(ckpt_dir, "optimizer.npz"))
    assert os.path.exists(os.path.join(ckpt_dir, "Epoch.json"))

    # resume continues from epoch+1
    cfg2 = copy.deepcopy(config)
    cfg2["denoise"]["num_epoch"] = 2
    path2 = _write_config(cfg2, tmp_path)
    proc2 = Processor("TemporalCRN", path2, user_defined_name="t")
    proc2.train(stage=0, resume=True)
    assert proc2.epoch == 1


def test_resume_warm_start_without_optimizer(config, tmp_path):
    """A weights-only checkpoint (<Model>.npz + Epoch.json, no
    optimizer.npz — the shape this repo commits) must still resume:
    warm-start with a fresh optimizer, step realigned to Train_Step."""
    from semi_tpu.train.processor import Processor

    path = _write_config(config, tmp_path)
    proc = Processor("TemporalCRN", path, user_defined_name="w")
    proc.train(stage=0, resume=False)
    ckpt_dir = os.path.join(config["config"]["checkpoint_dir"], "denoise", "w")
    os.remove(os.path.join(ckpt_dir, "optimizer.npz"))
    saved = proc._final_ts.params

    cfg2 = copy.deepcopy(config)
    cfg2["denoise"]["num_epoch"] = 2
    path2 = _write_config(cfg2, tmp_path)
    proc2 = Processor("TemporalCRN", path2, user_defined_name="w")
    # resume must start FROM the committed weights (not re-init) ...
    import semi_tpu.train.processor as proc_mod

    orig_load = proc_mod.Processor.load_modules

    def spy(self, stage_name, ts):
        out = orig_load(self, stage_name, ts)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), out.params, saved)
        assert max(jax.tree.leaves(diffs)) == 0
        assert int(out.step) == self.train_step_count
        return out

    proc_mod.Processor.load_modules = spy
    try:
        proc2.train(stage=0, resume=True)
    finally:
        proc_mod.Processor.load_modules = orig_load
    # ... and continue the epoch plan as a normal resume would
    assert proc2.epoch == 1
    assert np.isfinite(proc2.last_loss)


def test_reset_best_dev_rearms_gate(config, tmp_path):
    """Fine-tuning at a new operating point (e.g. a narrowed SNR range)
    makes the logged best-dev incomparable: if the old best is
    unbeatable under the new dev distribution, weights would NEVER be
    saved. `denoise.reset_best_dev: true` re-arms the gate on resume."""
    import json

    from semi_tpu.train.processor import Processor

    path = _write_config(config, tmp_path)
    Processor("TemporalCRN", path, user_defined_name="r").train(
        stage=0, resume=False)
    d = os.path.join(config["config"]["checkpoint_dir"], "denoise", "r")
    wpath = os.path.join(d, "TemporalCRN.npz")

    def tamper():
        with open(os.path.join(d, "Epoch.json")) as f:
            c = json.load(f)
        c["Last_Loss"] = -1e9  # an unbeatably good logged best
        with open(os.path.join(d, "Epoch.json"), "w") as f:
            json.dump(c, f)

    # without the flag: the gate never fires, weights stay stale
    tamper()
    before = open(wpath, "rb").read()
    cfg2 = copy.deepcopy(config)
    cfg2["denoise"]["num_epoch"] = 2
    proc2 = Processor("TemporalCRN", _write_config(cfg2, tmp_path),
                      user_defined_name="r")
    proc2.train(stage=0, resume=True)
    assert proc2.last_loss == -1e9
    assert open(wpath, "rb").read() == before

    # with the flag: first dev epoch saves, last_loss becomes real
    tamper()
    cfg3 = copy.deepcopy(config)
    cfg3["denoise"]["num_epoch"] = 3
    cfg3["denoise"]["reset_best_dev"] = True
    proc3 = Processor("TemporalCRN", _write_config(cfg3, tmp_path),
                      user_defined_name="r")
    proc3.train(stage=0, resume=True)
    assert np.isfinite(proc3.last_loss) and proc3.last_loss > -1e9
    assert open(wpath, "rb").read() != before


def test_params_change_during_training(config, tmp_path):
    from semi_tpu.train.processor import Processor

    path = _write_config(config, tmp_path)
    proc = Processor("TemporalCRN", path, user_defined_name="u")
    p0 = proc.model.init(jax.random.PRNGKey(0))
    proc.train(stage=0, resume=False)
    p1 = proc._final_ts.params
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, p1)
    assert max(jax.tree.leaves(diffs)) > 0


def test_plateau_scheduler():
    st = plateau_init(1e-3)
    st = plateau_step(st, 1.0)   # improves (from inf)
    assert float(st.lr) == pytest.approx(1e-3)
    for _ in range(3):           # 3 bad epochs > patience 2
        st = plateau_step(st, 2.0)
    assert float(st.lr) == pytest.approx(5e-4)
    st2 = plateau_init(1e-7)
    for _ in range(10):
        st2 = plateau_step(st2, 1.0) if float(st2.best) == np.inf else \
            plateau_step(st2, 2.0)
    assert float(st2.lr) >= 1e-7  # min_lr floor


def test_noam_lr_peaks_at_warmup():
    lr_initial, warm = 3e-4, 100
    lrs = [float(noam_lr(s, lr_initial, warm)) for s in (1, 50, 100, 200, 400)]
    assert lrs[2] == pytest.approx(lr_initial, rel=1e-5)
    assert lrs[0] < lrs[1] < lrs[2] and lrs[2] > lrs[3] > lrs[4]


def test_predict_harness(config, tmp_path, capsys):
    from predict import predict

    path = _write_config(config, tmp_path)
    res = predict(path, "TemporalCRN", "nonexistent", num_items=2)
    # rtf may be 0 when every item length was a fresh compile
    assert np.isfinite(res["rtf"]) and res["rtf"] >= 0
    assert np.isfinite(res["a_sisdr"]) and np.isfinite(res["b_stoi"])


def test_step_level_checkpoint_and_restart(config, tmp_path):
    """Mid-epoch checkpoints allow crash-restart (SURVEY §5.3)."""
    from semi_tpu.train.processor import Processor

    cfg = copy.deepcopy(config)
    cfg["config"]["ckpt_every_steps"] = 2
    path = _write_config(cfg, tmp_path)
    proc = Processor("TemporalCRN", path, user_defined_name="s")
    proc.train(stage=0, resume=False)
    d = os.path.join(cfg["config"]["checkpoint_dir"], "denoise", "s")
    # Step.json removed after the epoch completed normally
    assert not os.path.exists(os.path.join(d, "Step.json"))
    assert os.path.exists(os.path.join(d, "TemporalCRN.npz"))

    # simulate a crash mid-epoch: write Step.json and resume
    import json
    with open(os.path.join(d, "Step.json"), "w") as f:
        json.dump({"Step_In_Epoch": 2}, f)
    cfg2 = copy.deepcopy(cfg)
    cfg2["denoise"]["num_epoch"] = 1
    path2 = _write_config(cfg2, tmp_path)
    proc2 = Processor("TemporalCRN", path2, user_defined_name="s")
    proc2.train(stage=0, resume=True)  # re-enters the partial epoch
    assert proc2.epoch == 0
    assert not os.path.exists(os.path.join(d, "Step.json"))
