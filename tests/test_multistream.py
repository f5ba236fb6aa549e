"""Multi-stream batched training: per-stream state isolation and reset
equivalence with independent single-stream runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.models.crn import TemporalCRN

CFG = dict(num_channels=[4, 8], num_freqs=201, hidden=16,
           segment_length=3200, num_layers=1, num_inputs=3, kernel_size=3)


@pytest.fixture(scope="module")
def model():
    m = TemporalCRN(**CFG)
    return m, m.init(jax.random.PRNGKey(0))


def test_batched_streams_match_independent_runs(model):
    """Two batched streams == the same two streams run separately,
    including a mid-run reset of only one stream."""
    m, params = model
    p = 4800
    xa = jax.random.normal(jax.random.PRNGKey(1), (2, 3, p)) * 0.1  # stream A pieces
    xb = jax.random.normal(jax.random.PRNGKey(2), (2, 3, p)) * 0.1  # stream B pieces

    # batched: step 1 both fresh; step 2 stream A continues, B resets
    st = m.init_state(2)
    mix1 = jnp.stack([xa[0], xb[0]])
    y1, st = m.realtime_process_batched(params, st, mix1,
                                        jnp.asarray([True, True]))
    mix2 = jnp.stack([xa[1], xb[1]])
    y2, st = m.realtime_process_batched(params, st, mix2,
                                        jnp.asarray([False, True]))

    # independent single-stream references (reset handled via mask too)
    def single(piece, state, reset):
        return m.realtime_process_batched(
            params, state, piece[None], jnp.asarray([reset]))

    sa = m.init_state(1)
    ya1, sa = single(xa[0], sa, True)
    ya2, sa = single(xa[1], sa, False)
    sb = m.init_state(1)
    yb1, sb = single(xb[0], sb, True)
    yb2, sb = single(xb[1], sb, True)  # B resets before its second piece

    np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(ya1[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(y1[1]), np.asarray(yb1[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(y2[0]), np.asarray(ya2[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(y2[1]), np.asarray(yb2[0]), atol=3e-5)


def test_batched_matches_flag_runtime(model):
    """reset_mask=[True]*B on lead-in-prepended audio == the flag=False
    runtime's output after its warm-up trim."""
    m, params = model
    lead = m.segment_length // 2
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 6400)) * 0.1
    y_flag, _ = m.realtime_process(params, None, x, flag=False)

    x_lead = jnp.concatenate([jnp.zeros((1, 3, lead)), x], axis=-1)
    y_b, _ = m.realtime_process_batched(params, m.init_state(1), x_lead,
                                        jnp.asarray([True]))
    np.testing.assert_allclose(np.asarray(y_b[0, lead:]),
                               np.asarray(y_flag[0]), atol=3e-5)


def test_multistream_sampler():
    from semi_tpu.data.stream import MultiStreamSampler
    from tests.test_trainer import TINY_CONFIG
    import copy

    from semi_tpu.data.dataset import LibriPartyDataset

    cfg = copy.deepcopy(TINY_CONFIG)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("train", augment=False)
    sampler = MultiStreamSampler(ds, num_streams=3, piece_length=8000)
    b1 = sampler.next_batch()
    assert b1["mix"].shape == (3, 3, 8000)
    assert b1["source"].shape == (3, 8000)
    assert np.all(b1["reset"])  # all streams fresh at the start
    b2 = sampler.next_batch()
    # streams long enough continue; mixes differ step to step
    assert not np.allclose(b1["mix"], b2["mix"])
    # lead-in: each fresh stream's first samples are the warm-up zeros
    assert np.all(b1["mix"][:, :, :1600] == 0)


def test_batched_train_step():
    from semi_tpu.train.step import init_train_state, make_batched_train_step

    m = TemporalCRN(**CFG)
    params = m.init(jax.random.PRNGKey(0))
    ts = init_train_state(params, 3e-4)
    step = jax.jit(make_batched_train_step(m, accum_every=2))
    state = m.init_state(2)
    batch = {
        "mix": jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8000)) * 0.1,
        "source": jax.random.normal(jax.random.PRNGKey(2), (2, 8000)) * 0.1,
        "length": jnp.full((2,), 8000, jnp.int32),
        "reset": jnp.asarray([True, False]),
    }
    ts, state, metrics = step(ts, state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # second step with flipped resets uses the SAME compiled program
    batch["reset"] = jnp.asarray([False, True])
    ts, state, metrics = step(ts, state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_processor_batched_mode(tmp_path):
    """The Processor trains in multi-stream mode via denoise.batch_streams."""
    import copy
    import yaml

    from semi_tpu.train.processor import Processor
    from tests.test_trainer import TINY_CONFIG

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["config"]["checkpoint_dir"] = str(tmp_path / "m")
    cfg["config"]["log_dir"] = str(tmp_path / "l")
    cfg["config"]["train_epoch_size"] = 4
    cfg["denoise"]["batch_streams"] = 2
    cfg["denoise"]["stream_piece_length"] = 8000
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    proc = Processor("TemporalCRN", str(p), user_defined_name="ms")
    proc.train(stage=0, resume=False)
    assert proc.epoch == 0
    assert np.isfinite(proc.last_loss)


def test_fullsubnet_batched_streams():
    from semi_tpu.models.fullsubnet import FullSubNet

    m = FullSubNet(num_freqs=201, look_ahead=0, sequence_model="LSTM",
                   fb_num_neighbors=0, sb_num_neighbors=15,
                   fb_output_activate_function="ReLU",
                   sb_output_activate_function=False,
                   fb_model_hidden_size=24, sb_model_hidden_size=16,
                   num_mics=3, num_layers=1, segment_length=3200)
    params = m.init(jax.random.PRNGKey(0))
    p = 4800
    xa = jax.random.normal(jax.random.PRNGKey(1), (2, 3, p)) * 0.1
    xb = jax.random.normal(jax.random.PRNGKey(2), (2, 3, p)) * 0.1

    st = m.init_state(2)
    y1, st = m.realtime_process_batched(
        params, st, jnp.stack([xa[0], xb[0]]), jnp.asarray([True, True]))
    y2, st = m.realtime_process_batched(
        params, st, jnp.stack([xa[1], xb[1]]), jnp.asarray([False, True]))

    sa = m.init_state(1)
    _, sa = m.realtime_process_batched(params, sa, xa[0][None],
                                       jnp.asarray([True]))
    ya2, _ = m.realtime_process_batched(params, sa, xa[1][None],
                                        jnp.asarray([False]))
    sb = m.init_state(1)
    _, sb = m.realtime_process_batched(params, sb, xb[0][None],
                                       jnp.asarray([True]))
    yb2, _ = m.realtime_process_batched(params, sb, xb[1][None],
                                        jnp.asarray([True]))

    np.testing.assert_allclose(np.asarray(y2[0]), np.asarray(ya2[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(y2[1]), np.asarray(yb2[0]), atol=3e-5)


def test_gtsa_batched_streams():
    """GTSA per-stream isolation: batched == independent runs, including
    a mid-run reset of only one stream (KV caches fold channels/freqs
    and heads into the batch axis — the expanded reset masks must hit
    exactly the right rows)."""
    from semi_tpu.models.gtsa import GTSA

    m = GTSA(num_mics=3, num_freqs=201, segment_length=3200, num_layers=2,
             fn_dim=32, maxlen=30)
    params = m.init(jax.random.PRNGKey(0))
    p = 4800
    xa = jax.random.normal(jax.random.PRNGKey(1), (2, 3, p)) * 0.1
    xb = jax.random.normal(jax.random.PRNGKey(2), (2, 3, p)) * 0.1

    st = m.init_state(2)
    _, st = m.realtime_process_batched(
        params, st, jnp.stack([xa[0], xb[0]]), jnp.asarray([True, True]))
    y2, st = m.realtime_process_batched(
        params, st, jnp.stack([xa[1], xb[1]]), jnp.asarray([False, True]))

    sa = m.init_state(1)
    _, sa = m.realtime_process_batched(params, sa, xa[0][None],
                                       jnp.asarray([True]))
    ya2, _ = m.realtime_process_batched(params, sa, xa[1][None],
                                        jnp.asarray([False]))
    sb = m.init_state(1)
    _, sb = m.realtime_process_batched(params, sb, xb[0][None],
                                       jnp.asarray([True]))
    yb2, _ = m.realtime_process_batched(params, sb, xb[1][None],
                                        jnp.asarray([True]))

    np.testing.assert_allclose(np.asarray(y2[0]), np.asarray(ya2[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(y2[1]), np.asarray(yb2[0]), atol=3e-5)


def test_beamformer_batched_streams():
    from semi_tpu.models.beamformer import GeneralBeamformer

    m = GeneralBeamformer(num_channels=[4, 8], num_freqs=201, hidden=8,
                          segment_length=3200, num_layers=1, num_inputs=3)
    params = m.init(jax.random.PRNGKey(0))
    p = 4800
    xa = jax.random.normal(jax.random.PRNGKey(1), (2, 3, p)) * 0.1
    xb = jax.random.normal(jax.random.PRNGKey(2), (2, 3, p)) * 0.1

    st = m.init_state(2)
    _, st = m.realtime_process_batched(
        params, st, jnp.stack([xa[0], xb[0]]), jnp.asarray([True, True]))
    y2, st = m.realtime_process_batched(
        params, st, jnp.stack([xa[1], xb[1]]), jnp.asarray([False, True]))

    sa = m.init_state(1)
    _, sa = m.realtime_process_batched(params, sa, xa[0][None],
                                       jnp.asarray([True]))
    ya2, _ = m.realtime_process_batched(params, sa, xa[1][None],
                                        jnp.asarray([False]))
    sb = m.init_state(1)
    _, sb = m.realtime_process_batched(params, sb, xb[0][None],
                                       jnp.asarray([True]))
    yb2, _ = m.realtime_process_batched(params, sb, xb[1][None],
                                        jnp.asarray([True]))

    np.testing.assert_allclose(np.asarray(y2[0]), np.asarray(ya2[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(y2[1]), np.asarray(yb2[0]), atol=3e-5)


def test_hifigan_generator_batched_streams():
    from semi_tpu.models.hifigan import Generator

    # 4 levels: the bottleneck dim hard-codes //16 (hifigan.py:489 parity)
    m = Generator(num_channels=[2, 4, 4, 8], num_freqs=201, hidden=16,
                  segment_length=3200, num_layers=1, num_inputs=3)
    params = m.init(jax.random.PRNGKey(0))
    p = 4800
    xa = jax.random.normal(jax.random.PRNGKey(1), (2, 3, p)) * 0.1
    xb = jax.random.normal(jax.random.PRNGKey(2), (2, 3, p)) * 0.1

    st = m.init_state(2)
    _, _, st = m.realtime_process_batched(
        params, st, jnp.stack([xa[0], xb[0]]), jnp.asarray([True, True]))
    y2, y2pre, st = m.realtime_process_batched(
        params, st, jnp.stack([xa[1], xb[1]]), jnp.asarray([False, True]))

    sa = m.init_state(1)
    _, _, sa = m.realtime_process_batched(params, sa, xa[0][None],
                                          jnp.asarray([True]))
    ya2, ya2pre, _ = m.realtime_process_batched(params, sa, xa[1][None],
                                                jnp.asarray([False]))
    sb = m.init_state(1)
    _, _, sb = m.realtime_process_batched(params, sb, xb[0][None],
                                          jnp.asarray([True]))
    yb2, _, _ = m.realtime_process_batched(params, sb, xb[1][None],
                                           jnp.asarray([True]))

    np.testing.assert_allclose(np.asarray(y2[0]), np.asarray(ya2[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(y2[1]), np.asarray(yb2[0]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(y2pre[0]), np.asarray(ya2pre[0]),
                               atol=3e-5)


def test_processor_rejects_unsupported_batch_streams(tmp_path):
    """batch_streams>1 with a fused-train-loss model fails fast with a
    clear error instead of an AttributeError mid-epoch."""
    import copy
    import yaml

    import pytest

    from semi_tpu.train.processor import Processor
    from tests.test_trainer import TINY_CONFIG

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["config"]["checkpoint_dir"] = str(tmp_path / "m")
    cfg["config"]["log_dir"] = str(tmp_path / "l")
    cfg["denoise"]["batch_streams"] = 2
    # distillation taps need the full 4-level encoder (crn.py:234)
    cfg["TemporalCRN"]["num_channels"] = [2, 2, 4, 4]
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    proc = Processor("DistillationCRN", str(p), user_defined_name="bad")
    with pytest.raises(SystemExit, match="batched runtime"):
        proc.train(stage=0, resume=False)
