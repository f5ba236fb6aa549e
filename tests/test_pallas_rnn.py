"""Fused 2-layer RNN sequence kernels (ops/pallas/rnn_seq.py):
interpret-mode exactness vs the pure-jnp scan references, and the
FullSubNet use_pallas_rnn inference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.ops.pallas.rnn_seq import (
    gru2_seq, gru2_seq_reference, lstm2_seq, lstm2_seq_reference)


def _weights(key, h, g):
    ks = jax.random.split(key, 6)
    s = 1.0 / np.sqrt(h)
    return [jax.random.uniform(k, shape, minval=-s, maxval=s)
            for k, shape in zip(ks, [(h, g * h), (g * h,), (h, g * h),
                                     (g * h,), (h, g * h), (g * h,)])]


@pytest.mark.parametrize("t,r,h", [(21, 8, 128), (63, 16, 128)])
def test_gru2_seq_interpret_matches_reference(t, r, h):
    key = jax.random.PRNGKey(0)
    w = _weights(key, h, 3)
    gi1 = jax.random.normal(jax.random.PRNGKey(1), (t, r, 3 * h)) * 0.5
    h0 = jax.random.normal(jax.random.PRNGKey(2), (2, r, h)) * 0.5

    y_ref, h_ref = gru2_seq_reference(gi1, *w, h0)
    y, h_last = gru2_seq(gi1, *w, h0, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(h_ref),
                               atol=2e-6)


def test_lstm2_seq_interpret_matches_reference():
    t, r, h = 42, 16, 128
    key = jax.random.PRNGKey(3)
    w = _weights(key, h, 4)
    gi1 = jax.random.normal(jax.random.PRNGKey(4), (t, r, 4 * h)) * 0.5
    h0 = jax.random.normal(jax.random.PRNGKey(5), (2, r, h)) * 0.5
    c0 = jax.random.normal(jax.random.PRNGKey(6), (2, r, h)) * 0.5

    y_ref, h_ref, c_ref = lstm2_seq_reference(gi1, *w, h0, c0)
    y, h_last, c_last = lstm2_seq(gi1, *w, h0, c0, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(h_ref),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(c_last), np.asarray(c_ref),
                               atol=2e-6)


def test_fullsubnet_pallas_rnn_matches_scan(monkeypatch):
    """FullSubNet with use_pallas_rnn: same outputs as the lax.scan path
    (kernel forced to interpret mode on CPU)."""
    import semi_tpu.ops.pallas.rnn_seq as rnn_seq

    from semi_tpu.models.fullsubnet import FullSubNet

    orig_gru, orig_lstm = rnn_seq.gru2_seq, rnn_seq.lstm2_seq
    monkeypatch.setattr(rnn_seq, "gru2_seq",
                        lambda *a, **k: orig_gru(*a, interpret=True))
    monkeypatch.setattr(rnn_seq, "lstm2_seq",
                        lambda *a, **k: orig_lstm(*a, interpret=True))

    kw = dict(num_freqs=201, look_ahead=0, sequence_model="LSTM",
              fb_num_neighbors=0, sb_num_neighbors=15,
              fb_output_activate_function="ReLU",
              sb_output_activate_function=False,
              fb_model_hidden_size=16, sb_model_hidden_size=16,
              num_mics=3, num_layers=2, segment_length=3200)
    m0 = FullSubNet(**kw)
    m1 = FullSubNet(**kw, use_pallas_rnn=True)
    params = m0.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6400)) * 0.1

    y0, _ = m0.realtime_process(params, None, x, flag=False)
    y1, _ = m1.realtime_process(params, None, x, flag=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=3e-5)


class TestAutoGating:
    """``use_pallas="auto"`` resolves by backend + measured win region
    (rnn_seq.pallas_profitable): TPU-only, 2-layer, rows <= 8."""

    def test_resolves_false_on_cpu(self):
        from semi_tpu.ops.pallas.rnn_seq import pallas_profitable

        assert jax.default_backend() == "cpu"
        assert pallas_profitable(1, 2) is False

    def test_win_region_on_tpu(self, monkeypatch):
        import semi_tpu.ops.pallas.rnn_seq as rnn_seq

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert rnn_seq.pallas_profitable(1, 2) is True
        assert rnn_seq.pallas_profitable(8, 2) is True
        # measured loss region / VMEM envelope: many rows stay on scan
        assert rnn_seq.pallas_profitable(32, 2) is False
        assert rnn_seq.pallas_profitable(201, 2) is False
        # only the 2-layer fused form exists
        assert rnn_seq.pallas_profitable(1, 1) is False
        assert rnn_seq.pallas_profitable(1, 3) is False

    def test_auto_is_scan_on_cpu(self):
        """On CPU, "auto" must produce bit-identical values to the scan
        path through the full stacked CRN runtime."""
        from semi_tpu.models.crn import TemporalCRN

        kw = dict(num_channels=[4, 8], num_freqs=201, hidden=16,
                  segment_length=3200, num_layers=2, remat=False)
        m0 = TemporalCRN(**kw)
        m1 = TemporalCRN(**kw, use_pallas_gru="auto")
        params = m0.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6400)) * 0.1
        y0, _ = m0.realtime_process(params, None, x, flag=False)
        y1, _ = m1.realtime_process(params, None, x, flag=False)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
