"""Parallel (stacked-chunk) runtime == chunk-serial scan for every model.

The stacked paths restructure the computation (shifted-context conv
buffers, sliding KV windows, batched projections) without changing
semantics; these tests pin that equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ATOL = 3e-5


@pytest.mark.core
def test_fullsubnet_stacked_equals_serial():
    from semi_tpu.models.fullsubnet import FullSubNet

    m = FullSubNet(num_freqs=201, look_ahead=0, sequence_model="LSTM",
                   fb_num_neighbors=0, sb_num_neighbors=15,
                   fb_output_activate_function="ReLU",
                   sb_output_activate_function=False,
                   fb_model_hidden_size=32, sb_model_hidden_size=24,
                   num_mics=3, num_layers=2, segment_length=3200)
    params = m.init(jax.random.PRNGKey(0))
    mix = jnp.concatenate([jnp.zeros((1, 3, 1600)),
                           jax.random.normal(jax.random.PRNGKey(1),
                                             (1, 3, 6400)) * 0.1], -1)
    spec, _, gap = m.preprocessing(mix)
    st = m.init_state(1)
    crms = []
    for i in range(spec.shape[0]):
        crm, st = m.forward(params, st, spec[i])
        crms.append(crm)
    serial = jnp.stack(crms)
    par, st_p = m.forward_stacked(params, m.init_state(1), spec)
    np.testing.assert_allclose(np.asarray(par), np.asarray(serial), atol=ATOL)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL)


def test_beamformer_stacked_equals_scan():
    from semi_tpu.models.beamformer import GeneralBeamformer

    m = GeneralBeamformer(num_channels=[8, 8], num_freqs=201, hidden=16,
                          segment_length=3200, num_layers=1, num_inputs=3,
                          kernel_size=3)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6400)) * 0.1
    y_scan, st_s = m.realtime_process_scan(params, None, x, flag=False)
    y_par, st_p = m.realtime_process(params, None, x, flag=False)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_scan), atol=ATOL)
    for a, b in zip(jax.tree.leaves(st_s), jax.tree.leaves(st_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL)


def test_gtsa_stacked_equals_scan():
    from semi_tpu.models.gtsa import GTSA

    m = GTSA(num_mics=3, num_freqs=201, segment_length=3200, num_layers=2,
             fn_dim=32, maxlen=42)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6400)) * 0.1
    y_scan, st_s = m.realtime_process_scan(params, None, x, flag=False)
    y_par, st_p = m.realtime_process(params, None, x, flag=False)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_scan), atol=ATOL)
    for a, b in zip(jax.tree.leaves(st_s), jax.tree.leaves(st_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL)


def test_gtsa_stacked_gradients_match():
    """Stacked attention must keep the reference's detached-cache
    gradient semantics (history keys carry no gradient)."""
    from semi_tpu.models.gtsa import GTSA

    m = GTSA(num_mics=3, num_freqs=201, segment_length=3200, num_layers=2,
             fn_dim=32, maxlen=42)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 6400)) * 0.1
    src = x[:, 0] * 0.8

    def loss(fn):
        def f(p):
            yy, _ = fn(p, None, x, False)
            return jnp.mean((yy - src) ** 2)
        return f

    g1 = jax.grad(loss(m.realtime_process_scan))(params)
    g2 = jax.grad(loss(m.realtime_process))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_hifigan_generator_stacked_equals_scan():
    from semi_tpu.models.hifigan import Generator

    m = Generator(num_channels=[4, 8, 8, 8], num_freqs=201, hidden=16,
                  segment_length=3200, num_layers=1, num_inputs=3,
                  kernel_size=3)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6400)) * 0.1
    a_post, a_pre, st_s = m.realtime_process_scan(params, None, x, post=True,
                                                  reset=True)
    b_post, b_pre, st_p = m.realtime_process(params, None, x, post=True,
                                             reset=True)
    np.testing.assert_allclose(np.asarray(b_post), np.asarray(a_post), atol=ATOL)
    np.testing.assert_allclose(np.asarray(b_pre), np.asarray(a_pre), atol=ATOL)
    for a, b in zip(jax.tree.leaves(st_s), jax.tree.leaves(st_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL)
