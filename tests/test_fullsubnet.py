"""FullSubNet tests: shapes, both execution modes, 4-tuple contract,
norm zoo equivalences."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.models.fullsubnet import (
    FullSubNet, cumulative_laplace_norm, cumulative_layer_norm,
    forgetting_norm, offline_laplace_norm, unfold_subband,
)

CFG = dict(
    num_freqs=201, look_ahead=0, sequence_model="LSTM",
    fb_num_neighbors=0, sb_num_neighbors=15,
    fb_output_activate_function="ReLU", sb_output_activate_function=False,
    fb_model_hidden_size=64, sb_model_hidden_size=48, num_mics=3,
    num_layers=2, segment_length=3200,
)


@pytest.fixture(scope="module")
def model():
    m = FullSubNet(**CFG)
    params = m.init(jax.random.PRNGKey(0))
    return m, params


def test_unfold_matches_torch():
    import torch
    import torch.nn.functional as tf

    x = np.random.default_rng(0).standard_normal((2, 1, 16, 5)).astype(np.float32)
    n = 3
    ours = np.asarray(unfold_subband(jnp.asarray(x), n))
    xt = torch.from_numpy(x).reshape(2, 1, 16, 5)
    padded = tf.pad(xt, [0, 0, n, n], mode="reflect")
    unf = tf.unfold(padded, (2 * n + 1, 5))
    ref = unf.reshape(2, 1, 2 * n + 1, 5, 16).permute(0, 4, 1, 2, 3).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_forward_shapes(model):
    m, params = model
    st = m.init_state(2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 201, 21))
    crm, st2 = m.forward(params, st, x)
    assert crm.shape == (2, 2, 201, 21)
    assert st2["sb"]["h"].shape == (2, 2 * 201, 48)


def test_realtime_modes(model):
    m, params = model
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4800)) * 0.1
    y_eval, _ = m.realtime_process(params, None, x, flag=False, train=False)
    y_train, _ = m.realtime_process(params, None, x, flag=False, train=True)
    assert y_eval.shape == y_train.shape == (1, 4800)
    assert np.all(np.isfinite(np.asarray(y_eval)))
    assert np.all(np.isfinite(np.asarray(y_train)))
    # the two modes differ only through norm/state chunking — correlated
    a, b = np.asarray(y_eval)[0], np.asarray(y_train)[0]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.5


def test_four_tuple_contract(model):
    m, params = model
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 3200)) * 0.1
    src = x * 0.8
    (pred, crm, s, xf), st = m.realtime_process(
        params, None, x, flag=False, source=src, train=False)
    n = pred.shape[-1] // 1600  # chunks
    assert pred.shape == (1, 3200)
    assert crm.shape[2] == 2 and crm.shape[3] == 201
    assert s.shape[2] == 2 and xf.shape[2] == 2
    loss, mae, sisnr = m.compute_loss(src[:, 0], pred, jnp.asarray([3200]),
                                      xf=xf, sf=s, cirm=crm)
    assert np.isfinite(float(loss))


def test_norm_zoo():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.abs(rng.standard_normal((2, 1, 8, 12))).astype(np.float32))
    # offline laplace: mean of output is ~1
    y = offline_laplace_norm(x)
    assert abs(float(jnp.mean(y)) - 1.0) < 1e-3
    # cumulative laplace norm: last frame matches offline when means converge
    yc = cumulative_laplace_norm(x)
    assert yc.shape == x.shape and np.all(np.isfinite(np.asarray(yc)))
    # cumulative layer norm: each prefix is zero-mean
    yl = np.asarray(cumulative_layer_norm(x))
    flat = np.asarray(x).reshape(2, 8, 12)
    t = 5
    pref = flat[:, :, : t + 1]
    mu = pref.reshape(2, -1).mean(-1)
    got = yl.reshape(2, 8, 12)[:, :, t]
    expect = (flat[:, :, t] - mu[:, None]) / (pref.reshape(2, -1).std(-1) + 1e-4)[:, None]
    np.testing.assert_allclose(got, expect, rtol=0.05, atol=0.05)
    # forgetting norm runs and is finite
    yf = forgetting_norm(x[:, 0], 192)
    assert np.all(np.isfinite(np.asarray(yf)))


def test_fullsubnet_param_count(model):
    m, _ = model
    big = FullSubNet(**{**CFG, "fb_model_hidden_size": 512,
                        "sb_model_hidden_size": 384})
    params = big.init(jax.random.PRNGKey(0))
    total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 5e6 < total < 9e6  # reference realtime mod ~6-8M params
