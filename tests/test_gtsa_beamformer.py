"""GTSA and GeneralBeamformer/MVDR tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.models.beamformer import GeneralBeamformer, MVDRBeamformer, _unfold3x3
from semi_tpu.models.gtsa import GTSA

GTSA_CFG = dict(num_mics=3, num_freqs=201, segment_length=3200, num_layers=2,
                num_heads=4, time_dim=21, fn_dim=64, maxlen=42)

GB_CFG = dict(num_channels=[8, 8], num_freqs=201, hidden=16,
              segment_length=3200, num_layers=1, num_inputs=3, kernel_size=3)


def test_gtsa_accepts_reference_config_keys():
    """The reference YAML's time_dim key must not break construction
    (config repair, SURVEY.md §2.5)."""
    m = GTSA(**GTSA_CFG)
    assert len(m.layers) == 2


@pytest.fixture(scope="module")
def gtsa():
    m = GTSA(**GTSA_CFG)
    return m, m.init(jax.random.PRNGKey(0))


def test_gtsa_forward_and_stream(gtsa):
    m, params = gtsa
    st = m.init_state(1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 201, 21, 2))
    y, st2 = m.forward(params, st, x)
    assert y.shape == (1, 201, 21, 2)
    # even layer KV cache batched over channels (B*5), odd over freq (B*201)
    assert st2["layers"][0]["k"].shape[0] == 5 * 3  # heads=3 per split
    assert st2["layers"][1]["k"].shape[0] == 201

    out, _ = m.realtime_process(params, None,
                                jax.random.normal(jax.random.PRNGKey(2),
                                                  (1, 3, 3200)) * 0.1,
                                flag=False)
    assert out.shape == (1, 3200)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gtsa_kv_cache_rolls(gtsa):
    m, params = gtsa
    st = m.init_state(1)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 201, 21, 2))
    _, st1 = m.forward(params, st, x)
    _, st2 = m.forward(params, st1, x)
    k1, k2 = st1["layers"][0]["k"], st2["layers"][0]["k"]
    np.testing.assert_allclose(np.asarray(k2[:, :-21 * 2 + 21]),
                               np.asarray(k1[:, 21:]), atol=0)


def test_unfold3x3_matches_torch():
    import torch
    import torch.nn.functional as tf

    x = np.random.default_rng(0).standard_normal((2, 3, 8, 10)).astype(np.float32)
    ours = np.asarray(_unfold3x3(jnp.asarray(x)))  # [B, C, 9, H, W]
    ref = tf.unfold(torch.from_numpy(x), (3, 3), padding=1)
    ref = ref.reshape(2, 3, 9, 8, 10).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.fixture(scope="module")
def gb():
    m = GeneralBeamformer(**GB_CFG)
    return m, m.init(jax.random.PRNGKey(0))


def test_general_beamformer_stream(gb):
    m, params = gb
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 3200)) * 0.1
    y, st = m.realtime_process(params, None, x, flag=False)
    assert y.shape == (1, 3200)
    assert np.all(np.isfinite(np.asarray(y)))
    assert st["gru_s"]["h"].shape[1] == 201  # B*F sub-batch


def test_mvdr_recovers_speech_direction():
    """MVDR with oracle masks should beat the noisy mixture."""
    rng = np.random.default_rng(0)
    b, c, f, t = 1, 3, 16, 50
    steer = rng.standard_normal((c,)) + 1j * rng.standard_normal((c,))
    speech = rng.standard_normal((b, 1, f, t)) + 1j * rng.standard_normal((b, 1, f, t))
    noise = 0.5 * (rng.standard_normal((b, c, f, t)) +
                   1j * rng.standard_normal((b, c, f, t)))
    spec = speech * steer[None, :, None, None] + noise

    speech_mask = jnp.asarray(np.abs(speech[:, 0]) /
                              (np.abs(speech[:, 0]) + np.abs(noise[:, 0]) + 1e-8),
                              jnp.complex64)
    noise_mask = 1.0 - speech_mask
    mvdr = MVDRBeamformer()
    out = np.asarray(mvdr(speech_mask, noise_mask, jnp.asarray(spec, jnp.complex64)))
    assert out.shape == (b, f, t)

    target = speech[0, 0] * steer[0]
    err_bf = np.mean(np.abs(out[0] - target) ** 2)
    err_noisy = np.mean(np.abs(spec[0, 0] - target) ** 2)
    assert err_bf < err_noisy
