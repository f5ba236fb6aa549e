"""Registry-wide smoke: every registered model builds from the repo's
config.yaml section, streams a 3.2 s clip, continues with flag=True, and
computes a finite loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.models import MODEL_REGISTRY, build_model
from semi_tpu.utils.config import load_config

CONFIG = load_config("config.yaml")

# shrink the expensive dims so CPU smoke stays fast; keys must remain
# valid constructor kwargs
SHRINK = {
    "TemporalCRN": {"num_channels": [4, 8], "hidden": 16, "num_layers": 1},
    "FullSubNet": {"fb_model_hidden_size": 32, "sb_model_hidden_size": 16,
                   "num_layers": 1},
    "GTSA": {"num_layers": 2, "fn_dim": 32, "maxlen": 42},
    "GeneralBeamformer": {"num_channels": [8, 8], "hidden": 16,
                          "num_layers": 1},
    "Complex_TemporalCRN": {"num_channels": [4, 8], "hidden": 16,
                            "num_layers": 1},
    "TemporalCRN_dir": {"num_channels": [4, 8], "hidden": 16,
                        "num_layers": 1},
    "TemporalCRN_spk": {"num_channels": [4, 8], "hidden": 16,
                        "num_layers": 1, "spk_dim": 8,
                        "enroll_len": 3200},
    "TemporalCRN_spk_deep": {"num_channels": [4, 8], "hidden": 16,
                             "num_layers": 1, "spk_dim": 8,
                             "enroll_len": 3200},
    "TemporalCRN_v1": {"num_channels": [4, 8], "hidden": 16,
                       "num_layers": 1},
}


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_model_from_config_streams(name):
    section = dict(CONFIG[name])
    section.update(SHRINK.get(name, {}))
    model = build_model(name, section)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3200)) * 0.1
    if getattr(model, "wants_enroll", False):
        # speaker-conditioned families take mics + 1 enrollment channel
        # (appended by the fused engine / predict.py in production)
        enr = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 3200)) * 0.1
        x = jnp.concatenate([x, enr], axis=1)

    y, state = model.realtime_process(params, None, x, flag=False)
    assert y.shape == (1, 3200)
    assert np.all(np.isfinite(np.asarray(y)))

    # continuation: state threads through
    y2, _ = model.realtime_process(params, state, x, flag=True)
    assert y2.shape == (1, 3200)

    loss, aux, sisnr = model.compute_loss(x[:, 0], y, jnp.asarray([3200]))
    assert np.isfinite(float(loss))
