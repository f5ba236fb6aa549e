"""TemporalCRN end-to-end tests: shapes, param budget, scan==loop,
flag/reset streaming semantics, loss integration, jit + grad."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.models.crn import TemporalCRN

pytestmark = pytest.mark.core

REF_CFG = dict(
    num_channels=[16, 32, 64, 128], num_freqs=201, hidden=512,
    segment_length=3200, num_layers=2, num_inputs=3, kernel_size=3,
)

TINY_CFG = dict(
    num_channels=[4, 8], num_freqs=201, hidden=16,
    segment_length=3200, num_layers=1, num_inputs=3, kernel_size=3,
)


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def tiny():
    model = TemporalCRN(**TINY_CFG)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_param_count_matches_reference():
    """Reference prints 6.16M params for this config (README.md:56)."""
    model = TemporalCRN(**REF_CFG)
    params = model.init(jax.random.PRNGKey(0))
    total = n_params(params)
    assert 5.9e6 < total < 6.4e6, f"{total/1e6:.2f}M params"


def test_forward_shapes(tiny):
    model, params = tiny
    state = model.init_state(2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 201, 21, 2))
    y, state2 = model.forward(params, state, x)
    assert y.shape == (2, 201, 21, 2)
    assert state2["gru"]["h"].shape == state["gru"]["h"].shape


def test_realtime_process_shapes(tiny):
    model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4800)) * 0.1
    y, _ = model.realtime_process(params, None, x, flag=False)
    assert y.shape == (1, 4800)
    assert np.all(np.isfinite(np.asarray(y)))


def test_scan_equals_python_loop(tiny):
    """The lax.scan runtime == an explicit Python chunk loop."""
    model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 6400)) * 0.1
    y_scan, _ = model.realtime_process(params, None, x, flag=False)

    # manual loop replicating the runtime
    pad = jnp.zeros((1, 3, model.segment_length // 2))
    mix = jnp.concatenate([pad, x], axis=-1)
    spec, gap = model.preprocessing(mix)
    st = model.init_state(1)
    preds = []
    for i in range(spec.shape[0]):
        p, st = model.forward(params, st, spec[i])
        preds.append(p)
    y_loop = model.postprocessing(jnp.stack(preds), gap)[..., model.segment_length // 2:]
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_loop), atol=2e-5)


def test_flag_reset_semantics(tiny):
    """flag=False resets: two identical fresh calls match exactly;
    flag=True continues: second segment differs when state differs."""
    model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 3200)) * 0.1
    y1, st1 = model.realtime_process(params, None, x, flag=False)
    y2, _ = model.realtime_process(params, None, x, flag=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=0)

    # continuation with carried state vs fresh state
    y_cont, _ = model.realtime_process(params, st1, x, flag=True)
    assert not np.allclose(np.asarray(y_cont), np.asarray(y2), atol=1e-6)


def test_jit_and_grad(tiny):
    model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 3200)) * 0.1
    src = jax.random.normal(jax.random.PRNGKey(6), (1, 3200)) * 0.1
    length = jnp.asarray([3200])

    @jax.jit
    def loss_fn(p):
        pred, _ = model.realtime_process(p, None, x, flag=False)
        loss, mae, sisnr = model.compute_loss(src, pred, length)
        return loss

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # gradient reaches the encoder convs (not blocked by state detach)
    g0 = np.asarray(grads["convs"][0]["conv"]["w"])
    assert np.abs(g0).max() > 0


def test_parallel_equals_scan_runtime(tiny):
    """The stacked-chunk (parallel) runtime == the chunk-scan runtime in
    values, streaming state, and gradients."""
    model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 6400)) * 0.1
    y_scan, st_s = model.realtime_process_scan(params, None, x, flag=False)
    y_par, st_p = model.realtime_process(params, None, x, flag=False)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_par), atol=2e-5)
    for a, b in zip(jax.tree.leaves(st_s), jax.tree.leaves(st_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    src = x[:, 0] * 0.8

    def loss(fn):
        def f(p):
            yy, _ = fn(p, None, x, False)
            return jnp.mean((yy - src) ** 2)
        return f

    g1 = jax.grad(loss(model.realtime_process_scan))(params)
    g2 = jax.grad(loss(model.realtime_process))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_gru_kernel_interpret():
    """Fused 2-layer GRU kernel == jnp reference (interpret mode)."""
    from semi_tpu.ops.pallas.gru import gru2_chunk, gru2_chunk_reference

    t, b, h = 42, 1, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    gi1 = jax.random.normal(ks[0], (t, b, 3 * h))
    args = [gi1] + [jax.random.normal(k, s) * 0.1 for k, s in zip(ks[1:7], [
        (h, 3 * h), (3 * h,), (h, 3 * h), (3 * h,), (h, 3 * h), (3 * h,)])]
    h0 = jax.random.normal(ks[7], (2, b, h)) * 0.1
    y_ref, h_ref = gru2_chunk_reference(*args, h0)
    y, hf = gru2_chunk(*args, h0, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(h_ref), atol=1e-6)


def test_crn_v1_scan_stacked_equivalence():
    """CRN v1 (ungated ReLU convs, arctan phase, no pre-convs): the
    stacked-parallel runtime must equal the chunk-serial scan, and the
    architecture must differ from the ELU flagship in exactly the v1
    ways (no preconvs, no conv gates)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semi_tpu.models.crn import TemporalCRNv1

    m = TemporalCRNv1(num_channels=[4, 8], num_freqs=201, hidden=16,
                      segment_length=3200, num_layers=1, num_inputs=3)
    assert m.preconvs == []
    params = m.init(jax.random.PRNGKey(0))
    assert params["preconvs"] == []
    assert "gate" not in params["convs"][0]  # ungated plain conv blocks

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9600)) * 0.1
    y_par, st_par = m.realtime_process(params, None, x, flag=False)
    y_scan, st_scan = m.realtime_process_scan(params, None, x, flag=False)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_scan),
                               atol=3e-5)
    for a, b in zip(jax.tree.leaves(st_par), jax.tree.leaves(st_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)

    # continuation: flag=True picks up the carried state
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4800)) * 0.1
    y2_par, _ = m.realtime_process(params, st_par, x2, flag=True)
    y2_scan, _ = m.realtime_process_scan(params, st_scan, x2, flag=True)
    np.testing.assert_allclose(np.asarray(y2_par), np.asarray(y2_scan),
                               atol=3e-5)


def test_crn_v1_registry_and_config():
    """TemporalCRN_v1 is registered and its config.yaml section
    constructs it (keys-are-kwargs contract)."""
    from semi_tpu.models import build_model
    from semi_tpu.utils.config import load_config

    cfg = load_config("config.yaml")
    m = build_model("TemporalCRN_v1", cfg["TemporalCRN_v1"])
    assert m.preconvs == []


def test_crn_bf16_compute_path():
    """compute_dtype=bfloat16: network runs bf16 (state pytree is bf16),
    boundaries stay f32 (pred + master grads), and outputs track the f32
    path within bf16 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semi_tpu.models.crn import TemporalCRN

    kw = dict(num_channels=[4, 8], num_freqs=201, hidden=16,
              segment_length=3200, num_layers=1, num_inputs=3)
    m32 = TemporalCRN(**kw)
    m16 = TemporalCRN(**kw, compute_dtype="bfloat16")
    params = m32.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6400)) * 0.1

    y32, _ = m32.realtime_process(params, None, x, flag=False)
    y16, st16 = m16.realtime_process(params, None, x, flag=False)
    assert y16.dtype == jnp.float32  # f32 boundary at the mask apply
    assert st16["gru"]["h"].dtype == jnp.bfloat16
    # bf16 has ~3 decimal digits; outputs are O(0.1)
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), atol=0.02)

    # gradients flow back to f32 master params through the casts
    def loss_fn(p):
        y, _ = m16.realtime_process(p, None, x, flag=False)
        l, _, _ = m16.compute_loss(x[:, 0], y, jnp.asarray([x.shape[-1]]))
        return l

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_crn_bf16_batched_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semi_tpu.models.crn import TemporalCRN
    from semi_tpu.train.step import init_train_state, make_batched_train_step

    m = TemporalCRN(num_channels=[4, 8], num_freqs=201, hidden=16,
                    segment_length=3200, num_layers=1, num_inputs=3,
                    compute_dtype="bfloat16")
    params = m.init(jax.random.PRNGKey(0))
    ts = init_train_state(params, 3e-4)
    step = jax.jit(make_batched_train_step(m, accum_every=2))
    state = m.init_state(2)
    batch = {
        "mix": jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8000)) * 0.1,
        "source": jax.random.normal(jax.random.PRNGKey(2), (2, 8000)) * 0.1,
        "length": jnp.full((2,), 8000, jnp.int32),
        "reset": jnp.asarray([True, True]),
    }
    ts, state, metrics = step(ts, state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert jax.tree.leaves(ts.params)[0].dtype == jnp.float32


def test_int8_resident_flagship_inference(tiny):
    """The generic predict.py --quantize path: RNN/Linear 2-D weights as
    int8+scale program inputs, dequant compiled into the program. Output
    must stay close to f32 (per-row symmetric int8 error ~0.4% of the
    row max) and some weight leaves must actually be int8-resident."""
    from semi_tpu.ops.quant import dequantize_tree, quantize_tree

    model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 4800)) * 0.1
    y_f32, _ = model.realtime_process(params, None, x, flag=False)

    qparams, mask = quantize_tree(params)
    assert any(mask), "no weight leaf was quantized"
    q_leaves = [l for l in jax.tree.leaves(qparams)
                if hasattr(l, "dtype") and l.dtype == jnp.int8]
    assert q_leaves, "quantized tree holds no int8 leaves"

    run = jax.jit(lambda qp, xx: model.realtime_process(
        dequantize_tree(qp), None, xx, flag=False)[0])
    y_q = run(qparams, x)
    err = float(jnp.linalg.norm(y_q - y_f32) /
                (jnp.linalg.norm(y_f32) + 1e-9))
    assert err < 0.05, f"int8 path diverged: rel err {err:.4f}"


# -- directional variant (beyond-reference, round 3) ---------------------

def test_crn_dir_feature_maps():
    """TemporalCRNDirectional features: cos/sin of the true inter-mic
    phase difference (continuous across the phase wrap, unlike the
    baseline's raw angle difference) plus log-level differences."""
    from semi_tpu.models.crn import TemporalCRNDirectional

    m = TemporalCRNDirectional(num_channels=[4, 8], num_freqs=201,
                               segment_length=3200, hidden=16,
                               num_layers=1, num_inputs=3)
    assert m.feature_channels(3) == 9
    # features() is shape-agnostic in F/T; use a tiny map for the oracle
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 7, 5, 2))
    f = m.features(x)
    assert f.shape == (2, 9, 7, 5)

    ang = np.arctan2(np.asarray(x[..., 1]), np.asarray(x[..., 0]))
    ipd = ang[:, :1] - ang[:, 1:]
    mag = np.sqrt(np.asarray(x[..., 0]) ** 2 + np.asarray(x[..., 1]) ** 2
                  + 1e-10)
    np.testing.assert_allclose(np.asarray(f[:, 0:3]), mag, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f[:, 3:5]), np.cos(ipd), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f[:, 5:7]), np.sin(ipd), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f[:, 7:9]),
                               np.log(mag[:, 1:]) - np.log(mag[:, :1]),
                               atol=1e-4)

    # wrap-continuity: a pure delay near the +/-pi wrap produces smooth
    # cos/sin maps where the raw IPD feature jumps by ~2*pi
    phases = jnp.linspace(3.0, 3.4, 5)  # crosses pi between samples
    ref = jnp.stack([jnp.cos(phases * 0), jnp.sin(phases * 0)], -1)
    lag = jnp.stack([jnp.cos(phases), jnp.sin(phases)], -1)
    x2 = jnp.stack([ref, lag, lag], 0)[None, :, None, :, :]  # [1,3,1,5,2]
    f2 = m.features(x2)
    cosd = np.diff(np.asarray(f2[0, 3, 0]))
    sind = np.diff(np.asarray(f2[0, 5, 0]))
    assert np.all(np.abs(cosd) < 0.2) and np.all(np.abs(sind) < 0.2)
    raw = np.diff(np.unwrap(np.asarray(phases)) * 0 - np.asarray(phases))
    assert np.any(np.abs(np.diff(np.asarray(
        np.arctan2(x2[0, 1, ..., 1], x2[0, 1, ..., 0])[0]))) > 2.0), \
        "fixture should cross the wrap"


def test_crn_dir_scan_stacked_equivalence():
    """Directional variant: the stacked-parallel runtime must equal the
    chunk-serial scan, including continuation state."""
    from semi_tpu.models.crn import TemporalCRNDirectional

    m = TemporalCRNDirectional(num_channels=[4, 8], num_freqs=201,
                               hidden=16, segment_length=3200,
                               num_layers=1, num_inputs=3)
    params = m.init(jax.random.PRNGKey(0))
    assert params["convs"][0]["conv"]["w"].shape[1] == 9  # 4M-3 inputs

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9600)) * 0.1
    y_par, st_par = m.realtime_process(params, None, x, flag=False)
    y_scan, st_scan = m.realtime_process_scan(params, None, x, flag=False)
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_scan),
                               atol=3e-5)

    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4800)) * 0.1
    y2_par, _ = m.realtime_process(params, st_par, x2, flag=True)
    y2_scan, _ = m.realtime_process_scan(params, st_scan, x2, flag=True)
    np.testing.assert_allclose(np.asarray(y2_par), np.asarray(y2_scan),
                               atol=3e-5)


def test_crn_dir_registry_and_config():
    """TemporalCRN_dir is registered; both config.yaml and
    config_dir.yaml sections construct it (keys-are-kwargs)."""
    from semi_tpu.models import build_model
    from semi_tpu.models.crn import TemporalCRNDirectional
    from semi_tpu.utils.config import load_config

    for path in ("config.yaml", "config_dir.yaml"):
        cfg = load_config(path)
        m = build_model("TemporalCRN_dir", cfg["TemporalCRN_dir"])
        assert isinstance(m, TemporalCRNDirectional)
        assert len(m.preconvs) == 3  # flagship geometry kept


def test_crn_dir_trains_and_distills():
    """The directional variant runs the full loss/grad path and exposes
    the distillation taps (it inherits the instrumented runtimes)."""
    from semi_tpu.models.crn import TemporalCRNDirectional

    m = TemporalCRNDirectional(num_channels=[4, 8], num_freqs=201,
                               hidden=16, segment_length=3200,
                               num_layers=1, num_inputs=3)
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6400)) * 0.1
    src = jax.random.normal(jax.random.PRNGKey(2), (1, 6400)) * 0.1
    length = jnp.array([6400])

    def loss_fn(p):
        pred, _ = m.realtime_process(p, None, x, flag=False)
        loss, _, _ = m.compute_loss(src, pred, length)
        return loss

    g = jax.grad(loss_fn)(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(g))

    wav, feats, _ = m.realtime_process_with_features(params, None, x,
                                                     flag=False)
    # taps = last encoder + GRU + all-but-last deconvs (5 at the 4-level
    # reference config; 3 at this 2-level tiny config)
    assert len(feats) == 3 and wav.shape == (1, 6400)


# -- speaker-conditioned variant (beyond-reference, round 3) --------------

SPK_KW = dict(num_channels=[4, 8], num_freqs=201, hidden=16,
              segment_length=3200, num_layers=1, num_inputs=3,
              kernel_size=3)


def _spk_pair():
    from semi_tpu.models.crn import TemporalCRN, TemporalCRNSpk

    base = TemporalCRN(**SPK_KW)
    spk = TemporalCRNSpk(**SPK_KW, spk_dim=16, enroll_len=8000)
    return base, spk


def _spk_mix(b=2, l=9600, el=8000, seed=0):
    rng = np.random.default_rng(seed)
    mix = jnp.asarray(rng.standard_normal((b, 3, l)), jnp.float32) * 0.1
    enr = jnp.zeros((b, 1, l), jnp.float32).at[:, 0, :el].set(
        jnp.asarray(rng.standard_normal((b, el)), jnp.float32) * 0.1)
    return jnp.concatenate([mix, enr], axis=1)


def test_crn_spk_zero_film_equals_flagship():
    """FiLM is zero-initialized: at init the conditioned model is EXACTLY
    the flagship on the mic channels — training starts at the controlled
    baseline, and the conditioning pathway must earn its keep."""
    base, spk = _spk_pair()
    pb = base.init(jax.random.PRNGKey(0))
    ps = spk.init(jax.random.PRNGKey(0))
    ps = {**pb, "spk": ps["spk"]}  # share every base weight
    x = _spk_mix()
    yb, _ = base.realtime_process(pb, None, x[:, :3], flag=False)
    ys, _ = spk.realtime_process(ps, None, x, flag=False)
    assert np.array_equal(np.asarray(yb), np.asarray(ys))


def test_crn_spk_scan_stacked_equivalence_and_conditioning():
    """Stacked runtime == chunk-serial scan for the conditioned model,
    and the output actually responds to the enrollment channel once the
    FiLM weights are nonzero."""
    _, spk = _spk_pair()
    ps = spk.init(jax.random.PRNGKey(0))
    sp = dict(ps["spk"])
    sp["film_g"] = jax.random.normal(jax.random.PRNGKey(1),
                                     sp["film_g"].shape) * 0.1
    sp["film_b"] = jax.random.normal(jax.random.PRNGKey(2),
                                     sp["film_b"].shape) * 0.1
    ps = {**ps, "spk": sp}
    x = _spk_mix()
    y_stacked, st_s = spk.realtime_process(ps, None, x, flag=False)
    y_scan, st_c = spk.realtime_process_scan(ps, None, x, flag=False)
    np.testing.assert_allclose(np.asarray(y_stacked), np.asarray(y_scan),
                               atol=2e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), st_s, st_c)

    x2 = x.at[:, 3, :8000].set(_spk_mix(seed=7)[:, 3, :8000] * 3.0)
    y2, _ = spk.realtime_process(ps, None, x2, flag=False)
    assert float(jnp.abs(y_stacked - y2).max()) > 1e-6


def test_crn_spk_embedding_is_pooled_and_level_invariant():
    """The enrollment embedding is L2-normalized and invariant to the
    enrollment's level (RMS norm) — voice statistics, not energy."""
    _, spk = _spk_pair()
    ps = spk.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32) * 0.1
    e1 = spk.encode_enroll(ps, wav)
    e2 = spk.encode_enroll(ps, wav * 4.7)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(e1, axis=-1)),
                               1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-4)


def test_crn_spk_registry_and_config():
    """TemporalCRN_spk is registered; both config.yaml and
    config_spk.yaml sections construct it (keys-are-kwargs)."""
    from semi_tpu.models import build_model
    from semi_tpu.utils.config import load_config

    for path in ("config.yaml", "config_spk.yaml"):
        cfg = load_config(path)
        m = build_model("TemporalCRN_spk", cfg["TemporalCRN_spk"])
        assert m.wants_enroll and m.enroll_len == 32000
        assert m.feature_channels(3) == 5  # mic features unchanged


def test_bf16_stft_pipeline_close_to_f32():
    """Round-5 bf16 END-TO-END inference (stft_dtype=bfloat16): the DFT
    matmuls run bf16 too, so every matmul in the program is bf16. Pin
    (a) the output is f32 waveform, (b) it stays within bf16 numeric
    noise of the f32-STFT pipeline (>=25 dB output SNR on random
    weights — quality parity on trained weights is measured by the
    runs/eval_bf16_stft* paired artifacts)."""
    from semi_tpu.models.crn import TemporalCRN

    kw = dict(num_channels=[4, 8], num_freqs=201, hidden=16,
              segment_length=3200, num_layers=1, num_inputs=3,
              kernel_size=3, remat=False, compute_dtype="bfloat16")
    m = TemporalCRN(**kw)
    mbf = TemporalCRN(**kw, stft_dtype="bfloat16")
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16000)) * 0.1
    y, _ = m.realtime_process(params, None, x, flag=False)
    ybf, _ = mbf.realtime_process(params, None, x, flag=False)
    assert ybf.dtype == jnp.float32
    assert ybf.shape == y.shape
    err = float(jnp.sqrt(jnp.mean((y - ybf) ** 2)))
    ref = float(jnp.sqrt(jnp.mean(y ** 2)))
    snr_db = -20 * np.log10(err / (ref + 1e-12) + 1e-12)
    assert snr_db >= 25.0, f"bf16 STFT pipeline SNR {snr_db:.1f} dB"
