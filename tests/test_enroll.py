"""Corpus v3 speaker-keyed enrollment: generator, dataset, trainer.

Round-4 wave (VERDICT r3 next #1): deployable speaker conditioning
needs enrollment from a DIFFERENT utterance of the target speaker —
zero target leakage. These tests pin:
- the v3 generator's spk-keyed manifests + per-speaker voice stability,
- the dataset's separate-enrollment draw (appended AFTER the mixture
  chain, so mixtures stay item-for-item identical with/without it),
- the meta/array twin equivalence including the enrollment index,
- the fused trainer's enrollment channel (array and corpus modes),
- predict's nontarget negative-control source.
"""

import copy
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from tests.test_trainer import TINY_CONFIG

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def v3_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("v3corpus")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "generate_corpus.py"),
         "--csv_dir", str(d), "--out_dir", str(d / "corpus"),
         "--version", "3", "--spk_utts", "3",
         "--train_clean", "9", "--train_noise", "2",
         "--dev_clean", "3", "--dev_noise", "1",
         "--test_clean", "6", "--test_noise", "1"],
        check=True, capture_output=True)
    return d


def _v3_config(d, enroll_mode="separate"):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["config"]["enroll_mode"] = enroll_mode
    cfg["config"]["enroll_len"] = 16000
    cfg["dataset"] = {
        "train": {"clean": [str(d / "final_train.csv")],
                  "noise": [str(d / "final_train_noise.csv")]},
        "dev": {"clean": [str(d / "final_dev.csv")],
                "noise": [str(d / "final_dev_noise.csv")]},
        "test": {"clean": [str(d / "final_test.csv")],
                 "noise": [str(d / "DNS_test_noise.csv")]},
    }
    return cfg


def test_v3_manifest_has_spk_column(v3_corpus):
    import pandas as pd

    df = pd.read_csv(v3_corpus / "final_train.csv")
    assert list(df.columns) == ["path", "spk"]
    counts = df.groupby("spk").size()
    assert (counts == 3).all(), counts  # spk_utts utterances per speaker
    # noise manifests stay single-column
    dn = pd.read_csv(v3_corpus / "final_train_noise.csv")
    assert list(dn.columns) == ["path"]
    # fingerprint carries sizes + regeneration args (ensure_corpus v3)
    import json

    fp = json.load(open(v3_corpus / "corpus_fingerprint.json"))
    assert fp["version"] == 3
    assert set(fp["sizes"]) == set(fp["files"])
    assert "--version" in fp["generator_args"]


def test_v3_voice_is_speaker_stable(v3_corpus):
    """Two utterances of one speaker share voice parameters: their
    long-term average spectra are closer than across speakers."""
    import pandas as pd
    from semi_tpu.data.wav import read_wav

    df = pd.read_csv(v3_corpus / "final_train.csv")

    def lta(rel):
        w, _ = read_wav(str(v3_corpus / rel), 16000)
        n, hop = 400, 160
        fr = np.lib.stride_tricks.sliding_window_view(w, n)[::hop]
        e = np.log(np.abs(np.fft.rfft(fr * np.hanning(n), axis=-1)).mean(0)
                   + 1e-6)
        return (e - e.mean()) / (e.std() + 1e-9)

    embs = np.stack([lta(p) for p in df["path"]])
    spk = df["spk"].to_numpy()
    sims = embs @ embs.T / embs.shape[1]
    same = [sims[i, j] for i in range(len(spk)) for j in range(i + 1, len(spk))
            if spk[i] == spk[j]]
    diff = [sims[i, j] for i in range(len(spk)) for j in range(i + 1, len(spk))
            if spk[i] != spk[j]]
    assert np.mean(same) > np.mean(diff)


def test_separate_enroll_is_sibling_not_target(v3_corpus):
    from semi_tpu.data.dataset import LibriPartyDataset

    ds = LibriPartyDataset(_v3_config(v3_corpus))
    ds.set_attribute("train", augment=False)
    ds.init_seed(0)
    spk = ds.all_csv["train"]["clean_spk"]
    for i in range(6):
        out = ds.utterance_inputs(i)
        assert len(out) == 5
        clean, _, _, _, enroll = out
        tgt = ds._last_clean_idx[0]
        # the enrollment must be a different utterance of the SAME speaker
        paths = ds.all_csv["train"]["clean"]
        matches = [j for j, p in enumerate(paths)
                   if np.array_equal(ds._read_cached(p)[:16000],
                                     enroll[:len(ds._read_cached(p)[:16000])])
                   and len(ds._read_cached(p)) >= 1]
        assert matches, "enrollment not found in the corpus"
        j = matches[0]
        assert spk[j] == spk[tgt]
        assert j != tgt, "enrollment leaked the target utterance"


def test_mixture_chain_unchanged_by_enroll_mode(v3_corpus):
    """enroll draws append to the chain: the mixture inputs for item i
    are bit-identical with and without separate enrollment — paired
    comparisons across conditioned/unconditioned runs stay item-matched."""
    from semi_tpu.data.dataset import LibriPartyDataset

    a = LibriPartyDataset(_v3_config(v3_corpus, "separate"))
    b = LibriPartyDataset(_v3_config(v3_corpus, "self"))
    for ds in (a, b):
        ds.set_attribute("train", augment=False)
        ds.init_seed(3)
    for i in range(4):
        oa, ob = a.utterance_inputs(i), b.utterance_inputs(i)
        assert len(oa) == 5 and len(ob) == 4
        for x, y in zip(oa[:4], ob):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_meta_twin_matches_array_path_with_enroll(v3_corpus):
    from semi_tpu.data.dataset import LibriPartyDataset

    ds = LibriPartyDataset(_v3_config(v3_corpus))
    ds.set_attribute("train", augment=False)
    ds.init_seed(1)
    clean, clean_len, noise, noise_len = ds.corpus_tables()
    for i in range(4):
        arr = ds.utterance_inputs(i)
        meta = ds.utterance_meta(i, clean_len, noise_len)
        assert len(meta) == 6
        c_idx, _, _, key, ul, e_idx = meta
        np.testing.assert_array_equal(arr[2], key)
        assert arr[3] == ul
        # enrollment wav == the meta-indexed corpus row (int16 quantized)
        row = clean[e_idx].astype(np.float32) / 32768.0
        el = len(arr[4])
        np.testing.assert_allclose(arr[4][:el], row[:el], atol=1.0 / 32768)


@pytest.mark.parametrize("cls_kw", [
    ("TemporalCRNSpk", {}),
    # the round-5 cross-attention variant rides the same engine: the
    # enrollment channel feeds its frame-level K/V memory and gradients
    # must reach the attention tables through the fused losses
    ("TemporalCRNSpkXAttn", {"attn_dim": 16}),
])
def test_fused_step_trains_spk_model_with_enroll(v3_corpus, cls_kw):
    import semi_tpu.models.crn as crn_mod
    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.train.step import init_train_state
    from semi_tpu.train.utterance import (
        DeviceCorpus, UtteranceBatchSampler, UtteranceMetaSampler,
        make_utterance_train_step)

    cls_name, extra_kw = cls_kw
    cfg = _v3_config(v3_corpus)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("train", augment=False)
    ds.init_seed(0)
    m = getattr(crn_mod, cls_name)(
        spk_dim=8, enroll_len=16000, **extra_kw,
        **{k: v for k, v in cfg["TemporalCRN"].items()})
    params = m.init(jax.random.PRNGKey(0))
    ts = init_train_state(params, lr=3e-4)

    s_arr = UtteranceBatchSampler(ds, batch=2, k_batches=1)
    try:
        inputs = s_arr.next_batch()
    finally:
        s_arr.close()
    assert inputs["enroll"].shape == (1, 2, 16000)
    step = jax.jit(make_utterance_train_step(m, ds, k_batches=1))
    ts1, ms = step(ts, inputs)
    assert np.isfinite(float(np.asarray(ms["loss"])[0]))

    # corpus mode: same meta chain -> identical loss
    corpus = DeviceCorpus(ds)
    s_meta = UtteranceMetaSampler(ds, corpus, batch=2, k_batches=1)
    try:
        meta = s_meta.next_batch()
    finally:
        s_meta.close()
    assert "enroll_idx" in meta
    stepc = jax.jit(make_utterance_train_step(m, ds, k_batches=1,
                                              use_corpus=True))
    ts2, msc = stepc(ts, corpus.clean, corpus.noise, meta)
    np.testing.assert_allclose(np.asarray(ms["loss"]),
                               np.asarray(msc["loss"]), atol=2e-3)
    # and conditioning is live: gradients flow into the spk subtree
    g = np.asarray(jax.tree_util.tree_leaves(ts1.grad_accum)[0])
    assert np.all(np.isfinite(g))


def test_enroll_for_item_modes(v3_corpus):
    from semi_tpu.data.dataset import LibriPartyDataset

    ds = LibriPartyDataset(_v3_config(v3_corpus))
    ds.set_attribute("test", augment=False, perturb=False)
    ds.init_seed(0)
    _ = ds[0]
    spk = ds.all_csv["test"]["clean_spk"]
    tgt = ds._last_clean_idx[0]
    sep = ds.enroll_for_item(0, "separate", 16000)
    non = ds.enroll_for_item(0, "nontarget", 16000)
    assert sep.shape == (16000,) and non.shape == (16000,)
    assert not np.array_equal(sep, non)
    # nontarget draw really is a different speaker
    paths = ds.all_csv["test"]["clean"]
    j = [k for k, p in enumerate(paths)
         if np.array_equal(ds._read_cached(p)[:16000],
                           non[:min(16000, len(ds._read_cached(p)))])][0]
    assert spk[j] != spk[tgt]
    # deterministic across calls
    np.testing.assert_array_equal(non, ds.enroll_for_item(0, "nontarget",
                                                          16000))


def test_predict_eval_enroll_modes_end_to_end(v3_corpus, tmp_path):
    """evaluate_streaming with a conditioned model: the artifact pins
    enroll_mode, and separate vs nontarget enrollment actually change
    the model output (the channel is live through the eval path)."""
    import json

    import jax.numpy as jnp

    from predict import evaluate_streaming
    from semi_tpu.models.crn import TemporalCRNSpk

    cfg = _v3_config(v3_corpus)
    m = TemporalCRNSpk(spk_dim=8, enroll_len=16000,
                       **{k: v for k, v in cfg["TemporalCRN"].items()})
    params = m.init(jax.random.PRNGKey(0))
    # make the FiLM path non-trivial (zero-init would ignore enrollment)
    params["spk"]["film_g"] = params["spk"]["film_g"] + 0.3
    params["spk"]["film_b"] = params["spk"]["film_b"] + 0.1
    run = jax.jit(lambda p, x: m.realtime_process(p, None, x,
                                                  flag=False)[0])

    outs = {}
    for mode in ("separate", "nontarget"):
        out = tmp_path / f"{mode}.json"
        evaluate_streaming(run, params, cfg, "spk", "none", num_items=2,
                           out_json=str(out), enroll_len=16000,
                           enroll_mode=mode)
        art = json.loads(out.read_text())
        assert art["enroll_mode"] == mode
        outs[mode] = art
    # same mixtures, different enrollment -> different enhanced metrics
    a = outs["separate"]["items"][0]["enhanced"]["sisdr"]
    b = outs["nontarget"]["items"][0]["enhanced"]["sisdr"]
    assert a != b
    # noisy side identical: the mixture chain is enrollment-invariant
    na = outs["separate"]["items"][0]["noisy"]["sisdr"]
    nb = outs["nontarget"]["items"][0]["noisy"]["sisdr"]
    assert na == nb


def test_spk_deep_zero_init_is_flagship_and_conditioning_is_live():
    """TemporalCRNSpkDeep: zero-init deep FiLM reproduces the
    unconditioned flagship exactly (warm-start identity), the stacked
    and scan runtimes agree, and non-zero encoder tables actually
    change the output (the hook is wired in both paths)."""
    import jax.numpy as jnp

    from semi_tpu.models.crn import TemporalCRN, TemporalCRNSpkDeep

    kw = dict(num_channels=[4, 8], num_freqs=201, hidden=16,
              segment_length=3200, num_layers=1, num_inputs=3,
              kernel_size=3)
    flag = TemporalCRN(**kw)
    deep = TemporalCRNSpkDeep(spk_dim=8, enroll_len=3200, **kw)
    fparams = flag.init(jax.random.PRNGKey(0))
    dparams = deep.init(jax.random.PRNGKey(0))
    # the non-spk subtrees share the init chain
    mics = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6400)) * 0.1
    enr = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 6400)) * 0.1
    mix = jnp.concatenate([mics, enr], axis=1)

    y_flag, _ = flag.realtime_process(fparams, None, mics, flag=False)
    y_deep, _ = deep.realtime_process(dparams, None, mix, flag=False)
    np.testing.assert_allclose(np.asarray(y_flag), np.asarray(y_deep),
                               atol=1e-5)

    # scan == stacked for the deep variant
    y_scan, _ = deep.realtime_process_scan(dparams, None, mix, flag=False)
    np.testing.assert_allclose(np.asarray(y_deep), np.asarray(y_scan),
                               atol=1e-4)

    # non-zero encoder FiLM changes the output in BOTH runtimes
    live = jax.tree_util.tree_map(lambda x: x, dparams)
    live["spk"]["film_enc"] = [
        {"g": t["g"] + 0.3, "b": t["b"] + 0.05}
        for t in dparams["spk"]["film_enc"]]
    y_live, _ = deep.realtime_process(live, None, mix, flag=False)
    y_live_scan, _ = deep.realtime_process_scan(live, None, mix, flag=False)
    assert np.abs(np.asarray(y_live) - np.asarray(y_deep)).max() > 1e-4
    np.testing.assert_allclose(np.asarray(y_live), np.asarray(y_live_scan),
                               atol=1e-4)


def test_corpus_enroll_gather_respects_dataset_enroll_len(v3_corpus):
    """ADVICE r4 #4: a model whose enroll_len EXCEEDS the dataset's must
    see the SAME (zero-padded) enrollment in both sampler paths. Before
    the fix the corpus path gathered full mix_len rows — real audio
    where the array path had zeros — so the fused losses diverged."""
    from semi_tpu.data.dataset import LibriPartyDataset
    from semi_tpu.models.crn import TemporalCRNSpk
    from semi_tpu.train.step import init_train_state
    from semi_tpu.train.utterance import (
        DeviceCorpus, UtteranceBatchSampler, UtteranceMetaSampler,
        make_utterance_train_step)

    cfg = _v3_config(v3_corpus)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("train", augment=False)
    ds.init_seed(0)
    assert ds.enroll_len == 16000
    m = TemporalCRNSpk(spk_dim=8, enroll_len=24000,   # > dataset's
                       **{k: v for k, v in cfg["TemporalCRN"].items()})
    params = m.init(jax.random.PRNGKey(0))
    ts = init_train_state(params, lr=3e-4)

    s_arr = UtteranceBatchSampler(ds, batch=2, k_batches=1)
    try:
        inputs = s_arr.next_batch()
    finally:
        s_arr.close()
    step = jax.jit(make_utterance_train_step(m, ds, k_batches=1))
    _, ms = step(ts, inputs)

    corpus = DeviceCorpus(ds)
    s_meta = UtteranceMetaSampler(ds, corpus, batch=2, k_batches=1)
    try:
        meta = s_meta.next_batch()
    finally:
        s_meta.close()
    stepc = jax.jit(make_utterance_train_step(m, ds, k_batches=1,
                                              use_corpus=True))
    _, msc = stepc(ts, corpus.clean, corpus.noise, meta)
    np.testing.assert_allclose(np.asarray(ms["loss"]),
                               np.asarray(msc["loss"]), atol=2e-3)


def test_nontarget_requires_spk_keyed_manifest(v3_corpus):
    """ADVICE r4 #3: nontarget mode on a spk-less manifest must fail
    with a clear assertion, not an unguarded KeyError/infinite loop."""
    import pytest

    from semi_tpu.data.dataset import LibriPartyDataset

    cfg = _v3_config(v3_corpus)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("test", augment=False)
    ds.init_seed(0)
    _ = ds[0]
    # drop the spk column view -> clear assertion
    ds.all_csv["test"] = {k: v for k, v in ds.all_csv["test"].items()
                          if k != "clean_spk"}
    with pytest.raises(AssertionError, match="spk-keyed"):
        ds.enroll_for_item(0, "nontarget", 8000)


def test_singleton_speaker_fallback_warns(v3_corpus):
    """ADVICE r4 #1: separate-mode fallback to the target utterance
    (singleton speaker) must WARN — silent target leakage is the bug."""
    import warnings as _warnings

    from semi_tpu.data.dataset import LibriPartyDataset

    cfg = _v3_config(v3_corpus)
    ds = LibriPartyDataset(cfg)
    ds.set_attribute("train", augment=False)
    ds.init_seed(0)
    # make every speaker a singleton by renaming speakers uniquely
    n = len(ds.all_csv["train"]["clean_spk"])
    ds.all_csv["train"]["clean_spk"] = [f"solo_{i}" for i in range(n)]
    ds._spk_groups = {}
    rng = np.random.default_rng(0)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        idx = ds._draw_enroll_idx(rng, 0)
    assert idx == 0
    assert any("single utterance" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]


@pytest.mark.core
def test_spk_xattn_zero_init_is_spk_deep_and_conditioning_is_live():
    """TemporalCRNSpkXAttn: zero-init output projection reproduces the
    deep-FiLM variant exactly (warm-start identity with a trained
    spk_deep checkpoint), scan == stacked, and a non-zero output
    projection actually changes the output in BOTH runtimes (the
    cross-attention is wired, and identically, in each path)."""
    import jax.numpy as jnp

    from semi_tpu.models.crn import TemporalCRNSpkDeep, TemporalCRNSpkXAttn

    kw = dict(num_channels=[4, 8], num_freqs=201, hidden=16,
              segment_length=3200, num_layers=1, num_inputs=3,
              kernel_size=3)
    deep = TemporalCRNSpkDeep(spk_dim=8, enroll_len=3200, **kw)
    xatt = TemporalCRNSpkXAttn(spk_dim=8, enroll_len=3200, attn_dim=16, **kw)
    dparams = deep.init(jax.random.PRNGKey(0))
    xparams = xatt.init(jax.random.PRNGKey(0))
    # shared init chain => non-xattn subtrees identical; make FiLM live
    # so the identity check covers the inherited conditioning too
    for p in (dparams, xparams):
        p["spk"]["film_g"] = p["spk"]["film_g"] + 0.2
        p["spk"]["film_enc"] = [
            {"g": t["g"] + 0.1, "b": t["b"] + 0.05}
            for t in p["spk"]["film_enc"]]
    mics = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6400)) * 0.1
    enr = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 6400)) * 0.1
    mix = jnp.concatenate([mics, enr], axis=1)

    y_deep, _ = deep.realtime_process(dparams, None, mix, flag=False)
    y_x, _ = xatt.realtime_process(xparams, None, mix, flag=False)
    np.testing.assert_allclose(np.asarray(y_deep), np.asarray(y_x),
                               atol=1e-5)

    # scan == stacked for the cross-attention variant
    y_scan, _ = xatt.realtime_process_scan(xparams, None, mix, flag=False)
    np.testing.assert_allclose(np.asarray(y_x), np.asarray(y_scan),
                               atol=1e-4)

    # non-zero output projection changes the output in BOTH runtimes
    live = jax.tree_util.tree_map(lambda x: x, xparams)
    live["spk"]["xo_w"] = live["spk"]["xo_w"] + 0.05
    y_live, _ = xatt.realtime_process(live, None, mix, flag=False)
    y_live_scan, _ = xatt.realtime_process_scan(live, None, mix, flag=False)
    assert np.abs(np.asarray(y_live) - np.asarray(y_x)).max() > 1e-4
    np.testing.assert_allclose(np.asarray(y_live), np.asarray(y_live_scan),
                               atol=1e-4)

    # the memory rides the state: flag=True continuation keeps K/V
    wav1, st = xatt.realtime_process(live, None, mix, flag=False)
    assert st["spk_k"].shape == (1, xatt.enroll_frames, 16)
    wav2, st2 = xatt.realtime_process(live, st, mix[:, :, :3200], flag=True)
    assert np.asarray(jnp.abs(st2["spk_k"] - st["spk_k"])).max() == 0.0
