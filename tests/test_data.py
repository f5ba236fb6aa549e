"""Data pipeline tests: RIR physics, augmenters, dataset protocol."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_tpu.data.augment import (
    add_noise, do_clip, drop_chunk, drop_freq, extend_noise, notch_kernel,
)
from semi_tpu.data.rir import RoomConfig, fft_convolve, sample_room, simulate_rir

ROOM_CFG = RoomConfig(
    room_limit=((3, 3, 2.5), (4, 5, 3)),
    t60_limit=(0.2, 1.0),
    beta_limit=((0.5,) * 6, (1.0,) * 6),
    array_limit=((0.1, 0.1, 0.2), (0.9, 0.9, 0.7)),
    mic_limit=((0.06, 0.06, 0.06), (0.15, 0.15, 0.15)),
    source_limit=((0.0, 0.0, 0.3), (1.0, 1.0, 0.7)),
    num_src=1, num_mic=3, fs=16000,
)


def test_room_sampling_within_limits():
    s = sample_room(jax.random.PRNGKey(0), ROOM_CFG)
    room = np.asarray(s.room)
    assert np.all(room >= [3, 3, 2.5]) and np.all(room <= [4, 5, 3])
    assert 0.2 <= float(s.t60) <= 1.0
    assert s.mic_pos.shape == (3, 3) and s.src_pos.shape == (2, 3)


def test_rir_direct_path_and_decay():
    s = sample_room(jax.random.PRNGKey(1), ROOM_CFG)
    rir = np.asarray(simulate_rir(jax.random.PRNGKey(2), s, ROOM_CFG))
    assert rir.shape[0] == 2 and rir.shape[1] == 3
    # direct path arrives at dist/c
    dist = float(np.linalg.norm(np.asarray(s.src_pos[0]) - np.asarray(s.mic_pos[0])))
    expected_tap = dist / 343.0 * 16000
    first_tap = np.argmax(np.abs(rir[0, 0]) > 1e-6)
    assert abs(first_tap - expected_tap) < 3
    # energy decays: second half much quieter than first 50 ms
    early = np.sum(rir[0, 0, :800] ** 2)
    late = np.sum(rir[0, 0, 8000:] ** 2)
    assert early > late


def test_fft_convolve_matches_numpy():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((2, 1000)).astype(np.float32)
    ker = rng.standard_normal((2, 64)).astype(np.float32)
    ours = np.asarray(fft_convolve(jnp.asarray(sig), jnp.asarray(ker)))
    for i in range(2):
        ref = np.convolve(sig[i], ker[i])[:1000]
        np.testing.assert_allclose(ours[i], ref, atol=1e-3)


def test_add_noise_snr():
    rng = np.random.default_rng(1)
    clean = jnp.asarray(rng.standard_normal((3, 16000)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((3, 16000)).astype(np.float32))
    noisy, n_out = add_noise(jax.random.PRNGKey(0), clean, noise,
                             snr_low=10, snr_high=10, mix_prob=1.0)
    # achieved amplitude-ratio SNR ~ 10 dB under the speechbrain convention
    s_amp = float(jnp.mean(jnp.abs(clean * (1 - 1 / (10 ** 0.5 + 1)))))
    n_amp = float(jnp.mean(jnp.abs(n_out)))
    snr_db = 20 * np.log10(s_amp / n_amp)
    assert abs(snr_db - 10) < 1.5


def test_notch_kernel_rejects_frequency():
    freq = 0.25  # of Nyquist
    k = np.asarray(notch_kernel(jnp.asarray(freq), 101, 0.05))
    w, h = np.fft.rfftfreq(1024, 0.5), np.abs(np.fft.rfft(k, 1024))
    # response near the (shifted) notch center freq+width is low,
    # far away it's ~1
    notch_bin = int((freq + 0.05) / 2 * 1024)
    assert h[notch_bin] < 0.2
    assert h[10] > 0.8 and h[-10] > 0.8


def test_drop_chunk_zeroes_spans():
    x = jnp.ones((16000,))
    y = drop_chunk(jax.random.PRNGKey(3), x, drop_prob=1.0)
    y = np.asarray(y)
    assert (y == 0).sum() >= 100
    assert (y == 1).sum() > 12000


def test_do_clip():
    x = jnp.linspace(-2, 2, 100)
    y = do_clip(jax.random.PRNGKey(4), x, clip_low=0.5, clip_high=0.5, clip_prob=1.0)
    assert float(jnp.max(jnp.abs(y))) <= 0.5 + 1e-6


def test_extend_noise():
    noise = np.random.default_rng(0).standard_normal(20000).astype(np.float32)
    out = extend_noise(noise, 50000, 16000)
    assert len(out) >= 50000
    np.testing.assert_allclose(out[:3000], noise[:3000], atol=1e-6)


@pytest.fixture(scope="module")
def dataset():
    from semi_tpu.data.dataset import LibriPartyDataset

    config = {
        "config": {"sample_rate": 16000, "spk_num": 1, "seed": 0,
                   "max_length": 60000, "mix_length": 64000},
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
    }
    return LibriPartyDataset(config)


def test_dataset_item_shapes_and_flags(dataset):
    dataset.set_attribute("train", augment=False)
    dataset.init_seed(1)
    items = [dataset[i] for i in range(4)]
    for it in items:
        b, m, length = it["mix"].shape
        assert (b, m) == (1, 3)
        assert length % 8000 == 0 and 16000 <= length <= 64000
        assert it["source"].shape == (1, 1, 3, length)
        assert it["length"][0] == length
        assert np.all(np.isfinite(it["mix"]))
        assert np.abs(it["mix"]).max() <= MAX_AMP_TOL
    assert items[0]["flag"] is False  # first piece of an utterance


MAX_AMP_TOL = 0.95 + 1e-4


def test_dataset_mix_is_source_plus_noise(dataset):
    dataset.set_attribute("test", augment=False, snr_low=0, snr_high=25)
    dataset.init_seed(2)
    it = dataset[0]
    assert it["flag"] is False
    # mix correlates strongly with reverberant source (scale-invariant)
    mix, src = it["mix"][0, 0], it["source"][0, 0, 0]
    corr = np.corrcoef(mix, src)[0, 1]
    assert corr > 0.3


def test_dataset_determinism(dataset):
    dataset.set_attribute("train", augment=True)
    dataset.init_seed(7)
    dataset.buffer = []
    a = dataset[0]
    dataset.init_seed(7)
    dataset.buffer = []
    b = dataset[0]
    np.testing.assert_allclose(a["mix"], b["mix"], atol=0)


def test_add_reverb():
    from semi_tpu.data.augment import add_reverb

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(8000).astype(np.float32))
    rir = jnp.zeros(512).at[40].set(1.0).at[200].set(0.3)
    y = add_reverb(jax.random.PRNGKey(0), x, rir, reverb_prob=1.0)
    assert y.shape == x.shape
    # peak alignment: direct path not delayed; amplitude preserved
    amp_in = float(jnp.mean(jnp.abs(x)))
    amp_out = float(jnp.mean(jnp.abs(y)))
    assert abs(amp_out - amp_in) / amp_in < 0.05
    # direct-path correlation is high at lag 0
    c = np.corrcoef(np.asarray(x)[:4000], np.asarray(y)[:4000])[0, 1]
    assert c > 0.8


def test_fullsubnet_weight_init():
    from semi_tpu.models.fullsubnet import FullSubNet

    m = FullSubNet(num_freqs=201, look_ahead=0, sequence_model="LSTM",
                   fb_num_neighbors=0, sb_num_neighbors=15,
                   fb_output_activate_function="ReLU",
                   sb_output_activate_function=False,
                   fb_model_hidden_size=32, sb_model_hidden_size=16,
                   num_mics=3, num_layers=1, weight_init=True,
                   segment_length=3200)
    params = m.init(jax.random.PRNGKey(0))
    # orthogonal recurrent weights: columns orthonormal for tall [4H, H]
    w = np.asarray(params["fb"]["rnn"][0]["w_hh"])  # [4H, H]
    g = w.T @ w
    np.testing.assert_allclose(g, np.eye(w.shape[1]), atol=1e-4)
    # biases zeroed
    assert float(np.abs(params["fb"]["fc"]["b"]).max()) == 0.0


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dataset_rng_stable_across_processes():
    """The mixture stream must be identical across interpreter runs:
    python's salted str hash() in the rng chain once made every process
    draw different data (train resumes / eval runs irreproducible)."""
    import subprocess
    import sys

    code = (
        "import os, sys\n"
        "sys.path.insert(0, %r)\n"
        "import numpy as np\n"
        "from semi_tpu.data.dataset import LibriPartyDataset\n"
        "from tests.test_trainer import TINY_CONFIG\n"
        "import copy\n"
        "ds = LibriPartyDataset(copy.deepcopy(TINY_CONFIG))\n"
        "ds.set_attribute('test', augment=False)\n"
        "ds.init_seed(3)\n"
        "r = ds._rng(7)\n"
        "print(int(r.integers(2**31)))\n" % REPO
    )
    outs = []
    for seed in ("0", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=seed,
                   PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=300)
        assert p.returncode == 0, p.stderr[-800:]
        outs.append(p.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1], outs


def test_corpus_generator_process_stable_seeds():
    """tools/generate_corpus derives seeds from a crc32 tag, never
    python's salted hash() (VERDICT r2 missing #3): the same (split,
    kind, index) must synthesize bit-identical audio in every process
    regardless of PYTHONHASHSEED."""
    import os
    import subprocess
    import sys

    code = (
        "import sys, numpy as np;"
        "sys.path.insert(0, 'tools');"
        "from generate_corpus import synth_speech, stable_tag, FS;"
        "rng = np.random.default_rng("
        "np.random.SeedSequence([1000, 3, stable_tag('clean'), 2]));"
        "w = synth_speech(rng, int(rng.uniform(2.0, 6.0) * FS));"
        "print(hash('clean') & 0xFFFF, float(np.sum(np.abs(w))), len(w))"
    )
    outs = []
    for seed in ("0", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=seed,
                   PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True,
                           cwd=os.path.join(os.path.dirname(__file__), ".."))
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout.split())
    # hash() really is salted across these processes...
    assert outs[0][0] != outs[1][0]
    # ...but the generated audio is identical
    assert outs[0][1:] == outs[1][1:]


def test_ensure_corpus_guard(tmp_path):
    """tools/ensure_corpus resolves fingerprint paths relative to
    csv_dir and distinguishes intact / missing / corrupted corpora
    (the workspace-recycle failure mode, ROADMAP round-3). The
    path-join regression matters: a wrong base once made an intact
    corpus look 100% missing and triggered a pointless regeneration
    beside a live trainer."""
    import hashlib
    import json
    import subprocess
    import sys

    csv_dir = tmp_path / "data"
    wav = csv_dir / "corpus" / "train" / "clean" / "x.wav"
    wav.parent.mkdir(parents=True)
    wav.write_bytes(b"RIFFfake")
    sha = hashlib.sha256(b"RIFFfake").hexdigest()
    fp = {"version": 2, "files": {"corpus/train/clean/x.wav": sha},
          "corpus_sha256": "irrelevant"}
    (csv_dir / "corpus_fingerprint.json").write_text(json.dumps(fp))

    def run(*extra):
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        return subprocess.run(
            [sys.executable, "tools/ensure_corpus.py",
             "--csv_dir", str(csv_dir), *extra],
            env=env, capture_output=True, text=True,
            cwd=os.path.join(os.path.dirname(__file__), ".."))

    r = run()
    assert r.returncode == 0 and "corpus ok" in r.stdout, r.stdout + r.stderr
    r = run("--hash")
    assert r.returncode == 0 and "corpus ok" in r.stdout, r.stdout + r.stderr

    wav.write_bytes(b"TRUNC")  # corrupted: only --hash may catch it
    r = run()
    assert r.returncode == 0 and "corpus ok" in r.stdout
    r = run("--hash", "--check_only")
    assert r.returncode == 3 and "corpus incomplete" in r.stdout

    wav.unlink()  # missing: the cheap existence check must catch it
    r = run("--check_only")
    assert r.returncode == 3 and "corpus incomplete" in r.stdout
