"""Native audio runtime tests: WAV roundtrip, resample parity vs the JAX
polyphase, prefetch pool."""

import numpy as np
import pytest

from semi_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _tone(sr=16000, seconds=0.5, f=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "t.wav")
    x = _tone()
    native.wav_write(path, x, 16000)
    y, sr = native.wav_read(path)
    assert sr == 16000
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_reads_scipy_written_wav(tmp_path):
    from scipy.io import wavfile

    path = str(tmp_path / "s.wav")
    x = _tone()
    wavfile.write(path, 16000, (x * 32767).astype(np.int16))
    y, sr = native.wav_read(path)
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_native_resample_matches_jax():
    import jax.numpy as jnp

    from semi_tpu.ops.resample import resample_poly

    x = _tone(seconds=0.3)
    ours = native.resample(x, 5, 8)
    ref = np.asarray(resample_poly(jnp.asarray(x), 5, 8))
    assert len(ours) == len(ref)
    # interiors match; edges differ by boundary handling only
    np.testing.assert_allclose(ours[50:-50], ref[50:-50], atol=5e-3)


def test_resample_on_read(tmp_path):
    path = str(tmp_path / "sr8k.wav")
    x = _tone(sr=8000, seconds=0.25)
    native.wav_write(path, x, 8000)
    y, _ = native.wav_read(path, sample_rate=16000)
    assert abs(len(y) - 2 * len(x)) <= 2


def test_prefetch_pool(tmp_path):
    paths = []
    for i in range(6):
        p = str(tmp_path / f"p{i}.wav")
        native.wav_write(p, _tone(f=200 + 50 * i), 16000)
        paths.append(p)
    pool = native.PrefetchPool(num_threads=3)
    jobs = [pool.submit(p) for p in paths]
    outs = [pool.wait(j) for j in jobs]
    assert all(len(o) == 8000 for o in outs)
    # distinct tones decoded correctly
    assert not np.allclose(outs[0], outs[1])
    pool.close()
