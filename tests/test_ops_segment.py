"""Tests for segmentation / overlap-add chunk protocol.

Checks the exact reference semantics (utility.py:312-403): interleaved
phase ordering, gap formula, and segmentation -> over_add identity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from semi_tpu.ops.segment import over_add, segment_gap, segmentation

pytestmark = pytest.mark.core


def ref_segmentation(x: np.ndarray, k: int):
    """Literal numpy re-derivation of the reference algorithm."""
    b, c, length = x.shape
    p = k // 2
    gap = k - (p + length % k) % k
    xp = np.concatenate(
        [np.zeros((b, c, p)), x, np.zeros((b, c, gap)), np.zeros((b, c, p))],
        axis=-1,
    ).astype(x.dtype)
    xt = xp.transpose(1, 0, 2)  # [C, B, Lp]
    i1 = xt[..., :-p].reshape(c, -1, k)
    i2 = xt[..., p:].reshape(c, -1, k)
    out = np.concatenate([i1, i2], axis=-1).reshape(c, -1, k)
    return out.transpose(1, 0, 2), gap


@pytest.mark.parametrize("length,k", [(3200, 3200), (16000, 3200), (7777, 3200), (1600, 3200)])
def test_segmentation_matches_reference(length, k):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, length)).astype(np.float32)
    ours, gap = segmentation(jnp.asarray(x), k)
    ref, ref_gap = ref_segmentation(x, k)
    assert gap == ref_gap == segment_gap(length, k)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0)


@pytest.mark.parametrize("length", [3200, 16000, 7777, 60000])
def test_roundtrip_identity(length):
    rng = np.random.default_rng(1)
    k = 3200
    x = rng.standard_normal((2, 1, length)).astype(np.float32)
    chunks, gap = segmentation(jnp.asarray(x), k)
    # [B*2N, 1, K] -> [B, 2N, K]
    n2 = chunks.shape[0] // x.shape[0]
    merged = over_add(chunks[:, 0, :].reshape(x.shape[0], n2, k), gap)
    np.testing.assert_allclose(np.asarray(merged), x[:, 0], atol=1e-6)


def test_chunk_time_ordering():
    """Chunk rows advance by P samples per step (phase interleave)."""
    k, p = 3200, 1600
    length = 9600
    x = np.arange(length, dtype=np.float32)[None, None, :]
    chunks, _ = segmentation(jnp.asarray(x), k)
    chunks = np.asarray(chunks)[:, 0]
    # first chunk = [P zeros, first P samples]
    assert np.all(chunks[0, :p] == 0)
    np.testing.assert_allclose(chunks[0, p:], x[0, 0, :p])
    # each subsequent chunk starts P samples later
    np.testing.assert_allclose(chunks[1, :k - p], chunks[0, p:])
    np.testing.assert_allclose(chunks[2, :k - p], chunks[1, p:])
