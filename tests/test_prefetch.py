"""Background prefetch: ordering, exceptions, early close."""

import time

import pytest

from semi_tpu.data.prefetch import ThreadPrefetcher, prefetch_map


def test_order_preserved():
    out = list(prefetch_map(lambda i: i * i, range(100), depth=3))
    assert out == [i * i for i in range(100)]


def test_stateful_producer_sequential():
    # a stateful producer (like the dataset buffer) must run sequentially
    state = {"n": 0}

    def produce(_):
        state["n"] += 1
        return state["n"]

    assert list(prefetch_map(produce, range(50))) == list(range(1, 51))


def test_exception_propagates():
    def produce(i):
        if i == 5:
            raise ValueError("boom")
        return i

    it = prefetch_map(produce, range(10))
    got = []
    with pytest.raises(ValueError, match="boom"):
        for x in it:
            got.append(x)
    assert got == [0, 1, 2, 3, 4]


def test_close_mid_iteration_joins_producer():
    def slow():
        for i in range(1000):
            time.sleep(0.001)
            yield i

    p = ThreadPrefetcher(slow(), depth=2)
    next(p)
    p.close()
    assert not p._thread.is_alive()


def test_context_manager():
    with prefetch_map(lambda i: i, range(10), depth=2) as it:
        assert next(it) == 0
