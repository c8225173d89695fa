"""Host->device pipelining wrappers (data/prefetch.py)."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from tapclip_tpu.data.prefetch import (
    background_iter,
    device_prefetch,
    prefetch_to_device,
)


def test_background_iter_preserves_order_and_items():
    items = [(np.full((2, 2), i), i) for i in range(7)]
    out = list(background_iter(iter(items), depth=2))
    assert len(out) == 7
    for i, (a, l) in enumerate(out):
        assert l == i
        np.testing.assert_array_equal(a, items[i][0])


def test_background_iter_reraises_producer_exception():
    def gen():
        yield 1
        raise RuntimeError("decode failed")

    it = background_iter(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_background_iter_overlaps_producer_with_consumer():
    """The producer must run ahead while the consumer is busy."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    it = background_iter(gen(), depth=2)
    first = next(it)
    assert first == 0
    # Give the producer thread time: with the consumer idle it should have
    # filled the queue ahead of consumption.
    deadline = time.time() + 2.0
    while len(produced) < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert len(produced) >= 3, produced
    assert list(it) == [1, 2, 3]


def test_device_prefetch_yields_device_arrays():
    batches = [
        (np.ones((2, 3), np.float32) * i, np.asarray([i], np.int32))
        for i in range(5)
    ]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, (imgs, lbl) in enumerate(out):
        assert isinstance(imgs, jnp.ndarray)
        np.testing.assert_allclose(np.asarray(imgs), batches[i][0])
        assert int(lbl[0]) == i


def test_device_prefetch_size_validation():
    with pytest.raises(ValueError):
        list(device_prefetch(iter([1]), size=0))


def test_prefetch_to_device_composition():
    batches = [{"x": np.full((2,), i, np.float32)} for i in range(6)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert [float(b["x"][0]) for b in out] == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]


def test_empty_iterables():
    assert list(background_iter(iter([]))) == []
    assert list(device_prefetch(iter([]))) == []
