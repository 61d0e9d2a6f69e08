"""Device-input double buffering (utils/prefetch.py)."""
import numpy as np
import pytest

import jax

from deepsir_tpu.utils.prefetch import device_prefetch


def test_order_and_transfer():
    batches = [{"x": np.full((2, 2), i, np.float32), "meta": [i]}
               for i in range(7)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)        # arrays staged on device
        assert b["meta"] == [i]                     # non-arrays pass through
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 2), i))


def test_custom_transfer():
    got = list(device_prefetch(range(4), transfer=lambda i: i * 10))
    assert got == [0, 10, 20, 30]


def test_source_exception_propagates():
    def gen():
        yield {"x": np.zeros(1)}
        raise RuntimeError("boom")

    it = device_prefetch(gen())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_empty_source():
    assert list(device_prefetch([])) == []


def test_abandoned_consumer_releases_worker():
    import threading
    import time

    started = threading.Event()

    def gen():
        for i in range(100):
            started.set()
            yield i

    it = device_prefetch(gen(), size=1)
    assert next(it) == 0
    started.wait(2)
    it.close()                                  # abandon mid-stream
    def worker_alive():
        return any(t.name == "device-prefetch" and t.is_alive()
                   for t in threading.enumerate())

    deadline = time.time() + 3
    while time.time() < deadline and worker_alive():
        time.sleep(0.05)
    assert not worker_alive()
