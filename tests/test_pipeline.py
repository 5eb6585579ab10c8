"""Host->device prefetch plumbing: ``bounded_producer`` lifecycle.

The reference delegates prefetch to torch DataLoader workers (process fork,
killed by the parent); our producer is a daemon thread feeding a bounded
queue, so the failure mode to guard is the ADVICE-flagged leak: consumer
dies -> producer blocks forever on ``q.put`` -> thread (+ decode pool +
staged batches) leaks per failed call in a long-lived serving process.
"""

import threading
import time

import numpy as np
import pytest

from multimodal_content_moderation_tpu.data.pipeline import (
    bounded_producer,
    prefetch_to_device,
)


def _drain(q, end, err):
    items = []
    while True:
        item = q.get()
        if item is end:
            if err:
                raise err[0]
            return items
        items.append(item)


def test_bounded_producer_delivers_in_order():
    q, end, err, cancel = bounded_producer(lambda: iter(range(20)), size=2)
    try:
        assert _drain(q, end, err) == list(range(20))
    finally:
        cancel()


def test_bounded_producer_propagates_exception():
    def gen():
        yield 1
        raise ValueError("boom")

    q, end, err, cancel = bounded_producer(gen, size=2)
    try:
        with pytest.raises(ValueError, match="boom"):
            _drain(q, end, err)
    finally:
        cancel()


@pytest.mark.parametrize("size", [1, 2])
def test_cancel_reaps_blocked_producer(size):
    """Consumer abandons with the queue full and the producer mid-put:
    cancel() must unblock and join the thread (the leak regression)."""
    started = threading.Event()
    n_produced = []

    def gen():
        for i in range(1000):
            started.set()
            n_produced.append(i)
            yield i

    q, end, err, cancel = bounded_producer(gen, size=size)
    started.wait(timeout=5)
    # consume one item, then walk away mid-stream (simulates forward_batch
    # raising); producer is now blocked on a full queue
    assert q.get() is not end
    time.sleep(0.05)
    before = threading.active_count()
    cancel()
    # the producer must have stopped early, not run to completion
    assert len(n_produced) < 1000
    assert threading.active_count() <= before


def test_cancel_after_normal_exhaustion_is_noop():
    q, end, err, cancel = bounded_producer(lambda: iter([1, 2]), size=2)
    assert _drain(q, end, err) == [1, 2]
    cancel()  # must not hang or raise
    cancel()  # idempotent


def test_prefetch_to_device_early_abandon_reaps_producer():
    """Closing the generator early (early stopping / step exception) must
    run the finally-cancel and reap the producer thread."""
    import jax

    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh

    mesh = build_mesh()
    produced = []

    def host_iter():
        for i in range(100):
            produced.append(i)
            yield {"x": np.full((8, 4), i, np.float32)}

    it = prefetch_to_device(host_iter(), mesh, size=2)
    first = next(it)
    assert float(np.asarray(first["x"])[0, 0]) == 0.0
    it.close()  # abandon early
    time.sleep(0.2)
    assert len(produced) < 100


def test_prefetch_to_device_full_stream():
    import jax

    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh

    mesh = build_mesh()
    batches = ({"x": np.full((8, 2), i, np.float32)} for i in range(5))
    vals = [float(np.asarray(b["x"])[0, 0]) for b in prefetch_to_device(batches, mesh)]
    assert vals == [0.0, 1.0, 2.0, 3.0, 4.0]
