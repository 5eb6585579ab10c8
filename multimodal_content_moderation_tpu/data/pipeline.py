"""Host->device prefetching.

``prefetch_to_device`` wraps a host batch iterator with a background thread
that stages the next ``size`` batches onto the mesh (sharded over the data
axis) while the current step computes — the TPU-native replacement for the
reference's DataLoader worker prefetch (num_workers=4, pin_memory). Combined
with JAX's async dispatch this keeps the chip busy: decode (thread pool in
CSVDataset.batches) | transfer (this thread) | compute (device) all overlap.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Tuple

from multimodal_content_moderation_tpu.parallel.mesh import shard_batch

_SENTINEL = object()


def bounded_producer(
    produce: Callable[[], Iterator[Any]], size: int = 2
) -> Tuple[queue.Queue, object, list, Callable[[], None]]:
    """Run ``produce()`` on a daemon thread, pushing items into a bounded
    queue without ever blocking forever.

    A plain ``q.put`` on a full bounded queue deadlocks the producer (and
    leaks the thread plus whatever it holds) if the consumer dies first; the
    returned ``cancel()`` MUST be called from a consumer ``finally`` — it
    flips the cancellation event the producer's timeout-put loop re-checks,
    drains the queue so the final sentinel put cannot block, and joins the
    thread. Producer exceptions are appended to the returned error list and
    should be re-raised by the consumer when it sees the sentinel.

    Returns ``(queue, sentinel, errors, cancel)``.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    err: list = []
    cancelled = threading.Event()

    def worker():
        try:
            for item in produce():
                # bounded put that re-checks cancellation: if the consumer
                # died, a plain q.put could block forever (bounded queue)
                while not cancelled.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if cancelled.is_set():
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            # The sentinel put must terminate too: after cancellation a
            # straggler item (a timeout-put that won the race with the
            # drain) can refill the queue with no consumer left — evict
            # to make room instead of blocking forever.
            while True:
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    if cancelled.is_set():
                        try:
                            q.get_nowait()
                        except queue.Empty:  # pragma: no cover - racy
                            pass

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    def cancel():
        cancelled.set()
        # drain so the producer's final q.put(_SENTINEL) cannot block
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5)

    return q, _SENTINEL, err, cancel


def prefetch_to_device(
    host_iter: Iterator[Dict[str, Any]],
    mesh,
    size: int = 2,
) -> Iterator[Dict[str, Any]]:
    """Yield device-resident (mesh-sharded) batches, ``size`` ahead."""
    q, end, err, cancel = bounded_producer(
        lambda: (shard_batch(batch, mesh) for batch in host_iter), size
    )
    try:
        while True:
            item = q.get()
            if item is end:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # runs on normal exhaustion AND when the consumer abandons the
        # generator early (early stopping, step exception, GC) — the
        # producer must never stay blocked on a full queue
        cancel()
