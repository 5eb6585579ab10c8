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
from typing import Any, Dict, Iterator

from multimodal_content_moderation_tpu.parallel.mesh import shard_batch

_SENTINEL = object()


def prefetch_to_device(
    host_iter: Iterator[Dict[str, Any]],
    mesh,
    size: int = 2,
) -> Iterator[Dict[str, Any]]:
    """Yield device-resident (mesh-sharded) batches, ``size`` ahead."""
    q: queue.Queue = queue.Queue(maxsize=size)
    err: list = []

    def worker():
        try:
            for batch in host_iter:
                q.put(shard_batch(batch, mesh))
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
