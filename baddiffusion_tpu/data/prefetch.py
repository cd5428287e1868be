"""Host→device prefetch: overlap input pipeline with TPU compute.

Replaces the reference's ``DataLoader(num_workers=8, pin_memory=True)``
(dataset.py:271-273) with the JAX idiom: a background thread stages the next
batches onto the device (optionally sharded over a mesh) while the current
step runs, so H2D transfer never blocks the step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


def device_prefetch(
    batches: Iterator[Dict[str, np.ndarray]],
    size: int = 2,
    sharding=None,
) -> Iterator[Dict[str, jax.Array]]:
    """Yield device-resident batches, keeping ``size`` in flight.

    ``sharding`` (e.g. NamedSharding over the data axis) places each array
    directly into its distributed layout — the multi-chip feed path.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def resolve(k, v):
        if sharding is None:
            return None
        if isinstance(sharding, dict):
            return sharding.get(k)
        if callable(sharding) and not hasattr(sharding, "devices"):
            return sharding(k, v)
        return sharding

    def put(batch):
        from baddiffusion_tpu.parallel.mesh import put_global

        out = {}
        for k, v in batch.items():
            s = resolve(k, v)
            # put_global, not device_put: on a multi-process mesh the latter
            # allgathers the host value over Gloo for an equality check —
            # per batch, with a hard 30s context-init deadline (mesh.py)
            out[k] = put_global(v, s) if s is not None else jax.device_put(v)
        return out

    def worker():
        try:
            for batch in batches:
                q.put(put(batch))
        except Exception as exc:  # surfaces in the consumer
            q.put(exc)
        q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, Exception):
            raise item
        yield item
