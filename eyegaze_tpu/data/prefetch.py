"""Host->device batch prefetching (double buffering).

The reference overlaps data preparation with GPU compute via DataLoader
worker processes (dual_eeg_dataset collate + ``num_workers`` in the YAML
configs, SURVEY.md §2.1).  The TPU-native equivalent needs no processes:
``jax.device_put`` is asynchronous, so keeping ``size`` batches in flight
overlaps the host->device transfer of batch k+1 with the device compute of
batch k.  On relay-attached chips (axon) the transfer is the dominant
per-step host cost (~320 ms for 6.7 MB measured round 2), which this hides
entirely for compute-bound steps.
"""

from __future__ import annotations

import collections
import itertools
from typing import Any, Callable, Iterator, Optional

import jax


def prefetch_to_device(
    batches: Iterator[Any],
    size: int = 2,
    placement: Optional[Callable[[Any], Any]] = None,
) -> Iterator[Any]:
    """Yield batches with ``size`` of them already enqueued for transfer.

    ``placement`` maps a host batch to device arrays (default: plain
    ``jax.device_put`` of every leaf).  It must be non-blocking for the
    overlap to happen — ``device_put`` and sharded ``device_put`` both are.
    ``size=0`` disables the queueing only: ``placement`` is STILL applied to
    every batch (callers route all batch placement — including DP-mesh
    ``shard_batch`` — through this function, so skipping it would silently
    feed unsharded host batches to a sharded jit step).
    """
    if placement is None:
        placement = lambda b: jax.tree_util.tree_map(jax.device_put, b)
    if size <= 0:
        yield from map(placement, batches)
        return
    it = iter(batches)
    queue: collections.deque = collections.deque()

    def enqueue(n: int) -> None:
        for batch in itertools.islice(it, n):
            queue.append(placement(batch))

    enqueue(size)
    while queue:
        out = queue.popleft()
        enqueue(1)
        yield out
