"""Host->device input prefetching (double buffering).

Overlaps the host data pipeline with device compute: batch N+1 transfers
while batch N trains, hiding PCIe/host latency behind the step. Matters for
real datasets (CIFAR/KITTI files); the synthetic generators are device-side
already. Reference repo has no data pipeline (``README.md:1-2``).
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax

from multimodal_sc_tpu.runtime import mesh as mesh_lib


def prefetch_to_device(
    iterator: Iterable,
    size: int = 2,
    mesh: Optional["jax.sharding.Mesh"] = None,
) -> Iterator:
    """Yield device-resident batches, keeping `size` transfers in flight.

    Each host batch (pytree of arrays) is device_put with leading-axis
    `data` sharding when a mesh is given (replicated scalars excluded by
    shape), else default placement. device_put is async; the queue keeps
    the next transfers in flight while the consumer computes.
    """
    queue = collections.deque()

    def put(batch):
        if mesh is not None:
            return mesh_lib.shard_batch(mesh, batch)
        return jax.device_put(batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
