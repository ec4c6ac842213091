"""Host-to-device input pipelining.

The training loop's per-step host work (numpy -> device transfer of the
next batch) serializes with the jitted step unless the transfer is
issued ahead of time. `prefetch_to_device` keeps `size` batches in
flight: while the device runs step i, the host is already enqueueing
the transfers for steps i+1..i+size. JAX transfers are async, so simply
calling `jax.device_put` one batch early is enough — no threads needed.

The reference has no input pipeline at all (SURVEY.md §0: no training
loop); this is standard JAX practice (cf. flax.jax_utils.prefetch_to_
device, which targets pmap-sharded arrays; this one feeds single-device
or jit-sharded steps).
"""
from __future__ import annotations

import collections
from collections.abc import Iterable, Iterator

import jax


def prefetch_to_device(batches: Iterable[dict], size: int = 2,
                       sharding=None) -> Iterator[dict]:
    """Yield batch dicts with their device transfers issued `size` steps
    ahead. `sharding` (e.g. a NamedSharding over the data axis) places
    each array directly on the mesh; None uses the default device."""
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    queue = collections.deque()

    def put(batch):
        if sharding is None:
            return {k: jax.device_put(v) for k, v in batch.items()}
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    it = iter(batches)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    for batch in it:
        out = queue.popleft()
        queue.append(put(batch))
        yield out
    while queue:
        yield queue.popleft()
