"""Per-process broadcast cache for map_batches TASK functions.

``ray.put`` the object once on the driver, close over the ref in a
plain function, and call ``bget(ref)`` per batch: the first call in
each worker process fetches (zero-copy for Arrow/numpy), later calls
hit the dict.  This gives broadcast-join semantics WITHOUT an actor
pool — important because actor pools hold CPU reservations for their
lifetime, and a pipeline whose pools + join aggregators reserve every
slot deadlocks the task scheduler (observed live on a 4-CPU session).
Tasks are fully elastic; the cache makes them as cheap as actor state.
"""

from __future__ import annotations

from typing import Any

import ray

_CACHE: dict[Any, Any] = {}


def bget(ref: "ray.ObjectRef") -> Any:
    """Fetch-once-per-process broadcast read."""
    if ref not in _CACHE:
        _CACHE[ref] = ray.get(ref)
    return _CACHE[ref]
