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

from collections import OrderedDict
from typing import Any

import ray

# Bounded LRU, not a plain dict: a long session (dress rehearsal runs
# ~70 queries in one Ray instance, several broadcasting large
# matrices/LUTs) would otherwise pin every broadcast object in every
# reused worker's heap forever.  Eviction only drops the local
# deserialized copy — the object store still holds the ref, so a
# re-read after eviction is one zero-copy fetch, not a recompute.
_CACHE_MAX = 32
_CACHE: OrderedDict[Any, Any] = OrderedDict()


def bget(ref: "ray.ObjectRef") -> Any:
    """Fetch-once-per-process broadcast read (bounded LRU)."""
    try:
        _CACHE.move_to_end(ref)
        return _CACHE[ref]
    except KeyError:
        pass
    val = ray.get(ref)
    _CACHE[ref] = val
    while len(_CACHE) > _CACHE_MAX:
        _CACHE.popitem(last=False)
    return val
