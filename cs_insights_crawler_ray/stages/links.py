"""Link discovery stages: explode out-links, canonicalize, robots
filter.

The robots filter is the actor-pool stage holding the per-host rules
cache (north_rule "robots.txt cache actor"): rules are resolved once
per host per actor (a simulated robots.txt fetch, counted for the
lineage metrics) and memoized — the reference has no robots handling
because its universe is two fixed APIs; the cache-per-actor pattern is
its `requests.Session`-per-client analog (``s2client.py:79``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures.content_store import ContentStoreConfig, robots_allowed
from ..functions.urls import canonicalize_batch


def explode_links(batch: pa.Table, wave: int) -> pa.Table:
    """fetched rows -> one row per out-link, carrying the full
    discovery key (disc_wave = wave the parent was fetched in,
    disc_parent = parent's fetch_seq, disc_link = position in the
    page's link list — the parallel-safe restatement of the
    reference's listing order, ``s2client.py:153``)."""
    links = batch["links"]
    parent_seq = batch["fetch_seq"].to_numpy(zero_copy_only=False)
    depth = batch["depth"].to_numpy(zero_copy_only=False)
    counts = np.asarray([len(x) if x is not None else 0 for x in links.to_pylist()], dtype=np.int64)
    flat_urls = [u for page in links.to_pylist() if page for u in page]
    n = int(counts.sum())
    link_idx = np.concatenate([np.arange(c) for c in counts]) if n else np.array([], dtype=np.int64)
    return pa.table(
        {
            "url": pa.array(flat_urls, pa.string()),
            "disc_wave": pa.array(np.full(n, wave, dtype=np.int32), pa.int32()),
            "disc_parent": pa.array(np.repeat(parent_seq, counts), pa.int64()),
            "disc_link": pa.array(link_idx.astype(np.int32), pa.int32()),
            "depth": pa.array(np.repeat(depth + 1, counts), pa.int32()),
        }
    )


class RobotsFilterStage:
    """Actor-pool stage: memoized per-host robots rules; keeps only
    allowed URLs. `cache_misses` counts simulated robots.txt fetches."""

    def __init__(self, cfg: ContentStoreConfig):
        self.cfg = cfg
        self.cache: dict[str, bool] = {}  # host -> has_rules (resolved lazily)
        self.cache_misses = 0

    def _allowed(self, host: str, path: str) -> bool:
        if host not in self.cache:
            self.cache[host] = True  # "fetch" robots.txt once per host per actor
            self.cache_misses += 1
        return robots_allowed(self.cfg, host, path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_pylist()
        canon = batch["url_canon"].to_pylist()
        mask = pa.array(
            [self._allowed(h, c.split(h, 1)[1]) for h, c in zip(hosts, canon)],
            pa.bool_(),
        )
        return batch.filter(mask)


def canonicalize_links(batch: pa.Table) -> pa.Table:
    return canonicalize_batch(batch, url_col="url")
