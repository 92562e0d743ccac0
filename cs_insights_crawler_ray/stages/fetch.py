"""Fetch stage — the actor-pool replacement for the reference's serial
``download_in_chunks`` loop (reference ``s2client.py:25-47,146-157``:
one in-flight request, listing order).

A callable CLASS for ``map_batches(..., concurrency=(k,k))``: per-actor
state (the content-store config, the zipf pmf — the analog of an HTTP
session + API key header, reference ``s2client.py:79``) is built once
in ``__init__``; ``__call__`` resolves a batch of URLs against the
deterministic synthetic web.  HTTP-level failures are DATA (a status
column), never exceptions — the reference instead dies on the first
failed GET (SURVEY.md §4 "Retries: none").

Politeness note: the per-host request budget is enforced *upstream* by
wave admission (state/politeness.py); by the time a batch reaches this
pool every row is already admitted, so actors can run flat out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures.content_store import ContentStoreConfig, fetch_page


class FetchStage:
    def __init__(self, cfg: ContentStoreConfig):
        self.cfg = cfg
        self.pmf = cfg.host_pmf()  # computed once per actor
        self.n_fetched = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url_canon"].to_pylist()
        status, blobs, fmts, captions, links = [], [], [], [], []
        for u in urls:
            page = fetch_page(self.cfg, u, self.pmf)
            status.append(page["status"])
            blobs.append(page["bytes"])
            fmts.append(page["fmt"])
            captions.append(page["caption"])
            links.append(page["links"])
        self.n_fetched += len(urls)
        return (
            batch.append_column("status", pa.array(status, pa.string()))
            .append_column("bytes", pa.array(blobs, pa.binary()))
            .append_column("fmt", pa.array(fmts, pa.string()))
            .append_column("caption", pa.array(captions, pa.string()))
            .append_column("links", pa.array(links, pa.list_(pa.string())))
        )
