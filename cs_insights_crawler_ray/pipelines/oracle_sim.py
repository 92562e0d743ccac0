"""Sequential reference-semantics oracle for the crawl engine.

A tiny in-process simulator implementing the reference crawler's
semantics — strictly serial fetch in deterministic listing order
(reference ``s2client.py:153-156``: one in-flight request,
``enumerate`` order), an EXACT seen set, the same politeness budget,
robots rules, scoring, and payload gates as the engine — used as the
byte-identical parity target (BASELINE.json north_star; SURVEY.md §5
item 1).

It shares ONLY the pure-function layer with the engine (content
store, canonicalizer, codec, politeness formulas); the execution
machinery (lists, dicts, one loop) is deliberately independent so a
bug in the Ray dataflow cannot cancel out in the comparison.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..fixtures.content_store import fetch_page, robots_allowed, seed_urls
from ..functions.imagecodec import LOSSY, decode_image, phash64, psnr
from ..functions.urls import canonicalize_url, host_of, path_query_of, url_sha1
from ..state.politeness import HOST_RANK_CAP
from .crawl import CrawlConfig


@dataclass
class SimResult:
    crawl_log: list = field(default_factory=list)   # (fetch_seq, url_canon, depth, status)
    payload: dict = field(default_factory=dict)     # image_id -> row dict
    seen: set = field(default_factory=set)          # sha1 bytes
    by_wave: dict = field(default_factory=dict)
    fetch_count: int = 0


def simulate(cfg: CrawlConfig) -> SimResult:
    res = SimResult()
    store = cfg.store
    pmf = store.host_pmf()

    # ---- seeds: canonical, robots-filtered, first-occurrence dedupe ----
    backlog: list[dict] = []
    for idx, raw in enumerate(seed_urls(store, cfg.n_seeds)):
        canon = canonicalize_url(raw)
        host = host_of(canon)
        if not robots_allowed(store, host, path_query_of(canon)):
            continue
        sha = url_sha1(canon)
        if sha in res.seen:
            continue
        res.seen.add(sha)
        backlog.append(
            dict(url_canon=canon, sha=sha, host=host, depth=0,
                 dk=(-1, -1, idx))
        )

    next_seq = 0
    for wave in range(cfg.n_waves):
        if not backlog:
            break
        # ---- politeness admission ----
        by_host: dict[str, list] = {}
        for row in backlog:
            by_host.setdefault(row["host"], []).append(row)
        auth = getattr(cfg, "authority", None) or {}
        rw = float(getattr(cfg, "recency_weight", 0.0) or 0.0)
        admissible = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: r["dk"])
            for rank, row in enumerate(rows[: cfg.host_budget]):
                score = row["depth"] + 0.001 * min(rank, HOST_RANK_CAP)
                if rw:
                    # deterministic recency: wave age (dk[0] is the
                    # discovery wave; -1 for seeds), same association
                    # as politeness._budget_scored
                    score = score + rw * float(wave - row["dk"][0])
                # authority tie-break (negated: higher authority first),
                # mirroring politeness.partition_candidates exactly
                admissible.append(
                    (score, -auth.get(row["url_canon"], 0), row["dk"], row)
                )
        admissible.sort(key=lambda x: (x[0], x[1], x[2]))
        admitted = [row for _, _, _, row in admissible[: cfg.wave_size]]
        if not admitted:
            break
        admitted_shas = {r["sha"] for r in admitted}

        # ---- serial fetch in order; payload; link discovery ----
        n_payload = 0
        new_rows: list[dict] = []
        for row in admitted:
            seq = next_seq
            next_seq += 1
            page = fetch_page(store, row["url_canon"], pmf)
            res.fetch_count += 1
            res.crawl_log.append((seq, row["url_canon"], row["depth"], page["status"]))
            if page["status"] == "200":
                try:
                    pixels, fmt = decode_image(page["bytes"])
                    from ..fixtures.content_store import page_pixels

                    truth = page_pixels(store, row["url_canon"])
                    ok = (
                        psnr(pixels, truth) >= 40.0
                        if fmt in LOSSY
                        else pixels.shape == truth.shape and bool(np.array_equal(pixels, truth))
                    )
                except ValueError:
                    ok = False
                if ok:
                    h, w = pixels.shape[:2]
                    res.payload[row["sha"].hex()] = dict(
                        image_id=row["sha"].hex(), w=w, h=h, fmt=fmt,
                        caption=page["caption"], phash=phash64(pixels),
                    )
                    n_payload += 1
                for li, raw in enumerate(page["links"]):
                    canon = canonicalize_url(raw)
                    host = host_of(canon)
                    if not robots_allowed(store, host, path_query_of(canon)):
                        continue
                    depth = row["depth"] + 1
                    if depth > cfg.max_depth:
                        continue
                    sha = url_sha1(canon)
                    if sha in res.seen:
                        continue
                    res.seen.add(sha)
                    new_rows.append(
                        dict(url_canon=canon, sha=sha, host=host, depth=depth,
                             dk=(wave, seq, li))
                    )
        backlog = [r for r in backlog if r["sha"] not in admitted_shas] + new_rows
        res.by_wave[wave] = dict(
            admitted=len(admitted), payload_rows=n_payload, new_urls=len(new_rows),
            backlog=len(backlog),
        )
    return res
