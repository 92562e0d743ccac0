"""queries() adapters for the crawl engine — run a small
deterministic crawl (scale derived from the sf_dir name) and expose
its artifacts as tables (rows-only oracle: the wave scheduler is not
SQL-expressible; parity is asserted against the sequential simulator
in tests/test_crawl_parity.py instead).

Results are cached per (sf, config-version) under /tmp so the
driver's repeated calls don't re-crawl.
"""

from __future__ import annotations

import os
from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq

from ..fixtures.content_store import ContentStoreConfig
from .crawl import CrawlConfig, read_crawl_log, run_crawl

_VERSION = "v2"  # bump when _cfg_for changes (cache key)


def _cfg_for(sf_dir: str) -> CrawlConfig:
    sf = Path(sf_dir).name.replace("sf", "") or "0.01"
    waves = {"0.001": 3, "0.01": 4, "0.1": 6}.get(sf, 4)
    return CrawlConfig(
        store=ContentStoreConfig(seed=42, n_hosts=32, pages_per_host=2000),
        n_seeds=32,
        host_budget=4,
        wave_size=96,
        n_waves=waves,
        max_depth=8,
        n_shards=2,
        fetch_actors=2,
        extract_features=True,  # payload carries feature/embedding cols
    )


def _out_dir(sf_dir: str) -> str:
    sf = Path(sf_dir).name
    out = f"/tmp/ciq_crawl_{_VERSION}_{sf}"
    marker = Path(out) / "_complete"
    if not marker.exists():
        run_crawl(_cfg_for(sf_dir), out)
        marker.write_text("ok")
    return out


def q30_crawl_order(sf_dir: str) -> pd.DataFrame:
    """The deterministic crawl-order log (fetch_seq, url, depth, status)."""
    return read_crawl_log(_out_dir(sf_dir))


def q31_crawl_payload(sf_dir: str) -> pd.DataFrame:
    """The ingested payload table (input_hint schema) minus raw bytes."""
    df = pq.read_table(f"{_out_dir(sf_dir)}/payload").to_pandas()
    if "wave" in df.columns:
        df = df.drop(columns=["wave"])
    return (
        df.drop(columns=["bytes"])
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def q32_payload_neardup(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """phash-hamming near-dup pairs over the crawled payload table —
    the input_hint's ``phash:int64`` column doing its job (SURVEY.md
    §2.7 D5). Banding: 4 x 16-bit fragments (pigeonhole-exhaustive
    for hamming <= 3; wider radii trade recall, documented)."""
    import itertools

    import numpy as np

    df = q31_crawl_payload(sf_dir)[["image_id", "phash"]]
    ph = df["phash"].to_numpy().astype(np.int64)
    ids = df["image_id"].to_numpy()
    buckets: dict = {}
    for band in range(4):
        frag = (ph.astype(np.uint64) >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        for i, f in enumerate(frag):
            buckets.setdefault((band, int(f)), []).append(i)
    pairs = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for a, b in itertools.combinations(members, 2):
            d = bin((int(ph[a]) ^ int(ph[b])) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                pairs.add((min(ids[a], ids[b]), max(ids[a], ids[b]), d))
    out = pd.DataFrame(sorted(pairs), columns=["a", "b", "hamming"])
    return out.astype({"a": "string", "b": "string", "hamming": "int64"})


def q39_payload_ann(sf_dir: str, k: int = 5, n_queries: int = 3) -> pd.DataFrame:
    """ANN over the CRAWLED payload's own embedding column (the
    multimodal stage feeding similarity search): brute-force cosine
    top-k of the first n_queries images against the rest (rows-only
    oracle; the brute-force path itself is SQL-oracled on the
    embeddings table as q15)."""
    import numpy as np

    df = q31_crawl_payload(sf_dir)[["image_id", "embedding"]]
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat /= np.clip(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12, None)
    ids = df["image_id"].to_numpy()
    out = []
    for qi in range(min(n_queries, len(ids))):
        cos = mat @ mat[qi]
        order = np.argsort(-cos)
        picked = [j for j in order if j != qi][:k]
        for rank, j in enumerate(picked):
            out.append((ids[qi], ids[j], rank + 1, round(float(cos[j]), 6)))
    return pd.DataFrame(out, columns=["query_id", "neighbor_id", "rank", "cos"])
