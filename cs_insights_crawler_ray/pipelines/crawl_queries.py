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


def _payload_parquet(out: str) -> str:
    """Oracle-readable PARQUET view of the crawl payload.  The sink is
    dual-backend (sources/sinks.py): the parquet branch writes part
    files directly under payload/wave=*/ — returned as-is; the Lance
    branch writes versioned fragments that DuckDB and plain
    read_parquet cannot scan version-correctly, so the committed
    payload is mirrored once to parquet beside it (read through
    sinks.read_payload, which honors versions and skips uncommitted
    partitions)."""
    import glob as _glob
    import shutil

    root = f"{out}/payload"
    if _glob.glob(f"{root}/*/*.parquet"):
        return root
    mirror = f"{out}/payload_pq"
    marker = Path(mirror) / "_complete"
    if not marker.exists():
        from ..sources.sinks import read_payload

        shutil.rmtree(mirror, ignore_errors=True)  # no half-mirror appends
        read_payload(root).write_parquet(mirror)
        marker.write_text("ok")
    return mirror


def _payload_glob(out: str) -> str:
    """read_parquet glob for the oracle-readable payload view (the
    parquet branch partitions by wave; the lance mirror is flat)."""
    root = _payload_parquet(out)
    return f"{root}/*/*.parquet" if root.endswith("/payload") else f"{root}/*.parquet"


def q30_crawl_order(sf_dir: str) -> pd.DataFrame:
    """The PARALLEL engine's crawl-order log (fetch_seq, url_canon,
    depth, status).  Driver oracle: the sequential reference-semantics
    simulator (pipelines/oracle_sim.py — independent execution
    machinery) replays the identical config and writes ITS order log
    to parquet (oracle_artifacts 'sim_order'); the SQL side reads that,
    so the driver value-hashes parallel-vs-serial crawl ordering —
    the north-star invariant, now driver-checked, not just pytest."""
    from .oracle_artifacts import ensure

    ensure("sim_order", sf_dir)
    return read_crawl_log(_out_dir(sf_dir))


def _recency_cfg(sf_dir: str) -> CrawlConfig:
    """q30's config with the deterministic recency term on
    (freshness-first, one wave of age = one depth level) and the
    multimodal feature stage off (the order log is the artifact under
    test; q31/q32/q39 exercise the payload columns)."""
    import dataclasses

    return dataclasses.replace(
        _cfg_for(sf_dir), recency_weight=1.0, extract_features=False
    )


def _out_dir_recency(sf_dir: str) -> str:
    sf = Path(sf_dir).name
    out = f"/tmp/ciq_crawl_rec_{_VERSION}_{sf}"
    marker = Path(out) / "_complete"
    if not marker.exists():
        run_crawl(_recency_cfg(sf_dir), out)
        marker.write_text("ok")
    return out


def q67_recency_crawl_order(sf_dir: str) -> pd.DataFrame:
    """Crawl-order log of the PARALLEL engine with the deterministic
    recency score term on (CrawlConfig.recency_weight=1.0 — the
    north-star triplet's third term as wave age; state/politeness.py).
    Driver oracle: the sequential simulator replays the identical
    recency-weighted config and writes ITS order log to parquet
    (oracle_artifacts 'sim_order_recency'), so the driver value-hashes
    parallel-vs-serial ordering with the signal ON — q30 covers the
    two-term default."""
    from .oracle_artifacts import ensure

    ensure("sim_order_recency", sf_dir)
    return read_crawl_log(_out_dir_recency(sf_dir))


def q31_crawl_payload(sf_dir: str) -> pd.DataFrame:
    """The ingested payload table, projected to the input_hint schema
    minus raw bytes.  Driver oracle: the sequential simulator's payload
    table (oracle_artifacts 'sim_payload') — decoded w/h/fmt, caption
    equality and phash value-hashed parallel-vs-serial.  The extra
    feature/embedding columns the engine also lands are exercised by
    q32/q39 and pytest."""
    from .oracle_artifacts import ensure

    ensure("sim_payload", sf_dir)
    df = pq.read_table(
        _payload_parquet(_out_dir(sf_dir)),
        columns=["image_id", "w", "h", "fmt", "caption", "phash"],
    ).to_pandas()
    return df.sort_values("image_id").reset_index(drop=True)


def q32_payload_neardup(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """phash-hamming near-dup pairs over the crawled payload table —
    the input_hint's ``phash:int64`` column doing its job (SURVEY.md
    §2.7 D5), running the DISTRIBUTED banding kernel
    (dedup.hamming_near_dup_pairs) over the payload parquet rather
    than a driver loop (VERDICT r01 #3/#5).  max_hamming=3 keeps the
    4 x 16-bit banding pigeonhole-EXACT, which is what lets the DuckDB
    brute-force bit_count oracle hash-match."""
    import ray.data as rd

    from .dedup import hamming_near_dup_pairs

    ds = rd.read_parquet(_payload_parquet(_out_dir(sf_dir)), columns=["image_id", "phash"])
    # star_cap=None: this query's contract IS the exact all-pairs
    # listing the brute-force oracle computes — the default star cap
    # (256/bucket) would silently drop member-member pairs once a
    # phash band bucket grows past it (duplicate-heavy payloads).
    # q63 collapses these pairs to components, where star pairs would
    # suffice, but it reuses this exact listing so the two stay
    # consistent with one artifact.
    pairs = hamming_near_dup_pairs(
        ds, "image_id", "phash", max_hamming=max_hamming, id_dtype="object",
        star_cap=None,
    )
    out = pairs.to_pandas()
    if out.empty:  # empty groupby output loses its schema
        out = pd.DataFrame({"a": [], "b": [], "hamming": []})
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return out.astype({"hamming": "int64"})  # a/b stay object (matches DuckDB varchar)


def q39_payload_ann(sf_dir: str, k: int = 5, n_queries: int = 3) -> pd.DataFrame:
    """ANN over the CRAWLED payload's own embedding column (the
    multimodal stage feeding similarity search): brute-force cosine
    top-k of the first n_queries image_ids, distributed exactly like
    q15 (broadcast query matrix, per-batch partial top-k, tiny driver
    merge over n_batches x k partials) instead of the round-1 driver
    loop.  Cosine values are dropped from the output (numpy/DuckDB
    last-ulp differences); ordering ties break by neighbor_id."""
    import numpy as np
    import pyarrow.parquet as pq_
    import ray
    import ray.data as rd

    from ..functions.broadcast import bget

    out_dir = _out_dir(sf_dir)
    # query selection: the n smallest image_ids — read the id column
    # alone, then fetch just those rows' embeddings (pruned read)
    ppq = _payload_parquet(out_dir)
    all_ids = pq_.read_table(ppq, columns=["image_id"])["image_id"].to_pylist()
    qids = sorted(all_ids)[:n_queries]
    qt = pq_.read_table(
        ppq, columns=["image_id", "embedding"],
        filters=[("image_id", "in", qids)],
    )
    lut = {qt["image_id"][i].as_py(): i for i in range(qt.num_rows)}
    qmat = np.stack(
        [np.asarray(qt["embedding"][lut[q]].as_py(), dtype=np.float64) for q in qids]
    )
    qmat /= np.clip(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12, None)
    ref = ray.put((qids, qmat))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        ids_q, mat_q = bget(ref)
        vecs = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.clip(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12, None)
        vid = b["image_id"].to_numpy()
        cos = vecs @ mat_q.T  # (batch, Q)
        parts = []
        for qi, qid in enumerate(ids_q):
            keep = np.nonzero(vid != qid)[0]
            if keep.size == 0:
                continue
            kk = min(k, keep.size)
            # deterministic partial top-k (ADVICE r02): argpartition
            # drops cos-TIED candidates arbitrarily — break ties by
            # (cos desc, neighbor_id asc) via two stable mergesorts so
            # near-tied neighbors can't flip between kernel and oracle
            sec = np.argsort(vid[keep], kind="mergesort")
            prim = np.argsort(-cos[keep][sec, qi], kind="mergesort")
            top = keep[sec[prim][:kk]]
            parts.append(
                pd.DataFrame({"query_id": qid, "neighbor_id": vid[top], "cos": cos[top, qi]})
            )
        return (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"query_id": pd.Series([], dtype="object"),
                               "neighbor_id": pd.Series([], dtype="object"),
                               "cos": pd.Series([], dtype="float64")})
        )

    partials = (
        rd.read_parquet(ppq, columns=["image_id", "embedding"])
        .map_batches(score, batch_format="pandas", batch_size=2048)
        .to_pandas()
    )
    top = (
        partials.sort_values(["query_id", "cos", "neighbor_id"],
                             ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=True)
        .head(k)
    )
    top = top.assign(rank=top.groupby("query_id").cumcount() + 1)
    out = top[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
    return out.astype({"rank": "int64"})  # ids stay object (matches DuckDB varchar)


def q63_payload_dup_groups(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup CLUSTERS over the crawled payload: the q32 phash pair
    list collapsed into (image_id, group_rep) via the distributed
    connected-components kernel (dedup.connected_components) — the
    image-side analog of q38's text dup-groups, completing pairs ->
    groups for the multimodal column.

    Ids: image_id is a 40-hex sha1; components run on the int64 of
    its first 15 hex chars (60 bits).  Uniqueness of the prefixes is
    CHECKED (raise, not silent corruption); under unique prefixes
    prefix-int order == full-string order, so min-label group
    representatives agree exactly with the SQL oracle's recursive
    min-label walk over the same mapping."""
    import ray.data as rd

    from .dedup import connected_components

    pairs = q32_payload_neardup(sf_dir, max_hamming)
    if pairs.empty:
        return pd.DataFrame({"image_id": [], "group_rep": []}).astype(
            {"image_id": "object", "group_rep": "object"}
        )
    ids = sorted(set(pairs["a"]) | set(pairs["b"]))
    nid = {s: int(s[:15], 16) for s in ids}
    if len(set(nid.values())) != len(nid):
        raise ValueError("q63: 15-hex-char image_id prefix collision")
    back = {v: k for k, v in nid.items()}
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "a": [nid[x] for x in pairs["a"]],
                "b": [nid[x] for x in pairs["b"]],
            }
        )
    )
    cc = connected_components(edges).to_pandas()  # bounded: paired ids only
    out = pd.DataFrame(
        {
            "image_id": [back[i] for i in cc["doc_id"]],
            "group_rep": [back[g] for g in cc["group_id"]],
        }
    )
    return out.sort_values("image_id").reset_index(drop=True)


def q98_host_fetch_rollup(sf_dir: str) -> pd.DataFrame:
    """Per-host crawl funnel rollup over the PARALLEL engine's own
    order log: fetch count, 404 count, deepest level reached, first
    global admission — the per-host health report a crawl operator
    reads before re-budgeting politeness.  Computed DISTRIBUTED
    (per-block host partials → bounded hosts × blocks driver fold).
    Driver oracle: the identical SQL rollup over the SEQUENTIAL
    simulator's independently-produced order log (oracle_artifacts
    'sim_order'), so the compare gates BOTH the byte-identical crawl
    parity and this distributed aggregation.

    Scale shape: host cardinality is the politeness working set
    (bounded per partition by construction); partials are 4 ints per
    (host, block) and raw log rows never shuffle."""
    from .oracle_artifacts import ensure

    ensure("sim_order", sf_dir)
    return host_rollup(f"{_out_dir(sf_dir)}/crawl_log")


def host_rollup(log_dir: str) -> pd.DataFrame:
    """The distributed rollup over a crawl-log parquet dir (q98's
    engine body, callable on any run's log for tests/audits)."""
    import numpy as np
    import ray.data as rd

    def part(b: pd.DataFrame) -> pd.DataFrame:
        host = b["url_canon"].str.split("/", n=3).str[2]
        if host.isna().any():  # pandas groupby would DROP NaN keys
            # while the SQL oracle groups them under '' — refuse
            # loudly instead of silently diverging (r04 review)
            bad = b["url_canon"][host.isna()].iloc[0]
            raise ValueError(f"malformed url_canon in crawl log: {bad!r}")
        g = (
            pd.DataFrame(
                {
                    "host": host,
                    "one": np.ones(len(b), np.int64),
                    "is404": (b["status"] == "404").to_numpy(np.int64),
                    "depth": b["depth"].to_numpy(np.int64),
                    "seq": b["fetch_seq"].to_numpy(np.int64),
                }
            )
            .groupby("host", as_index=False)
            .agg(
                n_fetched=("one", "sum"),
                n_404=("is404", "sum"),
                max_depth=("depth", "max"),
                first_seq=("seq", "min"),
            )
        )
        return g

    parts = (
        rd.read_parquet(log_dir)
        .map_batches(part, batch_format="pandas")
        .to_pandas()  # BOUNDED: hosts × blocks rows of 4 ints
    )
    agg = parts.groupby("host", as_index=False).agg(
        n_fetched=("n_fetched", "sum"),
        n_404=("n_404", "sum"),
        max_depth=("max_depth", "max"),
        first_seq=("first_seq", "min"),
    )
    agg = agg.sort_values("host").reset_index(drop=True)
    return agg.astype(
        {
            "n_fetched": "int64",
            "n_404": "int64",
            "max_depth": "int64",
            "first_seq": "int64",
        }
    )
