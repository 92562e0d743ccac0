"""Snapshot diff between two corpus releases — the incremental-ingest
operator the reference's monthly-release cadence implies but never
implements (it always reprocesses the full dump: ``dblpclient.py``
fetches the latest monthly release whole, ``s2client`` re-downloads
every release file).  At 100 TB a monthly full reprocess is the
single biggest avoidable cost; the diff is what an incremental
pipeline ingests instead.

Semantics: full outer join of (key, content-hash) projections —
``added`` (key only in new), ``deleted`` (key only in old),
``changed`` (both sides, hash differs); unchanged rows are dropped.

Scale shape: each side is reduced to (key, md5-hex) INSIDE its first
map_batches pass, so document payloads never cross the join's
all-to-all exchange — only two thin columns do.  The join itself is
the hash full_outer (q07's 100 TB form).  md5 per row is a Python
call — the documented price of a bit-exact SQL cross-check (DuckDB
``md5()`` replays it verbatim; production would use the vectorized
crc32/sha1 kernels in functions/urls.py at 30x the rate).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .relational import JOIN_ARGS, _NPART


def _hash_project(ds: rd.Dataset, key: str, content: str, alias: str) -> rd.Dataset:
    def h(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: b[key].astype("int64"),
                alias: [
                    hashlib.md5(t.encode()).hexdigest() for t in b[content]
                ],
            }
        )

    return ds.map_batches(h, batch_format="pandas")


def snapshot_diff(
    old: rd.Dataset, new: rd.Dataset, key: str = "doc_id",
    content: str = "text",
) -> rd.Dataset:
    """(key, status) rows for every key whose content was added,
    deleted, or changed between ``old`` and ``new``."""
    o = _hash_project(old, key, content, "h_old")
    n = _hash_project(new, key, content, "h_new")
    j = o.join(
        n, join_type="full_outer", num_partitions=_NPART,
        on=(key,), right_on=(key,), **JOIN_ARGS,
    )

    def classify(t: pa.Table) -> pa.Table:
        ho, hn = t["h_old"], t["h_new"]
        status = pc.if_else(
            pc.is_null(ho),
            pa.scalar("added"),
            pc.if_else(pc.is_null(hn), pa.scalar("deleted"), pa.scalar("changed")),
        )
        keep = pc.or_kleene(
            pc.or_(pc.is_null(ho), pc.is_null(hn)), pc.not_equal(ho, hn)
        )
        out = pa.table({key: t[key], "status": status})
        return out.filter(pc.fill_null(keep, False))

    return j.map_batches(classify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# q59 — driver entry: old snapshot DERIVED deterministically from the
# documents table (so the SQL oracle rebuilds the identical old side
# with no /tmp artifact): docs with doc_id % 7 == 0 are missing from
# old ("added" in new), docs with doc_id % 11 == 3 carry stale text
# ("changed"), and old has tombstone rows at doc_id + 1_000_000 for
# doc_id % 13 == 0 ("deleted" in new).
# ---------------------------------------------------------------------------
def q59_release_diff(sf_dir: str) -> rd.Dataset:
    new = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def make_old(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["doc_id"] % 7 != 0].copy()
        stale = keep["doc_id"] % 11 == 3
        keep.loc[stale, "text"] = "STALE " + keep.loc[stale, "text"]
        gone = b[b["doc_id"] % 13 == 0]
        tomb = pd.DataFrame(
            {
                "doc_id": gone["doc_id"].astype("int64") + 1_000_000,
                "text": "tombstone",
            }
        )
        return pd.concat([keep[["doc_id", "text"]], tomb], ignore_index=True)

    old = new.map_batches(make_old, batch_format="pandas")
    return snapshot_diff(old, new)
