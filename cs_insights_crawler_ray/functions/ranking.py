"""Block-offset rank assignment over an already-sorted Dataset.

Sorted block order == global order, so a global 1-based rank column
is per-block `offset + arange` where offset is the prefix sum of the
preceding blocks' row counts — only n_blocks INTEGERS ever reach the
driver (the crawl engine's fetch_seq mechanism).  Shared by
relational.q08 (missing-key-first sort rank) and mlprep.q84
(deterministic shuffle order); factored here because the two copies
diverged once (the empty-post-sort-block schema guard was fixed in
one and not the other).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def rank_sorted(
    s: rd.Dataset, schema: dict[str, pa.DataType], rank_col: str
) -> rd.Dataset:
    """Append ``rank_col`` (int64, 1-based global position) to the
    sorted Dataset ``s``, keeping exactly the columns in ``schema``.
    ``schema`` also supplies the dtypes for empty post-sort blocks,
    which arrive with an EMPTY Arrow schema (no columns at all)."""
    refs = s.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
    out = [
        _rank_block.remote(r, int(o), schema, rank_col)
        for r, o in zip(refs, offsets)
    ]
    return rd.from_arrow_refs(out)


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _rank_block(
    t: pa.Table, offset: int, schema: dict[str, pa.DataType], rank_col: str
) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {
                **{c: pa.array([], dt) for c, dt in schema.items()},
                rank_col: pa.array([], pa.int64()),
            }
        )
    rnk = pa.array(np.arange(offset + 1, offset + 1 + t.num_rows), pa.int64())
    return pa.table({**{c: t[c] for c in schema}, rank_col: rnk})
