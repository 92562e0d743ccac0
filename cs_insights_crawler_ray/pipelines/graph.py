"""Link-graph authority scoring (PageRank) over the deterministic
content store's link structure — the frontier-prioritization signal a
production crawl feeds back into admission (OPIC/PageRank-style
ordering; the reference fetches in plain listing order,
``s2client.py:146-157``, which is exactly what authority scoring
replaces at web scale).

Determinism contract (house invariant: ordering is data, float sums
are block-order-dependent): ALL rank arithmetic is int64 fixed-point —
ranks scale to ``PR_SCALE = 10^12``, per-edge contribution is
``rank // outdeg`` (floor), damping is ``(85 * inflow) // 100`` plus
the constant base ``(15 * (PR_SCALE // N)) // 100`` — so the
distributed fit is bit-identical to the sequential pure-Python oracle
(``oracle_artifacts._build_pagerank``) regardless of block order or
parallelism.  Mass lost to floor division is NOT redistributed
(documented; both sides drop it identically).

Scale shape per iteration (the adaptive pattern shared with
q05/q43): ranks bounded by ``BROADCAST_KEY_LIMIT`` broadcast as one
dense array (``ray.put`` once) to plain tasks over the materialized
edge block refs, each returning a dense int64 inflow partial the
driver folds as results land (see ``_iterate_broadcast``).  Above the
limit the same iteration runs as edges ⋈ ranks hash join + grouped
sum — ranks then never materialize on the driver (forced and
oracle-checked in tests).  The edge table is built once from the pure
fixture function ``page_links`` and materialized (iterative re-reads,
the q46 trade).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..fixtures.content_store import ContentStoreConfig, page_links
from .relational import (
    BROADCAST_KEY_LIMIT, JOIN_ARGS, _NPART, _grouped_sum_parts)

PR_SCALE = 10**12
PR_ITERS = 10
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 in exact rationals


def _graph_cfg(sf_dir: str) -> tuple[ContentStoreConfig, int]:
    """Deterministic graph universe per sf: every page of every host
    is a node, so every generated link lands in-universe (the store's
    link targets are uniform over pages_per_host)."""
    from pathlib import Path

    sf = Path(sf_dir).name.replace("sf", "") or "0.01"
    hosts, pages = {"0.001": (12, 32), "0.01": (24, 64), "0.1": (32, 128)}.get(
        sf, (24, 64)
    )
    return ContentStoreConfig(seed=42, n_hosts=hosts, pages_per_host=pages), hosts * pages


def _edges_batch(b: pd.DataFrame, cfg: ContentStoreConfig, pmf) -> pd.DataFrame:
    """(nid) rows -> (src, dst, outdeg) edge rows via the pure fixture
    link function.  Python loop over NODES (not edges) — edge
    generation is fixture setup, the iterations are the hot path."""
    P = cfg.pages_per_host
    srcs, dsts, degs = [], [], []
    for nid in b["nid"]:
        url = cfg.url(int(nid) // P, int(nid) % P)
        links = page_links(cfg, url, pmf)
        for link in links:
            host_s, page_s = link.rsplit("/p/", 1)
            hi = int(host_s.rsplit("h", 1)[1].split(".")[0])
            srcs.append(nid)
            dsts.append(hi * P + int(page_s))
            degs.append(len(links))
    return pd.DataFrame(
        {
            "src": np.array(srcs, np.int64),
            "dst": np.array(dsts, np.int64),
            "outdeg": np.array(degs, np.int64),
        }
    )


def build_edges(sf_dir: str) -> tuple[rd.Dataset, int]:
    cfg, n = _graph_cfg(sf_dir)
    pmf = cfg.host_pmf()
    nodes = rd.range(n).map_batches(
        lambda t: pa.table({"nid": t["id"]}), batch_format="pyarrow"
    )
    edges = nodes.map_batches(
        lambda b: _edges_batch(b, cfg, pmf), batch_format="pandas"
    ).materialize()
    return edges, n


@ray.remote
def _inflow_block(t: pa.Table, ranks: np.ndarray, n: int) -> np.ndarray:
    """Dense int64 inflow partial for one edge block — int sums are
    order-independent, so any accumulation order is bit-identical.
    ``ranks`` arrives by ObjectRef (ray.put once per iteration) and is
    a zero-copy plasma read in every task."""
    src = t["src"].to_numpy(zero_copy_only=False)
    c = ranks[src] // t["outdeg"].to_numpy(zero_copy_only=False)
    out = np.zeros(n, np.int64)
    np.add.at(out, t["dst"].to_numpy(zero_copy_only=False), c)
    return out


def _iterate_broadcast(edges: rd.Dataset, n: int, iters: int) -> np.ndarray:
    """Ranks fit the broadcast limit -> plain Ray tasks over the
    materialized edge block refs: one task per block returns a DENSE
    int64 inflow array (n*8 bytes, <=16 MB at the 2M-key limit) and
    the driver folds arrays as they land (ray.wait — one accumulator
    resident, not n_blocks).  This replaces a per-iteration Dataset
    pipeline whose fixed startup (~0.9 s/iter measured) dominated the
    actual compute by >100x at bench scale; the join form below
    remains the >limit path."""
    refs = edges.to_arrow_refs()
    ranks = np.full(n, PR_SCALE // n, np.int64)
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * (PR_SCALE // n)) // PR_DAMP_DEN
    for _ in range(iters):
        rref = ray.put(ranks)
        pending = [_inflow_block.remote(r, rref, n) for r in refs]
        inflow = np.zeros(n, np.int64)
        while pending:
            done, pending = ray.wait(pending, num_returns=1)
            inflow += ray.get(done[0])
        ranks = base + (PR_DAMP_NUM * inflow) // PR_DAMP_DEN
    return ranks


def _iterate_join(edges: rd.Dataset, n: int, iters: int) -> rd.Dataset:
    """The >limit form: ranks stay a Dataset; each iteration is one
    hash join + one coarse grouped sum; zero-inflow nodes are restored
    by unioning base rows for every node (their join rows vanish)."""
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * (PR_SCALE // n)) // PR_DAMP_DEN
    ranks = rd.range(n).map_batches(
        lambda t: pa.table(
            {
                "nid": t["id"],
                "rank": pa.array(
                    np.full(t.num_rows, PR_SCALE // n, np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    base_rows = rd.range(n).map_batches(
        lambda t: pa.table(
            {"dst": t["id"], "c85": pa.array(np.full(t.num_rows, base, np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(iters):
        joined = edges.join(
            ranks, join_type="inner", num_partitions=_NPART,
            on=("src",), right_on=("nid",), **JOIN_ARGS,
        )
        # raw contribution per edge; damping applies AFTER the inflow
        # sum so floor((85*sum)//100) matches the broadcast form
        contribs = joined.map_batches(
            lambda b: pd.DataFrame(
                {
                    "dst": b["dst"].to_numpy(),
                    "c85": b["rank"].to_numpy() // b["outdeg"].to_numpy(),
                }
            ),
            batch_format="pandas",
        )
        summed = _grouped_sum_parts(contribs, "dst", {"c85": "c85"}).map_batches(
            lambda b: pd.DataFrame(
                {
                    "dst": b["dst"].to_numpy(),
                    "c85": (PR_DAMP_NUM * b["c85"].to_numpy()) // PR_DAMP_DEN,
                }
            ),
            batch_format="pandas",
        )
        ranks = (
            _grouped_sum_parts(base_rows.union(summed), "dst", {"c85": "c85"})
            .map_batches(
                lambda b: pd.DataFrame(
                    {"nid": b["dst"].to_numpy(), "rank": b["c85"].to_numpy()}
                ),
                batch_format="pandas",
            )
            .materialize()
        )
    return ranks


def q56_pagerank(sf_dir: str, iters: int = PR_ITERS) -> rd.Dataset:
    edges, n = build_edges(sf_dir)
    if n <= BROADCAST_KEY_LIMIT:
        ranks = _iterate_broadcast(edges, n, iters)
        return rd.from_arrow(
            pa.table(
                {
                    "nid": pa.array(np.arange(n, dtype=np.int64)),
                    "rank": pa.array(ranks),
                }
            )
        )
    return _iterate_join(edges, n, iters)
