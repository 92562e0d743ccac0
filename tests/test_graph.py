"""PageRank (q56) determinism/semantics tests.

The value-level oracle compare runs in test_relational.py (the
parametrized driver-gate mimic picks q56 up from oracle_sql() — at
sf0.001 that exercises the broadcast iteration form); these tests pin
the join-form parity and the fixed-point invariants.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cs_insights_crawler_ray.pipelines import graph as G

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _run(sf_dir: str):
    return (
        G.q56_pagerank(sf_dir)
        .to_pandas()
        .sort_values("nid")
        .reset_index(drop=True)
    )


def test_pagerank_matches_sequential_oracle(ray_session):
    """Distributed broadcast iteration == the serial pure-Python-int
    loop, element for element (block order and parallelism exercise a
    completely different summation order)."""
    from cs_insights_crawler_ray.pipelines.oracle_artifacts import ensure

    seq = (
        pq.read_table(ensure("pagerank_seq", SF_DIR))
        .to_pandas()
        .sort_values("nid")
        .reset_index(drop=True)
    )
    got = _run(SF_DIR)
    assert got["nid"].tolist() == seq["nid"].tolist()
    assert got["rank"].tolist() == seq["rank"].tolist()


def test_pagerank_join_path_matches_broadcast(ray_session, monkeypatch):
    """The >BROADCAST_KEY_LIMIT form (ranks never on the driver) must
    be bit-identical to the broadcast form — including nodes with zero
    inflow, whose join rows vanish and are restored via base_rows."""
    bc = _run(SF_DIR)
    monkeypatch.setattr(G, "BROADCAST_KEY_LIMIT", 0)
    jn = _run(SF_DIR)
    assert bc.equals(jn)


def test_pagerank_mass_and_skew(ray_session):
    df = _run(SF_DIR)
    cfg, n = G._graph_cfg(SF_DIR)
    assert len(df) == n
    assert (df["rank"] > 0).all()
    # floor divisions only LOSE mass (documented, never redistributed)
    assert df["rank"].sum() <= G.PR_SCALE
    # zipf host targeting concentrates authority on low-index hosts
    assert df["rank"].max() > 2 * df["rank"].median()
