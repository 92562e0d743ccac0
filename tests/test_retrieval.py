"""BM25 retrieval (q71) determinism and semantics properties.

The value-level oracle compare runs via test_relational.py's
parametrized driver-gate mimic (q71 has a full DuckDB oracle); these
tests pin the properties that make that compare exact: block-split
invariance of the partial top-k, the int64-overflow bound of the
fixed-point score, and equality with an independent pure-Python
serial BM25 loop.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cs_insights_crawler_ray.pipelines import retrieval

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
_WORD = re.compile(r"[0-9a-z_]+")


def _serial_bm25(sf_dir: str, k: int = retrieval.BM25_TOP_K) -> pd.DataFrame:
    """Independent sequential loop: plain dicts + Python ints, no
    numpy, no shared kernels — re-derives the exact integer formula
    from the docstring spec."""
    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    toks = {
        int(r.doc_id): _WORD.findall(str(r.text).lower())
        for r in docs.itertuples()
    }
    n = len(docs)
    total = sum(len(t) for t in toks.values())
    avgdl = max(1, total // n)
    rows = []
    for qid, qtext in retrieval.BM25_QUERIES:
        terms = sorted(set(qtext.split()))
        df = {
            t: sum(1 for ts in toks.values() if t in ts) for t in terms
        }
        scored = []
        for did, ts in toks.items():
            dl = len(ts)
            s = 0
            matched = False
            for t in terms:
                tf = ts.count(t)
                if tf == 0:
                    continue
                matched = True
                idf = (1000 * n) // (df[t] + 1)
                tfn = (44000 * tf * avgdl) // (
                    20 * avgdl * tf + 6 * avgdl + 18 * dl
                )
                s += idf * tfn
            # a doc with a query term is a candidate even at integer
            # score 0 (tfn floors to 0 for huge docs) — oracle parity
            if matched:
                scored.append((s, did))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, did) in enumerate(scored[:k], 1):
            rows.append(
                {"qid": qid, "rank": rank, "doc_id": did, "score": s}
            )
    return pd.DataFrame(rows, dtype="int64")


def test_bm25_matches_serial_loop(ray_session):
    got = (
        retrieval.q71_bm25_topk(SF_DIR)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    want = (
        _serial_bm25(SF_DIR)
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want)


def test_bm25_block_split_invariant(ray_session):
    """Tiny blocks (forced by repartition) must not change any row:
    the partial top-k's tie-break matches the driver merge's."""
    import ray.data as rd

    import cs_insights_crawler_ray.pipelines.retrieval as rmod

    base = rmod.q71_bm25_topk(SF_DIR).to_pandas()

    orig = rd.read_parquet

    def shredded(path, **kw):
        return orig(path, **kw).repartition(13)

    rmod.rd.read_parquet = shredded
    try:
        split = rmod.q71_bm25_topk(SF_DIR).to_pandas()
    finally:
        rmod.rd.read_parquet = orig
    pd.testing.assert_frame_equal(
        base.sort_values(["qid", "rank"]).reset_index(drop=True),
        split.sort_values(["qid", "rank"]).reset_index(drop=True),
    )


def test_bm25_tfn_bound():
    """tfn < 2200 for ALL (tf, dl, avgdl) >= 1 — the bound that keeps
    idf*tfn inside int64 (retrieval.py docstring)."""
    for avgdl in (1, 7, 60, 10_000):
        for dl in (1, 5, avgdl, 100 * avgdl):
            for tf in (1, 2, 50, dl):
                tfn = (44000 * tf * avgdl) // (
                    20 * avgdl * tf + 6 * avgdl + 18 * dl
                )
                assert 0 <= tfn < 2200


def test_bm25_zero_score_doc_still_ranks(ray_session, tmp_path):
    """A doc whose integer BM25 score floors to 0 (huge dl, one term
    occurrence) is still a candidate — the SQL oracle ranks it, so the
    engine must too (review repro: the old nonzero(score) filter
    dropped it)."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines import retrieval as rmod

    # avgdl = 85000//5001 = 16; dl = 80000 > 2443*16 so tfn floors to 0
    texts = ["filler"] * 5000 + ["xx " * 79_999 + "dup"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df.to_parquet(tmp_path / "documents.parquet")
    got = rmod.q71_bm25_topk(str(tmp_path)).to_pandas()
    q4 = got[got["qid"] == 4]
    assert len(q4) == 1
    assert q4.iloc[0]["doc_id"] == 5000 and q4.iloc[0]["score"] == 0


def test_rag_context_composition(ray_session):
    """q106: chunks appear for EXACTLY the q71 hit docs, each labeled
    with that doc's (qid, rank), and per-doc chunks equal q85's layout
    for the same doc."""
    from cs_insights_crawler_ray.pipelines import retrieval as rmod
    from cs_insights_crawler_ray.pipelines import textops

    sf = "/root/testdata/sf0.001"
    got = rmod.q106_rag_context(sf).to_pandas()
    hits = rmod.q71_bm25_topk(sf).to_pandas()
    want_pairs = set(zip(hits["qid"], hits["rank"], hits["doc_id"]))
    assert set(zip(got["qid"], got["rank"], got["doc_id"])) == want_pairs
    chunks = textops.q85_context_chunks(sf).to_pandas()
    for (qid, doc), sub in got.groupby(["qid", "doc_id"]):
        ref = chunks[chunks["doc_id"] == doc].sort_values("chunk_id")
        sub = sub.sort_values("chunk_id")
        assert sub["chunk_text"].tolist() == ref["chunk_text"].tolist()
        assert sub["n_tokens"].tolist() == ref["n_tokens"].tolist()
