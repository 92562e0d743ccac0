"""Query-time retrieval over the document corpus: BM25 top-k search.

The reference engine ends at index-shaped artifacts (the corpus the
crawler ships downstream); a training-data engine also needs the
READ side — scoring a fixed query set against the corpus to pull
targeted slices (e.g. topic-targeted subcorpora, eval-set neighbour
audits).  This module adds BM25 (Robertson et al.) retrieval with the
repo's determinism contract:

* **All-integer scoring.**  Floats make `sum()` order-dependent and
  libm makes `ln` build-dependent, so the score is a fixed-point
  int64 the SQL oracle replays VERBATIM:

      avgdl   = max(1, T // N)              (integer corpus average)
      idf(t)  = (1000 * N) // (df_t + 1)    (integer idf surrogate)
      tfn     = (44000 * tf * avgdl)
                // (20*avgdl*tf + 6*avgdl + 18*dl)
      score   = sum_t idf(t) * tfn          (int64, order-free)

  ``tfn`` is BM25's tf saturation with k1=6/5, b=3/4 cleared of
  fractions (multiply num/den by 20*avgdl; SCALE=1000), so
  tfn < 2200 ALWAYS and ``idf*tfn`` stays under 2.2e6*N — int64-safe
  to N ≈ 4e11 documents.  Ties break (score DESC, doc_id ASC).

* **Scale shape.**  One stats pass computes df for the QUERY VOCAB
  ONLY (a ~dozen terms — never the corpus vocabulary) plus the token
  total, as per-block partials summed on the driver (O(blocks × |V_q|)
  tiny rows).  The scoring pass broadcasts the idf table once
  (`ray.put`) and emits per-block partial top-k per query, merged on
  the driver at O(blocks × Q × k) rows.  Document payloads never
  shuffle; there is no groupby anywhere.

Reference analog: the reference has no search surface; this extends
the corpus the ingest side produces (s2processor.py builds the corpus
this would query).  Tokenization is q13/q49/q65's `_WORD_RE` so the
inverted-index family and retrieval agree on terms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.broadcast import bget
from .mlprep import _WORD_RE

# fixed query set over the synthetic corpus vocabulary ("dup" is the
# rare term — df ~5% — exercising the idf contrast; terms within one
# query are unique by construction, mirrored DISTINCT in the oracle)
BM25_QUERIES: list[tuple[int, str]] = [
    (1, "hash join table"),
    (2, "fast scan filter"),
    (3, "window agg group sort"),
    (4, "dup stream"),
]
BM25_TOP_K = 10


def _tok_lists(b: pd.DataFrame) -> pd.Series:
    return b["text"].str.lower().str.findall(_WORD_RE)


def _flat_tokens(tok_lists: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(row_index_repeat, flat_token_array) for a batch."""
    lens = tok_lists.str.len().to_numpy(np.int64)
    rows = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
    if lens.sum() == 0:
        return rows, np.array([], dtype=object)
    flat = np.concatenate(
        [np.asarray(t, dtype=object) for t in tok_lists]
    )
    return rows, flat


def q71_bm25_topk(sf_dir: str, k: int = BM25_TOP_K) -> pa.Table:
    """Top-``k`` documents per query by integer BM25 ->
    (qid, rank, doc_id, score)."""
    qvocab = sorted({t for _, q in BM25_QUERIES for t in q.split()})
    vpos = {t: i for i, t in enumerate(qvocab)}
    nv = len(qvocab)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    # ---- pass 1: df over the query vocab + corpus token/doc totals.
    # Long (key, val) partials: one tiny frame per block, summed on
    # the driver — never a corpus-wide vocabulary aggregate.
    def stats_partial(b: pd.DataFrame) -> pd.DataFrame:
        tok_lists = _tok_lists(b)
        rows, flat = _flat_tokens(tok_lists)
        keys: list[str] = ["__N__", "__T__"]
        vals: list[int] = [len(b), int(len(flat))]
        if len(flat):
            hit = pd.Index(flat).isin(qvocab)
            if hit.any():
                sub = pd.DataFrame({"r": rows[hit], "t": flat[hit]})
                df_part = sub.drop_duplicates().groupby("t").size()
                keys.extend(df_part.index.astype(str))
                vals.extend(int(v) for v in df_part.to_numpy())
        return pd.DataFrame({"key": pd.Series(keys, dtype="object"),
                             "val": np.asarray(vals, np.int64)})

    stats = (
        docs.map_batches(stats_partial, batch_format="pandas")
        .to_pandas()  # bounded: n_blocks x (|V_q| + 2) rows
        .groupby("key")["val"].sum()
    )
    n_docs = int(stats["__N__"])
    total_tokens = int(stats["__T__"])
    avgdl = max(1, total_tokens // n_docs)
    idf = np.zeros(nv, np.int64)
    for t, i in vpos.items():
        df_t = int(stats.get(t, 0))
        idf[i] = (1000 * n_docs) // (df_t + 1)
    # per-query term-id sets (terms unique within a query by contract)
    q_tids = [
        (qid, np.asarray(sorted(vpos[t] for t in set(q.split())), np.int64))
        for qid, q in BM25_QUERIES
    ]
    lut = ray.put((idf, avgdl, q_tids, qvocab))

    # ---- pass 2: score + per-block partial top-k (zero shuffle)
    def score_partial(b: pd.DataFrame) -> pd.DataFrame:
        idf_l, avg_l, qt_l, vocab_l = bget(lut)
        tok_lists = _tok_lists(b)
        dl = tok_lists.str.len().to_numpy(np.int64)
        vid = b["doc_id"].to_numpy().astype(np.int64)
        rows, flat = _flat_tokens(tok_lists)
        empty = pd.DataFrame(
            {"qid": pd.Series([], dtype="int64"),
             "doc_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="int64")}
        )
        if len(flat) == 0:
            return empty
        tindex = pd.Index(vocab_l)
        tid = tindex.get_indexer(pd.Index(flat))  # -1 = not query vocab
        hit = tid >= 0
        if not hit.any():
            return empty
        # tf per (row, term): unique packed keys + counts
        key = rows[hit] * len(vocab_l) + tid[hit]
        uk, tf = np.unique(key, return_counts=True)
        r_u, t_u = uk // len(vocab_l), uk % len(vocab_l)
        tf = tf.astype(np.int64)
        dlr = dl[r_u]
        tfn = (44000 * tf * avg_l) // (
            20 * avg_l * tf + 6 * avg_l + 18 * dlr
        )
        contrib = idf_l[t_u] * tfn
        out = []
        for qid, tids in qt_l:
            sel = np.isin(t_u, tids)
            if not sel.any():
                continue
            score = np.zeros(len(b), np.int64)
            np.add.at(score, r_u[sel], contrib[sel])
            # candidates = docs containing >=1 query term — NOT docs
            # with nonzero score: tfn floors to 0 for a huge doc with
            # one occurrence, and the SQL oracle still ranks it
            # (review repro: 1e6-token doc, score 0, oracle rank 2)
            cand = np.unique(r_u[sel])
            kk = min(k, cand.size)
            # partial top-k with the DRIVER MERGE's tie-break (score
            # DESC, doc_id ASC) so block splits can't pick among ties
            top = cand[np.lexsort((vid[cand], -score[cand]))[:kk]]
            out.append(pd.DataFrame(
                {"qid": np.full(kk, qid, np.int64),
                 "doc_id": vid[top], "score": score[top]}
            ))
        return pd.concat(out, ignore_index=True) if out else empty

    partials = (
        docs.map_batches(score_partial, batch_format="pandas")
        .to_pandas()  # bounded: n_blocks x Q x k rows
    )
    frames = []
    for qid, _ in q_tids:
        g = partials[partials["qid"] == qid]
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        frames.append(g[["qid", "rank", "doc_id", "score"]])
    merged = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(columns=["qid", "rank", "doc_id", "score"])
    )
    return pa.Table.from_pandas(
        merged.astype(np.int64), preserve_index=False
    )


# ---------------------------------------------------------------------------
# q106 — RAG context assembly: the retrieval→context composition every
# retrieval-augmented pipeline runs — BM25 top-k (q71) picks the
# documents, the q85 window chunker explodes JUST those documents into
# model context windows, each labeled with the (qid, rank) that
# retrieved it.  Like q105, the stages are individually-oracled
# operators; the composition's only new degree of freedom is the
# wiring.
#
# Scale shape: the hit set is bounded by |queries| × k by contract, so
# it broadcasts (ray.put once); the corpus pays ONE stateless filtered
# pass that chunks only matching docs — never "chunk everything, then
# join".  Nothing shuffles; output streams.
# ---------------------------------------------------------------------------
def q106_rag_context(sf_dir: str, k: int = BM25_TOP_K) -> rd.Dataset:
    from .dedup import _sorted_lookup
    from .textops import chunk_batch

    hits = q71_bm25_topk(sf_dir, k).to_pandas()  # bounded: queries × k
    ids = np.sort(hits["doc_id"].unique().astype(np.int64))
    href = ray.put((ids, hits[["qid", "rank", "doc_id"]]))

    def chunk_hits(b: pd.DataFrame) -> pd.DataFrame:
        ids_l, hdf = bget(href)
        d = b["doc_id"].to_numpy(np.int64)
        _, hit = _sorted_lookup(ids_l, ids_l, d)
        sub = b[hit].reset_index(drop=True)
        empty = pd.DataFrame(
            {
                "qid": pd.Series(dtype=np.int64),
                "rank": pd.Series(dtype=np.int64),
                "doc_id": pd.Series(dtype=np.int64),
                "chunk_id": pd.Series(dtype=np.int64),
                "n_tokens": pd.Series(dtype=np.int64),
                "chunk_text": pd.Series(dtype=object),
            }
        )
        if not len(sub):
            return empty
        chunks = chunk_batch(sub)
        if not len(chunks):
            return empty
        out = chunks.merge(hdf, on="doc_id")
        return out[
            ["qid", "rank", "doc_id", "chunk_id", "n_tokens", "chunk_text"]
        ]

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(chunk_hits, batch_format="pandas")
