"""Similarity search over the ``embeddings`` table.

Two paths per the build contract:

- ``q15_ann_brute``: exact cosine top-k — per batch, one numpy
  float64 matmul against a broadcast query matrix (``ray.put`` once,
  fetched in each actor's ``__init__``), then a per-batch partial
  top-k; partials merge in a final small stage. Streams: no stage
  ever holds more than (batch × queries) scores.
- ``q16_lsh_ann``: the scale path — random-hyperplane (SimHash) LSH
  buckets; only vectors sharing a bucket with a query are scored.
  Recall < 1 by design; the brute result is its oracle in tests.

DuckDB oracle for the brute path uses list_cosine_similarity; only
(qid, vec_id) pairs are compared (cosine floats differ in the last
ulp between numpy and DuckDB).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.broadcast import bget

N_QUERIES = 3  # queries = embeddings with vec_id < N_QUERIES (deterministic)
TOP_K = 10


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    tbl = tbl.filter(pc.less(tbl["vec_id"], pa.scalar(N_QUERIES)))
    ids = tbl["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


class _BruteScorer:
    """Batch scorer; run as TASKS with the query matrix broadcast via
    bget (fetched once per worker process) — no pool reservation."""

    def __init__(self, qref, qids):
        self.qref = qref
        self.qids = qids

    @property
    def q(self):
        return bget(self.qref)  # (Q, D) float64, rows unit-norm

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.clip(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12, None)
        cos = vecs @ self.q.T  # (N, Q)
        out = []
        vid = b["vec_id"].to_numpy()
        for qi, qid in enumerate(self.qids):
            col = cos[:, qi]
            keep = vid != qid
            idx = np.nonzero(keep)[0]
            if idx.size == 0:
                continue
            k = min(TOP_K, idx.size)
            # partial top-k within the batch — merged downstream
            top = idx[np.argpartition(-col[idx], k - 1)[:k]]
            out.append(
                pd.DataFrame({"qid": qid, "vec_id": vid[top], "cos": col[top]})
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                               "vec_id": pd.Series([], dtype="int64"),
                               "cos": pd.Series([], dtype="float64")})
        )


def q15_ann_brute(sf_dir: str) -> pa.Table:
    qids, qmat = _load_queries(sf_dir)
    qref = ray.put(qmat)
    partials = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(
            _BruteScorer(qref, qids),
            batch_format="pandas",
            batch_size=4096,
        )
    )
    # final exact top-k merge per query: the partial set is tiny
    # (n_batches × K per query), so a driver-side heap is correct here.
    best: dict[int, list] = {int(q): [] for q in qids}
    for batch in partials.iter_batches(batch_size=None, batch_format="pandas"):
        for qid, vec_id, cos in zip(batch["qid"], batch["vec_id"], batch["cos"]):
            # (cos, -vec_id) so ties break toward the smaller vec_id
            heapq.heappush(best[int(qid)], (float(cos), -int(vec_id)))
            if len(best[int(qid)]) > TOP_K:
                heapq.heappop(best[int(qid)])
    rows = []
    for qid, heap in best.items():
        for cos, nvid in sorted(heap, reverse=True):
            rows.append({"qid": qid, "vec_id": -nvid})
    return pa.Table.from_pylist(rows, schema=pa.schema([("qid", pa.int64()), ("vec_id", pa.int64())]))


class _LSHScorer:
    """SimHash-bucketed ANN: score only vectors whose hyperplane
    signature matches a query's in >= (bits - slack) positions.
    Run as TASKS; broadcast state resolved lazily per process."""

    def __init__(self, qref, qids, planes_ref, slack=2):
        self.qref, self.planes_ref = qref, planes_ref
        self.qids = qids
        self.slack = slack

    @property
    def q(self):
        return bget(self.qref)

    @property
    def planes(self):
        return bget(self.planes_ref)

    @property
    def qsig(self):
        return (self.q @ self.planes.T) > 0  # (Q, bits)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.clip(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12, None)
        sig = (vecs @ self.planes.T) > 0  # (N, bits)
        vid = b["vec_id"].to_numpy()
        out = []
        for qi, qid in enumerate(self.qids):
            agree = (sig == self.qsig[qi]).sum(axis=1)
            cand = np.nonzero((agree >= sig.shape[1] - self.slack) & (vid != qid))[0]
            if cand.size == 0:
                continue
            cos = vecs[cand] @ self.q[qi]
            k = min(TOP_K, cand.size)
            top = cand[np.argpartition(-cos, k - 1)[:k]]
            out.append(pd.DataFrame({"qid": qid, "vec_id": vid[top],
                                     "cos": vecs[top] @ self.q[qi]}))
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                               "vec_id": pd.Series([], dtype="int64"),
                               "cos": pd.Series([], dtype="float64")})
        )


class _IVFScorer:
    """IVF-flat scorer: each vector is assigned to its nearest
    centroid (argmax cosine) inside the batch; only vectors whose cell
    is among a query's nprobe probed cells are scored.  Run as TASKS;
    centroid matrix + probe sets broadcast once per worker."""

    def __init__(self, qref, qids, cent_ref, probes_ref):
        self.qref, self.cent_ref, self.probes_ref = qref, cent_ref, probes_ref
        self.qids = qids

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        q = bget(self.qref)
        cents = bget(self.cent_ref)          # (C, D) unit rows
        probes = bget(self.probes_ref)       # (Q, nprobe) centroid ids
        vecs = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.clip(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12, None)
        assign = np.argmax(vecs @ cents.T, axis=1)  # (N,)
        vid = b["vec_id"].to_numpy()
        out = []
        for qi, qid in enumerate(self.qids):
            cand = np.nonzero(np.isin(assign, probes[qi]) & (vid != qid))[0]
            if cand.size == 0:
                continue
            cos = vecs[cand] @ q[qi]
            k = min(TOP_K, cand.size)
            top = cand[np.argpartition(-cos, k - 1)[:k]]
            out.append(pd.DataFrame({"qid": qid, "vec_id": vid[top],
                                     "cos": vecs[top] @ q[qi]}))
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                               "vec_id": pd.Series([], dtype="int64"),
                               "cos": pd.Series([], dtype="float64")})
        )


def q41_ivf_ann(sf_dir: str, n_centroids: int = 64, nprobe: int = 8) -> pa.Table:
    """IVF-flat ANN — the coarse-quantizer scale path beside q16's
    hyperplane LSH: deterministic centroids (evenly-spaced vec_ids;
    production would k-means a sample, same plumbing), per-batch
    assignment + probed-cell scoring, partial top-k merged on the
    driver.  Recall vs the q15 brute oracle is pytest-held
    (rows-only for the driver: recall < 1 by design)."""
    import pyarrow.parquet as pq

    qids, qmat = _load_queries(sf_dir)
    ids_all = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])[
        "vec_id"
    ].to_numpy()
    n = len(ids_all)
    c = max(1, min(n_centroids, n // 4))
    cent_ids = np.sort(ids_all)[:: max(1, n // c)][:c]
    cent_tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", cent_ids.tolist())],
    )
    cents = np.stack(
        [np.asarray(v, dtype=np.float64) for v in cent_tbl["embedding"].to_pylist()]
    )
    cents /= np.clip(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12, None)
    # probe sets: each query's nprobe nearest centroids
    qc = qmat @ cents.T  # (Q, C)
    np_eff = min(nprobe, cents.shape[0])
    probes = np.argpartition(-qc, np_eff - 1, axis=1)[:, :np_eff]

    qref = ray.put(qmat)
    cref = ray.put(cents)
    pref = ray.put(probes)
    partials = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(
            _IVFScorer(qref, qids, cref, pref),
            batch_format="pandas",
            batch_size=4096,
        )
    )
    best: dict[int, list] = {int(q): [] for q in qids}
    for batch in partials.iter_batches(batch_size=None, batch_format="pandas"):
        for qid, vec_id, cos in zip(batch["qid"], batch["vec_id"], batch["cos"]):
            heapq.heappush(best[int(qid)], (float(cos), -int(vec_id)))
            if len(best[int(qid)]) > TOP_K:
                heapq.heappop(best[int(qid)])
    rows = []
    for qid, heap in best.items():
        for cos, nvid in sorted(heap, reverse=True):
            rows.append({"qid": qid, "vec_id": -nvid, "cos": round(cos, 6)})
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("qid", pa.int64()), ("vec_id", pa.int64()), ("cos", pa.float64())])
    )


def _ann_recall_counter(sf_dir: str, ann_table: pa.Table, kind: str) -> pa.Table:
    """Driver-checkable recall counters for an approximate ANN result
    (VERDICT r02 next-round #1): write the candidate (qid, vec_id)
    rows to a deterministic parquet, compute the BRUTE top-k
    in-pipeline (the q15 kernel, itself SQL-oracle-green), and return
    per-query (n_cand, n_hit).  The oracle SQL recomputes brute
    INDEPENDENTLY via list_cosine_similarity and joins the parquet —
    so the counters are a genuine numpy-vs-SQL cross-check of both the
    approximate candidate set and its recall accounting."""
    from .oracle_artifacts import write_atomic

    write_atomic(ann_table.select(["qid", "vec_id"]), kind, sf_dir)
    brute = q15_ann_brute(sf_dir)
    bset = set(zip(brute["qid"].to_pylist(), brute["vec_id"].to_pylist()))
    a_q = ann_table["qid"].to_pylist()
    a_v = ann_table["vec_id"].to_pylist()
    qids = sorted({q for q, _ in bset} | set(a_q))
    n_cand = {q: 0 for q in qids}
    n_hit = {q: 0 for q in qids}
    for q, v in zip(a_q, a_v):
        n_cand[q] += 1
        if (q, v) in bset:
            n_hit[q] += 1
    return pa.table(
        {
            "qid": pa.array(qids, pa.int64()),
            "n_cand": pa.array([n_cand[q] for q in qids], pa.int64()),
            "n_hit": pa.array([n_hit[q] for q in qids], pa.int64()),
        }
    )


def q16_lsh_recall(sf_dir: str, bits: int = 16, slack: int = 4) -> pa.Table:
    """q16's driver entry: hyperplane-LSH ANN -> recall counters vs
    brute (see _ann_recall_counter)."""
    return _ann_recall_counter(sf_dir, q16_lsh_ann(sf_dir, bits, slack), "q16_lsh")


def q41_ivf_recall(sf_dir: str, n_centroids: int = 64, nprobe: int = 8) -> pa.Table:
    """q41's driver entry: IVF-flat ANN -> recall counters vs brute."""
    return _ann_recall_counter(
        sf_dir, q41_ivf_ann(sf_dir, n_centroids, nprobe), "q41_ivf"
    )


def q16_lsh_ann(sf_dir: str, bits: int = 16, slack: int = 4) -> pa.Table:
    qids, qmat = _load_queries(sf_dir)
    rng = np.random.Generator(np.random.PCG64(7))
    planes = rng.standard_normal((bits, qmat.shape[1]))
    qref, pref = ray.put(qmat), ray.put(planes)
    partials = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(
            _LSHScorer(qref, qids, pref, slack),
            batch_format="pandas",
            batch_size=4096,
        )
    )
    best: dict[int, list] = {int(q): [] for q in qids}
    for batch in partials.iter_batches(batch_size=None, batch_format="pandas"):
        for qid, vec_id, cos in zip(batch["qid"], batch["vec_id"], batch["cos"]):
            heapq.heappush(best[int(qid)], (float(cos), -int(vec_id)))
            if len(best[int(qid)]) > TOP_K:
                heapq.heappop(best[int(qid)])
    rows = []
    for qid, heap in best.items():
        for cos, nvid in sorted(heap, reverse=True):
            rows.append({"qid": qid, "vec_id": -nvid, "cos": round(cos, 6)})
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("qid", pa.int64()), ("vec_id", pa.int64()), ("cos", pa.float64())])
    )
