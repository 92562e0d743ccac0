"""Distributed k-means + semantic (cluster-bucketed) near-dup.

The SemDeDup-shaped path a 100 TB training-data pipeline needs on top
of the LSH/MinHash family in ``pipelines/dedup.py``: cluster the
embedding space with k-means, then search for near-duplicates ONLY
inside each cluster — the cluster is the bucket, so all-pairs work
drops from O(n²) to Σ|cluster|².

Reference scale analog: the reference's only dedup is the md5 file
cache (``dblpclient.py:442-443``); this module is part of the
beyond-reference dedup surface the build contract asks for.

Determinism contract (the repo invariant: ordering is data, float
sums are block-order-dependent): ALL k-means arithmetic is int64
fixed-point —

- vectors quantize to ``round(v * 2^20)`` (embeddings are unit-norm,
  so |q| < 2^20 and a 64-dim squared distance < 2^47: exact in int64),
- assignment = integer argmin of squared distance, ties to the lowest
  cluster index,
- centroid update = ``(Σq + count//2) // count`` (floor division,
  identical in numpy ``floor_divide`` and Python ``//``),

so per-batch partial sums fold to the same centroids regardless of
block count, order, or parallelism, and the distributed fit is
bit-identical to the sequential pure-Python oracle
(``oracle_artifacts._build_kmeans``) the driver's SQL reads.

Scale shape (Lloyd's): each iteration is one ``map_batches`` pass
emitting k partial (count, Σq) rows per block — only O(blocks × k × d)
ints reach the driver, never vectors.  The embeddings dataset is
``materialize()``-d once (vec_id + embedding only) because an
iterative fit re-reads its input ``iters`` times; at 100 TB this is
the standard cache-or-re-read trade and the object store spills it.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.broadcast import bget

KM_SCALE = 1 << 20
KM_K = 8
KM_ITERS = 8


def quantize_embeddings(mat: np.ndarray) -> np.ndarray:
    """float -> int64 fixed-point (round-half-even, matching Python
    ``round``)."""
    return np.rint(np.asarray(mat, dtype=np.float64) * KM_SCALE).astype(np.int64)


def assign_clusters(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Integer argmin of exact squared distance; ties -> lowest index.

    Loops over k (small) rather than materializing an (n, k, d) cube;
    every op is int64-exact so the result is order-independent."""
    best_d = None
    best = np.zeros(len(q), dtype=np.int32)
    for ci in range(len(cents)):
        diff = q - cents[ci]
        d = np.einsum("ij,ij->i", diff, diff)  # int64 exact (< 2^47)
        if best_d is None:
            best_d = d
        else:
            better = d < best_d  # strict: ties keep the lower index
            best[better] = ci
            best_d = np.minimum(best_d, d)
    return best


def _stack_embeddings(col: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col.to_numpy()])


def stack_embeddings_arrow(col) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float64 by flatten+reshape —
    one vectorized copy instead of n per-row np.asarray calls (the
    ANN/dedup table loads were paying a Python loop per vector).
    Raises on ragged rows (reshape fails loudly); embeddings are
    fixed-d, null-free lists."""
    import pyarrow as _pa

    ca = col.combine_chunks() if isinstance(col, _pa.ChunkedArray) else col
    if len(ca) == 0:
        # reshape(0, -1) cannot infer d — refuse loudly instead of
        # surfacing numpy's baffling "cannot reshape size 0" (every
        # caller reads a table that must be non-empty: queries,
        # centroids, corpus)
        raise ValueError("stack_embeddings_arrow: empty embedding column")
    flat = ca.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(ca), -1)


def _embeddings_ds(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


@ray.remote
def _block_minK(t, k: int) -> pd.DataFrame:
    df = t.to_pandas()
    return df.nsmallest(k, "vec_id") if len(df) else df


def _init_centroids_refs(refs: list, k: int) -> np.ndarray:
    """Deterministic data-derived init: the k smallest vec_ids'
    quantized vectors (partial min-k per block via plain tasks over
    the materialized refs -> bounded driver merge — the q09 top-k
    shape, no extra Dataset pipeline)."""
    parts = ray.get([_block_minK.remote(r, k) for r in refs])
    parts = [p for p in parts if len(p)]
    if not parts:  # reach the loud guard below, not an opaque
        # "No objects to concatenate" from pd.concat on an empty table
        raise ValueError(f"k-means needs >= k={k} rows; embeddings table has 0")
    rows = (
        pd.concat(parts, ignore_index=True)
        .nsmallest(k, "vec_id")
        .sort_values("vec_id")
    )
    if len(rows) < k:
        # fail loudly: the Lloyd partials are shaped (k, d+1), so a
        # short centroid matrix would crash later with an opaque
        # boolean-mask shape mismatch
        raise ValueError(
            f"k-means needs >= k={k} rows; embeddings table has {len(rows)}"
        )
    return quantize_embeddings(_stack_embeddings(rows["embedding"]))


# driver-side fit cache: q46 and q47 share one fit per input (the
# centroid matrix is k×d ints — trivially small; the fit is `iters`
# dataset passes, worth not repeating)
_FIT_CACHE: dict[tuple, np.ndarray] = {}


@ray.remote
def _quantize_block(t) -> np.ndarray:
    """Arrow block -> quantized int64 (n, d) matrix, computed ONCE and
    parked in plasma for every Lloyd iteration to read zero-copy (the
    old per-iteration map_batches re-quantized every block every
    iteration AND paid ~0.5 s/iter of Dataset pipeline startup)."""
    df = t.to_pandas()
    if len(df) == 0:
        return np.zeros((0, 1), dtype=np.int64)
    return quantize_embeddings(_stack_embeddings(df["embedding"]))


@ray.remote
def _kmeans_partial(q: np.ndarray, cents: np.ndarray, k: int) -> np.ndarray:
    """One block's (counts | Σq) partial as a single (k, d+1) int64
    array — int sums are order-independent, so any fold order is
    bit-identical."""
    d = cents.shape[1]
    out = np.zeros((k, d + 1), dtype=np.int64)
    if len(q) == 0 or q.shape[1] != d:
        return out
    a = assign_clusters(q, cents)
    np.add.at(out[:, 0], a, 1)
    np.add.at(out[:, 1:], a, q)
    return out


def kmeans_fit(
    sf_dir: str, k: int = KM_K, iters: int = KM_ITERS
) -> np.ndarray:
    """Distributed Lloyd's fit -> int64 centroid matrix (k, d).

    Plain tasks over pre-quantized plasma blocks (the q56 PageRank
    shape): quantization happens once, each iteration is one task
    round returning (k, d+1) int64 partials the driver folds as they
    land — O(blocks × k × d) ints move per iteration, never vectors."""
    key = (sf_dir, k, iters)
    if key in _FIT_CACHE:
        return _FIT_CACHE[key]
    ds = _embeddings_ds(sf_dir).materialize()
    refs = ds.to_arrow_refs()
    cents = _init_centroids_refs(refs, k)
    d = cents.shape[1]
    qrefs = [_quantize_block.remote(r) for r in refs]
    for _ in range(iters):
        cref = ray.put(cents)
        pending = [_kmeans_partial.remote(qr, cref, k) for qr in qrefs]
        agg = np.zeros((k, d + 1), dtype=np.int64)
        while pending:
            done, pending = ray.wait(pending, num_returns=1)
            agg += ray.get(done[0])
        counts, sums = agg[:, 0], agg[:, 1:]
        nz = counts > 0
        new_c = cents.copy()
        new_c[nz] = np.floor_divide(
            sums[nz] + (counts[nz] // 2)[:, None], counts[nz][:, None]
        )
        if np.array_equal(new_c, cents):
            break  # converged — further iterations are identity
        cents = new_c
    _FIT_CACHE[key] = cents
    return cents


def q46_kmeans(sf_dir: str, k: int = KM_K, iters: int = KM_ITERS) -> rd.Dataset:
    """(vec_id, cluster) assignment under the distributed fit.

    SQL oracle: ``oracle_artifacts._build_kmeans`` re-derives the same
    spec with pure-Python ints, sequentially, in one process — a
    genuinely independent execution path (catches dtype/overflow/
    batch-boundary bugs in the vectorized fit, the naive_text
    philosophy)."""
    cents = kmeans_fit(sf_dir, k, iters)
    cref = ray.put(cents)

    def label(b: pd.DataFrame) -> pd.DataFrame:
        c = bget(cref)
        q = quantize_embeddings(_stack_embeddings(b["embedding"]))
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].astype("int64"),
                "cluster": assign_clusters(q, c).astype(np.int32),
            }
        )

    return _embeddings_ds(sf_dir).map_batches(label, batch_format="pandas")


def q47_semantic_dedup(
    sf_dir: str,
    threshold: float = 0.45,
    k: int = KM_K,
    iters: int = KM_ITERS,
) -> pa.Table:
    """SemDeDup-shaped semantic near-dup: exact cosine pairs WITHIN
    each k-means cluster; each duplicate row points at its lowest-id
    in-cluster neighbor above threshold -> (vec_id, dup_of, cos).

    Scale: the cluster id is the shuffle key (k keyed groups, payload
    = the cluster's vectors only); within a cluster the comparison is
    one float64 matmul.  Giant clusters would recurse through the
    hyperplane-bucketed q23 path — at this suite's scale a cluster is
    a single group task.  Threshold 0.45 for the same reason as q23b
    (random embeddings: max pair cosine ~0.5).

    min-id (not max-cos) is the representative rule so the output is
    float-comparison-free: cos is reported, never compared against
    another cos."""
    cents = kmeans_fit(sf_dir, k, iters)
    cref = ray.put(cents)

    def label(b: pd.DataFrame) -> pd.DataFrame:
        c = bget(cref)
        q = quantize_embeddings(_stack_embeddings(b["embedding"]))
        b = b[["vec_id", "embedding"]].copy()
        b["cluster"] = assign_clusters(q, c).astype(np.int32)
        return b

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy().astype(np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "dup_of": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        m = _stack_embeddings(g["embedding"])
        m /= np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
        cos = m @ m.T
        # qualifying lower-id neighbor mask (strict lower triangle)
        mask = (cos >= threshold) & (ids[None, :] < ids[:, None])
        has = mask.any(axis=1)
        # rows sorted by vec_id => argmax(mask) = LOWEST qualifying id
        j = np.argmax(mask, axis=1)
        ii = np.nonzero(has)[0]
        return pd.DataFrame(
            {
                "vec_id": ids[ii],
                "dup_of": ids[j[ii]],
                # half-away like DuckDB's round() — np.round is
                # banker's, which flips the value hash at an exact
                # x.xxxxx5 boundary (the q23b flake class); kept
                # values are >= threshold > 0 so +0.5-floor is safe
                "cos": np.floor(cos[ii, j[ii]] * 1e6 + 0.5) / 1e6,
            }
        )

    from .dedup import _typed_pairs

    out = (
        _embeddings_ds(sf_dir)
        .map_batches(label, batch_format="pandas")
        .groupby("cluster")
        .map_groups(pairs, batch_format="pandas")
    )
    # dup sets are tiny relative to the corpus; materialize with an
    # explicit schema so an EMPTY result still carries its columns
    return _typed_pairs(out, ("vec_id", "dup_of", "cos"))


# ---------------------------------------------------------------------------
# q77 — per-dimension normalization statistics over the embedding
# column: the standardize-before-ANN / whitening prep (mean–variance
# per dimension feeds a (x - μ)/σ transform).  Components are
# TRUNC-fixed-point at 1e6 (float32 -> exact float64 -> *1e6 ->
# trunc: every step is bit-identical between numpy and DuckDB — round
# would tie-break differently between the engines), so the
# distributed int64 fold is order-independent and the SQL oracle
# replays the values exactly.
#
# Scale shape: one map_batches pass emits a (d, 3)-int partial per
# block — d ints to the driver per block, never vectors; the driver
# folds n_blocks × d bounded rows.  int64 headroom: |q| <= 1e6·|v|,
# sumsq per row <= ~1e12 at |v|<=1 — safe to ~1e6 rows per dimension;
# beyond that the same partials fold hierarchically (or into Python
# ints) before the final table.
# ---------------------------------------------------------------------------
VEC_FIXED_SCALE = 1_000_000


def q77_dim_stats(sf_dir: str) -> pa.Table:
    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # empty block: a zero-row partial (d is unknowable here)
            e = pa.array([], pa.int64())
            return pa.table({"dim": e, "n": e, "sum_q": e, "sumsq_q": e})
        x = stack_embeddings_arrow(t["embedding"])  # (n, d) float64
        q = np.trunc(x * VEC_FIXED_SCALE).astype(np.int64)
        d = q.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "n": pa.array(np.full(d, len(q), dtype=np.int64)),
                "sum_q": pa.array(q.sum(axis=0, dtype=np.int64)),
                "sumsq_q": pa.array((q * q).sum(axis=0, dtype=np.int64)),
            }
        )

    parts = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(partials, batch_format="pyarrow")
        .to_pandas()  # bounded: n_blocks × d rows of 4 ints
    )
    agg = (
        parts.groupby("dim", as_index=False)[["n", "sum_q", "sumsq_q"]]
        .sum()
        .sort_values("dim")
    )
    return pa.table(
        {
            "dim": pa.array(agg["dim"].to_numpy(), pa.int64()),
            "n": pa.array(agg["n"].to_numpy(), pa.int64()),
            "sum_q": pa.array(agg["sum_q"].to_numpy(), pa.int64()),
            "sumsq_q": pa.array(agg["sumsq_q"].to_numpy(), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q88 — per-label centroid-distance outliers: flag embeddings far
# from their own class centroid (the "mislabeled / semantic outlier
# sample" gate an embedding-quality pipeline runs before training).
# All-integer: coordinates trunc-quantized at 1e6 (q77's convention),
# centroid = floor(sum/n) per (label, dim), distance = Σ(x−c)² in
# int64 (d·(4e6)² ≈ 1e15 ≪ 2^63), outlier = distance above the
# label's exact P90 (shared `_disc_quantiles` rank machinery).
#
# Scale shape: centroid partials are (labels × d × blocks) int rows to
# a driver fold (labels × d result — bounded); the distance pass is
# stateless with the centroid table broadcast once; the quantile pass
# shuffles only (label, distance-value) histogram rows; the flag pass
# maps over the materialized (vec_id, label, dist) triples — the wide
# embedding column is read exactly twice and never shuffled.
# ---------------------------------------------------------------------------
OUTLIER_Q = ((9, 10),)  # flag above the per-label exact P90


def _quant_batch(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Trunc-quantized (n, d) int64 coords + int64 labels — the q77
    fixed-point convention, shared by q88/q90."""
    x = stack_embeddings_arrow(t["embedding"])
    q = np.trunc(x * VEC_FIXED_SCALE).astype(np.int64)
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    return q, lab


def _label_centroids(ds: rd.Dataset) -> dict[int, np.ndarray]:
    """Per-label integer centroids trunc(sum/n) per dimension, from
    bounded (labels × d × blocks) partials folded on the driver."""

    def cent_partials(t: pa.Table) -> pa.Table:
        q, lab = _quant_batch(t)
        uniq, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(cnt, d)),
            }
        )

    parts = (
        ds.map_batches(cent_partials, batch_format="pyarrow")
        .to_pandas()  # bounded: n_blocks × labels × d int rows
    )
    agg = parts.groupby(["label", "dim"], as_index=False)[["s", "n"]].sum()
    cents: dict[int, np.ndarray] = {}
    for lab, grp in agg.groupby("label"):
        grp = grp.sort_values("dim")
        # TRUNCATING division (toward zero) — DuckDB's // truncates
        # (-7 // 2 = -3, probed), so numpy's flooring // would put
        # negative-sum centroids one unit low; sign-adjusted abs-div
        # stays exact at any magnitude (no float round-trip)
        s = grp["s"].to_numpy(np.int64)
        n = grp["n"].to_numpy(np.int64)
        cents[int(lab)] = np.sign(s) * (np.abs(s) // n)
    return cents


def q88_centroid_outliers(sf_dir: str) -> rd.Dataset:
    from .relational import _disc_quantiles

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    cref = ray.put(_label_centroids(ds))

    def dist(t: pa.Table) -> pa.Table:
        q, lab = _quant_batch(t)
        cd = bget(cref)
        uniq, inv = np.unique(lab, return_inverse=True)
        c = np.stack([cd[int(u)] for u in uniq])[inv]
        diff = q - c
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "label": pa.array(lab),
                "dist_q": pa.array((diff * diff).sum(axis=1, dtype=np.int64)),
            }
        )

    dd = ds.map_batches(dist, batch_format="pyarrow").materialize()  # 3 ints/row

    def kv(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": t["label"].to_numpy(zero_copy_only=False).astype(str),
                "vc": t["dist_q"].to_numpy(zero_copy_only=False),
            }
        )

    p = _disc_quantiles(dd.map_batches(kv, batch_format="pyarrow"), OUTLIER_Q)
    p90 = {int(k): int(v) for k, v in zip(p["k"], p["q0"])}
    pref = ray.put(p90)

    def flag(t: pa.Table) -> pa.Table:
        th = bget(pref)
        lab = t["label"].to_numpy(zero_copy_only=False)
        dq = t["dist_q"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(lab, return_inverse=True)
        thr = np.array([th[int(u)] for u in uniq], dtype=np.int64)[inv]
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "label": pa.array(lab),
                "dist_q": pa.array(dq),
                "is_outlier": pa.array((dq > thr).astype(np.int64)),
            }
        )

    return dd.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# q90 — nearest-class-centroid assignment (the label-noise audit /
# Rocchio-classifier pass): assign every embedding to its NEAREST
# label centroid and report the true-vs-predicted confusion counts —
# off-diagonal mass is the "these samples sit in another class's
# region" signal a labeling pipeline reviews before training.
# Shares q88's integer machinery end to end: trunc-quantized coords,
# trunc-division centroids (`_label_centroids`), int64 squared
# distances; a distance tie picks the SMALLEST label on both sides.
#
# Scale shape: centroids come from bounded driver-folded partials
# (q88), broadcast ONCE as a (labels, d) matrix; the assignment pass
# is stateless (one int64 matmul per batch against the broadcast
# matrix — labels are tens, so the (n, labels) distance block is
# tiny); only (labels × labels × blocks) confusion partials reach the
# driver fold.  The embedding column is read twice, never shuffled.
# ---------------------------------------------------------------------------
def q90_nearest_centroid(sf_dir: str) -> rd.Dataset:
    import pandas as pd

    # no vec_id: the confusion matrix never names vectors, so don't
    # read + ship the id column through both passes
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )
    cents = _label_centroids(ds)
    labs_sorted = np.array(sorted(cents), dtype=np.int64)
    cmat = np.stack([cents[int(l)] for l in labs_sorted])  # (L, d) int64
    cref = ray.put((labs_sorted, cmat))

    def assign(t: pa.Table) -> pa.Table:
        q, lab = _quant_batch(t)
        labs, C = bget(cref)
        # ||q−c||² = ||q||² + ||c||² − 2 q·cᵀ, all int64 exact:
        # |coord| ≤ ~8e6 ⇒ the dot term ≤ d·64e12 ≈ 4e15 ≪ 2^63
        d2 = (
            (q * q).sum(axis=1, dtype=np.int64)[:, None]
            + (C * C).sum(axis=1, dtype=np.int64)[None, :]
            - 2 * (q @ C.T)
        )
        # argmin returns the FIRST minimum; labs is ascending, so a
        # distance tie picks the smallest label (oracle: ORDER BY
        # d2, label LIMIT 1)
        pred = labs[np.argmin(d2, axis=1)]
        c = (
            pd.DataFrame({"true_label": lab, "pred_label": pred})
            .groupby(["true_label", "pred_label"], sort=False, as_index=False)
            .size()
        )
        return pa.table(
            {
                "true_label": pa.array(c["true_label"].to_numpy(np.int64)),
                "pred_label": pa.array(c["pred_label"].to_numpy(np.int64)),
                "n_vectors": pa.array(c["size"].to_numpy(np.int64)),
            }
        )

    parts = (
        ds.map_batches(assign, batch_format="pyarrow")
        .to_pandas()  # bounded: n_blocks × labels² partial rows
    )
    out = parts.groupby(["true_label", "pred_label"], as_index=False)[
        "n_vectors"
    ].sum()
    return rd.from_arrow(
        pa.table(
            {
                "true_label": pa.array(out["true_label"].to_numpy(np.int64)),
                "pred_label": pa.array(out["pred_label"].to_numpy(np.int64)),
                "n_vectors": pa.array(out["n_vectors"].to_numpy(np.int64)),
            }
        )
    )


# ---------------------------------------------------------------------------
# q101 — top principal component by deterministic integer power
# iteration (the PCA/whitening prep beside q77's per-dim stats: the
# direction to project out / normalize before ANN or clustering).
# All arithmetic is exact: coords trunc-quantized at 1e6 (q77), mean
# sign-trunc(sum/n) (q88's division convention), the centered
# second-moment matrix M = Σqqᵀ − c·Σqᵀ − Σq·cᵀ + n·ccᵀ assembled
# from per-block partials, and PCA_ITERS power steps in Python big
# ints with trunc renormalization to ±1e6 — so the distributed run is
# BIT-IDENTICAL to a sequential pure-Python re-derivation (the
# 'pca_seq' oracle artifact), like q46/q56/q66.
#
# Scale shape: one map_batches pass emits (d², d, 1) int partials per
# block — d²=4096 ints, never rows; the driver folds blocks × d²
# partials in Python ints (no overflow at any corpus size) and runs
# the d²-cost iteration once.  int64 block-partial headroom is
# guarded loudly (Σq² per cell ≤ rows·max|q|² must fit int64).
# ---------------------------------------------------------------------------
PCA_ITERS = 12


def q101_pca_power(sf_dir: str) -> pa.Table:
    from .oracle_artifacts import ensure

    ensure("pca_seq", sf_dir)
    return pca_power_engine(sf_dir)


def pca_power_engine(sf_dir: str) -> pa.Table:
    """q101's engine body without the oracle-artifact build (probes
    time this directly; the serial artifact is O(n·d²) Python)."""

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # empty Ray Data block (block splitting past row count on
            # tiny tables): contribute only the zero count row, like
            # q94's _knn_quant_block guard (r04 ADVICE)
            return pa.table(
                {
                    "i": pa.array([-1], pa.int64()),
                    "j": pa.array([-1], pa.int64()),
                    "v": pa.array([0], pa.int64()),
                }
            )
        x = stack_embeddings_arrow(t["embedding"])
        q = np.trunc(x * VEC_FIXED_SCALE).astype(np.int64)
        n, d = q.shape
        mx = int(np.abs(q).max(initial=0))
        if n * mx * mx >= 2**62:  # refuse loudly before int64 wrap
            raise ValueError(
                f"q101 block too large for exact int64 partials: "
                f"{n} rows x (max|q|={mx})^2"
            )
        s2 = q.T @ q  # (d, d) int64 exact under the guard
        ii = np.repeat(np.arange(d, dtype=np.int64), d)
        jj = np.tile(np.arange(d, dtype=np.int64), d)
        return pa.table(
            {
                "i": pa.array(np.r_[ii, np.arange(d, dtype=np.int64), [-1]]),
                "j": pa.array(np.r_[jj, np.full(d, -1, np.int64), [-1]]),
                "v": pa.array(
                    np.r_[s2.ravel(), q.sum(axis=0, dtype=np.int64), [n]]
                ),
            }
        )

    parts = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(partials, batch_format="pyarrow")
        .to_pandas()  # BOUNDED: blocks × (d² + d + 1) int rows
    )
    # fold in PYTHON ints: exact at any block count
    acc: dict[tuple[int, int], int] = {}
    for i, j, v in parts.itertuples(index=False):
        key = (int(i), int(j))
        acc[key] = acc.get(key, 0) + int(v)
    n = acc.pop((-1, -1))
    d = max(i for i, j in acc if j == -1) + 1
    sq = [acc.pop((i, -1)) for i in range(d)]
    comp = pca_power_from_moments(acc, sq, n, d)
    return pa.table(
        {
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "comp_ppm": pa.array(np.array(comp, dtype=np.int64)),
        }
    )


def pca_power_from_moments(s2: dict, sq: list, n: int, d: int,
                           iters: int = PCA_ITERS) -> list:
    """The deterministic integer power iteration over exact moments.
    The 'pca_seq' oracle artifact re-derives the SAME spec with an
    INDEPENDENT pure-Python implementation (oracle_artifacts._build_pca
    — no code shared), so any drift between the two is a caught bug,
    the q46/q56/q66 discipline."""
    c = [(1 if s >= 0 else -1) * (abs(s) // n) for s in sq]
    m = [
        [
            s2[(i, j)] - c[i] * sq[j] - sq[i] * c[j] + n * c[i] * c[j]
            for j in range(d)
        ]
        for i in range(d)
    ]
    v = [1] * d
    for _ in range(iters):
        w = [sum(m[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w) or 1
        v = [x * VEC_FIXED_SCALE // mx for x in w]
    # canonical sign: the largest-|coord| dim (smallest index on tie)
    # points positive
    lead = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[lead] < 0:
        v = [-x for x in v]
    return v
