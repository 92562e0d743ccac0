"""Deduplication operators — exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

All follow the shuffle-frugal shape from the build contract:
vectorized per-batch sketching inside ``map_batches`` (signatures,
band rows), then a ``groupby`` whose shuffle moves only (key, id)
sketch rows — never document payloads.  Exact verification joins
payloads back for candidate pairs only (a set that is orders of
magnitude smaller than the corpus).

Reference analog: the corpus-level exact dedup is the md5-keyed
download cache + defaultdict key-merge (reference
``dblpclient.py:442-443``, ``s2processor.py:114-118``); everything
else is new surface required by the training-data contract.
"""

from __future__ import annotations

import itertools
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# MinHash parameters (public construction: universal hashing
# h_i(x) = (a_i x + b_i) mod p over 32-bit shingle hashes).
# p = 2^31-1 keeps a*x within uint64 (a < 2^31, x < 2^32 -> < 2^63),
# so the whole signature computation stays in vectorized uint64.
_P = (1 << 31) - 1
_K = 128          # signature length
_BAND_R = 4       # rows per band
_N_BANDS = _K // _BAND_R
_SHINGLE_N = 3    # word shingles


def _shingle_hashes(text: str, n: int = _SHINGLE_N) -> np.ndarray:
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.zeros(1, dtype=np.uint64)
    return np.fromiter(
        (zlib.crc32(g.encode("utf-8")) for g in grams), dtype=np.uint64, count=len(grams)
    )


def ngram_jaccard(a: str, b: str, n: int = _SHINGLE_N) -> float:
    sa = set(_shingle_hashes(a, n).tolist())
    sb = set(_shingle_hashes(b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


class MinHashStage:
    """MinHash band sketcher. Deliberately usable as a STATELESS task
    fn (an instance is cheap: the (a_i, b_i) permutation constants are
    128 uint64 draws from a fixed seed) — running it as tasks instead
    of an actor pool keeps CPU slots free for the downstream join
    aggregators on small sessions; per batch the signature is a
    (n_shingles x K) broadcasted min — numpy end to end."""

    def __init__(self, seed: int = 1729):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, _P, size=_K, dtype=np.uint64)
        self.b = rng.integers(0, _P, size=_K, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes(text)
        # (n,1)*(K,) + (K,) mod p — all within uint64 by construction
        vals = (x[:, None] * self.a + self.b) % np.uint64(_P)
        return np.min(vals, axis=0)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            sig = self.signature(text)
            bands = sig.reshape(_N_BANDS, _BAND_R)
            for bi in range(_N_BANDS):
                doc_ids.append(doc_id)
                band_ids.append(bi)
                band_hashes.append(zlib.crc32(bands[bi].tobytes()))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "band_id": pd.Series(band_ids, dtype="int32"),
                "band_hash": pd.Series(band_hashes, dtype="int64"),
            }
        )


def _typed_pairs(ds: rd.Dataset, cols: tuple) -> pa.Table:
    """Near-dup pair sets are tiny relative to the corpus (that is the
    point of dedup) — materialize with an explicit schema so an empty
    result still has one. Float col only for the 3rd name if present."""
    schema = pa.schema(
        [(c, pa.float64() if c in ("jaccard", "cos") else pa.int64()) for c in cols]
    )
    dfs = ds.to_pandas()
    if dfs.empty:
        return schema.empty_table()
    return pa.Table.from_pandas(dfs[list(cols)], schema=schema, preserve_index=False)


_STAGE_CACHE: dict[int, MinHashStage] = {}


def _minhash_bands(b: pd.DataFrame, seed: int = 1729) -> pd.DataFrame:
    """Stateless-task wrapper around MinHashStage with a per-process
    constant cache (tasks reuse worker processes, so the constants are
    built once per worker in practice)."""
    stage = _STAGE_CACHE.setdefault(seed, MinHashStage(seed))
    return stage(b)


# Buckets larger than this emit STAR pairs (min-id x each member)
# instead of all O(k^2) combinations: a degenerate bucket of 10k
# near-identical docs would otherwise produce 50M candidate pairs.
# Star pairs preserve cluster CONNECTIVITY (what connected_components
# needs to form dup groups) at O(k); only pairwise similarity scores
# between non-representative members are lost — and those pairs are
# recovered transitively through the group.
_STAR_BUCKET_SIZE = 256


def _pairs_from_groups(g: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(g["doc_id"].tolist()))
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
    if len(ids) > _STAR_BUCKET_SIZE:
        pairs = [(ids[0], other) for other in ids[1:]]
    else:
        pairs = list(itertools.combinations(ids, 2))
    return pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})


def minhash_lsh_candidates(docs: rd.Dataset) -> rd.Dataset:
    """documents(doc_id, text) -> distinct candidate pairs (a < b).

    Shuffle keys: (band_id, band_hash) for bucketing, (a, b) for the
    distinct. Only sketch rows and id pairs cross the exchanges."""
    bands = docs.map_batches(_minhash_bands, batch_format="pandas")
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _pairs_from_groups, batch_format="pandas"
    )
    # distinct (a, b): a pair can match in many bands
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# above this many candidate pairs, fetch texts via hash joins; below
# it, broadcast the candidate texts (two hash joins cost ~4-8s of
# aggregator-actor startup — wasteful when the candidate set is tiny)
BROADCAST_PAIR_LIMIT = 200_000


def q17_minhash_dedup(sf_dir: str, threshold: float = 0.7) -> rd.Dataset:
    """MinHash-LSH near-dup pairs over documents, exact-verified with
    n-gram Jaccard >= threshold.

    Text fetch for verification is adaptive: small candidate sets
    broadcast the candidate texts (one filtered pass over docs, zero
    shuffles); large sets use two hash joins so payloads only ever
    move for candidates (the 100 TB path)."""
    import ray

    from ..functions.broadcast import bget
    from .relational import JOIN_ARGS

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cand = minhash_lsh_candidates(docs).materialize()
    n_pairs = cand.count()

    if n_pairs == 0:
        return _typed_pairs(cand, ("a", "b", "jaccard"))

    if n_pairs <= BROADCAST_PAIR_LIMIT:
        ids = set()
        for row in cand.take_all():
            ids.add(row["a"]); ids.add(row["b"])
        id_ref = ray.put(ids)
        texts = {}
        for bt in docs.map_batches(
            lambda t: t.filter(
                pa.array([i in bget(id_ref) for i in t["doc_id"].to_pylist()])
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pandas"):
            texts.update(zip(bt["doc_id"], bt["text"]))
        text_ref = ray.put(texts)

        def verify_b(bt: pd.DataFrame) -> pd.DataFrame:
            lut = bget(text_ref)
            jac = [
                round(ngram_jaccard(lut[a], lut[b]), 6)
                for a, b in zip(bt["a"], bt["b"])
            ]
            out = pd.DataFrame({"a": bt["a"], "b": bt["b"], "jaccard": jac})
            return out[out["jaccard"] >= threshold]

        out = cand.map_batches(verify_b, batch_format="pandas")
        return _typed_pairs(out, ("a", "b", "jaccard"))

    ta = docs.map_batches(
        lambda t: t.rename_columns(["a", "text_a"]), batch_format="pyarrow"
    )
    tb = docs.map_batches(
        lambda t: t.rename_columns(["b", "text_b"]), batch_format="pyarrow"
    )
    joined = cand.join(
        ta, join_type="inner", num_partitions=2, on=("a",), **JOIN_ARGS
    ).join(tb, join_type="inner", num_partitions=2, on=("b",), **JOIN_ARGS)

    def verify(bt: pd.DataFrame) -> pd.DataFrame:
        jac = [
            round(ngram_jaccard(x, y), 6) for x, y in zip(bt["text_a"], bt["text_b"])
        ]
        out = pd.DataFrame({"a": bt["a"], "b": bt["b"], "jaccard": jac})
        return out[out["jaccard"] >= threshold]

    out = joined.map_batches(verify, batch_format="pandas")
    return _typed_pairs(out, ("a", "b", "jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash64(text: str) -> int:
    """Charikar simhash over word features (crc32-hashed, unweighted)."""
    toks = text.split()
    if not toks:
        return 0
    hs = np.fromiter((zlib.crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks))
    # widen to 64 bits by mixing (golden-ratio multiply)
    with np.errstate(over="ignore"):
        hs = hs * np.uint64(0x9E3779B97F4A7C15)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    val = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return val - (1 << 64) if val >= 1 << 63 else val


def hamming64_np(a: np.ndarray, b: int) -> np.ndarray:
    x = (a.astype(np.int64) ^ np.int64(b)).astype(np.uint64)
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def q22_simhash(sf_dir: str) -> rd.Dataset:
    """Per-document 64-bit simhash (rows-only oracle)."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "simhash": [simhash64(t) for t in b["text"]]}
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def simhash_near_dup_pairs(docs: rd.Dataset, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by simhash banding: 4 x 16-bit bands (a pair
    within hamming <= 3 of 64 bits must agree exactly on >= 1 band —
    pigeonhole), then exact hamming verification inside the group."""

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        sh = np.array([simhash64(t) for t in b["text"]], dtype=np.int64)
        rows = []
        for band in range(4):
            frag = (sh.astype(np.uint64) >> np.uint64(16 * band)) & np.uint64(0xFFFF)
            rows.append(
                pd.DataFrame(
                    {
                        "doc_id": b["doc_id"].astype("int64"),
                        "simhash": sh,
                        "band_id": np.int32(band),
                        "band_hash": frag.astype(np.int64),
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(set(zip(g["doc_id"].tolist(), g["simhash"].tolist())))
        out = []
        for (ida, sa), (idb, sb) in itertools.combinations(recs, 2):
            d = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                out.append((ida, idb, d))
        return pd.DataFrame(
            {
                "a": pd.Series([o[0] for o in out], dtype="int64"),
                "b": pd.Series([o[1] for o in out], dtype="int64"),
                "hamming": pd.Series([o[2] for o in out], dtype="int64"),
            }
        )

    return (
        docs.map_batches(sketch, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (LSH-bucketed)
# ---------------------------------------------------------------------------
def q23_embedding_near_dup(sf_dir: str, threshold: float = 0.95, bits: int = 12) -> rd.Dataset:
    """Vector near-dup: random-hyperplane bucket signature as the
    groupby key, exact cosine inside each bucket. Pairs straddling a
    bucket boundary are missed by design (scale/recall trade
    documented); the brute oracle in tests measures recall."""
    import pyarrow.parquet as pq

    dim = len(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"]).slice(0, 1)[
            "embedding"
        ][0]
    )
    rng = np.random.Generator(np.random.PCG64(11))
    planes = rng.standard_normal((bits, dim))

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(b["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.clip(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12, None)
        sig = ((vecs @ planes.T) > 0).astype(np.uint64)
        bucket = (sig << np.arange(bits, dtype=np.uint64)).sum(axis=1).astype(np.int64)
        return pd.DataFrame(
            {"vec_id": b["vec_id"].astype("int64"), "bucket": bucket, "vec": list(vecs)}
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
                 "cos": pd.Series([], dtype="float64")}
            )
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(g["vec"].to_numpy())[order]
        cos = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = cos[ii, jj] >= threshold
        return pd.DataFrame(
            {
                "a": ids[ii[keep]],
                "b": ids[jj[keep]],
                "cos": np.round(cos[ii[keep], jj[keep]], 6),
            }
        )

    out = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(sketch, batch_format="pandas", batch_size=4096)
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    return _typed_pairs(out, ("a", "b", "cos"))


# ---------------------------------------------------------------------------
# Connected components over near-dup pairs -> dup GROUPS
# ---------------------------------------------------------------------------
def connected_components(pairs: rd.Dataset | pa.Table, max_iters: int = 50) -> pa.Table:
    """(a, b) edge list -> (doc_id, group_id) with group_id = the min
    doc id reachable through the near-dup graph — the canonical
    representative each duplicate collapses to.

    Distributed min-label propagation: each round, every node adopts
    the smallest label among itself and its neighbors
    (groupby(node).min over the edge-expanded label table), iterated
    to fixpoint.  Rounds = graph diameter (near-dup clusters are
    shallow, typically 2-4); each round is one keyed shuffle of
    (node, label) pairs — never the document payloads.  Union-find on
    the driver would be O(edges) driver memory; this stays distributed.
    """
    edges = pairs.to_pandas() if hasattr(pairs, "to_pandas") else pairs
    if hasattr(edges, "to_pandas"):  # pyarrow Table
        edges = edges.to_pandas()
    edges = edges[["a", "b"]].astype("int64")
    if len(edges) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "group_id": pa.array([], pa.int64())}
        )
    # label table: every endpoint starts labeled with itself
    nodes = pd.unique(pd.concat([edges["a"], edges["b"]], ignore_index=True))
    labels = pd.DataFrame({"node": nodes, "label": nodes})
    sym = pd.concat(
        [
            edges.rename(columns={"a": "node", "b": "peer"}),
            edges.rename(columns={"b": "node", "a": "peer"}),
        ],
        ignore_index=True,
    )
    ds_edges = rd.from_pandas(sym)
    ds_labels = rd.from_pandas(labels).materialize()
    from ray.data.aggregate import Min

    for _ in range(max_iters):
        # join edge peers with current labels (broadcast: the label
        # table is (node,label) ints — tiny relative to the corpus;
        # at extreme scale this becomes a hash join on `peer`)
        import ray

        from ..functions.broadcast import bget

        lab_map = dict(
            zip(*(lambda df: (df["node"], df["label"]))(ds_labels.to_pandas()))
        )
        ref = ray.put(lab_map)

        def peer_label(b: pd.DataFrame) -> pd.DataFrame:
            lut = bget(ref)
            return pd.DataFrame(
                {"node": b["node"], "label": b["peer"].map(lut)}
            )

        candidates = ds_edges.map_batches(peer_label, batch_format="pandas").union(
            ds_labels
        )
        new_labels = (
            candidates.groupby("node").aggregate(Min("label", alias_name="label"))
        ).materialize()
        new_df = new_labels.to_pandas().sort_values("node").reset_index(drop=True)
        old_df = ds_labels.to_pandas().sort_values("node").reset_index(drop=True)
        ds_labels = new_labels
        if (new_df["label"].to_numpy() == old_df["label"].to_numpy()).all():
            break
    out = ds_labels.to_pandas().rename(columns={"node": "doc_id", "label": "group_id"})
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out[["doc_id", "group_id"]], preserve_index=False)


def q38_dup_groups(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """End-to-end dedup: MinHash-LSH candidates -> exact verification
    -> connected components -> (doc_id, group_id) canonical-dup
    assignment (rows-only oracle; component semantics tested against
    hand-built graphs in tests/test_dedup.py)."""
    verified = q17_minhash_dedup(sf_dir, threshold)
    return connected_components(verified)
