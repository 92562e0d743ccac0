"""Self-sufficient oracle artifacts for the driver's SQL checks.

The driver compares each ``queries()`` result against ``oracle_sql()``
run in DuckDB.  For operators whose reference values SQL cannot
compute directly (the crawl scheduler, sketch kernels, stub-codec
stages), the q32/q39 pattern generalizes (VERDICT r02 next-round #1):
an INDEPENDENT implementation writes its result to a deterministic
/tmp parquet and the oracle SQL reads THAT parquet, so the driver's
rows+schema+value-hash compare becomes a genuine cross-implementation
check instead of a pytest-only parity assertion.

Independence per artifact kind:

- ``sim`` (q30/q31): the sequential reference-semantics simulator
  (pipelines/oracle_sim.py — lists, dicts, one serial loop; shares
  only the pure-function layer with the engine) replays the exact
  crawl config and writes its order log + payload table.  The Ray
  side returns the PARALLEL engine's artifacts; the driver hashes the
  two against each other.
- ``naive_text`` (q20/q22): pure-Python-int re-derivations of the
  fingerprint / simhash / BPE-ish-token kernels (no numpy — catches
  uint64-wraparound and dtype bugs in the vectorized paths), looped
  per document.
- ``media_seq`` (q36/q37): the audio/video fixture tables run through
  the SAME pure stage functions but strictly sequentially in one
  process — execution parity (the crawl-parity philosophy): the value
  math is shared, what the compare verifies is that Ray's batching/
  scheduling neither drops, duplicates, nor mangles rows.  The value
  math itself is covered by the codec round-trip + feature-sanity
  tests in tests/test_dblp_multimodal.py.
- ANN candidate tables (q16/q41/q23): written by the query callables
  themselves; the oracle recomputes the BRUTE side in SQL and joins,
  so the recall counters are cross-checked end to end.

Writes are atomic (tmp file + rename) so a concurrently-running
DuckDB read never sees a partial parquet.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

_VERSION = "v1"  # bump when any builder's semantics change


def _sf_name(sf_dir: str) -> str:
    return Path(sf_dir).name or "sf0.01"


def _root(sf: str) -> Path:
    return Path(f"/tmp/ciq_oracle_{_VERSION}_{sf}")


def artifact_path(kind: str, sf: str) -> str:
    """The deterministic parquet location for (kind, sf).

    The sim_* artifacts replay crawl_queries._cfg_for, so their
    FILENAMES (not the shared root — a root-level key would needlessly
    invalidate the expensive pure-Python kmeans/pq/pagerank builders
    on every crawl-config bump) also carry crawl_queries._VERSION: a
    config bump must not let a warm /tmp compare the new engine
    against a stale-config simulator parquet (spurious hash-fail)."""
    if kind.startswith("sim_"):
        from .crawl_queries import _VERSION as _cfg_v

        return str(_root(sf) / f"{kind}_{_cfg_v}.parquet")
    return str(_root(sf) / f"{kind}.parquet")


def write_atomic(table: pa.Table, kind: str, sf_dir: str) -> str:
    """Write an artifact parquet atomically; returns its path."""
    final = Path(artifact_path(kind, _sf_name(sf_dir)))
    final.parent.mkdir(parents=True, exist_ok=True)
    tmp = final.parent / f".{final.name}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    return str(final)


def oracle_glob(kind: str) -> str:
    """Path embedded into an oracle_sql() string — resolved from the
    GRAFT_ORACLE_SF env (driver compares at sf0.01; tests override).
    If the artifact is missing when the string is built (oracle
    evaluated before the Ray query ran), build it best-effort here so
    the SQL side is self-sufficient — mirroring _crawl_payload_glob."""
    sf = os.environ.get("GRAFT_ORACLE_SF", "sf0.01")
    path = Path(artifact_path(kind, sf))
    if not path.exists():
        try:
            ensure(kind, f"/root/testdata/{sf}")
        except Exception:
            pass  # the queries() callable builds it anyway
    return str(path)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------
def ensure(kind: str, sf_dir: str) -> str:
    """Build the artifact for (kind, sf_dir) if absent; returns path.
    The ANN kinds build by running their recall query (requires a live
    Ray session, which the driver always has)."""
    path = Path(artifact_path(kind, _sf_name(sf_dir)))
    if path.exists():
        return str(path)
    builder = _BUILDERS.get(kind)
    if builder is None:
        raise FileNotFoundError(
            f"oracle artifact '{kind}' is written by its queries() callable; "
            "run the query first"
        )
    builder(sf_dir)
    if not path.exists():
        raise RuntimeError(f"builder for '{kind}' did not produce {path}")
    return str(path)


def _order_table(crawl_log) -> pa.Table:
    """Simulator crawl log -> the order-artifact schema (shared by
    sim_order and sim_order_recency so the two oracles cannot drift)."""
    return pa.table(
        {
            "fetch_seq": pa.array([r[0] for r in crawl_log], pa.int64()),
            "url_canon": pa.array([r[1] for r in crawl_log], pa.string()),
            "depth": pa.array([r[2] for r in crawl_log], pa.int32()),
            "status": pa.array([r[3] for r in crawl_log], pa.string()),
        }
    )


def _build_sim(sf_dir: str) -> None:
    """q30/q31: serial simulator replay of the exact crawl config."""
    from .crawl_queries import _cfg_for
    from .oracle_sim import simulate

    res = simulate(_cfg_for(sf_dir))
    order = _order_table(res.crawl_log)
    rows = sorted(res.payload.values(), key=lambda r: r["image_id"])
    payload = pa.table(
        {
            "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
            "w": pa.array([r["w"] for r in rows], pa.int32()),
            "h": pa.array([r["h"] for r in rows], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
            "caption": pa.array([r["caption"] for r in rows], pa.string()),
            "phash": pa.array([r["phash"] for r in rows], pa.int64()),
        }
    )
    write_atomic(order, "sim_order", sf_dir)
    write_atomic(payload, "sim_payload", sf_dir)


def _build_sim_recency(sf_dir: str) -> None:
    """q67: serial simulator replay of the recency-weighted config."""
    from .crawl_queries import _recency_cfg
    from .oracle_sim import simulate

    res = simulate(_recency_cfg(sf_dir))
    write_atomic(_order_table(res.crawl_log), "sim_order_recency", sf_dir)


def _naive_bpeish_count(s: str) -> int:
    """BPE-ish token count re-derived with a hand-rolled character
    scanner (no regex): runs of ASCII word chars, runs of non-word
    non-space chars — the spec of functions/text.bpe_ish_token_counts'
    pattern, implemented independently."""
    word = set("0123456789_abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
    space = set("\t\n\f\r ")
    n = 0
    prev: str | None = None
    for ch in s:
        if ch in space:
            prev = None
            continue
        cls = "w" if ch in word else "p"
        if cls != prev:
            n += 1
        prev = cls
    return n


def _build_naive_text(sf_dir: str) -> None:
    """q20/q22: pure-Python-int re-derivations per document."""
    from .textops import _naive_fingerprint64, _naive_simhash64

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    write_atomic(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "fingerprint": pa.array(
                    [_naive_fingerprint64(t) for t in texts], pa.int64()
                ),
                "n_bpeish_tokens": pa.array(
                    [_naive_bpeish_count(t) for t in texts], pa.int64()
                ),
            }
        ),
        "naive_fingerprint",
        sf_dir,
    )
    write_atomic(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array([_naive_simhash64(t) for t in texts], pa.int64()),
            }
        ),
        "naive_simhash",
        sf_dir,
    )


def _build_media_seq(sf_dir: str) -> None:
    """q36/q37: fixture tables through the pure stage fns, serially."""
    from ..stages.multimodal import audio_features_stage, video_frame_sample_stage
    from .multimodal_queries import _audio_table, _n_for, _video_table

    n = _n_for(sf_dir)
    write_atomic(audio_features_stage(_audio_table(n)), "audio_seq", sf_dir)
    write_atomic(
        video_frame_sample_stage(_video_table(n)), "video_seq", sf_dir
    )


def _build_q16(sf_dir: str) -> None:
    """Oracle-first path: the recall query writes the artifact as a
    side effect (needs a live Ray session — the driver has one)."""
    from .ann import q16_lsh_recall

    q16_lsh_recall(sf_dir)


def _build_q41(sf_dir: str) -> None:
    from .ann import q41_ivf_recall

    q41_ivf_recall(sf_dir)


def _build_q23(sf_dir: str) -> None:
    from .dedup import q23_embedding_neardup_recall

    q23_embedding_neardup_recall(sf_dir)


def _build_kmeans(sf_dir: str) -> None:
    """q46/q47: sequential pure-Python-int k-means re-derivation of
    pipelines/cluster.py's spec (quantize round-half-even to 2^20,
    integer argmin assignment with lowest-index ties, floor-division
    centroid update) — no numpy, one process, rows in vec_id order.
    Catches dtype/overflow/batch-boundary bugs in the vectorized
    distributed fit; bit-equality is guaranteed by the module's
    int64-only arithmetic contract."""
    from .cluster import KM_ITERS, KM_K, KM_SCALE

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    rows = sorted(
        zip(tbl["vec_id"].to_pylist(), tbl["embedding"].to_pylist()),
        key=lambda r: r[0],
    )
    vecs = [[round(float(x) * KM_SCALE) for x in emb] for _, emb in rows]
    ids = [i for i, _ in rows]
    d = len(vecs[0])
    cents = [list(vecs[i]) for i in range(KM_K)]  # k smallest vec_ids

    def assign(v: list) -> int:
        best, best_d = 0, None
        for ci, c in enumerate(cents):
            dist = sum((a - b) * (a - b) for a, b in zip(v, c))
            if best_d is None or dist < best_d:  # strict: ties keep lower
                best, best_d = ci, dist
        return best

    labels = [0] * len(vecs)
    for _ in range(KM_ITERS):
        labels = [assign(v) for v in vecs]
        sums = [[0] * d for _ in range(KM_K)]
        counts = [0] * KM_K
        for v, a in zip(vecs, labels):
            counts[a] += 1
            for j in range(d):
                sums[a][j] += v[j]
        new_c = [
            [(s + counts[ci] // 2) // counts[ci] for s in sums[ci]]
            if counts[ci]
            else list(cents[ci])
            for ci, _ in enumerate(cents)
        ]
        if new_c == cents:
            break
        cents = new_c
    labels = [assign(v) for v in vecs]  # final labels under final cents
    write_atomic(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(labels, pa.int32()),
            }
        ),
        "kmeans_seq",
        sf_dir,
    )


def _build_hll(sf_dir: str) -> None:
    """q54: sequential pure-Python-int HLL registers per l_returnflag
    (state/hll.registers_seq — no numpy in the hash/register path),
    estimates via the shared estimator over identical registers.
    Cross-checks the vectorized splitmix64 + clz construction for
    uint64-wraparound / dtype / scatter-index bugs."""
    import hashlib

    import numpy as np

    from ..state import hll

    tbl = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_partkey"]
    )
    by_flag: dict[str, list[int]] = {}
    for f, p_ in zip(tbl["l_returnflag"].to_pylist(), tbl["l_partkey"].to_pylist()):
        by_flag.setdefault(f, []).append(p_)
    flags = sorted(by_flag)
    regs = [np.array(hll.registers_seq(by_flag[f]), np.uint8) for f in flags]
    write_atomic(
        pa.table(
            {
                "l_returnflag": pa.array(flags, pa.string()),
                "approx_n_parts": pa.array(
                    [hll.estimate(r) for r in regs], pa.int64()
                ),
                "registers_md5": pa.array(
                    [hashlib.md5(r.tobytes()).hexdigest() for r in regs],
                    pa.string(),
                ),
            }
        ),
        "hll_seq",
        sf_dir,
    )


def _build_pagerank(sf_dir: str) -> None:
    """q56: sequential pure-Python-int PageRank re-derivation of
    pipelines/graph.py's fixed-point spec — one serial loop over a
    Python edge list (no numpy in the rank arithmetic), edges rebuilt
    independently from the pure fixture fn ``page_links``.  The
    engine's int64 floor-division contract makes the distributed fit
    (broadcast AND join forms) bit-identical to this, so the driver's
    value-hash compare is a genuine serial-vs-parallel check."""
    from ..fixtures.content_store import page_links
    from .graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_SCALE, _graph_cfg

    cfg, n = _graph_cfg(sf_dir)
    pmf = cfg.host_pmf()
    per = cfg.pages_per_host
    edges: list[tuple[int, int, int]] = []
    for nid in range(n):
        links = page_links(cfg, cfg.url(nid // per, nid % per), pmf)
        k = len(links)
        for link in links:
            host_s, page_s = link.rsplit("/p/", 1)
            hi = int(host_s.rsplit("h", 1)[1].split(".")[0])
            edges.append((nid, hi * per + int(page_s), k))
    ranks = [PR_SCALE // n] * n
    base = ((PR_DAMP_DEN - PR_DAMP_NUM) * (PR_SCALE // n)) // PR_DAMP_DEN
    for _ in range(PR_ITERS):
        inflow = [0] * n
        for s, d, k in edges:
            inflow[d] += ranks[s] // k
        ranks = [base + (PR_DAMP_NUM * f) // PR_DAMP_DEN for f in inflow]
    write_atomic(
        pa.table(
            {
                "nid": pa.array(range(n), pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
            }
        ),
        "pagerank_seq",
        sf_dir,
    )


_BUILDERS = {
    "sim_order": _build_sim,
    "sim_payload": _build_sim,
    "sim_order_recency": _build_sim_recency,
    "naive_fingerprint": _build_naive_text,
    "naive_simhash": _build_naive_text,
    "audio_seq": _build_media_seq,
    "video_seq": _build_media_seq,
    "q16_lsh": _build_q16,
    "q41_ivf": _build_q41,
    "q23_lsh": _build_q23,
    "kmeans_seq": _build_kmeans,
    "hll_seq": _build_hll,
    "pagerank_seq": _build_pagerank,
}


def _build_pq(sf_dir: str) -> None:
    """q66: sequential pure-Python-int product-quantization
    re-derivation of pipelines/ann.py's PQ spec — quantize
    round-half-even to 2^20, per-subspace integer-argmin codebook fit
    (lowest-index ties, floor-division update, early stop on
    fixpoint), ADC int distance tables, top-k by (dist, vec_id).  No
    numpy in the arithmetic; one process; rows in vec_id order."""
    from .ann import N_QUERIES, PQ_ITERS, PQ_K, PQ_M, TOP_K
    from .cluster import KM_SCALE

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    rows = sorted(
        zip(tbl["vec_id"].to_pylist(), tbl["embedding"].to_pylist()),
        key=lambda r: r[0],
    )
    vecs = [[round(float(x) * KM_SCALE) for x in emb] for _, emb in rows]
    ids = [i for i, _ in rows]
    d = len(vecs[0])
    dsub = d // PQ_M
    subs = [
        [v[s * dsub : (s + 1) * dsub] for v in vecs] for s in range(PQ_M)
    ]
    books = [
        [list(subs[s][i]) for i in range(PQ_K)] for s in range(PQ_M)
    ]  # k smallest vec_ids' subvectors

    def assign(v: list, book: list) -> int:
        best, best_d = 0, None
        for ci, c in enumerate(book):
            dist = sum((a - b) * (a - b) for a, b in zip(v, c))
            if best_d is None or dist < best_d:  # ties keep lower
                best, best_d = ci, dist
        return best

    for _ in range(PQ_ITERS):
        new_books = []
        for s in range(PQ_M):
            labels = [assign(v, books[s]) for v in subs[s]]
            sums = [[0] * dsub for _ in range(PQ_K)]
            counts = [0] * PQ_K
            for v, a in zip(subs[s], labels):
                counts[a] += 1
                for j in range(dsub):
                    sums[a][j] += v[j]
            new_books.append(
                [
                    [(x + counts[ci] // 2) // counts[ci] for x in sums[ci]]
                    if counts[ci]
                    else list(books[s][ci])
                    for ci in range(PQ_K)
                ]
            )
        if new_books == books:
            break
        books = new_books

    codes = [
        [assign(subs[s][i], books[s]) for s in range(PQ_M)]
        for i in range(len(vecs))
    ]
    out = {"qid": [], "rank": [], "vec_id": []}
    for qi, qv in zip(ids, vecs):
        if qi >= N_QUERIES:
            continue
        tables = []
        for s in range(PQ_M):
            qs = qv[s * dsub : (s + 1) * dsub]
            tables.append(
                [
                    sum((a - b) * (a - b) for a, b in zip(qs, c))
                    for c in books[s]
                ]
            )
        scored = sorted(
            (
                (sum(tables[s][codes[i][s]] for s in range(PQ_M)), ids[i])
                for i in range(len(vecs))
            ),
        )[:TOP_K]
        for rank, (_, vid) in enumerate(scored):
            out["qid"].append(qi)
            out["rank"].append(rank)
            out["vec_id"].append(vid)
    write_atomic(
        pa.table(
            {
                "qid": pa.array(out["qid"], pa.int64()),
                "rank": pa.array(out["rank"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
            }
        ),
        "pq_seq",
        sf_dir,
    )


_BUILDERS["pq_seq"] = _build_pq


def _build_winnow(sf_dir: str) -> None:
    """q72: pure-Python-int winnowing re-derivation per document
    (textops._naive_winnow — the independent sequential spec)."""
    from .textops import _naive_winnow

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids, fps = [], []
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        for v in _naive_winnow(text):
            ids.append(did)
            fps.append(v)
    write_atomic(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "fp": pa.array(fps, pa.int64()),
            }
        ),
        "winnow_seq",
        sf_dir,
    )


_BUILDERS["winnow_seq"] = _build_winnow


def _build_cdc(sf_dir: str) -> None:
    """q73: pure-Python-int sequential CDC chunker per document
    (cdc._naive_cdc_chunks — the rolling-loop spec the vectorized
    closed form must equal)."""
    from .cdc import _naive_cdc_chunks

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids, ords, fps, lens = [], [], [], []
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        for o, fp, ln in _naive_cdc_chunks(text):
            ids.append(did)
            ords.append(o)
            fps.append(fp)
            lens.append(ln)
    write_atomic(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "ord": pa.array(ords, pa.int64()),
                "fp": pa.array(fps, pa.int64()),
                "len": pa.array(lens, pa.int64()),
            }
        ),
        "cdc_seq",
        sf_dir,
    )


_BUILDERS["cdc_seq"] = _build_cdc


def _build_pca(sf_dir: str) -> None:
    """q101: INDEPENDENT sequential pure-Python-int re-derivation of
    the top-principal-component spec (trunc-quantize 1e6 → exact
    integer second moments → sign-trunc mean → centered matrix →
    PCA_ITERS trunc-renormalized power steps → canonical sign) — no
    code shared with cluster.pca_power_from_moments, so any drift
    between the implementations is a caught bug."""
    import math

    from .cluster import PCA_ITERS, VEC_FIXED_SCALE

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    vecs = [
        [int(math.trunc(float(x) * VEC_FIXED_SCALE)) for x in e]
        for e in tbl["embedding"].to_pylist()
    ]
    n, d = len(vecs), len(vecs[0])
    sq = [0] * d
    s2 = [[0] * d for _ in range(d)]
    for v in vecs:
        for i in range(d):
            vi = v[i]
            sq[i] += vi
            row = s2[i]
            for j in range(d):
                row[j] += vi * v[j]
    c = [(1 if s >= 0 else -1) * (abs(s) // n) for s in sq]
    m = [
        [
            s2[i][j] - c[i] * sq[j] - sq[i] * c[j] + n * c[i] * c[j]
            for j in range(d)
        ]
        for i in range(d)
    ]
    v = [1] * d
    for _ in range(PCA_ITERS):
        w = [sum(m[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w) or 1
        v = [x * VEC_FIXED_SCALE // mx for x in w]
    lead = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[lead] < 0:
        v = [-x for x in v]
    write_atomic(
        pa.table(
            {
                "dim": pa.array(range(1, d + 1), pa.int64()),
                "comp_ppm": pa.array(v, pa.int64()),
            }
        ),
        "pca_seq",
        sf_dir,
    )


_BUILDERS["pca_seq"] = _build_pca
