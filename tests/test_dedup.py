"""Dedup + ANN operators against brute-force oracles on constructed
fixtures containing REAL near-duplicates (the driver testdata has
none, by construction of its random generators)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from cs_insights_crawler_ray.pipelines import ann, dedup

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo sierra tango".split()


@pytest.fixture(scope="module")
def neardup_dir(tmp_path_factory):
    """documents.parquet with planted near-dup clusters; embeddings
    with planted near-identical vectors."""
    d = tmp_path_factory.mktemp("neardup")
    rng = np.random.Generator(np.random.PCG64(123))
    docs, doc_id = [], 0
    originals = []
    for i in range(30):
        text = " ".join(rng.choice(WORDS, size=40))
        originals.append(text)
        docs.append({"doc_id": doc_id, "text": text}); doc_id += 1
    # near-dups: perturb 2 tokens of the first 10 originals
    for i in range(10):
        toks = originals[i].split()
        toks[5], toks[20] = "zulu", "yankee"
        docs.append({"doc_id": doc_id, "text": " ".join(toks)}); doc_id += 1
    # one exact dup
    docs.append({"doc_id": doc_id, "text": originals[0]}); doc_id += 1
    pq.write_table(pa.Table.from_pylist(docs), d / "documents.parquet")

    base = rng.standard_normal((40, 32))
    vecs = [base[i] for i in range(40)]
    for i in range(8):  # planted near-identical vectors
        vecs.append(base[i] + rng.standard_normal(32) * 0.01)
    emb = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(emb, d / "embeddings.parquet")
    return str(d)


def _true_jaccard_pairs(path, threshold):
    t = pq.read_table(f"{path}/documents.parquet").to_pylist()
    out = set()
    for a, b in itertools.combinations(t, 2):
        if dedup.ngram_jaccard(a["text"], b["text"]) >= threshold:
            out.add((min(a["doc_id"], b["doc_id"]), max(a["doc_id"], b["doc_id"])))
    return out


def test_minhash_lsh_finds_neardups(neardup_dir):
    got = dedup.q17_minhash_dedup(neardup_dir, threshold=0.7).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    truth = _true_jaccard_pairs(neardup_dir, 0.7)
    assert truth, "fixture must contain true near-dups"
    # exact verification step guarantees NO false positives
    assert got_pairs <= truth
    # LSH with 32 bands of r=4 at jaccard>=0.7: detection prob
    # 1-(1-0.7^4)^32 ~ 0.9998 per pair -> expect full recall here
    assert got_pairs == truth


def test_prefix_jaccard_join_exact(neardup_dir):
    """q68 finds EXACTLY the true pair set — no LSH recall caveat:
    prefix filtering guarantees a candidate superset by construction."""
    got = dedup.q68_ngram_jaccard_join(neardup_dir, threshold=0.7)
    gp = got.to_pandas()
    truth = _true_jaccard_pairs(neardup_dir, 0.7)
    assert truth, "fixture must contain true near-dups"
    assert set(zip(gp["a"], gp["b"])) == truth
    # verified jaccards match the scalar kernel bit-identically
    texts = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(f"{neardup_dir}/documents.parquet").to_pylist()
    }
    for a, b, j in zip(gp["a"], gp["b"], gp["jaccard"]):
        assert j == dedup._round6_half_up(dedup.ngram_jaccard(texts[a], texts[b]))


def test_prefix_candidates_superset_under_skew(tmp_path):
    """Adversarial corpus for the prefix filter: a super-common token
    run shared by every doc (heavy grams must sort to the order's
    tail), short (<3-token) docs, duplicate empty docs, and exact
    dups.  Candidates must be a superset of the true pairs and the
    verified join must equal brute force — also with the heavy-gram
    broadcast DISABLED (hash order), since ordering is selectivity
    only."""
    rng = np.random.Generator(np.random.PCG64(7))
    common = " ".join(["the quick brown fox jumps"] * 4)
    docs = []
    for i in range(20):
        tail = " ".join(rng.choice(WORDS, size=12))
        docs.append({"doc_id": i, "text": common + " " + tail})
    docs.append({"doc_id": 20, "text": docs[0]["text"]})      # exact dup
    docs.append({"doc_id": 21, "text": "alpha bravo"})         # short
    docs.append({"doc_id": 22, "text": "alpha bravo"})         # short dup
    docs.append({"doc_id": 23, "text": ""})                    # empty
    docs.append({"doc_id": 24, "text": ""})                    # empty dup
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(docs), d / "documents.parquet")

    truth = _true_jaccard_pairs(str(d), 0.7)
    assert (21, 22) in truth and (23, 24) in truth and (0, 20) in truth

    ds = rd.read_parquet(f"{d}/documents.parquet", columns=["doc_id", "text"])
    for top_k in (4096, 0):  # DF ordering on / off
        cand = dedup.prefix_filter_candidates(ds, 0.7, df_top_k=top_k).to_pandas()
        cand_pairs = set(zip(cand["a"], cand["b"]))
        assert truth <= cand_pairs

    got = dedup.q68_ngram_jaccard_join(str(d), threshold=0.7)
    assert set(zip(got.to_pandas()["a"], got.to_pandas()["b"])) == truth


def test_prefix_pair_slab_blocking_exact():
    """A bucket wider than _PAIR_SLAB must emit the identical pair set
    the whole-bucket triu form would (pure kernel, no Ray)."""
    rng = np.random.default_rng(0)
    m = int(dedup._PAIR_SLAB * 2.5)
    g = pd.DataFrame(
        {
            "gram": np.concatenate([np.zeros(m, np.int64), np.ones(40, np.int64)]),
            "doc_id": np.concatenate(
                [rng.permutation(m).astype(np.int64),
                 np.arange(500, 540, dtype=np.int64)]
            ),
            "size": rng.integers(50, 200, m + 40).astype(np.int64),
        }
    )
    t_num = 700_000
    got = set(zip(*(dedup._prefix_pairs_from_partition(g, t_num)[c] for c in "ab")))
    want = set()
    for gram in (0, 1):
        b = g[g["gram"] == gram]
        ids = b["doc_id"].to_numpy()
        szs = b["size"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        lo, hi = np.minimum(szs[ii], szs[jj]), np.maximum(szs[ii], szs[jj])
        keep = lo * 1_000_000 >= (t_num - 1) * hi
        want |= set(
            zip(np.minimum(ids[ii], ids[jj])[keep], np.maximum(ids[ii], ids[jj])[keep])
        )
    assert got == want and len(want) > 0


def test_leakage_safe_split_group_consistent(neardup_dir):
    """q69: every member of a near-dup group gets the SAME split (the
    operator's whole point — no train/test straddling), singletons
    represent themselves, and every document is assigned exactly
    once.  The forced join path must agree with the broadcast path
    byte for byte (including 2^53+ doc_id safety via the Arrow
    branch)."""
    import pandas as pd

    got = dedup.q69_leakage_safe_split(neardup_dir, threshold=0.7).to_pandas()
    n_docs = len(pq.read_table(f"{neardup_dir}/documents.parquet"))
    assert len(got) == n_docs and got["doc_id"].is_unique
    assert set(got["split"].unique()) <= {"train", "val", "test"}

    groups = dedup.q38_dup_groups(neardup_dir, threshold=0.7).to_pandas()
    assert len(groups) > 0, "fixture must contain dup groups"
    merged = got.merge(groups, on="doc_id", how="left")
    grouped = merged.dropna(subset=["group_id"])
    # group members share rep AND split
    per_group = grouped.groupby("group_id").agg(
        n_reps=("rep", "nunique"), n_splits=("split", "nunique")
    )
    assert (per_group["n_reps"] == 1).all()
    assert (per_group["n_splits"] == 1).all()
    # and the rep is the group label itself
    assert (grouped["rep"] == grouped["group_id"]).all()
    # singletons represent themselves
    single = merged[merged["group_id"].isna()]
    assert (single["rep"] == single["doc_id"]).all()

    # forced join path == broadcast path
    import cs_insights_crawler_ray.pipelines.dedup as dd

    old = dd._SPLIT_BROADCAST_LIMIT
    dd._SPLIT_BROADCAST_LIMIT = 0
    try:
        forced = dd.q69_leakage_safe_split(neardup_dir, threshold=0.7).to_pandas()
    finally:
        dd._SPLIT_BROADCAST_LIMIT = old
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = forced.sort_values("doc_id").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)


def test_dedup_corpus_keeps_one_per_group(neardup_dir):
    """q70: exactly the group representatives + singletons survive,
    n_members partitions the corpus (sums to n_docs), and the forced
    join path equals the broadcast path."""
    import pandas as pd

    got = dedup.q70_dedup_corpus(neardup_dir, threshold=0.7).to_pandas()
    n_docs = len(pq.read_table(f"{neardup_dir}/documents.parquet"))
    assert int(got["n_members"].sum()) == n_docs
    assert got["doc_id"].is_unique

    groups = dedup.q38_dup_groups(neardup_dir, threshold=0.7).to_pandas()
    reps = set(groups["group_id"])
    non_reps = set(groups.loc[groups["doc_id"] != groups["group_id"], "doc_id"])
    kept = set(got["doc_id"])
    assert reps <= kept and not (non_reps & kept)
    sz = groups.groupby("group_id").size()
    for rep, n in sz.items():
        assert int(got.loc[got["doc_id"] == rep, "n_members"].iloc[0]) == n

    import cs_insights_crawler_ray.pipelines.dedup as dd

    old = dd._SPLIT_BROADCAST_LIMIT
    dd._SPLIT_BROADCAST_LIMIT = 0
    try:
        forced = dd.q70_dedup_corpus(neardup_dir, threshold=0.7).to_pandas()
    finally:
        dd._SPLIT_BROADCAST_LIMIT = old
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = forced.sort_values("doc_id").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)


def test_simhash_neardup_pairs(neardup_dir):
    docs = rd.read_parquet(f"{neardup_dir}/documents.parquet")
    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=3).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    # the exact dup pair must be found (hamming 0) — banding is exhaustive for <= 3
    assert (0, 40) in got
    for _, r in pairs.iterrows():
        assert r["hamming"] <= 3


def test_embedding_neardup_vs_bruteforce(neardup_dir):
    t = pq.read_table(f"{neardup_dir}/embeddings.parquet")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    ii, jj = np.triu_indices(len(m), k=1)
    truth = {
        (int(a), int(b))
        for a, b, c in zip(ii, jj, cos[ii, jj])
        if c >= 0.95
    }
    assert len(truth) >= 6
    got = dedup.q23_embedding_near_dup(neardup_dir, threshold=0.95).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs <= truth          # in-bucket exact cos -> no false positives
    assert len(got_pairs) >= len(truth) * 0.7   # LSH recall bound (12-bit, planted pairs near-identical)


def test_ann_brute_matches_numpy(neardup_dir):
    got = ann.q15_ann_brute(neardup_dir).to_pandas()
    t = pq.read_table(f"{neardup_dir}/embeddings.parquet")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for qid in range(ann.N_QUERIES):
        cos = m @ m[qid]
        cand = [(c, i) for i, c in enumerate(cos) if i != qid]
        top = sorted(cand, key=lambda x: (-x[0], x[1]))[: ann.TOP_K]
        want = {i for _, i in top}
        have = set(got[got["qid"] == qid]["vec_id"])
        assert have == want, f"qid {qid}"


def test_knn_graph_matches_serial(neardup_dir):
    """q94: the blocked distributed kNN graph equals a serial numpy
    re-derivation of the spec (trunc-quantized int64 dots, ties
    (dot DESC, neighbor ASC)) row for row."""
    got = (
        ann.q94_knn_graph(neardup_dir, k=4)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{neardup_dir}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    q = np.trunc(m * 1_000_000).astype(np.int64)
    dot = q @ q.T
    rows = []
    for i in range(len(ids)):
        cand = sorted(
            (-int(dot[i, j]), int(ids[j])) for j in range(len(ids)) if ids[j] != ids[i]
        )
        for r, (nd, nb) in enumerate(cand[:4], 1):
            rows.append((int(ids[i]), r, nb, -nd))
    want = pd.DataFrame(rows, columns=["vec_id", "rank", "neighbor_id", "dot_q"])
    pd.testing.assert_frame_equal(got, want)


def test_knn_blocked_pair_merge_tie_break(ray_session):
    """The pair/merge task pair across UNEVEN multiple blocks equals
    the single-block run, and an exact-duplicate (tied-dot) neighbor
    resolves to the SMALLER id even when the tie straddles blocks."""
    import ray as _ray

    from cs_insights_crawler_ray.pipelines.ann import (
        _knn_merge, _knn_pair_partial)

    rng = np.random.Generator(np.random.PCG64(7))
    q = rng.integers(-1000, 1000, size=(9, 8)).astype(np.int64)
    q[6] = q[2]  # exact duplicate: dots vs anything tie between 2 and 6
    ids = np.arange(9, dtype=np.int64)
    k = 3

    def run(splits):
        blks = [
            (ids[a:b], q[a:b]) for a, b in zip([0] + splits, splits + [9])
        ]
        merged = _ray.get(
            [
                _knn_merge.remote(
                    [_knn_pair_partial.remote(qb, db, k) for db in blks], k
                )
                for qb in blks
            ]
        )
        return (
            pa.concat_tables(merged)
            .to_pandas()
            .sort_values(["vec_id", "rank"])
            .reset_index(drop=True)
        )

    single = run([])
    blocked = run([2, 3, 7])  # uneven blocks; the dup pair straddles
    pd.testing.assert_frame_equal(blocked, single)
    # every row whose top neighbor ties between 2 and 6 must pick 2
    dup_rows = single[(single["neighbor_id"].isin([2, 6]))]
    for vid, grp in dup_rows.groupby("vec_id"):
        if vid in (2, 6):
            continue
        both = grp[grp["neighbor_id"].isin([2, 6])]
        if len(both) == 2:
            r2 = both[both["neighbor_id"] == 2]["rank"].iloc[0]
            r6 = both[both["neighbor_id"] == 6]["rank"].iloc[0]
            assert r2 < r6


def test_ivf_ann_recall(neardup_dir):
    brute = ann.q15_ann_brute(neardup_dir).to_pandas()
    ivf = ann.q41_ivf_ann(neardup_dir, n_centroids=12, nprobe=6).to_pandas()
    recall = len(
        set(zip(ivf["qid"], ivf["vec_id"])) & set(zip(brute["qid"], brute["vec_id"]))
    ) / len(brute)
    assert recall >= 0.5, recall


def test_lsh_ann_recall(neardup_dir):
    brute = ann.q15_ann_brute(neardup_dir).to_pandas()
    lsh = ann.q16_lsh_ann(neardup_dir, bits=16, slack=8).to_pandas()
    recall = len(
        set(zip(lsh["qid"], lsh["vec_id"])) & set(zip(brute["qid"], brute["vec_id"]))
    ) / len(brute)
    assert recall >= 0.5, recall


def test_simhash_batch_matches_scalar():
    rng = np.random.Generator(np.random.PCG64(9))
    texts = [
        " ".join(rng.choice(WORDS, size=int(k))) for k in rng.integers(0, 60, 150)
    ] + ["", "one", "", "two words", ""]
    batch = dedup.simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert batch[i] == dedup.simhash64(t), (i, t)


def test_connected_components_groups():
    import pyarrow as pa

    from cs_insights_crawler_ray.pipelines.dedup import connected_components

    # two chains + a singleton edge: {1-2-3-4}, {10-11}, {20-21}
    pairs = pa.table(
        {"a": pa.array([1, 2, 3, 10, 20], pa.int64()),
         "b": pa.array([2, 3, 4, 11, 21], pa.int64())}
    )
    got = connected_components(pairs).to_pandas()
    groups = dict(zip(got["doc_id"], got["group_id"]))
    assert groups == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_distributed_path_matches_driver(monkeypatch):
    """Force the distributed label-propagation loop (the 100 TB path)
    and require identical groups to the driver fast path."""
    import pyarrow as pa

    from cs_insights_crawler_ray.pipelines import dedup

    rng = np.random.Generator(np.random.PCG64(8))
    # random forest-ish graph: chains, stars, singleton pairs
    a = rng.integers(0, 400, size=300).astype(np.int64)
    b = (a + rng.integers(1, 5, size=300)).astype(np.int64)
    pairs = pa.table({"a": pa.array(a), "b": pa.array(b)})
    fast = dedup.connected_components(pairs).to_pandas()
    monkeypatch.setattr(dedup, "CC_DRIVER_EDGE_LIMIT", 0)
    dist = dedup.connected_components(pairs).to_pandas()
    f = fast.sort_values("doc_id").reset_index(drop=True)
    d = dist.sort_values("doc_id").reset_index(drop=True)
    assert f["doc_id"].tolist() == d["doc_id"].tolist()
    assert f["group_id"].tolist() == d["group_id"].tolist()


def test_star_bucket_cap_preserves_connectivity():
    import pandas as pd

    from cs_insights_crawler_ray.pipelines import dedup

    big = pd.DataFrame(
        {"doc_id": list(range(1000)), "band_id": 0, "band_hash": 42}
    )
    pairs = dedup._pairs_from_partition(big)
    assert len(pairs) == 999                      # star, not 499500 combos
    got = dedup.connected_components(
        __import__("pyarrow").Table.from_pandas(pairs)
    ).to_pandas()
    assert (got["group_id"] == 0).all()           # one component, min id 0


def test_popcount64_matches_bin():
    rng = np.random.Generator(np.random.PCG64(4))
    xs = rng.integers(0, 1 << 63, size=500, dtype=np.uint64)
    xs[0] = 0; xs[1] = np.uint64((1 << 64) - 1)
    got = dedup._popcount64(xs)
    want = [bin(int(x)).count("1") for x in xs]
    assert got.tolist() == want


def test_hamming_star_cap_big_bucket_fast():
    """VERDICT r02 #3: a 10k-row identical-phash bucket must complete
    in seconds (star pairs), not emit ~50M combinations."""
    import time

    n = 10_000
    ds = rd.from_arrow(
        pa.table(
            {
                "img": pa.array([f"i{k:06d}" for k in range(n)], pa.string()),
                "ph": pa.array([12345] * n, pa.int64()),
            }
        )
    )
    t0 = time.perf_counter()
    pairs = dedup.hamming_near_dup_pairs(
        ds, "img", "ph", max_hamming=3, id_dtype="object"
    ).to_pandas()
    assert time.perf_counter() - t0 < 60
    # star: min-id x each other member, deduped across the 4 bands
    assert len(pairs) == n - 1
    assert (pairs["a"] == "i000000").all()
    assert (pairs["hamming"] == 0).all()


def test_hamming_vectorized_matches_naive_all_pairs():
    """star_cap=None = exact all-pairs listing; cross-check the numpy
    XOR+popcount kernel against a scalar recompute."""
    rng = np.random.Generator(np.random.PCG64(21))
    base = int(rng.integers(0, 1 << 62))
    hashes = [base]
    for _ in range(39):
        h = base
        for b in rng.choice(64, size=int(rng.integers(0, 6)), replace=False):
            h ^= 1 << int(b)
        hashes.append(h)
    sh = [h - (1 << 64) if h >= 1 << 63 else h for h in hashes]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(sh)), pa.int64()),
                  "phash": pa.array(sh, pa.int64())})
    )
    got = dedup.hamming_near_dup_pairs(ds, "doc_id", "phash", max_hamming=3,
                                       star_cap=None).to_pandas()
    got_set = {(a, b, d) for a, b, d in zip(got["a"], got["b"], got["hamming"])}
    want = set()
    banded = [(h >> (16 * k)) & 0xFFFF for h in hashes for k in range(4)]
    for i, j in itertools.combinations(range(len(hashes)), 2):
        d = bin(hashes[i] ^ hashes[j]).count("1")
        share = any(
            ((hashes[i] >> (16 * k)) & 0xFFFF) == ((hashes[j] >> (16 * k)) & 0xFFFF)
            for k in range(4)
        )
        if d <= 3 and share:
            want.add((i, j, d))
    assert got_set == want and want  # fixture must produce pairs


def test_pair_jaccards_bit_identical_to_scalar():
    rng = np.random.Generator(np.random.PCG64(31))
    texts = {i: " ".join(rng.choice(WORDS, size=int(k)))
             for i, k in enumerate(list(rng.integers(0, 50, 30)) + [0, 1, 2])}
    ids = list(texts)
    a_ids = [ids[int(i)] for i in rng.integers(0, len(ids), 80)]
    b_ids = [ids[int(i)] for i in rng.integers(0, len(ids), 80)]
    got = dedup._pair_jaccards(a_ids, b_ids, texts)
    want = [dedup._round6_half_up(dedup.ngram_jaccard(texts[x], texts[y]))
            for x, y in zip(a_ids, b_ids)]
    assert got.tolist() == want


def test_decontaminate_matches_serial(ray_session):
    """q61 vs a serial set-arithmetic recompute of eval-gram overlap."""
    import os
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.dedup import (
        _gram_set, q61_decontaminate)

    sf = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
    got = q61_decontaminate(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    eg = set().union(
        *(_gram_set(t) for t in docs.loc[docs["doc_id"] % 97 == 0, "text"])
    )
    train = docs[docs["doc_id"] % 97 != 0]
    exp = {
        int(r.doc_id): len(_gram_set(r.text) & eg)
        for r in train.itertuples()
        if len(_gram_set(r.text) & eg) > 0
    }
    assert dict(zip(got["doc_id"], got["n_shared"])) == exp
    # eval docs themselves are never flagged
    assert not set(got["doc_id"]) & set(
        docs.loc[docs["doc_id"] % 97 == 0, "doc_id"]
    )


def test_payload_dup_groups_consistent_with_pairs(ray_session):
    """q63 groups exactly cover the q32 pair list: every paired image
    appears, both ends of a pair share a group, and the representative
    is the lexicographically smallest member."""
    import os

    from cs_insights_crawler_ray.pipelines.crawl_queries import (
        q32_payload_neardup, q63_payload_dup_groups)

    sf = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
    pairs = q32_payload_neardup(sf)
    groups = q63_payload_dup_groups(sf)
    paired = set(pairs["a"]) | set(pairs["b"])
    assert set(groups["image_id"]) == paired
    rep = dict(zip(groups["image_id"], groups["group_rep"]))
    for a, b in zip(pairs["a"], pairs["b"]):
        assert rep[a] == rep[b]
    for g, members in groups.groupby("group_rep")["image_id"]:
        assert g == min(members)


def test_dup_spans_matches_serial_and_prunes(ray_session, tmp_path):
    """q64: serial set-arithmetic parity on a hand-built corpus, and
    the MAX_DF boilerplate prune actually drops a viral span."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.dedup import q64_dup_spans

    span = "one two three four five six seven eight"
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = [
        f"{span} tail0",          # 0 and 1 share the 8-token span
        f"head1 {span}",
        "nothing in common here at all with anything else",
    ] + [f"{boiler} unique{i}" for i in range(30)]  # viral span, df=30
    pd.DataFrame({"doc_id": range(len(docs)), "text": docs}).to_parquet(
        tmp_path / "documents.parquet"
    )
    got = (
        q64_dup_spans(str(tmp_path))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # only the (0, 1) pair survives: the boilerplate span has df=30 > 20
    assert list(zip(got["a"], got["b"])) == [(0, 1)]
    assert int(got.loc[0, "n_shared"]) == 1
    # without the prune the viral span would emit 30*29/2 = 435 pairs
    got_hi = q64_dup_spans(str(tmp_path), max_df=64).to_pandas()
    assert len(got_hi) == 1 + 435


def test_pq_ann_matches_serial_and_recalls(ray_session):
    """q66: the distributed PQ fit+encode+ADC scan is bit-identical to
    the sequential pure-Python-int re-derivation, and PQ recalls a
    reasonable fraction of the brute top-k (sanity, not exactness —
    PQ is lossy by design)."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from cs_insights_crawler_ray.pipelines.ann import q66_pq_ann
    from cs_insights_crawler_ray.pipelines.oracle_artifacts import ensure

    sf = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
    got = q66_pq_ann(sf).to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    exp = (
        pq.read_table(ensure("pq_seq", sf))
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # self-match: every query's rank-0 neighbor is itself
    r0 = got[got["rank"] == 0]
    assert (r0["qid"].to_numpy() == r0["vec_id"].to_numpy()).all()
    # recall vs exact L2 (PQ's own metric; q15's cosine normalizes and
    # is a different ordering on these unnormalized fixtures): lossy,
    # but not garbage
    import numpy as np

    emb = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    mat = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    exact = set()
    for qi in sorted(got["qid"].unique()):
        qv = mat[ids == qi][0]
        d = ((mat - qv) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))[:10]
        exact |= {(int(qi), int(v)) for v in ids[order]}
    hits = len(set(zip(got["qid"], got["vec_id"])) & exact)
    assert hits >= len(exact) * 0.3, f"PQ recall too low: {hits}/{len(exact)}"


def test_q61_hashed_default_matches_string_anchor(ray_session):
    """The production decontamination kernel (64-bit hashed shingles,
    vectorized membership) must flag the identical (doc_id, n_shared)
    row set as the string-gram anchor — the anchor/production split
    the r03 verdict asked for (the string form is what the SQL oracle
    replays; 64 bits keep the collision false-positive probability
    negligible where the MinHash path's folded 32 would not)."""
    import os

    sf = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
    a = (
        dedup.q61_decontaminate(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dedup.q61_decontaminate_exact(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) > 0, "fixture produced no contaminated docs"
    pd.testing.assert_frame_equal(a, b)


def test_batch_gram_hashes64_short_and_empty_docs():
    texts = ["", "one", "one two", "a b c d e", "a b c"]
    grams, counts = dedup._batch_gram_hashes64(texts)
    assert counts.tolist() == [1, 1, 1, 3, 1]
    # empty doc -> sentinel 0; short docs hash their whole stream
    assert grams[0] == 0
    # the 3-token doc's single trigram equals the 5-token doc's first
    s5 = grams[3:6]
    assert grams[6] == s5[0]
    # distinct trigrams hash distinctly (here)
    assert len(np.unique(s5)) == 3


def test_contrastive_triplets_rules(neardup_dir):
    """q103: positive = the exact top-1 neighbor; negative never
    equals anchor or positive; collision stepping is deterministic."""
    got = ann.q103_contrastive_triplets(neardup_dir).to_pandas()
    knn = ann.q94_knn_graph(neardup_dir, k=1).to_pandas()
    top1 = dict(zip(knn["vec_id"], knn["neighbor_id"]))
    n = len(got)
    assert set(got["anchor_id"]) == set(top1)
    for a, p, g in zip(got["anchor_id"], got["pos_id"], got["neg_id"]):
        assert p == top1[a]
        assert g != a and g != p
        assert 0 <= g < n


def test_ivf_knn_graph_exact_dots_and_ranks(neardup_dir):
    """q94b: every emitted (vec, neighbor, dot) carries the EXACT
    quantized dot; per-vector ranks are contiguous from 1; no
    duplicate pairs survive the multi-cell merge."""
    got = ann.q94b_ivf_knn_graph(neardup_dir, k=4).to_pandas()
    t = pq.read_table(f"{neardup_dir}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    q = np.trunc(m * 1_000_000).astype(np.int64)
    dot = q @ q.T
    pos = {int(i): k for k, i in enumerate(ids)}
    assert not got.duplicated(["vec_id", "neighbor_id"]).any()
    for v, r, nb, dq in zip(
        got["vec_id"], got["rank"], got["neighbor_id"], got["dot_q"]
    ):
        assert dq == dot[pos[v], pos[nb]]
        assert v != nb
    ranks = got.sort_values(["vec_id", "rank"]).groupby("vec_id")["rank"]
    for _, rs in ranks:
        assert rs.tolist() == list(range(1, len(rs) + 1))


def test_ivf_knn_graph_recall_on_planted_clusters(neardup_dir):
    """With 12 cells and nprobe=8 (2/3 of cells probed) on the planted
    near-identical fixture, the IVF tier must recover well over half
    of the exact graph; the counter arithmetic must be consistent."""
    rc = ann.q94b_ivf_knn_recall(neardup_dir).to_pandas()
    assert (rc["n_hit"] <= rc["n_cand"]).all()
    exact = ann.q94_knn_graph(neardup_dir).to_pandas()
    recall = rc["n_hit"].sum() / len(exact)
    assert recall >= 0.5, recall


def test_contrastive_triplets_ivf_tier(neardup_dir):
    """q103 composes either graph: the IVF form obeys the same rules
    with positives from the IVF top-1; unknown tiers raise."""
    got = ann.q103_contrastive_triplets(neardup_dir, graph="ivf").to_pandas()
    knn = ann.q94b_ivf_knn_graph(neardup_dir, k=1).to_pandas()
    top1 = dict(zip(knn["vec_id"], knn["neighbor_id"]))
    n = pq.read_table(
        f"{neardup_dir}/embeddings.parquet", columns=["vec_id"]
    ).num_rows
    assert set(got["anchor_id"]) == set(top1)
    for a, p, g in zip(got["anchor_id"], got["pos_id"], got["neg_id"]):
        assert p == top1[a]
        assert g != a and g != p
        assert 0 <= g < n
    with pytest.raises(ValueError):
        ann.q103_contrastive_triplets(neardup_dir, graph="bogus")


def test_ivf_knn_graph_block_layout_invariant(ray_session, tmp_path):
    """q94b's output is a pure function of the TABLE, not the block
    layout: cell routing is per-row, a cell's rows co-locate through
    the exchange whatever blocks they started in, and the merge dedups
    across shared probe cells — so a 1-row-group file and a 7-row-
    group file must produce identical graphs (and a rerun must too)."""
    rng = np.random.Generator(np.random.PCG64(99))
    n, d = 120, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32) * 0.4
    vecs[17] = vecs[3]  # exact duplicate -> cross-cell tie material
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    outs = []
    for name, rgs in (("one", n), ("many", 17)):
        p = tmp_path / name
        p.mkdir()
        pq.write_table(tbl, p / "embeddings.parquet", row_group_size=rgs)
        outs.append(
            ann.q94b_ivf_knn_graph(str(p), k=4)
            .to_pandas()
            .sort_values(["vec_id", "rank"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    rerun = (
        ann.q94b_ivf_knn_graph(str(tmp_path / "many"), k=4)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(outs[1], rerun)
