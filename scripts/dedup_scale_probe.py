#!/usr/bin/env python
"""Dedup-family scale probe: q17 (MinHash-LSH) and q68 (exact
prefix-filter join) on synthetic corpora one to two orders of
magnitude past sf0.1's 5,000 documents, with planted near-dup
clusters (the driver testdata has none).  Reports wall time,
candidate counts, verified pairs, and the q17-vs-q68 pair-set
difference (LSH misses are expected at ~2e-4/pair; the exact join is
the ground truth).  Run from the repo root:

    python scripts/dedup_scale_probe.py [n_docs ...]   # default 50000 200000
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate(n_docs: int, out_dir: str, seed: int = 41) -> None:
    """n_docs documents of ~60 tokens from a 5k vocab; 2% near-dups
    (3 tokens perturbed) and 0.5% exact dups planted on the first
    originals."""
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/documents.parquet"
    if os.path.exists(path):
        try:  # reuse only a COMPLETE table of the expected size — a
            # killed write or an edited generator must not be
            # benchmarked silently
            if pq.read_metadata(path).num_rows == n_docs:
                return
        except Exception:
            pass
        os.remove(path)
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.array([f"w{i:04d}" for i in range(5000)], dtype=object)
    n_near = n_docs // 50
    n_exact = n_docs // 200
    n_base = n_docs - n_near - n_exact
    toks = vocab[rng.integers(0, len(vocab), size=(n_base, 60))]
    texts = [" ".join(row) for row in toks]
    for i in range(n_near):  # perturb 3 positions of original i
        row = toks[i].copy()
        row[[5, 25, 45]] = vocab[rng.integers(0, len(vocab), 3)]
        texts.append(" ".join(row))
    for i in range(n_exact):
        texts.append(texts[i])
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)  # atomic: readers never see a torn file


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [50_000, 200_000]
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from cs_insights_crawler_ray.pipelines import dedup

    for n in sizes:
        d = f"/tmp/dedup_probe_{n}"
        t0 = time.perf_counter()
        generate(n, d)
        t_gen = time.perf_counter() - t0

        t0 = time.perf_counter()
        p17 = dedup.q17_minhash_dedup(d, 0.7)
        p17 = p17.to_pandas() if hasattr(p17, "to_pandas") else p17
        t17 = time.perf_counter() - t0

        t0 = time.perf_counter()
        p68 = dedup.q68_ngram_jaccard_join(d, 0.7)
        p68 = p68.to_pandas() if hasattr(p68, "to_pandas") else p68
        t68 = time.perf_counter() - t0

        s17 = set(zip(p17["a"], p17["b"]))
        s68 = set(zip(p68["a"], p68["b"]))
        print(
            f"n={n}: gen {t_gen:.1f}s | q17 {t17:.1f}s ({len(s17)} pairs) | "
            f"q68 {t68:.1f}s ({len(s68)} pairs) | "
            f"q68-only {len(s68 - s17)} (LSH misses) | "
            f"q17-only {len(s17 - s68)} (MUST be 0)"
        )
        assert not (s17 - s68), "exact join missed a verified LSH pair"

        if "--groups" in sys.argv:  # group chain + leakage-safe split
            t0 = time.perf_counter()
            g = dedup.q38_dup_groups(d, 0.7).to_pandas()
            t38 = time.perf_counter() - t0
            t0 = time.perf_counter()
            s = dedup.q69_leakage_safe_split(d, 0.7)
            s = s.to_pandas() if hasattr(s, "to_pandas") else s
            t69 = time.perf_counter() - t0
            merged = s.merge(g, on="doc_id", how="inner")
            straddle = (
                merged.groupby("group_id")["split"].nunique() > 1
            ).sum()
            print(
                f"  q38 {t38:.1f}s ({g['group_id'].nunique()} groups, "
                f"{len(g)} grouped docs) | q69 {t69:.1f}s "
                f"{s['split'].value_counts().to_dict()} | "
                f"groups straddling splits: {straddle} (MUST be 0)"
            )
            assert straddle == 0
    ray.shutdown()


if __name__ == "__main__":
    main()
