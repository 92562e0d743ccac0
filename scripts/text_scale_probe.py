#!/usr/bin/env python
"""Text-analysis-family scale probe: q13 (token stats), q76 (bigram
coverage), q79 (Simpson diversity), q89 (denylist masking), q92
(source drift) on synthetic corpora one to two orders of magnitude
past sf0.1's 5,000 documents.  Verifies the family's scale shapes —
the stateless passes stay linear, the vocab exchanges stay bounded at
candidate counts (never corpus rows), the q92 driver pull stays at
n_parts × V × sources.  Run from the repo root:

    python scripts/text_scale_probe.py [n_docs ...]   # default 50000 200000
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate(n_docs: int, out_dir: str, seed: int = 47) -> None:
    """n_docs documents of ~60 tokens from a 5k vocab (the dedup
    probe's corpus shape) plus a 20-value source column whose token
    mix drifts mildly with the source index (so q92 has signal)."""
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/documents.parquet"
    if os.path.exists(path):
        try:
            if (
                pq.read_metadata(path).num_rows == n_docs
                and "lang" in pq.read_schema(path).names  # pre-q96 caches
            ):
                return
        except Exception:
            pass
        os.remove(path)
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.array([f"w{i:04d}" for i in range(5000)], dtype=object)
    src = np.arange(n_docs, dtype=np.int64) % 20
    # mild per-source drift: source s draws from a window offset by s
    toks = (rng.integers(0, 4000, size=(n_docs, 60)) + src[:, None] * 50) % 5000
    texts = [" ".join(row) for row in vocab[toks]]
    tmp = f"{path}.tmp.{os.getpid()}"
    langs = np.array(["en", "de", "fr", "es", "zh"], dtype=object)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts),
                "source": pa.array([f"src{s}" for s in src], pa.string()),
                # q96's gate columns: cycling langs + true char counts
                "lang": pa.array(langs[np.arange(n_docs) % 5]),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)


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

    from cs_insights_crawler_ray.pipelines import textops as T

    OPS = [
        ("q13_token_stats", T.q13_token_stats),
        ("q76_bigram_coverage", T.q76_bigram_coverage),
        ("q79_simpson", T.q79_simpson_diversity),
        ("q89_mask_terms", T.q89_mask_terms),
        ("q92_source_drift", T.q92_source_drift),
        ("q95_rule_hits", T.q95_rule_hits),
        ("q96_filter_funnel", T.q96_filter_funnel),
    ]
    for n in sizes:
        d = f"/tmp/text_probe_{n}"
        generate(n, d)
        print(f"--- {n:,} docs ---")
        for name, fn in OPS:
            t0 = time.perf_counter()
            res = fn(d)
            if hasattr(res, "materialize"):
                res = res.materialize()
            rows = res.count() if hasattr(res, "count") and callable(res.count) else len(res)
            print(f"{name:22s} {time.perf_counter() - t0:6.1f}s  {rows:,} rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
