#!/usr/bin/env python
"""Per-query scale slopes (VERDICT r04 #8): time the bench suite's
~2 s queries at sf0.01 AND sf0.1 in one warmed session (min of 2
draws each) to separate fixed Ray/session overhead from data-driven
cost.  slope = t(sf0.1) / t(sf0.01); the input grows 10x for the
document/event/lineitem families and 4x for embeddings (500 -> 2,000
vectors), so a healthy streaming operator shows slope << data-ratio
(fixed overhead dominates at this scale) and NEVER slope >>
data-ratio (that would be superlinear).

    python scripts/slope_probe.py

Output: one JSON line for BASELINE.md."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = {
    # name -> (module, fn, input family for the data-ratio column)
    "q68_ngram_jaccard_join": ("dedup", "q68_ngram_jaccard_join", "documents x10"),
    "q80_pmi_collocations": ("textops", "q80_pmi_collocations", "documents x10"),
    "q82_mad_outliers": ("relational", "q82_mad_outliers", "events x10"),
    "q94_knn_graph": ("ann", "q94_knn_graph", "embeddings x4"),
    "q94b_ivf_knn_graph": ("ann", "q94b_ivf_knn_graph", "embeddings x4"),
    "q102_model_score": ("textops", "q102_model_score", "documents x10"),
    "q103_contrastive_triplets": ("ann", "q103_contrastive_triplets", "embeddings x4"),
    "q105_curation_pipeline": ("curation", "q105_curation_pipeline", "documents x10"),
}


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # warm the worker pool (bench.py's convention)
    rd.range(1_000_000, override_num_blocks=64).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    import importlib

    out = {}
    for name, (mod, fn, family) in QUERIES.items():
        m = importlib.import_module(f"cs_insights_crawler_ray.pipelines.{mod}")
        f = getattr(m, fn)
        times = {}
        for sf in ("0.01", "0.1"):
            draws = []
            for _ in range(2):
                t0 = time.perf_counter()
                res = f(f"/root/testdata/sf{sf}")
                if hasattr(res, "materialize"):
                    res.materialize()
                draws.append(round(time.perf_counter() - t0, 3))
            times[sf] = min(draws)
        out[name] = {
            "sf0.01_sec": times["0.01"],
            "sf0.1_sec": times["0.1"],
            "slope": round(times["0.1"] / max(times["0.01"], 1e-9), 2),
            "data_ratio": family,
        }
    print(json.dumps({"metric": "per-query scale slope sf0.01->sf0.1",
                      "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                      "queries": out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
