#!/usr/bin/env python
"""Event-analytics-family scale probe: q81 (winsorize), q82 (MAD
outliers), q83 (keep-latest), q86 (retention cohorts), q87 (gap
quantiles), q91 (behavior trigrams) on synthetic event tables one to
two orders of magnitude
past sf0.1's 100k rows.  Verifies the family's scale shapes hold —
histogram/partial exchanges stay value- or key-bounded, nothing
driver-materializes with the row count — by reporting wall time and
the driver-visible row counts at each size.  Run from the repo root:

    python scripts/event_scale_probe.py [n_events ...]  # default 1e6 4e6
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def generate(n: int, out_dir: str, seed: int = 43) -> None:
    """n events over n//100 users, 8 types, 90 days, lognormal-ish
    values in cents with a 1% heavy tail (so winsorize/MAD bite)."""
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/events.parquet"
    if os.path.exists(path):
        try:
            if pq.read_metadata(path).num_rows == n:
                return
        except Exception:
            pass
    rng = np.random.default_rng(seed)
    users = rng.integers(0, max(1, n // 100), n)
    ts0 = np.int64(1_700_000_000) * 1_000_000  # epoch µs
    ts = ts0 + rng.integers(0, 90 * 86_400_000_000, n)
    types = np.array(["view", "click", "buy", "scroll", "share",
                      "like", "search", "login"])[rng.integers(0, 8, n)]
    vals = np.round(rng.lognormal(2.0, 1.0, n), 2)
    tail = rng.random(n) < 0.01
    vals[tail] *= 100.0
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users.astype(np.int64)),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(tbl, path)


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cs_insights_crawler_ray.pipelines import relational as R

    OPS = [
        ("q81_winsorize", R.q81_winsorize_values),
        ("q82_mad_outliers", R.q82_mad_outliers),
        ("q83_keep_latest", R.q83_keep_latest),
        ("q86_retention", R.q86_retention_cohorts),
        ("q87_gap_quantiles", R.q87_gap_quantiles),
        ("q91_trigrams", R.q91_behavior_trigrams),
    ]
    for n in sizes:
        d = f"/tmp/event_probe_{n}"
        generate(n, d)
        print(f"--- {n:,} events ---")
        for name, fn in OPS:
            t0 = time.perf_counter()
            res = fn(d)
            if hasattr(res, "materialize"):
                res = res.materialize()
            rows = res.count() if hasattr(res, "count") and callable(res.count) else len(res)
            print(f"{name:20s} {time.perf_counter() - t0:6.1f}s  {rows:,} rows")
    ray.shutdown()


if __name__ == "__main__":
    main()
