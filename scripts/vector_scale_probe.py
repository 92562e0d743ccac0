#!/usr/bin/env python
"""Vector-family scale probe: q94 (exact kNN graph), q101 (integer
PCA power iteration), q77 (dim stats) and q88 (centroid outliers) on
synthetic embedding tables 4x-8x past sf0.1's 5,000 vectors.
Verifies the family's scale shapes: q94's O(B^2) pair/merge tasks
actually fan out across blocks (the parquet is written with small row
groups so Ray splits it), q101's driver fold stays at blocks x d^2
ints, and the stateless passes stay linear.  Run from the repo root:

    python scripts/vector_scale_probe.py [n_vecs ...]  # default 20000 40000
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

D = 64


def generate(n: int, out_dir: str, seed: int = 31) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = f"{out_dir}/embeddings.parquet"
    if os.path.exists(path):
        try:
            if pq.read_metadata(path).num_rows == n:
                return
        except Exception:
            pass
        os.remove(path)
    rng = np.random.Generator(np.random.PCG64(seed))
    x = rng.standard_normal((n, D)).astype(np.float32) * 0.3
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in x], pa.list_(pa.float32())
                ),
                "label": pa.array(
                    (np.arange(n) % 10).astype(np.int32), pa.int32()
                ),
            }
        ),
        tmp,
        row_group_size=4096,  # force multiple Ray blocks -> real B^2 fan-out
    )
    os.replace(tmp, path)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [20_000, 40_000]
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

    from cs_insights_crawler_ray.pipelines import ann, cluster

    OPS = [
        ("q77_dim_stats", cluster.q77_dim_stats),
        ("q88_centroid_outliers", cluster.q88_centroid_outliers),
        ("q94_knn_graph", ann.q94_knn_graph),
        # the approximate tier: pair work n²·nprobe/C instead of n² —
        # must pull ahead of the exact graph as n grows
        ("q94b_ivf_knn_graph", ann.q94b_ivf_knn_graph),
    ]
    for n in sizes:
        d = f"/tmp/vec_probe_{n}"
        generate(n, d)
        print(f"--- {n:,} vectors x {D} dims ---")
        for name, fn in OPS:
            t0 = time.perf_counter()
            res = fn(d)
            if hasattr(res, "materialize"):
                res = res.materialize()
            rows = res.count() if hasattr(res, "count") and callable(res.count) else len(res)
            print(f"{name:22s} {time.perf_counter() - t0:6.1f}s  {rows:,} rows")
        # q101's engine body (moments + iteration) without the
        # serial oracle-artifact build (that is O(n*d^2) pure Python,
        # deliberately not the engine's cost)
        from cs_insights_crawler_ray.pipelines.cluster import pca_power_engine

        t0 = time.perf_counter()
        comp = pca_power_engine(d)
        print(f"{'q101_pca_engine':22s} {time.perf_counter() - t0:6.1f}s  {comp.num_rows} dims")
    ray.shutdown()


if __name__ == "__main__":
    main()
