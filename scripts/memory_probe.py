#!/usr/bin/env python
"""Memory evidence one decade above bench scale (VERDICT r04 #3): run
the crawl headline at 10x the bench workload plus the heaviest query
families over sf1-SHAPED synthetic tables (10x sf0.1 row counts),
sampling peak system RSS and Ray object-store usage per phase and
reporting the engine's spill stats — the streaming-execution proof
that no stage's memory grows with the input a decade past bench scale.

    python scripts/memory_probe.py             # full probe (~10 min)
    python scripts/memory_probe.py --no-crawl  # queries only

Output: one JSON line per phase + a summary line for BASELINE.md.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))  # repo root (run from there)
sys.path.insert(0, _SCRIPTS)  # sibling probe generators

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF1_DIR = "/tmp/mem_probe_sf1"
SRC = "/root/testdata/sf0.1"
GiB = 1 << 30


def _meminfo_used_bytes() -> int:
    info = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            info[k] = int(v.strip().split()[0]) * 1024
    return info["MemTotal"] - info["MemAvailable"]


class Sampler(threading.Thread):
    """0.25 s sampler: system used bytes + Ray object-store used bytes
    (total minus available); per-phase peaks via mark()."""

    def __init__(self):
        super().__init__(daemon=True)
        self.stop_flag = False
        self.lock = threading.Lock()
        self.phase = "idle"
        self.peaks: dict[str, dict[str, float]] = {}
        import ray

        self.store_total = int(
            ray.cluster_resources().get("object_store_memory", 0)
        )

    def mark(self, phase: str) -> None:
        with self.lock:
            self.phase = phase

    def run(self) -> None:
        import ray

        while not self.stop_flag:
            used = _meminfo_used_bytes()
            try:
                avail = int(
                    ray.available_resources().get("object_store_memory", 0)
                )
            except Exception:
                avail = self.store_total
            store_used = self.store_total - avail
            with self.lock:
                p = self.peaks.setdefault(
                    self.phase, {"rss": 0, "store": 0}
                )
                p["rss"] = max(p["rss"], used)
                p["store"] = max(p["store"], store_used)
            time.sleep(0.25)


def _spill_stats() -> str:
    """Object-spill accounting from the session's spill directory
    (created on first spill; absent == nothing spilled).  The
    memory_summary API needs grpc, which this sandbox lacks — the
    filesystem is the ground truth anyway."""
    import glob as _glob

    import ray

    try:
        session = ray._private.worker._global_node.get_session_dir_path()
    except Exception:
        cands = sorted(_glob.glob("/tmp/ray/*/session_*"))
        session = cands[-1] if cands else ""
    files = _glob.glob(f"{session}/ray_spilled_objects*/**", recursive=True)
    files = [f for f in files if os.path.isfile(f)]
    if not files:
        return f"0 spilled objects (no spill dir under {session or '?'})"
    total = sum(os.path.getsize(f) for f in files)
    return f"{len(files)} spilled files, {total / GiB:.2f} GiB"


def generate_sf1() -> None:
    """sf1-shaped tables: documents 50k / events 1M / embeddings 20k
    via the family probes' deterministic generators; lineitem+orders
    tiled 10x from sf0.1 (multi-row-group so Ray gets real blocks);
    dimension tables copied verbatim (dimensions don't scale with sf
    in the workloads probed here)."""
    from event_scale_probe import generate as gen_events
    from text_scale_probe import generate as gen_docs
    from vector_scale_probe import generate as gen_vecs

    os.makedirs(SF1_DIR, exist_ok=True)
    gen_docs(50_000, SF1_DIR)
    gen_events(1_000_000, SF1_DIR)
    gen_vecs(20_000, SF1_DIR)
    for t in ("part", "supplier", "customer", "nation", "region"):
        dst = f"{SF1_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(f"{SRC}/{t}.parquet", dst)
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        dst = f"{SF1_DIR}/{t}.parquet"
        base = pq.read_table(f"{SRC}/{t}.parquet")
        want = base.num_rows * 10
        if os.path.exists(dst):
            try:
                if pq.read_metadata(dst).num_rows == want:
                    continue
            except Exception:
                pass
        off = int(pa.compute.max(base[key]).as_py()) + 1
        copies = []
        for i in range(10):
            c = base.set_column(
                base.schema.get_field_index(key),
                key,
                pa.compute.add(base[key], i * off),
            )
            copies.append(c)
        tiled = pa.concat_tables(copies)
        pq.write_table(tiled, dst, row_group_size=131_072)


def main() -> None:
    import ray

    no_crawl = "--no-crawl" in sys.argv
    generate_sf1()
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sampler = Sampler()
    sampler.start()
    baseline = _meminfo_used_bytes()
    phases: dict[str, float] = {}

    def run_phase(name, fn):
        sampler.mark(name)
        t0 = time.perf_counter()
        res = fn()
        if hasattr(res, "materialize"):
            res.materialize()
        phases[name] = round(time.perf_counter() - t0, 2)
        sampler.mark("idle")

    if not no_crawl:
        from cs_insights_crawler_ray.fixtures.content_store import (
            ContentStoreConfig,
        )
        from cs_insights_crawler_ray.pipelines.crawl import (
            CrawlConfig, run_crawl,
        )

        wave_size = 491_520  # 10x the bench headline wave
        cfg = CrawlConfig(
            store=ContentStoreConfig(
                seed=42, n_hosts=512, pages_per_host=100_000,
                img_min=192, img_max=320,
            ),
            n_seeds=wave_size * 2,
            host_budget=max(8, wave_size // 256),
            wave_size=wave_size,
            n_waves=2,
            max_depth=10,
            n_shards=8,
            fetch_batch=256,
            seen_capacity=1 << 19,
            extract_features=True,
        )
        out = "/tmp/mem_probe_crawl"
        shutil.rmtree(out, ignore_errors=True)
        run_phase("crawl_983k_urls", lambda: run_crawl(cfg, out))

    from cs_insights_crawler_ray.pipelines import ann, dedup, relational as R
    from cs_insights_crawler_ray.pipelines import textops

    run_phase("q44_parts_rollup", lambda: R.q44_parts_rollup(SF1_DIR))
    run_phase("q83_keep_latest", lambda: R.q83_keep_latest(SF1_DIR))
    run_phase("q82_mad_outliers", lambda: R.q82_mad_outliers(SF1_DIR))
    run_phase(
        "q68_ngram_jaccard", lambda: dedup.q68_ngram_jaccard_join(SF1_DIR)
    )
    run_phase(
        "q76_bigram_coverage", lambda: textops.q76_bigram_coverage(SF1_DIR)
    )
    run_phase("q94_knn_graph_20k", lambda: ann.q94_knn_graph(SF1_DIR))

    sampler.stop_flag = True
    sampler.join(timeout=2)
    spill = _spill_stats()
    report = {
        "metric": "peak RSS / object-store per phase, sf1-shaped inputs",
        "baseline_used_gib": round(baseline / GiB, 2),
        "object_store_total_gib": round(sampler.store_total / GiB, 2),
        "phases": {
            name: {
                "wall_sec": phases.get(name),
                "peak_rss_gib": round(p["rss"] / GiB, 2),
                "peak_rss_above_baseline_gib": round(
                    max(0.0, p["rss"] - baseline) / GiB, 2
                ),
                "peak_object_store_gib": round(p["store"] / GiB, 2),
            }
            for name, p in sampler.peaks.items()
            if name != "idle"
        },
        "spill_stats": spill,
    }
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
