"""CLI — the reference's ``cli main`` surface (``process.py:24-153``)
plus the crawl engine.

    python -m cs_insights_crawler_ray ingest --cache-dir DIR \
        --use papers --use abstracts --use authors --filter DBLP \
        --out-dir OUT
    python -m cs_insights_crawler_ray crawl --out-dir OUT \
        [--resume] [--waves N] [--wave-size K] [--host-budget B] ...

Owns its Ray session (guarded init, shutdown at exit) — library code
never initializes Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cs_insights_crawler_ray")
    ap.add_argument(
        "--ray-address", default=None,
        help="Ray cluster address; defaults to $RAY_ADDRESS, else a "
             "local session.  Under `ray job submit` the job runtime "
             "sets $RAY_ADDRESS to the running cluster, so the driver "
             "attaches instead of spawning a second Ray.",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="S2-style release ingest (reference cli main)")
    ing.add_argument("--cache-dir", required=True)
    ing.add_argument("--out-dir", default=None)
    ing.add_argument("--use", action="append", default=None,
                     help="table to ingest (papers/abstracts/authors); repeatable")
    ing.add_argument("--filter", action="append", default=None,
                     help="source filter, union semantics (ACL/DBLP/ArXiv/...); repeatable")

    db = sub.add_parser(
        "dblp", help="DBLP release explode + filter (reference dblpclient path)"
    )
    db.add_argument("--release-dir", required=True,
                    help="directory holding the release artifacts "
                         "(dblp-*.xml.gz + .md5); stands in for the "
                         "reference's HTTPS listing")
    db.add_argument("--cache-dir", required=True)
    db.add_argument("--from-timestamp", default="1970-01-01",
                    help="F1 cutoff (keep @mdate strictly after)")
    db.add_argument("--access", action="append", default=None,
                    choices=["oa", "closed"],  # loud refusal: a typo like
                    # 'open' silently kept ZERO rows (the filter keeps only
                    # listed types) — same convention as IngestConfig.validate
                    help="F2 access type to keep (oa/closed); repeatable; "
                         "omit to skip the access filter")
    db.add_argument("--skip", type=int, default=1,
                    help="nth-newest release to pick (1 = newest)")
    db.add_argument("--out-dir", default=None)

    cr = sub.add_parser("crawl", help="URL-frontier crawl over the synthetic web")
    cr.add_argument("--out-dir", required=True)
    cr.add_argument("--resume", action="store_true")
    cr.add_argument("--waves", type=int, default=5)
    cr.add_argument("--wave-size", type=int, default=1024)
    cr.add_argument("--host-budget", type=int, default=8)
    cr.add_argument("--seeds", type=int, default=256)
    cr.add_argument("--hosts", type=int, default=64)
    cr.add_argument("--shards", type=int, default=4)
    cr.add_argument("--seed", type=int, default=42)
    cr.add_argument("--features", action="store_true",
                    help="enable the feature/embedding extraction stage")
    cr.add_argument("--recency-weight", type=float, default=0.0,
                    help="deterministic recency score term: score += w * "
                         "(wave - disc_wave); positive = freshness-first, "
                         "0 = off (bit-identical to the two-term order)")

    args = ap.parse_args(argv)

    import os

    import ray

    if not ray.is_initialized():
        addr = args.ray_address or os.environ.get("RAY_ADDRESS") or "local"
        ray.init(address=addr, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "ingest":
            from .config import IngestConfig
            from .pipelines.ingest import ingest_release

            cfg = IngestConfig(
                cache_dir=args.cache_dir,
                use_tables=tuple(args.use or ("papers", "abstracts", "authors")),
                s2_filters=tuple(args.filter or ()),
                out_dir=args.out_dir,
            ).validate()
            out = ingest_release(
                cfg.cache_dir, out_dir=cfg.out_dir,
                s2_filters=cfg.s2_filters, use_tables=cfg.use_tables,
            )
            print(json.dumps({k: ds.count() for k, ds in out.items()}))
        elif args.cmd == "dblp":
            from datetime import datetime as _dt
            from pathlib import Path

            from .pipelines.dblp import download_and_filter_release

            rel = Path(args.release_dir)
            listing = sorted(p.name for p in rel.iterdir() if p.is_file())
            ds = download_and_filter_release(
                listing,
                fetch=lambda name: (rel / name).read_bytes(),
                cache_dir=args.cache_dir,
                from_timestamp=_dt.fromisoformat(args.from_timestamp),
                access_types=set(args.access) if args.access else None,
                skip=args.skip,
            )
            if args.out_dir:
                from .sources.sinks import clear_partition

                ds = ds.materialize()
                clear_partition(args.out_dir)
                ds.write_json(args.out_dir)
            print(json.dumps({"rows": ds.count()}))
        else:
            from .fixtures.content_store import ContentStoreConfig
            from .pipelines.crawl import CrawlConfig, run_crawl

            cfg = CrawlConfig(
                store=ContentStoreConfig(seed=args.seed, n_hosts=args.hosts),
                n_seeds=args.seeds,
                host_budget=args.host_budget,
                wave_size=args.wave_size,
                n_waves=args.waves,
                n_shards=args.shards,
                extract_features=args.features,
                recency_weight=args.recency_weight,
            )
            metrics = run_crawl(cfg, args.out_dir, resume=args.resume)
            print(json.dumps({"cumulative": metrics["cumulative"],
                              "waves": len(metrics["by_wave"])}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
