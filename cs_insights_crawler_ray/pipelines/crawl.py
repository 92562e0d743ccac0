"""The crawl engine: URL frontier + fetch scheduler as a Ray Data
wave loop (BASELINE.json north_rule).

Replaces the reference's sequential client loop (serial fetch in
listing order, ``s2client.py:146-157``) with a deterministic parallel
restatement:

- **Ordering is data, not interleaving** (SURVEY.md §7.5 #1): every
  frontier row carries a total discovery key
  ``(disc_wave, disc_parent, disc_link)`` — wave discovered, parent's
  global fetch_seq, position in the parent page's link list.  Fetch
  order within a wave is the sort by ``(score, discovery key)``;
  global ``fetch_seq`` is assigned per wave by block-offset prefix
  sums (only the admitted set — bounded by the politeness budget —
  is ever globally numbered; the large frontier never is).
- **Politeness** = per-host token buckets refilled per wave
  (state/politeness.py) enforced before fetch.
- **Seen set** = sharded bloom+cuckoo+exact actors keyed by
  ``host_hash % shards`` (state/seen.py).
- **Payload** lands in the Lance-abstracted sink partitioned by wave
  (sources/sinks.py), schema per input_hint.
- **Resume** = wave-granular manifests committed atomically AFTER the
  wave's payload/backlog/snapshots are on disk (sources/checkpoint.py);
  a killed run restarts from the last committed wave with zero
  re-fetches (tests/test_resume.py asserts this).

Per-wave dataflow (all lazy until the wave barrier):

    backlog ── local_host_topk (combiner) ─ groupby(host_hash) admission
            ─ sort(score, dk) ─ limit(wave_size) ─ fetch_seq assignment
            ─ FetchStage actor pool ─┬─ DecodeVerifyStage ─ payload sink
                                     └─ explode ─ canonicalize ─ robots
                                        ─ wave-dedupe ─ seen-filter ─┐
    backlog' = (backlog ∖ admitted) ∪ new ◄──────────────────────────┘
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..fixtures.content_store import ContentStoreConfig, robots_allowed, seed_urls
from ..functions.urls import canonicalize_batch
from ..sources.checkpoint import WaveManifest, commit_manifest, latest_manifest
from ..sources.sinks import clear_partition, write_payload
from ..stages.decode import DecodeVerifyStage
from ..stages.fetch import FetchStage
from ..stages.links import RobotsFilterStage, canonicalize_links, explode_links
from ..stages.seen_filter import SeenFilterStage
from ..state.politeness import DISCOVERY_KEY, host_admission, local_host_topk
from ..state.seen import ShardedSeenSet

FRONTIER_COLS = [
    "url_canon", "url_hex", "url_sha1", "host", "host_hash",
    "depth", "disc_wave", "disc_parent", "disc_link",
]


@dataclass
class CrawlConfig:
    store: ContentStoreConfig = field(default_factory=ContentStoreConfig)
    n_seeds: int = 64
    host_budget: int = 4          # politeness: fetches per host per wave
    wave_size: int = 128          # global fetches per wave
    n_waves: int = 5
    max_depth: int = 8
    n_shards: int = 4             # seen-set actors
    fetch_actors: int = 2
    fetch_batch: int = 64
    decode_batch: int = 64
    seen_capacity: int = 1 << 18


def _frontier_table(batch: pa.Table) -> pa.Table:
    """Project + order columns to the canonical frontier schema (so
    union of differently-produced blocks has one schema)."""
    hexes = pa.array([b.hex() for b in batch["url_sha1"].to_pylist()], pa.string())
    if "url_hex" in batch.column_names:
        batch = batch.drop_columns(["url_hex"])
    batch = batch.append_column("url_hex", hexes)
    return pa.table(
        {
            "url_canon": batch["url_canon"].cast(pa.string()),
            "url_hex": batch["url_hex"],
            "url_sha1": batch["url_sha1"].cast(pa.binary(20)),
            "host": batch["host"].cast(pa.string()),
            "host_hash": batch["host_hash"].cast(pa.uint64()),
            "depth": batch["depth"].cast(pa.int32()),
            "disc_wave": batch["disc_wave"].cast(pa.int32()),
            "disc_parent": batch["disc_parent"].cast(pa.int64()),
            "disc_link": batch["disc_link"].cast(pa.int32()),
        }
    )


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _with_seq(t: pa.Table, offset: int) -> pa.Table:
    return t.append_column(
        "fetch_seq", pa.array(np.arange(offset, offset + t.num_rows), pa.int64())
    )


def _assign_fetch_seq(ds: rd.Dataset, start: int) -> tuple[rd.Dataset, int]:
    """Global consecutive numbering of the (bounded) admitted set via
    per-block offsets: block order after sort IS the global order, so
    an exclusive prefix-sum of block row counts gives each block its
    offset. Only counts travel to the driver."""
    refs = ds.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = start + np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
    out = [_with_seq.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out), start + int(sum(counts))


def build_seed_frontier(cfg: CrawlConfig, seen: ShardedSeenSet) -> rd.Dataset:
    """Seed list -> canonical frontier rows, robots-filtered, deduped
    (first seed-index wins), marked seen. disc key = (-1, -1, seed_idx)
    — the analog of the reference's listing order (s2client.py:153)."""
    seeds = seed_urls(cfg.store, cfg.n_seeds)
    t = pa.table(
        {
            "url": pa.array(seeds, pa.string()),
            "disc_wave": pa.array([-1] * len(seeds), pa.int32()),
            "disc_parent": pa.array([-1] * len(seeds), pa.int64()),
            "disc_link": pa.array(np.arange(len(seeds), dtype=np.int32), pa.int32()),
            "depth": pa.array([0] * len(seeds), pa.int32()),
        }
    )
    t = canonicalize_batch(t)
    robots = RobotsFilterStage(cfg.store)
    t = robots(t)
    t = _frontier_table(t)
    # dedupe (keep first by disc_link) — driver-side: the seed list is small
    df = t.to_pandas().sort_values("disc_link", kind="mergesort")
    df = df.drop_duplicates(subset=["url_hex"], keep="first")
    t = pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)
    if t.num_rows:
        digests = np.stack([np.frombuffer(b, np.uint8) for b in t["url_sha1"].to_pylist()])
        mask = seen.check_and_add(digests, t["host_hash"].to_numpy(zero_copy_only=False))
        assert mask.all(), "fresh seen set must accept all distinct seeds"
    return rd.from_arrow(t)


def _wave_dedupe(g: pd.DataFrame) -> pd.DataFrame:
    return g.sort_values(DISCOVERY_KEY, kind="mergesort").head(1)


def run_crawl(
    cfg: CrawlConfig,
    out_dir: str,
    resume: bool = False,
    seen: ShardedSeenSet | None = None,
) -> dict:
    """Run (or resume) the crawl; returns the final cumulative metrics.

    Output layout under out_dir:
      payload/wave=NNNNNN/   Lance/parquet payload partitions
      crawl_log/wave=NNNNNN/ (fetch_seq, url_canon, depth, wave)
      backlog/wave=NNNNNN/   frontier checkpoint AFTER the wave
      checkpoints/           seen-shard snapshots + manifests
    """
    out = Path(out_dir)
    ckpt = out / "checkpoints"
    own_seen = seen is None
    if seen is None:
        seen = ShardedSeenSet(cfg.n_shards, cfg.seen_capacity)
    try:
        start_wave = 0
        next_seq = 0
        cumulative = {"fetched": 0, "payload_rows": 0, "quarantined": 0, "new_urls": 0}
        manifest = latest_manifest(str(ckpt)) if resume else None
        if manifest is not None:
            seen.restore(manifest.seen_snapshots)
            backlog = rd.read_parquet(manifest.backlog_path).map_batches(
                _frontier_table, batch_format="pyarrow"
            ).materialize()
            start_wave = manifest.wave + 1
            next_seq = manifest.next_fetch_seq
            cumulative = dict(manifest.cumulative)
        else:
            backlog = build_seed_frontier(cfg, seen).materialize()
        metrics_by_wave = {}

        for wave in range(start_wave, cfg.n_waves):
            if backlog.count() == 0:
                break
            # ---- politeness admission (combiner -> keyed shuffle) ----
            B = cfg.host_budget
            admissible = (
                backlog.map_batches(
                    lambda b: local_host_topk(b, B), batch_format="pandas"
                )
                .groupby("host_hash")
                .map_groups(lambda g: host_admission(g, B), batch_format="pandas")
            )
            admitted = admissible.sort(["score"] + DISCOVERY_KEY).limit(cfg.wave_size)
            admitted, next_seq = _assign_fetch_seq(admitted, next_seq)
            n_admitted = admitted.count()
            if n_admitted == 0:
                break

            # ---- fetch (actor pool; politeness already enforced) ----
            fetched = admitted.map_batches(
                FetchStage,
                fn_constructor_args=(cfg.store,),
                batch_format="pyarrow",
                batch_size=cfg.fetch_batch,
                concurrency=cfg.fetch_actors,
            ).materialize()  # wave barrier: fetch exactly once, branch twice

            # ---- payload branch: decode-verify -> Lance-style sink ----
            payload = (
                fetched.map_batches(
                    DecodeVerifyStage,
                    fn_constructor_args=(cfg.store,),
                    batch_format="pyarrow",
                    batch_size=cfg.decode_batch,
                    concurrency=cfg.fetch_actors,
                )
                .map_batches(
                    lambda t: t.filter(t["ok"]).drop_columns(["ok"]),
                    batch_format="pyarrow",
                )
            )
            payload_path = write_payload(payload, str(out / "payload"), f"wave={wave:06d}")
            payload_rows = sum(
                pq.read_metadata(f).num_rows for f in Path(payload_path).glob("*.parquet")
            )

            # ---- crawl-order log (the headline determinism artifact) ----
            log_path = str(out / "crawl_log" / f"wave={wave:06d}")
            clear_partition(log_path)
            fetched.map_batches(
                lambda t: pa.table(
                    {
                        "fetch_seq": t["fetch_seq"],
                        "url_canon": t["url_canon"],
                        "depth": t["depth"],
                        "status": t["status"],
                    }
                ),
                batch_format="pyarrow",
            ).write_parquet(log_path)

            # ---- link branch: explode -> canon -> robots -> dedupe -> seen ----
            new_frontier = (
                fetched.map_batches(
                    lambda t, w=wave: explode_links(
                        t.filter(pc.equal(t["status"], pa.scalar("200"))), w
                    ),
                    batch_format="pyarrow",
                )
                .map_batches(canonicalize_links, batch_format="pyarrow")
                .map_batches(
                    RobotsFilterStage,
                    fn_constructor_args=(cfg.store,),
                    batch_format="pyarrow",
                    concurrency=2,
                )
                .map_batches(
                    lambda t: t.filter(pc.less_equal(t["depth"], pa.scalar(cfg.max_depth, pa.int32()))),
                    batch_format="pyarrow",
                )
                .map_batches(_frontier_table, batch_format="pyarrow")
                .groupby("url_hex")
                .map_groups(_wave_dedupe, batch_format="pandas")
                .map_batches(_frontier_table, batch_format="pyarrow")
                .map_batches(SeenFilterStage, fn_constructor_args=(seen,), batch_format="pyarrow", concurrency=2)
                .materialize()
            )
            n_new = new_frontier.count()

            # ---- backlog update: broadcast anti-filter of admitted ----
            admitted_hexes = set(
                pa.concat_tables(ray.get(admitted.to_arrow_refs()))["url_hex"].to_pylist()
            )
            href = ray.put(admitted_hexes)

            class _DropAdmitted:
                def __init__(self):
                    self.drop = ray.get(href)

                def __call__(self, t: pa.Table) -> pa.Table:
                    keep = pa.array([h not in self.drop for h in t["url_hex"].to_pylist()])
                    return t.filter(keep)

            backlog = (
                backlog.map_batches(_DropAdmitted, batch_format="pyarrow", concurrency=2)
                .union(new_frontier)
                .map_batches(_frontier_table, batch_format="pyarrow")
                .materialize()
            )

            # ---- wave barrier: checkpoint commit ----
            backlog_path = str(out / "backlog" / f"wave={wave:06d}")
            clear_partition(backlog_path)
            backlog.write_parquet(backlog_path)
            snaps = seen.snapshot(str(ckpt), wave)
            wave_metrics = {
                "admitted": int(n_admitted),
                "payload_rows": int(payload_rows),
                "quarantined": int(n_admitted - payload_rows),
                "new_urls": int(n_new),
                "backlog": int(backlog.count()),
            }
            metrics_by_wave[wave] = wave_metrics
            cumulative = {
                "fetched": cumulative["fetched"] + wave_metrics["admitted"],
                "payload_rows": cumulative["payload_rows"] + wave_metrics["payload_rows"],
                "quarantined": cumulative["quarantined"] + wave_metrics["quarantined"],
                "new_urls": cumulative["new_urls"] + wave_metrics["new_urls"],
            }
            commit_manifest(
                str(ckpt),
                WaveManifest(
                    wave=wave,
                    next_fetch_seq=next_seq,
                    backlog_path=backlog_path,
                    seen_snapshots=snaps,
                    payload_path=payload_path,
                    crawl_log_path=log_path,
                    metrics=wave_metrics,
                    cumulative=cumulative,
                ),
            )
        return {
            "cumulative": cumulative,
            "by_wave": metrics_by_wave,
            "next_fetch_seq": next_seq,
            "seen_stats": seen.stats(),
        }
    finally:
        if own_seen:
            seen.shutdown()


def read_crawl_log(out_dir: str) -> pd.DataFrame:
    """Full crawl order, sorted by fetch_seq — the parity artifact."""
    root = Path(out_dir) / "crawl_log"
    ds = rd.read_parquet(str(root))  # recurses into wave=* partitions
    df = ds.to_pandas()
    if "wave" in df.columns:  # hive partition column, if inferred
        df = df.drop(columns=["wave"])
    return df.sort_values("fetch_seq").reset_index(drop=True)
