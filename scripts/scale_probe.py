"""Frontier scale probe — evidence for the 10^10-URL scaling story.

Runs the crawl twice at identical wave width but a 10x different
frontier (seed) size and reports per-wave phase constants.  The claim
under test: with the incremental LSM-style frontier (state/frontier.py
— per-host head + sorted runs + cursors), steady-state per-wave work
is O(wave_size + head + new_links) with NO frontier-sized scan at all;
the only O(frontier) steps are the one-time seed/resume sort and the
compaction fused with full checkpoint snapshots every
``backlog_full_every`` waves (hidden behind the fetch).  A 10x backlog
must therefore NOT produce a 10x delta-wave wall.  This probe is what
killed the round-3 design (per-wave rest scan: 53 s/wave of barrier
wait at 20M rows, residue ratio 67x).

Usage: python scripts/scale_probe.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# the serial (non-fetch-overlapped) phase keys every residue metric
# sums — ONE list so the endurance block and serial_residue cannot
# silently drift apart when a new serial phase is added
SERIAL_PHASE_KEYS = ("admission", "links", "log", "merge_launch",
                     "payload_join", "checkpoint", "adm_prebuild_join")

def probe(n_seeds: int, tag: str, num_cpus: int, n_hosts: int = 512,
          n_waves: int = 3, zipf_a: float = 1.3, n_shards: int = 8) -> dict:
    import ray

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cs_insights_crawler_ray.fixtures.content_store import ContentStoreConfig
    from cs_insights_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    cfg = CrawlConfig(
        store=ContentStoreConfig(seed=42, n_hosts=n_hosts,
                                 pages_per_host=10_000_000,
                                 img_min=96, img_max=128,
                                 zipf_a=zipf_a),
        n_seeds=n_seeds,
        host_budget=32,
        wave_size=8192,
        n_waves=n_waves,
        max_depth=10,
        n_shards=n_shards,
        fetch_batch=256,
        seen_capacity=1 << 20,
        extract_features=False,  # keep fetch light so constants are exposed
    )
    out = f"/tmp/scale_probe_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    m = run_crawl(cfg, out)
    wall = time.perf_counter() - t0
    waves = {
        w: {k: v for k, v in wm["phase_sec"].items()}
        | {"backlog": wm["backlog"], "new_urls": wm["new_urls"]}
        for w, wm in m["by_wave"].items()
    }
    ray.shutdown()
    return {"n_seeds": n_seeds, "wall_sec": round(wall, 2), "waves": waves}


def resume_probe(n_seeds: int, tag: str, num_cpus: int) -> dict:
    """Resume wall time from the probe run's last manifest with one
    extra wave: measures the replay chain (base snapshot + delta
    (admitted, new) pairs — O(waves since full snapshot), never
    O(waves)) plus one steady-state wave at this frontier size."""
    import ray

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from cs_insights_crawler_ray.fixtures.content_store import ContentStoreConfig
    from cs_insights_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    cfg = CrawlConfig(
        store=ContentStoreConfig(seed=42, n_hosts=512, pages_per_host=10_000_000,
                                 img_min=96, img_max=128),
        n_seeds=n_seeds,
        host_budget=32,
        wave_size=8192,
        n_waves=4,  # probe() ran 3: replay chain + exactly one new wave
        max_depth=10,
        n_shards=8,
        fetch_batch=256,
        seen_capacity=1 << 20,
        extract_features=False,
    )
    out = f"/tmp/scale_probe_{tag}"
    t0 = time.perf_counter()
    m = run_crawl(cfg, out, resume=True)
    wall = time.perf_counter() - t0
    wave_phases = m["by_wave"][3]["phase_sec"]
    return {
        "resume_wall_sec": round(wall, 2),
        "resumed_wave_phase_sec": wave_phases,
        "replay_plus_admission_sec": round(
            wall - sum(v for k, v in wave_phases.items() if k != "admission"), 2
        ),
    }


def main() -> None:
    num_cpus = 32
    if "--endurance" in sys.argv:
        # 12 waves over a 2M-row frontier: per-wave serial residue must
        # stay FLAT across the wave-8 compaction (its O(frontier)
        # merge+write hides behind that wave's fetch)
        r = probe(2_000_000, "endurance", num_cpus, n_waves=12)
        keys = SERIAL_PHASE_KEYS
        r["serial_per_wave"] = {
            wv: round(sum(w.get(k, 0.0) for k in keys), 2)
            for wv, w in r["waves"].items()
        }
        r["metric"] = "12-wave endurance: serial residue across compaction"
        print(json.dumps(r))
        return
    if "--hosts1m" in sys.argv:
        # politeness floor, NEXT decade (VERDICT r04 #5): 512 -> 1M
        # hosts at the SAME 2M-row frontier.  At 1M hosts every host
        # holds ~2 pending rows (< budget 32), so the per-host budget
        # prefix — the head — IS the whole frontier: this measures the
        # irreducible O(head) term any per-host-budgeted scheduler
        # pays per wave at 10^8-host-scale host/row ratios.  The third
        # arm re-runs 1M hosts at n_shards=32 (4x) to measure the
        # documented mitigation: heads are per-PARTITION, so growing
        # n_shards with the host count holds the per-partition head —
        # and the serial merge term — constant.
        lo = probe(2_000_000, "h1m_lo", num_cpus, n_hosts=512)
        hi = probe(2_000_000, "h1m_hi", num_cpus, n_hosts=1_048_576)
        hi32 = probe(2_000_000, "h1m_hi32", num_cpus,
                     n_hosts=1_048_576, n_shards=32)

        def resid(r: dict) -> float:
            return round(
                sum(
                    sum(w.get(k, 0.0) for k in SERIAL_PHASE_KEYS)
                    for wv, w in r["waves"].items()
                    if int(wv) > 0
                ),
                2,
            )

        print(json.dumps({
            "metric": "per-wave serial residue vs host count, next decade"
                      " (same 2M-row frontier; third arm = n_shards 8->32"
                      " at 1M hosts)",
            "num_cpus": num_cpus,
            "hosts_512_shards8": lo,
            "hosts_1M_shards8": hi,
            "hosts_1M_shards32": hi32,
            "serial_residue_512_sec": resid(lo),
            "serial_residue_1M_sec": resid(hi),
            "serial_residue_1M_shards32_sec": resid(hi32),
            "host_ratio": 2048.0,
            "residue_ratio_shards8": round(resid(hi) / max(resid(lo), 1e-9), 2),
            "shards32_mitigation": round(
                resid(hi32) / max(resid(hi), 1e-9), 2
            ),
        }))
        return
    hosts_mode = "--hosts" in sys.argv
    skew_mode = "--skew" in sys.argv and not hosts_mode
    deep = "--deep" in sys.argv and not hosts_mode and not skew_mode
    if skew_mode:
        # hot-host-skew probe (north_rule: "hot-host skew handled
        # explicitly"): SAME 2M-row frontier and wave width, link-target
        # zipf exponent 1.3 -> 3.0 — at 3.0 the top host draws ~83% of
        # all new link mass, so its frontier partition's runs hold most
        # of the backlog.  The claim: per-wave cost and fetch width are
        # UNAFFECTED, because (a) admission is budget-bounded per host
        # (the hot host contributes <= host_budget rows per wave no
        # matter how many it has pending), (b) the driver key sort sees
        # only per-partition candidate KEYS (<= wave_size each), and
        # (c) _prepare_admission splits admitted rows into near-equal
        # fetch blocks irrespective of which partition they came from —
        # the explicit skew-breaking repartition of the north rule.
        # Hot-host rows beyond the head sit in object-store runs and
        # cost nothing until their cursor advances.
        small = probe(2_000_000, "skew_lo", num_cpus, zipf_a=1.3)
        large = probe(2_000_000, "skew_hi", num_cpus, zipf_a=3.0)
    elif hosts_mode:
        # politeness-floor probe: SAME 2M-row frontier, 64x the hosts
        # (512 -> 32,768), so each partition's head grows from
        # 64 x budget = 2k rows to 4,096 x budget = 131k rows.  The
        # claim: per-wave cost is O(head + new) — the head IS the
        # irreducible per-host politeness working set, and at cluster
        # scale n_shards grows to hold per-partition heads constant.
        small = probe(2_000_000, "hosts_lo", num_cpus, n_hosts=512)
        large = probe(2_000_000, "hosts_hi", num_cpus, n_hosts=32_768)
    elif deep:
        # VERDICT r03 #7: one decade further — 2M -> 20M frontier rows
        # at the SAME wave width, plus the resume replay cost at 20M
        small = probe(2_000_000, "small20", num_cpus)
        large = probe(20_000_000, "large20", num_cpus)
    else:
        small = probe(200_000, "small", num_cpus)
        large = probe(2_000_000, "large", num_cpus)

    def serial_residue(r: dict) -> float:
        # phases serial at the wave barrier (not overlapped), steady
        # state only: wave 0's admission absorbs the pipelined seed
        # canonicalization tail, which is O(seeds) by definition.
        # adm_prebuild_join is the NON-overlapped remainder of the next
        # wave's admission build — it must count, or a frontier-size-
        # dependent regression in the key-sort path would be invisible
        keys = SERIAL_PHASE_KEYS
        return round(
            sum(
                sum(w.get(k, 0.0) for k in keys)
                for wv, w in r["waves"].items()
                if int(wv) > 0
            ),
            2,
        )

    if hosts_mode:
        metric = "per-wave serial residue vs host count (same frontier size)"
        ratio_key, ratio_val = "head_ratio", 64.0
    elif skew_mode:
        metric = "per-wave serial residue vs link-target zipf skew (same frontier size)"
        ratio_key, ratio_val = "zipf_a_hi_over_lo", 3.0 / 1.3
    else:
        metric = "per-wave serial residue vs frontier size (same wave width)"
        ratio_key, ratio_val = "frontier_ratio", 10.0
    result = {
        "metric": metric,
        "num_cpus": num_cpus,
        "small": small,
        "large": large,
        "serial_residue_small_sec": serial_residue(small),
        "serial_residue_large_sec": serial_residue(large),
        ratio_key: round(ratio_val, 3),
        "residue_ratio": round(
            serial_residue(large) / max(serial_residue(small), 1e-9), 2
        ),
    }
    if deep:
        result["resume_at_large"] = resume_probe(
            20_000_000, "large20", num_cpus
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
