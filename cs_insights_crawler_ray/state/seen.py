"""Sharded URL-seen set — bloom + cuckoo sketches with an exact
authority, held in long-lived Ray actors.

The reference's seen/idempotence mechanism is a disk cache of
downloaded files checked by md5 (reference ``dblpclient.py:340-350,
442-443``); it works because the crawl is sequential and the universe
is a few hundred files.  At 10^10 URLs the seen set is the central
shared mutable state — the one place the Dataset API genuinely cannot
express the semantics (a concurrent membership test-and-set), so it
drops to raw Ray actors per the build contract.

Sharding: ``host_hash % n_shards``.  This co-locates each host's URLs
in one shard (same key the politeness layer partitions by), bounds any
single actor's memory, and lets `check_and_add` calls from parallel
map_batches tasks fan out without a global lock.

Exactness contract (needed for byte-identical parity with the
sequential oracle, BASELINE.json north_star):

- bloom negative  -> definitely NEW (bloom has no false negatives);
  add to bloom + cuckoo + exact authority.
- bloom positive  -> consult the exact authority (a per-shard hash
  set of 20-byte digests).  For genuinely-new URLs this path is rare
  (≈ bloom FP rate), so the authority is touched ~never on the hot
  path; for a pure-sketch deployment set ``exact=False`` — bloom
  positives are then confirmed against the cuckoo chain (independent
  hash family: both sketches hold every added digest, so "seen"
  requires BOTH to say maybe and the FP rates multiply) and the
  residual FP rate is accepted (URLs wrongly considered seen are
  skipped — safe, just lossy).

Determinism under parallelism: callers dedupe each wave globally by
``url_sha1`` *before* the seen filter (groupby min-discovery-key), so
within a wave every digest reaches its shard exactly once and the
answer is independent of task interleaving; across waves the wave
barrier orders adds.
"""

from __future__ import annotations

import os
import pickle
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .bloom import CountingBloom
from .cuckoo import CuckooFilter

FRONTIER_SCHEMA = pa.schema(
    [
        ("url_canon", pa.string()),
        ("url_hex", pa.string()),
        ("url_sha1", pa.binary(20)),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("disc_wave", pa.int32()),
        ("disc_parent", pa.int64()),
        ("disc_link", pa.int32()),
    ]
)

_DISCOVERY_KEY = ["disc_wave", "disc_parent", "disc_link"]


def _digest_keys(rows: np.ndarray):
    """(N,20) uint8 -> three packed big-endian key arrays (u8,u8,u4)
    that together encode all 20 bytes; their lexicographic order equals
    memcmp row order."""
    d = np.ascontiguousarray(rows).reshape(-1, 20)
    k1 = np.ascontiguousarray(d[:, :8]).view(">u8").ravel().astype(np.uint64)
    k2 = np.ascontiguousarray(d[:, 8:16]).view(">u8").ravel().astype(np.uint64)
    k3 = np.ascontiguousarray(d[:, 16:20]).view(">u4").ravel().astype(np.uint32)
    return k1, k2, k3


class SortedDigestSet:
    """Exact membership authority over 20-byte digests as SORTED packed
    key arrays — 20 bytes/row contiguous (a Python ``set`` of bytes
    keys costs ~4-5x that in object headers at 10^6+ rows) with fully
    vectorized ``contains`` via searchsorted, no per-row Python on the
    bloom-positive path.

    LSM layout (the same pattern as ``state/frontier.py``): an ordered
    list of sorted runs; adds append a run (check_and_add's new rows
    arrive already sorted and unique), runs merge into one when the
    list exceeds ``max_runs``.  Membership: per run, locate the
    k1-equal range with two searchsorteds and confirm k2/k3 — SHA-1
    top-8-byte collisions are ~n^2/2^64, so the range is almost always
    a single row; wider ranges fall to a tiny Python loop."""

    __slots__ = ("runs", "max_runs", "n")

    def __init__(self, max_runs: int = 8):
        self.runs: list[tuple] = []  # [(k1,k2,k3) sorted asc], oldest first
        self.max_runs = max_runs
        self.n = 0

    def __len__(self) -> int:
        return self.n

    def add_rows(self, rows: np.ndarray, assume_sorted: bool = False) -> None:
        """Append (N,20) rows DISJOINT from the current contents
        (check_and_add guarantees it: new = sorted-unique minus seen;
        restore replays deltas, which are disjoint by construction).
        Pass assume_sorted=True when rows are already in memcmp order
        (check_and_add's new rows are); otherwise the keys are sorted
        here."""
        if rows.shape[0] == 0:
            return
        k1, k2, k3 = _digest_keys(rows)
        if not assume_sorted:
            order = np.lexsort((k3, k2, k1))
            k1, k2, k3 = k1[order], k2[order], k3[order]
        self.runs.append((k1, k2, k3))
        self.n += rows.shape[0]
        while len(self.runs) > self.max_runs:
            self._merge_smallest_two()

    def _merge_smallest_two(self) -> None:
        """Tiered merge (LSM): combine the two SMALLEST runs, so merge
        sizes grow geometrically and total merge work stays
        O(n log n) over the whole crawl — a full-set compaction every
        max_runs adds would re-sort the entire authority at the wave
        barrier (quadratic over a long run, and a barrier spike a
        wave-width fetch can't hide once shards hold 10^8 digests)."""
        a, b = sorted(range(len(self.runs)), key=lambda i: self.runs[i][0].shape[0])[:2]
        ra, rb = self.runs[a], self.runs[b]
        k1 = np.concatenate([ra[0], rb[0]])
        k2 = np.concatenate([ra[1], rb[1]])
        k3 = np.concatenate([ra[2], rb[2]])
        order = np.lexsort((k3, k2, k1))
        merged = (k1[order], k2[order], k3[order])
        self.runs = [
            r for i, r in enumerate(self.runs) if i not in (a, b)
        ] + [merged]

    def contains_rows(self, rows: np.ndarray) -> np.ndarray:
        q1, q2, q3 = _digest_keys(rows)
        out = np.zeros(q1.shape[0], dtype=bool)
        for r1, r2, r3 in self.runs:
            pending = ~out
            if not pending.any():
                break
            p1, p2, p3 = q1[pending], q2[pending], q3[pending]
            lo = np.searchsorted(r1, p1, "left")
            hi = np.searchsorted(r1, p1, "right")
            hit = np.zeros(p1.shape[0], dtype=bool)
            one = hi - lo == 1
            if one.any():
                at = lo[one]
                hit[one] = (r2[at] == p2[one]) & (r3[at] == p3[one])
            for i in np.nonzero(hi - lo > 1)[0]:  # ~never: u64 collision
                seg = slice(lo[i], hi[i])
                hit[i] = bool(
                    ((r2[seg] == p2[i]) & (r3[seg] == p3[i])).any()
                )
            idx = np.nonzero(pending)[0]
            out[idx[hit]] = True
        return out


def _unique_rows(d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """``np.unique(d, axis=0, return_index=True)`` for (N,20) uint8
    rows via a 3-key lexsort on packed big-endian words — identical
    output (memcmp row order, first-occurrence indices; lexsort is
    stable) at ~3x the speed of the void-dtype path on 2.5M rows."""
    d = np.ascontiguousarray(d)
    if d.shape[0] == 0:
        return d, np.zeros(0, dtype=np.intp)
    k1, k2, k3 = _digest_keys(d)
    order = np.lexsort((k3, k2, k1))
    s1, s2, s3 = k1[order], k2[order], k3[order]
    first = np.r_[
        True, (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]) | (s3[1:] != s3[:-1])
    ]
    first_idx = order[first]
    return d[first_idx], first_idx


def digests_from_sha1_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(N,) fixed_size_binary(20) arrow column -> (N, 20) uint8 view,
    zero-copy from the arrow buffer (replaces a per-row
    ``np.frombuffer`` Python loop — 80 ms per 60k rows, measured)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("url_sha1 column must be non-null")
    raw = np.frombuffer(col.buffers()[1], dtype=np.uint8)
    return raw[col.offset * 20 : (col.offset + len(col)) * 20].reshape(-1, 20)


class _SeenShardImpl:
    """Plain-Python core (unit-testable without Ray)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20,
                 fp_rate: float = 1e-3, exact: bool = True):
        self.shard_id = shard_id
        self.capacity = capacity
        self.fp_rate = fp_rate
        # scalable-bloom (Almeida et al., public construction): when
        # the active filter reaches its design capacity, chain a new
        # one with doubled capacity. A saturated fixed bloom answers
        # "maybe" for everything, which forced every lookup through
        # the exact-set Python path (158s/wave observed at 2 shards).
        self.blooms = [CountingBloom(capacity, fp_rate)]
        # the cuckoo chains the same way: a table driven past its
        # design load (~0.84) degrades into the per-item kick loop —
        # 200 numpy-scalar kicks per overflow item, measured as a
        # 37-CPU-minute stall when 2.5M digests hit a 1M-capacity
        # filter. Adds go to the newest filter; membership checks all.
        self.cuckoos = [CuckooFilter(capacity, seed=0x5EED ^ shard_id)]
        self.exact: SortedDigestSet | None = SortedDigestSet() if exact else None
        self.n_checked = 0
        self.n_new = 0
        self.mailbox: list = []  # buffered link slices for the current wave
        self._folded: list = []  # pre-deduped chunks (pandas), fold_mailbox
        self._fold_rows = 0      # raw rows currently in self.mailbox
        self._last_process: dict = {}  # timing of the last process_wave
        self._last_new_count = 0
        self._pending_deltas: list = []  # new digests since last snapshot

    # -- wave mailbox -------------------------------------------------
    # Fetch tasks route their exploded link slices here DURING the
    # fetch phase (ray.get-acknowledged, so every slice is buffered
    # before the wave barrier); process_wave then sorts the whole
    # slice set by discovery key, wave-dedupes, and runs the seen
    # test-and-set — one deterministic pass per shard per wave.  This
    # replaces a groupby shuffle + separate seen stage (6-17s/wave of
    # post-fetch serial time at 32 CPUs, measured) with work that
    # overlaps the fetch.
    _FOLD_ROWS = 32_768  # fold the mailbox once this many raw rows buffer

    def buffer_links(self, table) -> int:
        self.mailbox.append(table)
        self._fold_rows += table.num_rows
        if self._fold_rows >= self._FOLD_ROWS:
            self._fold_mailbox()
        return len(self.mailbox)

    def _fold_mailbox(self) -> None:
        """Pre-dedup the buffered slices into one sorted pandas chunk.
        Triggered from buffer_links every _FOLD_ROWS raw rows, i.e.
        DURING the fetch phase — the arrow->pandas conversion and the
        first-level sort+dedup (the bulk of the old barrier cost)
        overlap the fetch instead of serializing after it.  Min-
        discovery-key-first dedup is associative, so per-chunk dedup
        composes with the final cross-chunk pass in process_wave."""
        if not self.mailbox:
            return
        t = pa.concat_tables(self.mailbox)
        self.mailbox = []
        self._fold_rows = 0
        if t.num_rows == 0:
            return
        df = t.to_pandas()
        df = df.sort_values(_DISCOVERY_KEY, kind="mergesort").drop_duplicates(
            "url_hex", keep="first"
        )
        self._folded.append(df)

    def process_wave(self):
        """Barrier call: returns the NEW frontier rows (arrow Table,
        canonical schema; empty when nothing new) from everything
        buffered this wave."""
        t0 = time.perf_counter()
        self._fold_mailbox()
        t1 = time.perf_counter()
        if not self._folded:
            self._last_new_count = 0
            self._last_process = {"fold_tail": round(t1 - t0, 3)}
            return FRONTIER_SCHEMA.empty_table()
        df = self._folded[0] if len(self._folded) == 1 else pd.concat(self._folded)
        self._folded = []
        df = df.sort_values(_DISCOVERY_KEY, kind="mergesort").drop_duplicates(
            "url_hex", keep="first"
        )
        out = pa.Table.from_pandas(
            df[FRONTIER_SCHEMA.names], preserve_index=False
        ).cast(FRONTIER_SCHEMA)
        t2 = time.perf_counter()
        mask = self.check_and_add(digests_from_sha1_column(out["url_sha1"]))
        out = out.filter(pa.array(mask))
        t3 = time.perf_counter()
        self._last_new_count = out.num_rows
        self._last_process = {
            "fold_tail": round(t1 - t0, 3),
            "merge": round(t2 - t1, 3),
            "seen": round(t3 - t2, 3),
        }
        return out

    def last_process_info(self) -> tuple[int, dict]:
        """Actor-local (count, timings) of the last process_wave — the
        caller reads the new-row count without shipping the frontier
        table through a counting task."""
        return self._last_new_count, self._last_process

    @property
    def bloom(self) -> CountingBloom:  # newest filter (adds go here)
        return self.blooms[-1]

    @property
    def cuckoo(self) -> CuckooFilter:  # newest filter (adds go here)
        return self.cuckoos[-1]

    def cuckoo_capacity(self) -> int:
        return self.capacity * (2 ** (len(self.cuckoos) - 1))

    def _grow_cuckoo(self) -> None:
        self.cuckoos.append(
            CuckooFilter(
                self.cuckoo_capacity() * 2,
                seed=0x5EED ^ self.shard_id ^ len(self.cuckoos),
            )
        )

    def _cuckoo_add(self, new: np.ndarray) -> None:
        """Chained add: grow BEFORE the active filter would exceed its
        design capacity (0.84 table load), keeping every bulk insert on
        the vectorized two-round path.  Oversized batches split so no
        single filter is driven past design load.  Kick-loop failures
        (possible even below design load) are re-routed into a freshly
        chained filter rather than dropped: a dropped fingerprint would
        make a SEEN digest test "new" in pure-sketch mode — the error
        direction the module contract forbids."""
        start = 0
        while start < new.shape[0]:
            room = self.cuckoo_capacity() - self.cuckoo.n_added
            if room <= 0:
                self._grow_cuckoo()
                continue
            chunk = new[start : start + room]
            failed = self.cuckoo.add(chunk)
            while failed.size:
                self._grow_cuckoo()
                chunk = chunk[failed]
                failed = self.cuckoo.add(chunk)
            start += room

    def _cuckoo_contains(self, d: np.ndarray) -> np.ndarray:
        maybe = self.cuckoos[0].contains(d)
        for c in self.cuckoos[1:]:
            maybe |= c.contains(d)
        return maybe

    def _bloom_contains(self, d: np.ndarray) -> np.ndarray:
        maybe = self.blooms[0].contains(d)
        for b in self.blooms[1:]:
            maybe |= b.contains(d)
        return maybe

    def _bloom_add(self, new: np.ndarray) -> None:
        """Chained add, split like _cuckoo_add: an oversized batch (the
        bulk restore concatenates EVERY delta snapshot) must not drive
        one bloom past design capacity — 10x load puts the FP rate near
        1 and every post-resume lookup falls through to the exact set
        (the measured 158s/wave pathology this file documents)."""
        start = 0
        while start < new.shape[0]:
            room = self.bloom_capacity() - self.bloom.n_added
            if room <= 0:
                self.blooms.append(
                    CountingBloom(self.bloom_capacity() * 2, self.fp_rate)
                )
                continue
            self.bloom.add(new[start : start + room])
            start += room

    def bloom_capacity(self) -> int:
        return self.capacity * (2 ** (len(self.blooms) - 1))

    def check_and_add(self, digests: np.ndarray) -> np.ndarray:
        """(N,20) uint8 -> (N,) bool, True = previously UNSEEN (and now
        marked seen). Vectorized bloom screen; exact confirmation only
        on the (rare) bloom-positive path.

        Duplicate-safe within a batch: if the same digest appears k
        times, only its FIRST occurrence (lowest index) is reported
        new — the bloom screen is evaluated against pre-batch state,
        so without the unique() pass every copy would read "new"."""
        d = np.ascontiguousarray(digests).reshape(-1, 20)
        self.n_checked += d.shape[0]
        uniq, first_idx = _unique_rows(d)
        maybe_seen = self._bloom_contains(uniq)
        if maybe_seen.any():
            idx = np.nonzero(maybe_seen)[0]
            if self.exact is not None:
                # vectorized exact confirmation of the bloom positives
                maybe_seen[idx] = self.exact.contains_rows(uniq[idx])
            else:
                # pure-sketch mode: the cuckoo chain is the second,
                # independent hash family — "seen" requires both
                # sketches to agree, multiplying the FP rates
                maybe_seen[idx] = self._cuckoo_contains(uniq[idx])
        new_uniq = ~maybe_seen
        new = uniq[new_uniq]
        if new.shape[0]:
            self._bloom_add(new)
            self._cuckoo_add(new)
            if self.exact is not None:
                self.exact.add_rows(new, assume_sorted=True)
            self._pending_deltas.append(new.copy())
        new_mask = np.zeros(d.shape[0], dtype=bool)
        new_mask[first_idx[new_uniq]] = True
        self.n_new += int(new_mask.sum())
        return new_mask

    def contains(self, digests: np.ndarray) -> np.ndarray:
        d = np.ascontiguousarray(digests).reshape(-1, 20)
        out = self._bloom_contains(d)
        idx = np.nonzero(out)[0]
        if idx.size:
            out[idx] = (
                self.exact.contains_rows(d[idx])
                if self.exact is not None
                else self._cuckoo_contains(d[idx])  # pure-sketch mode
            )
        return out

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "checked": self.n_checked,
            "new": self.n_new,
            "bloom_added": sum(b.n_added for b in self.blooms),
            "cuckoo_added": sum(c.n_added for c in self.cuckoos),
            "exact_size": len(self.exact) if self.exact is not None else -1,
        }

    # -- wave-barrier snapshots (checkpoint/resume) -------------------
    def snapshot(self, path: str) -> str:
        """Atomic DELTA snapshot (tmp + rename): writes only the
        digests added since the previous snapshot plus the counters —
        an append-only log.  Called at the wave barrier together with
        the frontier offset commit so seen-membership and frontier
        position can never diverge.

        A full-state snapshot every wave is O(seen) writes per wave —
        6 MB/shard/wave at just 10^5 URLs, measured, and unworkable at
        10^10; the delta log is O(new-this-wave), and resume replays
        the sorted log once to rebuild the sketches + exact authority.
        """
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        deltas = (
            np.concatenate(self._pending_deltas)
            if self._pending_deltas
            else np.zeros((0, 20), dtype=np.uint8)
        )
        state = {
            "shard_id": self.shard_id,
            "capacity": self.capacity,
            "fp_rate": self.fp_rate,
            "deltas": deltas,
            "n_checked": self.n_checked,
            "n_new": self.n_new,
        }
        tmp = p.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(state, f, protocol=4)
            # power-loss durability, same rationale as commit_manifest:
            # the manifest referencing this snapshot must never outlive
            # the snapshot's data blocks
            f.flush()
            os.fsync(f.fileno())
        tmp.rename(p)
        self._pending_deltas = []
        return str(p)

    def restore(self, paths: list[str] | str) -> None:
        """Rebuild full state by replaying delta snapshots in order.

        ``paths`` is the ordered list of this shard's delta files up
        to the resume wave (a single path is accepted for
        compatibility)."""
        if isinstance(paths, str):
            paths = [paths]
        # reset BEFORE the loop: with an empty paths list (mismatched
        # checkpoint dir, or restore on an already-populated shard) the
        # old in-loop reset never ran and the shard silently kept its
        # stale digests — a resumed crawl would skip URLs the committed
        # state never crawled
        self.blooms = [CountingBloom(self.capacity, self.fp_rate)]
        self.cuckoos = [CuckooFilter(self.capacity, seed=0x5EED ^ self.shard_id)]
        if self.exact is not None:
            self.exact = SortedDigestSet()
        self.n_checked = 0
        self.n_new = 0
        first = True
        deltas = []  # bulk-add ONCE: per-file adds re-sorted the whole
        #              exact set every max_runs files (O(chain^2) work)
        for path in paths:
            with open(path, "rb") as f:
                state = pickle.load(f)
            if first:
                self.shard_id = state["shard_id"]
                self.capacity = state["capacity"]
                self.fp_rate = state["fp_rate"]
                self.blooms = [CountingBloom(self.capacity, self.fp_rate)]
                self.cuckoos = [
                    CuckooFilter(self.capacity, seed=0x5EED ^ self.shard_id)
                ]
                if self.exact is not None:
                    self.exact = SortedDigestSet()
                first = False
            d = np.asarray(state["deltas"], dtype=np.uint8).reshape(-1, 20)
            if d.shape[0]:
                deltas.append(d)
            self.n_checked = state["n_checked"]
            self.n_new = state["n_new"]
        if deltas:
            d = deltas[0] if len(deltas) == 1 else np.concatenate(deltas)
            self._bloom_add(d)
            self._cuckoo_add(d)
            if self.exact is not None:
                self.exact.add_rows(d)
        self._pending_deltas = []


# num_cpus=0: shard actors do brief vectorized work at wave barriers
# and sit idle during fetch; a default 1-CPU reservation per shard
# silently removed n_shards task slots from every wave (measured as a
# ~25% fetch-slot loss at 8 shards on 32 CPUs).
SeenShard = ray.remote(num_cpus=0)(_SeenShardImpl)


class ShardedSeenSet:
    """Driver-side handle bundle; also usable from inside map_batches
    tasks (actor handles serialize)."""

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1 << 20,
                 fp_rate: float = 1e-3, exact: bool = True):
        self.n_shards = n_shards
        self.shards = [
            SeenShard.remote(i, capacity_per_shard, fp_rate, exact)
            for i in range(n_shards)
        ]

    def route(self, host_hash: np.ndarray) -> np.ndarray:
        return (host_hash % np.uint64(self.n_shards)).astype(np.int64)

    def check_and_add(self, digests: np.ndarray, host_hash: np.ndarray) -> np.ndarray:
        """Fan a batch out to shards concurrently; returns the NEW mask
        aligned with the input order."""
        d = np.ascontiguousarray(digests).reshape(-1, 20)
        shard_of = self.route(host_hash)
        mask = np.zeros(d.shape[0], dtype=bool)
        refs, idxs = [], []
        for s in range(self.n_shards):
            sel = np.nonzero(shard_of == s)[0]
            if sel.size:
                refs.append(self.shards[s].check_and_add.remote(d[sel]))
                idxs.append(sel)
        for ref, sel in zip(refs, idxs):
            mask[sel] = ray.get(ref)
        return mask

    def contains(self, digests: np.ndarray, host_hash: np.ndarray) -> np.ndarray:
        d = np.ascontiguousarray(digests).reshape(-1, 20)
        shard_of = self.route(host_hash)
        mask = np.zeros(d.shape[0], dtype=bool)
        refs, idxs = [], []
        for s in range(self.n_shards):
            sel = np.nonzero(shard_of == s)[0]
            if sel.size:
                refs.append(self.shards[s].contains.remote(d[sel]))
                idxs.append(sel)
        for ref, sel in zip(refs, idxs):
            mask[sel] = ray.get(ref)
        return mask

    def snapshot(self, directory: str, wave: int) -> list[str]:
        paths = [
            f"{directory}/seen_shard{m:04d}_wave{wave:06d}.pkl" for m in range(self.n_shards)
        ]
        return ray.get(
            [a.snapshot.remote(p) for a, p in zip(self.shards, paths)]
        )

    def restore_from_dir(self, directory: str, upto_wave: int) -> None:
        """Resume path: replay each shard's delta-snapshot log for all
        committed waves <= upto_wave (files from a killed later wave
        are ignored — they were never referenced by a manifest)."""
        refs = []
        for m, a in enumerate(self.shards):
            # numeric replay order (lexicographic %06d names invert
            # past wave 999999 — same fix as checkpoint.latest_manifest)
            files = [
                str(p)
                for p in sorted(
                    Path(directory).glob(f"seen_shard{m:04d}_wave*.pkl"),
                    key=lambda p: int(p.stem.rsplit("wave", 1)[1]),
                )
                if int(p.stem.rsplit("wave", 1)[1]) <= upto_wave
            ]
            refs.append(a.restore.remote(files))
        ray.get(refs)

    def restore(self, paths: list[str]) -> None:
        ray.get([a.restore.remote(p) for a, p in zip(self.shards, paths)])

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.shards])

    def shutdown(self) -> None:
        for a in self.shards:
            ray.kill(a)
        self.shards = []
