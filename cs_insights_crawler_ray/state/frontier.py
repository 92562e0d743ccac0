"""Incremental partition frontier — LSM-style head + sorted runs.

Round-3's frontier kept each host-hash partition as one Arrow table and
re-derived everything per wave with an O(frontier) scan (anti-join the
admitted keys, full per-host re-rank).  That scan hid behind the fetch
at 2M rows but dominated at 20M: the 20M-row deep probe measured
53 s/wave of barrier wait (residue ratio 67x for a 10x frontier) — a
wave-width fetch can never hide a frontier-sized scan, and at 10^10
URLs a per-wave frontier scan is impossible outright.

This module replaces the scan with an incrementally-maintained
structure per partition (all rows host-hash co-partitioned with the
seen shards, as before):

- **head** — per host, the OLDEST ``min(budget, pending)`` un-admitted
  rows (discovery-key order).  This is exactly the politeness working
  set: admission candidates are a pure function of the head
  (``politeness.partition_candidates`` over it equals the same call
  over the full pending set, because per-host budget-prefixes agree).
- **runs** — immutable Arrow tables sorted by ``(host_hash, discovery
  key)``: the seed/compacted base plus one run per wave (that wave's
  new links).  Runs never straddle waves, and ``disc_wave`` is strictly
  increasing across runs, so per host the runs in run-id order ARE the
  discovery-key order — refill is pure cursor advance, never a merge.
- **cursors** — per run, per host: how many of that host's rows were
  already consumed into the head.  A row leaves a run only by cursor
  advance; a row leaves the head only by admission.  No tombstones.

Per-wave cost: O(|head| + new + refilled) — frontier-size-free.  The
only O(frontier) work left is compaction (merge all runs' unconsumed
suffixes into one base run), which runs every ``backlog_full_every``
waves fused with the full checkpoint snapshot the engine already pays
for, overlapped with the fetch.

The state object is small (head + per-host int arrays); runs stay in
the object store as separate refs and are fetched only when a refill
or compaction actually touches them (the engine passes a lazy
``get_run`` callback).  At 10^10 URLs the head is O(hosts x budget)
per partition — the irreducible politeness floor — and runs spill via
the object store / full snapshots.

Reference analog: the reference's frontier is the in-order listing it
walks sequentially (``s2client.py:146-157``); the head/run split is
what that order costs when the pending set no longer fits a scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .politeness import DISCOVERY_KEY, partition_candidates
from .seen import FRONTIER_SCHEMA

SORT_COLS = ["host_hash"] + DISCOVERY_KEY


def _lexsort_table(t: pa.Table) -> pa.Table:
    """Sort a frontier table by (host_hash, discovery key)."""
    if t.num_rows == 0:
        return t
    idx = np.lexsort(
        (
            t["disc_link"].to_numpy(zero_copy_only=False),
            t["disc_parent"].to_numpy(zero_copy_only=False),
            t["disc_wave"].to_numpy(zero_copy_only=False),
            t["host_hash"].to_numpy(zero_copy_only=False),
        )
    )
    return t.take(pa.array(idx))


def _boundaries(hh_sorted: np.ndarray):
    """Sorted host_hash column -> (unique hosts, slice starts, counts)."""
    n = hh_sorted.shape[0]
    if n == 0:
        e = np.zeros(0, np.int64)
        return hh_sorted[:0], e, e
    first = np.r_[True, hh_sorted[1:] != hh_sorted[:-1]]
    starts = np.flatnonzero(first).astype(np.int64)
    counts = np.diff(np.r_[starts, n]).astype(np.int64)
    return hh_sorted[starts], starts, counts


def _ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate [starts[i], starts[i]+lens[i]) index ranges."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    rep = np.repeat(starts, lens)
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    return rep + intra


def _aligned(hosts: np.ndarray, sub_hosts: np.ndarray,
             sub_vals) -> np.ndarray:
    """Scatter (sub_hosts -> sub_vals) onto the ``hosts`` axis (both
    sorted unique); hosts absent from sub_hosts (or a None sub_vals,
    the empty-cursor case) get 0."""
    out = np.zeros(hosts.shape[0], np.int64)
    if sub_vals is not None and sub_hosts.shape[0]:
        pos = np.searchsorted(hosts, sub_hosts)
        out[pos] = sub_vals
    return out


def _head_counts(state: dict) -> np.ndarray:
    """Per-host row counts of the head, aligned to state['hosts']."""
    hh = state["head"]["host_hash"].to_numpy(zero_copy_only=False)
    h, _, c = _boundaries(hh)
    return _aligned(state["hosts"], h, c)


def init_state(table: pa.Table, budget: int, run_id: int):
    """Full pending table (seed build or resume replay) -> (state,
    sorted base run).  O(n log n) once — the same cost the old design
    paid EVERY wave."""
    t = _lexsort_table(table.cast(FRONTIER_SCHEMA))
    hh = t["host_hash"].to_numpy(zero_copy_only=False)
    hosts, starts, counts = _boundaries(hh)
    take_n = np.minimum(counts, budget)
    head = t.take(pa.array(_ranges(starts, take_n)))
    nz = take_n > 0
    state = {
        "head": head,
        "hosts": hosts.copy(),
        "counts": counts.astype(np.int64),
        "cursors": {run_id: (hosts[nz].copy(), take_n[nz].copy())},
        "run_index": {run_id: (hosts.copy(), starts, counts)},
    }
    return state, t


def advance(state: dict, admitted_dk: pd.DataFrame, run_ids: list,
            get_run, budget: int) -> dict:
    """Remove this wave's admitted rows from the head, then refill each
    host back to min(budget, pending) by advancing run cursors in
    run-id order (runs are dk-disjoint and ordered per host, so cursor
    order IS discovery order).  ``get_run(run_id)`` materializes a run
    table only when a refill actually draws from it."""
    head_df = state["head"].to_pandas()
    m = head_df[DISCOVERY_KEY].merge(
        admitted_dk[DISCOVERY_KEY].assign(_a=1), on=DISCOVERY_KEY, how="left"
    )
    removed = m["_a"].notna().to_numpy()
    hosts = state["hosts"]
    counts = state["counts"].copy()
    if removed.any():
        rh = head_df["host_hash"].to_numpy()[removed]
        ruh, _, rc = _boundaries(rh)  # head is host-sorted => rh sorted
        counts -= _aligned(hosts, ruh, rc)
        head = state["head"].filter(pa.array(~removed))
    else:
        head = state["head"]

    state = dict(state)
    state["counts"] = counts
    state["head"] = head
    hc = _head_counts(state)
    need = np.minimum(counts, budget) - hc
    if not (need > 0).any():
        return state

    cursors = dict(state["cursors"])
    fills = []
    for rid in run_ids:
        if not (need > 0).any():
            break
        r_hosts, r_starts, r_counts = state["run_index"][rid]
        if r_hosts.shape[0] == 0:
            continue
        c_hosts, c_taken = cursors.get(rid, (r_hosts[:0], None))
        taken = _aligned(r_hosts, c_hosts, c_taken)
        avail = r_counts - taken
        # needy hosts present in this run with unconsumed rows
        pos = np.searchsorted(r_hosts, hosts)
        pos_ok = (pos < r_hosts.shape[0])
        pos_c = np.clip(pos, 0, max(r_hosts.shape[0] - 1, 0))
        present = pos_ok & (r_hosts[pos_c] == hosts)
        k_host = np.zeros(hosts.shape[0], np.int64)
        k_host[present] = np.minimum(need[present], avail[pos_c[present]])
        k_host = np.maximum(k_host, 0)
        if (k_host > 0).any():
            run = get_run(rid)
            sel = k_host > 0
            rpos = pos_c[sel]
            idx = _ranges(r_starts[rpos] + taken[rpos], k_host[sel])
            fills.append(run.take(pa.array(idx)))
            taken = taken + _aligned(r_hosts, hosts[sel], k_host[sel])
            need = need - k_host
            nz = taken > 0
            cursors[rid] = (r_hosts[nz].copy(), taken[nz].copy())
    if fills:
        state["head"] = _lexsort_table(
            pa.concat_tables([state["head"]] + fills)
        )
        state["cursors"] = cursors
    return state


def merge_new(state: dict, new_table: pa.Table, run_id: int, budget: int,
              wave_size: int, auth: dict | None,
              cand_wave: int | None = None, recency_weight: float = 0.0):
    """Append this wave's new links as a run; per host, rows top up the
    head directly when the host has nothing pending beyond its head
    (new rows carry the largest discovery keys, so the prefix invariant
    holds); the remainder waits in the run behind a cursor.  Returns
    (state, sorted run table, admission candidates for the next wave).

    Candidates are ``politeness.partition_candidates`` over the head —
    equal to the same call over the full pending set because the head
    is each host's budget-prefix (proof: both keep exactly the per-host
    ``rank < budget`` rows, and head ranks are true ranks)."""
    state = dict(state)
    hosts = state["hosts"]
    counts = state["counts"]
    t = None
    if new_table.num_rows:
        t = _lexsort_table(new_table.cast(FRONTIER_SCHEMA))
        hh = t["host_hash"].to_numpy(zero_copy_only=False)
        n_hosts, n_starts, n_counts = _boundaries(hh)
        # union the host axis
        all_hosts = np.union1d(hosts, n_hosts)
        new_aligned = _aligned(all_hosts, n_hosts, n_counts)
        counts = _aligned(all_hosts, hosts, counts) + new_aligned
        state["hosts"], state["counts"] = all_hosts, counts
        hosts = all_hosts
        hc = _head_counts(state)
        beyond = counts - new_aligned - hc  # pending behind the head, pre-new
        take = np.where(
            beyond == 0, np.minimum(budget - hc, new_aligned), 0
        )
        take = np.maximum(take, 0)
        pos = np.searchsorted(n_hosts, hosts)
        take_run = np.zeros(n_hosts.shape[0], np.int64)
        sel = take > 0
        if sel.any():
            take_run[pos[sel]] = take[sel]
            idx = _ranges(n_starts, take_run)
            state["head"] = _lexsort_table(
                pa.concat_tables([state["head"], t.take(pa.array(idx))])
            )
        cursors = dict(state["cursors"])
        nz = take_run > 0
        cursors[run_id] = (n_hosts[nz].copy(), take_run[nz].copy())
        state["cursors"] = cursors
        run_index = dict(state["run_index"])
        run_index[run_id] = (n_hosts.copy(), n_starts, n_counts)
        state["run_index"] = run_index
    cand = partition_candidates(
        state["head"].to_pandas(), budget, wave_size, auth,
        cand_wave, recency_weight,
    )
    return state, t, cand


def pending_rest(state: dict, run_ids: list, get_run) -> pa.Table:
    """Everything pending EXCLUDING nothing: head U unconsumed run
    suffixes, sorted — the full-snapshot/compaction payload."""
    parts = [state["head"]]
    for rid in run_ids:
        r_hosts, r_starts, r_counts = state["run_index"][rid]
        c_hosts, c_taken = state["cursors"].get(rid, (r_hosts[:0], None))
        taken = _aligned(r_hosts, c_hosts, c_taken)
        rest_n = r_counts - taken
        if (rest_n > 0).any():
            idx = _ranges(r_starts + taken, np.maximum(rest_n, 0))
            parts.append(get_run(rid).take(pa.array(idx)))
    return _lexsort_table(
        pa.concat_tables([p for p in parts if p.num_rows])
        if any(p.num_rows for p in parts)
        else FRONTIER_SCHEMA.empty_table()
    )


def compact(state: dict, run_ids: list, get_run, run_id: int):
    """Merge all unconsumed run suffixes + head into ONE base run (the
    full-snapshot table) and reset cursors so the head is its consumed
    prefix.  O(frontier/n_parts), paid only on full-snapshot waves and
    launched during the fetch.  Returns (state, base run table)."""
    rest = pending_rest(state, run_ids, get_run)
    hh = rest["host_hash"].to_numpy(zero_copy_only=False)
    hosts, starts, counts = _boundaries(hh)
    state = dict(state)
    # prune drained hosts from the axis while we're here
    state["hosts"] = hosts.copy()
    state["counts"] = counts.astype(np.int64)
    hc = _head_counts(state)
    nz = hc > 0
    state["cursors"] = {run_id: (hosts[nz].copy(), hc[nz].copy())}
    state["run_index"] = {run_id: (hosts.copy(), starts, counts)}
    return state, rest


def pending_total(state: dict) -> int:
    return int(state["counts"].sum())
