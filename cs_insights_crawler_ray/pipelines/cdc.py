"""Content-defined chunking (CDC) storage dedup over payload bytes.

A 100 TB crawl stores petabyte-shaped binary payloads; chunk-level
dedup (LBFS/Venti lineage, gear-hash variant per FastCDC) is how the
store avoids keeping shared content twice.  Boundaries are set by the
CONTENT — a rolling gear hash cutting where ``h & MASK == 0`` — so two
blobs sharing a long byte run re-synchronize on the same chunk
boundaries within ~64 bytes regardless of offset shifts, which
fixed-size blocking cannot do.

Determinism contract: the rolling hash ``h_i = (h_{i-1} << 1) +
gear[b_i]  (mod 2^64)`` distributes to the EXACT closed form
``h_i = sum_{j=0..63} gear[b_{i-j}] << j`` (terms at j >= 64 vanish
mod 2^64), so the vectorized kernel computes it with 64 masked
shifted adds over the flat byte stream — bit-identical to the
sequential loop, which `_naive_cdc_chunks` (the oracle artifact's
spec) re-derives with Python ints.

Scale shape: chunking + chunk FNV fingerprints are one shuffle-free
``map_batches`` pass (per-chunk work is O(bytes); the only Python
loop is over CHUNKS — bytes/64 iterations — for the sequential
min/max cut walk).  The dedup summary is the repo's coarse-partition
grouped aggregate: per-block (fp, occ, docs, len) pre-combine, 32-way
fp-hash partition, vectorized within-partition groupby — only
pre-combined partials cross the exchange, never chunk bytes.

This module chunks the ``documents.text`` byte stream (the sf tables'
payload proxy); the identical stage applies unchanged to the crawl's
``bytes`` image column — chunk fps are computed from raw bytes either
way.  Reference analog: the reference caches whole files keyed by one
md5 (dblpclient.py:53); CDC is the sub-file generalization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_M64 = 1 << 64
CDC_MASK = np.uint64(0x3F)  # avg chunk ~64 bytes at this corpus scale
CDC_MIN = 16
CDC_MAX = 256
_FNV_OFF = 14695981039346656037
_FNV_PRIME = 1099511628211

# gear table: FNV-1a of each single byte — deterministic, mirrored by
# the pure-Python oracle
_GEAR = np.array(
    [((_FNV_OFF ^ b) * _FNV_PRIME) % _M64 for b in range(256)],
    dtype=np.uint64,
)


def _fnv1a64_bytes(chunks: list[bytes]) -> np.ndarray:
    """Vectorized FNV-1a 64 over byte strings: one step per byte
    POSITION (max chunk length iterations over all still-live
    chunks) — functions/text._fnv1a64_batch's shape at byte level."""
    if not chunks:
        return np.zeros(0, np.uint64)
    lens = np.fromiter((len(c) for c in chunks), np.int64, count=len(chunks))
    buf = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    offs = np.zeros(len(chunks), np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    h = np.full(len(chunks), np.uint64(_FNV_OFF))
    prime = np.uint64(_FNV_PRIME)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max()) if len(lens) else 0):
            live = lens > j
            h[live] = (h[live] ^ buf[offs[live] + j].astype(np.uint64)) * prime
    return h


def _cut_walk(cands: np.ndarray, length: int) -> list[int]:
    """Sequential min/max-enforced cut positions (end-inclusive) from
    the candidate boundary set — O(n_chunks) Python steps."""
    cuts: list[int] = []
    last = -1
    while last + 1 < length:
        lo = last + CDC_MIN
        hi = min(last + CDC_MAX, length - 1)
        ci = int(np.searchsorted(cands, lo))
        p = int(cands[ci]) if ci < len(cands) and cands[ci] <= hi else hi
        cuts.append(p)
        last = p
    return cuts


def batch_cdc_chunks(texts: pd.Series) -> tuple[np.ndarray, ...]:
    """(row_idx, ord, chunk_fp_int64, chunk_len) flat arrays for a
    batch of utf-8 payloads."""
    enc = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in enc), np.int64, count=len(enc))
    if lens.sum() == 0:
        z = np.zeros(0, np.int64)
        return z, z.copy(), z.copy(), z.copy()
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.zeros(len(enc), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pid = np.arange(len(buf), dtype=np.int64) - np.repeat(starts, lens)
    gv = _GEAR[buf]
    H = np.zeros(len(buf), np.uint64)
    with np.errstate(over="ignore"):
        for j in range(64):
            # byte i-j contributes gear[b]<<j, only within the doc
            valid = np.flatnonzero(pid >= j)
            if valid.size == 0:
                break
            H[valid] += gv[valid - j] << np.uint64(j)
    bnd = (H & CDC_MASK) == 0
    rows_out, ords_out, fps_out, lens_out = [], [], [], []
    chunk_bytes: list[bytes] = []
    for d in np.flatnonzero(lens > 0):
        s, L = starts[d], int(lens[d])
        cands = np.flatnonzero(bnd[s : s + L])
        cuts = _cut_walk(cands, L)
        prev = 0
        for o, c in enumerate(cuts):
            chunk_bytes.append(enc[d][prev : c + 1])
            rows_out.append(d)
            ords_out.append(o)
            lens_out.append(c + 1 - prev)
            prev = c + 1
    fps = _fnv1a64_bytes(chunk_bytes).view(np.int64)
    return (
        np.asarray(rows_out, np.int64),
        np.asarray(ords_out, np.int64),
        fps,
        np.asarray(lens_out, np.int64),
    )


def _naive_cdc_chunks(s: str) -> list[tuple[int, int, int]]:
    """(ord, fp, len) per chunk, re-derived with Python ints only —
    the sequential rolling loop the closed form must equal."""
    data = s.encode("utf-8")
    if not data:
        return []
    h = 0
    bounds = []
    for i, b in enumerate(data):
        h = ((h << 1) + ((_FNV_OFF ^ b) * _FNV_PRIME)) % _M64
        if (h & int(CDC_MASK)) == 0:
            bounds.append(i)
    cuts, last = [], -1
    while last + 1 < len(data):
        lo, hi = last + CDC_MIN, min(last + CDC_MAX, len(data) - 1)
        nxt = [p for p in bounds if lo <= p <= hi]
        p = nxt[0] if nxt else hi
        cuts.append(p)
        last = p
    out, prev = [], 0
    for o, c in enumerate(cuts):
        fp = _FNV_OFF
        for byte in data[prev : c + 1]:
            fp = ((fp ^ byte) * _FNV_PRIME) % _M64
        out.append((o, fp - _M64 if fp >= 1 << 63 else fp, c + 1 - prev))
        prev = c + 1
    return out


N_CDC_PARTS = 32


def q73_cdc_dedup(sf_dir: str) -> rd.Dataset:
    """Duplicate-chunk summary -> (chunk_fp, n_refs, n_docs,
    chunk_len) for every chunk stored more than once."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        rows, _ords, fps, clens = batch_cdc_chunks(b["text"])
        dids = b["doc_id"].to_numpy().astype(np.int64)[rows]
        g = (
            pd.DataFrame({"chunk_fp": fps, "doc_id": dids, "chunk_len": clens})
            .groupby(["chunk_fp", "doc_id"], as_index=False)
            .agg(occ=("chunk_len", "size"), chunk_len=("chunk_len", "min"))
            .groupby("chunk_fp", as_index=False)
            .agg(
                n_refs=("occ", "sum"),
                n_docs=("doc_id", "size"),
                chunk_len=("chunk_len", "min"),
            )
        )
        h = g["chunk_fp"].to_numpy().view(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
        g["_part"] = (h % np.uint64(N_CDC_PARTS)).astype(np.int32)
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("chunk_fp", as_index=False).agg(
            n_refs=("n_refs", "sum"),
            n_docs=("n_docs", "sum"),
            chunk_len=("chunk_len", "min"),
        )
        out = out[out["n_refs"] >= 2]
        return out.astype(
            {"n_refs": np.int64, "n_docs": np.int64, "chunk_len": np.int64}
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(local, batch_format="pandas")
        .groupby("_part")
        .map_groups(final, batch_format="pandas")
        .select_columns(["chunk_fp", "n_refs", "n_docs", "chunk_len"])
    )
