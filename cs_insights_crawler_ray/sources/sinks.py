"""Sinks: payload table writer (Lance when available, parquet
otherwise), jsonl/csv exports.

The payload sink is the analog of the reference's release export
(``s2processor.py:209-257``: gzip JSONL + flattened CSV) with the
north_rule's Lance target.  ``pylance`` is not installed in this
sandbox, so the writer is abstracted: one call site, two backends,
identical directory layout — one directory per wave/partition so a
resumed run skips finished partitions (never one giant file).
"""

from __future__ import annotations

import importlib.util
import shutil
from pathlib import Path

import pyarrow as pa
import ray.data as rd

HAVE_LANCE = importlib.util.find_spec("lance") is not None

# input_hint schema for the payload table
PAYLOAD_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def write_payload(ds: rd.Dataset, root: str, partition: str) -> str:
    """Write one payload partition (e.g. ``wave=000003``) under root.

    Parquet backend writes ``{root}/{partition}/`` as a directory of
    part files (streaming, no driver materialization); the Lance
    backend appends a versioned fragment — both are idempotent at
    partition granularity: a re-run REPLACES the partition wholesale
    (any half-written files from a killed run are cleared first; the
    manifest referencing the partition is only committed after the
    write, so a committed wave is never re-run).
    """
    out = f"{root}/{partition}"
    clear_partition(out)
    if HAVE_LANCE:
        # Ray's DISTRIBUTED Lance writer (each task writes fragments,
        # one commit) — no driver materialization.  mode='create' on a
        # just-cleared partition dir keeps the replace-partition
        # idempotence contract identical to the parquet branch.
        # Call shape held by tests/test_sinks.py::test_lance_branch_contract
        # (pylance itself is absent in this sandbox).
        ds.write_lance(out, mode="create")
    else:
        ds.write_parquet(out)
    return out


def read_payload(root: str) -> rd.Dataset:
    if HAVE_LANCE:
        # each wave/partition is its own Lance dataset (write_payload's
        # replace-partition unit); the whole payload is their union.
        # A bare root with no partition subdirs is read as one dataset.
        # A partition dir with no committed version is SKIPPED, not an
        # error: a zero-row wave writes no fragments (the sink never
        # commits), and a kill between fragment write and commit leaves
        # the same shape — in both cases the committed manifest says
        # the wave holds no readable payload, and resume rewrites it.
        parts = [p for p in list_partitions(root) if "=" in p]
        if not parts:
            return rd.read_lance(root)
        import lance

        readers = []
        for p in parts:
            path = f"{root}/{p}"
            try:
                lance.dataset(path)
            except (FileNotFoundError, ValueError):
                # not a committed lance dataset.  If the partition
                # holds top-level parquet part files it was written by
                # the parquet backend (e.g. a crawl started before
                # pylance was installed) — read it as parquet rather
                # than silently dropping committed payload.  Otherwise
                # it is a genuinely uncommitted lance partition (zero-
                # row wave, or a kill between fragment write and
                # commit): skip it, resume rewrites it.
                if next(Path(path).glob("*.parquet"), None) is not None:
                    # partitioning=None: don't hive-infer a 'wave'
                    # column from the path — it would poison the union
                    # schema against the lance-read partitions
                    readers.append(rd.read_parquet(path, partitioning=None))
                continue
            readers.append(rd.read_lance(path))
        if not readers:
            return rd.from_arrow(PAYLOAD_SCHEMA.empty_table())
        out = readers[0]
        for r in readers[1:]:
            out = out.union(r)
        return out
    return rd.read_parquet(root)


def write_jsonl(ds: rd.Dataset, path: str) -> None:
    """JSONL export (reference to_jsonl, s2processor.py:209-229)."""
    ds.write_json(path)


def write_csv_flat(ds: rd.Dataset, path: str) -> None:
    """CSV export with nested structs flattened to dotted columns
    (reference to_csv uses pd.json_normalize, s2processor.py:231-257;
    pyarrow Table.flatten() gives the same dotted naming)."""
    ds.map_batches(lambda t: t.flatten(), batch_format="pyarrow").write_csv(path)


def clear_partition(path: str) -> None:
    """Idempotent-partition-write helper: remove a (possibly
    half-written) partition directory before rewriting it."""
    p = Path(path)
    if p.exists():
        shutil.rmtree(p)


def list_partitions(root: str) -> list[str]:
    p = Path(root)
    if not p.exists():
        return []
    return sorted(d.name for d in p.iterdir() if d.is_dir())
