"""Minimal lance-compatible storage backend (VENDORED SHIM).

``pylance`` has no installable wheel in this sandbox (no network), so
the payload sink's Lance branch could never execute.  This module
implements — for real, not as mocks — exactly the API surface Ray's
own Lance integration calls, so ``Dataset.write_lance`` and
``ray.data.read_lance`` run end to end through Ray's genuine
``LanceDatasink`` / ``LanceDatasource`` code paths:

write side (ray/data/_internal/datasource/lance_datasink.py):
  - ``lance.fragment.write_fragments(reader, uri, ...)`` +
    ``DEFAULT_MAX_BYTES_PER_FILE`` + picklable ``FragmentMetadata``
  - ``lance.LanceOperation.Overwrite/Append``
  - ``lance.LanceDataset.commit(uri, op, read_version=...)``
  - ``lance.LanceDataset(uri)`` with ``.version`` / ``.schema``
read side (ray/data/_internal/datasource/lance_datasource.py):
  - ``lance.dataset(uri)`` -> picklable dataset with
    ``.get_fragments()`` / ``.get_fragment(id)`` / ``.scanner()``;
    fragments expose ``.metadata.id`` / ``.count_rows()`` /
    ``.data_files()[k].path()`` / ``.schema``

Storage model (REAL versioned-fragment semantics, shim encoding):
fragment data files are parquet under ``{uri}/data/``; commits are
atomic JSON manifests under ``{uri}/_shim_versions/v{N}.json`` listing
(fragment id, paths, row count) plus the base64 Arrow-IPC schema —
the Lance commit protocol (distributed fragment writes, one manifest
commit, append = old fragments + new) over a parquet encoding.  It is
NOT the Lance file format: real pylance cannot open these directories.
Production installs pylance and never sees this module; tests alias it
to the top-level name ``lance`` (tests/test_sinks.py builds the alias
package) so workers resolve the plain ``import lance`` inside Ray's
datasink/datasource code.
"""

from __future__ import annotations

import base64
import json
import os
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_MAX_BYTES_PER_FILE = 90 * 1024 * 1024 * 1024

_VERSIONS_DIR = "_shim_versions"


@dataclass
class FragmentMetadata:
    """Picklable fragment descriptor (ids are assigned at commit)."""

    paths: list = field(default_factory=list)
    num_rows: int = 0
    id: int | None = None


class _DataFile:
    def __init__(self, path: str):
        self._path = path

    def path(self) -> str:
        return self._path


class _Fragment:
    """Read-side fragment view over committed parquet files."""

    def __init__(self, meta: FragmentMetadata, schema: pa.Schema):
        self.metadata = meta
        self.schema = schema

    def count_rows(self) -> int:
        return self.metadata.num_rows

    def data_files(self) -> list:
        return [_DataFile(p) for p in self.metadata.paths]


class _Scanner:
    def __init__(self, fragments: list, columns=None):
        self._fragments = fragments
        self._columns = columns

    def to_reader(self) -> Iterator[pa.RecordBatch]:
        for frag in self._fragments:
            for p in frag.metadata.paths:
                t = pq.read_table(p, columns=self._columns)
                yield from t.to_batches()


def _schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


def _latest_manifest(uri: str) -> dict | None:
    vdir = Path(uri) / _VERSIONS_DIR
    if not vdir.is_dir():
        return None
    files = sorted(vdir.glob("v*.json"))
    if not files:
        return None
    return json.loads(files[-1].read_text())


class LanceOperation:
    class Overwrite:
        def __init__(self, schema: pa.Schema, fragments: list):
            self.schema = schema
            self.fragments = fragments

    class Append:
        def __init__(self, fragments: list):
            self.fragments = fragments


class LanceDataset:
    """Latest-version view of a shim dataset; picklable (holds only
    the uri, the manifest dict, and the deserialized schema — Ray
    captures the dataset object in read-task closures)."""

    def __init__(self, uri: str, storage_options=None):
        self.uri = str(uri)
        m = _latest_manifest(self.uri)
        if m is None:
            raise FileNotFoundError(f"no committed version under {uri}")
        self._manifest = m
        self.version = int(m["version"])
        self.schema = _schema_from_b64(m["schema_b64"])

    def _fragments(self) -> list:
        return [
            _Fragment(
                FragmentMetadata(
                    paths=f["paths"], num_rows=int(f["num_rows"]), id=int(f["id"])
                ),
                self.schema,
            )
            for f in self._manifest["fragments"]
        ]

    def get_fragments(self) -> list:
        return self._fragments()

    def get_fragment(self, fragment_id: int) -> _Fragment:
        for f in self._fragments():
            if f.metadata.id == fragment_id:
                return f
        raise KeyError(f"fragment {fragment_id} not in version {self.version}")

    def scanner(self, fragments=None, columns=None, filter=None,
                **options) -> _Scanner:
        # A silently-unfiltered scan would corrupt results downstream:
        # Ray's LanceDatasource forwards read_lance(filter=...) /
        # user scanner_options verbatim, so anything this shim cannot
        # evaluate must raise loudly instead of being swallowed.
        if filter is not None:
            raise NotImplementedError(
                "lance_shim scanner does not evaluate filters; install "
                "pylance for filtered reads"
            )
        unsupported = sorted(k for k, v in options.items() if v is not None)
        if unsupported:
            raise NotImplementedError(
                f"lance_shim scanner options not supported: {unsupported}"
            )
        return _Scanner(
            fragments if fragments is not None else self._fragments(), columns
        )

    def count_rows(self) -> int:
        return sum(f.count_rows() for f in self._fragments())

    @staticmethod
    def commit(uri, operation, read_version=None, storage_options=None):
        """Atomic manifest commit: Overwrite starts a fresh fragment
        list, Append extends the latest version's.  Conflict-detected
        like real lance: ``read_version`` (Ray's sink reads it from
        the dataset before appending) must still be the latest at
        commit time, and the version file itself is created with an
        exclusive link so two racing commits of the same next version
        cannot both 'succeed' with one silently losing its fragments —
        the loser raises and keeps its data files for a retry."""
        uri = str(uri)
        latest = _latest_manifest(uri)
        latest_version = 0 if latest is None else int(latest["version"])
        if read_version is not None and int(read_version) != latest_version:
            raise OSError(
                f"commit conflict at {uri}: read_version={read_version} "
                f"but latest committed version is {latest_version}"
            )
        if isinstance(operation, LanceOperation.Overwrite):
            frags: list[FragmentMetadata] = list(operation.fragments)
            schema_b64 = _schema_to_b64(operation.schema)
            base: list[dict] = []
        elif isinstance(operation, LanceOperation.Append):
            if latest is None:
                raise FileNotFoundError(f"append to uncommitted dataset {uri}")
            frags = list(operation.fragments)
            schema_b64 = latest["schema_b64"]
            base = list(latest["fragments"])
        else:  # pragma: no cover - Ray only issues the two ops above
            raise NotImplementedError(type(operation))
        next_id = (max((f["id"] for f in base), default=-1)) + 1
        rows = base + [
            {
                "id": next_id + k,
                "paths": list(f.paths),
                "num_rows": int(f.num_rows),
            }
            for k, f in enumerate(frags)
        ]
        version = (0 if latest is None else int(latest["version"])) + 1
        vdir = Path(uri) / _VERSIONS_DIR
        vdir.mkdir(parents=True, exist_ok=True)
        payload = json.dumps(
            {"version": version, "schema_b64": schema_b64, "fragments": rows}
        )
        tmp = vdir / f".v{version:06d}.json.tmp-{uuid.uuid4().hex}"
        tmp.write_text(payload)
        target = vdir / f"v{version:06d}.json"
        try:
            os.link(tmp, target)  # exclusive: raises if a racer won
        except FileExistsError:
            raise OSError(
                f"commit conflict at {uri}: version {version} was "
                "committed concurrently"
            ) from None
        finally:
            os.unlink(tmp)
        return LanceDataset(uri)


def dataset(uri, storage_options=None, **kwargs) -> LanceDataset:
    # loud-refusal policy (same as scanner()): silently ignoring a
    # real pylance option like version= (time travel) would return the
    # LATEST data where the caller asked for a snapshot — silent wrong
    # data, the exact mode the scanner hardening exists to prevent
    if kwargs:
        raise NotImplementedError(
            f"lance_shim.dataset() does not support {sorted(kwargs)} — "
            "install real pylance for these options"
        )
    return LanceDataset(uri, storage_options=storage_options)


def write_fragments(
    reader,
    uri,
    *,
    schema: pa.Schema | None = None,
    max_rows_per_file: int = 64 * 1024 * 1024,
    max_rows_per_group: int = 1024,
    max_bytes_per_file: int | None = None,
    data_storage_version=None,
    storage_options=None,
) -> list:
    """Consume a RecordBatchReader into parquet fragment files under
    ``{uri}/data/`` (uuid names — concurrent write tasks never
    collide), splitting at ``max_rows_per_file`` rows.  Returns the
    uncommitted FragmentMetadata list, exactly like lance.fragment."""
    data_dir = Path(uri) / "data"
    data_dir.mkdir(parents=True, exist_ok=True)
    out: list[FragmentMetadata] = []
    buf: list[pa.RecordBatch] = []
    buf_rows = 0

    def flush() -> None:
        nonlocal buf, buf_rows
        if not buf_rows:
            return
        t = pa.Table.from_batches(buf, schema=schema)
        p = str(data_dir / f"frag-{uuid.uuid4().hex}.parquet")
        pq.write_table(t, p)
        out.append(FragmentMetadata(paths=[p], num_rows=t.num_rows))
        buf, buf_rows = [], 0

    for batch in reader:
        if batch.num_rows == 0:
            continue
        buf.append(batch)
        buf_rows += batch.num_rows
        if buf_rows >= max_rows_per_file:
            flush()
    flush()
    return out
