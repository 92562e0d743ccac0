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
