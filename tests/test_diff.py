"""Snapshot diff (pipelines/diff.py): class coverage on hand-built
snapshots plus serial parity for the q59 driver entry."""

from __future__ import annotations

import os

import pandas as pd
import ray.data as rd

from cs_insights_crawler_ray.pipelines.diff import q59_release_diff, snapshot_diff

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_snapshot_diff_classes(ray_session):
    old = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["same", "was", "gone"]}
        )
    )
    new = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 4], "text": ["same", "now", "fresh"]}
        )
    )
    got = (
        snapshot_diff(old, new)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [2, 3, 4]  # 1 unchanged -> dropped
    assert list(got["status"]) == ["changed", "deleted", "added"]


def test_q59_matches_serial(ray_session):
    got = q59_release_diff(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n_added = int((docs["doc_id"] % 7 == 0).sum())
    n_changed = int(
        ((docs["doc_id"] % 7 != 0) & (docs["doc_id"] % 11 == 3)).sum()
    )
    n_deleted = int((docs["doc_id"] % 13 == 0).sum())
    counts = got["status"].value_counts().to_dict()
    assert counts == {
        "added": n_added, "changed": n_changed, "deleted": n_deleted,
    }
    # added keys are exactly the %7 ones; deleted live in tombstone space
    assert set(got.loc[got["status"] == "added", "doc_id"]) == set(
        docs.loc[docs["doc_id"] % 7 == 0, "doc_id"]
    )
    assert (got.loc[got["status"] == "deleted", "doc_id"] >= 1_000_000).all()
