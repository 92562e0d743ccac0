"""Reference-parity test for the S2 ingest pipeline: the Ray pipeline
vs an independent sequential reimplementation of the reference's
semantics (s2processor.py logic, re-derived from SURVEY.md — not a
code copy) on the same jsonl.gz release files."""

from __future__ import annotations

import gzip
import json
from pathlib import Path

import pytest

from cs_insights_crawler_ray.fixtures.s2_fixtures import generate_release
from cs_insights_crawler_ray.pipelines.ingest import ingest_release


def _oracle(cache_dir: str, filters=("DBLP",)):
    """Sequential reference-semantics oracle (dict/list/set, one loop)."""
    papers, corpusids = [], set()
    for fp in sorted(Path(cache_dir).glob("papers*.jsonl.gz")):
        with gzip.open(fp, "rt") as f:
            for line in f:
                doc = json.loads(line)
                oa = doc.get("openaccessinfo")
                if oa and oa.get("externalids"):          # F6 promotion
                    doc["externalids"] = oa["externalids"]
                    doc.pop("openaccessinfo", None)
                ext = doc.get("externalids") or {}
                if any(ext.get(s) is not None for s in filters):  # F5 union
                    papers.append(doc)
                    corpusids.add(doc["corpusid"])
    abstracts = []
    for fp in sorted(Path(cache_dir).glob("abstracts*.jsonl.gz")):
        with gzip.open(fp, "rt") as f:
            for line in f:
                doc = json.loads(line)
                if doc["corpusid"] in corpusids:          # J1 semi-join
                    abstracts.append(doc)
    merged: dict = {}
    for elem in abstracts:                                # J3: metadata first,
        merged.setdefault(elem["corpusid"], {}).update(elem)
    for elem in papers:                                   # papers win
        merged.setdefault(elem["corpusid"], {}).update(elem)
    paper_author_ids = {
        a["authorId"] for p in papers for a in (p.get("authors") or [])
    }
    authors = []
    for fp in sorted(Path(cache_dir).glob("authors*.jsonl.gz")):
        with gzip.open(fp, "rt") as f:
            for line in f:
                doc = json.loads(line)
                if doc["authorid"] in paper_author_ids:   # J2 (lowercase key)
                    doc["s2url"] = doc.pop("url")          # F8 rename
                    authors.append(doc)
    return merged, authors


@pytest.fixture(scope="module")
def release_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("s2release"))
    counts = generate_release(d, n_papers=200, n_files=3, seed=7)
    assert counts["papers"] == 200
    return d


def _norm(v):
    return None if v is None else v


def test_ingest_matches_reference_semantics(release_dir, tmp_path):
    out = ingest_release(release_dir, out_dir=str(tmp_path / "exp"))
    ora_merged, ora_authors = _oracle(release_dir)

    eng_rows = {r["corpusid"]: r for r in out["papers"].take_all()}
    assert set(eng_rows.keys()) == set(ora_merged.keys())
    for cid, ora in ora_merged.items():
        eng = eng_rows[cid]
        for k, v in ora.items():
            ev = eng.get(k)
            if k in ("externalids",):
                ev = {kk: _norm(vv) for kk, vv in (ev or {}).items()}
                v = {kk: _norm(vv) for kk, vv in (v or {}).items()}
            assert ev == v, f"corpusid {cid} field {k}: {ev!r} != {v!r}"

    eng_authors = {r["authorid"]: r for r in out["authors"].take_all()}
    assert set(eng_authors.keys()) == {a["authorid"] for a in ora_authors}
    for ora in ora_authors:
        eng = eng_authors[ora["authorid"]]
        assert eng["s2url"] == ora["s2url"]
        assert "url" not in eng or eng["url"] is None
        assert eng["name"] == ora["name"]

    # exports exist (S12/S13)
    assert list((tmp_path / "exp" / "papers_jsonl").glob("*.json"))
    assert list((tmp_path / "exp" / "authors_csv").glob("*.csv"))


def test_ingest_no_filters_keeps_all(release_dir):
    out = ingest_release(release_dir, s2_filters=(), use_tables=("papers",))
    assert out["papers"].count() == 200


def test_ingest_shuffle_path_matches_broadcast(release_dir, monkeypatch):
    """Force the 100 TB forms (hash semi-joins + partitioned shuffle
    merge) by zeroing the broadcast thresholds — the output must be
    identical to the broadcast path / reference oracle."""
    from cs_insights_crawler_ray.pipelines import ingest as I

    monkeypatch.setattr(I, "BROADCAST_KEY_LIMIT", 0)
    monkeypatch.setattr(I, "BROADCAST_META_ROW_LIMIT", 0)
    out = ingest_release(release_dir)
    ora_merged, ora_authors = _oracle(release_dir)

    eng_rows = {r["corpusid"]: r for r in out["papers"].take_all()}
    assert set(eng_rows.keys()) == set(ora_merged.keys())
    for cid, ora in ora_merged.items():
        eng = eng_rows[cid]
        for k, v in ora.items():
            ev = eng.get(k)
            if k in ("externalids",):
                ev = {kk: _norm(vv) for kk, vv in (ev or {}).items()}
                v = {kk: _norm(vv) for kk, vv in (v or {}).items()}
            if k == "authors":
                ev = [dict(a) for a in (ev if ev is not None else [])]
            assert ev == v, f"corpusid {cid} field {k}: {ev!r} != {v!r}"

    eng_authors = {r["authorid"]: r for r in out["authors"].take_all()}
    assert set(eng_authors.keys()) == {a["authorid"] for a in ora_authors}
