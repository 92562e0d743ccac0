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

    # review r04: the two adaptive paths must agree on EVERY field of
    # EVERY row — including fields the oracle row lacks (a missing
    # abstract was None on the broadcast path but pandas-NaN on the
    # shuffle path, invisible to the oracle-keyed loop above)
    monkeypatch.setattr(I, "BROADCAST_KEY_LIMIT", 1 << 30)
    monkeypatch.setattr(I, "BROADCAST_META_ROW_LIMIT", 1 << 30)
    bc_rows = {r["corpusid"]: r for r in ingest_release(release_dir)["papers"].take_all()}
    assert set(bc_rows) == set(eng_rows)
    for cid, bc in bc_rows.items():
        sh = eng_rows[cid]
        assert set(bc) == set(sh), f"corpusid {cid}: column sets differ"
        for k, v in bc.items():
            sv = sh[k]
            if k == "authors":
                v = [dict(a) for a in (v or [])]
                sv = [dict(a) for a in (sv or [])]
            assert sv == v or (sv is None and v is None), (
                f"corpusid {cid} field {k}: shuffle {sv!r} != broadcast {v!r}"
            )


def test_ingest_ragged_schema_fallback(tmp_path):
    """Review r04: the per-line fallback parser (type-conflicting rows
    Arrow cannot unify) yields pandas frames whose missing cells are
    float NaN — truthy, no .get/.len — and the batch kernels must
    treat them as absent, not crash.  End-to-end over a hand-built
    release where openaccessinfo flips dict->string (forcing the
    fallback) and rows lack authors/externalids entirely."""
    import gzip as _gz
    import json as _json

    cache = tmp_path / "cache"
    cache.mkdir()

    def jl(name, rows):
        with _gz.open(cache / name, "wt") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    jl("papers1.jsonl.gz", [
        {"corpusid": 1, "externalids": {"DBLP": "x"}, "title": "t1",
         "authors": [{"authorId": "a1"}]},
        # promoted via openaccessinfo; NO authors / externalids keys
        {"corpusid": 2, "title": "t2",
         "openaccessinfo": {"externalids": {"DBLP": "y"}}},
        # string openaccessinfo: the Arrow type conflict that forces
        # the fallback; no ids anywhere -> filtered out
        {"corpusid": 3, "title": "t3", "openaccessinfo": "closed"},
    ])
    jl("abstracts1.jsonl.gz", [
        {"corpusid": 1, "abstract": "A"},
        {"corpusid": 2, "abstract": "B"},
        {"corpusid": 3, "abstract": "C"},
    ])
    jl("authors1.jsonl.gz", [
        {"authorid": "a1", "url": "u1", "name": "n1"},
        {"authorid": "zz", "url": "u2", "name": "n2"},
    ])

    out = ingest_release(str(cache))
    rows = {r["corpusid"]: r for r in out["papers"].take_all()}
    assert set(rows) == {1, 2}
    assert rows[2]["externalids"]["DBLP"] == "y"
    assert rows[1]["abstract"] == "A" and rows[2]["abstract"] == "B"
    authors = out["authors"].take_all()
    assert [a["authorid"] for a in authors] == ["a1"]
    assert authors[0]["s2url"] == "u1"


def test_batch_kernels_nan_cells():
    """The vectorized F5/F6 kernels on a from_records frame with NaN
    holes (the exact shape the fallback parser emits)."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.ingest import (
        promote_externalids_batch, source_filter_batch, source_filter)

    b = pd.DataFrame.from_records([
        {"corpusid": 1, "externalids": {"DBLP": "x"}},
        {"corpusid": 2, "openaccessinfo": {"externalids": {"DBLP": "y"}}},
        {"corpusid": 3},
    ])
    p = promote_externalids_batch(b)
    kept = source_filter_batch(("DBLP",))(p)
    assert sorted(kept["corpusid"]) == [1, 2]
    # scalar form mirrors (NaN externalids -> excluded, not a crash)
    assert source_filter({"externalids": float("nan")}, ("DBLP",)) is False
