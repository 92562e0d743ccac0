"""The reference's production ingest pipeline (``cli main`` trace,
SURVEY.md §3.1) re-expressed Ray-Data-first.

Reference flow (``process.py:156-185`` + ``s2processor.py``):
fetch release files -> pass 1 papers (externalids promotion + union
source filter + corpusid set) -> pass 2 metadata (corpusid semi-join)
-> sort + full-outer merge (papers win) -> authors semi-join on the
exploded author list -> rename url->s2url -> jsonl + csv export.

Every reference quirk is preserved deliberately (SURVEY.md §7.5 #6):

- union (OR) semantics of the source filters (s2processor.py:143)
- papers' fields win on merge collision (s2processor.py:115-117)
- ``authorId`` (papers) vs ``authorid`` (authors table) asymmetry
  (s2processor.py:89,93)
- ``url`` renamed ``s2url`` only on the authors table
  (s2processor.py:196)
- glob-order nondeterminism is FIXED here: files read in sorted order.

Execution shape: one task per release file (the reference's unit of
work, s2client.py:153) -> vectorized batch transforms -> broadcast
semi-joins (the corpusid/authorId key sets are bounded by the papers
table) -> hash full-outer join on corpusid.  At 100 TB the broadcast
sides become Ray hash joins (see pipelines/relational.py q05/q07 for
that form); both forms are implemented in this repo.
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path

import pyarrow as pa
import ray
import ray.data as rd

from ..functions.broadcast import bget

S2_SOURCES = ["ACL", "DBLP", "ArXiv", "PubMed", "PubMedCentral"]


def _read_jsonl_gz(files: list[str]) -> rd.Dataset:
    """One task per release file — the parallel unit matches the
    reference's per-file loop (s2processor.py:57-68)."""

    def parse(row: dict) -> list[dict]:
        with gzip.open(row["path"], "rt") as f:
            return [json.loads(line) for line in f]

    return rd.from_items([{"path": p} for p in sorted(files)]).flat_map(parse)


def promote_externalids(doc: dict) -> dict:
    """F6 (s2processor.py:158-164): openaccessinfo.externalids is
    promoted to top level; openaccessinfo is dropped."""
    oa = doc.get("openaccessinfo")
    if oa and oa.get("externalids"):
        doc = dict(doc)
        doc["externalids"] = oa["externalids"]
        doc.pop("openaccessinfo", None)
    return doc


def source_filter(doc: dict, filters: tuple[str, ...]) -> bool:
    """F5 (s2processor.py:135-150): UNION semantics — keep the paper
    if ANY selected source id is present (missing/None guards as in
    the reference)."""
    if not filters:
        return True
    ext = doc.get("externalids") or {}
    return any(ext.get(f) is not None for f in filters)


def ingest_release(
    cache_dir: str,
    out_dir: str | None = None,
    s2_filters: tuple[str, ...] = ("DBLP",),
    use_tables: tuple[str, ...] = ("papers", "abstracts", "authors"),
) -> dict[str, rd.Dataset]:
    """Run the full release pipeline; returns the final Datasets
    (and writes jsonl+csv exports when out_dir is given)."""
    cache = Path(cache_dir)

    # ---- pass 1: papers — promotion, union filter, key materialize --
    paper_files = [str(p) for p in sorted(cache.glob("papers*.jsonl.gz"))]
    papers = (
        _read_jsonl_gz(paper_files)
        .map(promote_externalids)
        .filter(lambda d: source_filter(d, s2_filters))
        .materialize()
    )
    # the filtered corpusid set is bounded by the papers table — the
    # reference holds it as a driver set (s2processor.py:55-68); we
    # broadcast it once (scale path: hash semi-join, q05_semi_join)
    corpusids = set(r["corpusid"] for r in papers.select_columns(["corpusid"]).take_all())
    cid_ref = ray.put(corpusids)

    out: dict[str, rd.Dataset] = {}
    merged = papers

    # ---- pass 2: metadata tables — semi-join + papers-win merge ----
    for table in use_tables:
        if table in ("papers", "authors"):
            continue
        files = [str(p) for p in sorted(cache.glob(f"{table}*.jsonl.gz"))]
        if not files:
            continue
        meta = _read_jsonl_gz(files).filter(lambda d: d["corpusid"] in bget(cid_ref))
        # J3 (s2processor.py:108-118): dict.update over (metadata,
        # papers) — papers' fields win.  Because the J1 semi-join just
        # restricted metadata to papers' corpusids, the reference's
        # "full outer" merge degenerates to papers + extra fields, so
        # a broadcast field-map is exactly faithful (the both-sides-
        # large hash-join form of J3 is q07_outer_merge; Arrow hash
        # joins also cannot carry list<struct> payload columns, which
        # papers.authors is).
        meta_map = {
            r["corpusid"]: {k: v for k, v in r.items() if k != "corpusid"}
            for r in meta.take_all()
        }
        meta_ref = ray.put(meta_map)

        def merge_in(doc: dict, _ref=meta_ref) -> dict:
            extra = bget(_ref).get(doc["corpusid"])
            return {**extra, **doc} if extra else doc  # papers win

        merged = merged.map(merge_in)

    out["papers"] = merged

    # ---- authors: exploded-list semi-join + rename ------------------
    if "authors" in use_tables:
        author_files = [str(p) for p in sorted(cache.glob("authors*.jsonl.gz"))]
        paper_author_ids = set(
            a["authorId"]
            for r in papers.select_columns(["authors"]).take_all()
            for a in (r["authors"] or [])
            if a.get("authorId") is not None
        )
        aid_ref = ray.put(paper_author_ids)
        authors = (
            _read_jsonl_gz(author_files)
            # NOTE lowercase 'authorid' here vs camelCase in papers —
            # the reference's asymmetry, preserved (s2processor.py:93)
            .filter(lambda d: d["authorid"] in bget(aid_ref))
            .map(_rename_url_s2url)
        )
        out["authors"] = authors

    # ---- sinks ------------------------------------------------------
    if out_dir is not None:
        from ..sources.sinks import clear_partition

        for name, ds in out.items():
            jp, cp = f"{out_dir}/{name}_jsonl", f"{out_dir}/{name}_csv"
            clear_partition(jp), clear_partition(cp)
            ds.write_json(jp)
            # csv needs flat columns; nested cols are json-encoded
            ds.map_batches(_flatten_for_csv, batch_format="pyarrow").write_csv(cp)
    return out


def _rename_url_s2url(doc: dict) -> dict:
    """F8 (s2processor.py:188-196): author['s2url'] = author.pop('url')."""
    doc = dict(doc)
    if "url" in doc:
        doc["s2url"] = doc.pop("url")
    return doc


def _flatten_for_csv(t: pa.Table) -> pa.Table:
    """S13 (s2processor.py:231-257): flatten nested structs to dotted
    columns; lists are json-encoded (pd.json_normalize analog)."""
    t = t.flatten()
    cols = {}
    for name in t.column_names:
        col = t[name]
        if pa.types.is_list(col.type) or pa.types.is_struct(col.type):
            cols[name] = pa.array(
                [json.dumps(v) for v in col.to_pylist()], pa.string()
            )
        else:
            cols[name] = col
    return pa.table(cols)
