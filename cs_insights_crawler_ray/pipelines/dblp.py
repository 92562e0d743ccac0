"""The reference's DBLP release path (SURVEY.md §3.2) re-expressed:
element explode -> composable filter chain -> filtered Dataset.

Reference: ``dblpclient.py:252-306`` downloads the xml.gz (md5
verified), parses the whole tree with xmltodict into
``DatasetJsonDict`` (one list per element type), then applies
``FilterFunction``s sequentially (``_filter_elements``,
dblpclient.py:352-382).

Here each element type is a Dataset of element rows; filters are
pluggable vectorized batch fns composed in order (F4).  The filters
preserve reference semantics exactly:

- F1 timestamp: keep ``@mdate`` strictly after from_timestamp; a
  missing @mdate RAISES, like ``strptime(str(None))`` does in the
  reference (dblpclient.py:119) — poison-row handling is opt-in via
  ``strict=False``.
- F2 access: ``ee.@type`` with default CLOSED when no ``ee``
  (dblpclient.py:141).
- D4 denylist: IGNORE_DBLP_KEYS anti-filter (types.py:91 — the
  reference exports but never applies it; we wire it as an optional
  stage and default it OFF for parity).

The XML parse (S9/S10) is REAL: ``parse_dblp_xml`` streams each
xml.gz shard through stdlib ``xml.etree.ElementTree.iterparse`` (one
flat_map task per shard, elements cleared as they complete so memory
stays bounded by one element, not the tree) and emits one normalized
row per depth-1 element in the post-xmltodict shape the filter chain
consumes.  DTD VALIDATION (reference dblpclient.py:477) is real: a pure-Python
subset validator (functions/dtd.py — parameter entities, element/
attribute allow-lists, EMPTY/#PCDATA flags) checks every element and
routes violations to a quarantine poison column instead of crashing;
with lxml installed, ``lxml.etree.XMLParser(dtd_validation=True)`` is
the drop-in per-worker replacement in the same flat_map.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from datetime import datetime

import pandas as pd
import ray.data as rd

ACCESS_OPEN, ACCESS_CLOSED = "oa", "closed"
IGNORE_DBLP_KEYS = ["dblpnote/error", "dblpnote/neverpublished", "dblpnote/ellipsis"]

# DBLP's depth-1 publication element types (public DTD)
DBLP_ELEMENT_TYPES = (
    "article", "inproceedings", "proceedings", "book", "incollection",
    "phdthesis", "mastersthesis", "www", "person", "data",
)


def _elem_to_row(el: ET.Element) -> dict:
    """One depth-1 element -> the normalized post-xmltodict row shape
    (reference dblpclient.py:481-488 explodes the xmltodict tree into
    one list per element type; here every element becomes a table row):

    - attributes keep their ``@`` prefix (``@key``, ``@mdate``, ...)
    - ``author``: always a list of strings (xmltodict's single-child/
      list ambiguity normalized — Arrow needs one type per column)
    - ``title``: flattened text (nested markup like <i> via itertext)
    - ``ee``: struct {'@type', '#text'} of the FIRST ee (missing
      @type -> None, the access filter's default-CLOSED case)
    - ``year``: string, as xmltodict leaves it
    """
    row: dict = {
        "_type": el.tag,
        "@key": el.attrib.get("key"),
        "@mdate": el.attrib.get("mdate"),
        "@publtype": el.attrib.get("publtype"),
        "author": [],
        "title": None,
        "year": None,
        "ee": None,
    }
    for c in el:
        if c.tag == "author":
            row["author"].append("".join(c.itertext()))
        elif c.tag == "title" and row["title"] is None:
            row["title"] = "".join(c.itertext())
        elif c.tag == "year" and row["year"] is None:
            row["year"] = "".join(c.itertext())
        elif c.tag == "ee" and row["ee"] is None:
            row["ee"] = {
                "@type": c.attrib.get("type"),
                "#text": "".join(c.itertext()),
            }
    return row


def _parse_shard(path: str, schema=None) -> list[dict]:
    """Stream one xml.gz shard: iterparse end-events, emit depth-1
    elements, clear each element after use (bounded memory — the whole
    point of iterparse vs the reference's whole-tree xmltodict parse,
    dblpclient.py:481).  With a DTD schema, each element is validated
    BEFORE clearing and the row carries ``_dtd_error`` (None = valid)
    — schema violations are poison rows routed to a quarantine sink,
    never crashes (SURVEY.md §2 S9)."""
    from ..functions.dtd import validate_element

    rows: list[dict] = []
    with gzip.open(path, "rb") as f:
        it = ET.iterparse(f, events=("start", "end"))
        _, root = next(it)  # the <dblp> root start event
        for event, el in it:
            if event == "end" and el.tag in DBLP_ELEMENT_TYPES:
                row = _elem_to_row(el)
                if schema is not None:
                    errs = validate_element(el, schema)
                    row["_dtd_error"] = "; ".join(errs) if errs else None
                rows.append(row)
                el.clear()
                # drop completed children from the root so memory does
                # not grow with document count
                while len(root) and root[0] is not el:
                    del root[0]
    return rows


def parse_dblp_xml(
    xml_gz_paths: str | list[str],
    validate_dtd: bool = False,
    dtd_path: str | None = None,
) -> rd.Dataset:
    """S9/S10 (reference ``dblpclient.py:472-488``): the release
    xml.gz -> one Dataset row per publication element, one flat_map
    task per shard.

    validate_dtd=True validates each element against the release DTD
    (``dtd_path``, or the single ``*.dtd`` beside the first shard —
    the reference downloads the dtd next to the xml.gz,
    dblpclient.py:421-435) with the pure-Python subset validator in
    functions/dtd.py (element/attribute allow-lists — sufficient for
    DBLP's grammar; lxml's ``XMLParser(dtd_validation=True)`` is the
    drop-in production path when lxml is available).  Rows then carry
    a ``_dtd_error`` poison column (None = valid); route invalid rows
    with ``quarantine_split``.  Unlike the reference (which raises and
    kills the run on the first violation, dblpclient.py:477), a
    malformed element is quarantined data, not an exception."""
    paths = [xml_gz_paths] if isinstance(xml_gz_paths, str) else list(xml_gz_paths)
    schema = None
    if validate_dtd:
        from pathlib import Path

        from ..functions.dtd import parse_dtd

        if dtd_path is None:
            sibs = sorted(Path(sorted(paths)[0]).parent.glob("*.dtd"))
            if not sibs:
                raise FileNotFoundError(
                    "validate_dtd=True but no dtd_path given and no *.dtd "
                    "found beside the xml.gz shards"
                )
            dtd_path = str(sibs[0])
        schema = parse_dtd(Path(dtd_path).read_text())

    def parse(row: dict) -> list[dict]:
        return _parse_shard(row["path"], schema)

    return rd.from_items([{"path": p} for p in sorted(paths)]).flat_map(parse)


def quarantine_split(ds: rd.Dataset) -> tuple[rd.Dataset, rd.Dataset]:
    """Split a validated parse into (valid rows without the poison
    column, quarantined rows keeping ``_dtd_error``) — the quarantine
    sink of SURVEY.md §2 S9.

    The input is materialized ONCE before fan-out: both returned
    datasets are consumed (that's the point of a quarantine), and
    without the pin each side would re-run the gzip + iterparse + DTD
    lineage — the dominant cost — from scratch.  This is the
    legitimate materialize: a deliberate two-consumer split point, not
    a mid-pipeline barrier (blocks live in the object store and spill
    like any shuffle output)."""
    ds = ds.materialize()
    valid = ds.filter(lambda r: r["_dtd_error"] is None).map_batches(
        lambda b: b.drop(columns=["_dtd_error"]), batch_format="pandas"
    )
    bad = ds.filter(lambda r: r["_dtd_error"] is not None)
    return valid, bad


def load_dblp_elements(elements: list[dict]) -> rd.Dataset:
    """Element rows in the post-xmltodict shape
    ({'@key', '@mdate', 'ee': {'@type', '#text'}, ...})."""
    return rd.from_items(elements)


def timestamp_filter(from_timestamp: datetime, strict: bool = True):
    """F1 (dblpclient.py:104-123): keep elements with
    @mdate > from_timestamp. strict=True replicates the reference's
    raise-on-missing-@mdate behavior."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        if strict and b["@mdate"].isna().any():
            raise ValueError("element without @mdate (reference raises too)")
        ts = pd.to_datetime(b["@mdate"], format="%Y-%m-%d", errors="coerce")
        if strict and (ts.isna() & b["@mdate"].notna()).any():
            # the reference's strptime raises on any unparseable date —
            # errors='coerce' alone would silently DROP the poison row
            # (NaT > cutoff is False) instead of surfacing it
            bad = b.loc[ts.isna() & b["@mdate"].notna(), "@mdate"].iloc[0]
            raise ValueError(
                f"unparseable @mdate {bad!r} (reference strptime raises too)"
            )
        return b[ts > pd.Timestamp(from_timestamp)]

    return f


def access_filter(access_types: set[str]):
    """F2 (dblpclient.py:126-145): keep elements whose ee.@type is in
    access_types; elements without ``ee`` default to CLOSED."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        if "ee" in b.columns:
            types = b["ee"].map(
                lambda ee: (ee or {}).get("@type", ACCESS_CLOSED)
                if isinstance(ee, dict) or ee is None
                else ACCESS_CLOSED
            )
        else:
            types = pd.Series(ACCESS_CLOSED, index=b.index)
        return b[types.isin(access_types)]

    return f


def denylist_filter(keys: list[str] | None = None):
    """D4 (types.py:91): anti-filter on @key. The reference defines
    IGNORE_DBLP_KEYS but never applies it in v1 — wire this stage
    explicitly when you want it."""
    deny = set(IGNORE_DBLP_KEYS if keys is None else keys)

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return b[~b["@key"].isin(deny)]

    return f


def apply_filters(ds: rd.Dataset, *filters) -> rd.Dataset:
    """F4 (dblpclient.py:352-382): sequential composition of filter
    functions — each becomes one vectorized map_batches stage."""
    for f in filters:
        ds = ds.map_batches(f, batch_format="pandas")
    return ds


def download_and_filter_release(
    listing: list[str],
    fetch,
    cache_dir: str,
    from_timestamp: datetime,
    access_types: set[str] | None = None,
    skip: int = 1,
    validate_dtd: bool = False,
) -> rd.Dataset:
    """End-to-end DBLP release path (reference
    ``dblpclient.py:252-306``): artifact listing -> nth-newest xml.gz
    pick (S6) -> md5-verified cached download (S7: the fetch is
    SKIPPED when the cached copy's md5 already matches the release's
    .md5 artifact; a corrupt download raises) -> iterparse explode
    (S9/S10) -> sequential filter chain (F1 timestamp, F2 access).

    ``fetch(name) -> bytes`` abstracts the transport (the reference's
    chunked HTTP GET, S1/S2); tests drive it with a local-directory
    fetcher — no network exists in this sandbox."""
    import hashlib
    from pathlib import Path

    from ..sources.releases import latest_release_file

    name = latest_release_file(listing, ".xml.gz", skip)
    md5_name = f"{name}.md5"
    if md5_name not in listing:
        raise FileNotFoundError(f"no md5 artifact for {name}")
    # reference md5 files are "<hex>  <filename>" — first token
    expected = fetch(md5_name).decode().split()[0]

    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    local = cache / Path(name).name
    if local.exists() and hashlib.md5(local.read_bytes()).hexdigest() == expected:
        pass  # S7 cache hit: zero re-fetch
    else:
        blob = fetch(name)
        got = hashlib.md5(blob).hexdigest()
        if got != expected:
            raise ValueError(f"md5 mismatch for {name}: {got} != {expected}")
        local.write_bytes(blob)

    dtd_path = None
    if validate_dtd:
        # S7's dtd half (reference _download_latest_dtd,
        # dblpclient.py:421-435): the .dtd artifact cached beside the
        # xml.gz, existence-checked like the reference's skip-if-present
        dtd_name = latest_release_file(listing, ".dtd", skip)
        dtd_local = cache / Path(dtd_name).name
        if not dtd_local.exists():
            dtd_local.write_bytes(fetch(dtd_name))
        dtd_path = str(dtd_local)

    ds = parse_dblp_xml(str(local), validate_dtd=validate_dtd, dtd_path=dtd_path)
    if validate_dtd:
        ds, _quarantined = quarantine_split(ds)
    filters = [timestamp_filter(from_timestamp)]
    if access_types is not None:
        filters.append(access_filter(access_types))
    return apply_filters(ds, *filters)


def q40_dblp_explode(sf_dir: str) -> rd.Dataset:
    """S9/S10 end to end: deterministic xml.gz shards derived from
    documents.parquet (fixtures/dblp_xml.py) -> iterparse explode ->
    the reference filter chain (F1 timestamp strictly-after, F2 access
    default-CLOSED) -> projection.  SQL-oracled: every derived field
    is recomputable in DuckDB over the documents view, so what the
    value hash checks is the XML encode -> gzip -> iterparse -> filter
    round-trip itself (reference dblpclient.py:472-488 + 252-306)."""
    from pathlib import Path

    from ..fixtures.dblp_xml import write_dblp_xml_from_documents

    sf = Path(sf_dir).name
    xml_dir = f"/tmp/ciq_dblp_v1_{sf}"
    marker = Path(xml_dir) / "_complete"
    if not marker.exists():
        write_dblp_xml_from_documents(sf_dir, xml_dir)
        marker.write_text("ok")
    paths = sorted(str(p) for p in Path(xml_dir).glob("dblp-*.xml.gz"))

    ds = apply_filters(
        parse_dblp_xml(paths),
        timestamp_filter(datetime(2020, 9, 1)),
        access_filter({ACCESS_OPEN}),
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b["@key"],
                "mdate": b["@mdate"],
                "access": b["ee"].map(
                    lambda e: (e or {}).get("@type") or ACCESS_CLOSED
                ),
                "title": b["title"],
                "year": b["year"].astype("int64"),
                "n_authors": b["author"].map(len).astype("int64"),
            }
        )

    return ds.map_batches(project, batch_format="pandas")
