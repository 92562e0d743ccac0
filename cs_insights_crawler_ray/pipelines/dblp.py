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

The XML parse itself (S9/S10, lxml+DTD) is STUBBED: the container
ships no lxml, so ``load_dblp_elements`` accepts pre-exploded element
dicts (the post-xmltodict shape) and ``parse_dblp_xml`` raises
NotImplementedError with the documented production plan
(read_binary_files -> per-file lxml.iterparse flat_map).
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import ray.data as rd

ACCESS_OPEN, ACCESS_CLOSED = "oa", "closed"
IGNORE_DBLP_KEYS = ["dblpnote/error", "dblpnote/neverpublished", "dblpnote/ellipsis"]


def parse_dblp_xml(xml_gz_path: str) -> rd.Dataset:  # pragma: no cover - stub
    """STUB (S9/S10): DTD-validating XML parse needs lxml, absent in
    this sandbox. Production shape: ``ray.data.read_binary_files`` on
    the per-release xml.gz shards -> ``flat_map`` running
    ``lxml.etree.iterparse`` per shard with the DTD loaded once per
    worker process, emitting one row per element."""
    raise NotImplementedError(
        "lxml is not available in this environment; feed pre-exploded "
        "element dicts to load_dblp_elements() instead"
    )


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
