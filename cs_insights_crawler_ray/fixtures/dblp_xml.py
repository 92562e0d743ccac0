"""Deterministic DBLP-release-shaped xml.gz fixtures, derived from the
driver's ``documents.parquet`` table.

Every derived field is a pure function of (doc_id, lang, text) that is
also expressible in SQL, so the q40 explode pipeline can be
value-hash-checked against a DuckDB oracle computed directly over the
documents view — the XML encode -> gzip -> iterparse -> filter chain
round-trip is what gets verified.

Derivations (keep in sync with the q40 oracle in __ray_entry__):
    key       = 'doc/' || doc_id
    mdate     = DATE '2020-01-01' + (doc_id % 1500) days
    year      = 1990 + doc_id % 35
    n_authors = 1 + doc_id % 4      (authors 'A{doc_id}_{k}')
    ee @type  = 'oa' if lang == 'en' else 'closed'
    ee #text  = 'https://x/' || doc_id
    title     = first 5 whitespace tokens of text
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from datetime import date, timedelta
from pathlib import Path

import pyarrow.parquet as pq

_EPOCH = date(2020, 1, 1)


def _article(doc_id: int, lang: str, text: str) -> ET.Element:
    el = ET.Element("article")
    el.set("key", f"doc/{doc_id}")
    el.set("mdate", (_EPOCH + timedelta(days=doc_id % 1500)).isoformat())
    for k in range(1 + doc_id % 4):
        a = ET.SubElement(el, "author")
        a.text = f"A{doc_id}_{k}"
    t = ET.SubElement(el, "title")
    t.text = " ".join(text.split()[:5])
    y = ET.SubElement(el, "year")
    y.text = str(1990 + doc_id % 35)
    ee = ET.SubElement(el, "ee")
    ee.set("type", "oa" if lang == "en" else "closed")
    ee.text = f"https://x/{doc_id}"
    return el


# Fixture DTD matching _article's shape — exercises parameter-entity
# expansion, ATTLIST defaults, and #PCDATA models in the validator
# (mirrors the grammar family of the public dblp.dtd the reference
# downloads beside each release, dblpclient.py:421-435).
FIXTURE_DTD = """\
<!-- fixture dblp.dtd (subset) -->
<!ENTITY % field "author|title|year|ee">
<!ELEMENT dblp (article)*>
<!ELEMENT article (%field;)*>
<!ELEMENT author (#PCDATA)>
<!ELEMENT title (#PCDATA)>
<!ELEMENT year (#PCDATA)>
<!ELEMENT ee (#PCDATA)>
<!ATTLIST article key CDATA #REQUIRED mdate CDATA #IMPLIED
          publtype CDATA #IMPLIED>
<!ATTLIST ee type CDATA #IMPLIED>
"""


def write_dblp_dtd(out_dir: str) -> str:
    p = Path(out_dir) / "dblp.dtd"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(FIXTURE_DTD)
    return str(p)


def write_dblp_xml_from_documents(
    sf_dir: str, out_dir: str, shards: int = 4
) -> list[str]:
    """documents.parquet -> ``dblp-{i}.xml.gz`` shards (doc_id % shards
    routing, ascending doc_id within a shard — fully deterministic).
    ElementTree serialization handles XML escaping of arbitrary text;
    iterparse unescapes on the way back, so the round-trip is exact."""
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    roots = [ET.Element("dblp") for _ in range(shards)]
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    for r in rows:
        roots[r["doc_id"] % shards].append(_article(r["doc_id"], r["lang"], r["text"]))
    paths = []
    for i, root in enumerate(roots):
        p = out / f"dblp-{i}.xml.gz"
        with gzip.open(p, "wb") as f:
            f.write(ET.tostring(root, encoding="utf-8", xml_declaration=True))
        paths.append(str(p))
    write_dblp_dtd(out_dir)  # the .dtd beside the shards, like a release
    return paths
