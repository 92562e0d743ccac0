"""S9 DTD validation: the pure-Python subset validator + the
quarantine (not crash) contract of the parse stage.

Reference behavior being covered: ``lxml.etree.XMLParser(
dtd_validation=True)`` at ``dblpclient.py:472-479`` — except a
malformed element becomes a quarantined poison row here rather than
killing the run."""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

from cs_insights_crawler_ray.fixtures.dblp_xml import (
    FIXTURE_DTD, write_dblp_dtd, write_dblp_xml_from_documents)
from cs_insights_crawler_ray.functions.dtd import parse_dtd, validate_element
from cs_insights_crawler_ray.pipelines.dblp import parse_dblp_xml, quarantine_split

SF = "/root/testdata/sf0.001"


def test_parse_dtd_entities_and_attlists():
    s = parse_dtd(FIXTURE_DTD)
    # %field; expanded into article's content model
    assert s.children["article"] == {"author", "title", "year", "ee"}
    assert s.allows_pcdata["author"] and not s.allows_pcdata["article"]
    assert s.attrs["article"]["key"] is True       # #REQUIRED
    assert s.attrs["article"]["mdate"] is False    # #IMPLIED
    assert s.attrs["ee"]["type"] is False


def test_validate_element_catches_violations():
    s = parse_dtd(FIXTURE_DTD)
    ok = ET.fromstring(
        '<article key="doc/1" mdate="2021-01-01">'
        "<title>t</title><year>2001</year></article>"
    )
    assert validate_element(ok, s) == []

    bad_child = ET.fromstring('<article key="k"><venue>x</venue></article>')
    errs = validate_element(bad_child, s)
    assert any("venue" in e for e in errs)

    missing_key = ET.fromstring("<article><title>t</title></article>")
    assert any("key" in e for e in validate_element(missing_key, s))

    bad_attr = ET.fromstring('<article key="k" badattr="1"/>')
    assert any("badattr" in e for e in validate_element(bad_attr, s))


def test_parse_valid_fixture_validates_clean(tmp_path):
    xml_dir = tmp_path / "xml"
    paths = write_dblp_xml_from_documents(SF, str(xml_dir), shards=2)
    ds = parse_dblp_xml(paths, validate_dtd=True)  # dtd auto-discovered
    valid, bad = quarantine_split(ds)
    assert bad.count() == 0
    assert valid.count() == parse_dblp_xml(paths).count()
    assert "_dtd_error" not in valid.schema().names


def test_malformed_elements_quarantined_not_crashed(tmp_path):
    root = ET.Element("dblp")
    ok = ET.SubElement(root, "article", key="doc/1", mdate="2021-01-01")
    ET.SubElement(ok, "title").text = "fine"
    bad1 = ET.SubElement(root, "article", mdate="2021-01-02")  # no key
    ET.SubElement(bad1, "title").text = "missing key"
    bad2 = ET.SubElement(root, "article", key="doc/3")
    ET.SubElement(bad2, "venue").text = "undeclared child"
    p = tmp_path / "dblp-0.xml.gz"
    with gzip.open(p, "wb") as f:
        f.write(ET.tostring(root, encoding="utf-8", xml_declaration=True))
    write_dblp_dtd(str(tmp_path))

    ds = parse_dblp_xml(str(p), validate_dtd=True)
    valid, bad = quarantine_split(ds)
    assert valid.count() == 1
    quarantined = bad.to_pandas()
    assert len(quarantined) == 2
    joined = " | ".join(quarantined["_dtd_error"])
    assert "key" in joined and "venue" in joined


def test_missing_dtd_raises(tmp_path):
    root = ET.Element("dblp")
    p = tmp_path / "dblp-0.xml.gz"
    with gzip.open(p, "wb") as f:
        f.write(ET.tostring(root, encoding="utf-8", xml_declaration=True))
    try:
        parse_dblp_xml(str(p), validate_dtd=True)
    except FileNotFoundError as e:
        assert "dtd" in str(e).lower()
    else:  # pragma: no cover
        raise AssertionError("expected FileNotFoundError")
