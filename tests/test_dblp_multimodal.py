"""DBLP filter-chain parity + multimodal stage plumbing."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cs_insights_crawler_ray.pipelines import dblp
from cs_insights_crawler_ray.stages import multimodal as mm

ELEMENTS = [
    {"@key": "conf/x/1", "@mdate": "2021-06-01", "ee": {"@type": "oa", "#text": "u1"}},
    {"@key": "conf/x/2", "@mdate": "2019-01-01", "ee": {"@type": "oa", "#text": "u2"}},
    {"@key": "conf/x/3", "@mdate": "2022-03-04", "ee": {"@type": "closed", "#text": "u3"}},
    {"@key": "conf/x/4", "@mdate": "2023-05-06"},                      # no ee -> CLOSED
    {"@key": "dblpnote/error", "@mdate": "2022-01-01", "ee": {"@type": "oa", "#text": "u5"}},
]


def _oracle(elements, from_ts, access):
    """Sequential reference semantics (dblpclient.py:104-145)."""
    out = []
    for el in elements:
        if datetime.strptime(el["@mdate"], "%Y-%m-%d") <= from_ts:
            continue
        if el.get("ee", {"@type": "closed"}).get("@type") not in access:
            continue
        out.append(el["@key"])
    return out


def test_dblp_filter_chain_parity():
    ds = dblp.load_dblp_elements(ELEMENTS)
    got = dblp.apply_filters(
        ds,
        dblp.timestamp_filter(datetime(2020, 1, 1)),
        dblp.access_filter({"oa"}),
    )
    keys = sorted(r["@key"] for r in got.take_all())
    assert keys == sorted(_oracle(ELEMENTS, datetime(2020, 1, 1), {"oa"}))


def test_dblp_denylist_and_strict():
    ds = dblp.load_dblp_elements(ELEMENTS)
    keys = sorted(
        r["@key"]
        for r in dblp.apply_filters(ds, dblp.denylist_filter()).take_all()
    )
    assert "dblpnote/error" not in keys and len(keys) == 4

    bad = dblp.load_dblp_elements([{"@key": "x", "@mdate": None}])
    with pytest.raises(Exception):  # reference raises on missing @mdate too
        dblp.apply_filters(bad, dblp.timestamp_filter(datetime(2020, 1, 1))).take_all()

    # strict also raises on MALFORMED (non-null) dates — the reference's
    # strptime would; errors='coerce' alone silently dropped the row
    mal = dblp.load_dblp_elements([{"@key": "y", "@mdate": "2020/09/01"}])
    with pytest.raises(Exception):
        dblp.apply_filters(mal, dblp.timestamp_filter(datetime(2020, 1, 1))).take_all()
    # non-strict keeps the silent-drop semantics
    lax = dblp.apply_filters(
        mal, dblp.timestamp_filter(datetime(2020, 1, 1), strict=False)
    ).take_all()
    assert lax == []

    # DTD validation is real now (tests/test_dtd.py); a validate
    # request with no DTD anywhere still fails loudly
    with pytest.raises(FileNotFoundError):
        dblp.parse_dblp_xml("/tmp/nope.xml.gz", validate_dtd=True)


def _write_xml_gz(path, body: str) -> str:
    import gzip

    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write(body)
    return str(path)


_XML = """<?xml version="1.0" encoding="UTF-8"?>
<dblp>
  <article key="conf/x/1" mdate="2021-06-01">
    <author>Ann A</author><author>Bob B</author>
    <title>Learning <i>fast</i> &amp; slow</title>
    <year>2020</year>
    <ee type="oa">https://x/1</ee>
    <ee>https://mirror/1</ee>
  </article>
  <inproceedings key="conf/x/2" mdate="2019-01-01">
    <author>Cid C</author>
    <title>Only one</title>
    <year>2019</year>
  </inproceedings>
  <www key="homepages/x" mdate="2022-02-02"><title>Home</title></www>
</dblp>
"""


def test_parse_dblp_xml_explode(tmp_path):
    """S9/S10: iterparse explode — nested title markup flattened,
    entity unescaped, author lists normalized, first-ee struct, no-ee
    -> None (default-CLOSED downstream), one row per depth-1 element."""
    p = _write_xml_gz(tmp_path / "dblp-t.xml.gz", _XML)
    rows = {r["@key"]: r for r in dblp.parse_dblp_xml(p).take_all()}
    assert set(rows) == {"conf/x/1", "conf/x/2", "homepages/x"}
    r1 = rows["conf/x/1"]
    assert r1["_type"] == "article"
    assert list(r1["author"]) == ["Ann A", "Bob B"]
    assert r1["title"] == "Learning fast & slow"   # markup + entity
    assert r1["year"] == "2020"
    assert r1["ee"]["@type"] == "oa" and r1["ee"]["#text"] == "https://x/1"
    r2 = rows["conf/x/2"]
    assert r2["ee"] is None and list(r2["author"]) == ["Cid C"]
    assert rows["homepages/x"]["_type"] == "www"


def test_parse_feeds_filter_chain(tmp_path):
    p = _write_xml_gz(tmp_path / "dblp-t.xml.gz", _XML)
    got = dblp.apply_filters(
        dblp.parse_dblp_xml(p),
        dblp.timestamp_filter(datetime(2020, 1, 1)),
        dblp.access_filter({"oa"}),
    )
    assert [r["@key"] for r in got.take_all()] == ["conf/x/1"]


def test_download_and_filter_release(tmp_path):
    """End-to-end reference dblpclient.py:252-306 semantics: newest
    release picked from the listing, md5-verified download cached
    (zero re-fetch on the second run), corrupt md5 raises."""
    import hashlib

    rel = tmp_path / "releases"
    rel.mkdir()
    old = _write_xml_gz(rel / "dblp-2023-01-01.xml.gz", "<dblp></dblp>")
    new = _write_xml_gz(rel / "dblp-2024-02-02.xml.gz", _XML)
    for p in (old, new):
        blob = open(p, "rb").read()
        with open(p + ".md5", "w") as f:
            f.write(f"{hashlib.md5(blob).hexdigest()}  {p.split('/')[-1]}\n")

    listing = sorted(p.name for p in rel.iterdir())
    fetches = []

    def fetch(name):
        fetches.append(name)
        return (rel / name).read_bytes()

    cache = tmp_path / "cache"
    ds = dblp.download_and_filter_release(
        listing, fetch, str(cache), datetime(2020, 1, 1), {"oa"}
    )
    assert [r["@key"] for r in ds.take_all()] == ["conf/x/1"]  # newest release
    assert "dblp-2024-02-02.xml.gz" in fetches

    # second run: md5 matches the cached copy -> only the .md5 is fetched
    n_before = len([f for f in fetches if f.endswith(".xml.gz")])
    dblp.download_and_filter_release(
        listing, fetch, str(cache), datetime(2020, 1, 1), {"oa"}
    ).take_all()
    assert len([f for f in fetches if f.endswith(".xml.gz")]) == n_before

    # corrupt cached copy: re-fetched and verified (not trusted)
    (cache / "dblp-2024-02-02.xml.gz").write_bytes(b"garbage")
    dblp.download_and_filter_release(
        listing, fetch, str(cache), datetime(2020, 1, 1), {"oa"}
    ).take_all()
    assert len([f for f in fetches if f.endswith(".xml.gz")]) == n_before + 1

    # md5 artifact that does not match the download: hard error
    with open(str(rel / "dblp-2024-02-02.xml.gz") + ".md5", "w") as f:
        f.write("0" * 32 + "  dblp-2024-02-02.xml.gz\n")
    (cache / "dblp-2024-02-02.xml.gz").unlink()
    with pytest.raises(ValueError, match="md5 mismatch"):
        dblp.download_and_filter_release(
            listing, fetch, str(cache), datetime(2020, 1, 1), {"oa"}
        )


def _audio_clip(seed, n=8000, rate=16000):
    # pure 440 Hz tone (wideband noise would dominate the magnitude-
    # weighted centroid); seed only varies the phase
    t = np.arange(n) / rate
    wave = (np.sin(2 * np.pi * 440 * t + seed) * 12000).astype(np.int16)
    return mm.encode_audio(np.stack([wave, wave], axis=1), rate)


def test_audio_stage_roundtrip_and_features():
    t = pa.table(
        {
            "clip_id": ["a", "b", "bad"],
            "bytes": [_audio_clip(1), _audio_clip(2), b"junk"],
            "sample_rate": pa.array([16000, 16000, 0], pa.int32()),
            "n_samples": pa.array([8000, 8000, 0], pa.int64()),
            "channels": pa.array([2, 2, 0], pa.int32()),
        }
    )
    out = rd.from_arrow(t).map_batches(mm.audio_features_stage, batch_format="pyarrow").to_pandas()
    assert list(out["ok"]) == [True, True, False]
    ok = out[out["ok"]]
    # a 440 Hz tone: centroid near 440, rms near 12000/32768*0.707
    assert (ok["spectral_centroid"].between(300, 900)).all()
    assert (ok["rms"].between(0.2, 0.4)).all()
    with pytest.raises(NotImplementedError):
        mm.decode_audio_with_library(b"")


def test_video_frame_sample_stage():
    rng = np.random.Generator(np.random.PCG64(3))
    frames = rng.integers(0, 256, size=(12, 32, 32, 3), dtype=np.uint8)
    t = pa.table(
        {
            "video_id": ["v1", "bad"],
            "bytes": [mm.encode_video(frames, 24.0), b"junk"],
            "w": pa.array([32, 0], pa.int32()),
            "h": pa.array([32, 0], pa.int32()),
            "n_frames": pa.array([12, 0], pa.int32()),
            "fps": pa.array([24.0, 0.0], pa.float32()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(mm.video_frame_sample_stage, batch_format="pyarrow")
        .to_pandas()
    )
    assert list(out["frame_idx"]) == [0, 5, 10]   # every_n=5 over 12 frames
    assert (out["video_id"] == "v1").all()
    dec, fps = mm.decode_video(mm.encode_video(frames, 24.0))
    assert np.array_equal(dec, frames) and fps == 24.0


def test_extractor_plugin_surface():
    import pyarrow as pa

    from cs_insights_crawler_ray.stages import extract as ex

    with pytest.raises(NotImplementedError):
        ex.extraction_stage(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "pdf_bytes": [b"%PDF-"]}),
            ex.ExtractorType.GROBID,
        )

    def fake(blob: bytes) -> dict:
        if not blob.startswith(b"%PDF"):
            raise ValueError("not a pdf")
        return {"text": f"extracted {len(blob)} bytes"}

    ex.register_extractor(ex.ExtractorType.RULEBASED, fake)
    out = ex.extraction_stage(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "pdf_bytes": [b"%PDF-1.5 body", b"junk"]}),
        ex.ExtractorType.RULEBASED,
    )
    assert out["ok"].to_pylist() == [True, False]   # poison row, no raise
    assert "extracted" in out["text"][0].as_py()


def test_multimodal_corrupt_zlib_body_is_poison_row():
    """A well-headered clip/video with a corrupt zlib body must become
    ok=False (zlib.error is not ValueError; unwrapped it killed the
    whole batch task instead of poisoning the row)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cs_insights_crawler_ray.stages import multimodal as mm

    wave = (np.sin(np.arange(800) / 10.0) * 20000).astype(np.int16)
    clip = bytearray(mm.encode_audio(np.stack([wave, wave], axis=1), 8000))
    clip[20] ^= 0xFF
    t = pa.table({"clip_id": ["c0"], "bytes": [bytes(clip)]})
    out = rd.from_arrow(t).map_batches(
        mm.audio_features_stage, batch_format="pyarrow"
    ).to_pandas()
    assert list(out["ok"]) == [False]

    frames = np.zeros((4, 8, 8, 3), np.uint8)
    vid = bytearray(mm.encode_video(frames, 24.0))
    vid[20] ^= 0xFF
    tv = pa.table({"video_id": ["v0"], "bytes": [bytes(vid)]})
    outv = rd.from_arrow(tv).map_batches(
        mm.video_frame_sample_stage, batch_format="pyarrow"
    ).to_pandas()
    # video stage skips undecodable rows (no frames emitted)
    assert len(outv) == 0 or not outv.get("ok", pd.Series([True])).any()


def test_make_extraction_stage_ships_registered_fn_to_workers():
    """register_extractor mutates a DRIVER-process global that Ray
    workers never see; make_extraction_stage must close over the
    resolved function so map_batches works distributed."""
    import pyarrow as pa
    import ray.data as rd

    from cs_insights_crawler_ray.stages import extract as ex

    def fake(blob: bytes) -> dict:
        if blob == b"poison":
            raise RuntimeError("bad pdf")
        return {"text": blob.decode()}

    ex.register_extractor(ex.ExtractorType.RULEBASED, fake)
    try:
        stage = ex.make_extraction_stage(ex.ExtractorType.RULEBASED)
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "pdf_bytes": [b"hello", b"poison"]})
        out = (
            rd.from_arrow(t)
            .map_batches(stage, batch_format="pyarrow")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert list(out["text"]) == ["hello", ""]
        assert list(out["ok"]) == [True, False]
    finally:
        ex.register_extractor(ex.ExtractorType.RULEBASED, ex._rulebased_extract)
