"""Contract tests for the requests-backed transport against an
injected stub session (the sandbox has no network; production swaps
in requests.Session with zero code change)."""

from __future__ import annotations

import hashlib

import pytest

from cs_insights_crawler_ray.sources.http import (
    HttpFetcher, PermanentFetchError, TransientFetchError)


class _Resp:
    def __init__(self, code: int, payload: bytes = b"", chunk: int | None = None):
        self.status_code = code
        self._payload = payload
        self.closed = False

    def iter_content(self, chunk_size: int):
        for i in range(0, len(self._payload), chunk_size):
            yield self._payload[i : i + chunk_size]

    def close(self):
        self.closed = True


class _Session:
    """Scripted session: pops one response (or exception) per get()."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def get(self, url, stream=False, timeout=None):
        self.calls.append(url)
        item = self.script.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


def _fetcher(script, **kw):
    sleeps = []
    f = HttpFetcher(
        "https://example.org/base/",
        session=_Session(script),
        retries=2,
        backoff_sec=0.5,
        sleep=sleeps.append,
        **kw,
    )
    return f, sleeps


def test_fetch_joins_chunks_and_builds_url():
    payload = bytes(range(256)) * 10
    f, _ = _fetcher([_Resp(200, payload)], chunk_size=64)
    assert f.fetch("/dblp.xml.gz") == payload
    assert f.session.calls == ["https://example.org/base/dblp.xml.gz"]


def test_transient_5xx_retries_with_backoff_then_succeeds():
    f, sleeps = _fetcher([_Resp(503), ConnectionError("reset"), _Resp(200, b"ok")])
    assert f.fetch("a") == b"ok"
    assert sleeps == [0.5, 1.0]  # exponential backoff
    assert len(f.session.calls) == 3


def test_transient_exhaustion_raises():
    f, sleeps = _fetcher([_Resp(500), _Resp(502), _Resp(503)])
    with pytest.raises(TransientFetchError):
        f.fetch("a")
    assert len(sleeps) == 2  # retries=2


def test_permanent_4xx_raises_immediately():
    f, sleeps = _fetcher([_Resp(404)])
    with pytest.raises(PermanentFetchError):
        f.fetch("missing")
    assert sleeps == []  # no retry on permanent errors


def test_fetch_to_verifies_md5_and_is_atomic(tmp_path):
    payload = b"release-bytes" * 1000
    good = hashlib.md5(payload).hexdigest()
    f, _ = _fetcher([_Resp(200, payload)], chunk_size=128)
    out = tmp_path / "rel.xml.gz"
    assert f.fetch_to("rel.xml.gz", out, md5sum=good) == good
    assert out.read_bytes() == payload
    assert not list(tmp_path.glob("*.tmp"))

    f2, _ = _fetcher([_Resp(200, payload)])
    with pytest.raises(ValueError, match="md5 mismatch"):
        f2.fetch_to("rel.xml.gz", tmp_path / "bad.bin", md5sum="0" * 32)
    assert not (tmp_path / "bad.bin").exists()  # partial file removed
    assert not list(tmp_path.glob("*.tmp"))


class _MidStreamFailResp:
    """200 response whose body dies after `n_good` chunks — the
    mid-download connection drop."""

    def __init__(self, payload: bytes, n_good: int):
        self.status_code = 200
        self._payload = payload
        self._n_good = n_good
        self.closed = False

    def iter_content(self, chunk_size: int):
        sent = 0
        for i in range(0, len(self._payload), chunk_size):
            if sent == self._n_good:
                raise ConnectionError("reset mid-body")
            yield self._payload[i : i + chunk_size]
            sent += 1

    def close(self):
        self.closed = True


def test_fetch_restarts_from_byte_zero_on_midstream_failure():
    """A connection drop AFTER chunks were delivered must not leave
    the already-consumed prefix in the result: the retry restarts the
    buffer, so the payload comes back exact (the pre-r4 code re-yielded
    the full stream after the kept prefix -> duplicated-prefix bytes)."""
    payload = bytes(range(256)) * 8
    f, sleeps = _fetcher(
        [_MidStreamFailResp(payload, n_good=3), _Resp(200, payload)],
        chunk_size=64,
    )
    assert f.fetch("a") == payload  # exact, no duplicated prefix
    assert sleeps == [0.5]
    assert len(f.session.calls) == 2


def test_fetch_to_truncates_tmp_on_midstream_failure(tmp_path):
    payload = b"release-bytes" * 500
    good = hashlib.md5(payload).hexdigest()
    f, _ = _fetcher(
        [_MidStreamFailResp(payload, n_good=5), _Resp(200, payload)],
        chunk_size=128,
    )
    out = tmp_path / "rel.xml.gz"
    assert f.fetch_to("rel.xml.gz", out, md5sum=good) == good
    assert out.read_bytes() == payload
    assert not list(tmp_path.glob("*.tmp"))


def test_fetch_to_midstream_exhaustion_removes_tmp(tmp_path):
    payload = b"x" * 4096
    f, _ = _fetcher(
        [_MidStreamFailResp(payload, 1), _MidStreamFailResp(payload, 1),
         _MidStreamFailResp(payload, 1)],
        chunk_size=512,
    )
    with pytest.raises(TransientFetchError):
        f.fetch_to("a", tmp_path / "a.bin")
    assert not list(tmp_path.glob("*.tmp")) and not (tmp_path / "a.bin").exists()


def test_plugs_into_dblp_fetch_contract(tmp_path):
    # HttpFetcher.fetch satisfies the fetch(name)->bytes parameter of
    # pipelines/dblp.download_and_filter_release (interface check: the
    # callable shape, not the full pipeline — that runs on fixtures)
    f, _ = _fetcher([_Resp(200, b"x")])
    fetch = f.fetch
    assert callable(fetch) and fetch("n") == b"x"


def test_fetch_to_local_write_error_not_retried(tmp_path):
    """A tmp-file OSError (disk full, permissions) is a LOCAL failure:
    it must surface immediately and untouched, not be retried with
    backoff and rebranded TransientFetchError."""
    target = tmp_path / "no_such_dir" / "f.bin"  # parent doesn't exist
    f, sleeps = _fetcher([_Resp(200, b"abc"), _Resp(200, b"abc")])
    with pytest.raises(OSError) as ei:
        f.fetch_to("/x", str(target))
    assert not isinstance(ei.value, TransientFetchError)
    assert sleeps == []                      # zero retries, zero backoff
    assert len(f.session.calls) <= 1         # at most one network attempt
