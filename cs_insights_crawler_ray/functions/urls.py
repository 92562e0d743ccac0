"""URL canonicalization + hashing kernels.

The reference joins URLs with ``urllib.parse.urljoin`` and caches
downloads keyed by URL (reference ``s2client.py:132,150,161``,
``dblpclient.py:340-350``); it never canonicalizes because it is fully
sequential and fetches a fixed listing.  The crawl engine's seen-set
and politeness layers need a canonical form + stable hashes
(BASELINE.json north_rule: "RFC 3986 normalize + SHA-1 host/path
hash").

All kernels here are pure and deterministic.  ``canonicalize_batch``
is the vectorized entry point used from ``map_batches``
(batch_format="pyarrow").
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit, urlunsplit, unquote, quote

import numpy as np
import pyarrow as pa

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}

# RFC 3986 §2.3 unreserved characters that must not stay percent-encoded.
_SAFE = "-._~"


def canonicalize_url(url: str) -> str:
    """RFC 3986 normalization of one URL.

    - lowercase scheme and host
    - drop default ports (:80 http, :443 https)
    - remove dot-segments in the path
    - decode percent-encoded unreserved chars, re-encode the rest
      uppercase
    - drop fragment; keep query
    - empty path -> "/"

    Idempotent: ``canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)``
    (property-tested in tests/test_urls.py).
    """
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme in _DEFAULT_PORTS and netloc.endswith(_DEFAULT_PORTS[scheme]):
        netloc = netloc[: -len(_DEFAULT_PORTS[scheme])]
    path = _remove_dot_segments(parts.path) or "/"
    path = quote(unquote(path), safe="/" + _SAFE)
    query = quote(unquote(parts.query), safe="=&" + _SAFE) if parts.query else ""
    return urlunsplit((scheme, netloc, path, query, ""))


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
        elif seg != ".":
            out.append(seg)
    cleaned = "/".join(out)
    if path.startswith("/") and not cleaned.startswith("/"):
        cleaned = "/" + cleaned
    return cleaned


def url_sha1(canon: str) -> bytes:
    """20-byte SHA-1 of the canonical URL — the dedup key."""
    return hashlib.sha1(canon.encode("utf-8")).digest()


def host_of(canon: str) -> str:
    return urlsplit(canon).netloc


def path_query_of(canon: str) -> str:
    """Path(+query) of a canonical URL — the robots-check input.
    The previous idiom ``canon.split(host, 1)[1]`` raised
    ValueError('empty separator') on a hostless canonical (a
    schemeless user seed) and mis-split whenever the host string also
    occurred earlier in the URL."""
    s = urlsplit(canon)
    return s.path + (f"?{s.query}" if s.query else "")


def host_hash64(host: str) -> int:
    """uint64 from the first 8 bytes of SHA-1(host) — the politeness /
    seen-shard partition key (stable across processes, unlike
    ``hash()``)."""
    return int.from_bytes(hashlib.sha1(host.encode("utf-8")).digest()[:8], "big")


def resolve_link(base: str, href: str) -> str:
    """C7 (reference ``s2client.py:132,150,161``: urljoin for release/
    dataset URLs): resolve a possibly-relative href against its page
    URL and canonicalize.  Handles absolute URLs, protocol-relative
    (//host/p), root-relative (/p), and relative (p, ../p) forms."""
    from urllib.parse import urljoin

    return canonicalize_url(urljoin(base, href))


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Stateless map_batches kernel: add url_canon, url_sha1, host,
    host_hash columns.

    Python-level per-row work is unavoidable for full RFC 3986
    handling (urlsplit is not available as an Arrow kernel), but all
    hashing is done over a single pass and columns are built once as
    Arrow arrays — no pandas round-trip, zero-copy in/out otherwise.
    """
    urls = batch[url_col].to_pylist()
    canon = [canonicalize_url(u) for u in urls]
    sha = [hashlib.sha1(c.encode("utf-8")).digest() for c in canon]
    hosts = [urlsplit(c).netloc for c in canon]
    hh = np.fromiter(
        (int.from_bytes(hashlib.sha1(h.encode("utf-8")).digest()[:8], "big") for h in hosts),
        dtype=np.uint64,
        count=len(hosts),
    )
    return (
        batch.append_column("url_canon", pa.array(canon, pa.string()))
        .append_column("url_sha1", pa.array(sha, pa.binary(20)))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("host_hash", pa.array(hh, pa.uint64()))
    )
