"""requests-backed transport implementing the ``fetch(name) -> bytes``
contract the pipelines consume (``pipelines/dblp.download_and_filter_release``
takes any such callable; the crawl fixtures implement the same shape
over the deterministic content store).

Reference semantics re-expressed (NOT copied):
- chunked streaming download, 1 MiB chunks (s2client.py:25-47 uses
  1 MiB; dblpclient.py:72-88 uses 1 KiB — we default to the larger,
  it is strictly better for release-sized files),
- retry with exponential backoff on transient failures (5xx /
  connection errors).  The reference has NO retry (SURVEY.md §4
  "Retries: none" — it dies on the first failed GET); a 100 TB crawl
  cannot, so transient-vs-permanent classification is explicit here:
  4xx raise immediately (permanent), 5xx/connection errors back off
  and retry.

The sandbox has no network, so the HTTP session is INJECTED (any
object with ``get(url, stream=..., timeout=...)`` returning a
response with ``status_code``/``iter_content``/``close``); production
passes ``requests.Session()`` — the import is deferred so the module
works (and is contract-tested) without the library installed.
"""

from __future__ import annotations

import hashlib
import os
import time
from pathlib import Path

DEFAULT_CHUNK = 1 << 20  # 1 MiB, reference s2client.py:26


class PermanentFetchError(Exception):
    """4xx — retrying cannot help."""


class TransientFetchError(Exception):
    """5xx / connection failure — retried up to `retries` times."""


class _LocalWriteError(Exception):
    """Internal marker: the tmp-file open/write failed (disk full,
    permissions).  NOT a network failure — _with_retries re-raises the
    original OSError immediately instead of retrying+rebranding it."""

    def __init__(self, original: OSError):
        super().__init__(str(original))
        self.original = original


class HttpFetcher:
    def __init__(
        self,
        base_url: str,
        session=None,
        chunk_size: int = DEFAULT_CHUNK,
        retries: int = 3,
        backoff_sec: float = 0.5,
        timeout_sec: float = 60.0,
        sleep=time.sleep,
    ):
        if session is None:  # pragma: no cover - network-blocked sandbox
            import requests

            session = requests.Session()
        self.base_url = base_url.rstrip("/")
        self.session = session
        self.chunk_size = chunk_size
        self.retries = retries
        self.backoff_sec = backoff_sec
        self.timeout_sec = timeout_sec
        self._sleep = sleep

    # -- the fetch(name) -> bytes contract ---------------------------
    def fetch(self, name: str) -> bytes:
        # retry wraps the WHOLE attempt, not the chunk iterator: a
        # connection drop mid-body restarts the buffer from byte 0, so
        # a retried stream can never deliver a duplicated prefix
        return self._with_retries(name, lambda: b"".join(self._stream_once(name)))

    def fetch_to(self, name: str, path: str | Path, md5sum: str | None = None) -> str:
        """Chunked download to disk with optional md5 verification
        (the S7 cached-download shape: the caller owns cache-hit
        logic; this owns transport + integrity)."""
        path = Path(path)
        # unique per process+object: two workers fetching the same
        # target must not truncate each other's partial tmp file (the
        # later rename is last-wins over COMPLETE, verified downloads)
        tmp = path.with_suffix(
            path.suffix + f".tmp.{os.getpid()}.{id(self):x}"
        )

        def attempt() -> "hashlib._Hash":
            h = hashlib.md5()
            # "wb" truncates: a mid-body retry restarts the tmp file
            # from byte 0 (appending to the partial write corrupted
            # the payload and was only caught when md5sum was given).
            # File-side OSErrors are marked so the retry loop re-raises
            # them untouched — only the network stream is retryable.
            try:
                f = open(tmp, "wb")
            except OSError as e:
                raise _LocalWriteError(e) from e
            streamed = False
            try:
                for chunk in self._stream_once(name):
                    try:
                        f.write(chunk)
                    except OSError as e:
                        raise _LocalWriteError(e) from e
                    h.update(chunk)
                streamed = True
            finally:
                # close() FLUSHES buffered chunks — a disk-full error
                # surfaces here, not at write(); unmarked it would be
                # retried 3x against a full disk and rebranded
                # TransientFetchError.  Wrapped HERE (not a blanket
                # except around the loop: requests' network errors
                # subclass OSError too and must stay retryable); if the
                # stream itself raised, the close error is swallowed so
                # the ORIGINAL error propagates.
                try:
                    f.close()
                except OSError as e:
                    if streamed:
                        raise _LocalWriteError(e) from e
            return h

        try:
            h = self._with_retries(name, attempt)
        except Exception:
            tmp.unlink(missing_ok=True)
            raise
        if md5sum is not None and h.hexdigest() != md5sum:
            tmp.unlink()
            raise ValueError(
                f"md5 mismatch for {name}: got {h.hexdigest()}, want {md5sum}"
            )
        tmp.replace(path)
        return h.hexdigest()

    # -- transport ----------------------------------------------------
    def _url(self, name: str) -> str:
        return f"{self.base_url}/{name.lstrip('/')}"

    def _stream_once(self, name: str):
        """ONE streaming GET — no retry here; consumers that can reset
        their output (fetch's buffer, fetch_to's tmp file) retry the
        whole attempt via ``_with_retries``."""
        resp = self.session.get(self._url(name), stream=True, timeout=self.timeout_sec)
        code = int(resp.status_code)
        if 400 <= code < 500:
            resp.close()
            raise PermanentFetchError(f"{code} for {self._url(name)}")
        if code >= 500:
            resp.close()
            raise TransientFetchError(f"{code} for {self._url(name)}")
        try:
            yield from resp.iter_content(chunk_size=self.chunk_size)
        finally:
            resp.close()

    def _with_retries(self, name: str, attempt):
        n = 0
        while True:
            try:
                return attempt()
            except _LocalWriteError as e:
                raise e.original
            except (TransientFetchError, ConnectionError, OSError) as e:
                n += 1
                if n > self.retries:
                    raise TransientFetchError(
                        f"{self._url(name)} failed after {self.retries} retries: {e}"
                    ) from e
                self._sleep(self.backoff_sec * (2 ** (n - 1)))
