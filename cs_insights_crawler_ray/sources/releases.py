"""Release discovery — the driver-side control logic that picks which
snapshot to ingest (runs before any pipeline is built).

Reference semantics preserved exactly:

- S5/S6 (``dblpclient.py:384-409``): release artifact listing filtered
  by suffix, sorted descending (names embed dates so lexicographic ==
  chronological), nth-newest pick.
- S4 (``s2client.py:159-173``): "stable release" selection — sort
  descending, DROP every release sharing the newest YYYY-MM prefix
  (the in-progress month), take the newest of the remainder.

No network in the sandbox: callers pass the listing (the driver-side
HTTP GET + HTML link-scrape of the reference is a trivial shell around
these pure functions).
"""

from __future__ import annotations

RELEASE_SUFFIXES = (".md5", ".gz", ".dtd")


def filter_release_artifacts(listing: list[str],
                             suffixes: tuple[str, ...] = RELEASE_SUFFIXES,
                             desc: bool = True) -> list[str]:
    """S5: keep hrefs with a release suffix, sorted (desc by default)."""
    out = [u for u in listing if u.endswith(suffixes)]
    return sorted(out, reverse=desc)


def latest_release_file(listing: list[str], extension: str, skip: int = 1) -> str:
    """S6 (dblpclient.py:401-409): the nth-newest artifact with the
    given extension (skip=1 -> newest, matching the reference's
    generator-`next` counting)."""
    matches = (u for u in filter_release_artifacts(listing) if u.endswith(extension))
    for i, u in enumerate(matches, start=1):
        if i == skip:
            return u
    raise ValueError(f"fewer than {skip} releases with {extension!r}")


def stable_release_version(versions: list[str]) -> str:
    """S4 (s2client.py:159-173): newest version NOT in the newest
    month. Versions are 'YYYY-MM-DD' strings; the newest month is
    considered in-progress and skipped entirely."""
    if not versions:
        raise ValueError("empty release list")
    ordered = sorted(versions, reverse=True)
    latest_prefix = "-".join(ordered[0].split("-")[:2])
    for v in ordered:
        if not v.startswith(latest_prefix):
            return v
    # reference behavior: if every release is in the newest month the
    # loop falls through — surface that as an explicit error
    raise ValueError("no stable release outside the newest month")
