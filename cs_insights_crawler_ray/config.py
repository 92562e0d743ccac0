"""Engine configuration + validation (F11/F12).

The reference drives pipeline construction from 18 click options
(``process.py:24-153``) and hard-raises NotImplementedError for
declared-but-unsupported features (``s2client.py:18-22,123-126``,
``s2processor.py:25,130-134``).  Same surface here: a dataclass the
CLI fills, validated at build time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# features the reference declares but does not support in v1 — we keep
# the same guard surface (F12)
UNSUPPORTED_S2_FEATURES = ("citations", "embeddings_s2", "tldrs")
SUPPORTED_S2_TABLES = ("papers", "abstracts", "authors")
SUPPORTED_S2_FILTERS = ("ACL", "DBLP", "ArXiv", "PubMed", "PubMedCentral")


@dataclass
class IngestConfig:
    cache_dir: str = "~/.cache/ray-crawl"
    use_tables: tuple = ("papers", "abstracts", "authors")
    s2_filters: tuple = ("DBLP",)
    out_dir: str | None = None
    verbose: bool = False

    def validate(self) -> "IngestConfig":
        for t in self.use_tables:
            if t in UNSUPPORTED_S2_FEATURES:
                raise NotImplementedError(
                    f"s2 feature {t!r} is declared but not supported "
                    "(reference parity: s2client.py:123-126)"
                )
            if t not in SUPPORTED_S2_TABLES:
                raise ValueError(f"unknown table {t!r}")
        for f in self.s2_filters:
            if f not in SUPPORTED_S2_FILTERS:
                raise NotImplementedError(
                    f"source filter {f!r} not supported "
                    "(reference parity: s2processor.py:130-134)"
                )
        return self
