"""Text-analysis pipelines over the ``documents`` table.

Stateful pieces (compiled regexes, stopword profiles) live in callable
classes so each actor pays setup once (`__init__`), not per batch.
String kernels use pandas batches (Arrow→pandas conversion is the
cost of pandas' vectorized str methods; the columns involved are
small — text only — because the read prunes everything else).
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..functions import text as T


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def q13_token_stats(sf_dir: str) -> rd.Dataset:
    """Whitespace token count + non-space char count per document.
    SQL-oracled (string_split_regex)."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_tokens": T.token_counts(b["text"]),
                "n_chars_nospace": b["text"].str.replace(" ", "", regex=False).str.len().astype("int64"),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


class _QualityStage:
    """Actor-pool stage: regex/profile state compiled once per actor."""

    def __init__(self):
        # touch the module-level compiled patterns so import cost is
        # paid here, once per actor, not per batch
        self._profiles = T._LANG_PROFILES

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        out = T.quality_scores(b["text"])
        out.insert(0, "doc_id", b["doc_id"].to_numpy())
        return out


def q14_quality_scores(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _QualityStage, batch_format="pandas", concurrency=2
    )


class _LangIdStage:
    def __init__(self):
        self._profiles = T._LANG_PROFILES

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "lang_pred": T.lang_id(b["text"]), "lang_true": b["lang"]}
        )


def q19_lang_id(sf_dir: str) -> rd.Dataset:
    """Heuristic language ID vs the table's true label (rows-only
    oracle: the heuristic is not SQL-expressible)."""
    return _read_docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        _LangIdStage, batch_format="pandas", concurrency=2
    )


def q20_fingerprint(sf_dir: str) -> rd.Dataset:
    """Winnowing-style rolling-hash fingerprint per document
    (rows-only oracle)."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "fingerprint": T.fingerprint64(b["text"]),
                "n_bpeish_tokens": T.bpe_ish_token_counts(b["text"]),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")
