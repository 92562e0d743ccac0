"""Text-analysis kernels for the training-data pipeline surface.

Language-ID (n-gram heuristic), quality scoring, token counting, and
rolling-hash document fingerprinting — all pure, deterministic, and
vectorized over pandas/numpy batches (the string kernels need pandas
str methods; the stage passes ``batch_format="pandas"``).

These are new surfaces relative to the reference (SURVEY.md §2 "beyond
the reference") but reuse its per-record transform shape
(FilterFunction, reference ``types.py:71``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# ASCII classes pinned EXPLICITLY (ADVICE r02): the SQL oracles run
# DuckDB/RE2 where \w = [0-9A-Za-z_] and \s = [\t\n\f\r ], while
# Python's re defaults to Unicode (\w matches é/汉, \s matches \x0b
# and U+00A0).  The kernels must tokenize identically on NON-ASCII
# text too, so the classes are spelled out rather than relying on a
# documents-are-ASCII invariant.
_WORD_RE = re.compile(r"[0-9A-Za-z_]+")
_ASCII_SPACE = "\t\n\f\r "  # RE2's \s

# Tiny per-language stopword profiles for the n-gram/stopword
# heuristic language ID — public-knowledge word lists.
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that was for on are with".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist nicht".split()),
    "fr": frozenset("le de la et les des en un une du est que pour dans".split()),
    "es": frozenset("de la que el en y a los del se las un por con".split()),
    "zh": frozenset(),  # handled by the CJK codepoint-ratio rule below
}


def token_counts(texts: pd.Series) -> pd.Series:
    """Whitespace token count = number of ``\\S+`` runs (matches SQL
    ``array_length(regexp_extract_all(text, '\\S+'))``).

    Edge cases aligned explicitly with the oracle (ADVICE r01): empty
    and whitespace-only text count 0 on both sides, and tabs/newlines
    are token separators on both sides (DuckDB ``trim()`` only strips
    spaces, so the previous trim+split formulation diverged on
    tab/newline-padded documents)."""
    return texts.str.count(rf"[^{_ASCII_SPACE}]+").astype("int64")


def bpe_ish_token_counts(texts: pd.Series) -> pd.Series:
    """Sub-word-ish token count: words + digits + punctuation runs via
    a GPT-2-style pre-tokenizer regex (public pattern family), ASCII
    classes pinned like _WORD_RE.  Not SQL-expressible — the driver
    oracle is an independent hand-rolled character scanner
    (pipelines/oracle_artifacts._naive_bpeish_count)."""
    pat = re.compile(rf"[0-9A-Za-z_]+|[^0-9A-Za-z_{_ASCII_SPACE}]+")
    return texts.map(lambda s: len(pat.findall(s))).astype("int64")


def _floor6(s) -> pd.Series:
    """Truncate to 6 decimals via floor(x*1e6)/1e6 — unlike round(),
    identical between numpy (banker's) and DuckDB (half-away) because
    there is no tie to break; both sides run the same IEEE double ops.
    (A ratio like 1/128 = 0.0078125 rounds differently under the two
    conventions — floor sidesteps the whole class.)"""
    return pd.Series(np.floor(np.asarray(s, dtype=np.float64) * 1e6) / 1e6)


def quality_scores(texts: pd.Series) -> pd.DataFrame:
    """Heuristic doc-quality features: length, punctuation ratio,
    stopword(en) ratio, mean word length.  Ratios are floor-truncated
    to 6 decimals (see _floor6) so the q14 SQL oracle hash-matches."""
    n_chars = texts.str.len().astype("int64")
    words = texts.str.lower().str.findall(_WORD_RE)
    n_words = words.str.len().clip(lower=1)
    stop = _LANG_PROFILES["en"]
    stop_ratio = words.map(lambda ws: sum(w in stop for w in ws)) / n_words
    punct = texts.str.count(rf"[^0-9A-Za-z_{_ASCII_SPACE}]").astype("int64")
    mean_wlen = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "punct_ratio": _floor6((punct / n_chars.clip(lower=1)).to_numpy()),
            "stop_ratio_en": _floor6(stop_ratio.to_numpy()),
            "mean_word_len": _floor6(mean_wlen.to_numpy()),
        }
    )


def lang_id(texts: pd.Series) -> pd.Series:
    """Heuristic language ID: CJK codepoint ratio → zh, else the
    stopword profile with the highest hit ratio, ties broken by fixed
    profile order (deterministic)."""

    def _one(s: str) -> str:
        if not s:
            return "und"
        cjk = sum(1 for ch in s if "一" <= ch <= "鿿")
        if cjk / max(1, len(s)) > 0.05:
            return "zh"
        words = [w.lower() for w in _WORD_RE.findall(s)]
        if not words:
            return "und"
        best, best_hits = "und", 0
        for lang in ("en", "de", "fr", "es"):
            hits = sum(w in _LANG_PROFILES[lang] for w in words)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    return texts.map(_one)


def fingerprint64(texts: pd.Series, window: int = 8) -> pd.Series:
    """Rolling polynomial hash fingerprint (Karp-Rabin family): the
    min of 64-bit window hashes over the token stream — a winnowing-
    style document fingerprint, stable under local edits outside the
    minimizing window."""
    B = np.uint64(1099511628211)  # FNV prime as the base

    def _one(s: str) -> int:
        toks = s.split()
        if not toks:
            return 0
        hs = np.fromiter(
            (hash64_str(t) for t in toks), dtype=np.uint64, count=len(toks)
        )
        if len(hs) <= window:
            acc = np.uint64(0)
            for h in hs:
                acc = acc * B + h
            return int(acc)
        # rolling windows vectorized via cumulative powers
        n = len(hs) - window + 1
        out = np.zeros(n, dtype=np.uint64)
        with np.errstate(over="ignore"):
            powers = np.power(B, np.arange(window, dtype=np.uint64))[::-1]
            for i in range(n):
                out[i] = (hs[i : i + window] * powers).sum(dtype=np.uint64)
        return int(out.min())

    return texts.map(_one).astype("uint64").astype("int64")


def hash64_str(s: str) -> np.uint64:
    """FNV-1a 64-bit of a UTF-8 string — pure-Python but only used
    per-token inside fingerprint64."""
    h = np.uint64(14695981039346656037)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for b in s.encode("utf-8"):
            h = (h ^ np.uint64(b)) * prime
    return h
