"""Winnowing fingerprint (q72) kernel properties.

The value-level oracle compare (vectorized kernel vs the pure-Python
sequential artifact) runs via test_relational.py's parametrized gate;
these tests pin the edge semantics and the detection guarantee."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cs_insights_crawler_ray.functions.text import winnow_select
from cs_insights_crawler_ray.pipelines.textops import (
    WINNOW_K,
    WINNOW_W,
    _naive_winnow,
)


def _kernel_fps(texts: list[str]) -> list[set[int]]:
    rows, fps = winnow_select(pd.Series(texts), WINNOW_K, WINNOW_W)
    out: list[set[int]] = [set() for _ in texts]
    for r, f in zip(rows, fps):
        out[int(r)].add(int(f))
    return out


EDGE_TEXTS = [
    "",  # no tokens -> no fingerprints
    "one",  # 1 token < k -> whole-doc fold
    "a b c",  # k-1 tokens -> whole-doc fold
    "a b c d",  # exactly k tokens -> 1 gram, truncated window
    "a b c d e f g",  # ng == w -> one window over all grams
    "a b c d e f g h",  # ng == w+1 -> two windows
    "x x x x x x x x x x x x",  # all ties -> rightmost-min rule
    "the quick brown fox jumps over the lazy dog again and again",
]


def test_winnow_kernel_matches_naive_on_edges():
    got = _kernel_fps(EDGE_TEXTS)
    for text, fps in zip(EDGE_TEXTS, got):
        assert fps == set(_naive_winnow(text)), repr(text)


def test_winnow_kernel_matches_naive_random():
    rng = np.random.Generator(np.random.PCG64(7))
    vocab = ["w%d" % i for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(0, 120, size=60)
    ]
    got = _kernel_fps(texts)
    for text, fps in zip(texts, got):
        assert fps == set(_naive_winnow(text))


def test_winnow_detection_guarantee():
    """Any shared run of >= k + w - 1 tokens must yield a shared
    fingerprint (the winnowing paper's correctness property)."""
    rng = np.random.Generator(np.random.PCG64(11))
    shared = " ".join("s%d" % i for i in range(WINNOW_K + WINNOW_W - 1))
    for trial in range(20):
        pre_a = " ".join("a%d_%d" % (trial, i) for i in range(rng.integers(0, 15)))
        pre_b = " ".join("b%d_%d" % (trial, i) for i in range(rng.integers(0, 15)))
        post_a = " ".join("c%d_%d" % (trial, i) for i in range(rng.integers(0, 15)))
        post_b = " ".join("d%d_%d" % (trial, i) for i in range(rng.integers(0, 15)))
        doc_a = " ".join(x for x in (pre_a, shared, post_a) if x)
        doc_b = " ".join(x for x in (pre_b, shared, post_b) if x)
        fa, fb = _kernel_fps([doc_a, doc_b])
        assert fa & fb, (doc_a, doc_b)


def test_winnow_batch_split_invariant():
    """Per-doc fingerprints are independent of batch composition."""
    texts = EDGE_TEXTS * 3
    whole = _kernel_fps(texts)
    per_doc = [_kernel_fps([t])[0] for t in texts]
    assert whole == per_doc


def test_normalize_edge_semantics():
    """q74 kernel edges: punctuation-only -> empty string, 0 tokens;
    mixed whitespace collapses; already-clean text unchanged."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines import textops

    b = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["!!! ??? ...", "  a\t\tb\nc  ", "clean text", ""],
        }
    )
    norm = (
        b["text"]
        .str.lower()
        .str.replace(textops._NORM_DROP, "", regex=True)
        .str.replace(textops._NORM_WS, " ", regex=True)
        .str.strip(" ")
    )
    assert norm.tolist() == ["", "a b c", "clean text", ""]
