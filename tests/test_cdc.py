"""Content-defined chunking (q73) kernel properties.

The value-level compare (vectorized closed-form kernel vs the
pure-Python sequential rolling loop) runs via test_relational.py's
parametrized gate over the cdc_seq artifact; these tests pin the
chunk invariants and the re-synchronization property that makes CDC
worth its cost over fixed-size blocking."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cs_insights_crawler_ray.pipelines.cdc import (
    CDC_MAX,
    CDC_MIN,
    _naive_cdc_chunks,
    batch_cdc_chunks,
)


def _kernel_chunks(texts: list[str]) -> list[list[tuple[int, int, int]]]:
    rows, ords, fps, lens = batch_cdc_chunks(pd.Series(texts))
    out: list[list[tuple[int, int, int]]] = [[] for _ in texts]
    for r, o, f, ln in zip(rows, ords, fps, lens):
        out[int(r)].append((int(o), int(f), int(ln)))
    return out


EDGES = [
    "",
    "x",
    "a" * (CDC_MIN - 1),  # shorter than one min chunk
    "b" * CDC_MIN,
    "c" * (CDC_MAX + 3),  # forces a max-size cut
    "word soup " * 40,
]


def test_cdc_kernel_matches_naive_on_edges():
    got = _kernel_chunks(EDGES)
    for text, chunks in zip(EDGES, got):
        assert chunks == _naive_cdc_chunks(text), repr(text)


def test_cdc_kernel_matches_naive_random():
    rng = np.random.Generator(np.random.PCG64(13))
    vocab = ["w%d" % i for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(0, 200, size=50)
    ]
    got = _kernel_chunks(texts)
    for text, chunks in zip(texts, got):
        assert chunks == _naive_cdc_chunks(text)


def test_cdc_chunk_invariants():
    rng = np.random.Generator(np.random.PCG64(17))
    text = " ".join(
        "t%d" % v for v in rng.integers(0, 50, size=400)
    )
    chunks = _kernel_chunks([text])[0]
    total = sum(ln for _, _, ln in chunks)
    assert total == len(text.encode())
    for o, _, ln in chunks[:-1]:
        assert CDC_MIN <= ln <= CDC_MAX
    assert chunks[-1][2] <= CDC_MAX  # tail may undershoot MIN only


def test_cdc_resynchronizes_after_prefix_shift():
    """Prepend a prefix to a long shared body: boundaries re-sync
    within bounded bytes, so the two docs share duplicate chunks —
    the property fixed-size blocking lacks."""
    rng = np.random.Generator(np.random.PCG64(19))
    body = " ".join("s%d" % v for v in rng.integers(0, 50, size=500))
    a, b = body, "totally different prefix material here " + body
    ca, cb = _kernel_chunks([a, b])
    shared = {f for _, f, _ in ca} & {f for _, f, _ in cb}
    assert len(shared) >= len(ca) // 2, (len(shared), len(ca))
