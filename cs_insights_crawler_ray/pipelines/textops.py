"""Text-analysis pipelines over the ``documents`` table.

Stateful pieces (compiled regexes, stopword profiles) live in callable
classes so each actor pays setup once (`__init__`), not per batch.
String kernels use pandas batches (Arrow→pandas conversion is the
cost of pandas' vectorized str methods; the columns involved are
small — text only — because the read prunes everything else).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions import text as T


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# RE2-\S runs with the ASCII \s class (functions/text._ASCII_SPACE) —
# the q13 oracle convention.  Python's str.split() also splits on
# UNICODE whitespace (NBSP, thin space, \v…), which silently diverges
# every '\\S+' SQL oracle the moment a fixture gains one such char
# (r04 review); ONE tokenizer for every \S+-convention kernel here.
_TOK_RE = rf"[^{T._ASCII_SPACE}]+"


def _ascii_tokens(texts: pd.Series) -> pd.Series:
    """Per-row token LISTS = RE2 ``\\S+`` runs (ASCII \\s)."""
    return texts.str.findall(_TOK_RE)


def _flat_distinct_counts(toks: pd.Series, n_rows: int) -> np.ndarray:
    """Distinct-token count per row via ONE flat explode +
    drop_duplicates C-path (the q79-family kernel) — callers must pass
    a RangeIndex'd token series (reset_index first)."""
    flat = toks.explode().dropna()
    if not len(flat):
        return np.zeros(n_rows, np.int64)
    dd = pd.DataFrame(
        {"i": flat.index.to_numpy(np.int64), "t": flat.to_numpy()}
    ).drop_duplicates()
    return np.bincount(dd["i"].to_numpy(np.int64), minlength=n_rows).astype(
        np.int64
    )


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


def _quality_batch(b: pd.DataFrame) -> pd.DataFrame:
    """Plain TASK fn (VERDICT r02 #4: a fixed 2-actor pool capped the
    stage at 2 cores regardless of cluster size).  The stage's only
    state is the module-level compiled regexes/profiles in
    functions/text.py — paid once per worker PROCESS at import, which
    is exactly the cached-task-fn pattern (stages/fetch.py)."""
    out = T.quality_scores(b["text"])
    out.insert(0, "doc_id", b["doc_id"].to_numpy())
    return out


def q14_quality_scores(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _quality_batch, batch_format="pandas"
    )


def _lang_id_batch(b: pd.DataFrame) -> pd.DataFrame:
    """Plain task fn — see _quality_batch."""
    return pd.DataFrame(
        {"doc_id": b["doc_id"], "lang_pred": T.lang_id(b["text"]), "lang_true": b["lang"]}
    )


def q19_lang_id(sf_dir: str) -> rd.Dataset:
    """Heuristic language ID vs the table's true label (SQL oracle
    transcribes the stopword-argmax + CJK rule in __ray_entry__)."""
    return _read_docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        _lang_id_batch, batch_format="pandas"
    )


def q20_fingerprint(sf_dir: str) -> rd.Dataset:
    """Winnowing-style rolling-hash fingerprint per document.
    Driver oracle: a pure-Python-int re-derivation of both columns
    written to parquet (oracle_artifacts 'naive_fingerprint') that the
    SQL side reads — full per-row value cross-check, superseding the
    q20p counter as the rows-only fallback."""
    from .oracle_artifacts import ensure

    ensure("naive_fingerprint", sf_dir)

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "fingerprint": T.fingerprint64(b["text"]),
                "n_bpeish_tokens": T.bpe_ish_token_counts(b["text"]),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# Parity counters: the numpy kernels vs independent pure-Python-int
# reimplementations, reduced to (n_docs, n_agree).  The SQL oracle
# asserts n_agree == n_docs == count(*), giving the driver a
# hash-checkable gate over sketches whose VALUES SQL cannot compute
# (catches uint64-wraparound / dtype bugs in the vectorized paths).
# ---------------------------------------------------------------------------
_M64 = 1 << 64


def _naive_fingerprint64(s: str, window: int = 8) -> int:
    """fingerprint64 re-derived with Python ints only (no numpy)."""
    toks = s.split()
    if not toks:
        return 0
    B = 1099511628211
    hs = []
    for t in toks:
        h = 14695981039346656037
        for byte in t.encode("utf-8"):
            h = ((h ^ byte) * B) % _M64
        hs.append(h)
    if len(hs) <= window:
        acc = 0
        for h in hs:
            acc = (acc * B + h) % _M64
        val = acc
    else:
        vals = []
        for i in range(len(hs) - window + 1):
            acc = 0
            for h in hs[i : i + window]:
                acc = (acc * B + h) % _M64
            vals.append(acc)
        val = min(vals)
    return val - _M64 if val >= 1 << 63 else val


def _naive_simhash64(s: str) -> int:
    """simhash64 re-derived with Python ints only."""
    import zlib

    toks = s.split()
    if not toks:
        return 0
    v = [0] * 64
    for t in toks:
        h = (zlib.crc32(t.encode()) * 0x9E3779B97F4A7C15) % _M64
        for bit in range(64):
            v[bit] += 1 if (h >> bit) & 1 else -1
    val = sum(1 << b for b in range(64) if v[b] > 0)
    return val - _M64 if val >= 1 << 63 else val


def _parity_query(sf_dir: str, kernel, naive) -> "pa.Table":
    import pyarrow as pa

    def f(b: pd.DataFrame) -> pd.DataFrame:
        got = kernel(b["text"]).to_numpy()
        want = np.array([naive(t) for t in b["text"]], dtype=np.int64)
        return pd.DataFrame(
            {"n_docs": [len(b)], "n_agree": [int((got == want).sum())]}
        )

    parts = (
        _read_docs(sf_dir, ["text"])
        .map_batches(f, batch_format="pandas")
        .to_pandas()
    )
    return pa.table(
        {
            "n_docs": pa.array([int(parts["n_docs"].sum())], pa.int64()),
            "n_agree": pa.array([int(parts["n_agree"].sum())], pa.int64()),
        }
    )


def q20p_fingerprint_parity(sf_dir: str) -> "pa.Table":
    return _parity_query(sf_dir, T.fingerprint64, _naive_fingerprint64)


def q22p_simhash_parity(sf_dir: str) -> "pa.Table":
    from ..pipelines.dedup import simhash64

    def kernel(texts: pd.Series) -> pd.Series:
        return pd.Series([simhash64(t) for t in texts], dtype="int64")

    return _parity_query(sf_dir, kernel, _naive_simhash64)


# ---------------------------------------------------------------------------
# q62 — repetition quality gate (the Gopher/MassiveText family of
# repetition rules, Rae et al. 2021 §A1.1): per document the fraction
# of the token stream covered by its most frequent 2-gram and the
# distinct-token ratio, in integer parts-per-million so the SQL
# oracle replays every division exactly; keep = not repetition-heavy.
# One vectorized-batch pass, no shuffle — the reference has no
# quality filtering at all (its only gate is the md5 cache).
# ---------------------------------------------------------------------------
TOP2_PPM_MAX = 200_000   # >20% of tokens inside one repeated bigram -> drop
DISTINCT_PPM_MIN = 300_000  # <30% distinct tokens -> drop


def q62_repetition_filter(sf_dir: str) -> rd.Dataset:
    def metrics(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        toks = _ascii_tokens(b["text"])
        n = toks.str.len().to_numpy(dtype=np.int64)
        nd = _flat_distinct_counts(toks, len(b))
        # vectorized per-doc max-bigram count: flat bigrams from the
        # shared q76 kernel, ONE pandas groupby (no per-doc Counter)
        grams, valid, lens = _batch_bigrams(b["text"], toks=toks)
        top2 = np.zeros(len(b), dtype=np.int64)
        if grams is not None:
            doc = np.repeat(np.arange(len(b)), lens)[:-1]
            dfg = pd.DataFrame(
                {"i": doc[valid], "g": grams.to_numpy()[valid]}
            )
            if len(dfg):
                c = dfg.groupby(["i", "g"], sort=False).size()
                mx = c.groupby(level=0).max()
                top2[mx.index.to_numpy()] = mx.to_numpy()
        # a bigram seen once is not repetition — without this, any doc
        # shorter than 10 tokens trips the 20% gate on its first bigram
        top2 = np.where(top2 >= 2, top2, 0)
        n1 = np.maximum(n, 1)
        top2_ppm = (top2 * 2 * 1_000_000) // n1
        distinct_ppm = (nd * 1_000_000) // n1
        keep = (
            (top2_ppm <= TOP2_PPM_MAX) & (distinct_ppm >= DISTINCT_PPM_MIN)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_tokens": n,
                "distinct_ppm": distinct_ppm,
                "top2gram_ppm": top2_ppm,
                "keep": keep,
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(metrics, batch_format="pandas")


# ---------------------------------------------------------------------------
# q72: winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS) — the
# LOCAL fingerprinting counterpart to q20's single global minimum:
# each doc emits the distinct set of window-selected gram hashes, so
# any shared run of >= k + w - 1 tokens is guaranteed a shared
# fingerprint.  Zero-shuffle: one map_batches pass; the oracle is a
# pure-Python-int sequential re-derivation written to parquet
# (oracle_artifacts._build_winnow) that SQL reads back verbatim.
# ---------------------------------------------------------------------------
WINNOW_K = 4  # tokens per gram
WINNOW_W = 4  # gram hashes per selection window


def _naive_winnow(s: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    """winnow_select re-derived with Python ints only (no numpy):
    the independent spec both the kernel parity test and the oracle
    artifact rest on."""
    toks = s.split()
    if not toks:
        return []
    B = 1099511628211
    hs = []
    for t in toks:
        h = 14695981039346656037
        for byte in t.encode("utf-8"):
            h = ((h ^ byte) * B) % _M64
        hs.append(h)

    def fold(seq: list[int]) -> int:
        acc = 0
        for h in seq:
            acc = (acc * B + h) % _M64
        return acc

    if len(hs) < k:
        vals = [fold(hs)]
    else:
        grams = [fold(hs[i : i + k]) for i in range(len(hs) - k + 1)]
        if len(grams) <= w:
            windows = [grams]
            offs = [0]
        else:
            windows = [grams[i : i + w] for i in range(len(grams) - w + 1)]
            offs = list(range(len(grams) - w + 1))
        sel = set()
        for off, win in zip(offs, windows):
            m = min(win)
            # rightmost occurrence of the minimum
            pos = off + max(i for i, v in enumerate(win) if v == m)
            sel.add(pos)
        vals = sorted({grams[p] for p in sel})
    return [v - _M64 if v >= 1 << 63 else v for v in vals]


def q72_winnowing(sf_dir: str) -> rd.Dataset:
    """Distinct winnowing fingerprints per document ->
    (doc_id, fp).  One shuffle-free pass; ~2/(w+1) of gram positions
    select, so output is a bounded fraction of the token stream."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        rows, fps = T.winnow_select(b["text"], WINNOW_K, WINNOW_W)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy().astype(np.int64)[rows],
                "fp": fps,
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# q74: canonical text normalization — the pass every training corpus
# runs before tokenization/dedup.  Both sides perform the IDENTICAL
# operation chain on ASCII-pinned classes (lower -> drop
# non-[0-9a-z]/whitespace -> collapse whitespace runs -> trim), so
# the normalized STRING itself is the compared value, not a proxy
# stat.  Non-ASCII input would be stripped by the class on both
# sides; the repo's oracle-identity rule (CLAUDE.md) is why the
# classes are spelled out rather than using \\W / \\s shorthands
# whose Python-vs-RE2 semantics diverge off ASCII.
# ---------------------------------------------------------------------------
_NORM_DROP = r"[^0-9a-z \t\n\r\f\v]+"
_NORM_WS = r"[ \t\n\r\f\v]+"


def q74_normalize(sf_dir: str) -> rd.Dataset:
    """(doc_id, norm_text, n_chars_norm, n_tokens_norm) — one
    shuffle-free vectorized pass."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        norm = (
            b["text"]
            .str.lower()
            .str.replace(_NORM_DROP, "", regex=True)
            .str.replace(_NORM_WS, " ", regex=True)
            .str.strip(" ")
        )
        # whitespace is already collapsed to single spaces and
        # stripped, so tokens = spaces+1 (0 for the empty string) —
        # fully vectorized, no per-row split+lambda (review finding)
        n_tok = np.where(
            norm.str.len().to_numpy() > 0,
            norm.str.count(" ").to_numpy() + 1,
            0,
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "norm_text": norm,
                "n_chars_norm": norm.str.len().astype("int64"),
                "n_tokens_norm": n_tok.astype("int64"),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# q76 — statistical-LM familiarity score (the CCNet/KenLM "score every
# document against a corpus language model" quality gate, integerized
# so SQL replays it exactly): pass 1 builds the corpus top-V common-
# bigram vocabulary (count DESC, gram ASC — deterministic at the
# boundary), pass 2 scores each document by the fraction of its
# bigram OCCURRENCES that fall inside the vocabulary, in ppm.
#
# Scale shape: per-block bigram partials -> the crc32-partitioned
# string grouped sum (mlprep._term_grouped_sum, vocab-scale rows only)
# -> per-block top-V safe prune (each gram appears ONCE after the
# grouped sum, so the global top-V is a subset of the union of
# per-block top-Vs) -> bounded driver merge (n_blocks × V rows) ->
# one frozen-set broadcast -> ONE shuffle-free scoring pass whose
# kernels are flat-array builds + C-path isin + bincount, no per-doc
# Python.  Document text never shuffles.
# ---------------------------------------------------------------------------
BIGRAM_VOCAB_V = 256


def _batch_bigrams(texts: pd.Series, toks: pd.Series | None = None):
    """(flat bigram strings, validity mask, per-doc lens) for a batch:
    tokens flattened once; bigram i pairs flat[i] with flat[i+1] and is
    valid iff both sit in the same document."""
    if toks is None:
        toks = _ascii_tokens(texts)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total < 2:
        return None, None, lens
    flat = toks.explode().dropna().astype(str).to_numpy()
    valid = np.ones(total - 1, dtype=bool)
    ends = np.cumsum(lens)[:-1] - 1  # last token of each non-final doc
    valid[ends[ends >= 0]] = False
    grams = pd.Series(flat[:-1]).str.cat(pd.Series(flat[1:]), sep=" ")
    return grams, valid, lens


def q76_bigram_coverage(sf_dir: str) -> rd.Dataset:
    import ray

    from ..functions.broadcast import bget
    from .mlprep import _term_grouped_sum

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def bigram_block(b: pd.DataFrame) -> pd.DataFrame:
        grams, valid, _ = _batch_bigrams(b["text"])
        if grams is None:
            return pd.DataFrame(
                {"term": pd.Series([], dtype=str),
                 "cnt": pd.Series([], dtype=np.int64)}
            )
        c = grams[valid].value_counts()
        return pd.DataFrame(
            {"term": c.index.astype(str), "cnt": c.to_numpy().astype(np.int64)}
        )

    merged = _term_grouped_sum(
        docs.map_batches(bigram_block, batch_format="pandas"), "cnt"
    ).materialize()

    def topv(b: pd.DataFrame) -> pd.DataFrame:
        return _topv_cut(b, BIGRAM_VOCAB_V)

    cand = merged.map_batches(topv, batch_format="pandas").to_pandas()
    vocab = frozenset(_topv_cut(cand, BIGRAM_VOCAB_V)["term"])
    vref = ray.put(vocab)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        grams, valid, lens = _batch_bigrams(b["text"])
        n_bi = np.maximum(lens - 1, 0)
        n_in = np.zeros(len(b), dtype=np.int64)
        if grams is not None:
            hit = (grams.isin(bget(vref)).to_numpy() & valid).astype(np.int64)
            doc_idx = np.repeat(np.arange(len(b)), lens)[: len(hit)]
            n_in = np.bincount(doc_idx, weights=hit, minlength=len(b)).astype(
                np.int64
            )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_bigrams": n_bi,
                "n_in_vocab": n_in,
                "coverage_ppm": n_in * 1_000_000 // np.maximum(n_bi, 1),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# q79 — Simpson concentration index per document (Σ c_i² / n² over
# token counts, in ppm): the lexical-diversity quality signal beside
# q62's repetition gates — spammy low-entropy docs score high, varied
# prose scores near 1e6/vocab.  All-integer, one shuffle-free pass;
# the per-doc count-square sums run through ONE pandas C-path
# groupby over the flattened (doc, token) pairs, no per-doc Python.
# ---------------------------------------------------------------------------
def q79_simpson_diversity(sf_dir: str) -> rd.Dataset:
    def f(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        toks = _ascii_tokens(b["text"])
        n = toks.str.len().to_numpy(dtype=np.int64)
        s2 = np.zeros(len(b), dtype=np.int64)
        flat = toks.explode().dropna()
        if len(flat):
            pairs = pd.DataFrame(
                {"i": flat.index.to_numpy(), "t": flat.to_numpy()}
            )
            c = pairs.groupby(["i", "t"], sort=False).size()
            sq = (c * c).groupby(level=0).sum()
            s2[sq.index.to_numpy()] = sq.to_numpy()
        den = np.maximum(n * n, 1)
        with np.errstate(over="ignore"):
            ppm = s2 * 1_000_000 // den
        # s2·1e6 exceeds int64 for docs beyond ~3.03M tokens (s2 ≤ n²)
        # — recompute those rows in Python ints (the SQL mirror uses
        # HUGEINT), so no silent wrap at any document size
        big = s2 > (2**63 - 1) // 1_000_000
        if big.any():
            ppm[big] = np.array(
                [int(a) * 1_000_000 // int(d) for a, d in zip(s2[big], den[big])],
                dtype=np.int64,
            )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_tokens": n,
                "simpson_ppm": ppm,
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# q80 — PMI collocation mining: the corpus-analytics "which word pairs
# co-occur far more than chance" operator (Church & Hanks 1990),
# integerized.  score = p(xy) / (p(x)·p(y)) as the exact rational
# (c_xy · N_uni²) / (N_pairs · c_x · c_y), emitted in ppm via
# arbitrary-precision Python-int floor division so no intermediate
# overflows at any corpus size (SQL mirrors it in HUGEINT).
#
# Scale shape: the support prune IS the scale story — candidates must
# hold ≥ SUPPORT_PPM of all bigram occurrences, so BY PIGEONHOLE at
# most 1e6/SUPPORT_PPM bigrams qualify at ANY corpus size; the driver
# scores a provably bounded set.  Counts come from the same
# crc32-partitioned string grouped sums as q49/q58/q76; the unigram
# pass counts ONLY terms appearing in candidate pairs (the q71
# query-vocab-only trick) via one frozen-set broadcast.
# ---------------------------------------------------------------------------
PMI_SUPPORT_PPM = 100   # candidate bigrams hold >=100 ppm of pair mass
PMI_MIN_COUNT = 5       # absolute floor so tiny corpora don't pass noise
PMI_TOP_K = 50


def q80_pmi_collocations(sf_dir: str) -> "pa.Table":
    import pyarrow as pa
    import ray

    from ..functions.broadcast import bget
    from .mlprep import _term_grouped_sum

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    # -- pass 1: bigram counts + per-block pair/token totals ---------
    def bigram_block(b: pd.DataFrame) -> pd.DataFrame:
        grams, valid, lens = _batch_bigrams(b["text"])
        n_tok = int(lens.sum())
        if grams is None:
            c = pd.Series(dtype=np.int64)
            n_pairs = 0
        else:
            c = grams[valid].value_counts()
            n_pairs = int(valid.sum())
        out = pd.DataFrame(
            {"term": c.index.astype(str), "cnt": c.to_numpy().astype(np.int64)}
        )
        # bookkeeping rows: a leading space cannot collide with real
        # grams ("x y" with nonempty whitespace-free tokens never
        # starts with a space).  NOT a NUL sentinel: pandas 2.2's
        # object hashtable collapses strings at the NUL byte, so
        # "\\x00p" and "\\x00u" groupby-merge into one key (observed).
        book = pd.DataFrame({"term": [" p", " u"], "cnt": [n_pairs, n_tok]})
        return pd.concat([out, book], ignore_index=True)

    merged = _term_grouped_sum(
        docs.map_batches(bigram_block, batch_format="pandas"), "cnt"
    ).materialize()

    totals = merged.map_batches(
        lambda b: b[b["term"].isin([" p", " u"])],
        batch_format="pandas",
    ).to_pandas()  # <= 2 rows
    n_pairs = int(totals.loc[totals["term"] == " p", "cnt"].sum())
    n_uni = int(totals.loc[totals["term"] == " u", "cnt"].sum())
    if n_pairs == 0:
        return pa.table(
            {c: pa.array([], pa.int64() if c != "gram" else pa.string())
             for c in ("gram", "c_xy", "c_x", "c_y", "pmi_ppm")}
        )
    support = max(PMI_MIN_COUNT, n_pairs * PMI_SUPPORT_PPM // 1_000_000)

    # bounded by pigeonhole: <= n_pairs/support <= 1e6/SUPPORT_PPM rows
    cand = merged.map_batches(
        lambda b: b[(b["cnt"] >= support) & ~b["term"].str.startswith(" ")],
        batch_format="pandas",
    ).to_pandas()

    # -- pass 2: unigram counts for candidate terms only --------------
    terms = frozenset(
        t for g in cand["term"] for t in g.split(" ", 1)
    )
    tref = ray.put(terms)

    def uni_block(b: pd.DataFrame) -> pd.DataFrame:
        tset = bget(tref)
        flat = _ascii_tokens(b["text"]).explode().dropna()
        c = flat[flat.isin(tset)].value_counts()
        return pd.DataFrame(
            {"term": c.index.astype(str), "cnt": c.to_numpy().astype(np.int64)}
        )

    uni = _term_grouped_sum(
        docs.map_batches(uni_block, batch_format="pandas"), "cnt"
    ).to_pandas()  # bounded: <= 2 x |cand| rows
    ucnt = dict(zip(uni["term"], uni["cnt"].astype(int)))

    # -- driver scoring over the bounded candidate set (exact ints) ---
    rows = []
    for g, cxy in zip(cand["term"], cand["cnt"].astype(int)):
        x, y = g.split(" ", 1)
        cx, cy = ucnt[x], ucnt[y]
        ppm = (cxy * n_uni * n_uni * 1_000_000) // (n_pairs * cx * cy)
        rows.append((g, cxy, cx, cy, ppm))
    rows.sort(key=lambda r: (-r[4], r[0]))
    rows = rows[:PMI_TOP_K]
    return pa.table(
        {
            "gram": pa.array([r[0] for r in rows], pa.string()),
            "c_xy": pa.array([r[1] for r in rows], pa.int64()),
            "c_x": pa.array([r[2] for r in rows], pa.int64()),
            "c_y": pa.array([r[3] for r in rows], pa.int64()),
            "pmi_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q85 — context-window chunking: split each document's token stream
# into fixed windows of CHUNK_W tokens with CHUNK_S-token stride
# (overlap = W − S), the RAG-/pretraining-shaped "document → model
# context windows" explode.  Chunk count per doc is the closed form
# m = 1 + ceil(max(0, n − W)/S) (0 when empty), so the SQL oracle
# replays the exact layout with generate_series + 1-based inclusive
# list slices.
#
# Scale shape: shuffle-free flat_map — one vectorized pass builds
# every chunk boundary with numpy index arithmetic (repeat/cumsum
# gather over the flattened token array, no per-doc Python); the only
# per-chunk Python is the unavoidable final `" ".join` (pandas groupby
# agg).  Output grows by the overlap factor (≤ W/S ≈ 1.33×), never
# materialized — it streams straight to the consumer.
# ---------------------------------------------------------------------------
CHUNK_W = 64   # tokens per chunk
CHUNK_S = 48   # stride (overlap = 16)


def q85_context_chunks(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk_batch, batch_format="pandas"
    )


def chunk_batch(b: pd.DataFrame) -> pd.DataFrame:
    """q85's vectorized window-chunk kernel, module-level so the RAG
    composition (retrieval.q106_rag_context) reuses the identical
    layout on its retrieved subset."""
    toks = _ascii_tokens(b["text"])
    lens = toks.str.len().to_numpy(np.int64)
    m = np.where(
        lens == 0,
        0,
        1 + (np.maximum(lens - CHUNK_W, 0) + CHUNK_S - 1) // CHUNK_S,
    )
    total = int(m.sum())
    if total == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype=np.int64),
                "chunk_id": pd.Series(dtype=np.int64),
                "n_tokens": pd.Series(dtype=np.int64),
                "chunk_text": pd.Series(dtype=object),
            }
        )
    doc_idx = np.repeat(np.arange(len(b)), m)
    first = np.concatenate([[0], np.cumsum(m)[:-1]])
    ci = np.arange(total) - np.repeat(first, m)          # chunk no. in doc
    start = ci * CHUNK_S
    end = np.minimum(start + CHUNK_W, lens[doc_idx])
    # gather token indices for every chunk in one flat array
    flat = toks.explode().dropna().to_numpy()            # all tokens
    doc_off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    gs, clen = doc_off[doc_idx] + start, (end - start).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(clen)[:-1]])
    idx = np.repeat(gs, clen) + (np.arange(int(clen.sum())) - np.repeat(cs, clen))
    texts = (
        pd.Series(flat[idx])
        .groupby(np.repeat(np.arange(total), clen))
        .agg(" ".join)
    )
    return pd.DataFrame(
        {
            "doc_id": b["doc_id"].to_numpy()[doc_idx],
            "chunk_id": ci.astype(np.int64),
            "n_tokens": clen,
            "chunk_text": texts.to_numpy(),
        }
    )


# ---------------------------------------------------------------------------
# q89 — denylist token masking: the scrub pass a training corpus runs
# to blind specific vocabulary (PII surrogates, toxic terms, eval
# markers) before the text ships to tokenization — each denylisted
# token is replaced by a literal mask marker and the redaction count
# reported per document.  Both sides perform the IDENTICAL operation:
# split on single spaces, exact-match tokens against the fixed list,
# rejoin with single spaces — the masked STRING itself transits the
# compare (q74's oracle-identity discipline), so there is no regex
# whose Python-vs-RE2 semantics could diverge.
#
# Scale shape: one shuffle-free stateless pass; the per-batch kernel
# is the q79 flat-array pattern (explode once, vectorized isin +
# bincount, ONE pandas C-path groupby-join back) — no per-row Python.
# ---------------------------------------------------------------------------
MASK_TERMS = ("customer", "spark", "vector")
MASK_TOKEN = "<mask>"


def q89_mask_terms(sf_dir: str) -> rd.Dataset:
    deny = frozenset(MASK_TERMS)

    def f(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        # split(" ") — NOT split() — so empty strings and run-on
        # spaces produce the exact token list DuckDB's
        # string_split(text, ' ') does (('' stays a token))
        flat = b["text"].str.split(" ").explode()
        idx = flat.index.to_numpy(np.int64)
        vals = flat.to_numpy(dtype=object)
        hit = flat.isin(deny).to_numpy()
        n_masked = np.bincount(idx[hit], minlength=len(b)).astype(np.int64)
        vals[hit] = MASK_TOKEN
        joined = pd.Series(vals, index=idx).groupby(level=0).agg(" ".join)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy().astype(np.int64),
                "masked_text": joined.to_numpy(dtype=object),
                "n_masked": n_masked,
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# q92 — source-mix drift audit: per-source L1 distance (in ppm)
# between the source's token distribution and the whole corpus's,
# over the corpus top-V vocabulary — the "did source X shift away
# from the mix we trained on" monitor a multi-source ingestion
# pipeline runs per batch.  drift(s) = Σ_t |c_{s,t}/N_s − c_t/N|
# computed EXACTLY as Σ_t |c_{s,t}·N − c_t·N_s| · 1e6 // (N_s·N) in
# arbitrary-precision Python ints (the SQL mirror uses HUGEINT —
# the q80 discipline), restricted to vocab tokens on both sides.
#
# Scale shape: ONE corpus scan emits per-block (term, source) partial
# counts into a crc32(term) exchange (a term's rows co-locate, so the
# per-partition top-V-by-term-total prune is exact — terms never
# straddle partitions); only the pruned candidates — bounded at
# n_parts × V × sources by pigeonhole (sources are registries: tens,
# not millions) — reach the driver, which takes the global top-V and
# scores sources × V cells.  For a source-heavy corpus the same
# exchange re-keys on (term, source) unchanged; only the prune bound
# widens.
# ---------------------------------------------------------------------------
DRIFT_VOCAB_V = 64


def _topv_cut(df: pd.DataFrame, v: int) -> pd.DataFrame:
    """The ONE (cnt DESC, term ASC) fully-tie-broken top-V cut shared
    by q76's vocab and q92's prune + driver recut (the SQL mirrors it
    verbatim as ORDER BY c DESC, t LIMIT V)."""
    return df.sort_values(
        ["cnt", "term"], ascending=[False, True], kind="mergesort"
    ).head(v)


def q92_source_drift(sf_dir: str) -> "pa.Table":
    import pyarrow as pa

    from .mlprep import _crc_part32

    docs = _read_docs(sf_dir, ["doc_id", "text", "source"])

    def st_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        flat = _ascii_tokens(b["text"]).explode().dropna()
        src = b["source"].to_numpy()[flat.index.to_numpy(np.int64)]
        g = (
            pd.DataFrame({"term": flat.to_numpy(), "source": src})
            .groupby(["term", "source"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        g["_part"] = _crc_part32(g["term"])
        return g

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        st = g.groupby(["term", "source"], as_index=False)["cnt"].sum()
        keep = _topv_cut(st.groupby("term", as_index=False)["cnt"].sum(),
                         DRIFT_VOCAB_V)["term"]
        return st[st["term"].isin(set(keep))]

    cand = (
        docs.map_batches(st_partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(prune, batch_format="pandas")
        .to_pandas()  # BOUNDED: n_parts × V × sources candidate rows
    )
    tot = cand.groupby("term", as_index=False)["cnt"].sum()
    vocab = set(_topv_cut(tot, DRIFT_VOCAB_V)["term"])
    st = cand[cand["term"].isin(vocab)]
    ct = {t: int(c) for t, c in st.groupby("term")["cnt"].sum().items()}
    ns = {s: int(c) for s, c in st.groupby("source")["cnt"].sum().items()}
    big_n = sum(ns.values())
    per_src: dict[str, dict[str, int]] = {}
    for t, s, c in st[["term", "source", "cnt"]].itertuples(index=False):
        per_src.setdefault(s, {})[t] = int(c)
    srcs = sorted(ns)
    drift = []
    for s in srcs:
        n_s = ns[s]
        d = per_src[s]
        num = sum(
            abs(d.get(t, 0) * big_n - c * n_s) for t, c in ct.items()
        )
        drift.append(num * 1_000_000 // (n_s * big_n))
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_vocab_tokens": pa.array([ns[s] for s in srcs], pa.int64()),
            "drift_ppm": pa.array(drift, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q95 — rule-table content audit: count, per (rule, source), how many
# documents contain each audited phrase and how many total occurrences
# — the policy/PII/eval-marker surface scan a curation pipeline runs
# before deciding what to scrub (q89 is the scrub itself; this is the
# read-side report that sizes it).  Matching is LITERAL SUBSTRING
# (multi-word phrases included), counted non-overlapping left-to-right
# — the identical operation DuckDB's
# (length(text) − length(replace(text, term, ''))) // length(term)
# computes, so no regex whose Python-vs-RE2 semantics could diverge.
#
# Scale shape: the rule table is a fixed registry (tens of rows) —
# module-level compiled patterns, zero broadcast; one shuffle-free
# stateless pass emits per-block (rule × block-sources) partials
# (zeros included, so every pair the SQL cross join yields exists on
# this side too); the driver folds n_blocks × rules × sources rows.
# ---------------------------------------------------------------------------
AUDIT_RULES = (
    ("r_customer", "customer"),
    ("r_spark", "spark"),
    ("r_agg_row", "agg row"),
    ("r_window_table", "window table"),
)
# compiled once per worker process at import (cached-task-fn pattern);
# re.escape => literal matching, and Python's non-overlapping
# left-to-right count equals DuckDB's replace()-delta count exactly
_AUDIT_PATS = tuple(
    (rid, term, re.compile(re.escape(term))) for rid, term in AUDIT_RULES
)


def q95_rule_hits(sf_dir: str) -> "pa.Table":
    import pyarrow as pa

    def part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        outs = []
        for rid, term, pat in _AUDIT_PATS:
            hits = b["text"].str.count(pat).to_numpy(np.int64)
            g = (
                pd.DataFrame(
                    {
                        "source": b["source"].to_numpy(),
                        "n_docs": (hits > 0).astype(np.int64),
                        "n_hits": hits,
                    }
                )
                .groupby("source", as_index=False)
                .sum()
            )
            g.insert(0, "rule_id", rid)
            g.insert(1, "term", term)
            outs.append(g)
        return pd.concat(outs, ignore_index=True)

    parts = (
        _read_docs(sf_dir, ["text", "source"])
        .map_batches(part, batch_format="pandas")
        .to_pandas()  # BOUNDED: n_blocks × rules × sources partial rows
    )
    out = parts.groupby(["rule_id", "term", "source"], as_index=False)[
        ["n_docs", "n_hits"]
    ].sum()
    return pa.table(
        {
            "rule_id": pa.array(out["rule_id"].astype(str), pa.string()),
            "term": pa.array(out["term"].astype(str), pa.string()),
            "source": pa.array(out["source"].astype(str), pa.string()),
            "n_docs": pa.array(out["n_docs"].to_numpy(np.int64), pa.int64()),
            "n_hits": pa.array(out["n_hits"].to_numpy(np.int64), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q96 — curation filter funnel: the per-source survival report of the
# standard gate chain (language → length band → lexical diversity →
# exact dedup among survivors), cumulative — the "where does each
# source's volume die" dashboard every corpus-curation run produces
# before committing a mix.  Gate 4 keeps the MIN doc_id of each
# md5(text) group among gate-3 survivors (q10/q93's content-identity
# convention), so the funnel is a pure function of the data.
#
# Scale shape: gates 1–3 are vectorized in ONE stateless pass (flat
# explode + bincount for the distinct-token ratio — the q79 kernel);
# gate 4 needs content-hash co-location, so per-doc gate rows enter
# the shared crc32(h) 32-way exchange where the min-doc_id-per-hash
# decision is partition-local; only n_parts × sources cumulative
# partials reach the driver fold.  Text never shuffles (only the
# 32-char hash + 4 booleans per doc).
# ---------------------------------------------------------------------------
FUNNEL_LEN_LO, FUNNEL_LEN_HI = 120, 450
FUNNEL_DIV_PPM = 400_000


def q96_filter_funnel(sf_dir: str) -> "pa.Table":
    import hashlib

    import pyarrow as pa

    from .mlprep import _crc_part32

    def per_doc(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        g1 = (b["lang"] == "en").to_numpy()
        nc = b["n_chars"].to_numpy(np.int64)
        g2 = g1 & (nc >= FUNNEL_LEN_LO) & (nc <= FUNNEL_LEN_HI)
        # \S+-run tokens (q13's convention): distinct/total in ppm
        flat = _ascii_tokens(b["text"]).explode().dropna()
        idx = flat.index.to_numpy(np.int64)
        nt = np.bincount(idx, minlength=len(b)).astype(np.int64)
        dd = pd.DataFrame({"i": idx, "t": flat.to_numpy()}).drop_duplicates()
        ndist = np.bincount(
            dd["i"].to_numpy(np.int64), minlength=len(b)
        ).astype(np.int64)
        ppm = ndist * 1_000_000 // np.maximum(nt, 1)
        g3 = g2 & (nt > 0) & (ppm >= FUNNEL_DIV_PPM)
        out = pd.DataFrame(
            {
                "h": [
                    hashlib.md5(s.encode("utf-8")).hexdigest()
                    for s in b["text"]
                ],
                "source": b["source"].to_numpy(),
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "g1": g1,
                "g2": g2,
                "g3": g3,
            }
        )
        out["_part"] = _crc_part32(out["h"])
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # winner per hash among gate-3 survivors = min doc_id; cast to
        # nullable Int64 BEFORE the left merge — merging an int64
        # column with misses would upcast through float64 (rounding
        # doc_ids past 2^53) and only then land in Int64 (r04 review)
        w = (
            g[g["g3"]]
            .sort_values(["h", "doc_id"], kind="mergesort")
            .drop_duplicates("h")[["h", "doc_id"]]
            .rename(columns={"doc_id": "w"})
        )
        w["w"] = w["w"].astype("Int64")
        gm = g.merge(w, on="h", how="left")
        g4 = gm["g3"] & (gm["doc_id"] == gm["w"]).fillna(False)
        gm = gm.assign(g4=g4.to_numpy(dtype=bool), one=1)
        agg = gm.groupby("source", as_index=False)[
            ["one", "g1", "g2", "g3", "g4"]
        ].sum()
        return agg

    parts = (
        _read_docs(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"])
        .map_batches(per_doc, batch_format="pandas")
        .groupby("_part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # BOUNDED: n_parts × sources partial rows
    )
    out = parts.groupby("source", as_index=False)[
        ["one", "g1", "g2", "g3", "g4"]
    ].sum()
    return pa.table(
        {
            "source": pa.array(out["source"].astype(str), pa.string()),
            "n_total": pa.array(out["one"].to_numpy(np.int64), pa.int64()),
            "pass_lang": pa.array(out["g1"].to_numpy(np.int64), pa.int64()),
            "pass_len": pa.array(out["g2"].to_numpy(np.int64), pa.int64()),
            "pass_div": pa.array(out["g3"].to_numpy(np.int64), pa.int64()),
            "pass_dedup": pa.array(out["g4"].to_numpy(np.int64), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q102 — batched model inference as an ACTOR POOL: the "score every
# document with a trained quality classifier" stage every curation
# pipeline runs (FineWeb-Edu / DCLM classifier filtering).  The model
# here is a deterministic integer 2-layer MLP (ReLU) over three exact
# features (tokens, distinct tokens, chars) so the SQL oracle replays
# the inference bit-exactly — the POINT is the execution shape, which
# is the one a real (non-replayable) model needs:
#
#   map_batches(QualityModel, concurrency=N) — a callable CLASS, so
#   the weight build ("model load") runs ONCE per actor in __init__,
#   never per batch; __call__ scores each batch vectorized.
#
# Scale shape: embarrassingly parallel, shuffle-free; `concurrency`
# sizes the pool to the cluster and Ray streams blocks through it
# with backpressure.  Weights are module constants — the single
# source of truth the oracle SQL interpolates from, so engine and
# oracle cannot drift.
# ---------------------------------------------------------------------------
QM_W1 = (  # (3 features x 4 hidden) small ints, fixed
    (3, -2, 5, 1),
    (-4, 7, -1, 2),
    (1, 1, -3, 6),
)
QM_W2 = (5, -3, 2, 7)  # (4 hidden x 1)


class QualityModel:
    """Actor-pool inference stage: weights built once per actor."""

    def __init__(self) -> None:
        self.w1 = np.array(QM_W1, dtype=np.int64)  # "model load"
        self.w2 = np.array(QM_W2, dtype=np.int64)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        toks = _ascii_tokens(b["text"])
        f1 = toks.str.len().to_numpy(dtype=np.int64)
        f2 = _flat_distinct_counts(toks, len(b))
        f3 = b["n_chars"].to_numpy(np.int64)
        f = np.stack([f1, f2, f3], axis=1)  # (n, 3) int64
        h = np.maximum(f @ self.w1, 0)      # ReLU, exact ints
        score = h @ self.w2
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "quality_score": score,
            }
        )


def q102_model_score(sf_dir: str) -> rd.Dataset:
    # autoscaling pool capped BELOW the session CPUs: a fixed pool
    # equal to num_cpus deadlocks small sessions (the pool reserves
    # every CPU and the upstream read task can never schedule —
    # CLAUDE.md actor-pool rule, observed live with concurrency=4 on
    # the 4-CPU pytest session).  cluster_resources() only AFTER the
    # is_initialized guard: it raises without a live session, and this
    # callable must lazily auto-init like every other queries() entry
    # (r04 review).
    import ray

    docs = _read_docs(sf_dir, ["doc_id", "text", "n_chars"])
    if not ray.is_initialized():
        # an uninitialized session's eventual CPU count is unknowable
        # here — guessing 4 and building a pinned pool deadlocks if the
        # lazy auto-init lands on 1 CPU (r04 ADVICE).  The cached-task
        # form is safe at every session size; weights are 28 ints.
        return docs.map_batches(QualityModel(), batch_format="pandas")
    cpus = int(ray.cluster_resources().get("CPU", 4))
    if cpus < 2:
        # a 1-CPU session cannot host a pool at all (even ONE pinned
        # actor starves the read) — degrade to the cached-task form,
        # same math, weights shipped per task (they are 28 ints)
        return docs.map_batches(QualityModel(), batch_format="pandas")
    return docs.map_batches(
        QualityModel,
        batch_format="pandas",
        concurrency=(1, min(8, cpus - 1)),
    )
