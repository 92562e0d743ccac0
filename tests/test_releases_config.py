"""Release-selection logic (S4/S5/S6) + config validation (F11/F12)
+ text-function properties."""

from __future__ import annotations

import pandas as pd
import pytest

from cs_insights_crawler_ray.config import IngestConfig
from cs_insights_crawler_ray.functions import text as T
from cs_insights_crawler_ray.sources.releases import (
    filter_release_artifacts,
    latest_release_file,
    stable_release_version,
)

LISTING = [
    "dblp-2024-03-01.xml.gz", "dblp-2024-03-01.xml.gz.md5", "dblp-2024-03-01.dtd",
    "dblp-2024-02-01.xml.gz", "dblp-2024-02-01.xml.gz.md5",
    "dblp-2023-12-01.xml.gz", "index.html", "logo.png",
]


def test_filter_and_nth_newest():
    arts = filter_release_artifacts(LISTING)
    assert "index.html" not in arts and "logo.png" not in arts
    assert arts[0].startswith("dblp-2024-03")          # desc order
    assert latest_release_file(LISTING, ".xml.gz") == "dblp-2024-03-01.xml.gz"
    assert latest_release_file(LISTING, ".xml.gz", skip=2) == "dblp-2024-02-01.xml.gz"
    with pytest.raises(ValueError):
        latest_release_file(LISTING, ".xml.gz", skip=9)


def test_stable_release_month_skip():
    # reference semantics: drop EVERYTHING in the newest month
    vs = ["2024-03-05", "2024-03-01", "2024-02-20", "2024-02-01"]
    assert stable_release_version(vs) == "2024-02-20"
    with pytest.raises(ValueError):
        stable_release_version(["2024-03-05", "2024-03-01"])
    with pytest.raises(ValueError):
        stable_release_version([])


def test_config_validation():
    IngestConfig(use_tables=("papers",), s2_filters=("DBLP", "ACL")).validate()
    with pytest.raises(NotImplementedError):
        IngestConfig(use_tables=("papers", "citations")).validate()
    with pytest.raises(NotImplementedError):
        IngestConfig(s2_filters=("MAG",)).validate()
    with pytest.raises(ValueError):
        IngestConfig(use_tables=("nonsense",)).validate()


def test_lang_id_heuristic():
    s = pd.Series(
        [
            "the cat and the dog are in the house with a hat",
            "der Hund und die Katze sind nicht in den Haus",
            "le chat et le chien sont dans la maison pour un jour",
            "el gato y el perro en la casa con los amigos",
            "这是一个中文句子 关于爬虫和数据处理的测试",
            "",
        ]
    )
    assert list(T.lang_id(s)) == ["en", "de", "fr", "es", "zh", "und"]


def test_fingerprint_stability_and_locality():
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    s = pd.Series([base, base, base.replace("kilo", "zulu")])
    fps = list(T.fingerprint64(s))
    assert fps[0] == fps[1]                  # deterministic
    # winnowing: an edit OUTSIDE the minimizing window often keeps the
    # fingerprint; at minimum the function stays deterministic and
    # int64-ranged
    assert all(-(2**63) <= f < 2**63 for f in fps)


def test_token_counts_edgecases():
    s = pd.Series(["a b  c", "  x ", "single"])
    assert list(T.token_counts(s)) == [3, 1, 1]
    assert list(T.bpe_ish_token_counts(pd.Series(["don't stop, now!"]))) == [7]  # don / ' / t / stop / , / now / !


def test_token_counts_empty_text_matches_duckdb():
    # n_tokens is defined as the number of \S+ runs on BOTH sides
    # (ADVICE r01: the previous trim+split formulation disagreed on
    # empty and on tab/newline-padded documents — DuckDB trim() only
    # strips spaces).
    import duckdb

    cases = ["", "   ", "\t\n", "one", " a  b ", "a\tb\nc"]
    ours = list(T.token_counts(pd.Series(cases)))
    duck = [
        r[0]
        for r in duckdb.sql(
            "SELECT coalesce(array_length(regexp_extract_all(s, '\\S+')), 0) "
            "FROM (SELECT unnest(?) AS s)", params=[cases]
        ).fetchall()
    ]
    assert ours == duck == [0, 0, 0, 1, 2, 3]


def test_repetition_filter_edges(ray_session, tmp_path):
    """q62 metric edge cases: repeated-bigram spam is dropped, empty
    and single-token docs keep integer semantics (top2=0)."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.textops import q62_repetition_filter

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "buy now " * 50,          # one bigram covers the stream
                "a unique stream of fresh tokens here",
                "",                        # empty: n=0, all ppm 0
                "single",                  # no bigram possible
            ],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = (
        q62_repetition_filter(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0, "keep"] == 0 and got.loc[0, "top2gram_ppm"] > 200_000
    assert got.loc[1, "keep"] == 1
    assert got.loc[2, "n_tokens"] == 0 and got.loc[2, "top2gram_ppm"] == 0
    assert got.loc[3, "top2gram_ppm"] == 0 and got.loc[3, "distinct_ppm"] == 1_000_000


def test_bigram_coverage_edges(ray_session, tmp_path):
    """q76: bigrams never cross document boundaries; empty and
    single-token docs score 0/0; coverage counts OCCURRENCES with
    multiplicity against the (count desc, gram asc) top-V vocabulary."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.textops import q76_bigram_coverage

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "a b a b a b",   # grams: 'a b' x3, 'b a' x2
                "c d",           # gram 'c d' x1
                "",              # no tokens
                "solo",          # one token, no bigram
                "b c",           # 'b c' x1 — would only exist if grams
                                  # crossed the doc-0/doc-1 boundary?
                                  # no: it's a real gram of THIS doc
            ],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = (
        q76_bigram_coverage(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # vocab (V=256) holds every distinct gram here, so coverage is
    # 100% wherever a bigram exists at all
    assert got.loc[0, "n_bigrams"] == 5 and got.loc[0, "n_in_vocab"] == 5
    assert got.loc[0, "coverage_ppm"] == 1_000_000
    assert got.loc[1, "n_bigrams"] == 1 and got.loc[1, "coverage_ppm"] == 1_000_000
    assert got.loc[2, "n_bigrams"] == 0 and got.loc[2, "coverage_ppm"] == 0
    assert got.loc[3, "n_bigrams"] == 0 and got.loc[3, "n_in_vocab"] == 0
    assert got.loc[4, "n_bigrams"] == 1


def test_bigram_coverage_vocab_boundary(ray_session, tmp_path):
    """q76 vocabulary cut: with more distinct grams than V the
    (count DESC, gram ASC) boundary picks deterministically — verified
    against a brute-force single-process recount."""
    from collections import Counter

    import pandas as pd

    from cs_insights_crawler_ray.pipelines import textops as TO

    old_v = TO.BIGRAM_VOCAB_V
    TO.BIGRAM_VOCAB_V = 3
    try:
        texts = [
            "x y x y x y",        # 'x y' x3, 'y x' x2
            "p q p q",            # 'p q' x2, 'q p' x1
            "m n",                # 'm n' x1
            "z w z w z w z w",    # 'z w' x4, 'w z' x3
        ]
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
            tmp_path / "documents.parquet"
        )
        got = (
            TO.q76_bigram_coverage(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # brute-force: global counts, top-3 by (count desc, gram asc)
        cnt = Counter()
        for t in texts:
            ws = t.split()
            cnt.update(" ".join(p) for p in zip(ws, ws[1:]))
        vocab = {
            g for g, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        }
        for i, t in enumerate(texts):
            ws = t.split()
            grams = [" ".join(p) for p in zip(ws, ws[1:])]
            n_in = sum(g in vocab for g in grams)
            assert got.loc[i, "n_in_vocab"] == n_in, (i, vocab)
            assert got.loc[i, "coverage_ppm"] == n_in * 1_000_000 // max(
                len(grams), 1
            )
    finally:
        TO.BIGRAM_VOCAB_V = old_v


def test_simpson_diversity_edges(ray_session, tmp_path):
    """q79: pure spam scores 1e6; an all-distinct doc scores 1e6/n;
    empty doc scores 0 with n=0."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.textops import q79_simpson_diversity

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["spam spam spam spam", "a b c d", ""],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = (
        q79_simpson_diversity(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0, "simpson_ppm"] == 1_000_000  # 16/16
    assert got.loc[1, "simpson_ppm"] == 250_000    # 4/16
    assert got.loc[2, "n_tokens"] == 0 and got.loc[2, "simpson_ppm"] == 0


def test_pmi_collocations_vs_bruteforce(ray_session, tmp_path):
    """q80: the distributed count + pigeonhole-bounded driver scoring
    equals a single-process big-int re-derivation, including the
    support prune and (pmi desc, gram asc) tie-break; bookkeeping
    sentinel rows never leak into the output."""
    from collections import Counter

    import pandas as pd

    from cs_insights_crawler_ray.pipelines import textops as TO

    texts = [
        "strong tea strong tea strong tea strong tea strong tea",
        "weak tea strong coffee weak tea strong coffee weak tea",
        "the the the the the the the the strong tea weak tea",
        "coffee strong coffee strong coffee strong coffee strong coffee",
    ]
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    got = TO.q80_pmi_collocations(str(tmp_path)).to_pandas()
    assert not got["gram"].str.startswith(" ").any()

    # brute force with Python ints
    bi, unic = Counter(), Counter()
    n_pairs = n_uni = 0
    for t in texts:
        ws = t.split()
        unic.update(ws)
        n_uni += len(ws)
        ps = [" ".join(p) for p in zip(ws, ws[1:])]
        bi.update(ps)
        n_pairs += len(ps)
    support = max(TO.PMI_MIN_COUNT, n_pairs * TO.PMI_SUPPORT_PPM // 1_000_000)
    rows = []
    for g, cxy in bi.items():
        if cxy < support:
            continue
        x, y = g.split(" ", 1)
        ppm = (cxy * n_uni * n_uni * 1_000_000) // (n_pairs * unic[x] * unic[y])
        rows.append((g, cxy, unic[x], unic[y], ppm))
    rows.sort(key=lambda r: (-r[4], r[0]))
    rows = rows[: TO.PMI_TOP_K]
    want = pd.DataFrame(rows, columns=["gram", "c_xy", "c_x", "c_y", "pmi_ppm"])
    assert len(got) == len(want)
    got = got.reset_index(drop=True)
    for c in want.columns:
        assert (got[c] == want[c]).all(), c
    # the support prune actually bit: some bigram exists below it
    assert any(c < support for c in bi.values())


def test_context_chunks_layout(ray_session, tmp_path):
    """q85: 130 tokens -> windows [0,64) [48,112) [96,130); a short doc
    is one whole chunk; an empty doc emits nothing; overlap regions
    repeat the same tokens."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines import textops as TO

    long_toks = [f"t{i}" for i in range(130)]
    texts = [" ".join(long_toks), "a b c", ""]
    pd.DataFrame({"doc_id": [0, 1, 2], "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    got = (
        TO.q85_context_chunks(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d0 = got[got["doc_id"] == 0]
    assert list(d0["n_tokens"]) == [64, 64, 34]
    assert d0.iloc[0]["chunk_text"].split() == long_toks[0:64]
    assert d0.iloc[1]["chunk_text"].split() == long_toks[48:112]
    assert d0.iloc[2]["chunk_text"].split() == long_toks[96:130]
    d1 = got[got["doc_id"] == 1]
    assert len(d1) == 1 and d1.iloc[0]["chunk_text"] == "a b c"
    assert (got["doc_id"] != 2).all()


def test_simpson_no_int64_wrap_huge_doc(ray_session, tmp_path):
    """q79: a 3.2M-token uniform doc has s2·1e6 > int64 max — the
    wide-int escape path must return exactly 1e6 ppm, not a wrapped
    negative (review finding; SQL mirror uses HUGEINT)."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines import textops as TO

    n = 3_200_000
    pd.DataFrame({"doc_id": [0], "text": ["x " * n]}).to_parquet(
        tmp_path / "documents.parquet"
    )
    got = TO.q79_simpson_diversity(str(tmp_path)).to_pandas()
    assert got.loc[0, "n_tokens"] == n
    assert got.loc[0, "simpson_ppm"] == 1_000_000


def test_mask_terms_hand_case(ray_session, tmp_path):
    """q89: exact-token masking on single-space splits — substring
    hits ('sparkly') stay, run-on spaces and empty docs round-trip
    unchanged, counts are per-document."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.textops import q89_mask_terms

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "spark hits customer twice customer",
                "sparkly is not spark-adjacent",
                "a  b",  # double space -> empty token survives rejoin
                "",
            ],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = (
        q89_mask_terms(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[0, "masked_text"] == "<mask> hits <mask> twice <mask>"
    assert got.loc[0, "n_masked"] == 3
    assert got.loc[1, "masked_text"] == "sparkly is not spark-adjacent"
    assert got.loc[1, "n_masked"] == 0
    assert got.loc[2, "masked_text"] == "a  b" and got.loc[2, "n_masked"] == 0
    assert got.loc[3, "masked_text"] == "" and got.loc[3, "n_masked"] == 0


def test_source_drift_hand_case(ray_session, tmp_path):
    """q92: corpus x=5,y=5 (N=10); src A (3,1) and B (1,3) each drift
    |3·10−5·4|+|1·10−5·4| = 20 → 20e6//(4·10) = 500000 ppm; src C's
    (1,1) mix matches the corpus exactly → 0 ppm."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.textops import q92_source_drift

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["x x x y", "x y y y", "x y"],
            "source": ["A", "B", "C"],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = (
        q92_source_drift(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["A", "drift_ppm"] == 500_000
    assert got.loc["B", "drift_ppm"] == 500_000
    assert got.loc["C", "drift_ppm"] == 0
    assert list(got["n_vocab_tokens"]) == [4, 4, 2]


def test_rule_hits_hand_case(ray_session, tmp_path):
    """q95: literal substring counts — multi-word phrases count, a
    doc with two occurrences counts once in n_docs / twice in n_hits,
    and a rule with zero corpus hits still emits its (rule, source)
    rows (the SQL cross-join shape)."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.textops import q95_rule_hits

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "customer saw customer data",   # 2 hits, 1 doc
                "the agg row path",             # multi-word phrase
                "sparkly",                      # substring hit: 'spark'
            ],
            "source": ["A", "A", "B"],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = (
        q95_rule_hits(str(tmp_path))
        .to_pandas()
        .set_index(["rule_id", "source"])
        .sort_index()
    )
    assert got.loc[("r_customer", "A"), "n_hits"] == 2
    assert got.loc[("r_customer", "A"), "n_docs"] == 1
    assert got.loc[("r_agg_row", "A"), "n_hits"] == 1
    assert got.loc[("r_spark", "B"), "n_hits"] == 1  # substring matches
    # zero-hit pairs exist with zeros (every rule × every source)
    assert got.loc[("r_window_table", "B"), "n_hits"] == 0
    assert len(got) == 8  # 4 rules × 2 sources


def test_filter_funnel_hand_case(ray_session, tmp_path):
    """q96: cumulative gates — a non-en doc dies at gate 1, a short
    doc at gate 2, a repetitive doc at gate 3, and of two identical
    gate-3 survivors only the smaller doc_id passes gate 4."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.textops import q96_filter_funnel

    good = " ".join(f"w{i}" for i in range(40))   # fully distinct, len fits
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                good,                    # survivor, wins dedup
                good,                    # exact dup, loses gate 4
                "tok " * 60,             # low diversity -> dies gate 3
                "short",                 # dies gate 2 (n_chars < 120)
                good,                    # non-en -> dies gate 1
            ],
            "lang": ["en", "en", "en", "en", "de"],
            "source": ["A", "A", "A", "B", "B"],
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    assert 120 <= len(good) <= 450
    docs.to_parquet(tmp_path / "documents.parquet")
    got = (
        q96_filter_funnel(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert got.loc["A"].tolist() == [3, 3, 3, 2, 1]   # total,lang,len,div,dedup
    assert got.loc["B"].tolist() == [2, 1, 0, 0, 0]


def test_ascii_tokens_matches_re2_not_unicode_split(ray_session, tmp_path):
    """The shared \\S+ tokenizer treats NBSP as a TOKEN character
    (RE2's ASCII \\s), unlike Python str.split() — the r04 review's
    divergence case, pinned via q79 whose oracle is regexp-based."""
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.textops import (
        _ascii_tokens, q79_simpson_diversity)

    s = pd.Series(["x x x", "a\x0bb c"])
    assert _ascii_tokens(s).tolist() == [["x x", "x"], ["a\x0bb", "c"]]
    pd.DataFrame({"doc_id": [0], "text": ["x x x"]}).to_parquet(
        tmp_path / "documents.parquet"
    )
    got = q79_simpson_diversity(str(tmp_path)).to_pandas()
    # 2 tokens ('x<NBSP>x', 'x'), both distinct: s2 = 1+1 = 2, n² = 4
    assert got.loc[0, "n_tokens"] == 2
    assert got.loc[0, "simpson_ppm"] == 500_000


def test_model_score_hand_case(ray_session, tmp_path):
    """q102: the actor-pool integer MLP equals a serial numpy
    re-derivation (incl. the ReLU clamp actually clamping)."""
    import numpy as np
    import pandas as pd

    from cs_insights_crawler_ray.pipelines.textops import (
        QM_W1, QM_W2, q102_model_score)

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["a b a", "", "x y z w"],
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")
    got = (
        q102_model_score(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    w1, w2 = np.array(QM_W1, np.int64), np.array(QM_W2, np.int64)
    feats = np.array([[3, 2, 5], [0, 0, 0], [4, 4, 7]], np.int64)
    want = np.maximum(feats @ w1, 0) @ w2
    assert got["quality_score"].tolist() == want.tolist()
    # the ReLU must actually bite somewhere in this hand case, or the
    # test would pass with a linear model too
    assert (feats @ w1 < 0).any()
