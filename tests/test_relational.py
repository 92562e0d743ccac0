"""Mimics the driver's correctness gate: run each queries() entry and
its oracle_sql() on the same parquet tables, compare row count, schema
(column names) and order-insensitive values."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entrymod

import os
SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
# point the payload-parquet oracles (q32/q39) at this sf's crawl cache
# BEFORE oracle_sql() is first called below
os.environ["GRAFT_ORACLE_SF"] = Path(SF_DIR).name
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _to_pdf(res) -> pd.DataFrame:
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # pyarrow.Table


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_match(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame):
    assert len(ray_df) == len(ora_df), f"{name}: rows {len(ray_df)} != {len(ora_df)}"
    assert sorted(ray_df.columns) == sorted(ora_df.columns), (
        f"{name}: cols {sorted(ray_df.columns)} != {sorted(ora_df.columns)}"
    )
    a, b = _normalize(ray_df), _normalize(ora_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            assert np.allclose(
                av.astype(float).fillna(-1e18), bv.astype(float).fillna(-1e18),
                rtol=1e-9, atol=1e-9,
            ), f"{name}: float col {c} mismatch"
        else:
            assert (av.fillna("~N~") == bv.fillna("~N~")).all(), f"{name}: col {c} mismatch"


SQL_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name):
    q = entrymod.queries()[name]
    ray_df = _to_pdf(q(SF_DIR))
    ora_df = _oracle(entrymod.oracle_sql()[name])
    assert_match(name, ray_df, ora_df)


# queries with an adaptive broadcast-vs-join threshold: zeroing the
# limit forces the hash-join (100 TB) path, which must produce the
# identical oracle-matching result
ADAPTIVE_JOIN_QUERIES = [
    "q05_semi_join",
    "q06_exploded_semi_join",
    "q07_outer_merge",
    "q08_sort_rank",
    "q21_revenue_by_nation",
    "q43_revenue_by_region",
]


@pytest.mark.parametrize("name", ADAPTIVE_JOIN_QUERIES)
def test_adaptive_join_path_matches_oracle(name, monkeypatch):
    from cs_insights_crawler_ray.pipelines import relational as R

    monkeypatch.setattr(R, "BROADCAST_KEY_LIMIT", 0)
    monkeypatch.setattr(R, "BLOOM_JOIN_LIMIT", 0)  # plain hash-join tier
    ray_df = _to_pdf(entrymod.queries()[name](SF_DIR))
    ora_df = _oracle(entrymod.oracle_sql()[name])
    assert_match(name, ray_df, ora_df)


def test_q05_bloom_tier_matches_oracle_and_prunes(monkeypatch):
    # middle tier: bloom prefilter + exact semi-join on survivors
    from cs_insights_crawler_ray.pipelines import relational as R

    monkeypatch.setattr(R, "BROADCAST_KEY_LIMIT", 0)
    survivors = []
    orig = R._bloom_semi_filter

    def spy(fact, keys_ds, fact_col, key_col, n_keys):
        out = orig(fact, keys_ds, fact_col, key_col, n_keys).materialize()
        survivors.append(out.count())
        return out

    monkeypatch.setattr(R, "_bloom_semi_filter", spy)
    ray_df = _to_pdf(R.q05_semi_join(SF_DIR))
    ora_df = _oracle(entrymod.oracle_sql()["q05_semi_join"])
    assert_match("q05_bloom", ray_df, ora_df)
    n_fact = _oracle("SELECT count(*) AS n FROM lineitem")["n"][0]
    # the prefilter must actually prune shuffle volume, and must keep
    # at least every true match (no false negatives)
    assert survivors == [len(ray_df)] or (
        len(ray_df) <= survivors[0] < n_fact
    ), (survivors, len(ray_df), n_fact)


def test_bloom_filter_kernels():
    from cs_insights_crawler_ray.pipelines import relational as R

    rng = np.random.default_rng(5)
    keys = rng.choice(2**40, size=50_000, replace=False).astype(np.int64)
    m = len(keys) * R._BLOOM_BITS_PER_KEY
    mask = R._bloom_partial(keys, m)
    # zero false negatives
    assert R._bloom_contains(mask, m, keys).all()
    # false-positive rate near the 10-bit/key design point (~0.8%)
    probe = rng.choice(2**40, size=50_000, replace=False).astype(np.int64) + 2**41
    fp = R._bloom_contains(mask, m, probe).mean()
    assert fp < 0.03, fp
    # distributed build (OR of partials) == one-shot build
    halves = np.array_split(keys, 3)
    merged = np.zeros_like(mask)
    for h in halves:
        merged |= R._bloom_partial(h, m)
    assert np.array_equal(merged, mask)


def test_rows_only_queries_run():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    for name in qs:
        if name in sqls:
            continue
        df = _to_pdf(qs[name](SF_DIR))
        assert df is not None
        assert len(df.columns) > 0, name


def test_q29_tied_signup_timestamp(tmp_path):
    # ADVICE r01: a signup sharing its timestamp with another event of
    # the same user must be visible to that event (oracle semantics:
    # s.ts <= e.ts).  The fixture events table has no (user_id, ts)
    # duplicates, so force the tie explicitly here.
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:00", "2024-01-02 00:00:00"]
    )
    # event_id orders the tied pair so the non-signup sorts FIRST by id
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["click", "signup", "click"], pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = R.q29_asof_last_signup(str(tmp_path)).to_pandas()
    out = out.set_index("event_id")["last_signup"]
    assert out[1] == ts[0]  # tied event sees the same-ts signup
    assert out[2] == ts[0]
    assert out[3] == ts[0]


def test_entry_smoke():
    df = _to_pdf(entrymod.entry())
    assert len(df) > 0
    assert "sum_qty" in df.columns


def test_q52_window_boundaries(tmp_path):
    # strictly-after lower bound and exclusive 7-day upper bound:
    # ties at the anchor ts and events exactly at +7d must NOT count
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    base = pd.Timestamp("2024-01-01 00:00:00")
    ts = [
        base,                                 # signup (anchor, id=1)
        base,                                 # tied click: excluded (ts > s.ts is strict)
        base + pd.Timedelta(microseconds=1),  # just inside: counted
        base + pd.Timedelta(days=7) - pd.Timedelta(microseconds=1),  # last inside
        base + pd.Timedelta(days=7),          # exactly +7d: excluded
        base + pd.Timedelta(days=1),          # other user: excluded
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 7, 8], pa.int64()),
            "ts": pa.array(pd.to_datetime(ts), pa.timestamp("us")),
            "event_type": pa.array(
                ["signup", "click", "click", "click", "click", "click"]
            ),
            "value": pa.array([0.5, 1.0, 2.0, 4.0, 8.0, 16.0]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = R.q52_range_join(str(tmp_path)).to_pandas().set_index("event_id")
    assert list(out.index) == [1]
    assert out.loc[1, "n_follow"] == 2          # ids 3 and 4 only
    assert out.loc[1, "sum_value"] == 6.0


def test_q52_anchor_without_followers(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([3], pa.int64()),
            "ts": pa.array(pd.to_datetime(["2024-01-01"]), pa.timestamp("us")),
            "event_type": pa.array(["signup"]),
            "value": pa.array([1.0]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = R.q52_range_join(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_follow"] == 0
    assert out.iloc[0]["sum_value"] == 0.0


def test_q53_gap_resets_window(tmp_path):
    # daily buckets 10 days apart must not see each other in the
    # trailing-7-day sum; three consecutive days accumulate
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-13"]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([5, 5, 5, 5], pa.int64()),
            "ts": pa.array(pd.to_datetime(days), pa.timestamp("us")),
            "event_type": pa.array(["click"] * 4),
            "value": pa.array([1.0, 2.0, 4.0, 8.0]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        R.q53_rolling_window(str(tmp_path))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert list(out["roll_n_events"]) == [1, 2, 3, 1]
    assert list(out["roll_sum_value"]) == [1.0, 3.0, 7.0, 8.0]


def test_dim_lookup_rejects_negative_keys():
    """numpy fancy indexing silently WRAPS -1 to the array tail — a
    corrupt negative FK must raise, not mis-attribute to the last
    dimension row."""
    import numpy as np
    import pytest

    from cs_insights_crawler_ray.pipelines.relational import _dim_lookup

    names = np.array(["a", "b", "c"], dtype=object)
    assert list(_dim_lookup(names, np.array([0, 2]), "t")) == ["a", "c"]
    with pytest.raises(KeyError):
        _dim_lookup(names, np.array([1, -1]), "t")
    with pytest.raises(KeyError):
        _dim_lookup(names, np.array([3]), "t")
    names[1] = None
    with pytest.raises(KeyError):
        _dim_lookup(names, np.array([1]), "t")


def test_q75_funnel_boundaries(tmp_path):
    # strict start (tied-ts purchase does NOT convert), inclusive
    # horizon (purchase at exactly +3600s converts), no cross-user
    # leakage, and multiple clicks each evaluated independently
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",  # u1 click
            "2024-01-01 00:00:00",  # u1 purchase (tied -> NOT strict-later)
            "2024-01-01 02:00:00",  # u1 click
            "2024-01-01 03:00:00",  # u1 purchase (exactly +3600s -> converts)
            "2024-01-01 05:00:00",  # u1 click (no later purchase)
            "2024-01-02 00:00:00",  # u2 click
            "2024-01-02 00:30:00",  # u3 purchase (other user: no leak)
            "2024-01-03 00:00:00",  # u4 click
            "2024-01-03 01:00:00.000001",  # u4 purchase (+3600s + 1us -> no)
        ],
        format="mixed",
    )
    users = [1, 1, 1, 1, 1, 2, 3, 4, 4]
    types = [
        "click", "purchase", "click", "purchase", "click",
        "click", "purchase", "click", "purchase",
    ]
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(types, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        R.q75_funnel_conversion(str(tmp_path))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    # u1: clicks at 00:00 (tied purchase doesn't count, but the 03:00
    # purchase is within 3h? no — horizon is 1h, so 00:00 does NOT
    # convert), 02:00 (converts at exactly +1h), 05:00 (no purchase)
    assert out.loc[1, "n_starts"] == 3 and out.loc[1, "n_converted"] == 1
    assert out.loc[2, "n_starts"] == 1 and out.loc[2, "n_converted"] == 0
    assert 3 not in out.index  # purchase-only user has no starts
    assert out.loc[4, "n_starts"] == 1 and out.loc[4, "n_converted"] == 0


def test_q78_distinct_across_blocks(tmp_path):
    # the same (window, user) pair repeated many times — enough rows to
    # span multiple blocks — must count once per window; each event
    # belongs to exactly two hopping windows
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    n = 5000
    ts = pd.to_datetime(["2024-01-01 00:10:00"] * n + ["2024-01-01 00:40:00"])
    tbl = pa.table(
        {
            "user_id": pa.array([42] * n + [7], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        R.q78_window_distinct_users(str(tmp_path))
        .to_pandas()
        .set_index("window_start")["n_users"]
        .sort_index()
    )
    base = int(pd.Timestamp("2024-01-01 00:00:00").timestamp())
    # 00:10 event -> windows starting 23:30 (prev day) and 00:00;
    # 00:40 event -> windows 00:00 and 00:30
    assert out[base - 1800] == 1           # only user 42
    assert out[base] == 2                  # users 42 and 7, each once
    assert out[base + 1800] == 1           # only user 7
    assert len(out) == 3


def test_q81_winsorize_bounds(tmp_path):
    # hand-checkable percentile ranks: 20 values of one type ->
    # r05 = (5*20-1)//100+1 = 1 (the minimum), r95 = (95*20-1)//100+1
    # = 19 -> only the max clips high, nothing clips low
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    vals = [float(v) for v in range(1, 21)]  # 1.0 .. 20.0
    tbl = pa.table(
        {
            "event_id": pa.array(range(20), pa.int64()),
            "event_type": pa.array(["x"] * 20, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        R.q81_winsorize_values(str(tmp_path))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out.loc[0, "value_w"] == 1.0 and out.loc[0, "clipped"] == 0
    assert out.loc[18, "value_w"] == 19.0 and out.loc[18, "clipped"] == 0
    assert out.loc[19, "value_w"] == 19.0 and out.loc[19, "clipped"] == 1
    assert int(out["clipped"].sum()) == 1


def test_q82_mad_outliers_hand_case(tmp_path):
    # type "a": values 1..9 + 100 -> med rank (10-1)//2+1 = 5 -> 5.0;
    # devs sorted 0,1,1,2,2,3,3,4,4,95 -> MAD (rank 5) = 2.0 ->
    # threshold 6.0 -> only the 100.0 row flags.
    # type "b": [5,5,5,5,7] -> med 5, MAD 0 -> any nonzero dev flags.
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    vals = [float(v) for v in range(1, 10)] + [100.0] + [5.0] * 4 + [7.0]
    types = ["a"] * 10 + ["b"] * 5
    tbl = pa.table(
        {
            "event_id": pa.array(range(15), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        R.q82_mad_outliers(str(tmp_path))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out.loc[9, "abs_dev_c"] == 9500 and out.loc[9, "is_outlier"] == 1
    assert out.loc[0, "abs_dev_c"] == 400 and out.loc[0, "is_outlier"] == 0
    assert out.loc[14, "abs_dev_c"] == 200 and out.loc[14, "is_outlier"] == 1
    assert int(out["is_outlier"].sum()) == 2


def test_q83_keep_latest_tiebreak(tmp_path):
    # same key, same ts -> the HIGHER event_id wins; distinct keys
    # never merge; a lone key passes through unchanged
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    ts = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (1, ts, 7, "click", 1.0),
        (2, ts, 7, "click", 2.0),              # ts tie -> id 2 wins
        (3, ts - pd.Timedelta("1h"), 7, "view", 3.0),
        (4, ts + pd.Timedelta("1h"), 7, "view", 4.0),  # later ts wins
        (5, ts, 8, "click", 5.0),              # lone key
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    out = (
        R.q83_keep_latest(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert list(out["event_id"]) == [2, 4, 5]
    assert out.loc[0, "ts_us"] == ts.value // 1000


def test_window_ops_floor_pre1970(tmp_path):
    """q12/q42/q78 must FLOOR-divide epoch time like the DuckDB
    oracles (`//` / floor()) — Arrow's pc.divide truncates toward
    zero, which shifted pre-1970 events one window late (review
    finding).  One event 60s before the epoch: floor(-60/3600) = -1,
    hop windows -3600 and -1800."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cs_insights_crawler_ray.pipelines import relational as R

    ts = pd.Timestamp("1969-12-31 23:59:00")
    df = pd.DataFrame(
        {
            "event_id": [1],
            "ts": [ts],
            "user_id": [7],
            "event_type": ["click"],
            "value": [2.5],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")

    q12 = R.q12_window_agg(str(tmp_path)).to_pandas()
    assert list(q12["hour_bucket"]) == [-1]

    q42 = R.q42_hopping_window(str(tmp_path)).to_pandas()
    assert sorted(q42["window_start"]) == [-3600, -1800]

    q78 = R.q78_window_distinct_users(str(tmp_path)).to_pandas()
    assert sorted(q78["window_start"]) == [-3600, -1800]
    assert (q78["n_users"] == 1).all()

    # the ORACLES must agree on this pre-1970 row too (DuckDB's //
    # truncates toward zero; the oracles were rewritten to floor())
    import duckdb

    import __ray_entry__ as em

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    sqls = em.oracle_sql()
    assert sorted(
        con.sql(sqls["q42_hopping_window"]).df()["window_start"]
    ) == [-3600, -1800]
    assert sorted(
        con.sql(sqls["q78_window_distinct_users"]).df()["window_start"]
    ) == [-3600, -1800]
    assert list(con.sql(sqls["q12_window_agg"]).df()["hour_bucket"]) == [-1]
    # q86/q87: the single pre-1970 event cohorts into a negative week
    q86 = R.q86_retention_cohorts(str(tmp_path)).to_pandas()
    o86 = con.sql(sqls["q86_retention_cohorts"]).df()
    assert list(q86["cohort_week"]) == list(o86["cohort_week"]) == [-1]


def _write_events(tmp_path, rows):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")


def test_q86_retention_cohorts_hand_case(tmp_path):
    # user 1 first active week W, also W+1 and W+2 (twice -> dedupes);
    # user 2 first active week W+1 only
    import pandas as pd
    from cs_insights_crawler_ray.pipelines import relational as R

    w0 = pd.Timestamp("2024-01-04")      # inside some epoch week W
    wk = pd.Timedelta(days=7)
    _write_events(tmp_path, [
        (1, w0, 1, "click", 0.0),
        (2, w0 + wk, 1, "click", 0.0),
        (3, w0 + 2 * wk, 1, "view", 0.0),
        (4, w0 + 2 * wk + pd.Timedelta("1h"), 1, "view", 0.0),
        (5, w0 + wk, 2, "click", 0.0),
    ])
    out = (
        R.q86_retention_cohorts(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    cw1 = int(out["cohort_week"].min())
    got = {
        (int(r.cohort_week) - cw1, int(r.week_offset)): int(r.n_users)
        for r in out.itertuples()
    }
    assert got == {(0, 0): 1, (0, 1): 1, (0, 2): 1, (1, 0): 1}


def test_q87_gap_quantiles_hand_case(tmp_path):
    # user 1: a@0s, b@10s, b@30s -> type-b gaps [10s, 20s]:
    # P50 rank (2-1)//2+1 = 1 -> 10s, P90 rank (18-1)//10+1 = 2 -> 20s;
    # user 2: single event -> contributes no gap; ts tie on user 3
    # breaks by event_id (gap 0 attributed to the higher id's type)
    import pandas as pd
    from cs_insights_crawler_ray.pipelines import relational as R

    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta("1s")
    _write_events(tmp_path, [
        (1, t0, 1, "a", 0.0),
        (2, t0 + 10 * s, 1, "b", 0.0),
        (3, t0 + 30 * s, 1, "b", 0.0),
        (4, t0, 2, "a", 0.0),
        (5, t0, 3, "a", 0.0),
        (6, t0, 3, "c", 0.0),
    ])
    out = (
        R.q87_gap_quantiles(str(tmp_path))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert out.loc["b", "p50_gap_s"] == 10
    assert out.loc["b", "p90_gap_s"] == 20
    assert out.loc["c", "p50_gap_s"] == 0
    assert "a" not in out.index  # 'a' is never the later event of a gap


def test_q91_behavior_trigrams_hand_case(ray_session, tmp_path):
    """user 1's a,b,c,b,c stream yields (a,b,c),(b,c,b),(c,b,c);
    user 2 is too short; user 3's same-timestamp events order by
    event_id (x,y,z); no trigram crosses users."""
    import pandas as pd
    from cs_insights_crawler_ray.pipelines import relational as R

    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta("1s")
    _write_events(tmp_path, [
        (1, t0, 1, "a", 0.0),
        (2, t0 + s, 1, "b", 0.0),
        (3, t0 + 2 * s, 1, "c", 0.0),
        (4, t0 + 3 * s, 1, "b", 0.0),
        (5, t0 + 4 * s, 1, "c", 0.0),
        (6, t0, 2, "a", 0.0),
        (7, t0 + s, 2, "b", 0.0),
        (9, t0, 3, "y", 0.0),
        (8, t0, 3, "x", 0.0),
        (10, t0, 3, "z", 0.0),
    ])
    out = R.q91_behavior_trigrams(str(tmp_path)).to_pandas()
    got = {
        (r.t1, r.t2, r.t3): int(r.n) for r in out.itertuples(index=False)
    }
    assert got == {
        ("a", "b", "c"): 1, ("b", "c", "b"): 1, ("c", "b", "c"): 1,
        ("x", "y", "z"): 1,
    }
    # all-tied counts -> output order is (n DESC, t1, t2, t3)
    assert list(out[["t1", "t2", "t3"]].itertuples(index=False, name=None)) == [
        ("a", "b", "c"), ("b", "c", "b"), ("c", "b", "c"), ("x", "y", "z")
    ]


def test_q93_cross_source_dups_hand_case(ray_session, tmp_path):
    """text 'dup' appears under A (twice) and B -> all three rows are
    syndicated; A's same-source-only duplicate 'loc' does NOT count;
    unique texts don't count."""
    import pandas as pd
    from cs_insights_crawler_ray.pipelines import relational as R

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5, 6],
            "text": ["dup", "dup", "dup", "loc", "loc", "solo a", "solo b"],
            "source": ["A", "A", "B", "A", "A", "A", "B"],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = (
        R.q93_cross_source_dups(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert out.loc["A", "n_docs"] == 5 and out.loc["A", "n_syndicated"] == 2
    assert out.loc["B", "n_docs"] == 2 and out.loc["B", "n_syndicated"] == 1
    assert out.loc["A", "syndication_ppm"] == 400_000
    assert out.loc["B", "syndication_ppm"] == 500_000


def test_kmv_distinct_exact_and_estimate(tmp_path):
    """q97: a type under k distinct users returns the EXACT count; a
    type over k matches a serial pure-Python KMV re-derivation and
    lands near the truth; duplicate events never inflate the sketch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cs_insights_crawler_ray.pipelines import relational as R

    FIB = 0x9E3779B97F4A7C15
    small_users = [5, 6, 7, 5, 6, 7, 5]          # 3 distinct, repeated
    big_users = list(range(1000, 1500)) * 2      # 500 distinct, repeated
    users = small_users + big_users
    types = ["rare"] * len(small_users) + ["hot"] * len(big_users)
    n = len(users)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(
                pd.to_datetime(["2024-01-01"] * n), pa.timestamp("us")
            ),
            "event_type": pa.array(types),
            "value": pa.array([1.0] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = (
        R.q97_kmv_distinct(str(tmp_path)).to_pandas().set_index("event_type")
    )
    assert out.loc["rare", "n_sketch"] == 3
    assert out.loc["rare", "est_distinct"] == 3   # exact under k
    # serial re-derivation of the >k branch
    hs = sorted({(u * FIB) % (1 << 64) for u in set(big_users)})[:64]
    want = 63 * (1 << 64) // hs[-1]
    assert out.loc["hot", "n_sketch"] == 64
    assert out.loc["hot", "est_distinct"] == want
    assert 250 <= want <= 1000  # the estimate is in the truth's ballpark


def test_rollup_levels_hand_case(tmp_path):
    """q99: finest rows, per-flag subtotals with NULL linestatus, and
    one grand-total row — sums exact at every level."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cs_insights_crawler_ray.pipelines import relational as R

    tbl = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", "B"]),
            "l_linestatus": pa.array(["F", "O", "F"]),
            "l_quantity": pa.array([1.5, 2.0, 4.25]),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    out = R.q99_rollup_aggregate(str(tmp_path)).to_pandas()
    fine = out[out["l_linestatus"].notna()].set_index(
        ["l_returnflag", "l_linestatus"]
    )
    assert fine.loc[("A", "F"), "sum_qty_c"] == 150
    assert fine.loc[("B", "F"), "sum_qty_c"] == 425
    sub = out[out["l_linestatus"].isna() & out["l_returnflag"].notna()].set_index(
        "l_returnflag"
    )
    assert sub.loc["A", "sum_qty_c"] == 350 and sub.loc["A", "n_rows"] == 2
    grand = out[out["l_returnflag"].isna()]
    assert len(grand) == 1
    assert grand.iloc[0]["sum_qty_c"] == 775 and grand.iloc[0]["n_rows"] == 3


def test_table_checksum_detects_any_change(tmp_path):
    """q100: the checksum is row-order independent, and any single
    changed / dropped / duplicated row flips its bucket's value while
    leaving other buckets untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cs_insights_crawler_ray.pipelines import relational as R

    def write(rows, d):
        ok, ln, q = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array(ok, pa.int64()),
                    "l_linenumber": pa.array(ln, pa.int64()),
                    "l_quantity": pa.array(q, pa.float64()),
                }
            ),
            d / "lineitem.parquet",
        )

    rows = [(1, 1, 2.0), (1, 2, 3.5), (2, 1, 1.0), (9, 1, 7.25)]
    a = tmp_path / "a"; a.mkdir(); write(rows, a)
    b = tmp_path / "b"; b.mkdir(); write(rows[::-1], b)          # reordered
    c = tmp_path / "c"; c.mkdir(); write(rows[:3], c)            # dropped row
    d = tmp_path / "d"; d.mkdir(); write(rows + [rows[0]], d)    # dup row
    e = tmp_path / "e"; e.mkdir()
    write([(1, 1, 2.01)] + rows[1:], e)                           # 1-cent edit

    base = R.q100_table_checksum(str(a)).to_pandas().set_index("bucket")
    same = R.q100_table_checksum(str(b)).to_pandas().set_index("bucket")
    pd.testing.assert_frame_equal(base, same)                     # order-free
    for variant in (c, d, e):
        got = R.q100_table_checksum(str(variant)).to_pandas().set_index("bucket")
        # bucket 1 (orderkeys 1, 9 -> 9%8=1) changed; bucket 2 intact
        assert got.loc[1, "checksum"] != base.loc[1, "checksum"]
        assert got.loc[2, "checksum"] == base.loc[2, "checksum"]


def test_rollup_keeps_null_keys(tmp_path):
    """q99: a NULL group key is a REAL group at every rollup level
    (pandas' default dropna silently vanished the row from the grand
    total — r04 review) — checked against DuckDB's native ROLLUP."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cs_insights_crawler_ray.pipelines import relational as R

    tbl = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", None]),
            "l_linestatus": pa.array(["F", None, "O"]),
            "l_quantity": pa.array([1.0, 2.0, 4.0]),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = R.q99_rollup_aggregate(str(tmp_path)).to_pandas()
    grand = got[got["l_returnflag"].isna() & got["l_linestatus"].isna()]
    # grand total must include ALL THREE rows (700 cents)
    assert 700 in grand["sum_qty_c"].tolist()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet')"
    )
    want = con.sql(
        """SELECT l_returnflag, l_linestatus,
                  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
                    AS sum_qty_c,
                  CAST(count(*) AS BIGINT) AS n_rows
           FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""
    ).df()
    key = lambda d: sorted(
        (str(a), str(b), int(c), int(n))
        for a, b, c, n in d[
            ["l_returnflag", "l_linestatus", "sum_qty_c", "n_rows"]
        ].itertuples(index=False)
    )
    assert key(got) == key(want)
