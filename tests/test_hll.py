"""HLL sketch invariants: vectorized == pure-int construction,
merge associativity/order-independence, estimator accuracy."""

from __future__ import annotations

import numpy as np

from cs_insights_crawler_ray.state import hll


def _values(n: int, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    v = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    # force edge values through the uint64 reinterpret path
    v[:4] = [0, -1, 2**62 - 1, -(2**62)]
    return v


def test_vectorized_matches_pure_int():
    v = _values(20_000)
    vec = hll.registers(v)
    seq = np.array(hll.registers_seq(v.tolist()), np.uint8)
    assert np.array_equal(vec, seq)


def test_merge_split_invariance():
    v = _values(10_000, seed=9)
    whole = hll.registers(v)
    # arbitrary uneven splits must merge to the identical registers
    parts = np.array_split(v, [17, 1000, 1003, 9000])
    merged = np.zeros(hll.HLL_M, np.uint8)
    for p in parts:
        if len(p):
            merged = hll.merge(merged, hll.registers(p))
    assert np.array_equal(whole, merged)
    # and the merge is order-independent
    merged_rev = np.zeros(hll.HLL_M, np.uint8)
    for p in reversed(parts):
        if len(p):
            merged_rev = hll.merge(merged_rev, hll.registers(p))
    assert np.array_equal(merged, merged_rev)


def test_estimator_accuracy():
    for true_n in (100, 5_000, 200_000):
        v = np.arange(true_n, dtype=np.int64) * 2_654_435_761
        est = hll.estimate(hll.registers(v))
        # 4096 registers -> ~1.6% rse; allow 5% (and duplicates must
        # not inflate: feed every value three times)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)
        est_dup = hll.estimate(hll.registers(np.tile(v, 3)))
        assert est_dup == est


def test_q54_close_to_exact(ray_session):
    sf = "/root/testdata/sf0.001"
    from cs_insights_crawler_ray.pipelines import relational as R

    approx = (
        R.q54_hll_distinct(sf).to_pandas().set_index("l_returnflag")["approx_n_parts"]
    )
    exact = R.q35_count_distinct(sf).to_pandas().set_index("l_returnflag")["n_parts"]
    for flag in exact.index:
        assert abs(approx[flag] - exact[flag]) / exact[flag] < 0.06, flag
