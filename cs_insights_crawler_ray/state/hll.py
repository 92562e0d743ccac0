"""HyperLogLog sketch — the A4 sketch family's cardinality member
(beside bloom/cuckoo membership and MinHash/SimHash similarity).

Reference analog: the reference's only distinct-count machinery is
driver-side Python sets (s2processor.py:55,114-118) — exact but
O(distinct) driver memory.  At 100 TB a distinct count over a hot
column must be a mergeable fixed-size sketch: HLL registers are
4 KiB per key regardless of cardinality, and the merge (elementwise
max) is associative + commutative, so Ray's nondeterministic block
order CANNOT change the result — per-block partial registers shuffle,
never values.

Determinism contract (mirrors cluster.py's int64-only k-means):
register construction is pure integer arithmetic (splitmix64 +
leading-zero count) with a bit-identical pure-Python re-derivation
(`registers_seq`, used by the oracle artifact); the estimator is one
shared float64 expression evaluated over identical registers on both
sides, so the driver's value-hash compare is exact, not approximate.
"""

from __future__ import annotations

import numpy as np

HLL_P = 12                 # 4096 registers, ~1.04/sqrt(m) = 1.6% rse
HLL_M = 1 << HLL_P

_MASK64 = (1 << 64) - 1
_C1, _C2, _C3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 (wrapping mul/add)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(_C1)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_C2)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_C3)
        return z ^ (z >> np.uint64(31))


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float log2 — a
    value near 2^53 rounds wrong through float64)."""
    r = np.zeros(x.shape, np.uint8)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        r[m] += np.uint8(s)
        v[m] >>= np.uint64(s)
    r[v > 0] += np.uint8(1)
    return r

def registers(values: np.ndarray) -> np.ndarray:
    """Dense HLL registers (uint8[HLL_M]) for an int64/uint64 batch.
    Register index = top P hash bits; rho = leading-zero count of the
    remaining 64-P bits + 1 (all-zero tail -> 64-P+1)."""
    h = splitmix64(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    rho = (64 - HLL_P + 1 - _bit_length_u64(w)).astype(np.uint8)
    reg = np.zeros(HLL_M, np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(reg: np.ndarray) -> int:
    """Flajolet HLL estimator with small-range linear counting.
    One fixed float64 expression (np.sum in register order) shared by
    the engine and the sequential oracle so both round identically."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.ldexp(1.0, -reg.astype(np.int64))))
    zeros = int(np.count_nonzero(reg == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return int(e + 0.5)


# ---------------------------------------------------------------------------
# Pure-Python re-derivation (oracle side) — no numpy in the hash or
# register path; catches uint64-wraparound / dtype / indexing bugs in
# the vectorized construction above (same philosophy as
# oracle_artifacts naive_text).
# ---------------------------------------------------------------------------
def _splitmix64_int(x: int) -> int:
    z = (x + _C1) & _MASK64
    z = ((z ^ (z >> 30)) * _C2) & _MASK64
    z = ((z ^ (z >> 27)) * _C3) & _MASK64
    return z ^ (z >> 31)


def registers_seq(values) -> list[int]:
    """Sequential pure-int register construction (list of HLL_M ints)."""
    reg = [0] * HLL_M
    tail_bits = 64 - HLL_P
    tail_mask = (1 << tail_bits) - 1
    for v in values:
        h = _splitmix64_int(int(v) & _MASK64)
        idx = h >> tail_bits
        w = h & tail_mask
        rho = tail_bits + 1 - w.bit_length()
        if rho > reg[idx]:
            reg[idx] = rho
    return reg
