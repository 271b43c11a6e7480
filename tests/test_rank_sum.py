"""Mann–Whitney rank-sum statistic (ops.rank_sum_u) vs the O(n·m)
pairwise definition: 2·U_a = 2·#{(x,y): x>y} + #{x=y} over all
(x∈A, y∈B) pairs, with planted heavy ties, disjoint supports (U at
its extremes) and block-layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import rank_sum_u


def _ds(vals, n_blocks=1):
    t = pa.table({"c": pa.array(np.asarray(vals, np.int64), pa.int64())})
    ds = rd.from_arrow(t)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _brute(a, b):
    a = np.asarray(a, np.int64)[:, None]
    b = np.asarray(b, np.int64)[None, :]
    u2 = 2 * int((a > b).sum()) + int((a == b).sum())
    t_all = np.r_[a.ravel(), b.ravel()]
    _, cnt = np.unique(t_all, return_counts=True)
    tie = int((cnt.astype(np.int64) ** 3 - cnt).sum())
    return u2, tie


def _got(a, b, blocks=1):
    t = rank_sum_u(_ds(a, blocks), _ds(b, blocks), "c")
    r = t.to_pylist()[0]
    return r


def test_rank_sum_matches_pairwise_with_ties():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 12, 75)   # narrow domain -> heavy ties
    b = rng.integers(3, 15, 50)
    u2, tie = _brute(a, b)
    r = _got(a, b)
    assert (r["u2_a"], r["n_a"], r["n_b"], r["tie_sum"]) == (
        u2, 75, 50, tie)


def test_rank_sum_extremes_and_layout_invariance():
    a = np.arange(100, 130)       # every a > every b
    b = np.arange(0, 20)
    r = _got(a, b)
    assert r["u2_a"] == 2 * 30 * 20 and r["tie_sum"] == 0
    r2 = _got(b, a)               # flipped: U_a = 0
    assert r2["u2_a"] == 0
    rng = np.random.default_rng(9)
    a = rng.integers(0, 40, 200)
    b = rng.integers(10, 50, 160)
    r1 = _got(a, b, blocks=1)
    r7 = _got(a, b, blocks=7)
    assert r1 == r7
    u2, tie = _brute(a, b)
    assert r1["u2_a"] == u2 and r1["tie_sum"] == tie
