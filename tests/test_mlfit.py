"""Exact-integer OLS (mlfit): Bareiss determinant vs numpy, planted
exact linear data recovered exactly, lstsq agreement on noisy data,
block-layout invariance, singular design raises."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.mlfit import (
    gram_sums, grouped_simple_ols, int_det, ols_fit_exact,
)
from essentials_rd.util import np_col


def test_int_det_matches_numpy():
    rng = np.random.default_rng(3)
    for n in (1, 2, 3, 5, 7):
        m = rng.integers(-9, 10, (n, n))
        got = int_det(m.tolist())
        want = round(np.linalg.det(m))
        assert got == want
    assert int_det([[2, 4], [1, 2]]) == 0
    # needs a pivot swap
    assert int_det([[0, 1], [1, 0]]) == -1


def _ds(k, q, y, parts):
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "q": pa.array(q, pa.int64()),
                  "y": pa.array(y, pa.int64())})
    return rd.from_arrow(t).repartition(parts)


def _xy(b: pa.Table):
    k = np_col(b, "k").astype(np.int64)
    q = np_col(b, "q").astype(np.int64)
    X = np.stack([np.ones(len(k), np.int64), k, q], axis=1)
    return X, np_col(b, "y").astype(np.int64)


def test_planted_exact_fit(ray_session):
    rng = np.random.default_rng(5)
    n = 5000
    k = rng.integers(1, 8, n)
    q = rng.integers(1, 400, n)
    y = 300 + 2 * k + 5 * q  # exactly linear -> residual 0
    coefs, info = ols_fit_exact(_ds(k, q, y, 7), _xy, p=3)
    assert coefs == [300.0, 2.0, 5.0]
    assert info["n"] == n


def test_matches_numpy_lstsq_and_layout_invariant(ray_session):
    rng = np.random.default_rng(9)
    n = 4000
    k = rng.integers(1, 8, n)
    q = rng.integers(1, 400, n)
    y = 300 + 2 * k + 5 * q + rng.integers(-50, 51, n)
    c1, _ = ols_fit_exact(_ds(k, q, y, 3), _xy, p=3)
    c2, _ = ols_fit_exact(_ds(k, q, y, 11), _xy, p=3)
    assert c1 == c2  # exact integer sums -> bit-identical coefs
    X = np.stack([np.ones(n), k, q], axis=1)
    ref = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)[0]
    assert np.allclose(c1, ref, rtol=1e-9)


def test_singular_design_raises(ray_session):
    n = 100
    k = np.full(n, 3, np.int64)   # constant column collinear w/ intercept
    y = 7 * k
    with pytest.raises(ValueError, match="singular"):
        ols_fit_exact(_ds(k, k, y, 2), _xy, p=3)


def test_ridge_shrinks_toward_zero(ray_session):
    rng = np.random.default_rng(2)
    n = 2000
    k = rng.integers(1, 8, n)
    q = rng.integers(1, 400, n)
    y = 300 + 2 * k + 5 * q + rng.integers(-50, 51, n)
    ols, _ = ols_fit_exact(_ds(k, q, y, 4), _xy, p=3)
    rr, _ = ols_fit_exact(_ds(k, q, y, 4), _xy, p=3, ridge=10**9)
    # heavy penalty pushes non-intercept coefs toward 0
    assert abs(rr[1]) < abs(ols[1]) and abs(rr[2]) < abs(ols[2])
    # matches the closed-form (gram + lambda*I') solve in float
    gram, xty, _, _ = gram_sums(_ds(k, q, y, 4), _xy, p=3)
    A = np.array(gram, np.float64)
    A[1, 1] += 1e9
    A[2, 2] += 1e9
    ref = np.linalg.solve(A, np.array(xty, np.float64))
    assert np.allclose(rr, ref, rtol=1e-9)


def test_grouped_simple_ols(ray_session):
    rng = np.random.default_rng(4)
    n = 3000
    key = rng.integers(0, 3, n)
    x = rng.integers(1, 100, n)
    # per-group planted slopes 2, 5, -3; intercepts 10, 0, 7
    slopes = np.array([2, 5, -3])
    icpts = np.array([10, 0, 7])
    y = icpts[key] + slopes[key] * x
    # plus a zero-variance group: key 3, constant x
    key = np.r_[key, [3] * 10]
    x = np.r_[x, [5] * 10]
    y = np.r_[y, [42] * 10]

    def _kxy(b: pa.Table):
        return (np_col(b, "key"), np_col(b, "x"), np_col(b, "y"))

    t = pa.table({"key": pa.array(key, pa.int64()),
                  "x": pa.array(x, pa.int64()),
                  "y": pa.array(y, pa.int64())})
    out = grouped_simple_ols(rd.from_arrow(t).repartition(6), _kxy)
    rows = {r["key"]: r for r in out.to_pylist()}
    assert sorted(rows) == [0, 1, 2, 3]
    for g in range(3):
        assert rows[g]["slope"] == float(slopes[g])
        assert rows[g]["intercept"] == float(icpts[g])
    assert rows[3]["slope"] is None and rows[3]["intercept"] is None
    assert rows[3]["n"] == 10
    # layout invariance: bit-identical across partitionings
    out2 = grouped_simple_ols(rd.from_arrow(t).repartition(13), _kxy)
    assert out.equals(out2)


def test_gram_sums_values(ray_session):
    k = np.array([1, 2, 3], np.int64)
    q = np.array([4, 5, 6], np.int64)
    y = np.array([7, 8, 9], np.int64)
    gram, xty, n, yty = gram_sums(_ds(k, q, y, 2), _xy, p=3)
    X = np.stack([np.ones(3, np.int64), k, q], axis=1)
    assert gram == (X.T @ X).tolist()
    assert xty == (X.T @ y).tolist()
    assert (n, yty) == (3, int(y @ y))
