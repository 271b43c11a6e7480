"""logistic_newton1 (mlfit.py): exact rational Newton step equals an
independent float IRLS first iteration, separable-data sanity
(positive slope toward the positive class), layout invariance,
singular design raises."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.mlfit import logistic_newton1


def _ds(x, y, parts=1):
    t = pa.table({"x": pa.array(np.asarray(x, np.int64)),
                  "y": pa.array(np.asarray(y, np.int64))})
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _xy(t: pa.Table):
    x = np.asarray(t["x"], np.int64)
    y = np.asarray(t["y"], np.int64)
    return np.stack([np.ones(len(x), np.int64), x], 1), y


def _fit(x, y, parts=1):
    t = logistic_newton1(_ds(x, y, parts), _xy, p=2)
    rows = t.to_pylist()
    return [(r["num"], r["den"]) for r in rows], rows[0]["n"]


def _irls_step(x, y):
    # independent float reference: one Newton step from beta=0 with
    # W = sigma(0)(1-sigma(0)) I = I/4
    X = np.stack([np.ones(len(x)), np.asarray(x, float)], 1)
    g = X.T @ (np.asarray(y, float) - 0.5)
    H = X.T @ X / 4.0
    return np.linalg.solve(H, g)


def test_matches_float_irls():
    rng = np.random.default_rng(6)
    x = rng.integers(0, 30, 400)
    y = (rng.random(400) < 1 / (1 + np.exp(-(x - 15) / 5))).astype(int)
    (n0, d0), _ = _fit(x, y)[0][0], None
    coefs, n = _fit(x, y)
    ref = _irls_step(x, y)
    got = [num / den for num, den in coefs]
    np.testing.assert_allclose(got, ref, rtol=1e-12)
    assert n == 400


def test_direction_toward_positive_class():
    # y perfectly increasing in x: slope coefficient positive,
    # intercept negative
    x = np.arange(100)
    y = (x >= 50).astype(int)
    coefs, _ = _fit(x, y)
    assert coefs[1][0] / coefs[1][1] > 0
    assert coefs[0][0] / coefs[0][1] < 0


def test_layout_invariant_exact_ints():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 50, 500)
    y = rng.integers(0, 2, 500)
    assert _fit(x, y, parts=1) == _fit(x, y, parts=13)


def test_singular_design_raises():
    with pytest.raises(ValueError, match="singular"):
        _fit([7] * 20, [0, 1] * 10)
