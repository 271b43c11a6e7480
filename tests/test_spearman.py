"""spearman_exact (mlfit.py) vs a pandas average-rank reference:
exact integer sufficient statistics under heavy ties, rho sign/bounds,
perfect monotone and constant-column edge cases, layout invariance."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.mlfit import spearman_exact


def _tbl(n=800, seed=11):
    rng = np.random.default_rng(seed)
    x = rng.integers(1, 12, n).astype(np.int64)       # heavy ties
    y = (x * 37 + rng.integers(-60, 60, n)).astype(np.int64)
    return pa.table({"x": pa.array(x, pa.int64()),
                     "y": pa.array(y, pa.int64())})


def _ref(tbl: pa.Table):
    df = tbl.to_pandas()
    n = len(df)
    rx2 = (2 * df.x.rank(method="average")).astype(np.int64).to_numpy()
    ry2 = (2 * df.y.rank(method="average")).astype(np.int64).to_numpy()
    cx = rx2 - (n + 1)
    cy = ry2 - (n + 1)
    sxx, syy, sxy = int(cx @ cx), int(cy @ cy), int(cx @ cy)
    rho = math.floor(
        float(sxy) / math.sqrt(float(sxx) * float(syy)) * 1e6 + 0.5) / 1e6
    return n, sxx, syy, sxy, rho


def test_spearman_matches_reference():
    tbl = _tbl()
    got = spearman_exact(rd.from_arrow(tbl), "x", "y").to_pandas().iloc[0]
    n, sxx, syy, sxy, rho = _ref(tbl)
    assert (got.n, got.sxx, got.syy, got.sxy) == (n, sxx, syy, sxy)
    assert got.rho == rho


def test_spearman_layout_invariance():
    tbl = _tbl(seed=23)
    one = spearman_exact(rd.from_arrow(tbl), "x", "y").to_pandas()
    many = spearman_exact(
        rd.from_arrow(tbl).repartition(7), "x", "y",
        n_parts=4, num_buckets=16).to_pandas()
    pd.testing.assert_frame_equal(one, many)


def test_spearman_perfect_monotone():
    x = np.arange(1, 101, dtype=np.int64)
    tbl = pa.table({"x": pa.array(x, pa.int64()),
                    "y": pa.array(x * x, pa.int64())})
    got = spearman_exact(rd.from_arrow(tbl), "x", "y").to_pandas().iloc[0]
    assert got.rho == 1.0
    got = spearman_exact(
        rd.from_arrow(pa.table({
            "x": pa.array(x, pa.int64()),
            "y": pa.array(-x, pa.int64())})), "x", "y").to_pandas().iloc[0]
    assert got.rho == -1.0


def test_spearman_constant_column_zero():
    x = np.arange(50, dtype=np.int64)
    tbl = pa.table({"x": pa.array(x, pa.int64()),
                    "y": pa.array(np.full(50, 7), pa.int64())})
    got = spearman_exact(rd.from_arrow(tbl), "x", "y").to_pandas().iloc[0]
    assert got.syy == 0 and got.rho == 0.0
