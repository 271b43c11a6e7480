"""contingency_chisq (ops.py) vs a pandas-crosstab brute force:
full cross product incl. zero cells, exact integer deviations, cell
chi terms, perfectly-dependent and perfectly-balanced hand cases,
block-layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import contingency_chisq


def _tbl(n=900, seed=5):
    rng = np.random.default_rng(seed)
    a = rng.choice(["x", "y", "z"], n)
    b = rng.integers(0, 4, n).astype(np.int64)
    # plant a dependence and a zero cell
    b[a == "x"] = np.abs(b[a == "x"]) % 2
    return pa.table({"a": pa.array(a.astype(object)),
                     "b": pa.array(b, pa.int64())})


def _ref(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas()
    n = len(df)
    na = df.groupby("a").size()
    nb = df.groupby("b").size()
    nab = df.groupby(["a", "b"]).size()
    rows = []
    for av in sorted(na.index):
        for bv in sorted(nb.index):
            c = int(nab.get((av, bv), 0))
            dev = n * c - int(na[av]) * int(nb[bv])
            chi = (float(dev) * float(dev)) / (
                float(n) * float(na[av]) * float(nb[bv]))
            rows.append((av, bv, c, int(na[av]), int(nb[bv]), dev,
                         np.floor(chi * 1e6 + 0.5) / 1e6))
    return pd.DataFrame(rows, columns=[
        "a", "b", "n_ab", "n_a", "n_b", "dev", "cell_chi"])


def test_chisq_matches_reference():
    tbl = _tbl()
    got = contingency_chisq(rd.from_arrow(tbl), "a", "b").to_pandas()
    pd.testing.assert_frame_equal(got, _ref(tbl))
    assert (got.n_ab == 0).any()  # the planted zero cells are emitted


def test_chisq_layout_invariance():
    tbl = _tbl(seed=19)
    one = contingency_chisq(rd.from_arrow(tbl), "a", "b").to_pandas()
    many = contingency_chisq(
        rd.from_arrow(tbl).repartition(8), "a", "b").to_pandas()
    pd.testing.assert_frame_equal(one, many)


def test_chisq_perfect_balance_is_zero():
    # every (a, b) cell has identical count -> dev == 0 everywhere
    a = np.repeat(["p", "q"], 20)
    b = np.tile(np.repeat([0, 1], 10), 2).astype(np.int64)
    tbl = pa.table({"a": pa.array(a.astype(object)),
                    "b": pa.array(b, pa.int64())})
    got = contingency_chisq(rd.from_arrow(tbl), "a", "b").to_pandas()
    assert (got.dev == 0).all() and (got.cell_chi == 0.0).all()


def test_chisq_perfect_dependence():
    # a determines b completely: chi2 total == n * (|A|-1) ... here 2x2
    a = np.repeat(["p", "q"], 30)
    b = np.repeat([0, 1], 30).astype(np.int64)
    tbl = pa.table({"a": pa.array(a.astype(object)),
                    "b": pa.array(b, pa.int64())})
    got = contingency_chisq(rd.from_arrow(tbl), "a", "b").to_pandas()
    assert abs(got.cell_chi.sum() - 60.0) < 1e-9  # chi2 == n for 2x2
