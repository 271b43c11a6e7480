"""TPC-H suite (essentials_rd.tpch) vs DuckDB on the sf0.001 tables.

The full 8-query × 2-scale sweep runs through scripts/check_oracle.py;
here we pin the two cheapest shapes (zero-shuffle Q6, join+group Q12)
plus Q18's HAVING threshold semantics so a regression in the shared
cents/percent/epoch-day conventions fails fast in CI.
"""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _cmp(got, sql, sort_cols):
    import __ray_entry__  # noqa: F401 — ensures module-level consts load

    con = _con()  # keep alive — the relation weak-refs its connection
    want = con.sql(sql).df()
    g = got.to_pandas().sort_values(sort_cols).reset_index(drop=True)
    w = want.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[sorted(g.columns)], w[sorted(w.columns)], check_dtype=False)


def test_q6_matches_duckdb():
    from essentials_rd import tpch

    from __ray_entry__ import _tpch_q6_sql

    _cmp(tpch.q6(SF), _tpch_q6_sql(), ["n"])


def test_q12_matches_duckdb():
    from essentials_rd import tpch

    from __ray_entry__ import _tpch_q12_sql

    _cmp(tpch.q12(SF), _tpch_q12_sql(), ["l_linestatus"])


def test_q18_threshold_and_order():
    """Every returned order's sum_qty exceeds the threshold, the set
    equals DuckDB's, and the k-boundary tie-break is deterministic."""
    from essentials_rd import tpch

    from __ray_entry__ import _tpch_q18_sql

    got = tpch.q18(SF)
    assert (got.to_pandas()["sum_qty"] > 200).all()
    _cmp(got, _tpch_q18_sql(), ["o_orderkey"])


def test_q13_counts_zero_order_customers():
    """The corpus gives every customer orders at every sf, so the
    oracle can never exercise Q13's zero-count branch — pin it on a
    synthetic table where most customers have no orders (the left-join
    null → 0 path)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, join

    cust = pa.table({"c_custkey": pa.array(np.arange(10), pa.int64())})
    orders = pa.table({"c_custkey": pa.array([1, 1, 1, 2, 5, 5],
                                             pa.int64())})
    per_cust = grouped_pandas_agg(
        rd.from_arrow(orders), ["c_custkey"],
        {"n_orders": ("c_custkey", "count")}, num_buckets=4)
    full = join(rd.from_arrow(cust), per_cust, on="c_custkey",
                how="left", broadcast=False, num_buckets=4)

    def _partial(t):
        n = t.column("n_orders").to_numpy(zero_copy_only=False)
        n = np.where(np.isnan(n.astype(np.float64)), 0,
                     n.astype(np.float64)).astype(np.int64)
        c, cnt = np.unique(n, return_counts=True)
        return pa.table({"c_count": pa.array(c, pa.int64()),
                         "custdist": pa.array(cnt.astype(np.int64),
                                              pa.int64())})

    parts = full.map_batches(_partial, batch_format="pyarrow").take_all()
    acc = {}
    for r in parts:
        acc[r["c_count"]] = acc.get(r["c_count"], 0) + r["custdist"]
    assert acc == {0: 7, 1: 1, 2: 1, 3: 1}
