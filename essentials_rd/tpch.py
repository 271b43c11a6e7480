"""TPC-H-style analytical query suite over the driver's tables.

These are the public TPC-H benchmark shapes (TPC-H spec rev 3.0,
www.tpc.org — public document) adapted to the columns the driver's
TPC-H-ish tables actually carry (no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode, p_type is a single word), and
re-expressed integer-exact so every grouped money aggregate
hash-matches its DuckDB twin with zero float-accumulation risk:

- prices/balances → cents (int64, half-up),
- discount/tax    → integer percent,
- revenue ``extendedprice·(1−discount)`` → cents·(100−dp) = 1e-4
  dollar units; Q6's ``extendedprice·discount`` → cents·dp,
- dates           → epoch-day int64 in outputs.

Every query is a composition of already-verified engine operators
(`ops.join` broadcast/partitioned, `ops.grouped_pandas_agg`,
`ops.top_k`) — the point of the suite is proving the relational
surface composes into real multi-join analytics, with the per-stage
scale notes in each docstring.  Q1 lives in ``__ray_entry__`` since
round-3 early (`tpch_q1_cents`).
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .derive import _str_hash
from .ops import grouped_pandas_agg, join, top_k
from .util import np_col

EPOCH = datetime.datetime(1970, 1, 1)
US_PER_DAY = 86_400_000_000


def _ts(day: str) -> pa.Scalar:
    return pa.scalar(datetime.datetime.fromisoformat(day), pa.timestamp("us"))


def _f64(t: pa.Table, c: str) -> np.ndarray:
    return np.asarray(t.column(c).to_numpy(zero_copy_only=False), np.float64)


def _cents(t: pa.Table, c: str) -> np.ndarray:
    # half-AWAY-from-zero to match DuckDB ROUND on negative balances
    x = _f64(t, c)
    return (np.sign(x) * np.floor(np.abs(x) * 100.0 + 0.5)).astype(np.int64)


def _pct(t: pa.Table, c: str) -> np.ndarray:
    """discount/tax double → integer percent (values are pct/100)."""
    return np.floor(_f64(t, c) * 100.0 + 0.5).astype(np.int64)


def _day_i64(t: pa.Table, c: str) -> np.ndarray:
    """timestamp[us] column → epoch-day int64."""
    us = t.column(c).cast(pa.int64()).to_numpy(zero_copy_only=False)
    return us // US_PER_DAY


def _rev_line(sf_dir: str, keep: list[str], lo: str | None = None,
              hi: str | None = None, flag: str | None = None) -> rd.Dataset:
    """lineitem scan → (``keep``…, rev_u) with revenue pre-computed as
    cents·(100−dp) int64 and date/flag filters applied in the same
    single pass; only the needed columns leave the read."""
    cols = sorted(set(keep) | {"l_extendedprice", "l_discount"}
                  | ({"l_shipdate"} if (lo or hi) else set())
                  | ({"l_returnflag"} if flag else set()))
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)

    def _prep(t: pa.Table) -> pa.Table:
        if lo is not None:
            t = t.filter(pc.greater_equal(t.column("l_shipdate"), _ts(lo)))
        if hi is not None:
            t = t.filter(pc.less(t.column("l_shipdate"), _ts(hi)))
        if flag is not None:
            t = t.filter(pc.equal(t.column("l_returnflag"), flag))
        rev = _cents(t, "l_extendedprice") * (100 - _pct(t, "l_discount"))
        out = {k: t.column(k) for k in keep}
        out["rev_u"] = pa.array(rev, pa.int64())
        return pa.table(out)

    return line.map_batches(_prep, batch_format="pyarrow")


def q3(sf_dir: str, segment: str = "BUILDING", pivot: str = "1998-03-15",
       k: int = 10) -> pa.Table:
    """Q3 shipping priority: top-k unshipped-revenue orders of one
    market segment.  customer(segment) semi-restricts orders via the
    auto-picked join shape (broadcast while the filtered customer list
    fits, partitioned beyond); lineitem(shipdate>pivot) then co-shuffles
    with the surviving orders on o_orderkey — the only big-big
    exchange; per-order revenue folds in the same bucketed pass and
    top-k never moves more than k rows per block."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), segment))
                   .select(["c_custkey"]),
        batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def _oprep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate"), _ts(pivot)))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "c_custkey": t.column("o_custkey"),
                         "oday": pa.array(_day_i64(t, "o_orderdate"),
                                          pa.int64())})

    o2 = join(orders.map_batches(_oprep, batch_format="pyarrow"), cust,
              on="c_custkey", how="semi")
    # shipdate > pivot is strict-greater, so prep inline rather than
    # through _rev_line's >=/< window
    raw = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_orderkey", "l_extendedprice",
                                   "l_discount", "l_shipdate"])

    def _lprep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), _ts(pivot)))
        rev = _cents(t, "l_extendedprice") * (100 - _pct(t, "l_discount"))
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "rev_u": pa.array(rev, pa.int64())})

    j = join(raw.map_batches(_lprep, batch_format="pyarrow"),
             o2.select_columns(["o_orderkey", "oday"]),
             on="o_orderkey", how="inner", broadcast=False, num_buckets=32)
    agg = grouped_pandas_agg(
        j, keys=["o_orderkey", "oday"],
        aggs={"revenue_u": ("rev_u", "sum")}, num_buckets=32)
    return top_k(agg, by="revenue_u", k=k, tie_cols=["o_orderkey"])


def q4(sf_dir: str, lo: str = "1997-07-01", hi: str = "1997-10-01") -> pa.Table:
    """Q4 order-priority check, adapted: the spec's EXISTS(commitdate <
    receiptdate) becomes EXISTS(l_shipdate > o_orderdate) — late-shipped
    — since this snapshot carries no commit/receipt dates.  The EXISTS
    over a non-equi predicate reduces to one grouped max per order
    (max l_shipdate, an equi-keyed aggregate) joined back to orders, so
    no non-equi join machinery is needed; the output is 5 rows."""
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_shipdate"])

    def _lprep(t: pa.Table) -> pa.Table:
        us = t.column("l_shipdate").cast(pa.int64())
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "ship_us": us})

    mx = grouped_pandas_agg(
        line.map_batches(_lprep, batch_format="pyarrow"),
        keys=["o_orderkey"], aggs={"max_ship_us": ("ship_us", "max")},
        num_buckets=32)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def _oprep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("o_orderdate"), _ts(lo)),
                    pc.less(t.column("o_orderdate"), _ts(hi)))
        t = t.filter(m)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "odate_us": t.column("o_orderdate").cast(pa.int64()),
                         "pr": t.column("o_orderpriority")})

    j = join(orders.map_batches(_oprep, batch_format="pyarrow"), mx,
             on="o_orderkey", how="inner", broadcast=False, num_buckets=32)

    def _late(t: pa.Table) -> pa.Table:
        m = np_col(t, "max_ship_us") > np_col(t, "odate_us")
        return t.filter(pa.array(m)).select(["pr"])

    agg = grouped_pandas_agg(
        j.map_batches(_late, batch_format="pyarrow"),
        keys=["pr"], aggs={"n_late": ("pr", "count")},
        key_fn=lambda b: _str_hash(b.column("pr")), num_buckets=4)
    rows = agg.take_all()
    rows.sort(key=lambda r: r["pr"])
    return pa.table({"pr": pa.array([r["pr"] for r in rows], pa.string()),
                     "n_late": pa.array([r["n_late"] for r in rows],
                                        pa.int64())})


def q5(sf_dir: str, region: str = "ASIA", lo: str = "1997-01-01",
       hi: str = "1998-01-01") -> pa.Table:
    """Q5 local-supplier volume: revenue where customer and supplier
    share a nation of one region.  nation⋈region is constant-cardinality
    (≤25 rows at ANY scale — the one justified driver-side dim lookup);
    orders(year)⋈customer and ⋈lineitem are the two big partitioned
    exchanges; supplier joins by the auto-picked shape and the
    same-nation predicate is a vectorized post-filter on the joined
    batch (spec's c_nationkey = s_nationkey)."""
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()
    reg = rd.read_parquet(f"{sf_dir}/region.parquet").take_all()
    rkeys = {r["r_regionkey"] for r in reg if r["r_name"] == region}
    nkeys = {r["n_nationkey"]: r["n_name"] for r in nat
             if r["n_regionkey"] in rkeys}
    nkey_arr = np.array(sorted(nkeys), np.int64)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: t.filter(pa.array(np.isin(
            np_col(t, "c_nationkey").astype(np.int64), nkey_arr))),
        batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def _oprep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("o_orderdate"), _ts(lo)),
                    pc.less(t.column("o_orderdate"), _ts(hi)))
        t = t.filter(m)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "c_custkey": t.column("o_custkey")})

    oc = join(orders.map_batches(_oprep, batch_format="pyarrow"), cust,
              on="c_custkey", how="inner", broadcast=False, num_buckets=32)
    line = _rev_line(sf_dir, ["l_orderkey", "l_suppkey"])
    ol = join(line.map_batches(
                  lambda t: pa.table({"o_orderkey": t.column("l_orderkey"),
                                      "s_suppkey": t.column("l_suppkey"),
                                      "rev_u": t.column("rev_u")}),
                  batch_format="pyarrow"),
              oc.select_columns(["o_orderkey", "c_nationkey"]),
              on="o_orderkey", how="inner", broadcast=False, num_buckets=32)
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    j = join(ol, supp, on="s_suppkey", how="inner")

    def _same_nation(t: pa.Table) -> pa.Table:
        m = (np_col(t, "c_nationkey").astype(np.int64)
             == np_col(t, "s_nationkey").astype(np.int64))
        t = t.filter(pa.array(m))
        return pa.table({"n_nationkey": t.column("c_nationkey")
                         .cast(pa.int64()),
                         "rev_u": t.column("rev_u")})

    agg = grouped_pandas_agg(
        j.map_batches(_same_nation, batch_format="pyarrow"),
        keys=["n_nationkey"], aggs={"revenue_u": ("rev_u", "sum")},
        num_buckets=8)
    rows = agg.take_all()
    rows.sort(key=lambda r: -r["revenue_u"])
    return pa.table({
        "n_name": pa.array([nkeys[int(r["n_nationkey"])] for r in rows],
                           pa.string()),
        "revenue_u": pa.array([r["revenue_u"] for r in rows], pa.int64())})


def q6(sf_dir: str, lo: str = "1997-01-01", hi: str = "1998-01-01",
       dp_lo: int = 5, dp_hi: int = 7, qty_lt: int = 24) -> pa.Table:
    """Q6 forecast-revenue change: one filtered scan, ZERO shuffle —
    each block emits a single (n, rev) partial and the driver folds
    block-count scalars.  Revenue here is extendedprice·discount →
    cents·dp (1e-4 dollar units); the discount band compares integer
    percent on both engines so the float storage can't blur the edge."""
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_shipdate", "l_quantity",
                                    "l_extendedprice", "l_discount"])

    def _partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), _ts(lo)),
                    pc.less(t.column("l_shipdate"), _ts(hi)))
        t = t.filter(m)
        dp = _pct(t, "l_discount")
        qty = np.floor(_f64(t, "l_quantity") + 0.5).astype(np.int64)
        keep = (dp >= dp_lo) & (dp <= dp_hi) & (qty < qty_lt)
        rev = _cents(t, "l_extendedprice")[keep] * dp[keep]
        return pa.table({"n": pa.array([int(keep.sum())], pa.int64()),
                         "rev_u": pa.array([int(rev.sum())], pa.int64())})

    parts = line.map_batches(_partial, batch_format="pyarrow").take_all()
    return pa.table({
        "n": pa.array([sum(r["n"] for r in parts)], pa.int64()),
        "rev_u": pa.array([sum(r["rev_u"] for r in parts)], pa.int64())})


def q10(sf_dir: str, lo: str = "1997-10-01", hi: str = "1998-01-01",
        k: int = 20) -> pa.Table:
    """Q10 returned-item reporting: lost revenue per customer from
    'R'-flagged lineitems of one quarter's orders, top-k customers.
    Both joins partition on their natural keys (orderkey then custkey);
    the returned-revenue aggregate collapses per custkey BEFORE the
    customer join so the second exchange moves one row per customer,
    not one per lineitem."""
    line = _rev_line(sf_dir, ["l_orderkey"], flag="R")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def _oprep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("o_orderdate"), _ts(lo)),
                    pc.less(t.column("o_orderdate"), _ts(hi)))
        t = t.filter(m)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "c_custkey": t.column("o_custkey")})

    j = join(line.map_batches(
                 lambda t: pa.table({"o_orderkey": t.column("l_orderkey"),
                                     "rev_u": t.column("rev_u")}),
                 batch_format="pyarrow"),
             orders.map_batches(_oprep, batch_format="pyarrow"),
             on="o_orderkey", how="inner", broadcast=False, num_buckets=32)
    per_cust = grouped_pandas_agg(
        j, keys=["c_custkey"], aggs={"revenue_u": ("rev_u", "sum"),
                                     "n_items": ("rev_u", "count")},
        num_buckets=16)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_acctbal"])
    cust = cust.map_batches(
        lambda t: pa.table({"c_custkey": t.column("c_custkey"),
                            "c_name": t.column("c_name"),
                            "acctbal_c": pa.array(_cents(t, "c_acctbal"),
                                                  pa.int64())}),
        batch_format="pyarrow")
    full = join(per_cust, cust, on="c_custkey", how="inner",
                broadcast=False, num_buckets=16)
    return top_k(full, by="revenue_u", k=k, tie_cols=["c_custkey"])


def q12(sf_dir: str, lo: str = "1997-01-01", hi: str = "1998-01-01") -> pa.Table:
    """Q12 shipping-mode priority split, adapted: grouped by
    l_linestatus (this snapshot has no l_shipmode) — per status, how
    many lineitems shipped in the window belong to high-priority
    (1-URGENT/2-HIGH) vs lower-priority orders.  The 0/1 priority flag
    is computed on the orders side before the single orderkey-bucketed
    exchange, and the final aggregate is 2 rows."""
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_linestatus",
                                    "l_shipdate"])

    def _lprep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), _ts(lo)),
                    pc.less(t.column("l_shipdate"), _ts(hi)))
        t = t.filter(m)
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "l_linestatus": t.column("l_linestatus")})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def _oprep(t: pa.Table) -> pa.Table:
        pr = t.column("o_orderpriority")
        hi_m = pc.or_(pc.equal(pr, "1-URGENT"), pc.equal(pr, "2-HIGH"))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "is_high": pa.array(
                             np.asarray(hi_m.to_numpy(
                                 zero_copy_only=False), np.int64))})

    j = join(line.map_batches(_lprep, batch_format="pyarrow"),
             orders.map_batches(_oprep, batch_format="pyarrow"),
             on="o_orderkey", how="inner", broadcast=False, num_buckets=32)
    agg = grouped_pandas_agg(
        j, keys=["l_linestatus"],
        aggs={"high_n": ("is_high", "sum"), "n": ("is_high", "count")},
        key_fn=lambda b: _str_hash(b.column("l_linestatus")), num_buckets=4)
    rows = agg.take_all()
    rows.sort(key=lambda r: r["l_linestatus"])
    return pa.table({
        "l_linestatus": pa.array([r["l_linestatus"] for r in rows],
                                 pa.string()),
        "high_n": pa.array([r["high_n"] for r in rows], pa.int64()),
        "low_n": pa.array([r["n"] - r["high_n"] for r in rows], pa.int64())})


def q14(sf_dir: str, lo: str = "1997-09-01", hi: str = "1997-10-01") -> pa.Table:
    """Q14 promotion effect: PROMO-type share of one month's revenue.
    part joins by the auto-picked shape (broadcast while the part dim
    fits the limit); the promo/total split folds as two int64 partials
    per block with no further exchange — the ratio derives driver-side
    from the two exact integers (spec reports 100·promo/total)."""
    line = _rev_line(sf_dir, ["l_partkey"], lo=lo, hi=hi)
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    part = part.map_batches(
        lambda t: pa.table({"l_partkey": t.column("p_partkey"),
                            "is_promo": pa.array(np.asarray(
                                pc.equal(t.column("p_type"), "PROMO")
                                .to_numpy(zero_copy_only=False), np.int64))}),
        batch_format="pyarrow")
    j = join(line, part, on="l_partkey", how="inner")

    def _partial(t: pa.Table) -> pa.Table:
        rev = np_col(t, "rev_u")
        promo = np_col(t, "is_promo")
        return pa.table({
            "promo_rev_u": pa.array([int((rev * promo).sum())], pa.int64()),
            "total_rev_u": pa.array([int(rev.sum())], pa.int64())})

    parts = j.map_batches(_partial, batch_format="pyarrow").take_all()
    return pa.table({
        "promo_rev_u": pa.array([sum(r["promo_rev_u"] for r in parts)],
                                pa.int64()),
        "total_rev_u": pa.array([sum(r["total_rev_u"] for r in parts)],
                                pa.int64())})


def q7(sf_dir: str, nations: tuple = ("NATION_0", "NATION_1", "NATION_2",
                                      "NATION_3"),
       lo: str = "1996-01-01", hi: str = "1998-01-01") -> pa.Table:
    """Q7 volume shipping: revenue flowing between distinct nations of
    a small trading bloc (the spec's two-nation pair generalized to an
    ordered-pair matrix so the result is non-trivial at every sf), per
    (supplier nation, customer nation, ship year).
    Same two big partitioned exchanges as Q5 (orders⋈customer on
    custkey, ⋈lineitem on orderkey); the supplier dim joins by the
    auto-picked shape and both nation filters are vectorized
    post-filters over broadcast constant-cardinality nation keys."""
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()
    names = {r["n_nationkey"]: r["n_name"] for r in nat}
    keys = {k for k, v in names.items() if v in nations}
    key_arr = np.array(sorted(keys), np.int64)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: t.filter(pa.array(np.isin(
            np_col(t, "c_nationkey").astype(np.int64), key_arr))),
        batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    oc = join(orders.map_batches(
                  lambda t: pa.table({"o_orderkey": t.column("o_orderkey"),
                                      "c_custkey": t.column("o_custkey")}),
                  batch_format="pyarrow"),
              cust, on="c_custkey", how="inner", broadcast=False,
              num_buckets=32)

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])

    def _lprep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), _ts(lo)),
                    pc.less(t.column("l_shipdate"), _ts(hi)))
        t = t.filter(m)
        rev = _cents(t, "l_extendedprice") * (100 - _pct(t, "l_discount"))
        yr = pd.DatetimeIndex(
            t.column("l_shipdate").to_pandas()).year.to_numpy(np.int64)
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "s_suppkey": t.column("l_suppkey"),
                         "l_year": pa.array(yr, pa.int64()),
                         "rev_u": pa.array(rev, pa.int64())})

    ol = join(line.map_batches(_lprep, batch_format="pyarrow"),
              oc.select_columns(["o_orderkey", "c_nationkey"]),
              on="o_orderkey", how="inner", broadcast=False, num_buckets=32)
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    j = join(ol, supp, on="s_suppkey", how="inner")

    def _pairs(t: pa.Table) -> pa.Table:
        sn = np_col(t, "s_nationkey").astype(np.int64)
        cn = np_col(t, "c_nationkey").astype(np.int64)
        m = np.isin(sn, key_arr) & np.isin(cn, key_arr) & (sn != cn)
        t = t.filter(pa.array(m))
        return pa.table({"sn": pa.array(sn[m], pa.int64()),
                         "cn": pa.array(cn[m], pa.int64()),
                         "l_year": t.column("l_year"),
                         "rev_u": t.column("rev_u")})

    agg = grouped_pandas_agg(
        j.map_batches(_pairs, batch_format="pyarrow"),
        keys=["sn", "cn", "l_year"],
        aggs={"revenue_u": ("rev_u", "sum")}, num_buckets=8)
    rows = agg.take_all()
    rows.sort(key=lambda r: (r["sn"], r["cn"], r["l_year"]))
    return pa.table({
        "supp_nation": pa.array([names[int(r["sn"])] for r in rows],
                                pa.string()),
        "cust_nation": pa.array([names[int(r["cn"])] for r in rows],
                                pa.string()),
        "l_year": pa.array([r["l_year"] for r in rows], pa.int64()),
        "revenue_u": pa.array([r["revenue_u"] for r in rows], pa.int64())})


def q13(sf_dir: str) -> pa.Table:
    """Q13 customer order-count distribution: how many customers
    placed exactly c orders, INCLUDING the zero-order customers the
    inner count would drop (the spec's LEFT JOIN).  Per-customer
    counts collapse in one bucketed pass; the left join against the
    customer dim moves one row per customer; the final distribution is
    an int_histogram-style driver fold of ≤ max_count bins."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])
    per_cust = grouped_pandas_agg(
        orders.map_batches(
            lambda t: pa.table({"c_custkey": t.column("o_custkey")}),
            batch_format="pyarrow"),
        keys=["c_custkey"], aggs={"n_orders": ("c_custkey", "count")},
        num_buckets=16)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    full = join(cust, per_cust, on="c_custkey", how="left",
                broadcast=False, num_buckets=16)

    def _partial(t: pa.Table) -> pa.Table:
        n = t.column("n_orders").to_numpy(zero_copy_only=False)
        n = np.where(np.isnan(n.astype(np.float64)), 0,
                     n.astype(np.float64)).astype(np.int64)
        c, cnt = np.unique(n, return_counts=True)
        return pa.table({"c_count": pa.array(c, pa.int64()),
                         "custdist": pa.array(cnt.astype(np.int64),
                                              pa.int64())})

    parts = full.map_batches(_partial, batch_format="pyarrow").take_all()
    acc: dict[int, int] = {}
    for r in parts:
        acc[r["c_count"]] = acc.get(r["c_count"], 0) + r["custdist"]
    ks = sorted(acc)
    return pa.table({"c_count": pa.array(ks, pa.int64()),
                     "custdist": pa.array([acc[k] for k in ks], pa.int64())})


def q15(sf_dir: str, lo: str = "1997-01-01", hi: str = "1997-04-01") -> pa.Table:
    """Q15 top supplier: the quarter's revenue leader (deterministic
    tie-break on suppkey — the spec's all-max variant collapses to the
    first under that total order).  One grouped collapse to one row
    per supplier, then distributed top-k with k=1."""
    line = _rev_line(sf_dir, ["l_suppkey"], lo=lo, hi=hi)
    agg = grouped_pandas_agg(
        line.map_batches(
            lambda t: pa.table({"s_suppkey": t.column("l_suppkey"),
                                "rev_u": t.column("rev_u")}),
            batch_format="pyarrow"),
        keys=["s_suppkey"], aggs={"total_rev_u": ("rev_u", "sum")},
        num_buckets=8)
    return top_k(agg, by="total_rev_u", k=1, tie_cols=["s_suppkey"])


def q17(sf_dir: str, brand: str = "Brand#12") -> pa.Table:
    """Q17 small-quantity-order revenue: lineitems of one brand's
    parts whose quantity is below 20% of that part's average quantity.
    The correlated avg subquery becomes one grouped (Σqty, n) per part
    and the 0.2·avg comparison the exact integer cross-multiplication
    5·qty·n < Σqty — no float division anywhere.  Brand keys broadcast;
    the stats join partitions on partkey; output is two int64 scalars
    (spec divides by 7.0 driver-side)."""
    import ray

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    bk = part.map_batches(
        lambda t: t.filter(pc.equal(t.column("p_brand"), brand))
                   .select(["p_partkey"]),
        batch_format="pyarrow")
    bk_arr = np.array(sorted(r["p_partkey"] for r in bk.take_all()),
                      np.int64)
    bref = ray.put(bk_arr)

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice"])

    def _lprep(t: pa.Table) -> pa.Table:
        keys = ray.get(bref)
        pk = np_col(t, "l_partkey").astype(np.int64)
        m = np.isin(pk, keys)
        t = t.filter(pa.array(m))
        qty = np.floor(_f64(t, "l_quantity") + 0.5).astype(np.int64)
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "qty": pa.array(qty, pa.int64()),
                         "cents": pa.array(_cents(t, "l_extendedprice"),
                                           pa.int64())})

    li = line.map_batches(_lprep, batch_format="pyarrow").materialize()
    stats = grouped_pandas_agg(
        li, keys=["l_partkey"],
        aggs={"sum_qty": ("qty", "sum"), "n_li": ("qty", "count")},
        num_buckets=8)
    j = join(li, stats, on="l_partkey", how="inner", broadcast=False,
             num_buckets=8)

    def _partial(t: pa.Table) -> pa.Table:
        keep = (5 * np_col(t, "qty") * np_col(t, "n_li")
                < np_col(t, "sum_qty"))
        return pa.table({
            "n": pa.array([int(keep.sum())], pa.int64()),
            "sum_cents": pa.array([int(np_col(t, "cents")[keep].sum())],
                                  pa.int64())})

    parts = j.map_batches(_partial, batch_format="pyarrow").take_all()
    return pa.table({
        "n": pa.array([sum(r["n"] for r in parts)], pa.int64()),
        "sum_cents": pa.array([sum(r["sum_cents"] for r in parts)],
                              pa.int64())})


def q22(sf_dir: str) -> pa.Table:
    """Q22 global-sales opportunity: customers with above-average
    positive balance and no URGENT order, per nation (this corpus
    gives every customer at least one order at every sf — the
    cust_no_orders query pins that — so the spec's no-orders predicate
    is tightened to no-1-URGENT-order to stay non-trivial).  The global average is
    two int64 scalars folded from block partials (zero shuffle); the
    above-average filter is the exact cross-multiplication
    bal·n > Σbal; the no-orders predicate is the distributed ANTI
    join; one tiny grouped sum per nation ends it."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])
    cb = cust.map_batches(
        lambda t: pa.table({"c_custkey": t.column("c_custkey"),
                            "c_nationkey": t.column("c_nationkey")
                            .cast(pa.int64()),
                            "bal_c": pa.array(_cents(t, "c_acctbal"),
                                              pa.int64())}),
        batch_format="pyarrow").materialize()

    def _avg_partial(t: pa.Table) -> pa.Table:
        b = np_col(t, "bal_c")
        pos = b > 0
        return pa.table({"s": pa.array([int(b[pos].sum())], pa.int64()),
                         "n": pa.array([int(pos.sum())], pa.int64())})

    parts = cb.map_batches(_avg_partial, batch_format="pyarrow").take_all()
    s_pos = sum(r["s"] for r in parts)
    n_pos = max(sum(r["n"] for r in parts), 1)

    rich = cb.map_batches(
        lambda t: t.filter(pa.array(
            np_col(t, "bal_c") * n_pos > s_pos)),
        batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])
    no_orders = join(
        rich,
        orders.map_batches(
            lambda t: pa.table({"c_custkey": t.filter(pc.equal(
                t.column("o_orderpriority"), "1-URGENT"))
                .column("o_custkey")}),
            batch_format="pyarrow"),
        on="c_custkey", how="anti", broadcast=False, num_buckets=16)
    agg = grouped_pandas_agg(
        no_orders, keys=["c_nationkey"],
        aggs={"numcust": ("bal_c", "count"),
              "totacctbal_c": ("bal_c", "sum")}, num_buckets=8)
    rows = agg.take_all()
    rows.sort(key=lambda r: r["c_nationkey"])
    return pa.table({
        "c_nationkey": pa.array([r["c_nationkey"] for r in rows],
                                pa.int64()),
        "numcust": pa.array([r["numcust"] for r in rows], pa.int64()),
        "totacctbal_c": pa.array([r["totacctbal_c"] for r in rows],
                                 pa.int64())})


def q18(sf_dir: str, qty_gt: int = 200, k: int = 100) -> pa.Table:
    """Q18 large-volume customers: orders whose lineitems sum to more
    than ``qty_gt`` units, with their customer, top-k by order value.
    The HAVING collapses lineitem per orderkey in one bucketed pass
    (the survivors are a tiny fraction), so the orders and customer
    joins move only qualifying keys."""
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_quantity"])

    def _lprep(t: pa.Table) -> pa.Table:
        qty = np.floor(_f64(t, "l_quantity") + 0.5).astype(np.int64)
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "qty": pa.array(qty, pa.int64())})

    per_order = grouped_pandas_agg(
        line.map_batches(_lprep, batch_format="pyarrow"),
        keys=["o_orderkey"], aggs={"sum_qty": ("qty", "sum")},
        num_buckets=32)
    big = per_order.map_batches(
        lambda t: t.filter(pa.array(np_col(t, "sum_qty") > qty_gt)),
        batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice", "o_orderdate"])

    def _oprep(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "c_custkey": t.column("o_custkey"),
                         "total_c": pa.array(_cents(t, "o_totalprice"),
                                             pa.int64()),
                         "oday": pa.array(_day_i64(t, "o_orderdate"),
                                          pa.int64())})

    j = join(big, orders.map_batches(_oprep, batch_format="pyarrow"),
             on="o_orderkey", how="inner", broadcast=False, num_buckets=32)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    full = join(j, cust, on="c_custkey", how="inner")
    return top_k(full, by="total_c", k=k, tie_cols=["o_orderkey"])


def _nation_map(sf_dir: str) -> dict[int, str]:
    """nationkey → n_name (≤25 rows at ANY scale — the constant dim)."""
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()
    return {int(r["n_nationkey"]): r["n_name"] for r in nat}


def _region_nkeys(sf_dir: str, region: str) -> np.ndarray:
    """sorted int64 nationkeys of one region (constant-size dim fold)."""
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()
    reg = rd.read_parquet(f"{sf_dir}/region.parquet").take_all()
    rk = {r["r_regionkey"] for r in reg if r["r_name"] == region}
    return np.array(sorted(r["n_nationkey"] for r in nat
                           if r["n_regionkey"] in rk), np.int64)


def q8(sf_dir: str, region: str = "ASIA", ptype: str = "ECONOMY",
       nation: str = "NATION_2", lo: str = "1996-01-01",
       hi: str = "1998-01-01") -> pa.Table:
    """Q8 national market share, adapted to this snapshot's columns:
    within revenue from ``region``'s customers on parts of ``ptype``
    (order years in [lo,hi)), the slice supplied by ``nation``.
    The share is returned as the exact int64 pair
    (total_rev_u, nation_rev_u) per order year — the division is the
    reader's, so the hash stays float-free.  Part keys of the type and
    the suppkey→nation vector broadcast (both dims ≪ fact at any sf);
    lineitem⋈orders is the one big partitioned exchange; the
    region-customer restriction rides the same custkey shuffle shape
    as Q5."""
    import ray

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    pk = part.map_batches(
        lambda t: t.filter(pc.equal(t.column("p_type"), ptype))
                   .select(["p_partkey"]),
        batch_format="pyarrow")
    pk_arr = np.array(sorted(r["p_partkey"] for r in pk.take_all()),
                      np.int64)
    pref = ray.put(pk_arr)

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]).take_all()
    nmap = _nation_map(sf_dir)
    sk_sorted = np.array(sorted(int(r["s_suppkey"]) for r in supp),
                         np.int64)
    is_nat = np.zeros(len(sk_sorted), np.bool_)
    for r in supp:
        i = int(np.searchsorted(sk_sorted, int(r["s_suppkey"])))
        is_nat[i] = nmap[int(r["s_nationkey"])] == nation
    sref = ray.put((sk_sorted, is_nat))

    line = _rev_line(sf_dir, ["l_orderkey", "l_partkey", "l_suppkey"])

    def _lprep(t: pa.Table) -> pa.Table:
        keys = ray.get(pref)
        sks, natv = ray.get(sref)
        m = np.isin(np_col(t, "l_partkey").astype(np.int64), keys)
        t = t.filter(pa.array(m))
        sk = np_col(t, "l_suppkey").astype(np.int64)
        pos = np.searchsorted(sks, sk)
        pos = np.clip(pos, 0, len(sks) - 1)
        nat = natv[pos] & (sks[pos] == sk)
        rev = np_col(t, "rev_u")
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "rev_u": t.column("rev_u"),
                         "nat_rev_u": pa.array(np.where(nat, rev, 0),
                                               pa.int64())})

    nkey_arr = _region_nkeys(sf_dir, region)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: t.filter(pa.array(np.isin(
            np_col(t, "c_nationkey").astype(np.int64), nkey_arr)))
                   .select(["c_custkey"]),
        batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def _oprep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("o_orderdate"), _ts(lo)),
                    pc.less(t.column("o_orderdate"), _ts(hi)))
        t = t.filter(m)
        y = pc.year(t.column("o_orderdate")).cast(pa.int64())
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "c_custkey": t.column("o_custkey"),
                         "o_year": y})

    oc = join(orders.map_batches(_oprep, batch_format="pyarrow"), cust,
              on="c_custkey", how="semi", broadcast=False, num_buckets=16)
    j = join(line.map_batches(_lprep, batch_format="pyarrow"),
             oc.select_columns(["o_orderkey", "o_year"]),
             on="o_orderkey", how="inner", broadcast=False, num_buckets=32)
    agg = grouped_pandas_agg(
        j, keys=["o_year"],
        aggs={"total_rev_u": ("rev_u", "sum"),
              "nation_rev_u": ("nat_rev_u", "sum")}, num_buckets=4)
    rows = agg.take_all()
    rows.sort(key=lambda r: r["o_year"])
    return pa.table({
        "o_year": pa.array([r["o_year"] for r in rows], pa.int64()),
        "total_rev_u": pa.array([r["total_rev_u"] for r in rows],
                                pa.int64()),
        "nation_rev_u": pa.array([r["nation_rev_u"] for r in rows],
                                 pa.int64())})


def q9(sf_dir: str, name_word: str = "widget") -> pa.Table:
    """Q9 product-type profit, adapted: this snapshot has no partsupp
    (no ps_supplycost), so profit is the revenue
    extendedprice·(1−discount) of lineitems whose part name contains
    ``name_word``, grouped by (supplier nation, order year).  Part
    keys and the suppkey→nation name map broadcast; lineitem⋈orders
    on orderkey is the single big exchange; the grouped fold keys on
    (nation, year) — ≤ 25·|years| rows out."""
    import ray

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    pk = part.map_batches(
        lambda t: t.filter(pc.match_substring(t.column("p_name"),
                                              name_word))
                   .select(["p_partkey"]),
        batch_format="pyarrow")
    pk_arr = np.array(sorted(r["p_partkey"] for r in pk.take_all()),
                      np.int64)
    pref = ray.put(pk_arr)

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]).take_all()
    nmap = _nation_map(sf_dir)
    pairs = sorted((int(r["s_suppkey"]), nmap[int(r["s_nationkey"])])
                   for r in supp)
    sk_sorted = np.array([p[0] for p in pairs], np.int64)
    nat_names = np.array([p[1] for p in pairs], object)
    sref = ray.put((sk_sorted, nat_names))

    line = _rev_line(sf_dir, ["l_orderkey", "l_partkey", "l_suppkey"])

    def _lprep(t: pa.Table) -> pa.Table:
        keys = ray.get(pref)
        sks, names = ray.get(sref)
        m = np.isin(np_col(t, "l_partkey").astype(np.int64), keys)
        t = t.filter(pa.array(m))
        sk = np_col(t, "l_suppkey").astype(np.int64)
        pos = np.clip(np.searchsorted(sks, sk), 0, len(sks) - 1)
        nat = np.where(sks[pos] == sk, names[pos], "")
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "n_name": pa.array(nat, pa.string()),
                         "rev_u": t.column("rev_u")})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: pa.table({"o_orderkey": t.column("o_orderkey"),
                            "o_year": pc.year(t.column("o_orderdate"))
                            .cast(pa.int64())}),
        batch_format="pyarrow")
    j = join(line.map_batches(_lprep, batch_format="pyarrow"), orders,
             on="o_orderkey", how="inner", broadcast=False, num_buckets=32)
    agg = grouped_pandas_agg(
        j, keys=["n_name", "o_year"],
        aggs={"profit_u": ("rev_u", "sum")},
        key_fn=lambda b: _str_hash(b.column("n_name")), num_buckets=8)
    rows = agg.take_all()
    rows.sort(key=lambda r: (r["n_name"], r["o_year"]))
    return pa.table({
        "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
        "o_year": pa.array([r["o_year"] for r in rows], pa.int64()),
        "profit_u": pa.array([r["profit_u"] for r in rows], pa.int64())})


def q11(sf_dir: str, region: str = "EUROPE") -> pa.Table:
    """Q11 important stock, adapted: no partsupp/ps_supplycost, so a
    part's "value" is the total extendedprice cents shipped by
    ``region``'s suppliers, and the HAVING keeps parts whose value
    exceeds 1.5× the average part value — evaluated as the exact
    cross-multiplication 2·value·n_parts > 3·Σvalue (zero float,
    scale-invariant selectivity where the spec's fixed fraction
    degenerates as |part| grows).  The supplier-region membership
    broadcasts as a sorted key array; the per-part collapse is one
    bucketed pass; the grand (Σ, n) folds from per-block partials of
    the SAME collapsed table (driver adds ≤ num_buckets scalars)."""
    import ray

    nkey_arr = _region_nkeys(sf_dir, region)
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]).take_all()
    sk_arr = np.array(sorted(int(r["s_suppkey"]) for r in supp
                             if int(r["s_nationkey"]) in set(nkey_arr.tolist())),
                      np.int64)
    sref = ray.put(sk_arr)

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_suppkey",
                                    "l_extendedprice"])

    def _lprep(t: pa.Table) -> pa.Table:
        sks = ray.get(sref)
        m = np.isin(np_col(t, "l_suppkey").astype(np.int64), sks)
        t = t.filter(pa.array(m))
        return pa.table({"p_partkey": t.column("l_partkey"),
                         "val_c": pa.array(_cents(t, "l_extendedprice"),
                                           pa.int64())})

    per_part = grouped_pandas_agg(
        line.map_batches(_lprep, batch_format="pyarrow"),
        keys=["p_partkey"], aggs={"value_c": ("val_c", "sum")},
        num_buckets=16).materialize()
    parts = per_part.map_batches(
        lambda t: pa.table({"s": pa.array([int(np_col(t, "value_c").sum())],
                                          pa.int64()),
                            "n": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow").take_all()
    total = sum(r["s"] for r in parts)
    n_parts = sum(r["n"] for r in parts)
    keep = per_part.map_batches(
        lambda t: t.filter(pa.array(
            2 * np_col(t, "value_c") * n_parts > 3 * total)),
        batch_format="pyarrow")
    rows = keep.take_all()
    rows.sort(key=lambda r: (-r["value_c"], r["p_partkey"]))
    return pa.table({
        "p_partkey": pa.array([r["p_partkey"] for r in rows], pa.int64()),
        "value_c": pa.array([r["value_c"] for r in rows], pa.int64())})


def q16(sf_dir: str, bad_brand: str = "Brand#1", bad_type: str = "PROMO",
        sizes: tuple = (1, 4, 7, 10, 13, 16, 19, 23),
        bal_floor: float = 1000.0) -> pa.Table:
    """Q16 parts/supplier relationship, adapted: how many DISTINCT
    suppliers shipped each (p_brand, p_type, p_size) combo, over parts
    not of ``bad_brand``/``bad_type`` with size in ``sizes``, excluding
    low-balance suppliers (s_acctbal < ``bal_floor`` stands in for the
    spec's complaint-comment scan — deterministic on stored data).
    Part attrs broadcast as sorted parallel arrays; the (part,supp)
    pair distinct is one bucketed collapse of the filtered fact; the
    per-combo count shuffles one row per surviving pair."""
    import ray

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_type",
                                    "p_size"]).take_all()
    kept = sorted((int(r["p_partkey"]), r["p_brand"], r["p_type"],
                   int(r["p_size"])) for r in part
                  if r["p_brand"] != bad_brand and r["p_type"] != bad_type
                  and int(r["p_size"]) in set(sizes))
    pk_arr = np.array([k[0] for k in kept], np.int64)
    br_arr = np.array([k[1] for k in kept], object)
    ty_arr = np.array([k[2] for k in kept], object)
    sz_arr = np.array([k[3] for k in kept], np.int64)
    pref = ray.put((pk_arr, br_arr, ty_arr, sz_arr))

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_acctbal"]).take_all()
    bad_sk = np.array(sorted(int(r["s_suppkey"]) for r in supp
                             if float(r["s_acctbal"]) < bal_floor),
                      np.int64)
    bref = ray.put(bad_sk)

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_suppkey"])

    def _lprep(t: pa.Table) -> pa.Table:
        pks, _, _, _ = ray.get(pref)
        bad = ray.get(bref)
        pk = np_col(t, "l_partkey").astype(np.int64)
        sk = np_col(t, "l_suppkey").astype(np.int64)
        m = np.isin(pk, pks) & ~np.isin(sk, bad)
        return pa.table({"p_partkey": pa.array(pk[m], pa.int64()),
                         "s_suppkey": pa.array(sk[m], pa.int64())})

    pairs = grouped_pandas_agg(
        line.map_batches(_lprep, batch_format="pyarrow"),
        keys=["p_partkey", "s_suppkey"],
        aggs={"n": ("p_partkey", "count")}, num_buckets=16)

    def _attach(t: pa.Table) -> pa.Table:
        pks, brs, tys, szs = ray.get(pref)
        pk = np_col(t, "p_partkey").astype(np.int64)
        pos = np.clip(np.searchsorted(pks, pk), 0, max(len(pks) - 1, 0))
        return pa.table({"p_brand": pa.array(brs[pos], pa.string()),
                         "p_type": pa.array(tys[pos], pa.string()),
                         "p_size": pa.array(szs[pos], pa.int64()),
                         "s_suppkey": t.column("s_suppkey")})

    # two collapses: distinct (combo, supplier) first — a supplier
    # shipping several parts of the same combo must count ONCE —
    # then the per-combo count (spec's count(distinct ps_suppkey))
    combo_supp = grouped_pandas_agg(
        pairs.map_batches(_attach, batch_format="pyarrow"),
        keys=["p_brand", "p_type", "p_size", "s_suppkey"],
        aggs={"n": ("s_suppkey", "count")},
        key_fn=lambda b: _str_hash(b.column("p_brand")), num_buckets=8)
    combo = grouped_pandas_agg(
        combo_supp, keys=["p_brand", "p_type", "p_size"],
        aggs={"supplier_cnt": ("n", "count")},
        key_fn=lambda b: _str_hash(b.column("p_brand")), num_buckets=8)
    rows = combo.take_all()
    rows.sort(key=lambda r: (-r["supplier_cnt"], r["p_brand"],
                             r["p_type"], r["p_size"]))
    return pa.table({
        "p_brand": pa.array([r["p_brand"] for r in rows], pa.string()),
        "p_type": pa.array([r["p_type"] for r in rows], pa.string()),
        "p_size": pa.array([r["p_size"] for r in rows], pa.int64()),
        "supplier_cnt": pa.array([r["supplier_cnt"] for r in rows],
                                 pa.int64())})


def q19(sf_dir: str) -> pa.Table:
    """Q19 discounted revenue, adapted to the columns present (no
    l_shipmode/l_shipinstruct, p_container → p_size bands): revenue of
    lineitems matching ANY of three (brand, size-band, quantity-band)
    branches — the spec's disjunctive multi-attribute predicate shape.
    Part attrs broadcast as parallel sorted arrays; ZERO shuffle — each
    block folds one (n, rev_u) partial and the driver adds scalars."""
    import ray

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand",
                                    "p_size"]).take_all()
    rowsp = sorted((int(r["p_partkey"]), r["p_brand"], int(r["p_size"]))
                   for r in part)
    pk_arr = np.array([r[0] for r in rowsp], np.int64)
    br_arr = np.array([r[1] for r in rowsp], object)
    sz_arr = np.array([r[2] for r in rowsp], np.int64)
    pref = ray.put((pk_arr, br_arr, sz_arr))
    branches = (("Brand#12", 1, 5, 1, 11), ("Brand#23", 1, 10, 10, 20),
                ("Brand#34", 1, 15, 20, 30))

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice", "l_discount"])

    def _partial(t: pa.Table) -> pa.Table:
        pks, brs, szs = ray.get(pref)
        pk = np_col(t, "l_partkey").astype(np.int64)
        pos = np.clip(np.searchsorted(pks, pk), 0, len(pks) - 1)
        ok = pks[pos] == pk
        qty = np.floor(_f64(t, "l_quantity") + 0.5).astype(np.int64)
        keep = np.zeros(len(pk), np.bool_)
        for brand, slo, shi, qlo, qhi in branches:
            keep |= (ok & (brs[pos] == brand)
                     & (szs[pos] >= slo) & (szs[pos] <= shi)
                     & (qty >= qlo) & (qty <= qhi))
        rev = (_cents(t, "l_extendedprice")[keep]
               * (100 - _pct(t, "l_discount")[keep]))
        return pa.table({"n": pa.array([int(keep.sum())], pa.int64()),
                         "rev_u": pa.array([int(rev.sum())], pa.int64())})

    parts = line.map_batches(_partial, batch_format="pyarrow").take_all()
    return pa.table({
        "n": pa.array([sum(r["n"] for r in parts)], pa.int64()),
        "rev_u": pa.array([sum(r["rev_u"] for r in parts)], pa.int64())})


def q20(sf_dir: str, prefix: str = "small ", lo: str = "1997-01-01",
        hi: str = "1998-01-01") -> pa.Table:
    """Q20 potential part promotion, adapted: no ps_availqty, so a
    supplier qualifies when it DOMINATES some ``prefix``-named part's
    shipments in the window — shipped quantity strictly more than half
    the part's total (exact integers: 2·qty_s > qty_total).  Part keys
    broadcast; one bucketed (part, supp) collapse, one per-part total
    fold from the collapsed table, one small partitioned join between
    them; suppliers come back sorted."""
    import ray

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    pk = part.map_batches(
        lambda t: t.filter(pc.starts_with(t.column("p_name"), prefix))
                   .select(["p_partkey"]),
        batch_format="pyarrow")
    pk_arr = np.array(sorted(r["p_partkey"] for r in pk.take_all()),
                      np.int64)
    pref = ray.put(pk_arr)

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_suppkey",
                                    "l_quantity", "l_shipdate"])

    def _lprep(t: pa.Table) -> pa.Table:
        keys = ray.get(pref)
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), _ts(lo)),
                    pc.less(t.column("l_shipdate"), _ts(hi)))
        t = t.filter(m)
        pkv = np_col(t, "l_partkey").astype(np.int64)
        t = t.filter(pa.array(np.isin(pkv, keys)))
        qty = np.floor(_f64(t, "l_quantity") + 0.5).astype(np.int64)
        return pa.table({"p_partkey": t.column("l_partkey"),
                         "s_suppkey": t.column("l_suppkey"),
                         "qty": pa.array(qty, pa.int64())})

    per_pair = grouped_pandas_agg(
        line.map_batches(_lprep, batch_format="pyarrow"),
        keys=["p_partkey", "s_suppkey"], aggs={"qty_s": ("qty", "sum")},
        num_buckets=16).materialize()
    per_part = grouped_pandas_agg(
        per_pair.select_columns(["p_partkey", "qty_s"]).map_batches(
            lambda t: pa.table({"p_partkey": t.column("p_partkey"),
                                "q": t.column("qty_s")}),
            batch_format="pyarrow"),
        keys=["p_partkey"], aggs={"qty_total": ("q", "sum")},
        num_buckets=16)
    j = join(per_pair, per_part, on="p_partkey", how="inner",
             broadcast=False, num_buckets=16)
    dom = j.map_batches(
        lambda t: t.filter(pa.array(
            2 * np_col(t, "qty_s") > np_col(t, "qty_total")))
                 .select(["s_suppkey"]),
        batch_format="pyarrow")
    sks = sorted({r["s_suppkey"] for r in dom.take_all()})
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"]).take_all()
    names = {int(r["s_suppkey"]): r["s_name"] for r in supp}
    return pa.table({
        "s_suppkey": pa.array(sks, pa.int64()),
        "s_name": pa.array([names[int(s)] for s in sks], pa.string())})


def q21(sf_dir: str, k: int = 100) -> pa.Table:
    """Q21 suppliers who kept orders waiting, adapted: no
    l_commitdate/l_receiptdate, so the "failed delivery" marker is an
    'R'-returned lineitem — per finished ('F') multi-supplier order,
    the supplier who is the UNIQUE one with a returned line takes the
    blame.  One bucketed (order, supp) collapse carries any_r; the
    per-order (n_supp, n_r) fold and the blame join ride the SAME
    orderkey buckets; the final per-supplier count moves one row per
    blamed (order, supplier)."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])
    fo = orders.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderstatus"), "F"))
                   .select(["o_orderkey"]),
        batch_format="pyarrow")
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey",
                                    "l_returnflag"])

    def _lprep(t: pa.Table) -> pa.Table:
        r = pc.equal(t.column("l_returnflag"), "R")
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "s_suppkey": t.column("l_suppkey"),
                         "r": r.cast(pa.int64())})

    li = join(line.map_batches(_lprep, batch_format="pyarrow"), fo,
              on="o_orderkey", how="semi", broadcast=False, num_buckets=32)
    per_pair = grouped_pandas_agg(
        li, keys=["o_orderkey", "s_suppkey"], aggs={"any_r": ("r", "max")},
        num_buckets=32).materialize()
    per_order = grouped_pandas_agg(
        per_pair.map_batches(
            lambda t: pa.table({"o_orderkey": t.column("o_orderkey"),
                                "one": pc.cast(pc.greater_equal(
                                    t.column("any_r"), -1), pa.int64()),
                                "r": t.column("any_r")}),
            batch_format="pyarrow"),
        keys=["o_orderkey"], aggs={"n_supp": ("one", "sum"),
                                   "n_r": ("r", "sum")}, num_buckets=32)
    j = join(per_pair, per_order, on="o_orderkey", how="inner",
             broadcast=False, num_buckets=32)
    blamed = j.map_batches(
        lambda t: t.filter(pa.array(
            (np_col(t, "any_r") == 1) & (np_col(t, "n_supp") >= 2)
            & (np_col(t, "n_r") == 1))).select(["s_suppkey"]),
        batch_format="pyarrow")
    cnt = grouped_pandas_agg(
        blamed.map_batches(
            lambda t: pa.table({"s_suppkey": t.column("s_suppkey"),
                                "one": pa.array(
                                    np.ones(len(t), np.int64), pa.int64())}),
            batch_format="pyarrow"),
        keys=["s_suppkey"], aggs={"numwait": ("one", "sum")}, num_buckets=8)
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    full = join(cnt, supp, on="s_suppkey", how="inner")
    # distributed top-k (per-block partials, driver merges ≤ k·blocks
    # rows) — never the full supplier table, even though that table is
    # entity-small today
    from .ops import top_k

    t = top_k(full, "numwait", k, descending=True, tie_cols=["s_name"])
    return pa.table({
        "s_name": t.column("s_name").cast(pa.string()),
        "numwait": t.column("numwait").cast(pa.int64())})


def q2(sf_dir: str, size_max: int = 10, ptype: str = "LARGE",
       region: str = "EUROPE", k: int = 100) -> pa.Table:
    """Q2 minimum-cost supplier, adapted: no partsupp, so for each
    part of size ≤ ``size_max`` and ``ptype`` the candidate suppliers are those of
    ``region`` that actually shipped it, and "cost" is the supplier's
    total shipped extendedprice cents for that part — the per-part
    argmin (min cost, then min suppkey — the spec's deterministic
    tie-break) computed as two grouped folds over the SAME partkey
    buckets plus one filter join, never a driver-side group.  Output
    is the spec's top-k by (balance desc, suppkey)."""
    import ray

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_size", "p_type"])
    pk = part.map_batches(
        lambda t: t.filter(pc.and_(
            pc.less_equal(t.column("p_size"), size_max),
            pc.equal(t.column("p_type"), ptype))).select(["p_partkey"]),
        batch_format="pyarrow")
    pk_arr = np.array(sorted(r["p_partkey"] for r in pk.take_all()),
                      np.int64)
    pref = ray.put(pk_arr)

    nkey_set = set(_region_nkeys(sf_dir, region).tolist())
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name", "s_acctbal",
                                    "s_nationkey"]).take_all()
    nmap = _nation_map(sf_dir)
    sk_arr = np.array(sorted(int(r["s_suppkey"]) for r in supp
                             if int(r["s_nationkey"]) in nkey_set),
                      np.int64)
    sref = ray.put(sk_arr)

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_suppkey",
                                    "l_extendedprice"])

    def _lprep(t: pa.Table) -> pa.Table:
        pks = ray.get(pref)
        sks = ray.get(sref)
        pkv = np_col(t, "l_partkey").astype(np.int64)
        skv = np_col(t, "l_suppkey").astype(np.int64)
        m = np.isin(pkv, pks) & np.isin(skv, sks)
        t = t.filter(pa.array(m))
        return pa.table({"p_partkey": t.column("l_partkey"),
                         "s_suppkey": t.column("l_suppkey"),
                         "cost_c": pa.array(_cents(t, "l_extendedprice"),
                                            pa.int64())})

    per_pair = grouped_pandas_agg(
        line.map_batches(_lprep, batch_format="pyarrow"),
        keys=["p_partkey", "s_suppkey"], aggs={"cost_c": ("cost_c", "sum")},
        num_buckets=8).materialize()
    per_part_min = grouped_pandas_agg(
        per_pair.map_batches(
            lambda t: pa.table({"p_partkey": t.column("p_partkey"),
                                "c": t.column("cost_c")}),
            batch_format="pyarrow"),
        keys=["p_partkey"], aggs={"min_c": ("c", "min")}, num_buckets=8)
    j = join(per_pair, per_part_min, on="p_partkey", how="inner",
             broadcast=False, num_buckets=8)
    at_min = j.map_batches(
        lambda t: t.filter(pa.array(
            np_col(t, "cost_c") == np_col(t, "min_c"))),
        batch_format="pyarrow")
    winner = grouped_pandas_agg(
        at_min.map_batches(
            lambda t: pa.table({"p_partkey": t.column("p_partkey"),
                                "s": t.column("s_suppkey")}),
            batch_format="pyarrow"),
        keys=["p_partkey"], aggs={"s_suppkey": ("s", "min")}, num_buckets=8)
    rows = winner.take_all()
    sinfo = {int(r["s_suppkey"]): (r["s_name"],
                                   int(np.sign(float(r["s_acctbal"]))
                                       * np.floor(abs(float(r["s_acctbal"]))
                                                  * 100.0 + 0.5)),
                                   nmap[int(r["s_nationkey"])])
             for r in supp}
    out = [(sinfo[int(r["s_suppkey"])][1], int(r["s_suppkey"]),
            sinfo[int(r["s_suppkey"])][0], sinfo[int(r["s_suppkey"])][2],
            int(r["p_partkey"])) for r in rows]
    out.sort(key=lambda x: (-x[0], x[1], x[4]))
    out = out[:k]
    return pa.table({
        "s_acctbal_c": pa.array([x[0] for x in out], pa.int64()),
        "s_suppkey": pa.array([x[1] for x in out], pa.int64()),
        "s_name": pa.array([x[2] for x in out], pa.string()),
        "n_name": pa.array([x[3] for x in out], pa.string()),
        "p_partkey": pa.array([x[4] for x in out], pa.int64())})
