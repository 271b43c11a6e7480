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
