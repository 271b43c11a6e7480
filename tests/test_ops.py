"""Operator-level tests (SURVEY.md §2.4): bucketed aggregation,
salting equivalence (salted == unsalted combine), distributed top-k."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.ops import grouped_pandas_agg, hash_bucket_agg, neighbor_reduce, top_k
from essentials_rd.util import np_col


def _msgs(n=5000, keys=50, seed=3):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, keys, n).astype(np.int64)
    v = rng.random(n)
    return pa.table({"dst": pa.array(k, pa.int64()), "msg": pa.array(v)}), k, v


def test_grouped_pandas_agg_matches_numpy():
    t, k, v = _msgs()
    ds = rd.from_arrow(t)
    out = grouped_pandas_agg(
        ds, ["dst"], {"total": ("msg", "sum"), "n": ("msg", "count")}, num_buckets=7
    ).take_all()
    got = {r["dst"]: (r["total"], r["n"]) for r in out}
    for key in np.unique(k):
        m = k == key
        assert got[key][1] == m.sum()
        assert abs(got[key][0] - v[m].sum()) < 1e-9


@pytest.mark.parametrize("how", ["sum", "min", "max", "count"])
def test_neighbor_reduce_salted_equals_unsalted(how):
    t, k, v = _msgs(n=8000, keys=30)
    ds = rd.from_arrow(t)
    # hub = the most frequent keys
    uniq, counts = np.unique(k, return_counts=True)
    hubs = uniq[np.argsort(-counts)[:3]]
    plain = neighbor_reduce(rd.from_arrow(t), "dst", "msg", how=how).take_all()
    salted = neighbor_reduce(
        rd.from_arrow(t), "dst", "msg", how=how, hot_keys=hubs, num_salts=4
    ).take_all()
    p = {r["dst"]: r["msg"] for r in plain}
    s = {r["dst"]: r["msg"] for r in salted}
    assert set(p) == set(s)
    for key in p:
        assert abs(p[key] - s[key]) < 1e-9, (key, p[key], s[key])


def test_neighbor_reduce_matches_numpy():
    t, k, v = _msgs(n=4000, keys=20, seed=9)
    out = neighbor_reduce(rd.from_arrow(t), "dst", "msg", how="sum").take_all()
    got = {r["dst"]: r["msg"] for r in out}
    for key in np.unique(k):
        assert abs(got[key] - v[k == key].sum()) < 1e-9


def test_top_k():
    rng = np.random.default_rng(7)
    v = rng.permutation(10_000).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(len(v)), pa.int64()),
                  "score": pa.array(v, pa.int64())})
    ).repartition(8)
    t = top_k(ds, "score", 10)
    assert np_col(t, "score").tolist() == list(range(9999, 9989, -1))


def test_hash_bucket_agg_key_completeness():
    # every key must appear in exactly one bucket's group_fn call
    t, k, _ = _msgs(n=2000, keys=40, seed=5)

    def count_keys(grp: pa.Table) -> pa.Table:
        u = np.unique(np_col(grp, "dst"))
        return pa.table({"dst": pa.array(u, pa.int64()),
                         "seen": pa.array(np.ones(len(u), np.int64), pa.int64())})

    out = hash_bucket_agg(
        rd.from_arrow(t), lambda b: np_col(b, "dst"), count_keys, num_buckets=5
    ).take_all()
    seen = {}
    for r in out:
        seen[r["dst"]] = seen.get(r["dst"], 0) + r["seen"]
    assert set(seen) == set(np.unique(k).tolist())
    assert all(v == 1 for v in seen.values())


def test_grouped_pandas_agg_fast_path_multikey_matches_pandas():
    # int multi-key + min/max/sum/count → exercises the lexsort/reduceat
    # fast path; the pandas groupby is the reference semantics
    import pandas as pd

    rng = np.random.default_rng(11)
    n = 6000
    a = rng.integers(-50, 50, n).astype(np.int64)
    b = rng.integers(0, 9, n).astype(np.int64)
    v = rng.integers(-1000, 1000, n).astype(np.int64)
    w = rng.random(n)
    t = pa.table({"a": pa.array(a), "b": pa.array(b),
                  "v": pa.array(v), "w": pa.array(w)})
    out = grouped_pandas_agg(
        rd.from_arrow(t).repartition(6),
        ["a", "b"],
        {"vmin": ("v", "min"), "vmax": ("v", "max"),
         "wsum": ("w", "sum"), "n": ("v", "count")},
        key_fn=lambda bt: np_col(bt, "a") * np.int64(31) + np_col(bt, "b"),
        num_buckets=5,
    ).take_all()
    ref = (
        pd.DataFrame({"a": a, "b": b, "v": v, "w": w})
        .groupby(["a", "b"], sort=True)
        .agg(vmin=("v", "min"), vmax=("v", "max"),
             wsum=("w", "sum"), n=("v", "count"))
        .reset_index()
    )
    got = {(r["a"], r["b"]): r for r in out}
    assert len(got) == len(ref)
    for _, r in ref.iterrows():
        g = got[(r["a"], r["b"])]
        assert g["vmin"] == r["vmin"] and g["vmax"] == r["vmax"]
        assert g["n"] == r["n"]
        assert abs(g["wsum"] - r["wsum"]) < 1e-9


def test_grouped_pandas_agg_string_value_min():
    # string VALUE columns still take the fast path (object reduceat
    # compares lexicographically); result must be the deterministic min
    t = pa.table({
        "k": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "s": pa.array(["b", "a", "z", "m", "q"], pa.string()),
    })
    out = grouped_pandas_agg(
        rd.from_arrow(t), ["k"], {"smin": ("s", "min")}, num_buckets=2
    ).take_all()
    got = {r["k"]: r["smin"] for r in out}
    assert got == {1: "a", 2: "m"}


def test_grouped_top_k_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import grouped_top_k

    rng = np.random.default_rng(8)
    n = 500
    df = pd.DataFrame({
        "g": rng.integers(0, 7, n).astype(np.int64),
        "v": rng.integers(0, 40, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    out = grouped_top_k(ds, ["g"], "v", 3, descending=True,
                        tie_cols=["id"]).take_all()
    ref = (df.sort_values(["g", "v", "id"], ascending=[True, False, True])
             .groupby("g").head(3))
    ref = ref.assign(rank=ref.groupby("g").cumcount() + 1)
    got = {(r["g"], r["rank"]): (r["v"], r["id"]) for r in out}
    want = {(r.g, r.rank): (r.v, r.id) for r in ref.itertuples()}
    assert got == want


def test_exact_quantiles_match_duckdb_rule():
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import exact_quantiles

    rng = np.random.default_rng(9)
    vals = rng.integers(1, 60, 1111).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})).repartition(6)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = exact_quantiles(ds, "x", qs)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1) AS x", [vals.tolist()])
    want = [con.execute(
        f"SELECT CAST(quantile_disc(x, {q}) AS BIGINT) FROM t").fetchone()[0]
        for q in qs]
    assert got == want


def test_exact_quantiles_cont_bit_identical_to_duckdb():
    """Dyadic quantiles make quantile_cont's lerp exactly representable,
    so the distributed histogram result must equal DuckDB bit-for-bit
    (==, not allclose)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import exact_quantiles_cont

    rng = np.random.default_rng(17)
    vals = rng.integers(1, 500, 1237).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})).repartition(7)
    qs = [0.125, 0.25, 0.5, 0.75, 0.875]
    got = exact_quantiles_cont(ds, "x", qs)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1) AS x", [vals.tolist()])
    want = [con.execute(
        f"SELECT CAST(quantile_cont(x, {q}) AS DOUBLE) FROM t").fetchone()[0]
        for q in qs]
    assert got == want


def test_grouped_distinct_count_matches_pandas():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import grouped_distinct_count

    rng = np.random.default_rng(5)
    k = rng.integers(0, 50, 5000).astype("int64")
    v = rng.integers(0, 30, 5000).astype("int64")
    tbl = pa.table({"k": pa.array(k), "v": pa.array(v)})
    want = (
        tbl.to_pandas().groupby("k")["v"].nunique().rename("n").reset_index()
        .sort_values("k").reset_index(drop=True)
    )
    for nb in (1, 16):
        got = (
            grouped_distinct_count(
                rd.from_arrow(tbl), "k", "v", out_col="n", num_buckets=nb
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert got["k"].tolist() == want["k"].tolist()
        assert got["n"].tolist() == want["n"].tolist()


def test_grouped_quantiles_matches_duckdb_semantics():
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import grouped_quantiles

    rng = np.random.default_rng(9)
    lang = np.array(["aa", "bb", "cc"], object)[rng.integers(0, 3, 2000)]
    v = rng.integers(0, 500, 2000).astype("int64")
    tbl = pa.table({"lang": pa.array(lang.tolist(), pa.string()),
                    "n": pa.array(v)})
    qs = [0.25, 0.5, 0.9]
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        " UNION ALL ".join(
            f"SELECT lang, CAST({q} AS DOUBLE) AS q, "
            f"CAST(quantile_disc(n, {q}) AS BIGINT) AS value FROM t GROUP BY lang"
            for q in qs
        )
        + " ORDER BY lang, q"
    ).df().reset_index(drop=True)
    for nb in (1, 8):
        got = (
            grouped_quantiles(rd.from_arrow(tbl), "lang", "n", qs,
                              num_buckets=nb)
            .to_pandas().sort_values(["lang", "q"]).reset_index(drop=True)
        )
        assert got.equals(want), f"num_buckets={nb}"


def test_manual_bucket_agg_equals_hash_bucket_agg():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg, manual_bucket_agg
    from essentials_rd.util import np_col, segment_sum

    rng = np.random.default_rng(3)
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 200, 4000).astype("int64")),
            "v": pa.array(rng.integers(0, 10, 4000).astype("int64")),
        }
    )

    def _agg(grp: pa.Table) -> pa.Table:
        u, s, _ = segment_sum(np_col(grp, "k"), np_col(grp, "v"))
        return pa.table({"k": pa.array(u, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    empty = pa.table({"k": pa.array([], pa.int64()),
                      "s": pa.array([], pa.int64())})
    key = lambda b: np_col(b, "k")  # noqa: E731
    ds = rd.from_arrow(tbl).repartition(7)
    a = (hash_bucket_agg(ds, key, _agg, num_buckets=5).to_pandas()
         .sort_values("k").reset_index(drop=True))
    b = (manual_bucket_agg(ds, key, _agg, empty, num_buckets=5).to_pandas()
         .sort_values("k").reset_index(drop=True))
    assert a.equals(b)
    # single-bucket degenerate path
    c = (manual_bucket_agg(ds, key, _agg, empty, num_buckets=1).to_pandas()
         .sort_values("k").reset_index(drop=True))
    assert a.equals(c)


def test_hll_distinct_accuracy_and_layout_invariance():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import hll_distinct

    rng = np.random.default_rng(7)
    # ~60k distinct ids among 200k rows
    vals = rng.integers(0, 60_000, 200_000).astype("int64")
    exact = len(np.unique(vals))
    tbl = pa.table({"v": pa.array(vals)})
    est = hll_distinct(rd.from_arrow(tbl).repartition(16), "v", p=14)
    assert abs(est - exact) / exact < 0.02, (est, exact)
    # deterministic and block-layout-invariant (register merge is a max)
    est2 = hll_distinct(rd.from_arrow(tbl).repartition(3), "v", p=14)
    assert est == est2


def test_hll_small_range_linear_counting():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import hll_distinct

    tbl = pa.table({"v": pa.array(np.arange(100, dtype="int64"))})
    est = hll_distinct(rd.from_arrow(tbl), "v", p=12)
    assert abs(est - 100) / 100 < 0.05, est


def test_hll_registers_layout_invariant_and_dedup_invariant():
    """The sketch table is a pure function of the value SET — same
    registers across block layouts and after duplicating every row."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import hll_registers

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 5_000, 20_000).astype("int64")
    tbl = pa.table({"v": pa.array(vals)})
    dup = pa.table({"v": pa.array(np.r_[vals, vals])})
    a = hll_registers(rd.from_arrow(tbl).repartition(7), "v", p=8)
    b = hll_registers(rd.from_arrow(tbl).repartition(2), "v", p=8)
    c = hll_registers(rd.from_arrow(dup), "v", p=8)
    assert a.equals(b) and a.equals(c)
    assert a.num_rows == 256


def test_hll_registers_by_equals_per_group_sketch():
    """Each group's rows of the grouped sketch equal the nonzero cells
    of a standalone hll_registers over that group's subset, the result
    is layout-invariant, and per-group estimates land within the p=8
    error band."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import (hll_estimate_from_registers,
                                   hll_registers, hll_registers_by)

    rng = np.random.default_rng(17)
    n = 60_000
    grp = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    # distinct pools of very different sizes per group
    pool = {"a": 200, "b": 3_000, "c": 12_000}
    vals = np.array([rng.integers(0, pool[g]) + hash(g) % 97_000 * 1_000
                     for g in grp], dtype="int64")
    tbl = pa.table({"g": pa.array(grp), "v": pa.array(vals)})
    out = (hll_registers_by(rd.from_arrow(tbl).repartition(11), "g", "v",
                            p=8).to_pandas()
           .sort_values(["g", "reg"]).reset_index(drop=True))
    out2 = (hll_registers_by(rd.from_arrow(tbl).repartition(2), "g", "v",
                             p=8).to_pandas()
            .sort_values(["g", "reg"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)
    for g in ("a", "b", "c"):
        sub = tbl.filter(pa.compute.equal(tbl.column("g"), g))
        solo = hll_registers(rd.from_arrow(sub), "v", p=8).to_pandas()
        solo_nz = (solo[solo.rho > 0].rename(columns={})
                   .reset_index(drop=True))
        mine = out[out.g == g][["reg", "rho"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(mine, solo_nz[["reg", "rho"]])
        exact = len(np.unique(vals[grp == g]))
        est = hll_estimate_from_registers(mine.rho.to_numpy(), p=8)
        assert abs(est - exact) / exact < 0.25, (g, est, exact)


def test_cm_sketch_upper_bounds_and_heavy_hitters():
    """CM estimates never undercount, total mass per row j equals N,
    the sketch is layout-invariant, and a heavy hitter's estimate is
    within the eps*N CM error bound of its true count."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import cm_estimate, cm_sketch
    from essentials_rd.util import np_col

    rng = np.random.default_rng(13)
    # zipf-ish: one heavy key + long tail
    tail = rng.integers(0, 10_000, 50_000).astype("int64")
    heavy = np.full(5_000, 424242, dtype="int64")
    vals = np.r_[tail, heavy]
    tbl = pa.table({"v": pa.array(vals)})
    sk = cm_sketch(rd.from_arrow(tbl).repartition(9), "v",
                   depth=4, width=512)
    sk2 = cm_sketch(rd.from_arrow(tbl).repartition(3), "v",
                    depth=4, width=512)
    assert sk.equals(sk2)
    n = np_col(sk, "n").reshape(4, 512)
    assert (n.sum(axis=1) == len(vals)).all()
    keys, true = np.unique(vals, return_counts=True)
    est = cm_estimate(sk, keys, depth=4, width=512)
    assert (est >= true).all()  # CM never undercounts
    # eps = e/width; allow 2x slack on the probabilistic bound
    assert est[keys == 424242][0] - 5_000 <= 2 * np.e / 512 * len(vals)


def test_bloom_bits_no_false_negatives_and_layout_invariant():
    """Every build key's k probe positions are set in the emitted
    bit table (no false negatives), the artifact is layout- and
    dedup-invariant, and a disjoint keyset mostly misses."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import _bloom_positions, bloom_bits
    from essentials_rd.util import hash64

    keys = np.arange(1_000, 2_000, dtype="int64")
    tbl = pa.table({"k": pa.array(keys)})
    dup = pa.table({"k": pa.array(np.r_[keys, keys])})
    a = bloom_bits(rd.from_arrow(tbl).repartition(5), "k", k=8,
                   n_bits=1 << 15)
    b = bloom_bits(rd.from_arrow(dup).repartition(2), "k", k=8,
                   n_bits=1 << 15)
    assert a.equals(b)
    bitset = set(a.column("pos").to_pylist())
    pos = _bloom_positions(hash64(keys).astype(np.uint64), 8, 1 << 15)
    assert all(p in bitset for p in pos.ravel())
    # disjoint probe keys: vast majority must miss at this load factor
    probe = _bloom_positions(hash64(
        np.arange(50_000, 51_000, dtype="int64")).astype(np.uint64),
        8, 1 << 15)
    hit = np.array([[p in bitset for p in row] for row in probe]).all(axis=1)
    assert hit.mean() < 0.01


def test_grouped_mode_matches_pandas_and_bucket_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import grouped_mode
    from essentials_rd.util import np_col

    rng = np.random.default_rng(31)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n), pa.int64()),
        "v": pa.array([f"t{int(x)}" for x in rng.integers(0, 5, n)],
                      pa.string()),
    })
    df = t.to_pandas()
    c = df.groupby(["k", "v"]).size().reset_index(name="n")
    c = c.sort_values(["k", "n", "v"], ascending=[True, False, True],
                      kind="stable")
    want = c.drop_duplicates("k", keep="first").reset_index(drop=True)
    want["n"] = want["n"].astype("int64")
    for nb in (1, 7):
        got = (
            grouped_mode(rd.from_arrow(t), "k", "v",
                         key_fn=lambda b: np_col(b, "k"), num_buckets=nb)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert got.equals(want), f"num_buckets={nb}"


def test_grouped_mode_tie_breaks_by_min_value():
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import grouped_mode
    from essentials_rd.util import np_col

    t = pa.table({
        "k": pa.array([1, 1, 1, 1], pa.int64()),
        "v": pa.array(["b", "b", "a", "a"], pa.string()),
    })
    got = grouped_mode(rd.from_arrow(t), "k", "v",
                       key_fn=lambda b: np_col(b, "k")).take_all()
    assert got == [{"k": 1, "v": "a", "n": 2}]


def test_grouped_rank_matches_pandas_and_bucket_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import grouped_rank
    from essentials_rd.util import np_col

    rng = np.random.default_rng(17)
    n = 2000
    t = pa.table({
        "k": pa.array(rng.integers(0, 25, n), pa.int64()),
        "v": pa.array(rng.integers(0, 50, n), pa.int64()),  # forces ties
        "i": pa.array(rng.permutation(n).astype(np.int64), pa.int64()),
    })
    df = t.to_pandas().sort_values(["k", "v", "i"],
                                   ascending=[True, False, True])
    df["rnk"] = df.groupby("k").cumcount() + 1
    sizes = df.groupby("k")["k"].transform("size")
    df["pct"] = np.where(sizes > 1, (df["rnk"] - 1) / (sizes - 1), 0.0)
    want = (df[["i", "k", "rnk", "pct"]]
            .sort_values("i").reset_index(drop=True))
    for nb in (1, 9):
        got = (
            grouped_rank(rd.from_arrow(t), "k", "v", "i",
                         key_fn=lambda b: np_col(b, "k"),
                         descending=True, num_buckets=nb)
            .to_pandas().sort_values("i").reset_index(drop=True)
        )
        assert got.equals(want), f"num_buckets={nb}"


def test_pivot_counts_matches_pandas():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import pivot_counts
    from essentials_rd.util import np_col

    rng = np.random.default_rng(5)
    cats = ["a", "b", "c"]
    n = 1500
    t = pa.table({
        "k": pa.array(rng.integers(0, 30, n), pa.int64()),
        "v": pa.array([cats[int(x)] for x in rng.integers(0, 3, n)],
                      pa.string()),
    })
    df = t.to_pandas()
    want = (df.pivot_table(index="k", columns="v", aggfunc="size",
                           fill_value=0)
            .rename(columns={c: f"n_{c}" for c in cats})
            .reset_index().rename_axis(None, axis=1))
    want[["n_a", "n_b", "n_c"]] = want[["n_a", "n_b", "n_c"]].astype("int64")
    got = (pivot_counts(rd.from_arrow(t), "k", "v", cats,
                        key_fn=lambda b: np_col(b, "k"))
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.equals(want)


@pytest.mark.parametrize("cube", [False, True])
def test_rollup_agg_matches_duckdb(cube):
    """rollup_agg (single-scan multi-level aggregate) vs DuckDB's
    GROUP BY ROLLUP / CUBE, integer-exact, at a block layout that
    forces cross-block combines."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import rollup_agg

    rng = np.random.default_rng(3)
    n = 4000
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y", "z"], n)),
        "b": pa.array(rng.choice(["p", "q"], n)),
        "v": pa.array(rng.integers(-50, 100, n).astype(np.int64)),
    })
    got = (rollup_agg(rd.from_arrow(t).repartition(7), ["a", "b"], "v",
                      cube=cube)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    fn = "CUBE" if cube else "ROLLUP"
    want = duckdb.sql(
        "SELECT COALESCE(a, 'ALL') a, COALESCE(b, 'ALL') b, "
        "CAST(count(*) AS BIGINT) n, CAST(sum(v) AS BIGINT) s "
        f"FROM t GROUP BY {fn}(a, b) ORDER BY a, b").df()
    assert got[["a", "b", "n", "s"]].equals(
        want.astype({"n": "int64", "s": "int64"}))


def test_grouped_moments_matches_pandas():
    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_moments

    rng = np.random.default_rng(5)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "v": pa.array(rng.integers(-40, 60, n).astype(np.int64)),
    })
    df = t.to_pandas()
    df["v2"] = df["v"] * df["v"]
    want = (df.groupby("g", as_index=False)
              .agg(n=("v", "count"), sum_v=("v", "sum"), sumsq_v=("v2", "sum"))
              .sort_values("g").reset_index(drop=True).astype({"n": "int64"}))
    for nb in (1, 8):
        got = (grouped_moments(rd.from_arrow(t).repartition(6), ["g"], "v",
                               key_fn=lambda b: _str_hash(b.column("g")),
                               num_buckets=nb)
               .to_pandas().sort_values("g").reset_index(drop=True))
        assert got[["g", "n", "sum_v", "sumsq_v"]].equals(want), f"nb={nb}"


def test_table_checksum_invariant_and_sensitive():
    from essentials_rd.ops import table_checksum
    from essentials_rd.util import hash64, np_col

    rng = np.random.default_rng(3)
    k = rng.integers(0, 2**40, 5000).astype(np.int64)
    t = pa.table({"k": pa.array(k)})
    key_fn = lambda b: np_col(b, "k")

    with np.errstate(over="ignore"):
        want = np.add.reduce(hash64(k), dtype=np.uint64)
    want_i64 = np.array([want], np.uint64).view(np.int64)[0]

    # block-layout invariance: the digest is a pure function of the
    # row multiset
    for parts in (1, 7):
        got = table_checksum(rd.from_arrow(t).repartition(parts), key_fn)
        assert got["n"][0].as_py() == 5000
        assert got["checksum"][0].as_py() == want_i64, f"parts={parts}"

    # a duplicated row changes the SUM digest (an XOR digest would
    # cancel the pair and miss it)
    dup = pa.table({"k": pa.array(np.r_[k, k[:1]])})
    got = table_checksum(rd.from_arrow(dup), key_fn)
    assert got["checksum"][0].as_py() != want_i64

    # a single changed value changes the digest
    k2 = k.copy()
    k2[1234] += 1
    got = table_checksum(rd.from_arrow(pa.table({"k": pa.array(k2)})), key_fn)
    assert got["checksum"][0].as_py() != want_i64


def test_grouped_comoments_matches_pandas():
    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_comoments

    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "x": pa.array(rng.integers(-40, 60, n).astype(np.int64)),
        "y": pa.array(rng.integers(-500, 500, n).astype(np.int64)),
    })
    df = t.to_pandas()
    df["xx"], df["yy"], df["xy"] = df.x * df.x, df.y * df.y, df.x * df.y
    want = (df.groupby("g", as_index=False)
              .agg(n=("x", "count"), sum_x=("x", "sum"), sum_y=("y", "sum"),
                   sum_xx=("xx", "sum"), sum_yy=("yy", "sum"),
                   sum_xy=("xy", "sum"))
              .sort_values("g").reset_index(drop=True).astype({"n": "int64"}))
    cols = ["g", "n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    for nb in (1, 8):
        got = (grouped_comoments(rd.from_arrow(t).repartition(6), ["g"],
                                 "x", "y",
                                 key_fn=lambda b: _str_hash(b.column("g")),
                                 num_buckets=nb)
               .to_pandas().sort_values("g").reset_index(drop=True))
        assert got[cols].equals(want[cols]), f"nb={nb}"
        # covariance numerator derives exactly: n·Σxy − Σx·Σy
        cov_num = got.n * got.sum_xy - got.sum_x * got.sum_y
        ref = df.groupby("g").apply(
            lambda d: np.cov(d.x, d.y, bias=True)[0, 1] * len(d) * len(d),
            include_groups=False)
        assert np.allclose(cov_num.to_numpy(np.float64),
                           ref.sort_index().to_numpy(), rtol=1e-12)


def test_profile_table_exact_with_nulls():
    from essentials_rd.ops import profile_table

    rng = np.random.default_rng(9)
    n = 2500
    a = rng.integers(-100, 100, n).astype(np.int64)
    b = rng.integers(0, 17, n).astype(np.int64)
    amask = rng.random(n) < 0.1  # planted nulls
    t = pa.table({
        "a": pa.array(a, pa.int64(), mask=amask),
        "b": pa.array(b, pa.int64()),
    })
    got = profile_table(rd.from_arrow(t).repartition(5), ["a", "b"],
                        num_buckets=16).to_pandas()
    av = a[~amask]
    want = {
        "a": (n, int(amask.sum()), int(av.min()), int(av.max()),
              len(np.unique(av))),
        "b": (n, 0, int(b.min()), int(b.max()), len(np.unique(b))),
    }
    for _, r in got.iterrows():
        assert (r["n"], r["n_null"], r["min_v"], r["max_v"], r["ndv"]) == \
            want[r["column_name"]], r["column_name"]


def test_range_partition_routing_and_block_invariance():
    from essentials_rd.ops import range_partition

    rng = np.random.default_rng(12)
    n = 5000
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(-10**6, 10**6, n).astype(np.int64)),
    })
    prev = None
    for parts in (2, 9):
        routed, bounds = range_partition(
            rd.from_arrow(t).repartition(parts), "v", 8,
            key_fn=lambda b: b.column("id").to_numpy(zero_copy_only=False),
            sample_frac=0.3, seed=5,
        )
        df = routed.to_pandas().sort_values("id").reset_index(drop=True)
        assert (np.sort(bounds) == bounds).all()
        # routing law: part_id = #(bounds <= v), every part in range
        want = np.searchsorted(bounds, df["v"].to_numpy(), side="right")
        assert (df["part_id"].to_numpy() == want).all()
        assert df["part_id"].between(0, 8 - 1).all()
        if prev is not None:  # boundaries + routing block-layout invariant
            assert (prev[0] == bounds).all() and prev[1].equals(df)
        prev = (bounds, df)
    # equi-depth-ish: no partition more than 3x the ideal share
    counts = df.groupby("part_id").size()
    assert counts.max() <= 3 * (n // 8)


def test_throttle_events_matches_lag_reference():
    import pandas as pd

    from essentials_rd.windows import throttle_events

    rng = np.random.default_rng(8)
    n = 1200
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            1_700_000_000_000_000
            + rng.integers(0, 3 * 3600 * 10**6, n).astype("int64"), unit="us"
        ),
        "user_id": rng.integers(0, 6, n).astype(np.int64),
        "event_type": rng.choice(["a", "b"], n),
    })
    sdf = df.sort_values(["user_id", "event_type", "ts", "event_id"])
    gap = sdf.groupby(["user_id", "event_type"])["ts"].diff()
    want = set(sdf.loc[gap.isna() | (gap > pd.Timedelta(minutes=30)),
                       "event_id"])
    assert 0 < len(want) < n  # both kept and dropped rows exist
    for nb in (1, 16):
        got = throttle_events(rd.from_pandas(df).repartition(4),
                              window_minutes=30, num_buckets=nb).to_pandas()
        assert set(got["event_id"]) == want, f"nb={nb}"


def test_latest_by_key_matches_pandas_argmax():
    """latest_by_key == per-key arg-max row under (ts, id), ties on ts
    broken by the id tie-break, invariant to block layout / buckets."""
    import pandas as pd

    from essentials_rd.ops import latest_by_key

    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype(np.int64),
        "ts": pd.to_datetime(
            1_700_000_000_000_000
            + rng.integers(0, 50, n).astype("int64") * 10**6,  # many ts ties
            unit="us",
        ),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    sdf = df.sort_values(["user_id", "ts", "event_id"],
                         ascending=[True, False, False], kind="stable")
    want = sdf.drop_duplicates("user_id", keep="first") \
        .sort_values("user_id").reset_index(drop=True)
    # fixture exercises the tie-break: some winner shares its ts with
    # another row of the same user
    merged = df.merge(want[["user_id", "ts"]], on=["user_id", "ts"])
    assert len(merged) > len(want)
    for nparts, nb in ((1, 1), (7, 16)):
        got = latest_by_key(
            rd.from_pandas(df).repartition(nparts),
            "user_id", ["ts", "event_id"],
            key_fn=lambda b: np_col(b, "user_id"),
            num_buckets=nb,
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)


def test_global_rank_matches_sort_and_block_invariant():
    from essentials_rd.ops import global_rank

    rng = np.random.default_rng(17)
    n = 4000
    t = pa.table({
        "id": pa.array(rng.permutation(n).astype(np.int64)),
        "v": pa.array(rng.integers(0, 200, n).astype(np.int64)),  # heavy ties
    })
    df = t.to_pandas()
    want = df.sort_values(["v", "id"], kind="stable").reset_index(drop=True)
    want["rank"] = np.arange(1, n + 1, dtype=np.int64)
    want = want.sort_values("id").reset_index(drop=True)
    prev = None
    for parts in (1, 11):
        got = global_rank(
            rd.from_arrow(t).repartition(parts), "v", ["id"],
            key_fn=lambda b: np_col(b, "id"),
            n_parts=6, sample_frac=0.3, seed=9,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        assert (got["rank"].to_numpy() == want["rank"].to_numpy()).all()
        assert (got["v"].to_numpy() == want["v"].to_numpy()).all()
        if prev is not None:
            assert prev.equals(got[prev.columns.tolist()])
        prev = got[["id", "v", "rank"]]


def test_grouped_quantiles_cont_bit_identical_to_duckdb():
    import duckdb

    from essentials_rd.ops import grouped_quantiles

    rng = np.random.default_rng(19)
    lang = np.array(["aa", "bb", "cc", "dd"], object)[rng.integers(0, 4, 1999)]
    v = rng.integers(-300, 300, 1999).astype("int64")
    tbl = pa.table({"lang": pa.array(lang.tolist(), pa.string()),
                    "n": pa.array(v)})
    qs = [0.25, 0.5, 0.75, 0.875]  # dyadic => lerp exactly representable
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        " UNION ALL ".join(
            f"SELECT lang, CAST({q} AS DOUBLE) AS q, "
            f"CAST(quantile_cont(n, {q}) AS DOUBLE) AS value "
            "FROM t GROUP BY lang"
            for q in qs
        )
        + " ORDER BY lang, q"
    ).df().reset_index(drop=True)
    for nb in (1, 8):
        got = (
            grouped_quantiles(rd.from_arrow(tbl), "lang", "n", qs,
                              num_buckets=nb, cont=True)
            .to_pandas().sort_values(["lang", "q"]).reset_index(drop=True)
        )
        # bitwise float equality, not allclose — the dyadic-q contract
        assert got["value"].to_numpy().tobytes() == \
            want["value"].to_numpy().tobytes(), f"num_buckets={nb}"
        assert got[["lang", "q"]].equals(want[["lang", "q"]])


def test_grouped_rank_ntile_matches_duckdb():
    import duckdb

    from essentials_rd.ops import grouped_rank

    rng = np.random.default_rng(29)
    # group sizes chosen to hit the floor(p*n/cnt)-divergence regime
    # (e.g. cnt=8, n_tiles=5 front-loads 2,2,2,1,1 not 2,2,1,2,1)
    sizes = [8, 1, 3, 17, 5, 40]
    k = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    n = len(k)
    tbl = pa.table({
        "k": pa.array(k),
        "v": pa.array(rng.integers(0, 6, n).astype(np.int64)),  # ties
        "id": pa.array(rng.permutation(n).astype(np.int64)),
    })
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        "SELECT id, k, CAST(ntile(5) OVER w AS BIGINT) AS tile FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY v, id) ORDER BY id"
    ).df().reset_index(drop=True)
    for nb in (1, 8):
        got = grouped_rank(
            rd.from_arrow(tbl), "k", "v", "id",
            key_fn=lambda b: np_col(b, "k"), num_buckets=nb, n_tiles=5,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        assert got[["id", "k", "tile"]].equals(want), f"num_buckets={nb}"


def test_grouped_rank_dense_matches_duckdb():
    import duckdb

    from essentials_rd.ops import grouped_rank

    rng = np.random.default_rng(41)
    n = 800
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 5, n).astype(np.int64)),
        "v": pa.array(rng.integers(0, 7, n).astype(np.int64)),  # heavy ties
        "id": pa.array(rng.permutation(n).astype(np.int64)),
    })
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        "SELECT id, k, CAST(row_number() OVER (PARTITION BY k "
        "ORDER BY v, id) AS BIGINT) AS rnk, "
        "CAST(dense_rank() OVER (PARTITION BY k ORDER BY v) AS BIGINT) "
        "AS drnk FROM t ORDER BY id"
    ).df().reset_index(drop=True)
    for nb in (1, 8):
        got = grouped_rank(
            rd.from_arrow(tbl).repartition(5), "k", "v", "id",
            key_fn=lambda b: np_col(b, "k"), num_buckets=nb, dense=True,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        assert got[["id", "k", "rnk", "drnk"]].equals(want), f"nb={nb}"
    # descending dense ranks count distinct values from the top
    got = grouped_rank(
        rd.from_arrow(tbl), "k", "v", "id",
        key_fn=lambda b: np_col(b, "k"), dense=True, descending=True,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    want_d = con.execute(
        "SELECT id, CAST(dense_rank() OVER (PARTITION BY k "
        "ORDER BY v DESC) AS BIGINT) AS drnk FROM t ORDER BY id"
    ).df().reset_index(drop=True)
    assert got["drnk"].tolist() == want_d["drnk"].tolist()


def test_table_diff_classifies_and_skips_unchanged():
    from essentials_rd.ops import table_diff

    rng = np.random.default_rng(61)
    keys = np.arange(4000, dtype=np.int64)
    vals = rng.integers(0, 10**9, 4000).astype(np.int64)
    # B: drop keys %13==0 (removed), add 4000..4019 (added),
    # bump vals of %17==0 (changed); everything else identical
    a = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    bk = np.r_[keys[keys % 13 != 0], np.arange(4000, 4020, dtype=np.int64)]
    bv = np.r_[vals[keys % 13 != 0] + ((keys[keys % 13 != 0] % 17) == 0),
               np.arange(20, dtype=np.int64)]
    b = pa.table({"k": pa.array(bk), "v": pa.array(bv)})

    want = {}
    for k in keys[keys % 13 == 0]:
        want[int(k)] = "removed"
    for k in range(4000, 4020):
        want[k] = "added"
    for k in keys[(keys % 13 != 0) & (keys % 17 == 0)]:
        want[int(k)] = "changed"

    from essentials_rd.util import np_col as _nc
    for nb in (1, 16):
        got = table_diff(
            rd.from_arrow(a).repartition(5), rd.from_arrow(b).repartition(3),
            key_fn=lambda t: _nc(t, "k"), val_fn=lambda t: _nc(t, "v"),
            key_col="k", num_buckets=nb,
        ).to_pandas()
        assert dict(zip(got.k, got.status)) == want, f"nb={nb}"
        assert len(got) == len(want)  # unchanged keys emit nothing


def test_global_cumsum_exclusive_prefix_matches_numpy():
    from essentials_rd.ops import global_cumsum

    rng = np.random.default_rng(67)
    n = 5000
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 100, n).astype(np.int64)
    t = pa.table({"id": pa.array(ids), "v": pa.array(vals)})
    order = np.argsort(ids)
    want = dict(zip(ids[order].tolist(),
                    (np.cumsum(vals[order]) - vals[order]).tolist()))
    for parts in (1, 7):
        got = global_cumsum(
            rd.from_arrow(t).repartition(parts), "id", [], "v",
            key_fn=lambda b: np_col(b, "id"), n_parts=5,
        ).to_pandas()
        assert dict(zip(got.id, got.prefix)) == want, f"parts={parts}"


def test_pack_sequences_manifest_invariants():
    from essentials_rd.textops import pack_sequences

    rng = np.random.default_rng(71)
    n = 400
    cts = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "n_tokens": pa.array(
            np.r_[rng.integers(1, 900, n - 2), [0, 5000]].astype(np.int64)),
    })
    L = 256
    got = (pack_sequences(rd.from_arrow(cts).repartition(6), L)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (got.n_tokens > 0).all()  # zero-token doc dropped
    # offsets are the exclusive prefix in id order; spans consistent
    assert got.tok_off.iloc[0] == 0
    assert (got.tok_off.to_numpy()[1:]
            == (got.tok_off + got.n_tokens).to_numpy()[:-1]).all()
    assert (got.first_seq == got.tok_off // L).all()
    assert (got.last_seq == (got.tok_off + got.n_tokens - 1) // L).all()
    assert (got.n_seqs == got.last_seq - got.first_seq + 1).all()
    assert got.n_seqs.max() >= 20  # the 5000-token doc really spans


def test_top_k_tie_break_layout_invariant():
    from essentials_rd.ops import top_k

    rng = np.random.default_rng(73)
    n = 2000
    # heavy ties: values in {0..4}, ids unique
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 5, n).astype(np.int64)),
    })
    df = t.to_pandas().sort_values(["v", "id"],
                                   ascending=[False, True]).head(7)
    want = list(zip(df.v, df.id))
    for parts in (1, 9):
        got = top_k(rd.from_arrow(t).repartition(parts), "v", 7,
                    tie_cols=["id"])
        assert list(zip(np.asarray(got["v"]).tolist(),
                        np.asarray(got["id"]).tolist())) == want, parts


def test_weighted_sample_exact_threshold_and_invariance():
    from essentials_rd.ops import weighted_sample
    from essentials_rd.util import hash64

    rng = np.random.default_rng(83)
    n = 4000
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.table({"id": pa.array(ids), "w": pa.array(w)})
    num, den, seed = 1, 500, 7
    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))
    with np.errstate(over="ignore"):
        h = hash64(ids + mix)
    thr = np.array([min(2**64 - 1, (int(x) * num * (1 << 64)) // den)
                    for x in w], np.uint64)
    want = set(ids[h < thr].tolist())
    assert 0 < len(want) < n  # both sides populated
    # w >= den ⇒ p = 1 (always kept)
    assert set(ids[w >= den].tolist()) <= want
    for parts in (1, 6):
        got = weighted_sample(
            rd.from_arrow(t).repartition(parts),
            key_fn=lambda b: np_col(b, "id"),
            weight_fn=lambda b: np_col(b, "w"),
            rate_num=num, rate_den=den, seed=seed,
        ).to_pandas()
        assert set(got.id) == want, f"parts={parts}"


def test_band_join_self_matches_bruteforce():
    from essentials_rd.ops import band_join_self

    rng = np.random.default_rng(89)
    n = 1500
    ids = np.arange(n, dtype=np.int64)
    # clustered values force heavy windows incl. exact ties
    v = np.sort(rng.integers(0, 4000, n)).astype(np.int64)
    rng.shuffle(v)
    t = pa.table({"id": pa.array(ids), "v": pa.array(v)})
    span = 7
    order = np.lexsort((ids, v))
    vs, is_ = v[order], ids[order]
    want = set()
    for i in range(n):
        j = i + 1
        while j < n and vs[j] - vs[i] <= span:
            want.add((int(is_[i]), int(is_[j]), int(vs[j] - vs[i])))
            j += 1
    assert len(want) > 1000
    for parts in (4, 11):
        got = band_join_self(rd.from_arrow(t).repartition(5), "id", "v",
                             span, n_parts=parts).to_pandas()
        assert set(zip(got.a_id, got.b_id, got.vdiff)) == want, parts
        assert len(got) == len(want)  # exactly-once


def test_pareto_front_matches_bruteforce_with_ties():
    """Distributed 2-D skyline equals the O(n^2) dominance check on
    random data with heavy coordinate ties and exact duplicate points,
    at any block layout."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import pareto_front_2d

    rng = np.random.default_rng(37)
    n = 3_000
    x = rng.integers(0, 25, n)          # heavy ties
    y = rng.integers(0, 25, n)
    x[10:20] = x[0]; y[10:20] = y[0]    # exact duplicates
    ids = np.arange(n)
    tbl = pa.table({"id": pa.array(ids, pa.int64()),
                    "x": pa.array(x, pa.int64()),
                    "y": pa.array(y, pa.int64())})
    dominated = np.zeros(n, bool)
    for i in range(n):
        dom = ((x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i])))
        dominated[i] = dom.any()
    want = set(ids[~dominated].tolist())
    for parts in (1, 9):
        got = pareto_front_2d(rd.from_arrow(tbl).repartition(parts),
                              "x", "y")
        assert set(got.column("id").to_pylist()) == want


def test_incremental_grouped_sum_equals_scratch_recompute():
    """Maintained aggregate == from-scratch aggregate of the new
    version under adds/removes/changes (value and group moves), with
    groups that appear and empty out in the delta."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import incremental_grouped_sum

    rng = np.random.default_rng(41)
    n = 2_000
    keys = np.arange(n, dtype=np.int64)
    g1 = rng.integers(0, 6, n).astype(np.int64)
    v1 = rng.integers(-500, 500, n).astype(np.int64)
    # new version: drop some keys, add new ones, change some values
    # AND move some rows to a brand-new group 99
    keep = rng.random(n) > 0.05
    k2 = np.r_[keys[keep], np.arange(n, n + 100)]
    g2 = np.r_[g1[keep], np.full(100, 99, np.int64)]
    v2 = np.r_[v1[keep], rng.integers(-500, 500, 100)]
    ch = rng.random(len(k2)) < 0.1
    v2 = np.where(ch, v2 + 7, v2)
    old = pa.table({"k": pa.array(keys), "g": pa.array(g1),
                    "v": pa.array(v1)})
    new = pa.table({"k": pa.array(k2), "g": pa.array(g2),
                    "v": pa.array(v2)})
    old_agg_df = (pd.DataFrame({"g": g1, "v": v1}).groupby("g")["v"]
                  .sum().reset_index())
    old_agg = pa.table({"g": pa.array(old_agg_df.g.to_numpy(np.int64)),
                        "total": pa.array(old_agg_df.v.to_numpy(np.int64))})
    got = incremental_grouped_sum(
        rd.from_arrow(old).repartition(5),
        rd.from_arrow(new).repartition(3),
        "k", "g", "v", old_agg).to_pandas().sort_values("g")
    want = (pd.DataFrame({"g": g2, "v": v2}).groupby("g")["v"]
            .sum().reset_index().rename(columns={"v": "total"}))
    merged = got.merge(want, on="g", how="outer", suffixes=("_got", "_want"))
    assert (merged.total_got.fillna(0) == merged.total_want.fillna(0)).all()


def test_pareto_front_by_equals_per_group_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import pareto_front_2d, pareto_front_2d_by

    rng = np.random.default_rng(53)
    n = 2_000
    g = rng.integers(0, 4, n).astype(np.int64)
    tbl = pa.table({"g": pa.array(g),
                    "x": pa.array(rng.integers(0, 30, n), pa.int64()),
                    "y": pa.array(rng.integers(0, 30, n), pa.int64()),
                    "id": pa.array(np.arange(n), pa.int64())})
    got = pareto_front_2d_by(rd.from_arrow(tbl).repartition(6),
                             "g", "x", "y")
    ids_got = set(got.column("id").to_pylist())
    want = set()
    for gg in range(4):
        sub = tbl.filter(pa.compute.equal(tbl.column("g"), gg))
        want |= set(pareto_front_2d(rd.from_arrow(sub), "x", "y")
                    .column("id").to_pylist())
    assert ids_got == want


def test_hll_set_algebra_union_and_overlap():
    """Union-of-sketches == sketch-of-union exactly; the
    inclusion-exclusion overlap estimate lands near the true overlap."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import (hll_overlap_estimate, hll_registers,
                                   hll_union_registers)

    rng = np.random.default_rng(71)
    a_vals = rng.choice(100_000, 20_000, replace=False).astype("int64")
    b_vals = np.r_[a_vals[:8_000],                      # 8k overlap
                   (rng.choice(100_000, 15_000, replace=False)
                    + 200_000).astype("int64")]
    ta = pa.table({"v": pa.array(a_vals)})
    tb = pa.table({"v": pa.array(b_vals)})
    ra = hll_registers(rd.from_arrow(ta), "v", p=12)
    rb = hll_registers(rd.from_arrow(tb), "v", p=12)
    runion = hll_registers(
        rd.from_arrow(pa.table({"v": pa.array(np.r_[a_vals, b_vals])})),
        "v", p=12)
    assert hll_union_registers(ra, rb).equals(runion)  # exact algebra
    est = hll_overlap_estimate(ra, rb, p=12)
    true_inter = len(np.intersect1d(a_vals, b_vals))
    assert abs(est["est_intersection"] - true_inter) / true_inter < 0.15


def test_quota_mix_sample_exact_counts_and_invariance():
    """Per-group kept count == min(quota, available); absent/zero-quota
    groups dropped; selected SET matches the brute-force priority rank
    and survives a block re-layout."""
    import pandas as pd

    from essentials_rd.ops import quota_mix_sample
    from essentials_rd.util import hash64

    rng = np.random.default_rng(17)
    n = 4000
    ids = rng.permutation(n).astype(np.int64)
    grp = np.array(["a", "b", "c", "d"], object)[
        rng.integers(0, 4, n)
    ]
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "g": pa.array(grp, pa.string())})
    quotas = {"a": 100, "b": 10**6, "c": 0}  # cut / keep-whole / drop; d absent
    seed = 9

    def run(ds):
        out = quota_mix_sample(
            ds, "g", lambda b: np_col(b, "id"), quotas, seed=seed
        ).take_all()
        return sorted((r["g"], r["id"]) for r in out)

    got = run(rd.from_arrow(t))

    # brute force: per group, quota lowest (hash, id) rows
    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))
    with np.errstate(over="ignore"):
        h = hash64(ids + mix)
    df = pd.DataFrame({"id": ids, "g": grp, "h": h})
    want = []
    for g, q in quotas.items():
        sub = df[df.g == g].sort_values(["h", "id"])
        want += [(g, int(i)) for i in sub.id.to_numpy()[:q]]
    assert got == sorted(want)
    counts = pd.Series([g for g, _ in got]).value_counts()
    assert counts.get("a", 0) == 100
    assert counts.get("b", 0) == int((grp == "b").sum())
    assert "c" not in counts and "d" not in counts

    # layout invariance: different block structure, same set
    assert run(rd.from_arrow(t).repartition(13)) == got


def test_scd2_intervals_reference_and_guards():
    """Versions chain per key ([seq_from, seq_to) half-open, open tail,
    exactly one is_current per key), match a pandas lead() reference,
    survive re-layout, and duplicate seqs within a key raise."""
    import pandas as pd

    from essentials_rd.ops import SCD2_OPEN, scd2_intervals

    rng = np.random.default_rng(23)
    n = 3000
    k = rng.integers(0, 80, n).astype(np.int64)
    seq = rng.permutation(n).astype(np.int64)  # globally unique
    val = rng.integers(0, 5, n).astype(np.int64)
    t = pa.table({"k": pa.array(k), "seq": pa.array(seq),
                  "val": pa.array(val)})

    def run(ds):
        out = scd2_intervals(
            ds, "k", "seq", lambda b: np_col(b, "k")
        ).take_all()
        return sorted((r["k"], r["seq"], r["seq_to"], r["is_current"],
                       r["val"]) for r in out)

    got = run(rd.from_arrow(t))

    df = pd.DataFrame({"k": k, "seq": seq, "val": val}).sort_values(
        ["k", "seq"])
    nxt = df.groupby("k")["seq"].shift(-1)
    want = sorted(
        (int(r.k), int(r.seq),
         int(SCD2_OPEN) if pd.isna(nx) else int(nx),
         int(pd.isna(nx)), int(r.val))
        for r, nx in zip(df.itertuples(), nxt)
    )
    assert got == want
    cur = pd.Series([g[0] for g in got if g[3] == 1]).value_counts()
    assert (cur == 1).all() and set(cur.index) == set(np.unique(k))
    assert run(rd.from_arrow(t).repartition(11)) == got

    dup = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "seq": pa.array([5, 5], pa.int64()),
                    "val": pa.array([0, 1], pa.int64())})
    with pytest.raises(Exception, match="duplicate"):
        scd2_intervals(rd.from_arrow(dup), "k", "seq",
                       lambda b: np_col(b, "k")).take_all()
