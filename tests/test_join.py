"""General join operator (SURVEY.md §2.4 R3): broadcast and
partitioned paths vs a pandas-merge reference, all `how` modes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.ops import join


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype(float)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def _ref_merge(ldf, rdf, on, how):
    if how in ("inner", "left"):
        return ldf.merge(rdf, on=on, how=how, suffixes=("", "_r"))
    if how == "semi":
        return ldf.merge(rdf[on].drop_duplicates(), on=on, how="inner")
    m = ldf.merge(rdf[on].drop_duplicates(), on=on, how="left", indicator=True)
    return m.loc[m["_merge"] == "left_only"].drop(columns=["_merge"])


def _tables(seed=7, nl=300, nr=120):
    rng = np.random.default_rng(seed)
    ldf = pd.DataFrame(
        {
            "k": rng.integers(0, 50, nl),
            "s": [f"s{v}" for v in rng.integers(0, 5, nl)],
            "lval": np.arange(nl, dtype=np.int64),
        }
    )
    rdf = pd.DataFrame(
        {
            "k": rng.integers(0, 80, nr),  # some keys unmatched either way
            "s": [f"s{v}" for v in rng.integers(0, 5, nr)],
            "rval": np.arange(nr, dtype=np.int64) * 10,
            "lval": rng.integers(0, 9, nr),  # name collision -> rsuffix
        }
    )
    return ldf, rdf


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
@pytest.mark.parametrize("broadcast", [True, False])
def test_join_matches_pandas(how, broadcast):
    ldf, rdf = _tables()
    got = join(
        rd.from_pandas(ldf).repartition(5),
        rd.from_pandas(rdf).repartition(3),
        on=["k", "s"],
        how=how,
        broadcast=broadcast,
        num_buckets=8,
    ).to_pandas()
    want = _ref_merge(ldf, rdf, ["k", "s"], how)
    if how in ("semi", "anti"):
        assert sorted(got.columns) == sorted(ldf.columns)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_join_single_int_key_duplicates():
    # m:n duplicate keys must produce the full cross product per key
    ldf = pd.DataFrame({"k": [1, 1, 2, 3], "a": [10, 11, 12, 13]})
    rdf = pd.DataFrame({"k": [1, 1, 1, 2], "b": [100, 101, 102, 103]})
    for bc in (True, False):
        got = join(
            rd.from_pandas(ldf), rd.from_pandas(rdf), on="k", how="inner",
            broadcast=bc, num_buckets=4,
        ).to_pandas()
        want = ldf.merge(rdf, on="k")
        pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_join_auto_broadcast_threshold():
    ldf, rdf = _tables(nl=50, nr=10)
    got = join(
        rd.from_pandas(ldf), rd.from_pandas(rdf), on="k", how="inner",
        broadcast=None, broadcast_limit=5,  # forces partitioned path
        num_buckets=4,
    ).to_pandas()
    want = ldf.merge(rdf, on="k", suffixes=("", "_r"))
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def _asof_ref(left, right):
    """Row-by-row reference: latest (ts, val) right row per left row."""
    import pandas as pd

    ldf, rdf = left.to_pandas(), right.to_pandas()
    out = []
    for _, e in ldf.iterrows():
        cand = rdf[(rdf["k"] == e["k"]) & (rdf["t"] <= e["t"])]
        if len(cand):
            best = cand.sort_values(["t", "v"]).iloc[-1]["v"]
        else:
            best = None
        out.append((e["lid"], best))
    return (
        pd.DataFrame(out, columns=["lid", "v_out"])
        .astype({"lid": "int64", "v_out": "Int64"})
        .sort_values("lid")
        .reset_index(drop=True)
    )


def test_asof_join_matches_reference_and_bucket_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import asof_join

    rng = np.random.default_rng(11)
    nl, nr = 500, 200
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 20, nl), pa.int64()),
            "t": pa.array(rng.integers(0, 1000, nl), pa.int64()),
            "lid": pa.array(np.arange(nl), pa.int64()),
        }
    )
    # force timestamp ties on the right so the value tie-break matters
    right = pa.table(
        {
            "k": pa.array(rng.integers(0, 25, nr), pa.int64()),
            "t": pa.array(rng.integers(0, 1000, nr) // 50 * 50, pa.int64()),
            "v": pa.array(rng.permutation(nr).astype("int64"), pa.int64()),
        }
    )
    want = _asof_ref(left, right)
    for nb in (1, 13):
        got = (
            asof_join(
                rd.from_arrow(left), rd.from_arrow(right),
                left_key="k", right_key="k", left_ts="t", right_ts="t",
                left_carry=["lid"], right_vals=["v"],
                out_names={"v": "v_out"}, num_buckets=nb,
            )
            .to_pandas()
            .astype({"lid": "int64", "v_out": "Int64"})
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert got.equals(want), f"num_buckets={nb}"


def test_asof_join_empty_right_and_missing_keys():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import asof_join

    left = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "t": pa.array([10, 20, 30], pa.int64()),
            "lid": pa.array([0, 1, 2], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([2], pa.int64()),
            "t": pa.array([25], pa.int64()),
            "v": pa.array([7], pa.int64()),
        }
    )
    got = (
        asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_key="k", right_key="k", left_ts="t", right_ts="t",
            left_carry=["lid"], right_vals=["v"], num_buckets=4,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # key 2 exists but its only right row is AFTER the left ts -> null;
    # keys 1 and 3 have no right rows at all -> null
    assert got["v"].isna().all()


def _interval_ref(left, right):
    """Brute-force reference: all (lid, rid) pairs with equal key and
    lo <= ts < hi."""
    import pandas as pd

    ldf, rdf = left.to_pandas(), right.to_pandas()
    m = ldf.merge(rdf, on="k")
    m = m[(m["lo"] <= m["t"]) & (m["t"] < m["hi"])]
    return (
        m[["lid", "rid"]]
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )


def test_interval_join_matches_reference_and_bucket_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import interval_join

    rng = np.random.default_rng(23)
    nl, nr, span = 600, 250, 64
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 15, nl), pa.int64()),
            "t": pa.array(rng.integers(0, 1000, nl), pa.int64()),
            "lid": pa.array(np.arange(nl), pa.int64()),
        }
    )
    lo = rng.integers(0, 1000, nr)
    # heavily overlapping intervals of varied length, incl. zero-length
    hi = lo + rng.integers(0, span + 1, nr)
    right = pa.table(
        {
            "k": pa.array(rng.integers(0, 18, nr), pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
            "rid": pa.array(np.arange(nr), pa.int64()),
        }
    )
    want = _interval_ref(left, right)
    assert len(want) > 100  # the fixture actually exercises fan-out
    for nb in (1, 13):
        got = (
            interval_join(
                rd.from_arrow(left), rd.from_arrow(right),
                left_key="k", right_key="k", left_ts="t",
                right_lo="lo", right_hi="hi",
                left_carry=["lid"], right_carry=["rid"],
                max_span=span, num_buckets=nb,
            )
            .to_pandas()
            .astype({"lid": "int64", "rid": "int64"})
            .sort_values(["lid", "rid"])
            .reset_index(drop=True)
        )
        assert got.equals(want), f"num_buckets={nb}"


def test_interval_join_empty_sides_and_span_guard():
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from essentials_rd.ops import interval_join

    left = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "t": pa.array([10, 20], pa.int64()),
            "lid": pa.array([0, 1], pa.int64()),
        }
    )
    empty_right = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "lo": pa.array([], pa.int64()),
            "hi": pa.array([], pa.int64()),
            "rid": pa.array([], pa.int64()),
        }
    )
    got = interval_join(
        rd.from_arrow(left), rd.from_arrow(empty_right),
        left_key="k", right_key="k", left_ts="t",
        right_lo="lo", right_hi="hi",
        left_carry=["lid"], right_carry=["rid"],
        max_span=10, num_buckets=4,
    ).to_pandas()
    # all-empty map_groups output may drop the schema entirely (Ray
    # Data quirk) — the contract here is just "no rows, no crash"
    assert len(got) == 0
    assert set(got.columns) in (set(), {"lid", "rid"})

    # a right interval longer than max_span must fail loudly, not drop
    bad_right = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "lo": pa.array([0], pa.int64()),
            "hi": pa.array([100], pa.int64()),
            "rid": pa.array([0], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="max_span"):
        interval_join(
            rd.from_arrow(left), rd.from_arrow(bad_right),
            left_key="k", right_key="k", left_ts="t",
            right_lo="lo", right_hi="hi",
            left_carry=["lid"], right_carry=["rid"],
            max_span=10, num_buckets=4,
        ).materialize()


def test_outer_join_matches_pandas_both_sides_unmatched():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import join

    rng = np.random.default_rng(7)
    left = pa.table({
        "k": pa.array(rng.integers(0, 30, 200), pa.int64()),
        "lv": pa.array(np.arange(200), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.integers(15, 45, 120), pa.int64()),  # 15..29 overlap
        "rv": pa.array(np.arange(120) + 1000, pa.int64()),
    })
    want = (left.to_pandas().merge(right.to_pandas(), on="k", how="outer")
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True))
    got = (join(rd.from_arrow(left), rd.from_arrow(right), on="k",
                how="outer", num_buckets=7)
           .to_pandas()
           .astype(want.dtypes.to_dict())
           .sort_values(["k", "lv", "rv"])
           .reset_index(drop=True))
    assert got.equals(want)
    # both unmatched directions actually occurred in the fixture
    assert want["lv"].isna().any() and want["rv"].isna().any()


def test_bloom_join_matches_plain_join_and_prunes():
    """bloom_join == join for inner/semi, and the bloom pre-filter
    actually prunes non-matching left rows before the shuffle."""
    from essentials_rd.ops import _bloom_positions, _join_key_fn, bloom_join

    ldf, rdf = _tables(seed=11, nl=500, nr=40)
    rdf = rdf[rdf["k"] < 10]  # selective right side: most left rows prune
    left = rd.from_pandas(ldf).repartition(5)
    right = rd.from_pandas(rdf).repartition(3)
    for how in ("inner", "semi"):
        got = bloom_join(left, right, on=["k", "s"], how=how).to_pandas()
        want = join(left, right, on=["k", "s"], how=how,
                    broadcast=False).to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(want))

    # the filter itself: no false negatives (every matching key passes)
    import numpy as np
    key_fn = _join_key_fn(["k", "s"])
    lt = pa.Table.from_pandas(ldf)
    rt = pa.Table.from_pandas(rdf)
    lk, rk = key_fn(lt), key_fn(rt)
    n_bits = 1 << 12
    words = np.zeros(n_bits // 64, np.uint64)
    pos = _bloom_positions(rk.astype(np.uint64), 8, n_bits).ravel()
    np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    lpos = _bloom_positions(lk.astype(np.uint64), 8, n_bits)
    hit = (((words[lpos >> 6] >> (lpos & 63).astype(np.uint64)) & np.uint64(1))
           .astype(bool).all(axis=1))
    match = np.isin(lk, rk)
    assert (hit | ~match).all(), "bloom must never drop a matching row"
    # and it prunes a meaningful share of the non-matching majority
    assert hit.sum() < len(ldf)


@pytest.mark.parametrize("mode", ["intersect", "except"])
def test_set_op_matches_duckdb(mode):
    """set_op == SQL INTERSECT/EXCEPT (DISTINCT semantics) on random
    multi-column tables with duplicate rows on both sides, invariant
    to bucket count and block layout."""
    import duckdb

    from essentials_rd.ops import set_op

    rng = np.random.default_rng(41)
    nl, nr = 400, 350

    def _mk(n):
        return pd.DataFrame(
            {
                "a": rng.integers(0, 40, n),
                "s": [f"v{v}" for v in rng.integers(0, 6, n)],
            }
        )

    ldf, rdf = _mk(nl), _mk(nr)
    kw = "INTERSECT" if mode == "intersect" else "EXCEPT"
    con = duckdb.connect()
    con.register("l", ldf)
    con.register("r", rdf)
    want = con.execute(
        f"SELECT a, s FROM l {kw} SELECT a, s FROM r"
    ).fetchdf()
    con.close()
    assert 0 < len(want) < len(ldf.drop_duplicates())  # fixture non-trivial
    for nb in (1, 8):
        got = set_op(
            rd.from_pandas(ldf).repartition(5),
            rd.from_pandas(rdf).repartition(3),
            mode,
            num_buckets=nb,
        ).to_pandas()
        assert not got.duplicated().any()  # DISTINCT output
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)


def test_set_op_empty_right_and_bad_mode():
    from essentials_rd.ops import set_op

    ldf = pd.DataFrame({"a": [1, 1, 2], "s": ["x", "x", "y"]})
    empty = pd.DataFrame({"a": pd.array([], dtype="int64"),
                          "s": pd.array([], dtype="str")})
    # EXCEPT empty == DISTINCT left; INTERSECT empty == no rows
    got = set_op(rd.from_pandas(ldf), rd.from_pandas(empty), "except",
                 num_buckets=4).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(ldf.drop_duplicates()), check_dtype=False)
    got = set_op(rd.from_pandas(ldf), rd.from_pandas(empty), "intersect",
                 num_buckets=4).to_pandas()
    assert len(got) == 0
    with pytest.raises(ValueError, match="mode"):
        set_op(rd.from_pandas(ldf), rd.from_pandas(ldf), "union")


def test_skew_join_matches_plain_join_with_planted_hot_key():
    """skew_join == join under a planted power-law key, hot set detected."""
    from essentials_rd.ops import skew_join

    rng = np.random.default_rng(3)
    # one key (7) carries half the left rows; the rest are a cold tail
    k = np.where(rng.random(4000) < 0.5, 7, rng.integers(0, 200, 4000))
    ldf = pd.DataFrame({"k": k.astype(np.int64),
                        "lval": np.arange(4000, dtype=np.int64)})
    rdf = pd.DataFrame({"k": np.arange(0, 200, dtype=np.int64),
                        "rval": np.arange(200, dtype=np.int64) * 3})
    left = rd.from_pandas(ldf).repartition(6)
    right = rd.from_pandas(rdf).repartition(2)
    for how in ("inner", "semi"):
        got = skew_join(left, right, on="k", how=how,
                        hot_threshold=500).to_pandas()
        want = join(left, right, on="k", how=how, broadcast=False).to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(want))
    # threshold above every key's count -> empty hot set, still correct
    got = skew_join(left, right, on="k", how="inner",
                    hot_threshold=10**9).to_pandas()
    want = join(left, right, on="k", how="inner", broadcast=False).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_join_auto_broadcast_is_byte_aware():
    """A right side under the ROW limit but over the BYTE limit must
    take the partitioned path (a 1M-row wide-string table would
    otherwise be concat'd on the driver and ray.put whole)."""
    ldf = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                        "lval": np.arange(200, dtype=np.int64)})
    wide = ["x" * 4000] * 300  # ~1.2 MB of string payload, only 300 rows
    rdf = pd.DataFrame({"k": np.arange(300, dtype=np.int64),
                        "blob": wide,
                        "rval": np.arange(300, dtype=np.int64) * 2})
    left = rd.from_pandas(ldf).repartition(4)
    right = rd.from_pandas(rdf).repartition(2)

    got = join(left, right, on="k", how="inner",
               broadcast_byte_limit=100_000).to_pandas()
    assert join._last_strategy == "partitioned"
    want = ldf.merge(rdf, on="k", how="inner")
    pd.testing.assert_frame_equal(_canon(got), _canon(want))

    # same data under a generous byte limit -> broadcast
    got2 = join(left, right, on="k", how="inner",
                broadcast_byte_limit=128 * 2**20).to_pandas()
    assert join._last_strategy == "broadcast"
    pd.testing.assert_frame_equal(_canon(got2), _canon(want))
