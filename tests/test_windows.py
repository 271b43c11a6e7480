"""Windowed / sessionized aggregation (essentials_rd/windows.py):
planted session boundaries vs a plain-pandas reference, plus the
boundary case gap == threshold (must NOT split — split is strict >).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.windows import US_PER_MIN, sessionize, tumbling_window_agg


def _events(users, ts_us, ids):
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "event_id": pa.array(ids, pa.int64()),
                "event_type": pa.array([i % 3 for i in ids], pa.int64()),
            }
        )
    )


def test_sessionize_planted_boundaries():
    gap = 30  # minutes
    m = US_PER_MIN
    # user 1: three events in one session, then a 31-min gap -> new session
    # user 2: single event
    # user 3: gap EXACTLY 30 min -> same session (split is strict >)
    users = [1, 1, 1, 1, 2, 3, 3]
    ts = [0, 5 * m, 10 * m, 41 * m, 7 * m, 0, 30 * m]
    ids = list(range(7))
    out = sessionize(_events(users, ts, ids), gap_minutes=gap).to_pandas()
    out = out.set_index("user_id").sort_index()
    assert out.loc[1, "n_sessions"] == 2
    assert out.loc[1, "n_events"] == 4
    assert out.loc[1, "max_session_events"] == 3
    assert out.loc[1, "max_session_dur_us"] == 10 * m
    assert out.loc[2, "n_sessions"] == 1
    assert out.loc[2, "max_session_dur_us"] == 0
    assert out.loc[3, "n_sessions"] == 1  # boundary: ==gap stays together
    assert out.loc[3, "max_session_dur_us"] == 30 * m


def test_sessionize_matches_pandas_reference():
    rng = np.random.default_rng(7)
    n = 3000
    users = rng.integers(0, 40, n)
    ts = np.sort(rng.integers(0, 10**10, n))
    ids = np.arange(n)
    got = (
        sessionize(_events(users, ts, ids), gap_minutes=30, num_buckets=8)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )

    df = pd.DataFrame({"u": users, "t": ts, "e": ids}).sort_values(["u", "t", "e"])
    new = (df["u"].diff() != 0) | (df["t"].diff() > 30 * US_PER_MIN)
    df["sid"] = new.cumsum()
    per = df.groupby(["u", "sid"]).agg(len=("e", "size"), dur=("t", lambda s: s.max() - s.min()))
    want = (
        per.groupby("u")
        .agg(
            n_events=("len", "sum"),
            n_sessions=("len", "size"),
            max_session_events=("len", "max"),
            max_session_dur_us=("dur", "max"),
        )
        .reset_index()
        .rename(columns={"u": "user_id"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64")
    )


def test_tumbling_window_agg_matches_pandas():
    rng = np.random.default_rng(11)
    n = 2000
    ts = rng.integers(0, 10**10, n)
    ids = np.arange(n)
    ds = _events(np.zeros(n, np.int64), ts, ids)
    got = (
        tumbling_window_agg(ds, every_minutes=60, num_buckets=8)
        .to_pandas()
        .sort_values(["window", "event_type"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame(
        {"window": ts // (60 * US_PER_MIN), "event_type": ids % 3, "event_id": ids}
    )
    want = (
        df.groupby(["window", "event_type"])
        .agg(
            n_events=("event_id", "size"),
            min_id=("event_id", "min"),
            max_id=("event_id", "max"),
        )
        .reset_index()
        .sort_values(["window", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_hopping_window_covers_each_event_k_times():
    """Every event lands in exactly size/hop windows; per-window counts
    match a local replication reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.windows import hopping_window_agg

    rng = np.random.default_rng(3)
    n = 400
    ts = pd.to_datetime(
        rng.integers(0, 6 * 3600, n) * 1_000_000, unit="us"
    )
    et = np.where(rng.random(n) < 0.5, "a", "b")
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts),
        "event_type": pa.array(et.tolist(), pa.string()),
    })).repartition(4)
    out = hopping_window_agg(ev, size_minutes=120, hop_minutes=60).take_all()
    assert sum(r["n_events"] for r in out) == 2 * n  # k = 2 copies each

    us = ts.astype("int64").to_numpy() // 1000  # datetime64[ns] → µs
    base = us // (60 * 60 * 1_000_000)
    ref = {}
    for off in (0, 1):
        for w, t, i in zip(base - off, et, np.arange(n)):
            key = (int(w), t)
            agg = ref.setdefault(key, [0, i, i])
            agg[0] += 1
            agg[1] = min(agg[1], i)
            agg[2] = max(agg[2], i)
    got = {(r["window"], r["event_type"]):
           [r["n_events"], r["min_id"], r["max_id"]] for r in out}
    assert got == {k: list(map(int, v)) for k, v in ref.items()}


def _mk_events(n_users=7, n_events=400, seed=3):
    rng = np.random.default_rng(seed)
    ts = pa.array(
        (1_700_000_000_000_000 + rng.integers(0, 10**9, n_events)).astype("int64"),
        pa.int64(),
    ).cast(pa.timestamp("us"))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_events), pa.int64()),
            "ts": ts,
            "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
            "__cents__": pa.array(rng.integers(-50, 500, n_events), pa.int64()),
        }
    )


def _roll_ref(tbl, k):
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    g = df.groupby("user_id", sort=False)["__cents__"]
    df["roll_sum"] = g.rolling(k, min_periods=1).sum().reset_index(level=0, drop=True)
    df["roll_n"] = g.rolling(k, min_periods=1).count().reset_index(level=0, drop=True)
    return (
        df[["event_id", "roll_sum", "roll_n"]]
        .astype("int64")
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def test_rolling_window_matches_pandas_and_bucket_invariant():
    from essentials_rd.windows import rolling_window_agg

    tbl = _mk_events()
    # duplicate one (user, ts) pair to exercise the id tie-break
    want = _roll_ref(tbl, 3)
    prev = None
    for nb in (1, 16):
        got = (
            rolling_window_agg(rd.from_arrow(tbl), k=3, num_buckets=nb)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert got.equals(want), f"num_buckets={nb}"
        if prev is not None:
            assert got.equals(prev)
        prev = got


def test_rolling_window_short_segments():
    from essentials_rd.windows import rolling_window_agg

    # single-event users: window is just the row itself
    tbl = pa.table(
        {
            "event_id": pa.array([10, 11, 12], pa.int64()),
            "ts": pa.array([1, 2, 3], pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([100, 200, 300], pa.int64()),
            "__cents__": pa.array([5, -7, 9], pa.int64()),
        }
    )
    got = (
        rolling_window_agg(rd.from_arrow(tbl), k=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["roll_sum"].tolist() == [5, -7, 9]
    assert got["roll_n"].tolist() == [1, 1, 1]


def test_lag_diff_matches_pandas_and_bucket_invariant():
    from essentials_rd.windows import lag_diff

    rng = np.random.default_rng(11)
    n = 2500
    users = rng.integers(0, 37, n)
    ts = rng.integers(0, 10**9, n)
    ids = np.arange(n)
    got = (
        lag_diff(_events(users, ts, ids), num_buckets=8)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"user_id": users, "ts": ts, "event_id": ids})
    df = df.sort_values(["user_id", "ts", "event_id"])
    want = (
        df.assign(gap_us=(df.ts - df.groupby("user_id")["ts"].shift(1)).fillna(-1).astype(np.int64))
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(got["gap_us"].to_numpy(), want["gap_us"].to_numpy())
    got2 = (
        lag_diff(_events(users, ts, ids), num_buckets=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got.equals(got2)


def test_funnel_stages_planted_and_strict_order():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.windows import funnel_stages

    # user 1: full funnel in order; user 2: stages out of order (click
    # before signup -> only stage 1); user 3: signup only; user 4: no
    # funnel events; user 5: click at the SAME ts as signup (strict >
    # rejects it)
    rows = [
        (1, 100, "signup"), (1, 200, "click"), (1, 300, "purchase"),
        (2, 100, "click"), (2, 200, "signup"), (2, 150, "view"),
        (3, 50, "signup"),
        (4, 10, "view"),
        (5, 100, "signup"), (5, 100, "click"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    for nb in (1, 5):
        got = {
            r["user_id"]: r["stage"]
            for r in funnel_stages(
                rd.from_arrow(t), ["signup", "click", "purchase"],
                num_buckets=nb,
            ).take_all()
        }
        assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 1}, f"nb={nb}"


def test_cohort_retention_planted_matrix():
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.windows import US_PER_DAY, cohort_retention

    # users 1,2 join day 0 (1 returns day 2); user 3 joins day 1 and
    # returns days 2 and 3; duplicate same-day events count once
    rows = [(1, 0), (1, 0), (1, 2), (2, 0), (3, 1), (3, 2), (3, 3)]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * US_PER_DAY + 5 for r in rows],
                       pa.timestamp("us")),
    })
    for nb in (1, 4):
        got = {
            (r["cohort"], r["day_offset"]): r["n_users"]
            for r in cohort_retention(rd.from_arrow(t),
                                      num_buckets=nb).take_all()
        }
        assert got == {(0, 0): 2, (0, 2): 1,
                       (1, 0): 1, (1, 1): 1, (1, 2): 1}, f"nb={nb}"


def test_rolling_window_unbounded_running_total():
    """k=None — ROWS UNBOUNDED PRECEDING (per-user running total)."""
    from essentials_rd.windows import rolling_window_agg

    tbl = _mk_events(seed=11)
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    g = df.groupby("user_id", sort=False)["__cents__"]
    df["roll_sum"] = g.cumsum()
    df["roll_n"] = g.cumcount() + 1
    want = (df[["event_id", "roll_sum", "roll_n"]].astype("int64")
            .sort_values("event_id").reset_index(drop=True))
    for nb in (1, 16):
        got = (rolling_window_agg(rd.from_arrow(tbl), k=None, num_buckets=nb)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        assert got.equals(want), f"num_buckets={nb}"


def test_event_sequences_matches_pandas_cap_and_ties():
    from essentials_rd.windows import event_sequences

    rng = np.random.default_rng(4)
    n = 500
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            1_700_000_000_000_000 + rng.integers(0, 10**6, n).astype("int64"),
            pa.int64(),
        ).cast(pa.timestamp("us")),  # small range -> plenty of ts ties
        "user_id": pa.array(rng.integers(0, 9, n), pa.int64()),
        "event_type": pa.array(rng.choice(["a", "bb", "c"], n)),
    })
    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    head = df.groupby("user_id", sort=True).head(5)
    want = head.groupby("user_id", sort=True).agg(
        seq=("event_type", "|".join), seq_len=("event_type", "size")
    ).reset_index().astype({"seq_len": "int64"})
    for nb in (1, 16):
        got = (event_sequences(rd.from_arrow(tbl), max_len=5, num_buckets=nb)
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        assert got.equals(want), f"nb={nb}"


def test_range_window_matches_duckdb_and_bucket_invariant():
    import duckdb

    from essentials_rd.windows import range_window_agg

    rng = np.random.default_rng(23)
    n = 1500
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype(np.int64),
        "ts": pd.to_datetime(
            1_700_000_000_000_000
            # coarse grid => many exact ts ties (RANGE peers) and many
            # rows exactly span-apart (closed-interval boundary hits)
            + rng.integers(0, 300, n).astype("int64") * US_PER_MIN,
            unit="us",
        ),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "__cents__": rng.integers(-500, 500, n).astype(np.int64),
    })
    span_us = 60 * US_PER_MIN
    want = duckdb.sql(
        "SELECT event_id, CAST(sum(__cents__) OVER w AS BIGINT) AS range_sum, "
        "CAST(count(*) OVER w AS BIGINT) AS range_n FROM df "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    ).df().sort_values("event_id").reset_index(drop=True)
    # the fixture must actually exercise ties: some user has peer rows
    assert df.duplicated(["user_id", "ts"]).any()
    prev = None
    for nparts, nb in ((1, 1), (7, 16)):
        got = range_window_agg(
            rd.from_pandas(df).repartition(nparts), span_us, num_buckets=nb
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                      check_dtype=False)
        if prev is not None:
            pd.testing.assert_frame_equal(got, prev)
        prev = got


def test_transition_counts_matches_pandas_lag():
    from essentials_rd.windows import transition_counts

    rng = np.random.default_rng(47)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10**6, n), unit="s"),
        "event_type": rng.choice(list("abcde"), n),
    })
    # equal timestamps stress the (ts, id) tie-break
    df.loc[5:40, "ts"] = df.loc[5, "ts"]
    want = df.sort_values(["user_id", "ts", "event_id"]).copy()
    want["prev"] = want.groupby("user_id")["event_type"].shift(1)
    want = (want.dropna(subset=["prev"])
                .groupby(["prev", "event_type"]).size()
                .rename("n").reset_index()
                .sort_values(["prev", "event_type"])
                .reset_index(drop=True))
    for nb in (1, 16):
        got = (transition_counts(
                   rd.from_arrow(pa.Table.from_pandas(df)).repartition(6),
                   "event_type", num_buckets=nb)
               .to_pandas()
               .sort_values(["prev_val", "next_val"])
               .reset_index(drop=True))
        assert got["prev_val"].tolist() == want["prev"].tolist()
        assert got["next_val"].tolist() == want["event_type"].tolist()
        assert got["n"].tolist() == want["n"].tolist(), f"nb={nb}"


def _merge_ref(rows):
    """Brute-force interval union per key."""
    out = []
    bykey = {}
    for k, s, e in rows:
        bykey.setdefault(k, []).append((s, e))
    for k, ivs in bykey.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e, n = max(cur_e, e), n + 1
            else:
                out.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        out.append((k, cur_s, cur_e, n))
    return sorted(out)


def test_merge_intervals_matches_bruteforce_and_layout_invariant():
    from essentials_rd.windows import merge_intervals

    rng = np.random.default_rng(17)
    n = 400
    rows = [
        (int(k), int(s), int(s + d))
        for k, s, d in zip(
            rng.integers(0, 12, n),
            rng.integers(0, 10_000, n),
            rng.integers(0, 500, n),  # includes zero-length extents
        )
    ]
    # plant exact-touch pairs: [100,200) then [200,300) must merge
    rows += [(99, 100, 200), (99, 200, 300), (99, 301, 310)]
    want = _merge_ref(rows)
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "s": pa.array([r[1] for r in rows], pa.int64()),
        "e": pa.array([r[2] for r in rows], pa.int64()),
    })
    outs = []
    for parts in (1, 7):
        got = merge_intervals(
            rd.from_arrow(t).repartition(parts), num_buckets=8
        ).to_pandas()
        outs.append(sorted(
            (int(r.user_id), int(r.iv_start), int(r.iv_end), int(r.n_src))
            for r in got.itertuples()
        ))
    assert outs[0] == want
    assert outs[0] == outs[1]
    # the planted touch-merge collapsed into one interval
    k99 = [r for r in outs[0] if r[0] == 99]
    assert k99 == [(99, 100, 300, 2), (99, 301, 310, 1)]


def test_merge_intervals_rejects_inverted_extent():
    import pytest as _pytest

    from essentials_rd.windows import merge_intervals

    t = pa.table({
        "user_id": pa.array([1], pa.int64()),
        "s": pa.array([10], pa.int64()),
        "e": pa.array([5], pa.int64()),
    })
    with _pytest.raises(Exception, match="end < start"):
        merge_intervals(rd.from_arrow(t), num_buckets=2).to_pandas()


def test_lag1_moments_matches_pandas_and_layout_invariant():
    from essentials_rd.windows import lag1_moments

    rng = np.random.default_rng(23)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**7, n), unit="us"),
        "user_id": rng.integers(0, 9, n).astype(np.int64),
        "value": rng.uniform(0, 50, n),
    })
    # equal timestamps stress the (ts, event_id) tie-break
    df.loc[100:130, "ts"] = df.loc[100, "ts"]
    x = np.floor(df.value.to_numpy() * 100 + 0.5).astype(np.int64)
    df["x"] = x
    s = df.sort_values(["user_id", "ts", "event_id"])
    want = {}
    for uid, g in s.groupby("user_id"):
        v = g.x.to_numpy()
        a, b = v[:-1], v[1:]
        want[int(uid)] = (len(v), int(v.sum()), int((v * v).sum()),
                          len(a), int(a.sum()), int(b.sum()),
                          int((a * b).sum()))
    outs = []
    for parts in (1, 6):
        got = lag1_moments(
            rd.from_pandas(df.drop(columns=["x"])).repartition(parts),
            num_buckets=8,
        ).to_pandas().sort_values("user_id")
        outs.append({
            int(r.user_id): (int(r.n), int(r.sum_x), int(r.sum_xx),
                             int(r.n_pairs), int(r.sum_a), int(r.sum_b),
                             int(r.sum_ab))
            for r in got.itertuples()
        })
    assert outs[0] == want
    assert outs[0] == outs[1]


def test_lag1_moments_single_event_user():
    from essentials_rd.windows import lag1_moments

    df = pd.DataFrame({
        "event_id": [0], "ts": [pd.Timestamp("2024-01-01")],
        "user_id": [7], "value": [1.25],
    })
    got = lag1_moments(rd.from_pandas(df), num_buckets=2).to_pandas()
    r = got.iloc[0]
    assert (int(r.n), int(r.sum_x), int(r.n_pairs), int(r.sum_a),
            int(r.sum_b), int(r.sum_ab)) == (1, 125, 0, 0, 0, 0)
