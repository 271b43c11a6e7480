"""Heaps'-law vocabulary curve, token collision stats, gap log
histogram (__ray_entry__) vs pure-Python brute force on planted data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    }), str(tmp_path / "documents.parquet"))


def test_heaps_vocab_curve_brute(tmp_path):
    from __ray_entry__ import _q_heaps_vocab_curve

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for d in range(25):
        toks = rng.choice(vocab, size=int(rng.integers(3, 30))).tolist()
        rows.append((d, " ".join(toks), "aa"))
    _write_docs(tmp_path, rows)

    stream = [t for _, txt, _ in sorted(rows) for t in txt.split(" ")]
    c = len(stream)
    got = _q_heaps_vocab_curve(str(tmp_path)).to_pandas()
    assert got["k"].tolist() == list(range(1, 9))
    for _, r in got.iterrows():
        nk = (r["k"] * c + 7) // 8
        assert r["prefix_tokens"] == nk
        assert r["vocab"] == len(set(stream[:nk]))
    # the full-corpus checkpoint sees the whole vocabulary
    assert got["vocab"].iloc[-1] == len(set(stream))


def test_token_collision_stats_brute(tmp_path):
    from __ray_entry__ import _q_token_collision_stats

    rng = np.random.default_rng(9)
    rows = []
    for d in range(30):
        lang = "aa" if d % 3 else "bb"
        toks = rng.choice([f"t{i}" for i in range(12)],
                          size=int(rng.integers(2, 20))).tolist()
        rows.append((d, " ".join(toks), lang))
    _write_docs(tmp_path, rows)

    got = _q_token_collision_stats(str(tmp_path)).to_pandas()
    for lang in ("aa", "bb"):
        toks = [t for _, txt, lg in rows if lg == lang
                for t in txt.split(" ")]
        vc = pd.Series(toks).value_counts()
        r = got[got["lang"] == lang].iloc[0]
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct"] == len(vc)
        assert r["sum_c2"] == int((vc.to_numpy(np.int64) ** 2).sum())


def test_gap_log_histogram_brute(tmp_path):
    from __ray_entry__ import _q_gap_log_histogram

    rng = np.random.default_rng(3)
    n = 400
    users = rng.integers(0, 12, n)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # gaps spanning many log buckets, including exact dup timestamps
    ts = base + np.cumsum(rng.integers(0, 10**7, n)).astype("timedelta64[us]")
    ts[50] = ts[49]  # force at least one candidate 0/short gap pair
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(users, pa.int64()),
    }), str(tmp_path / "events.parquet"))

    df = pd.DataFrame({"u": users, "s": ts.astype(np.int64),
                       "e": np.arange(n)})
    gaps = []
    for _, g in df.sort_values(["u", "s", "e"]).groupby("u"):
        gaps.extend(np.diff(g["s"].to_numpy()).tolist())
    gaps = np.asarray(gaps, np.int64)
    want = {}
    for g in gaps:
        b = 0 if g == 0 else int(g).bit_length()
        st = want.setdefault(b, [0, 1 << 62, -1, 0])
        st[0] += 1
        st[1] = min(st[1], g)
        st[2] = max(st[2], g)
        st[3] += g

    got = _q_gap_log_histogram(str(tmp_path)).to_pandas()
    assert got["bucket"].tolist() == sorted(want)
    for _, r in got.iterrows():
        st = want[r["bucket"]]
        assert (r["n_gaps"], r["min_gap"], r["max_gap"], r["sum_gap"]) == \
            (st[0], st[1], st[2], st[3])


def test_skyline2d_brute():
    from __ray_entry__ import _skyline2d

    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 200
        c = rng.integers(0, 40, n)
        d = rng.integers(0, 40, n)
        k = np.arange(n)
        got = set(k[_skyline2d(c, d, k)].tolist())
        want = set()
        for i in range(n):
            dominated = any(
                c[j] <= c[i] and d[j] <= d[i]
                and (c[j] < c[i] or d[j] < d[i])
                for j in range(n)
            )
            if not dominated:
                want.add(i)
        assert got == want


def test_skyline2d_duplicates_all_survive():
    from __ray_entry__ import _skyline2d

    c = np.array([5, 5, 7, 3], np.int64)
    d = np.array([2, 2, 1, 9], np.int64)
    k = np.arange(4)
    got = set(k[_skyline2d(c, d, k)].tolist())
    # the two identical (5,2) points tie — both survive; (7,1) and
    # (3,9) are incomparable corners
    assert got == {0, 1, 2, 3}


def test_bootstrap_median_ci_brute(tmp_path):
    """Replay the exact splitmix resampling in pure NumPy and require
    identical CI bounds; sanity: lo <= point <= hi on planted data."""
    from essentials_rd.util import _GOLDEN, hash64

    from __ray_entry__ import BOOT_B, BOOT_SEED, _q_bootstrap_median_ci

    rng = np.random.default_rng(2)
    n_ev = 600
    users = rng.integers(0, 37, n_ev)
    value = rng.uniform(1, 500, n_ev)
    pq.write_table(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "value": pa.array(value, pa.float64()),
    }), str(tmp_path / "events.parquet"))

    cents = np.floor(value * 100 + 0.5).astype(np.int64)
    df = pd.DataFrame({"u": users, "c": cents})
    totals = df.groupby("u")["c"].sum().sort_index().to_numpy(np.int64)
    n = len(totals)
    with np.errstate(over="ignore"):
        keys = (np.arange(BOOT_B, dtype=np.uint64)[:, None] * np.uint64(n)
                + np.arange(n, dtype=np.uint64)[None, :]
                + np.uint64(BOOT_SEED) * _GOLDEN)
    picks = (hash64(keys.ravel()) % np.uint64(n)).astype(np.int64)
    meds = np.sort(
        np.sort(totals[picks].reshape(BOOT_B, n), axis=1)
        [:, int(np.ceil(0.5 * n)) - 1]
    )
    want_lo = int(meds[int(np.ceil(0.025 * BOOT_B)) - 1])
    want_hi = int(meds[int(np.ceil(0.975 * BOOT_B)) - 1])
    point = int(np.sort(totals)[int(np.ceil(0.5 * n)) - 1])

    got = _q_bootstrap_median_ci(str(tmp_path)).to_pylist()[0]
    assert got["n_users"] == n
    assert got["median_cents"] == point
    assert got["ci_lo"] == want_lo
    assert got["ci_hi"] == want_hi
    assert got["ci_lo"] <= got["median_cents"] <= got["ci_hi"]


def test_ransac_finds_planted_line(tmp_path):
    """80% of points sit within T of y = 2000x + 500; RANSAC must pick
    a trial whose inlier count ≥ the planted inlier mass, and the
    engine result must equal a NumPy replay of the same hash-exact
    trials."""
    from essentials_rd.util import _GOLDEN, hash64

    from __ray_entry__ import (RANSAC_K, RANSAC_T, _q_ransac_qty_price)

    rng = np.random.default_rng(4)
    n = 2000
    x = rng.integers(1, 51, n)
    on_line = rng.random(n) < 0.8
    y = np.where(
        on_line,
        2000 * x + 500 + rng.integers(-200, 201, n),
        rng.integers(900, 110_000, n),
    ).astype(np.int64)
    ok = np.arange(n) + 1
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_linenumber": pa.array(np.ones(n, np.int64), pa.int64()),
        "l_quantity": pa.array(x, pa.int64()),
        "l_extendedprice": pa.array(y.astype(np.float64), pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))

    got = _q_ransac_qty_price(str(tmp_path)).to_pylist()[0]

    # NumPy replay of the exact same min-hash trials
    key = (((ok * 64 + 1) << 24) | (x.astype(np.int64) << 17)
           | y).astype(np.uint64)
    best = (-1, None)
    t2 = RANSAC_T * RANSAC_T
    for tt in range(RANSAC_K):
        with np.errstate(over="ignore"):
            z = hash64(key + np.uint64(tt) * _GOLDEN)
        o = np.lexsort((key, z))[:2]
        x1, y1, x2, y2 = x[o[0]], y[o[0]], x[o[1]], y[o[1]]
        dx, dy = int(x2 - x1), int(y2 - y1)
        num = dx * (int(y1) - y.astype(object)) - (int(x1) - x.astype(object)) * dy
        inl = int(sum(1 for v in num if v * v <= t2 * (dx * dx + dy * dy)))
        if inl > best[0]:
            best = (inl, (tt, x1, y1, x2, y2))
    want_inl, (want_t, wx1, wy1, wx2, wy2) = best
    assert got["trial"] == want_t and got["inliers"] == want_inl
    assert (got["x1"], got["y1"], got["x2"], got["y2"]) == \
        (wx1, wy1, wx2, wy2)
    # sanity: some trial found a meaningful consensus set
    assert got["inliers"] >= int(0.05 * n)


def test_trailing_distinct_users_brute(tmp_path):
    from __ray_entry__ import TDU_W, _q_trailing_distinct_users

    rng = np.random.default_rng(13)
    n = 500
    users = rng.integers(0, 20, n)
    days = np.sort(rng.integers(0, 60, n))
    # plant a dead zone so zero-count days are exercised
    days = np.where((days >= 25) & (days < 40), days + 20, days)
    base = np.datetime64("2024-03-01", "D")
    ts = (base + days.astype("timedelta64[D]")).astype("datetime64[us]")
    pq.write_table(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts),
    }), str(tmp_path / "events.parquet"))

    dayno = (ts.astype("datetime64[us]").astype(np.int64)
             // 86_400_000_000)
    want = {}
    for d in range(int(dayno.min()), int(dayno.max()) + 1):
        us = set(users[(dayno > d - TDU_W) & (dayno <= d)].tolist())
        if us:
            want[d] = len(us)
    got = _q_trailing_distinct_users(str(tmp_path)).to_pandas()
    assert dict(zip(got["day"], got["n_users"])) == want


def test_frequent_triples_brute(tmp_path):
    from itertools import combinations

    from __ray_entry__ import TRIPLE_MIN_SUPPORT, _q_frequent_triples

    rng = np.random.default_rng(21)
    rows = []
    for o in range(80):
        parts = rng.choice(30, size=int(rng.integers(1, 7)),
                           replace=False)
        for p in parts:
            rows.append((o, int(p)))
        if o % 4 == 0:  # plant a recurring triple
            for p in (101, 102, 103):
                rows.append((o, p))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))

    baskets = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    counts = {}
    for o, ps in baskets.items():
        for tri in combinations(sorted(ps), 3):
            counts[tri] = counts.get(tri, 0) + 1
    want = {t: c for t, c in counts.items() if c >= TRIPLE_MIN_SUPPORT}

    got = _q_frequent_triples(str(tmp_path)).to_pandas()
    got_d = {(r["p1"], r["p2"], r["p3"]): r["support"]
             for _, r in got.iterrows()}
    assert got_d == want
    assert got_d[(101, 102, 103)] == 20


def test_kneser_ney_counts_brute(tmp_path):
    from __ray_entry__ import KN_MIN_COUNT, _q_kneser_ney_counts

    rng = np.random.default_rng(6)
    vocab = [f"w{i}" for i in range(15)]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 25))))
            for _ in range(40)]
    pq.write_table(pa.table({"text": pa.array(docs, pa.string())}),
                   str(tmp_path / "documents.parquet"))

    bg = {}
    for d in docs:
        toks = d.split(" ")
        for a, b in zip(toks[:-1], toks[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    stats = {}
    for (a, b), c in bg.items():
        sa = stats.setdefault(a, [0, 0, 0, 0])  # c_out, c_in, n_r, n_l
        sa[0] += c
        sa[2] += 1
        sb = stats.setdefault(b, [0, 0, 0, 0])
        sb[1] += c
        sb[3] += 1
    types = len(bg)

    got = _q_kneser_ney_counts(str(tmp_path)).to_pandas()
    want = {t: s for t, s in stats.items()
            if s[0] + s[1] >= 2 * KN_MIN_COUNT}
    assert set(got["token"]) == set(want)
    for _, r in got.iterrows():
        s = want[r["token"]]
        assert (r["c_out"], r["c_in"], r["n_right"], r["n_left"]) == \
            tuple(s)
        assert r["bigram_types"] == types


def test_urgent_run_stats_brute(tmp_path):
    """Planted run structure incl. runs spanning partition boundaries
    — the associative cross-partition stitch must match a sequential
    scan exactly."""
    from __ray_entry__ import _q_urgent_run_stats

    rng = np.random.default_rng(17)
    n = 3000
    # long runs: flip with low probability so runs cross the 16
    # range partitions often
    flips = rng.random(n) < 0.02
    bits = np.cumsum(flips) % 2
    prios = np.where(bits == 1, "1-URGENT", "5-LOW")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_orderpriority": pa.array(prios.tolist(), pa.string()),
    }), str(tmp_path / "orders.parquet"))

    runs = []
    cur, ln = int(bits[0]), 0
    for b in bits:
        if int(b) == cur:
            ln += 1
        else:
            runs.append((cur, ln))
            cur, ln = int(b), 1
    runs.append((cur, ln))
    got = _q_urgent_run_stats(str(tmp_path)).to_pylist()[0]
    assert got["n_rows"] == n
    assert got["n_runs"] == len(runs)
    assert got["longest_any_run"] == max(l for _, l in runs)
    urg = [l for v, l in runs if v == 1]
    assert got["longest_urgent_run"] == (max(urg) if urg else 0)


def test_pettitt_changepoint_brute(tmp_path):
    """Planted level shift: a series that jumps from ~5 to ~50 halfway
    must put t* at the shift; engine must equal the O(n^2) definition
    exactly."""
    from __ray_entry__ import _q_pettitt_changepoint

    rng = np.random.default_rng(8)
    m = 120
    counts = np.r_[rng.poisson(5, 60), rng.poisson(50, 60)]
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = []
    for h, c in enumerate(counts):
        for j in range(int(c)):
            ts.append(base + np.timedelta64(h * 3600_000_000 + j, "us"))
    ts = np.array(ts, "datetime64[us]")
    pq.write_table(pa.table({"ts": pa.array(ts)}),
                   str(tmp_path / "events.parquet"))

    x = counts.astype(np.int64)
    n = len(x)
    u = np.array([
        sum(np.sign(x[j] - x[i]) for i in range(t + 1)
            for j in range(t + 1, n))
        for t in range(n - 1)
    ], np.int64)
    k = int(np.abs(u).max())
    t_star = int(np.flatnonzero(np.abs(u) == k)[0])

    got = _q_pettitt_changepoint(str(tmp_path)).to_pylist()[0]
    assert got["grid_hours"] == n
    assert got["k_stat"] == k
    assert got["t_star"] == t_star
    assert got["u_signed"] == int(u[t_star])
    assert 55 <= got["t_star"] <= 62  # the planted shift


def test_poly_hash_matches_duckdb_replay():
    """The SQL-replayable polynomial byte hash: engine vectorized
    computation equals the DuckDB expression the oracle uses, over
    random ASCII tokens including the empty string."""
    import duckdb

    from __ray_entry__ import _POLY_P, _POLY_POWS, _poly_hash_tokens

    rng = np.random.default_rng(31)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789_"
    toks = sorted({""} | {
        "".join(rng.choice(list(alpha), size=int(rng.integers(1, 20))))
        for _ in range(200)
    })  # distinct, like the oracle's SELECT DISTINCT token stream
    want = _poly_hash_tokens(toks)

    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"tok": toks}))
    pows = ", ".join(f"({i + 1}, {p})" for i, p in enumerate(_POLY_POWS))
    got = con.sql(
        f"WITH pw AS (SELECT * FROM (VALUES {pows}) p(j, b)) "
        "SELECT t.tok, COALESCE(SUM(CAST(ord(substr(t.tok, pw.j, 1)) "
        f"AS BIGINT) * pw.b), 0) % {_POLY_P} AS ph "
        "FROM t LEFT JOIN pw ON pw.j <= length(t.tok) "
        "GROUP BY t.tok"
    ).df().set_index("tok")["ph"].to_dict()
    for tok, w in zip(toks, want):
        assert got[tok] == w, tok
