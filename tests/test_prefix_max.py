"""ops.global_prefix_max (the exclusive distributed running-max /
watermark primitive) vs a brute-force sorted scan: exact equality on
random data, −inf sentinel on the global first row, tie-break columns,
and block-layout / partition-count invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import PREFIX_MAX_NEG_INF, global_prefix_max
from essentials_rd.util import np_col


def _brute(order, ties, vals):
    idx = np.lexsort((ties, order))
    o, v = order[idx], vals[idx]
    out = np.empty(len(v), np.int64)
    cur = PREFIX_MAX_NEG_INF
    for i in range(len(v)):
        out[i] = cur
        cur = max(cur, int(v[i]))
    # map back to (order, tie) keyed dict
    return {(int(o[i]), int(ties[idx][i] if len(ties) else 0)): int(out[i])
            for i in range(len(v))}


def _run(t: pa.Table, n_blocks: int, n_parts: int):
    ds = rd.from_arrow(t).repartition(n_blocks)
    out = global_prefix_max(
        ds, "k", ["tie"], "v", lambda b: np_col(b, "k"),
        n_parts=n_parts).take_all()
    return {(r["k"], r["tie"]): r["prev_max"] for r in out}


def test_prefix_max_matches_brute_force_any_layout():
    rng = np.random.default_rng(17)
    n = 800
    k = rng.permutation(n).astype(np.int64) * 7  # unique, gappy
    tie = np.zeros(n, np.int64)
    v = rng.integers(-10**6, 10**6, n).astype(np.int64)
    t = pa.table({"k": pa.array(k), "tie": pa.array(tie),
                  "v": pa.array(v)})
    want = _brute(k, tie, v)
    assert _run(t, 1, 4) == want
    assert _run(t, 9, 4) == want
    assert _run(t, 9, 16) == want


def test_prefix_max_first_row_sentinel_and_ties():
    # duplicate k values: the tie column must disambiguate, and the
    # scan order is (k, tie) — earlier tie's value is visible to later
    k = np.array([5, 5, 5, 1, 9], np.int64)
    tie = np.array([2, 0, 1, 0, 0], np.int64)
    v = np.array([100, 7, 50, 3, 1], np.int64)
    t = pa.table({"k": pa.array(k), "tie": pa.array(tie),
                  "v": pa.array(v)})
    got = _run(t, 3, 2)
    # order: (1,0)v=3 → (5,0)v=7 → (5,1)v=50 → (5,2)v=100 → (9,0)
    assert got[(1, 0)] == PREFIX_MAX_NEG_INF
    assert got[(5, 0)] == 3
    assert got[(5, 1)] == 7
    assert got[(5, 2)] == 50
    assert got[(9, 0)] == 100


def test_prefix_max_monotone_input_is_shifted_identity():
    n = 200
    k = np.arange(n, dtype=np.int64)
    v = np.arange(n, dtype=np.int64) * 10
    t = pa.table({"k": pa.array(k),
                  "tie": pa.array(np.zeros(n, np.int64)),
                  "v": pa.array(v)})
    got = _run(t, 5, 8)
    assert got[(0, 0)] == PREFIX_MAX_NEG_INF
    for i in range(1, n):
        assert got[(i, 0)] == (i - 1) * 10


def test_rolling_median_matches_pandas_brute_force():
    from essentials_rd.windows import rolling_window_median

    rng = np.random.default_rng(23)
    n, users, k = 700, 12, 5
    u = rng.integers(0, users, n).astype(np.int64)
    t = rng.integers(0, 1_000_000, n).astype(np.int64)
    u[:6] = 3
    t[:6] = 777  # same-user ts ties → (ts, event_id) tie-break
    v = rng.integers(-500, 500, n).astype(np.int64)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(t, pa.timestamp("us")),
        "user_id": pa.array(u),
        "__cents__": pa.array(v),
    })
    got = {r["event_id"]: (r["roll_median"], r["roll_n"])
           for r in rolling_window_median(
               rd.from_arrow(tbl).repartition(7), k=k).take_all()}
    # brute force: per user, sorted by (ts, event_id), lower median
    import pandas as pd
    df = pd.DataFrame({"e": np.arange(n), "t": t, "u": u, "v": v})
    for _, g in df.sort_values(["u", "t", "e"]).groupby("u"):
        vals = g["v"].to_numpy()
        es = g["e"].to_numpy()
        for i in range(len(g)):
            w = vals[max(0, i - k + 1): i + 1]
            med = int(np.sort(w)[(len(w) - 1) // 2])
            assert got[int(es[i])] == (med, len(w))
    assert len(got) == n


def test_bitmap_index_counts_brute_force():
    from essentials_rd.ops import bitmap_index_counts

    rng = np.random.default_rng(31)
    n = 3000
    # sparse, shuffled keyspace exercises word packing across blocks
    keys = rng.permutation(50_000)[:n].astype(np.int64)
    a = rng.random(n) < 0.3
    b = rng.random(n) < 0.5
    t = pa.table({"k": pa.array(keys), "a": pa.array(a), "b": pa.array(b)})
    for blocks in (1, 11):
        out = bitmap_index_counts(
            rd.from_arrow(t).repartition(blocks), "k",
            [("a", lambda bt: np.asarray(bt.column("a"))),
             ("b", lambda bt: np.asarray(bt.column("b")))])
        assert out["a"] == int(a.sum())
        assert out["b"] == int(b.sum())
        assert out["__and__"] == int((a & b).sum())

    # same word, bits from different blocks: keys 0..63 split across
    # blocks must OR into one word correctly
    t2 = pa.table({"k": pa.array(np.arange(64, dtype=np.int64)),
                   "a": pa.array([True] * 64),
                   "b": pa.array([i % 2 == 0 for i in range(64)])})
    out2 = bitmap_index_counts(
        rd.from_arrow(t2).repartition(8), "k",
        [("a", lambda bt: np.asarray(bt.column("a"))),
         ("b", lambda bt: np.asarray(bt.column("b")))])
    assert out2 == {"a": 64, "b": 32, "__and__": 32}


def test_haar_parseval_and_brute_force(tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    rng = np.random.default_rng(61)
    n = 3000
    # events spread over ~100 hours so the 64-hour window has gaps
    h = rng.integers(0, 100, n).astype(np.int64)
    ts = h * 3_600_000_000 + rng.integers(0, 3_600_000_000, n)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}),
                   d / "events.parquet")
    out = e._q_haar_hourly(str(d)).to_pydict()
    # brute-force series
    hmin = int(h.min())
    v = np.zeros(64, np.int64)
    for hh in h:
        off = int(hh) - hmin
        if 0 <= off < 64:
            v[off] += 1
    x = v.astype(np.int64).copy()
    rows = {}
    for lvl in range(1, 7):
        s, dd = x[0::2] + x[1::2], x[0::2] - x[1::2]
        rows[lvl] = (len(dd), int(np.abs(dd).sum()), int((dd * dd).sum()))
        x = s
    rows[0] = (1, abs(int(x[0])), int(x[0]) ** 2)
    for i, lvl in enumerate(out["level"]):
        assert (out["n_coeffs"][i], out["d_abs_sum"][i],
                out["d_energy"][i]) == rows[lvl]
    # Parseval for unnormalized lifting:
    # sum_l 2^-l * E_l + 2^-L * a^2 == sum x^2
    tot = sum(out["d_energy"][i] * 2.0 ** -lvl if lvl else 0
              for i, lvl in enumerate(out["level"]))
    a2 = next(out["d_energy"][i] for i, lvl in enumerate(out["level"])
              if lvl == 0)
    assert tot + a2 * 2.0 ** -6 == float((v.astype(np.int64) ** 2).sum())


def test_nra_topk_exact_and_early_stop():
    from essentials_rd.ops import nra_topk

    rng = np.random.default_rng(77)
    n = 5000
    keys = np.arange(n, dtype=np.int64)
    # skewed scores: a few dominant keys → NRA must stop early
    va = rng.zipf(1.5, n).astype(np.int64) * 10
    vb = rng.zipf(1.5, n).astype(np.int64) * 10
    va[:3] += 10_000_000  # clear leaders on both lists
    vb[:3] += 10_000_000
    A = rd.from_arrow(pa.table({"k": pa.array(keys), "v": pa.array(va)}))
    B = rd.from_arrow(pa.table({"k": pa.array(keys), "v": pa.array(vb)}))
    rows, sa, sb = nra_topk(A, B, "k", "v", 5, batch_rows=64)
    comb = va + vb
    want = sorted(range(n), key=lambda i: (-comb[i], i))[:5]
    assert [r[0] for r in rows] == [int(i) for i in want]
    assert [r[1] for r in rows] == [int(comb[i]) for i in want]
    assert [r[2] for r in rows] == [int(va[i]) for i in want]
    # the whole point: the tail was never scanned
    assert sa < n and sb < n, (sa, sb)

    # adversarial ties at the k boundary must still match full scan
    va2 = np.full(50, 100, np.int64)
    vb2 = np.full(50, 100, np.int64)
    A2 = rd.from_arrow(pa.table({"k": pa.array(np.arange(50, dtype=np.int64)),
                                 "v": pa.array(va2)}))
    B2 = rd.from_arrow(pa.table({"k": pa.array(np.arange(50, dtype=np.int64)),
                                 "v": pa.array(vb2)}))
    rows2, _, _ = nra_topk(A2, B2, "k", "v", 5, batch_rows=16)
    assert [r[0] for r in rows2] == [0, 1, 2, 3, 4]  # key-asc ties

    # keys present in only one list resolve to 0 on the other side
    A3 = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                 "v": pa.array([10, 5], pa.int64())}))
    B3 = rd.from_arrow(pa.table({"k": pa.array([2, 3], pa.int64()),
                                 "v": pa.array([100, 1], pa.int64())}))
    rows3, _, _ = nra_topk(A3, B3, "k", "v", 3)
    assert rows3 == [(2, 105, 5, 100), (1, 10, 10, 0), (3, 1, 0, 1)]


def test_hopping_distinct_users_brute_force(tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    rng = np.random.default_rng(91)
    n = 1500
    u = rng.integers(0, 25, n).astype(np.int64)
    h = rng.integers(100, 140, n).astype(np.int64)
    ts = h * 3_600_000_000 + rng.integers(0, 3_600_000_000, n)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "user_id": pa.array(u),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), d / "events.parquet", row_group_size=131)
    out = e._q_hopping_distinct(str(d)).to_pydict()
    got = dict(zip(out["win_start_hour"], out["n_users"]))
    # brute force: window w covers hours [w, w+6)
    import collections
    byh = collections.defaultdict(set)
    for i in range(n):
        byh[int(h[i])].add(int(u[i]))
    for w in got:
        users = set()
        for hh in range(w, w + e.HOPD_SIZE):
            users |= byh.get(hh, set())
        assert got[w] == len(users)
    # a user active in hours w and w+5 is counted ONCE in window w
    assert min(got) == int(h.min()) - e.HOPD_SIZE + 1
    assert max(got) == int(h.max())


def test_spatial_grid_join_brute_force(tmp_path):
    """The grid-bucketed radius join equals the quadratic brute force,
    including boundary pairs that straddle cell borders."""
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from essentials_rd.util import hash64

    n = 500
    keys = np.arange(1, n + 1, dtype=np.int64)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"p_partkey": pa.array(keys)}),
                   d / "part.parquet", row_group_size=41)
    out = e._q_spatial_join(str(d)).to_pydict()
    mix = np.uint64((e.SP_SEED * 0x9E3779B97F4A7C15) % (1 << 64))
    with np.errstate(over="ignore"):
        z = hash64(keys.astype(np.uint64) + mix)
    x = (z % np.uint64(e.SP_GRID)).astype(np.int64)
    y = ((z >> np.uint64(12)) % np.uint64(e.SP_GRID)).astype(np.int64)
    npairs = 0
    lsum = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = abs(int(x[i] - x[j])), abs(int(y[i] - y[j]))
            if dx <= e.SP_R and dy <= e.SP_R:
                npairs += 1
                lsum += max(dx, dy)
    assert out == {"n_pairs": [npairs], "linf_sum": [lsum]}
    assert npairs > 0  # the fixture actually exercises matches


def test_point_in_triangle_matplotlib_free_reference(tmp_path):
    """Orientation-predicate containment vs an independent barycentric
    reference, plus hand-placed inside/outside/edge points."""
    import __ray_entry__ as e

    (ax, ay), (bx, by), (cx, cy) = e.SP_TRI

    def orient(x, y):
        d1 = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
        d2 = (cx - bx) * (y - by) - (cy - by) * (x - bx)
        d3 = (ax - cx) * (y - cy) - (ay - cy) * (x - cx)
        return d1 >= 0 and d2 >= 0 and d3 >= 0

    def bary(x, y):
        den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        l1 = ((by - cy) * (x - cx) + (cx - bx) * (y - cy)) / den
        l2 = ((cy - ay) * (x - cx) + (ax - cx) * (y - cy)) / den
        l3 = 1 - l1 - l2
        return l1 >= -1e-12 and l2 >= -1e-12 and l3 >= -1e-12

    rng = np.random.default_rng(3)
    for _ in range(2000):
        x, y = int(rng.integers(0, 4096)), int(rng.integers(0, 4096))
        assert orient(x, y) == bary(x, y)
    # centroid inside; far corner outside; vertex on edge
    gx = (ax + bx + cx) // 3
    gy = (ay + by + cy) // 3
    assert orient(gx, gy)
    assert not orient(0, 4095)
    assert orient(ax, ay)  # vertex counts as on-boundary inside


def test_xcorr_planted_lag(tmp_path):
    """A planted 'purchases trail views by 5 hours' pattern must put
    the argmax at lag 5, and dots match a numpy replay."""
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    rng = np.random.default_rng(45)
    rows_t, rows_ty = [], []
    base = 1_000
    for burst in range(40):
        h = base + int(rng.integers(0, 200))
        for _ in range(8):
            rows_t.append(h * 3_600_000_000 + int(rng.integers(0, 3600)))
            rows_ty.append("view")
        for _ in range(6):
            rows_t.append((h + 5) * 3_600_000_000
                          + int(rng.integers(0, 3600)))
            rows_ty.append("purchase")
    # background noise of other types (ignored by the query)
    for i in range(100):
        rows_t.append((base + i) * 3_600_000_000)
        rows_ty.append("click")
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "event_type": pa.array(rows_ty, pa.string()),
        "ts": pa.array(np.array(rows_t, np.int64), pa.timestamp("us")),
    }), d / "events.parquet", row_group_size=97)
    out = e._q_xcorr(str(d)).to_pydict()
    assert out["best_lag"][0] == 5
    # numpy replay
    hs = np.array(rows_t, np.int64) // 3_600_000_000
    ty = np.array(rows_ty, object)
    hmin = hs[(ty == "view") | (ty == "purchase")].min()
    hmax = hs[(ty == "view") | (ty == "purchase")].max()
    n = int(hmax - hmin + 1)
    v = np.zeros(n, np.int64)
    p = np.zeros(n, np.int64)
    for h, t in zip(hs, ty):
        if t == "view":
            v[h - hmin] += 1
        elif t == "purchase":
            p[h - hmin] += 1
    for i, L in enumerate(out["lag"]):
        assert out["dot"][i] == int((v[: n - L] * p[L:]).sum())


def test_nra_topk_k_exceeds_universe():
    from essentials_rd.ops import nra_topk

    A = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                "v": pa.array([10, 5], pa.int64())}))
    B = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                "v": pa.array([7], pa.int64())}))
    rows, _, _ = nra_topk(A, B, "k", "v", 10)
    assert rows == [(1, 17, 10, 7), (2, 5, 5, 0)]


def test_interval_union_brute_force(tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    rng = np.random.default_rng(73)
    rows_u, rows_t = [], []
    # gappy spans: several disjoint user clusters in time
    for u in range(30):
        base = int(rng.integers(0, 5)) * 1000 + int(rng.integers(0, 50))
        span = int(rng.integers(0, 30))
        rows_u += [u, u]
        rows_t += [base * 3_600_000_000,
                   (base + span) * 3_600_000_000 + 1]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "user_id": pa.array(rows_u, pa.int64()),
        "ts": pa.array(np.array(rows_t, np.int64), pa.timestamp("us")),
    }), d / "events.parquet", row_group_size=13)
    out = e._q_interval_union(str(d)).to_pydict()
    # brute force over the hour grid
    spans = {}
    for u, t in zip(rows_u, rows_t):
        h = t // 3_600_000_000
        s, e2 = spans.get(u, (h, h))
        spans[u] = (min(s, h), max(e2, h))
    hours = set()
    conc = {}
    for s, e2 in spans.values():
        for h in range(s, e2 + 1):
            hours.add(h)
            conc[h] = conc.get(h, 0) + 1
    assert out["union_hours"] == [len(hours)]
    assert out["peak_concurrency"] == [max(conc.values())]
