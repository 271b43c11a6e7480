"""cohort_ltv (__ray_entry__) on a multi-month synthetic corpus: the
sf data spans one month (1 cell), so the matrix logic — cohorting by
first event, age gaps filled with zero-purchase rows, cumulative sums
— is exercised here against a brute force."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MONTH_US = 30 * 86_400_000_000  # not calendar! use explicit dates


def _ts(year, month, day=3):
    return np.datetime64(f"{year:04d}-{month:02d}-{day:02d}", "us") \
        .astype(np.int64)


def _write(tmp, rows):
    # rows: (user, type, year, month, cents)
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array(np.array([_ts(r[2], r[3]) for r in rows],
                                np.int64), pa.timestamp("us")),
        "value": pa.array([r[4] / 100.0 for r in rows], pa.float64()),
    }), f"{tmp}/events.parquet")
    return str(tmp)


def _brute(rows):
    midx = lambda y, m: (y - 1970) * 12 + m - 1  # noqa: E731
    first = {}
    for u, t, y, m, c in rows:
        first[u] = min(first.get(u, 10**9), midx(y, m))
    cells = {}
    for u, t, y, m, c in rows:
        if t != "purchase":
            continue
        key = (first[u], midx(y, m) - first[u])
        n, s = cells.get(key, (0, 0))
        cells[key] = (n + 1, s + c)
    out = []
    for cm in sorted({c for c, _ in cells}):
        ma = max(a for c, a in cells if c == cm)
        cum = 0
        for a in range(ma + 1):
            n, s = cells.get((cm, a), (0, 0))
            cum += s
            out.append((cm, a, n, cum))
    return out


def _run(sf):
    from __ray_entry__ import _q_cohort_ltv
    t = _q_cohort_ltv(sf)
    return list(zip(*[t.column(c).to_pylist() for c in
                      ("cohort_m", "age", "n_purch", "cum_cents")]))


def test_multi_month_matrix(tmp_path):
    rows = [
        # user 1: cohort 2024-01, purchases at ages 0 and 2 (age 1 gap)
        (1, "signup", 2024, 1, 0),
        (1, "purchase", 2024, 1, 500),
        (1, "purchase", 2024, 3, 700),
        # user 2: cohort 2024-02 via a view, purchase at age 1
        (2, "view", 2024, 2, 0),
        (2, "purchase", 2024, 3, 900),
        # user 3: cohort 2024-01, never purchases
        (3, "click", 2024, 1, 0),
    ]
    got = _run(_write(tmp_path, rows))
    assert got == _brute(rows)
    # gap row exists with zero purchases but carried cumulative
    jan = (2024 - 1970) * 12 + 0
    assert (jan, 1, 0, 500) in got
    assert (jan, 2, 1, 1200) in got


def test_random_bruteforce(tmp_path):
    rng = np.random.default_rng(5)
    rows = []
    for u in range(30):
        for _ in range(int(rng.integers(1, 6))):
            rows.append((u,
                         ["view", "purchase"][int(rng.integers(0, 2))],
                         2024, int(rng.integers(1, 9)),
                         int(rng.integers(100, 5000))))
    assert _run(_write(tmp_path, rows)) == _brute(rows)
