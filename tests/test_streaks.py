"""user_streaks (__ray_entry__): islands brute force, single-day and
full-span streaks, duplicate events within a day, row-order
invariance."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def _write(tmp, user_days, seed=None):
    rows = [(u, d) for u, days in user_days.items() for d in days]
    if seed is not None:
        rng = np.random.default_rng(seed)
        rows = [rows[i] for i in rng.permutation(len(rows))]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * DAY_US + 123 for r in rows],
                       pa.timestamp("us")),
    }), f"{tmp}/events.parquet")
    return str(tmp)


def _brute(user_days):
    out = {}
    for u, days in user_days.items():
        ds = sorted(set(days))
        best = cur = 1
        for a, b in zip(ds, ds[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        out[u] = (len(ds), best)
    return out


def _run(sf):
    from __ray_entry__ import _q_user_streaks
    return {r["user_id"]: (r["n_days"], r["max_streak"])
            for r in _q_user_streaks(sf).to_pylist()}


def test_islands_bruteforce(tmp_path):
    rng = np.random.default_rng(4)
    user_days = {u: rng.integers(19000, 19060, 25).tolist()
                 for u in range(20)}
    assert _run(_write(tmp_path, user_days)) == _brute(user_days)


def test_edges_and_row_order(tmp_path):
    user_days = {
        1: [100],                      # single day
        2: [5, 6, 7, 8, 9],            # full-span streak
        3: [10, 10, 10, 12, 13],       # dup events, broken run
    }
    a = tmp_path / "a"; a.mkdir()
    b = tmp_path / "b"; b.mkdir()
    g1 = _run(_write(a, user_days))
    g2 = _run(_write(b, user_days, seed=7))
    assert g1 == g2 == _brute(user_days)
    assert g1[1] == (1, 1) and g1[2] == (5, 5) and g1[3] == (3, 2)
