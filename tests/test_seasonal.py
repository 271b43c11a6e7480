"""seasonal_naive_eval (__ray_entry__) on synthetic events: brute
force over the dense hour grid (absent hours = 0), perfect seasonal
pattern gives zero seasonal error but nonzero lag-1 error, sparse
hours handled."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def _write(tmp, hour_counts):
    ts = []
    for h, c in hour_counts.items():
        base = h * HOUR_US
        ts.extend(base + np.arange(c) * 1000)
    ts = np.asarray(sorted(ts), np.int64)
    pq.write_table(pa.table({
        "ts": pa.array(ts, pa.timestamp("us"))}), f"{tmp}/events.parquet")
    return str(tmp)


def _brute(hour_counts):
    lo, hi = min(hour_counts), max(hour_counts)
    grid = [hour_counts.get(h, 0) for h in range(lo, hi + 1)]
    out = {h: [0, 0, 0] for h in range(24)}
    for t in range(24, len(grid)):
        hod = (lo + t) % 24
        out[hod][0] += 1
        out[hod][1] += abs(grid[t] - grid[t - 24])
        out[hod][2] += abs(grid[t] - grid[t - 1])
    return {h: tuple(v) for h, v in out.items()}


def _run(sf):
    from __ray_entry__ import _q_seasonal_naive
    t = _q_seasonal_naive(sf)
    return {r["hod"]: (r["n_pairs"], r["sae_seasonal"], r["sae_lag1"])
            for r in t.to_pylist()}


def test_matches_bruteforce_with_gaps(tmp_path):
    rng = np.random.default_rng(7)
    hour_counts = {}
    for h in range(1000, 1100):
        if rng.random() < 0.7:  # 30% missing hours
            hour_counts[h] = int(rng.integers(1, 20))
    got = _run(_write(tmp_path, hour_counts))
    assert got == _brute(hour_counts)


def test_perfect_season_zero_error(tmp_path):
    # counts depend only on hour-of-day: seasonal error 0 everywhere,
    # lag-1 error nonzero (the pattern varies within a day)
    pattern = [5, 1, 3, 7] * 6  # 24 hourly values
    hour_counts = {h: pattern[h % 24] for h in range(2400, 2400 + 72)}
    got = _run(_write(tmp_path, hour_counts))
    assert all(v[1] == 0 for v in got.values())
    assert sum(v[2] for v in got.values()) > 0
    assert all(v[0] == 2 for v in got.values())  # 3 days -> 2 pairs/hod
