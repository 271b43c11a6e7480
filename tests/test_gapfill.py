"""hourly_gapfill (__ray_entry__): brute-force interpolation audit
including negative-slope gaps (floor semantics), no-gap passthrough,
single-gap hand case."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOUR_US = 3_600_000_000


def _write(tmp, hour_cents):
    ts, vals = [], []
    for h, c in hour_cents.items():
        ts.append(h * HOUR_US + 7)
        vals.append(c / 100.0)
    pq.write_table(pa.table({
        "ts": pa.array(np.asarray(ts, np.int64), pa.timestamp("us")),
        "value": pa.array(vals, pa.float64()),
    }), f"{tmp}/events.parquet")
    return str(tmp)


def _brute(hour_cents):
    lo, hi = min(hour_cents), max(hour_cents)
    total = 0
    for h in range(lo, hi + 1):
        if h in hour_cents:
            total += hour_cents[h]
        else:
            p = max(x for x in hour_cents if x < h)
            n = min(x for x in hour_cents if x > h)
            pv, nv = hour_cents[p], hour_cents[n]
            total += pv + (nv - pv) * (h - p) // (n - p)
    n_obs = len(hour_cents)
    return (hi - lo + 1, n_obs, hi - lo + 1 - n_obs,
            sum(hour_cents.values()), total)


def _run(sf):
    from __ray_entry__ import _q_hourly_gapfill
    r = _q_hourly_gapfill(sf).to_pylist()[0]
    return (r["n_hours"], r["n_observed"], r["n_filled"],
            r["sum_observed"], r["sum_filled_total"])


def test_negative_slope_floor(tmp_path):
    # 100 -> gap of 3 -> 7: descending interpolation exercises floor
    hour_cents = {1000: 100, 1004: 7, 1006: 50}
    assert _run(_write(tmp_path, hour_cents)) == _brute(hour_cents)


def test_random_gaps(tmp_path):
    rng = np.random.default_rng(8)
    hour_cents = {int(h): int(rng.integers(1, 10**6))
                  for h in rng.choice(range(2000, 2100), 40,
                                      replace=False)}
    assert _run(_write(tmp_path, hour_cents)) == _brute(hour_cents)


def test_no_gaps_passthrough(tmp_path):
    hour_cents = {h: h * 10 for h in range(500, 520)}
    got = _run(_write(tmp_path, hour_cents))
    assert got == _brute(hour_cents)
    assert got[2] == 0 and got[3] == got[4]
