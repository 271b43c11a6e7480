"""series_acf (windows.py) vs a float numpy reference: exact integer
(num, den) sufficient statistics over the zero-filled bucket-count
series, periodic-signal sign structure, constant-series NULL, layout
invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.windows import series_acf

US = 1_000_000  # bucket width used in tests: 1 second


def _ev(ts_us):
    ts_us = np.asarray(ts_us, np.int64)
    return rd.from_arrow(pa.table({
        "ts": pa.array(ts_us, pa.timestamp("us"))}))


def _ref(counts, max_lag):
    """Independent float reference over the zero-filled series."""
    c = np.asarray(counts, np.float64)
    m = c.mean()
    d = c - m
    den = float((d * d).sum())
    out = []
    for k in range(1, max_lag + 1):
        num = float((d[:-k] * d[k:]).sum()) if k < len(d) else 0.0
        out.append(num / den if den else None)
    return out


def _counts_from_ts(ts_us, width):
    b = np.asarray(ts_us, np.int64) // width
    lo, hi = b.min(), b.max()
    c = np.zeros(hi - lo + 1, np.int64)
    for x in b:
        c[x - lo] += 1
    return c


def test_acf_matches_reference_with_gaps():
    rng = np.random.default_rng(71)
    # bursty series over 40 seconds with empty buckets in the middle
    ts = np.concatenate([
        rng.integers(0, 10 * US, 200),
        rng.integers(25 * US, 40 * US, 300),
    ])
    t = series_acf(_ev(ts), "ts", bucket_us=US, max_lag=5)
    got = [x.as_py() for x in t.column("acf")]
    want = _ref(_counts_from_ts(ts, US), 5)
    assert len(got) == 5
    for g, w in zip(got, want):
        assert abs(g - w) < 2e-6
    # num/den really are the scaled-integer statistics: acf == num/den
    num = np.asarray(t.column("num"), np.int64)
    den = np.asarray(t.column("den"), np.int64)
    assert (den == den[0]).all() and den[0] > 0
    for g, nu in zip(got, num):
        assert abs(g - nu / den[0]) < 1e-6


def test_acf_periodic_alternation():
    # strict period-2 series: 5 events in even seconds, 0 in odd ones
    ts = np.concatenate(
        [np.arange(5) * 7 + s * US for s in range(0, 20, 2)])
    t = series_acf(_ev(ts), "ts", bucket_us=US, max_lag=2)
    acf = [x.as_py() for x in t.column("acf")]
    assert acf[0] < 0 < acf[1]  # anti-correlated at lag 1, back at 2


def test_acf_constant_series_is_null():
    ts = np.repeat(np.arange(10) * US, 3) + 11  # 3 events every second
    t = series_acf(_ev(ts), "ts", bucket_us=US, max_lag=3)
    assert [x.as_py() for x in t.column("acf")] == [None] * 3
    assert np.asarray(t.column("den"), np.int64).tolist() == [0, 0, 0]


def test_acf_layout_invariance_and_empty():
    rng = np.random.default_rng(72)
    ts = rng.integers(0, 30 * US, 400)
    t1 = series_acf(_ev(ts), "ts", bucket_us=US, max_lag=4)
    t2 = series_acf(_ev(ts).repartition(9), "ts", bucket_us=US, max_lag=4)
    assert t1.equals(t2)
    t0 = series_acf(_ev(np.array([], np.int64)), "ts", bucket_us=US)
    assert t0.num_rows == 0
