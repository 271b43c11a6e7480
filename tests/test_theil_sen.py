"""theil_sen_slope (mlfit.py) vs a Python brute force: exact
quantized-median agreement on the same coreset, robustness to planted
outliers (OLS wrecked, Theil-Sen not), block-layout invariance,
duplicate-key boundary ties, constant-x and tiny inputs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.mlfit import theil_sen_slope
from essentials_rd.util import np_col

SCALE = 1_000_000


def _ds(x, y, parts=1):
    t = pa.table({
        "x": pa.array(np.asarray(x, np.int64), pa.int64()),
        "y": pa.array(np.asarray(y, np.int64), pa.int64()),
        "rk": pa.array(np.arange(len(x), dtype=np.int64), pa.int64()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _run(x, y, m=64, parts=1, seed=11):
    t = theil_sen_slope(_ds(x, y, parts), "x", "y",
                        lambda b: np_col(b, "rk"), m=m, seed=seed)
    r = t.to_pylist()[0]
    return r["m_rows"], r["n_pairs"], r["slope_q"]


def _brute_all_pairs(x, y):
    # reference over the FULL data (use m >= n so the coreset is all)
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    sl = []
    for i in range(len(x)):
        for j in range(i + 1, len(x)):
            if x[i] != x[j]:
                lo, hi = (i, j) if x[i] < x[j] else (j, i)
                sl.append(((y[hi] - y[lo]) * SCALE) // (x[hi] - x[lo]))
    sl.sort()
    return len(sl), (int(sl[(len(sl) - 1) // 2]) if sl else 0)


def test_matches_bruteforce_full_coreset():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 40, 50)
    y = 3 * x + rng.integers(-5, 6, 50)
    n_ref, med_ref = _brute_all_pairs(x, y)
    m_rows, n_pairs, slope = _run(x, y, m=50)
    assert (m_rows, n_pairs, slope) == (50, n_ref, med_ref)


def test_robust_to_outliers_where_ols_is_not():
    # exact line y = 7x plus 10 wild outliers: Theil-Sen recovers 7.0
    rng = np.random.default_rng(4)
    x = np.arange(100, dtype=np.int64)
    y = 7 * x
    y[:10] += rng.integers(10_000, 100_000, 10)
    _, _, slope = _run(x, y, m=100)
    assert slope == 7 * SCALE
    ols = np.polyfit(x.astype(float), y.astype(float), 1)[0]
    assert abs(ols - 7.0) > 1.0


def test_layout_invariant_with_duplicate_keys():
    # duplicate rk values (non-unique row key) must not flake the
    # boundary: payload joins the tie-break
    rng = np.random.default_rng(8)
    x = rng.integers(0, 20, 300)
    y = rng.integers(0, 1000, 300)
    t = pa.table({
        "x": pa.array(np.asarray(x, np.int64)),
        "y": pa.array(np.asarray(y, np.int64)),
        "rk": pa.array(np.arange(300, dtype=np.int64) % 37),  # dups
    })
    runs = set()
    for parts in (1, 7, 13):
        ds = rd.from_arrow(t)
        if parts > 1:
            ds = ds.repartition(parts)
        r = theil_sen_slope(ds, "x", "y", lambda b: np_col(b, "rk"),
                            m=40, seed=11).to_pylist()[0]
        runs.add((r["m_rows"], r["n_pairs"], r["slope_q"]))
    assert len(runs) == 1


def test_constant_x_yields_zero_pairs():
    m_rows, n_pairs, slope = _run([5] * 30, list(range(30)), m=30)
    assert (m_rows, n_pairs, slope) == (30, 0, 0)


def test_negative_slope_floor_quantization():
    # y = -3x: every slope exactly -3*SCALE (floor of an integer)
    x = np.arange(20, dtype=np.int64)
    _, n_pairs, slope = _run(x, -3 * x, m=20)
    assert n_pairs == 190 and slope == -3 * SCALE
    # y = -x/2 on odd dx floors DOWN (Python/numpy semantics)
    x2 = np.array([0, 1], np.int64)
    y2 = np.array([0, -1], np.int64)
    _, _, s2 = _run(x2, -y2 * 0 + y2, m=2)
    assert s2 == -SCALE  # floor(-1e6/1) exact here
