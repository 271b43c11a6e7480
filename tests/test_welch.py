"""welch_ttest_values (__ray_entry__) vs scipy-free brute force on a
synthetic events table: t statistic and Welch–Satterthwaite df match
the textbook formulas, sign convention, identical-distribution
near-zero t, layout invariance via the oracle's own parquet."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp, vals_a, vals_b):
    n = len(vals_a) + len(vals_b)
    et = ["purchase"] * len(vals_a) + ["view"] * len(vals_b)
    pq.write_table(pa.table({
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(list(vals_a) + list(vals_b), pa.float64()),
    }), f"{tmp}/events.parquet")
    return str(tmp)


def _brute(vals_a, vals_b):
    ca = np.floor(np.asarray(vals_a) * 100 + 0.5).astype(np.int64)
    cb = np.floor(np.asarray(vals_b) * 100 + 0.5).astype(np.int64)
    m1, m2 = ca.mean(), cb.mean()
    v1 = ca.var(ddof=1)
    v2 = cb.var(ddof=1)
    a, b = v1 / len(ca), v2 / len(cb)
    t = (m1 - m2) / math.sqrt(a + b)
    df = (a + b) ** 2 / (a * a / (len(ca) - 1) + b * b / (len(cb) - 1))
    return t, df


def _run(sf_dir):
    from __ray_entry__ import _q_welch_ttest
    return _q_welch_ttest(sf_dir).to_pylist()[0]


def test_matches_textbook_formula(tmp_path):
    rng = np.random.default_rng(5)
    a = rng.normal(100, 10, 300).clip(1).round(2)
    b = rng.normal(80, 25, 500).clip(1).round(2)
    r = _run(_write_events(tmp_path, a, b))
    t_ref, df_ref = _brute(a, b)
    assert r["n_a"] == 300 and r["n_b"] == 500
    assert abs(r["t_stat"] - t_ref) < 1e-5
    assert abs(r["df"] - df_ref) < 1e-4
    assert r["t_stat"] > 0  # purchase mean larger


def test_identical_groups_near_zero_t(tmp_path):
    rng = np.random.default_rng(9)
    v = rng.normal(50, 5, 400).clip(1).round(2)
    r = _run(_write_events(tmp_path, v, v))
    assert abs(r["t_stat"]) < 1e-9
    assert abs(r["mean_diff"]) < 1e-9


def test_welch_df_below_pooled(tmp_path):
    # wildly unequal variances: Welch df far below n1+n2-2
    rng = np.random.default_rng(2)
    a = rng.normal(100, 1, 200).clip(1).round(2)
    b = rng.normal(100, 60, 200).clip(1).round(2)
    r = _run(_write_events(tmp_path, a, b))
    assert r["df"] < 250  # pooled would be 398
