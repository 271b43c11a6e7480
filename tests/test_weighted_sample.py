"""weighted_priority_sample (sampling.py) vs a numpy brute force:
exact equality of the sampled set / priorities / estimator, layout
invariance, whole-population exactness, weight-proportional inclusion
and DLT estimator accuracy across seeds."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.sampling import weighted_priority_sample
from essentials_rd.util import hash64


def _tbl(n=500, seed=3):
    rng = np.random.default_rng(seed)
    w = rng.integers(100, 200_000, n).astype(np.int64)
    return pa.table({"key": pa.array(np.arange(n, dtype=np.int64)),
                     "w": pa.array(w, pa.int64())})


def _ref(tbl: pa.Table, k: int, seed: int) -> pd.DataFrame:
    kk = tbl.column("key").to_numpy()
    w = tbl.column("w").to_numpy()
    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))
    with np.errstate(over="ignore"):
        q = (hash64(kk + mix) // w.astype(np.uint64)).astype(np.int64)
    order = np.lexsort((kk, q))
    kk, w, q = kk[order], w[order], q[order]
    tau = int(q[k])
    t_est = (1 << 64) // tau
    return pd.DataFrame({
        "key": kk[:k], "w": w[:k], "q": q[:k],
        "rank": np.arange(1, k + 1, dtype=np.int64),
        "w_est": np.maximum(w[:k], np.int64(t_est)),
    })


def test_wps_matches_brute_force():
    tbl = _tbl()
    got = weighted_priority_sample(
        rd.from_arrow(tbl), "key", "w", k=20, seed=7).to_pandas()
    pd.testing.assert_frame_equal(got, _ref(tbl, 20, 7))


def test_wps_layout_invariance():
    tbl = _tbl(seed=9)
    one = weighted_priority_sample(
        rd.from_arrow(tbl), "key", "w", k=15, seed=4).to_pandas()
    many = weighted_priority_sample(
        rd.from_arrow(tbl).repartition(11), "key", "w",
        k=15, seed=4).to_pandas()
    pd.testing.assert_frame_equal(one, many)


def test_wps_whole_population_exact():
    tbl = _tbl(n=8)
    got = weighted_priority_sample(
        rd.from_arrow(tbl), "key", "w", k=20, seed=1).to_pandas()
    assert len(got) == 8
    assert (got.w_est == got.w).all()  # estimator exact when S = pop
    assert got.w_est.sum() == tbl.column("w").to_numpy().sum()


def test_wps_weight_proportional_and_estimator():
    # two weight classes 50x apart: heavy rows must dominate the
    # sample, and the DLT estimator must land near the true total
    n = 400
    w = np.where(np.arange(n) % 10 == 0, 500_000, 10_000).astype(np.int64)
    tbl = pa.table({"key": pa.array(np.arange(n, dtype=np.int64)),
                    "w": pa.array(w, pa.int64())})
    total = int(w.sum())
    heavy_hits, est = [], []
    for seed in range(30):
        got = weighted_priority_sample(
            rd.from_arrow(tbl), "key", "w", k=25, seed=seed).to_pandas()
        heavy_hits.append(int((got.w == 500_000).sum()))
        est.append(int(got.w_est.sum()))
    assert np.mean(heavy_hits) > 15  # 40 heavy rows hold ~83% of mass
    assert abs(np.mean(est) - total) / total < 0.15
