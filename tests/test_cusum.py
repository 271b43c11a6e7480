"""cusum_stats (windows.py) vs a pandas/numpy brute-force reference:
exact count-scaled CUSUM excursions and first-argmax position, planted
mean-shift localization, single-event users, block-layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.windows import cusum_stats


def _events(n=600, users=15, seed=31):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, users, n).astype(np.int64)
    t = rng.integers(0, 10_000_000, n).astype(np.int64)
    # same-user ts ties to exercise the (ts, event_id) tie-break
    u[:8] = 4
    t[:8] = 123_456
    v = np.round(rng.uniform(0, 500, n), 2)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "ts": pa.array(t, pa.timestamp("us")),
        "user_id": pa.array(u, pa.int64()),
        "value": pa.array(v, pa.float64()),
    })


def _ref(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas()
    df["t"] = df.ts.astype("int64")
    df["x"] = np.floor(df.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "t", "event_id"])
    out = []
    for uid, g in df.groupby("user_id"):
        x = g.x.to_numpy()
        n = len(x)
        p = np.cumsum(n * x - x.sum())
        out.append((uid, n, int(p.max()), int(p.min()),
                    int(np.argmax(p)) + 1))
    return pd.DataFrame(out, columns=[
        "user_id", "n", "cusum_max", "cusum_min", "argmax_pos"])


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("user_id").reset_index(drop=True)


def test_cusum_matches_reference():
    tbl = _events()
    got = cusum_stats(rd.from_arrow(tbl), num_buckets=4).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(_ref(tbl)))


def test_cusum_layout_invariance():
    tbl = _events(seed=77)
    one = cusum_stats(rd.from_arrow(tbl), num_buckets=3).to_pandas()
    many = cusum_stats(
        rd.from_arrow(tbl).repartition(9), num_buckets=16).to_pandas()
    pd.testing.assert_frame_equal(_sorted(one), _sorted(many))


def test_cusum_planted_shift():
    # 40 events at 100.00 then 40 at 200.00: the prefix of n*x - T
    # is minimized exactly at the changepoint (upward shift), and the
    # max excursion sits at the very first observation's side.
    n = 80
    v = np.r_[np.full(40, 100.0), np.full(40, 200.0)]
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "ts": pa.array(np.arange(n, dtype=np.int64), pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
        "value": pa.array(v, pa.float64()),
    })
    got = cusum_stats(rd.from_arrow(tbl), num_buckets=2).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    x = np.floor(v * 100 + 0.5).astype(np.int64)
    p = np.cumsum(n * x - x.sum())
    assert r.cusum_min == p.min() and int(np.argmin(p)) == 39
    assert r.cusum_max == p.max()
    assert r.argmax_pos == int(np.argmax(p)) + 1


def test_cusum_single_event_user():
    tbl = pa.table({
        "event_id": pa.array([7], pa.int64()),
        "ts": pa.array([5], pa.timestamp("us")),
        "user_id": pa.array([3], pa.int64()),
        "value": pa.array([42.5], pa.float64()),
    })
    got = cusum_stats(rd.from_arrow(tbl), num_buckets=2).to_pandas()
    r = got.iloc[0]
    # P_1 = 1*x - x = 0 always
    assert (r.n, r.cusum_max, r.cusum_min, r.argmax_pos) == (1, 0, 0, 1)
