"""event_disorder (windows.py) vs a pandas window reference: late
counts and max backlog under an explicit arrival order with ties,
multiple keys, single-event users; bucket invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.windows import event_disorder


def _events(n=400, users=12, seed=47):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, users, n).astype(np.int64)
    t = rng.integers(0, 10_000_000, n).astype(np.int64)
    arr = t + rng.integers(0, 2_000_000, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    # inject same-user arrival ties to exercise the tie_col path
    k[:6] = 3
    arr[:6] = 5_000_000
    return pa.table({
        "user_id": pa.array(k, pa.int64()),
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(t, pa.timestamp("us")),
        "arr_us": pa.array(arr, pa.int64()),
    })


def _ref(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas()
    df["t"] = df.ts.astype("int64")
    df = df.sort_values(["user_id", "arr_us", "event_id"])
    out = []
    for u, g in df.groupby("user_id"):
        t = g.t.to_numpy()
        prev = np.r_[np.int64(0), np.maximum.accumulate(t)[:-1]]
        dis = np.maximum(prev - t, 0)
        dis[0] = 0
        out.append((u, len(t), int((dis > 0).sum()), int(dis.max())))
    return pd.DataFrame(out, columns=[
        "user_id", "n_events", "n_late", "max_disorder_us"])


def test_disorder_matches_reference():
    tbl = _events()
    got = event_disorder(rd.from_arrow(tbl), seq_col="arr_us",
                         tie_col="event_id", num_buckets=4).to_pandas()
    pd.testing.assert_frame_equal(got, _ref(tbl))


def test_disorder_bucket_invariance_and_single_events():
    tbl = _events(n=60, users=50, seed=48)  # many single-event users
    a = event_disorder(rd.from_arrow(tbl), seq_col="arr_us",
                       tie_col="event_id", num_buckets=2).to_pandas()
    b = event_disorder(rd.from_arrow(tbl).repartition(5),
                       seq_col="arr_us", tie_col="event_id",
                       num_buckets=16).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, _ref(tbl))
