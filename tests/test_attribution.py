"""Last-touch attribution (windows.last_touch_attribution) vs a
pandas-window reference, with planted edge cases: conversion before
any source event (-1), equal-timestamp source/conversion (strictly
prior only — tie broken by event_id), interleaved users, and
bucket/layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.windows import last_touch_attribution


def _ds(df, blocks=1):
    t = pa.Table.from_pandas(df, preserve_index=False)
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _reference(df):
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        last_eid, last_ts = -1, -1
        for _, row in g.iterrows():
            if row.event_type == "purchase":
                gap = (int((row.ts - pd.Timestamp(0)).value // 1000)
                       - last_ts) if last_eid >= 0 else -1
                out.append((row.event_id, uid, last_eid, gap))
            if row.event_type == "click":
                last_eid = row.event_id
                last_ts = int((row.ts - pd.Timestamp(0)).value // 1000)
    return sorted(out)


def _mk(seed=0, n=400, users=12):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 10**9, n)), unit="us")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": ts,
        "event_type": rng.choice(
            ["click", "purchase", "view", "error"], n),
    })


def _got(df, blocks=1, buckets=8):
    t = last_touch_attribution(_ds(df, blocks),
                               num_buckets=buckets).to_pandas()
    return sorted(map(tuple, t[["event_id", "user_id",
                                "src_event_id", "gap_us"]].to_numpy()))


def test_attribution_matches_reference_and_layout():
    df = _mk()
    want = _reference(df)
    assert _got(df, 1, 4) == want
    assert _got(df, 9, 16) == want


def test_attribution_planted_edges():
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": np.array([0, 1, 2, 3, 4, 5], np.int64),
        "user_id": np.array([1, 1, 1, 1, 2, 2], np.int64),
        # u1: purchase BEFORE any click; click; purchase at the SAME
        #     ts as a later click (eid orders them: click eid=2 <
        #     purchase eid=3, so it IS prior)
        # u2: click then purchase
        "ts": [t0, t0 + pd.Timedelta(1, "s"),
               t0 + pd.Timedelta(2, "s"), t0 + pd.Timedelta(2, "s"),
               t0, t0 + pd.Timedelta(10, "s")],
        "event_type": ["purchase", "click", "click", "purchase",
                       "click", "purchase"],
    })
    got = dict((r[0], (r[2], r[3])) for r in _got(df))
    assert got[0] == (-1, -1)
    assert got[3] == (2, 0)          # same-ts click, smaller eid: prior
    assert got[5] == (4, 10_000_000)
