"""seq_pattern_counts (windows.py) vs a pure-Python re.findall brute
force over per-user ordered strings: greedy-star motif counts,
non-overlap semantics, unmapped-type break, tie order via event_id,
block-layout invariance, empty input."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.windows import seq_pattern_counts

TM = {"view": "v", "click": "c", "purchase": "p"}


def _events(n=600, n_users=12, seed=3):
    rng = np.random.default_rng(seed)
    types = rng.choice(["view", "click", "purchase", "other"], n)
    # collide timestamps so the event_id tie-break matters
    ts = rng.integers(0, 50, n) * 1_000_000
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
        "event_type": pa.array(types.astype(object), pa.string()),
    })


def _ref(tbl: pa.Table, pattern: str) -> pd.DataFrame:
    df = tbl.to_pandas()
    df["us"] = df.ts.astype("int64")
    df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
    df["ch"] = df.event_type.map(lambda s: TM.get(s, "x"))
    rows = []
    for uid, g in df.groupby("user_id"):
        s = "".join(g.ch)
        rows.append((uid, len(g), len(re.findall(pattern, s))))
    return pd.DataFrame(
        rows, columns=["user_id", "n_events", "n_matches"]
    ).sort_values("user_id").reset_index(drop=True)


def _run(tbl, pattern, parts=1):
    ds = rd.from_arrow(tbl)
    if parts > 1:
        ds = ds.repartition(parts)
    got = seq_pattern_counts(ds, pattern, TM).to_pandas()
    return got.sort_values("user_id").reset_index(drop=True)


def test_seq_pattern_matches_bruteforce():
    tbl = _events()
    got = _run(tbl, "vc*p")
    pd.testing.assert_frame_equal(got, _ref(tbl, "vc*p"))
    assert got.n_matches.sum() > 0  # motif actually occurs


def test_seq_pattern_nonoverlap_and_greedy():
    # one user, stream v c c p v p p: matches = [vccp, vp]; the third
    # p has no unconsumed v -> exactly 2 non-overlapping matches
    seq = ["view", "click", "click", "purchase", "view", "purchase",
           "purchase"]
    tbl = pa.table({
        "event_id": pa.array(np.arange(7, dtype=np.int64)),
        "ts": pa.array(np.arange(7, dtype="int64").astype("datetime64[us]")),
        "user_id": pa.array(np.zeros(7, np.int64)),
        "event_type": pa.array(seq, pa.string()),
    })
    got = _run(tbl, "vc*p")
    assert int(got.n_matches.iloc[0]) == 2


def test_seq_pattern_unmapped_breaks_match():
    # v OTHER p: the unmapped event encodes as 'x' and breaks vc*p
    seq = ["view", "other", "purchase"]
    tbl = pa.table({
        "event_id": pa.array(np.arange(3, dtype=np.int64)),
        "ts": pa.array(np.arange(3, dtype="int64").astype("datetime64[us]")),
        "user_id": pa.array(np.zeros(3, np.int64)),
        "event_type": pa.array(seq, pa.string()),
    })
    got = _run(tbl, "vc*p")
    assert int(got.n_matches.iloc[0]) == 0


def test_seq_pattern_layout_invariance():
    tbl = _events(seed=11)
    one = _run(tbl, "vc*p", parts=1)
    many = _run(tbl, "vc*p", parts=9)
    pd.testing.assert_frame_equal(one, many)


def test_seq_pattern_empty():
    tbl = _events(n=0)
    out = seq_pattern_counts(rd.from_arrow(tbl), "vc*p", TM)
    assert out.count() == 0
    assert out.schema().names == ["user_id", "n_events", "n_matches"]
