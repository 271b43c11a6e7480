"""merge_upsert (ops.py) vs a pandas reference: last-writer-wins
upserts, deletes, multi-change keys, pass-through rows, ambiguous-log
detection, bucket invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.ops import merge_upsert


def _snap():
    return pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
        "s": pa.array(list("abcde"), pa.string()),
    })


def _changes(rows):
    k, v, s, seq, op = zip(*rows)
    return pa.table({
        "k": pa.array(list(k), pa.int64()),
        "v": pa.array(list(v), pa.int64()),
        "s": pa.array(list(s), pa.string()),
        "seq": pa.array(list(seq), pa.int64()),
        "op": pa.array(list(op), pa.string()),
    })


def _ref(snap: pa.Table, ch: pa.Table) -> pd.DataFrame:
    sdf, cdf = snap.to_pandas(), ch.to_pandas()
    win = (cdf.sort_values(["k", "seq"]).groupby("k", as_index=False)
           .last())
    out = sdf[~sdf.k.isin(win.k)]
    ups = win[win.op == "U"][["k", "v", "s"]]
    return (pd.concat([out, ups]).sort_values("k")
            .reset_index(drop=True))


def _got(ds) -> pd.DataFrame:
    return (ds.to_pandas().sort_values("k").reset_index(drop=True)
            [["k", "v", "s"]])


def test_merge_upsert_matches_reference():
    ch = _changes([
        (2, 21, "B", 0, "U"),    # update
        (2, 22, "BB", 3, "U"),   # later update wins
        (3, 0, "", 1, "D"),      # delete
        (6, 60, "f", 0, "U"),    # insert new key
        (4, 41, "D1", 2, "U"),   # update then delete (delete wins)
        (4, 0, "", 5, "D"),
        (7, 70, "g", 1, "D"),    # delete of absent key = no-op
    ])
    out = merge_upsert(rd.from_arrow(_snap()), rd.from_arrow(ch), "k",
                       num_buckets=4)
    assert _got(out).equals(_ref(_snap(), ch))


def test_merge_upsert_duplicate_seq_raises():
    ch = _changes([(2, 21, "x", 1, "U"), (2, 22, "y", 1, "D")])
    with pytest.raises(Exception, match="ambiguous|duplicate"):
        merge_upsert(rd.from_arrow(_snap()), rd.from_arrow(ch), "k",
                     num_buckets=2).materialize()


def test_merge_upsert_bucket_invariance():
    rng = np.random.default_rng(3)
    n = 200
    snap = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "v": pa.array(rng.integers(0, 100, n).astype(np.int64), pa.int64()),
        "s": pa.array([f"r{i}" for i in range(n)], pa.string()),
    })
    rows = [(int(k), int(k) * 2, f"c{k}{j}", j,
             "D" if (k + j) % 5 == 0 else "U")
            for k in rng.choice(n + 20, 60, replace=False) for j in range(2)]
    ch = _changes(rows)
    a = merge_upsert(rd.from_arrow(snap), rd.from_arrow(ch), "k",
                     num_buckets=2)
    b = merge_upsert(rd.from_arrow(snap).repartition(7),
                     rd.from_arrow(ch).repartition(3), "k",
                     num_buckets=32)
    pd.testing.assert_frame_equal(_got(a), _got(b))
    pd.testing.assert_frame_equal(_got(a), _ref(snap, ch)[["k", "v", "s"]])
