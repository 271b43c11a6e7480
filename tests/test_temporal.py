"""TemporalReachProgram (algorithms/temporal.py) vs a CPU fixpoint
reference: earliest-arrival semantics (waiting allowed, edge usable
iff its time >= arrival), unreachability, partition invariance, and
the it-differs-from-static-BFS property that justifies the class."""

import numpy as np
import pyarrow as pa
import pytest

from essentials_rd.algorithms.temporal import arrival_table, temporal_reach

from .conftest import small_graph


def _reach_ref(vids, src, dst, t, source):
    """Iterate arr(v) = min(arr(v), min t(e): e=(u,v), t >= arr(u))
    over the symmetrized edges to fixpoint."""
    pos = {int(v): i for i, v in enumerate(vids)}
    arr = np.full(len(vids), np.inf)
    arr[pos[source]] = 0.0
    es = np.r_[src, dst]
    ed = np.r_[dst, src]
    et = np.r_[t, t]
    while True:
        prev = arr.copy()
        for a, b, w in zip(es, ed, et):
            if arr[pos[int(a)]] <= w:
                arr[pos[int(b)]] = min(arr[pos[int(b)]], w)
        if np.array_equal(prev, arr, equal_nan=True):
            return arr


def _run(tmp_path, src, dst, t, source, P=3):
    g = small_graph(tmp_path, src, dst, weight=t.astype(np.float64), P=P,
                    symmetrize=True)
    res = temporal_reach(g, source, checkpoint_every=0)
    return arrival_table(res)


def test_temporal_matches_reference(tmp_path):
    rng = np.random.default_rng(17)
    n, m = 40, 100
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    t = rng.integers(0, 8, len(src)).astype(np.float64)
    out = _run(tmp_path / "a", src, dst, t, source=0)
    vids = np.asarray(out["vid"])
    ref = _reach_ref(vids, src, dst, t, 0)
    got = np.asarray(out["arr"])
    assert np.array_equal(np.where(np.isfinite(ref), ref, -1.0),
                          np.where(np.isfinite(got), got, -1.0))


def test_temporal_blocks_backward_time_paths(tmp_path):
    # path 0-1-2: edge (0,1) at t=5, edge (1,2) at t=3 < 5 — vertex 2
    # is unreachable through time even though statically connected;
    # (1,3) at t=7 stays reachable.
    src = np.array([0, 1, 1], np.int64)
    dst = np.array([1, 2, 3], np.int64)
    t = np.array([5.0, 3.0, 7.0])
    out = _run(tmp_path, src, dst, t, source=0, P=2)
    d = dict(zip([int(v) for v in out["vid"].to_pylist()],
                 out["arr"].to_pylist()))
    assert d[0] == 0.0 and d[1] == 5.0 and d[3] == 7.0
    assert not np.isfinite(d[2])


def test_temporal_partition_invariance(tmp_path):
    rng = np.random.default_rng(19)
    n, m = 30, 70
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    t = rng.integers(0, 6, len(src)).astype(np.float64)
    a = _run(tmp_path / "p1", src, dst, t, source=0, P=1)
    b = _run(tmp_path / "p5", src, dst, t, source=0, P=5)
    assert a.equals(b)


def test_temporal_requires_weights(tmp_path):
    src = np.array([0], np.int64)
    dst = np.array([1], np.int64)
    g = small_graph(tmp_path, src, dst, P=1, symmetrize=True)
    with pytest.raises(Exception, match="edge times|weight"):
        temporal_reach(g, 0, checkpoint_every=0)


def test_ngram_counts_matches_bruteforce_and_reduces_to_transitions():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.windows import ngram_counts, transition_counts

    rng = np.random.default_rng(61)
    m = 400
    users = rng.integers(0, 9, m)
    ts = pd.to_datetime(rng.integers(0, 10**6, m), unit="s")
    eid = np.arange(m)
    vals = np.array(list("abcd"))[rng.integers(0, 4, m)]
    t = pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(vals.tolist()),
    })
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = {}
    rows = list(df.itertuples())
    for a, b, c in zip(rows, rows[1:], rows[2:]):
        if a.user_id == b.user_id == c.user_id:
            k = (a.event_type, b.event_type, c.event_type)
            want[k] = want.get(k, 0) + 1
    got = ngram_counts(rd.from_arrow(t).repartition(5), "event_type",
                       n=3, num_buckets=8).to_pandas()
    got_d = {(r.v1, r.v2, r.v3): int(r.n_obs)
             for r in got.itertuples()}
    assert got_d == want
    # n=2 must agree with transition_counts
    g2 = ngram_counts(rd.from_arrow(t), "event_type", n=2,
                      num_buckets=8).to_pandas()
    tr = transition_counts(rd.from_arrow(t), "event_type",
                           num_buckets=8).to_pandas()
    a = {(r.v1, r.v2): int(r.n_obs) for r in g2.itertuples()}
    b = {(r.prev_val, r.next_val): int(r.n) for r in tr.itertuples()}
    assert a == b
