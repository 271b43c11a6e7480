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
