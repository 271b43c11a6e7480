"""Skip-gram pair counting (sampling.walk_skipgram_pairs): the
DeepWalk/node2vec training-data step must reproduce the brute-force
windowed pair multiset exactly — including dead (-1) node masking —
and be invariant to the input Dataset's block layout."""

from collections import Counter
from itertools import groupby

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.sampling import walk_skipgram_pairs


def _walks_table(seed=7, n_walks=40, length=5, n_nodes=50):
    rng = np.random.default_rng(seed)
    rows = []
    for wid in range(n_walks):
        nodes = rng.integers(0, n_nodes, length)
        k = rng.integers(0, length + 1)
        if k < length and rng.random() < 0.5:
            nodes[k:] = -1  # walk died at step k
        rows.extend((wid, s + 1, int(nodes[s])) for s in range(length))
    return rows, pa.table({
        "wid": pa.array([r[0] for r in rows], pa.int64()),
        "step": pa.array([r[1] for r in rows], pa.int64()),
        "node": pa.array([r[2] for r in rows], pa.int64()),
    })


def _brute(rows, window):
    ref = Counter()
    for _, grp in groupby(sorted(rows), key=lambda r: r[0]):
        g = sorted(grp, key=lambda r: r[1])
        for i in range(len(g)):
            for d in range(1, window + 1):
                if i + d < len(g) and g[i][2] >= 0 and g[i + d][2] >= 0:
                    ref[(g[i][2], g[i + d][2])] += 1
    return dict(ref)


def _as_dict(ds):
    out = ds.to_pandas()
    return {(int(a), int(b)): int(n)
            for a, b, n in zip(out["a"], out["b"], out["n"])}


def test_skipgram_matches_bruteforce_and_layout_invariant():
    rows, tbl = _walks_table()
    for window in (1, 2, 4):
        ref = _brute(rows, window)
        for nparts in (1, 3, 9):
            ds = rd.from_arrow(tbl).repartition(nparts)
            got = _as_dict(walk_skipgram_pairs(ds, window=window,
                                               num_buckets=8))
            assert got == ref, (window, nparts)


def test_skipgram_window_exceeds_walk_length():
    # window far beyond the walk length: every in-walk ordered pair
    rows, tbl = _walks_table(seed=11, n_walks=10, length=3)
    ref = _brute(rows, 99)
    got = _as_dict(walk_skipgram_pairs(rd.from_arrow(tbl), window=99,
                                       num_buckets=4))
    assert got == ref


def test_skipgram_all_dead_and_empty():
    dead = pa.table({
        "wid": pa.array([0, 0, 1, 1], pa.int64()),
        "step": pa.array([1, 2, 1, 2], pa.int64()),
        "node": pa.array([-1, -1, -1, -1], pa.int64()),
    })
    out_dead = walk_skipgram_pairs(rd.from_arrow(dead), num_buckets=2)
    assert out_dead.count() == 0
    assert out_dead.schema().names == ["a", "b", "n"]
    empty = dead.slice(0, 0)
    out = walk_skipgram_pairs(rd.from_arrow(empty), num_buckets=2)
    assert out.count() == 0
    assert out.schema().names == ["a", "b", "n"]


def test_skipgram_repeated_nodes_count_multiplicity():
    # a cycle walk revisiting the same pair counts it every occurrence
    tbl = pa.table({
        "wid": pa.array([5] * 4, pa.int64()),
        "step": pa.array([1, 2, 3, 4], pa.int64()),
        "node": pa.array([7, 8, 7, 8], pa.int64()),
    })
    got = _as_dict(walk_skipgram_pairs(rd.from_arrow(tbl), window=2,
                                       num_buckets=2))
    assert got == {(7, 8): 2, (8, 7): 1, (7, 7): 1, (8, 8): 1}
