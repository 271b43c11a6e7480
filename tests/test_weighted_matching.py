"""weighted_matching (algorithms/matching.py) vs the sequential
greedy scan under the same (w desc, hash, src, dst) total order:
exact matching equality, matched-weight dominance over the hash
matching, all-equal-weights case, layout invariance, empty graph."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.algorithms.matching import _pri, weighted_matching


def _ds(edges, parts=1):
    t = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "weight": pa.array([e[2] for e in edges], pa.int64()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _greedy(edges):
    z = _pri(np.asarray([e[0] for e in edges], np.int64),
             np.asarray([e[1] for e in edges], np.int64))
    order = sorted(range(len(edges)),
                   key=lambda i: (-edges[i][2], int(z[i]),
                                  edges[i][0], edges[i][1]))
    used, out = set(), []
    for i in order:
        s, d, w = edges[i]
        if s not in used and d not in used:
            used.add(s)
            used.add(d)
            out.append((s, d, w))
    return sorted(out)


def _run(edges, parts=1):
    t, rounds, conv = weighted_matching(_ds(edges, parts))
    assert conv
    return sorted(zip(t.column("src").to_pylist(),
                      t.column("dst").to_pylist(),
                      t.column("w").to_pylist()))


def _rand_graph(seed, n=60, m=250, wmax=9):
    rng = np.random.default_rng(seed)
    seen = set()
    edges = []
    while len(edges) < m:
        a, b = rng.integers(0, n, 2)
        if a == b:
            continue
        s, d = (int(a), int(b)) if a < b else (int(b), int(a))
        if (s, d) in seen:
            continue
        seen.add((s, d))
        edges.append((s, d, int(rng.integers(1, wmax + 1))))
    return edges


def test_equals_sequential_greedy():
    for seed in (1, 2, 3):
        edges = _rand_graph(seed)
        assert _run(edges) == _greedy(edges)


def test_prefers_heavy_edges():
    # triangle a-b(10), b-c(1), a-c(1): greedy takes only the heavy edge
    edges = [(1, 2, 10), (2, 3, 1), (1, 3, 1)]
    assert _run(edges) == [(1, 2, 10)]
    # path a-b(5), b-c(9), c-d(5): takes middle, ends unmatched
    edges = [(1, 2, 5), (2, 3, 9), (3, 4, 5)]
    assert _run(edges) == [(2, 3, 9)]


def test_all_ties_still_greedy_and_fast():
    edges = _rand_graph(9, wmax=1)  # every weight 1
    t, rounds, conv = weighted_matching(_ds(edges))
    assert conv and rounds <= 12  # hash tie-break keeps rounds low
    assert _run(edges) == _greedy(edges)


def test_layout_invariant():
    edges = _rand_graph(5)
    assert _run(edges, parts=1) == _run(edges, parts=11)


def test_empty():
    t, rounds, conv = weighted_matching(_ds([]))
    assert conv and t.num_rows == 0
