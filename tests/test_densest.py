"""Densest-subgraph peel vs a numpy reference of the same algorithm,
the 2(1+eps) quality guarantee on a planted clique, and layout
invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.algorithms.densest import densest_peel


def _edges_ds(edges, parallelism=1):
    t = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                  "dst": pa.array([e[1] for e in edges], pa.int64())})
    d = rd.from_arrow(t)
    if parallelism > 1:
        d = d.repartition(parallelism)
    return d


def _np_peel(n, edges, rounds=16, num=2, den=1):
    alive = np.ones(n, bool)
    rows = []
    for r in range(rounds):
        deg = np.zeros(n, np.int64)
        for u, v in edges:
            if alive[u] and alive[v]:
                deg[u] += 1
                deg[v] += 1
        V = int(alive.sum())
        E2 = int(deg[alive].sum())
        rows.append((r, V, E2 // 2))
        alive = alive & (deg * den * V > num * E2)
    return rows


def _rows(t):
    d = t.to_pydict()
    return list(zip(d["round"], d["n_vertices"], d["n_edges"]))


def test_matches_numpy_reference():
    rng = np.random.default_rng(37)
    n = 40
    edges = [(u, v) for u in range(n) for v in range(u + 1, n)
             if rng.random() < 0.15]
    t, _ = densest_peel(_edges_ds(edges), np.arange(n), rounds=10)
    assert _rows(t) == _np_peel(n, edges, rounds=10)


def test_planted_clique_quality():
    # sparse background + planted K12: best round density must be
    # within 4x of the clique's density (12-1)/2 = 5.5
    rng = np.random.default_rng(41)
    n = 120
    edges = {(u, v) for u in range(n) for v in range(u + 1, n)
             if rng.random() < 0.02}
    for u in range(12):
        for v in range(u + 1, 12):
            edges.add((u, v))
    edges = sorted(edges)
    t, mask = densest_peel(_edges_ds(edges), np.arange(n), rounds=16)
    rows = _rows(t)
    best = max(e / v for _, v, e in rows if v > 0)
    opt_lb = (12 * 11 / 2) / 12  # clique density 5.5
    assert best >= opt_lb / 4
    # the returned best mask reproduces the best density
    alive = np.flatnonzero(mask)
    sub = [e for e in edges if e[0] in set(alive) and e[1] in set(alive)]
    assert len(sub) / len(alive) == best


def test_peel_empties_and_layout_invariance():
    rng = np.random.default_rng(43)
    n = 60
    edges = [(u, v) for u in range(n) for v in range(u + 1, n)
             if rng.random() < 0.1]
    a, _ = densest_peel(_edges_ds(edges, 1), np.arange(n), rounds=16)
    b, _ = densest_peel(_edges_ds(edges, 9), np.arange(n), rounds=16)
    assert _rows(a) == _rows(b)
    assert _rows(a)[-1][1] == 0  # emptied within log2(60)+1 << 16
