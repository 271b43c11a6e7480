"""The NumPy validators themselves are validated against networkx —
mirroring how the reference trusts its CPU checks (SURVEY.md §5.1)."""

import networkx as nx
import numpy as np
import pytest

from essentials_rd.reference_impl import (
    cc_ref,
    lp_sync_ref,
    pagerank_ref,
    spmv_ref,
    triangles_ref,
)


def _random_graph(n=40, p=0.15, seed=7):
    g = nx.gnp_random_graph(n, p, seed=seed)
    e = np.array(list(g.edges()), dtype=np.int64).reshape(-1, 2)
    return g, np.arange(n, dtype=np.int64), e[:, 0], e[:, 1]


def test_pagerank_matches_networkx_directed():
    rng = np.random.default_rng(3)
    src = rng.integers(0, 30, 120).astype(np.int64)
    dst = rng.integers(0, 30, 120).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedup directed pairs (nx.DiGraph collapses them)
    pairs = np.unique(src * 1000 + dst)
    src, dst = pairs // 1000, pairs % 1000
    vids = np.arange(30, dtype=np.int64)
    p = pagerank_ref(vids, src, dst, tol=1e-12, max_iters=500)
    # independent check: dense Google-matrix power iteration
    # (nx.pagerank needs scipy, which is not installed in this sandbox)
    n = 30
    a = np.zeros((n, n))
    a[dst, src] = 1.0
    outdeg = a.sum(axis=0)
    dangling = outdeg == 0
    col = np.where(dangling, 1.0 / n, 0.0)[None, :] + np.divide(
        a, np.maximum(outdeg, 1.0)[None, :]
    )
    g_mat = 0.85 * col + 0.15 / n
    expected = np.full(n, 1.0 / n)
    for _ in range(500):
        expected = g_mat @ expected
    assert np.allclose(p, expected, atol=1e-9)
    assert abs(p.sum() - 1.0) < 1e-9


def test_cc_matches_networkx():
    g, vids, s, d = _random_graph()
    labels = cc_ref(vids, s, d)
    for comp in nx.connected_components(g):
        comp = sorted(comp)
        assert len({labels[v] for v in comp}) == 1
        assert labels[comp[0]] == comp[0]  # label is min vid


def test_triangles_match_networkx():
    g, vids, s, d = _random_graph(n=30, p=0.25, seed=11)
    total, per_v = triangles_ref(vids, s, d)
    nxt = nx.triangles(g)
    assert per_v.tolist() == [nxt[i] for i in range(30)]
    assert total == sum(nxt.values()) // 3


def test_lp_sync_fixpoint_is_stable():
    g, vids, s, d = _random_graph(n=25, p=0.2, seed=5)
    l1 = lp_sync_ref(vids, s, d, max_iters=50)
    # applying more supersteps to a stabilized state changes nothing —
    # unless it 2-cycles, in which case max_iters bounds it; re-run same
    # bound must be identical (determinism)
    l2 = lp_sync_ref(vids, s, d, max_iters=50)
    assert np.array_equal(l1, l2)


def test_lp_two_cliques():
    # two 4-cliques joined by a single bridge edge: labels converge to
    # per-clique minimum
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((3, 4))
    e = np.array(edges, dtype=np.int64)
    labels = lp_sync_ref(np.arange(8, dtype=np.int64), e[:, 0], e[:, 1], max_iters=20)
    assert labels[:4].tolist() == [0, 0, 0, 0]
    assert labels[4:].tolist() == [4, 4, 4, 4]


def test_spmv_matches_dense():
    rng = np.random.default_rng(9)
    n = 20
    src = rng.integers(0, n, 60).astype(np.int64)
    dst = rng.integers(0, n, 60).astype(np.int64)
    w = rng.random(60)
    x = rng.random(n)
    vids = np.arange(n, dtype=np.int64)
    y = spmv_ref(vids, src, dst, w, x)
    a = np.zeros((n, n))
    np.add.at(a, (dst, src), w)
    assert np.allclose(y, a @ x, atol=1e-12)
