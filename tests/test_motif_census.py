"""The closed-form size-4 motif identities (claws, 3-edge paths,
tailed triangles) vs exhaustive enumeration on random small graphs."""

import itertools

import numpy as np


def _formulas(n, edges):
    adj = {u: set() for u in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    deg = np.array([len(adj[u]) for u in range(n)], np.int64)
    tri_v = np.zeros(n, np.int64)
    tri = 0
    for a, b, c in itertools.combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri += 1
            tri_v[[a, b, c]] += 1
    claws = int((deg * (deg - 1) * (deg - 2) // 6).sum())
    dps = sum((deg[u] - 1) * (deg[v] - 1) for u, v in edges)
    paths3 = int(dps - 3 * tri)
    tailed = int((tri_v * (deg - 2)).sum())
    return claws, paths3, tailed


def _brute(n, edges):
    eset = {frozenset(e) for e in edges}

    def has(a, b):
        return frozenset((a, b)) in eset

    claws = paths3 = tailed = 0
    for quad in itertools.combinations(range(n), 4):
        for center in quad:
            rest = [x for x in quad if x != center]
            if all(has(center, r) for r in rest):
                claws += 1
        # paths on the 4 labelled vertices: enumerate orderings once
        # per unordered pair of endpoints (a path and its reverse are
        # the same subgraph)
        for perm in itertools.permutations(quad):
            if perm[0] > perm[3]:
                continue
            a, b, c, d = perm
            if has(a, b) and has(b, c) and has(c, d):
                paths3 += 1
        # tailed triangle: a triangle among 3 of them + one pendant
        # edge from a triangle vertex to the 4th
        for tri3 in itertools.combinations(quad, 3):
            (x, y, z) = tri3
            w = next(x2 for x2 in quad if x2 not in tri3)
            if has(x, y) and has(y, z) and has(x, z):
                tailed += sum(has(t, w) for t in tri3)
    return claws, paths3, tailed


def test_identities_on_random_graphs():
    rng = np.random.default_rng(13)
    for trial in range(4):
        n = 10
        edges = [(u, v) for u, v in itertools.combinations(range(n), 2)
                 if rng.random() < 0.35]
        assert _formulas(n, edges) == _brute(n, edges), edges


def test_hand_cases():
    # star K1,3: 1 claw, 0 paths3, 0 tailed
    assert _formulas(4, [(0, 1), (0, 2), (0, 3)]) == (1, 0, 0)
    # path 0-1-2-3: exactly one 3-edge path
    assert _formulas(4, [(0, 1), (1, 2), (2, 3)]) == (0, 1, 0)
    # triangle + pendant: one tailed triangle, paths3 = 0... compute:
    # deg = [3,2,2,1]; dps over edges: (0,1):(2)(1)=2 (0,2):2 (1,2):1
    # (0,3):0 → 5; tri=1 → paths3 = 2; brute agrees (two labelled
    # paths 3-0-1-2 / 3-0-2-1)
    assert _formulas(4, [(0, 1), (0, 2), (1, 2), (0, 3)]) == (1, 2, 1)
    # K4: 4 triangles, every vertex deg 3
    claws, paths3, tailed = _formulas(
        4, list(itertools.combinations(range(4), 2)))
    assert (claws, paths3, tailed) == _brute(
        4, list(itertools.combinations(range(4), 2)))
