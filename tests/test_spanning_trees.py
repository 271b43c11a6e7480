"""Matrix-tree pieces: int_det-based Laplacian-minor tree count vs
Cayley's formula and a brute-force spanning-tree enumeration."""

from itertools import combinations

import numpy as np

from essentials_rd.mlfit import int_det


def _tree_count(w: list[list[int]]) -> int:
    n = len(w)
    lap = [[sum(w[i]) if i == j else -w[i][j] for j in range(1, n)]
           for i in range(1, n)]
    return int_det(lap)


def _brute_force(w: list[list[int]]) -> int:
    # sum over vertex-set spanning trees of the product of edge weights
    n = len(w)
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)
             if w[i][j] > 0]
    total = 0
    for sub in combinations(edges, n - 1):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ok = True
        prod = 1
        for a, b in sub:
            ra, rb = find(a), find(b)
            if ra == rb:
                ok = False
                break
            parent[ra] = rb
            prod *= w[a][b]
        if ok:
            total += prod
    return total


def test_cayley_k5():
    w = [[0 if i == j else 1 for j in range(5)] for i in range(5)]
    assert _tree_count(w) == 5 ** 3  # Cayley: n^(n-2)


def test_weighted_matches_bruteforce():
    rng = np.random.default_rng(8)
    for trial in range(5):
        m = rng.integers(0, 50, (5, 5))
        w = [[0 if i == j else int(m[min(i, j)][max(i, j)])
              for j in range(5)] for i in range(5)]
        assert _tree_count(w) == _brute_force(w)


def test_disconnected_graph_has_zero_trees():
    # two components {0,1} and {2,3,4}
    w = [[0] * 5 for _ in range(5)]
    w[0][1] = w[1][0] = 3
    w[2][3] = w[3][2] = 2
    w[3][4] = w[4][3] = 4
    w[2][4] = w[4][2] = 1
    assert _tree_count(w) == 0
