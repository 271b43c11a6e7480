"""All-minors matrix-tree effective resistance: the exact-integer
2-forest/tree-count ratio vs classic electrical hand values and a
float Laplacian-pseudoinverse reference on random weighted graphs."""

import numpy as np

from essentials_rd.mlfit import int_det


def _r_eff(w, u, v):
    n = len(w)
    lap = [[sum(w[i]) if i == j else -w[i][j] for j in range(n)]
           for i in range(n)]

    def minor(drop):
        keep = [i for i in range(n) if i not in drop]
        return [[lap[a][b] for b in keep] for a in keep]

    T = int_det(minor({0}))
    F = int_det(minor({u, v}))
    return F, T, F / T


def _pinv_r_eff(w, u, v):
    n = len(w)
    W = np.array(w, float)
    L = np.diag(W.sum(1)) - W
    Lp = np.linalg.pinv(L)
    return Lp[u, u] + Lp[v, v] - 2 * Lp[u, v]


def test_series_path():
    # path 0-1-2, unit conductances: R(0,2) = 2 ohms in series
    w = [[0, 1, 0], [1, 0, 1], [0, 1, 0]]
    F, T, r = _r_eff(w, 0, 2)
    assert (T, r) == (1, 2.0)


def test_triangle():
    # unit triangle: R between any pair = 2/3
    w = [[0, 1, 1], [1, 0, 1], [1, 1, 0]]
    F, T, r = _r_eff(w, 0, 1)
    assert T == 3 and abs(r - 2 / 3) < 1e-15


def test_parallel_conductance():
    # two vertices, conductance 5 between them: R = 1/5
    w = [[0, 5], [5, 0]]
    F, T, r = _r_eff(w, 0, 1)
    assert (F, T, r) == (1, 5, 0.2)


def test_matches_pseudoinverse_on_random_weighted():
    rng = np.random.default_rng(17)
    for trial in range(4):
        n = 5
        w = [[0] * n for _ in range(n)]
        for i in range(n):
            for j in range(i + 1, n):
                c = int(rng.integers(1, 9))
                w[i][j] = w[j][i] = c
        for (u, v) in [(0, 1), (1, 3), (2, 4)]:
            _, _, r = _r_eff(w, u, v)
            assert abs(r - _pinv_r_eff(w, u, v)) < 1e-9


def test_resistance_is_a_metric_sample():
    # triangle inequality spot-check on one random graph
    rng = np.random.default_rng(23)
    n = 5
    w = [[0] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            c = int(rng.integers(1, 6))
            w[i][j] = w[j][i] = c
    r01 = _r_eff(w, 0, 1)[2]
    r12 = _r_eff(w, 1, 2)[2]
    r02 = _r_eff(w, 0, 2)[2]
    assert r02 <= r01 + r12 + 1e-12
