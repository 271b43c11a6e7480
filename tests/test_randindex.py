"""Exact pair-counting ARI vs a brute-force O(n²) pair scan."""

import numpy as np

from essentials_rd.ops import pair_counting_ari


def _brute_ari(la, lb):
    n = len(la)
    a = b = c = d = 0  # same-same, same-diff, diff-same, diff-diff
    for i in range(n):
        for j in range(i + 1, n):
            sa = la[i] == la[j]
            sb = lb[i] == lb[j]
            if sa and sb:
                a += 1
            elif sa:
                b += 1
            elif sb:
                c += 1
            else:
                d += 1
    N = n * (n - 1) // 2
    s_both, s_a, s_b = a, a + b, a + c
    den = (s_a + s_b) * N - 2 * s_a * s_b
    ari = None if den == 0 else \
        float(2 * (s_both * N - s_a * s_b)) / float(den)
    return N, s_both, s_a, s_b, ari


def test_matches_bruteforce_random():
    rng = np.random.default_rng(6)
    for trial in range(4):
        la = rng.integers(0, 5, 60)
        lb = rng.integers(0, 4, 60)
        assert pair_counting_ari(la, lb) == _brute_ari(la.tolist(),
                                                       lb.tolist())


def test_perfect_agreement_is_one():
    la = np.array([0, 0, 1, 1, 2, 2, 2])
    lb = np.array([7, 7, 3, 3, 9, 9, 9])  # same partition, renamed
    *_, ari = pair_counting_ari(la, lb)
    assert ari == 1.0


def test_degenerate_single_class_is_none():
    la = np.zeros(10, np.int64)
    *_, ari = pair_counting_ari(la, la)
    assert ari is None


def test_split_vs_merged():
    # one side splits the other's single class in two -> 0 < ARI < 1
    la = np.array([0] * 6 + [1] * 6)
    lb = np.array([0] * 3 + [1] * 3 + [2] * 6)
    got = pair_counting_ari(la, lb)
    assert got == _brute_ari(la.tolist(), lb.tolist())
    assert 0.0 < got[4] < 1.0
