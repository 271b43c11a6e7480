"""Eulerian circuit/trail feasibility fold vs hand cases and a
brute-force per-component parity reference."""

import numpy as np

from essentials_rd.ops import euler_parity_fold


def _brute(labels, deg):
    out = {}
    for lab, d in zip(labels, deg):
        n, odd = out.get(lab, (0, 0))
        out[lab] = (n + 1, odd + (d % 2))
    rows = []
    for lab in sorted(out):
        n, odd = out[lab]
        rows.append((lab, n, odd, int(odd == 0), int(odd <= 2)))
    return rows


def _rows(t):
    d = t.to_pydict()
    return list(zip(d["label"], d["n_vertices"], d["n_odd"],
                    d["has_circuit"], d["has_trail"]))


def test_path_graph_has_trail_not_circuit():
    # path 0-1-2-3: degrees 1,2,2,1 → 2 odd → trail yes, circuit no
    t = _rows(euler_parity_fold(np.zeros(4, np.int64),
                                np.array([1, 2, 2, 1])))
    assert t == [(0, 4, 2, 0, 1)]


def test_cycle_has_circuit():
    t = _rows(euler_parity_fold(np.zeros(5, np.int64),
                                np.full(5, 2)))
    assert t == [(0, 5, 0, 1, 1)]


def test_star_k13_neither():
    # star with 3 leaves: degrees 3,1,1,1 → 4 odd → neither
    t = _rows(euler_parity_fold(np.zeros(4, np.int64),
                                np.array([3, 1, 1, 1])))
    assert t == [(0, 4, 4, 0, 0)]


def test_multi_component_matches_bruteforce():
    rng = np.random.default_rng(11)
    labels = rng.integers(0, 7, 200).astype(np.int64)
    deg = rng.integers(0, 6, 200).astype(np.int64)
    assert _rows(euler_parity_fold(labels, deg)) == _brute(
        labels.tolist(), deg.tolist())


def test_empty():
    t = euler_parity_fold(np.zeros(0, np.int64), np.zeros(0, np.int64))
    assert t.num_rows == 0
