"""ks_drift (ops.py) vs scipy-free brute force: exact cross-multiplied
KS numerator on overlapping/disjoint supports, identical inputs (D=0),
layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import ks_drift


def _ds(vals):
    return rd.from_arrow(pa.table({
        "c": pa.array(np.asarray(vals, np.int64), pa.int64())}))


def _ref(a, b):
    a, b = np.asarray(a, np.int64), np.asarray(b, np.int64)
    vals = np.unique(np.r_[a, b])
    ca = np.array([(a <= x).sum() for x in vals], np.int64)
    cb = np.array([(b <= x).sum() for x in vals], np.int64)
    return int(np.abs(ca * len(b) - cb * len(a)).max()), len(a), len(b)


def _got(t):
    return (int(t["d_num"][0].as_py()), int(t["n_a"][0].as_py()),
            int(t["n_b"][0].as_py()))


def test_ks_matches_brute_force():
    rng = np.random.default_rng(51)
    a = rng.integers(0, 50, 300)
    b = rng.integers(10, 80, 200)
    assert _got(ks_drift(_ds(a), _ds(b), "c")) == _ref(a, b)


def test_ks_identical_and_disjoint():
    a = np.array([1, 2, 2, 3])
    assert _got(ks_drift(_ds(a), _ds(a), "c")) == (0, 4, 4)
    b = np.array([100, 200])
    # disjoint: D = 1 => d_num = n_a * n_b
    assert _got(ks_drift(_ds(a), _ds(b), "c")) == (8, 4, 2)


def test_ks_layout_invariance():
    rng = np.random.default_rng(52)
    a = rng.integers(0, 30, 500)
    b = rng.integers(0, 30, 400)
    x = _got(ks_drift(_ds(a), _ds(b), "c", num_buckets=2))
    y = _got(ks_drift(_ds(a).repartition(7), _ds(b).repartition(3),
                      "c", num_buckets=16))
    assert x == y == _ref(a, b)
