"""cm_inner_product (ops.py): per-row dot equality vs numpy, the
always-upper-bound guarantee, collision-free exactness at large
width, and the F1(A)·F1(B)/width expected-error envelope."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import cm_inner_product, cm_sketch

D = 4


def _sk(keys, width):
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    return cm_sketch(ds, "k", depth=D, width=width)


def _exact(a, b):
    ca = np.bincount(a, minlength=max(a.max(), b.max()) + 1)
    cb = np.bincount(b, minlength=max(a.max(), b.max()) + 1)
    return int(np.dot(ca, cb))


def test_cm_inner_dot_matches_numpy():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 50, 800).astype(np.int64)
    b = rng.integers(20, 90, 600).astype(np.int64)
    w = 128
    sa, sb = _sk(a, w), _sk(b, w)
    dots, est = cm_inner_product(sa, sb, depth=D, width=w)
    ma = np.asarray(sa["n"], np.int64).reshape(D, w)
    mb = np.asarray(sb["n"], np.int64).reshape(D, w)
    np.testing.assert_array_equal(dots, (ma * mb).sum(axis=1))
    assert est == dots.min()


def test_cm_inner_upper_bounds_exact():
    rng = np.random.default_rng(7)
    for w in (64, 256):
        a = rng.integers(0, 200, 1500).astype(np.int64)
        b = rng.integers(100, 300, 1200).astype(np.int64)
        _, est = cm_inner_product(_sk(a, w), _sk(b, w), depth=D, width=w)
        assert est >= _exact(a, b)


def test_cm_inner_exact_when_collision_free():
    a = np.repeat(np.arange(6, dtype=np.int64), [3, 1, 4, 1, 5, 9])
    b = np.repeat(np.arange(3, 9, dtype=np.int64), 2)
    w = 8192
    _, est = cm_inner_product(_sk(a, w), _sk(b, w), depth=D, width=w)
    assert est == _exact(a, b)


def test_cm_inner_error_envelope():
    rng = np.random.default_rng(13)
    a = rng.integers(0, 150, 2000).astype(np.int64)
    b = rng.integers(0, 150, 2000).astype(np.int64)
    w = 512
    _, est = cm_inner_product(_sk(a, w), _sk(b, w), depth=D, width=w)
    exact = _exact(a, b)
    assert 0 <= est - exact <= 4 * len(a) * len(b) // w
