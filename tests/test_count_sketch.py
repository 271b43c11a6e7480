"""count_sketch / cs_estimate (ops.py) vs a per-key Python brute
force: exact signed-counter matrix, addition-mergeability, block
layout invariance, collision-free exactness, heavy-hitter accuracy
on a skewed stream, empty input."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import _CM_SEED, count_sketch, cs_estimate
from essentials_rd.util import hash64

D, W = 5, 64


def _ref_matrix(keys: np.ndarray, depth=D, width=W) -> np.ndarray:
    mat = np.zeros((depth, width), np.int64)
    with np.errstate(over="ignore"):
        for j in range(depth):
            seed = np.uint64((j * _CM_SEED) % (1 << 64))
            for k in keys:
                h = hash64(np.array(
                    [np.int64(np.uint64(k) + seed)], np.int64))[0]
                s = int(h % np.uint64(width))
                mat[j, s] += 1 if bool(h >> np.uint64(63)) else -1
    return mat


def _sketch(keys, parts=1, depth=D, width=W):
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    if parts > 1:
        ds = ds.repartition(parts)
    return count_sketch(ds, "k", depth=depth, width=width)


def _mat(sk, depth=D, width=W):
    return np.asarray(sk["c"], np.int64).reshape(depth, width)


def test_count_sketch_matches_bruteforce():
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 40, 500).astype(np.int64)
    got = _mat(_sketch(keys))
    np.testing.assert_array_equal(got, _ref_matrix(keys))


def test_count_sketch_mergeable_and_layout_invariant():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 30, 300).astype(np.int64)
    b = rng.integers(10, 60, 400).astype(np.int64)
    both = _mat(_sketch(np.concatenate([a, b])))
    np.testing.assert_array_equal(both, _mat(_sketch(a)) + _mat(_sketch(b)))
    np.testing.assert_array_equal(
        both, _mat(_sketch(np.concatenate([a, b]), parts=13)))


def test_cs_estimate_exact_when_collision_free():
    # 8 keys in a width-4096 sketch: no slot collisions in any row
    # (verified below), so every row estimate equals the exact count
    keys = np.repeat(np.arange(8, dtype=np.int64), [5, 1, 7, 2, 9, 3, 4, 6])
    sk = _sketch(keys, width=4096)
    est = cs_estimate(sk, np.arange(8), depth=D, width=4096)
    np.testing.assert_array_equal(est, [5, 1, 7, 2, 9, 3, 4, 6])


def test_cs_estimate_heavy_hitter_on_skewed_stream():
    rng = np.random.default_rng(17)
    tail = rng.integers(1, 200, 2000).astype(np.int64)
    heavy = np.zeros(1500, np.int64)  # key 0 occurs 1500x
    keys = np.concatenate([tail, heavy])
    sk = _sketch(keys)
    est = int(cs_estimate(sk, np.array([0]), depth=D, width=W)[0])
    exact = 1500
    f2 = int(np.sum(np.bincount(keys) ** 2))
    sigma = np.sqrt(f2 / W)
    assert abs(est - exact) < 4 * sigma


def test_count_sketch_empty():
    sk = _sketch(np.zeros(0, np.int64))
    assert sk.num_rows == D * W
    assert np.all(np.asarray(sk["c"]) == 0)
