import numpy as np

from essentials_rd.util import (
    csr_from_edges,
    csr_lookup,
    expand_neighbors,
    hash64,
    part_of,
    segment_min,
    segment_sum,
)


def test_hash64_deterministic_and_spread():
    x = np.arange(10_000, dtype=np.int64)
    h1, h2 = hash64(x), hash64(x)
    assert np.array_equal(h1, h2)
    parts = part_of(x, 8)
    counts = np.bincount(parts, minlength=8)
    assert counts.min() > 1000  # roughly uniform


def test_csr_roundtrip_and_expand():
    src = np.array([5, 2, 5, 9, 2], dtype=np.int64)
    dst = np.array([1, 3, 0, 7, 8], dtype=np.int64)
    sh = csr_from_edges(src, dst)
    assert sh["srcs"].tolist() == [2, 5, 9]
    rows, found = csr_lookup(sh, np.array([2, 4, 9], dtype=np.int64))
    assert found.tolist() == [True, False, True]
    rep, nbrs, eidx = expand_neighbors(sh, np.array([0, 2]))  # rows for 2 and 9
    assert nbrs.tolist() == [3, 8, 7]
    assert rep.tolist() == [0, 0, 1]


def test_csr_weights_follow_sort():
    src = np.array([1, 1, 0], dtype=np.int64)
    dst = np.array([9, 2, 5], dtype=np.int64)
    w = np.array([0.9, 0.2, 0.5])
    sh = csr_from_edges(src, dst, w)
    _, _, eidx = expand_neighbors(sh, np.array([0, 1]))
    assert sh["weights"][eidx].tolist() == [0.5, 0.2, 0.9]


def test_segment_ops():
    k = np.array([3, 1, 3, 1, 2], dtype=np.int64)
    v = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    uk, s, c = segment_sum(k, v)
    assert uk.tolist() == [1, 2, 3] and s.tolist() == [6.0, 5.0, 4.0]
    assert c.tolist() == [2, 1, 2]
    uk, m, _ = segment_min(k, v)
    assert m.tolist() == [2.0, 5.0, 1.0]


def test_empty_shard_lookup():
    sh = csr_from_edges(np.zeros(0, np.int64), np.zeros(0, np.int64))
    rows, found = csr_lookup(sh, np.array([1, 2], dtype=np.int64))
    assert not found.any()
