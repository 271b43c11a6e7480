"""Merkle range-checksum tree (ops.merkle_range_tree).

Pins: digest equality for identical multisets under any block layout;
a single-row change flips exactly the root-to-leaf digest path (the
divergence-localization property the op exists for); counts ride
along; rehash-before-fold means sibling content can't cancel.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import merkle_range_tree
from essentials_rd.util import np_col


def _tree(keys: np.ndarray, parts: int, levels: int = 4):
    t = pa.table({"k": pa.array(keys, pa.int64())})
    ds = rd.from_arrow(t).repartition(parts)
    out = merkle_range_tree(
        ds,
        key_fn=lambda b: np_col(b, "k").astype(np.uint64),
        node_fn=lambda b: np_col(b, "k") // 8,
        levels=levels,
    )
    return {(r["level"], r["node"]): (r["n"], r["h"])
            for r in out.to_pylist()}


def test_layout_invariance(ray_session):
    keys = np.arange(100, dtype=np.int64)
    assert _tree(keys, 1) == _tree(keys, 9)
    # permuted rows: same multiset, same tree
    rng = np.random.default_rng(0)
    assert _tree(keys, 3) == _tree(rng.permutation(keys), 5)


def test_single_change_flips_exactly_one_path(ray_session):
    keys = np.arange(100, dtype=np.int64)
    mutated = keys.copy()
    mutated[37] = 1037  # moves a row out of node 37//8=4 into node 129
    a, b = _tree(keys, 4), _tree(mutated, 4)
    diff = {nk for nk in set(a) | set(b) if a.get(nk) != b.get(nk)}
    # changed leaves: node 4 (lost a row) and node 129 (new) + ancestors
    expect = set()
    for leaf in (4, 129):
        node = leaf
        for lvl in range(5):
            expect.add((lvl, node))
            node >>= 1
    assert diff == expect
    # counts localize too: node 4 lost one row
    assert a[(0, 4)][0] == b[(0, 4)][0] + 1


def test_duplicate_rows_not_cancelled(ray_session):
    # wrapping SUM of hashes: a duplicated row changes the digest
    # (an XOR fold would cancel it)
    once = _tree(np.array([5, 6, 7], np.int64), 1)
    dup = _tree(np.array([5, 6, 7, 7], np.int64), 1)
    assert once[(0, 0)] != dup[(0, 0)]
    assert dup[(0, 0)][0] == 4


def test_counts_fold_up(ray_session):
    keys = np.arange(64, dtype=np.int64)  # 8 leaves of 8 rows
    t = _tree(keys, 6)
    assert t[(0, 0)][0] == 8
    assert t[(1, 0)][0] == 16
    assert t[(3, 0)][0] == 64  # root holds every row
