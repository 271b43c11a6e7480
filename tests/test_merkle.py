"""Merkle range-checksum tree (ops.merkle_range_tree).

Pins: digest equality for identical multisets under any block layout;
a single-row change flips exactly the root-to-leaf digest path (the
divergence-localization property the op exists for); counts ride
along; rehash-before-fold means sibling content can't cancel.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import merkle_diff, merkle_range_tree
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


def _raw_tree(keys: np.ndarray, parts: int, levels: int) -> pa.Table:
    t = pa.table({"k": pa.array(keys, pa.int64())})
    ds = rd.from_arrow(t).repartition(parts)
    return merkle_range_tree(
        ds,
        key_fn=lambda b: np_col(b, "k").astype(np.uint64),
        node_fn=lambda b: np_col(b, "k") // 8,
        levels=levels,
    )


def test_merkle_diff_localizes_and_prunes(ray_session):
    # 1024 keys -> 128 level-0 nodes; corrupt one row per distant leaf
    keys = np.arange(1024, dtype=np.int64)
    mutated = keys.copy()
    mutated[100] = 100_000 + 100  # leaves node 12, lands in node 12512
    mutated[900] += 1             # stays inside node 112 but re-keys
    a = _raw_tree(keys, 5, levels=8)
    b = _raw_tree(mutated, 3, levels=8)
    diff, comparisons = merkle_diff(a, b, levels=8)
    got = diff.to_pylist()
    assert [r["node"] for r in got] == [12, 112, 12512]
    by_node = {r["node"]: r for r in got}
    assert by_node[12]["n_a"] == by_node[12]["n_b"] + 1
    assert by_node[112]["n_a"] == by_node[112]["n_b"]
    assert by_node[112]["h_a"] != by_node[112]["h_b"]
    assert by_node[12512] == {"node": 12512, "n_a": 0, "h_a": 0,
                              "n_b": 1, "h_b": by_node[12512]["h_b"]}
    # the walk must touch far fewer nodes than a flat level-0 scan:
    # <= roots + 2 children per diverging node per level
    n_leaves = 129  # 128 original + the new far-away node
    assert comparisons < n_leaves
    assert comparisons <= 2 + 3 * 2 * 8  # roots + 3 paths x 2 kids x 8 lvls


def test_merkle_diff_identical_replicas(ray_session):
    keys = np.arange(512, dtype=np.int64)
    a = _raw_tree(keys, 4, levels=8)
    b = _raw_tree(keys, 7, levels=8)
    diff, comparisons = merkle_diff(a, b, levels=8)
    assert diff.num_rows == 0
    # only the root level is ever compared
    n_roots = len({r["node"] for r in a.to_pylist() if r["level"] == 8})
    assert comparisons == n_roots
