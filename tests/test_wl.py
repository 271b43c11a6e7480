"""1-WL color refinement (algorithms/wl.py): distributed result vs the
single-process adjacency-list reference, isomorphism invariance (two
disjoint copies of the same graph under different vertex numberings
must produce identical color MULTISETS), structural separation on a
path graph, and partition/layout invariance."""

import numpy as np

from essentials_rd.algorithms.wl import wl_refine, wl_refine_local

from .conftest import edges_ds, small_graph


def _random_edges(n=36, m=90, seed=5):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep])
    hi = np.maximum(src[keep], dst[keep])
    pairs = np.unique(lo * np.int64(n) + hi)
    return pairs // n, pairs % n


def _run(tmp_path, src, dst, vids, rounds=3, P=2, buckets=4):
    g = small_graph(tmp_path, src, dst, P=P, vertex_ids=vids)
    t = wl_refine(g, edges_ds(src, dst), rounds=rounds,
                  num_buckets=buckets)
    return (np.asarray(t["vid"], np.int64),
            np.asarray(t["color"], np.int64))


def test_wl_matches_local_reference(tmp_path):
    src, dst = _random_edges()
    vids = np.unique(np.r_[src, dst])
    got_v, got_c = _run(tmp_path / "a", src, dst, vids)
    want = wl_refine_local(src, dst, vids, rounds=3)
    assert (got_v == vids).all()
    assert (got_c == want).all()


def test_wl_partition_and_bucket_invariance(tmp_path):
    src, dst = _random_edges(seed=9)
    vids = np.unique(np.r_[src, dst])
    _, c1 = _run(tmp_path / "p2", src, dst, vids, P=2, buckets=3)
    _, c2 = _run(tmp_path / "p5", src, dst, vids, P=5, buckets=8)
    assert (c1 == c2).all()


def test_wl_isomorphism_invariance(tmp_path):
    # copy B is copy A with vertices renumbered by an arbitrary
    # permutation and shifted into a disjoint id range
    src, dst = _random_edges(n=20, m=40, seed=3)
    vids = np.unique(np.r_[src, dst])
    rng = np.random.default_rng(1)
    perm = {int(v): 1000 + int(p)
            for v, p in zip(vids, rng.permutation(len(vids)))}
    src2 = np.array([perm[int(v)] for v in src], np.int64)
    dst2 = np.array([perm[int(v)] for v in dst], np.int64)
    all_src = np.r_[src, np.minimum(src2, dst2)]
    all_dst = np.r_[dst, np.maximum(src2, dst2)]
    all_vids = np.unique(np.r_[all_src, all_dst])
    got_v, got_c = _run(tmp_path, all_src, all_dst, all_vids)
    in_a = got_v < 1000
    assert sorted(got_c[in_a]) == sorted(got_c[~in_a])


def test_wl_path_graph_separates_by_distance_to_end(tmp_path):
    # P6: after 3 rounds each vertex's color class is exactly its
    # min-distance-to-an-end class {0,5},{1,4},{2,3}
    src = np.array([0, 1, 2, 3, 4], np.int64)
    dst = np.array([1, 2, 3, 4, 5], np.int64)
    vids = np.arange(6, dtype=np.int64)
    got_v, got_c = _run(tmp_path, src, dst, vids)
    c = dict(zip(got_v.tolist(), got_c.tolist()))
    assert c[0] == c[5] and c[1] == c[4] and c[2] == c[3]
    assert len({c[0], c[1], c[2]}) == 3
