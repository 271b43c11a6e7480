"""Vector-payload neighbor aggregation (gnn.neighbor_feature_sum)."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.gnn import _list_matrix, neighbor_feature_sum
from essentials_rd.util import np_col


def test_neighbor_feature_sum_matches_bruteforce_and_invariant():
    rng = np.random.default_rng(31)
    n_v, n_f, d = 40, 10, 6
    # random canonical undirected edges
    src = rng.integers(0, n_v, 120).astype(np.int64)
    dst = rng.integers(0, n_v, 120).astype(np.int64)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    uniq = np.unique(a * np.int64(n_v) + b)
    a, b = uniq // n_v, uniq % n_v
    feats = rng.normal(size=(n_f, d))
    q = np.floor(feats * 1_000_000).astype(np.int64)
    # brute force: both directions, dst accumulates q[src % n_f]
    want = {}
    for s, t in zip(np.r_[a, b], np.r_[b, a]):
        want.setdefault(int(t), np.zeros(d, np.int64))
        want[int(t)] += q[int(s) % n_f]
    edges_t = pa.table({"src": pa.array(a, pa.int64()),
                        "dst": pa.array(b, pa.int64())})
    feats_t = pa.table({
        "vec_id": pa.array(np.arange(n_f), pa.int64()),
        "embedding": pa.array([r.tolist() for r in feats],
                              pa.list_(pa.float64())),
    })
    outs = []
    for parts in (1, 5):
        out = neighbor_feature_sum(
            rd.from_arrow(edges_t).repartition(parts),
            rd.from_arrow(feats_t).repartition(2),
            n_f, num_buckets=8,
        ).to_pandas()
        outs.append({
            int(r.vid): tuple(int(x) for x in r.feat)
            for r in out.itertuples()
        })
    assert outs[0] == {k: tuple(v) for k, v in want.items()}
    assert outs[0] == outs[1]
    # only vertices with >= 1 edge appear
    assert set(outs[0]) == set(want)


def test_list_matrix_roundtrip():
    m = np.arange(12, dtype=np.int64).reshape(3, 4)
    col = pa.chunked_array([pa.array(list(m[:2]), pa.list_(pa.int64())),
                            pa.array(list(m[2:]), pa.list_(pa.int64()))])
    got = _list_matrix(col, 3)
    assert np.array_equal(got, m)


def test_neighbor_vec_sum_is_a_squared_x():
    from essentials_rd.gnn import neighbor_vec_sum

    rng = np.random.default_rng(59)
    n_v, d = 25, 4
    src, dst = [], []
    for u in range(n_v):
        for v in range(u + 1, n_v):
            if rng.random() < 0.2:
                src.append(u)
                dst.append(v)
    A = np.zeros((n_v, n_v), np.int64)
    for u, v in zip(src, dst):
        A[u, v] = A[v, u] = 1
    x = rng.integers(-50, 50, (n_v, d)).astype(np.int64)
    edges_t = pa.table({"src": pa.array(src, pa.int64()),
                        "dst": pa.array(dst, pa.int64())})
    vec_t = pa.table({
        "vid": pa.array(np.arange(n_v), pa.int64()),
        "feat": pa.array([r.tolist() for r in x], pa.list_(pa.int64())),
    })
    want = A @ x  # layer over exact per-vertex vectors
    for parts in (1, 6):
        out = neighbor_vec_sum(
            rd.from_arrow(edges_t).repartition(parts),
            rd.from_arrow(vec_t).repartition(2), num_buckets=8,
        ).to_pandas()
        got = {int(r.vid): np.array(r.feat, np.int64)
               for r in out.itertuples()}
        for v in got:
            assert np.array_equal(got[v], want[v])
        # vertices with no edges are absent; all others exact
        assert set(got) == {v for v in range(n_v) if A[v].any()}
    # two chained calls equal A^2 x on the covered vertices
    h2 = neighbor_vec_sum(
        rd.from_arrow(edges_t),
        neighbor_vec_sum(rd.from_arrow(edges_t),
                         rd.from_arrow(vec_t), num_buckets=8)
        .materialize(), num_buckets=8).to_pandas()
    want2 = A @ (A @ x)
    for r in h2.itertuples():
        assert np.array_equal(np.array(r.feat, np.int64),
                              want2[int(r.vid)])
