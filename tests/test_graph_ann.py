"""graph_ann_search (ann.py) vs a NumPy reference of the identical
fixed-hop beam semantics; partition-count invariance; brute-force
equality under full exploration."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ann import (
    build_ann_index,
    graph_ann_search,
    knn_graph,
)

SCALE = 1e3


def _vectors(n=60, d=8, seed=21):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d))
    return m, rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float64())),
    }))


def _adj_ref(m, k):
    q = np.floor(m * SCALE).astype(np.int64)
    d = q @ q.T
    np.fill_diagonal(d, np.iinfo(np.int64).min)
    out = {}
    for i in range(len(m)):
        row = d[i]
        order = np.lexsort((np.arange(len(m)), -row))
        out[i] = order[:k]
    return out


def _beam_ref(m, adj, query, entry, beam, hops, k):
    q = np.floor(m * SCALE).astype(np.int64)
    qv = np.floor(query * SCALE).astype(np.int64)
    sc = q @ qv

    def top(ids, n):
        ids = np.unique(np.asarray(ids, np.int64))
        order = np.lexsort((ids, -sc[ids]))
        return ids[order[:n]]

    b = top(entry, beam)
    for _ in range(hops):
        cand = list(b)
        for u in b:
            cand.extend(adj[int(u)])
        b = top(cand, beam)
    out = top(b, k)
    return [(int(i), int(sc[i])) for i in out]


def _run(ds, m, tmp_path, P, beam, hops, k, k_adj=5, qid=7, entry=3):
    # one centroid => one bucket => adjacency == global exact kNN
    cent = m[:1] / np.linalg.norm(m[:1])
    adj = knn_graph(ds, cent, k_adj, scale=SCALE, query_mod=None)
    idx = str(tmp_path / f"gann{P}")
    build_ann_index(ds, adj, idx, P)
    t = graph_ann_search(idx, P, m[qid],
                         np.arange(entry, dtype=np.int64),
                         beam=beam, hops=hops, k=k, scale=SCALE)
    return list(zip([int(x) for x in t["vec_id"].to_pylist()],
                    [int(x) for x in t["dot_q"].to_pylist()]))


def test_beam_search_matches_reference(tmp_path):
    m, ds = _vectors()
    got = _run(ds, m, tmp_path, P=8, beam=6, hops=3, k=5)
    ref = _beam_ref(m, _adj_ref(m, 5), m[7], np.arange(3), 6, 3, 5)
    assert got == ref


def test_partition_count_invariance(tmp_path):
    m, ds = _vectors(seed=22)
    a = _run(ds, m, tmp_path, P=4, beam=6, hops=3, k=5)
    b = _run(ds, m, tmp_path, P=16, beam=6, hops=3, k=5)
    assert a == b


def test_full_exploration_equals_brute_force(tmp_path):
    m, ds = _vectors(n=40, seed=23)
    got = _run(ds, m, tmp_path, P=8, beam=40, hops=40, k=5, k_adj=6)
    q = np.floor(m * SCALE).astype(np.int64)
    sc = q @ np.floor(m[7] * SCALE).astype(np.int64)
    order = np.lexsort((np.arange(len(m)), -sc))[:5]
    # beam == N and enough hops to cover the graph's diameter =>
    # every vector reachable from the entries is scored
    assert got == [(int(i), int(sc[i])) for i in order]
