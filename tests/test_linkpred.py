"""Link-prediction AUC composition: edge_similarity on NON-edge pairs
vs brute force, and the rank-sum identity u2/(2·na·nb) == pairwise
probabilistic AUC (ties half credit)."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from essentials_rd.graph import build_graph
from essentials_rd.util import np_col


def _edges():
    # four 10-cliques: in-clique pairs (the positives) share 8 common
    # neighbors; any cross-clique pair (every sampled negative) shares
    # none -> common-neighbor score must separate them perfectly
    src, dst = [], []
    for c in range(4):
        base = 10 * c
        for i in range(10):
            for j in range(i + 1, 10):
                src.append(base + i)
                dst.append(base + j)
    return np.array(src, np.int64), np.array(dst, np.int64)


def test_linkpred_auc_matches_bruteforce(tmp_path, ray_session):
    src, dst = _edges()
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    g = build_graph(ds, str(tmp_path / "g"), 4, symmetrize=True)

    from essentials_rd.algorithms.similarity import edge_similarity
    from essentials_rd.ops import rank_sum_u
    from essentials_rd.sampling import negative_samples

    # brute-force adjacency
    adj: dict[int, set] = {}
    for u, w in zip(src.tolist(), dst.tolist()):
        adj.setdefault(u, set()).add(w)
        adj.setdefault(w, set()).add(u)

    def common(u, w):
        return len(adj.get(u, set()) & adj.get(w, set()))

    pos_scores = [common(u, w) for u, w in zip(src.tolist(), dst.tolist())]

    negs = negative_samples(g, 2, tries=8, seed=7).take_all()
    neg_pairs = [(min(r["src"], r["neg"]), max(r["src"], r["neg"]))
                 for r in negs]
    for u, w in neg_pairs:  # sanity: sampled pairs really are non-edges
        assert w not in adj.get(u, set())
    neg_scores = [common(u, w) for u, w in neg_pairs]

    # engine side: score both sets, rank-sum them
    def _canon(t: pa.Table) -> pa.Table:
        u = np_col(t, "src").astype(np.int64)
        w = np_col(t, "neg").astype(np.int64)
        return pa.table({"src": pa.array(np.minimum(u, w), pa.int64()),
                         "dst": pa.array(np.maximum(u, w), pa.int64())})

    pos_ds = edge_similarity(g, ds)
    got_pos = sorted(r["common"] for r in pos_ds.take_all())
    assert got_pos == sorted(pos_scores)

    neg_ds = edge_similarity(
        g, negative_samples(g, 2, tries=8, seed=7)
        .map_batches(_canon, batch_format="pyarrow"))
    got_neg = sorted(r["common"] for r in neg_ds.take_all())
    assert got_neg == sorted(neg_scores)

    r = rank_sum_u(pos_ds.select_columns(["common"]),
                   neg_ds.select_columns(["common"]), "common")
    u2 = int(r["u2_a"][0].as_py())
    na = int(r["n_a"][0].as_py())
    nb = int(r["n_b"][0].as_py())
    assert (na, nb) == (len(pos_scores), len(neg_scores))

    # pairwise probabilistic AUC, brute force
    wins = sum(1 for p in pos_scores for q in neg_scores if p > q)
    ties = sum(1 for p in pos_scores for q in neg_scores if p == q)
    assert u2 == 2 * wins + ties
    auc = float(u2) / float(2 * na * nb)
    # in-clique positives (8 common nbrs) vs cross-clique negatives (0)
    assert auc == 1.0
