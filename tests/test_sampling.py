"""Graph sampling (essentials_rd/sampling.py): fanout sampling and
random walks must be valid (edges really exist), bounded (≤ k per
vertex / one node per step) and partition-count invariant — the
determinism property the SQL oracles rely on."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.graph import build_graph
from essentials_rd.sampling import random_walks, sample_neighbors


def _graph(num_parts, tmp_path, seed=3):
    rng = np.random.default_rng(seed)
    n_v, n_e = 200, 900
    src = rng.integers(0, n_v, n_e)
    dst = rng.integers(0, n_v, n_e)
    keep = src != dst
    s, d = np.minimum(src, dst)[keep], np.maximum(src, dst)[keep]
    uniq = np.unique(s * 1000 + d)
    s, d = uniq // 1000, uniq % 1000
    ds = rd.from_arrow(
        pa.table({"src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())})
    )
    g = build_graph(ds, str(tmp_path / f"g{num_parts}"), num_parts,
                    symmetrize=True, persist=False)
    edges = set(zip(np.r_[s, d].tolist(), np.r_[d, s].tolist()))
    return g, edges


def test_sample_neighbors_valid_bounded_invariant(tmp_path):
    g4, edges = _graph(4, tmp_path)
    g7, _ = _graph(7, tmp_path)
    out4 = sample_neighbors(g4, 3).to_pandas().sort_values(["src", "dst"])
    out7 = sample_neighbors(g7, 3).to_pandas().sort_values(["src", "dst"])
    assert out4.reset_index(drop=True).equals(out7.reset_index(drop=True))
    assert all(
        (s, d) in edges for s, d in zip(out4["src"], out4["dst"])
    )
    assert out4.groupby("src").size().max() <= 3
    # k larger than every degree keeps the full adjacency
    full = sample_neighbors(g4, 10**6).to_pandas()
    assert len(full) == len(edges)


def test_random_walks_valid_and_invariant(tmp_path):
    g4, edges = _graph(4, tmp_path)
    g7, _ = _graph(7, tmp_path)
    w4 = random_walks(g4, 3).to_pandas().sort_values(["wid", "step"])
    w7 = random_walks(g7, 3).to_pandas().sort_values(["wid", "step"])
    assert w4.reset_index(drop=True).equals(w7.reset_index(drop=True))
    # each walk has exactly `steps` rows and every hop is a real edge
    sizes = w4.groupby("wid").size()
    assert (sizes == 3).all()
    for wid, grp in w4.groupby("wid"):
        prev = wid
        for node in grp.sort_values("step")["node"]:
            if prev == -1:
                assert node == -1
            elif node != -1:
                assert (prev, node) in edges
            prev = node


def test_edge_similarity_matches_bruteforce(tmp_path):
    from collections import defaultdict

    from essentials_rd.algorithms.similarity import edge_similarity

    g, edges = _graph(4, tmp_path, seed=9)
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
    eds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in canon], pa.int64()),
                "dst": pa.array([b for _, b in canon], pa.int64()),
            }
        )
    )
    out = (
        edge_similarity(g, eds)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    for i, (u, v) in enumerate(canon):
        c = len(nbrs[u] & nbrs[v])
        assert out.loc[i, "common"] == c
        want = round(c / (len(nbrs[u]) + len(nbrs[v]) - c), 6)
        assert abs(out.loc[i, "jaccard"] - want) < 2e-6


def test_ktruss_matches_bruteforce(tmp_path):
    from collections import defaultdict

    from essentials_rd.algorithms.similarity import ktruss

    g, edges = _graph(4, tmp_path, seed=13)
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})
    k = 4

    def peel(es):
        es = set(es)
        while True:
            nbrs = defaultdict(set)
            for a, b in es:
                nbrs[a].add(b)
                nbrs[b].add(a)
            drop = {e for e in es if len(nbrs[e[0]] & nbrs[e[1]]) < k - 2}
            if not drop:
                return es
            es -= drop

    want = peel(canon)
    eds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in canon], pa.int64()),
                "dst": pa.array([b for _, b in canon], pa.int64()),
            }
        )
    )
    truss, rounds, converged = ktruss(eds, k, num_parts=4)
    assert converged
    got = {
        (int(r["src"]), int(r["dst"])) for r in truss.to_pandas().to_dict("records")
    }
    assert got == want


def _n2v_ref(edges, vids, steps, p, q, seed):
    """Scalar per-walk reference of the node2vec pick rule."""
    from essentials_rd.sampling import _seed_mix
    from essentials_rd.util import hash64

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    mix = int(_seed_mix(seed))
    out = []
    for wid in vids:
        cur, prev = int(wid), -1
        for t in range(1, steps + 1):
            nbrs = sorted(adj.get(cur, ())) if cur >= 0 else []
            if not nbrs:
                nxt = -1
            else:
                wts = []
                for c in nbrs:
                    if prev < 0:
                        wts.append(1.0)
                    elif c == prev:
                        wts.append(1.0 / p)
                    elif c in adj.get(prev, ()):
                        wts.append(1.0)
                    else:
                        wts.append(1.0 / q)
                key = ((int(wid) << 32) + cur * 2654435761 + t + mix) % 2**64
                h = int(hash64(np.array([key], np.uint64))[0])
                thr = (h / 2**64) * np.cumsum(wts)[-1]
                cw = np.cumsum(wts)
                hit = np.flatnonzero(cw > thr)
                nxt = nbrs[int(hit[0])] if len(hit) else nbrs[-1]
            out.append((int(wid), t, nxt))
            prev, cur = cur, nxt
    import pandas as pd

    return pd.DataFrame(out, columns=["wid", "step", "node"])


def test_node2vec_walks_match_scalar_reference_and_invariant(tmp_path):
    from essentials_rd.sampling import node2vec_walks

    g4, edges = _graph(4, tmp_path)
    g7, _ = _graph(7, tmp_path)
    vids = sorted({s for s, _ in edges})
    w4 = (node2vec_walks(g4, 3, p=2.0, q=0.5).to_pandas()
          .sort_values(["wid", "step"]).reset_index(drop=True))
    w7 = (node2vec_walks(g7, 3, p=2.0, q=0.5).to_pandas()
          .sort_values(["wid", "step"]).reset_index(drop=True))
    assert w4.equals(w7)
    want = (_n2v_ref(edges, vids, 3, 2.0, 0.5, 42)
            .sort_values(["wid", "step"]).reset_index(drop=True))
    assert w4.equals(want)
    # the bias must actually bite: p=2,q=0.5 walks differ from uniform
    uni = random_walks(g4, 3).to_pandas().sort_values(["wid", "step"])
    assert not w4["node"].equals(uni.reset_index(drop=True)["node"])


def test_degree_assortativity_moments_match_bruteforce(tmp_path):
    from collections import Counter

    from essentials_rd.algorithms.similarity import (
        degree_assortativity_moments,
    )

    g, edges = _graph(3, tmp_path, seed=29)  # edges = symmetrized set
    deg = Counter(u for u, _ in edges)
    xs = np.array([deg[u] for u, v in sorted(edges)], np.int64)
    ys = np.array([deg[v] for u, v in sorted(edges)], np.int64)

    canon = pa.table({
        "src": pa.array(sorted(u for u, v in edges if u < v), pa.int64()),
        "dst": pa.array([v for u, v in sorted(edges) if u < v], pa.int64()),
    })
    got = degree_assortativity_moments(g, rd.from_arrow(canon).repartition(4))
    assert got["n"][0].as_py() == len(edges)
    assert got["sum_x"][0].as_py() == int(xs.sum())
    assert got["sum_y"][0].as_py() == int(ys.sum())
    assert got["sum_xx"][0].as_py() == int((xs * xs).sum())
    assert got["sum_yy"][0].as_py() == int((ys * ys).sum())
    assert got["sum_xy"][0].as_py() == int((xs * ys).sum())
    # Pearson r over the sums equals numpy's corrcoef on the edge list
    n, sx, sy = len(edges), xs.sum(), ys.sum()
    sxx, syy, sxy = (xs * xs).sum(), (ys * ys).sum(), (xs * ys).sum()
    r = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(r - np.corrcoef(xs, ys)[0, 1]) < 1e-12


def test_ra_link_prediction_matches_bruteforce(tmp_path):
    from collections import defaultdict

    from essentials_rd.algorithms.similarity import (
        RA_SCALE, ra_link_prediction,
    )

    rng = np.random.default_rng(53)
    n_v, n_e = 60, 240
    src = rng.integers(0, n_v, n_e)
    dst = rng.integers(0, n_v, n_e)
    keep = src != dst
    s, d = np.minimum(src, dst)[keep], np.maximum(src, dst)[keep]
    uniq = np.unique(s * 1000 + d)
    s, d = (uniq // 1000).astype(np.int64), (uniq % 1000).astype(np.int64)
    edge_set = set(zip(s.tolist(), d.tolist()))

    nbrs = defaultdict(set)
    for a, b in edge_set:
        nbrs[a].add(b)
        nbrs[b].add(a)
    cap = 12
    scores, commons = defaultdict(int), defaultdict(int)
    for u, nb in nbrs.items():
        if len(nb) > cap:
            continue
        for v in nb:
            for w in nb:
                if v < w:
                    scores[(v, w)] += RA_SCALE // len(nb)
                    commons[(v, w)] += 1
    cand = [(sc, v, w) for (v, w), sc in scores.items()
            if (v, w) not in edge_set]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    k = 15
    want = [(v, w, sc, commons[(v, w)]) for sc, v, w in cand[:k]]

    eds = rd.from_arrow(pa.table({"src": pa.array(s), "dst": pa.array(d)}))
    for nb_ in (4, 16):
        got = ra_link_prediction(eds.repartition(3), k=k, deg_cap=cap,
                                 num_buckets=nb_)
        rows = [(r["v"], r["w"], r["score"], r["n_common"])
                for r in got.to_pylist()]
        assert rows == want, f"buckets={nb_}"


def test_negative_samples_valid_and_invariant(tmp_path):
    from essentials_rd.sampling import negative_samples

    g3, edges = _graph(3, tmp_path, seed=17)
    g5, _ = _graph(5, tmp_path, seed=17)
    k = 4
    a = sorted(map(tuple, negative_samples(g3, k, seed=9).take_all()
                   and [(r["src"], r["neg"], r["try_i"])
                        for r in negative_samples(g3, k, seed=9).take_all()]))
    b = sorted((r["src"], r["neg"], r["try_i"])
               for r in negative_samples(g5, k, seed=9).take_all())
    assert a == b  # partition-count invariant
    per = {}
    for s, c, i in a:
        assert (s, c) not in edges and s != c  # true negatives
        per.setdefault(s, []).append(i)
    assert all(len(v) <= k for v in per.values())
    assert any(len(v) == k for v in per.values())


def test_ktruss_checkpoint_resume(tmp_path):
    """Peeling resumes from the last complete round checkpoint: a run
    stopped after round 1 and resumed must reach the same fixpoint as
    an uninterrupted run (anchored path-power graph: the P^3 tail peels
    away over 3 rounds, the K6 anchor survives as the 5-truss)."""
    from essentials_rd.algorithms.similarity import ktruss
    from essentials_rd.checkpoint import CheckpointManager

    n = 40
    es = {(i, j) for i in range(n) for j in range(i + 1, min(i + 4, n))}
    for i in range(6):
        for j in range(i + 1, 6):
            es.add((i, j))
    canon = sorted(es)
    eds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in canon], pa.int64()),
        "dst": pa.array([b for _, b in canon], pa.int64()),
    })).repartition(4)

    full, rounds_full, conv = ktruss(eds, 5, num_parts=4)
    assert conv and rounds_full >= 3
    want = {(int(r["src"]), int(r["dst"]))
            for r in full.to_pandas().to_dict("records")}
    assert len(want) == 15  # the K6 anchor

    # interrupted run: stop after round 1 (checkpointed), fresh resume
    ck = CheckpointManager(str(tmp_path / "ck_truss"))
    part, r1, conv1 = ktruss(eds, 5, num_parts=4, max_rounds=1,
                             ckpt=ck, checkpoint_every=1)
    assert r1 == 1 and not conv1
    assert ck.latest_step() == 1

    res, rounds_res, conv_res = ktruss(eds, 5, num_parts=4,
                                       ckpt=ck, checkpoint_every=1,
                                       resume=True)
    assert conv_res and rounds_res == rounds_full
    got = {(int(r["src"]), int(r["dst"]))
           for r in res.to_pandas().to_dict("records")}
    assert got == want

    # resuming a converged checkpoint is a no-op returning the fixpoint
    res2, rounds2, conv2 = ktruss(eds, 5, num_parts=4, ckpt=ck,
                                  checkpoint_every=1, resume=True)
    assert conv2 and rounds2 == rounds_full
    got2 = {(int(r["src"]), int(r["dst"]))
            for r in res2.to_pandas().to_dict("records")}
    assert got2 == want
