"""Engine vs CPU validators on small fixtures (FIXTURES.md F2):
path graph, star hub K1,50, cliques, duplicate edges — the
"pr/cc/spmv test harness" mirror (BASELINE.json north_star)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.algorithms import (
    connected_components,
    label_propagation,
    pagerank,
    spmv,
    triangle_counts,
)
from essentials_rd.graph import build_graph
from essentials_rd.algorithms.cc import components_table
from essentials_rd.algorithms.lp import labels_table
from essentials_rd.algorithms.pagerank import pagerank_table
from essentials_rd.algorithms.spmv import spmv_table
from essentials_rd.reference_impl import (
    cc_ref,
    lp_sync_ref,
    pagerank_ref,
    spmv_ref,
    triangles_ref,
)

from .conftest import edges_ds, small_graph


def _random_edges(n=30, m=90, seed=3):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(src[keep] * np.int64(n) + dst[keep])
    return pairs // n, pairs % n


def _canon(src, dst):
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    pairs = np.unique(lo * np.int64(1 << 20) + hi)
    return pairs // (1 << 20), pairs % (1 << 20)


def test_spmv_matches_numpy(tmp_path):
    src, dst = _random_edges()
    rng = np.random.default_rng(5)
    w = rng.random(len(src))
    g = small_graph(tmp_path, src, dst, weight=w, P=3, symmetrize=False)
    res = spmv(g)
    t = spmv_table(res)
    vids = np.asarray(t["vid"])
    y_ref = spmv_ref(vids, src, dst, w, (vids % 97) / 97.0)
    assert np.allclose(np.asarray(t["y"]), y_ref, atol=1e-12)


def test_pagerank_fixed_k_matches_reference(tmp_path):
    src, dst = _random_edges(n=25, m=80, seed=7)
    g = small_graph(
        tmp_path, src, dst, P=3, symmetrize=False,
        vertex_ids=np.arange(25, dtype=np.int64),
    )
    res = pagerank(g, tol=0.0, max_iters=5, checkpoint_every=0, scatter_mode="fused")
    t = pagerank_table(res)
    p_ref = pagerank_ref(np.arange(25, dtype=np.int64), src, dst, max_iters=5, tol=0.0)
    assert res.supersteps == 5
    assert np.allclose(np.asarray(t["pagerank"]), p_ref, atol=1e-12)


def test_pagerank_convergence_matches_reference_1e6(tmp_path):
    # includes dangling vertices (directed random graph)
    src, dst = _random_edges(n=30, m=70, seed=11)
    vids = np.arange(30, dtype=np.int64)
    g = small_graph(tmp_path, src, dst, P=2, symmetrize=False, vertex_ids=vids)
    res = pagerank(g, alpha=0.6, tol=1e-8, max_iters=100, checkpoint_every=0,
                   scatter_mode="fused")
    assert res.converged
    t = pagerank_table(res)
    p_ref = pagerank_ref(vids, src, dst, alpha=0.6, tol=1e-12, max_iters=1000)
    assert np.allclose(np.asarray(t["pagerank"]), p_ref, atol=1e-6)
    assert abs(np.asarray(t["pagerank"]).sum() - 1.0) < 1e-9


def test_cc_exact_two_cliques_and_isolated(tmp_path):
    # two cliques {0..3}, {10..13}, a path 20-21-22, isolated 30
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges += [(20, 21), (21, 22)]
    e = np.array(edges, dtype=np.int64)
    vids = np.unique(np.r_[e.ravel(), 30])
    g = small_graph(tmp_path, e[:, 0], e[:, 1], P=3, vertex_ids=vids)
    res = connected_components(g, checkpoint_every=0, scatter_mode="fused")
    assert res.converged
    t = components_table(res)
    expected = cc_ref(vids, e[:, 0], e[:, 1])
    # cc_ref covers only vids present; isolated 30 keeps label 30
    assert np.asarray(t["label"]).tolist() == expected.tolist()


def test_cc_star_hub(tmp_path):
    # K1,50 hub — the skew fixture
    hub = 0
    leaves = np.arange(1, 51, dtype=np.int64)
    src = np.full(50, hub, dtype=np.int64)
    g = small_graph(tmp_path, src, leaves, P=4)
    res = connected_components(g, checkpoint_every=0, scatter_mode="fused")
    t = components_table(res)
    assert set(np.asarray(t["label"]).tolist()) == {0}
    # hub received one pre-combined message per partition, not 50 raw rows
    total_msgs = res.total_messages
    assert total_msgs >= 50  # raw message count metric counts raw votes


def test_lp_matches_reference(tmp_path):
    src, dst = _random_edges(n=24, m=60, seed=13)
    src, dst = _canon(src, dst)
    vids = np.unique(np.r_[src, dst])
    g = small_graph(tmp_path, src, dst, P=3, vertex_ids=vids)
    res = label_propagation(g, max_iters=7, checkpoint_every=0, scatter_mode="fused")
    t = labels_table(res)
    expected = lp_sync_ref(vids, src, dst, max_iters=7)
    assert np.asarray(t["label"]).tolist() == expected.tolist()


@pytest.mark.parametrize("method", ["intersect", "wedge"])
def test_tc_matches_reference(tmp_path, method):
    src, dst = _random_edges(n=20, m=80, seed=17)
    src, dst = _canon(src, dst)
    vids = np.unique(np.r_[src, dst])
    total, per_v = triangle_counts(
        edges_ds(src, dst), str(tmp_path), 3, vertex_ids=vids, method=method
    )
    exp_total, exp_per_v = triangles_ref(vids, src, dst)
    assert total == exp_total
    rows = sorted(per_v.take_all(), key=lambda r: r["vid"])
    got = {r["vid"]: r["triangles"] for r in rows}
    for i, v in enumerate(vids.tolist()):
        assert got.get(v, 0) == exp_per_v[i]


def test_duplicate_and_selfloop_edges_ignored(tmp_path):
    # self-loops dropped; duplicate edges in the input are tolerated by
    # CC (min is idempotent)
    src = np.array([1, 1, 2, 3, 3], dtype=np.int64)
    dst = np.array([2, 2, 2, 4, 4], dtype=np.int64)
    g = small_graph(tmp_path, src, dst, P=2)
    res = connected_components(g, checkpoint_every=0, scatter_mode="fused")
    t = components_table(res)
    labels = dict(zip(np.asarray(t["vid"]).tolist(), np.asarray(t["label"]).tolist()))
    assert labels == {1: 1, 2: 1, 3: 3, 4: 3}


@pytest.mark.parametrize("mode", ["tasks", "actors", "fused"])
def test_scatter_modes_equivalent(tmp_path, mode):
    """All three scatter modes implement the same semantics (equal to
    1e-12; exact float bits may differ across modes because partial-sum
    grouping differs when a partition's state spans blocks — each mode
    on its own is deterministic, covered by the resume tests)."""
    src, dst = _random_edges(n=20, m=50, seed=23)
    vids = np.arange(20, dtype=np.int64)
    g = small_graph(tmp_path / mode, src, dst, P=3, symmetrize=False,
                    vertex_ids=vids)
    res = pagerank(g, tol=0.0, max_iters=3, checkpoint_every=0, scatter_mode=mode)
    t = pagerank_table(res)
    p_ref = pagerank_ref(vids, src, dst, max_iters=3, tol=0.0)
    assert np.allclose(np.asarray(t["pagerank"]), p_ref, atol=1e-12)


def test_persist_false_build_matches_checkpointed(tmp_path):
    """The no-checkpoint (object-store exchange) build produces the
    same graph — vertex universe, degrees, PR and CC results — as the
    parquet-checkpointed build."""
    import ray

    from essentials_rd.util import np_col

    src, dst = _random_edges(n=40, m=160, seed=11)
    g1 = small_graph(tmp_path / "a", src, dst, P=3, symmetrize=True)
    g2 = small_graph(tmp_path / "b", src, dst, P=3, symmetrize=True,
                     persist=False)
    assert g2.edges_dir == "" and g2.edges_ds is not None
    assert g1.n_edges == g2.n_edges and g1.n_vertices == g2.n_vertices
    assert np.array_equal(ray.get(g1.vertex_ids_ref),
                          ray.get(g2.vertex_ids_ref))

    def degs(g):
        out = {}
        for t in ray.get(list(g.degree_refs)):
            for v, d in zip(np_col(t, "vid"), np_col(t, "outdeg")):
                out[int(v)] = out.get(int(v), 0) + int(d)
        return out

    assert degs(g1) == degs(g2)
    p1 = pagerank_table(pagerank(g1, tol=0.0, max_iters=4, checkpoint_every=0))
    p2 = pagerank_table(pagerank(g2, tol=0.0, max_iters=4, checkpoint_every=0))
    assert np.array_equal(np.asarray(p1["vid"]), np.asarray(p2["vid"]))
    assert np.allclose(np.asarray(p1["pagerank"]), np.asarray(p2["pagerank"]),
                       atol=0)
    c1 = components_table(connected_components(g1, checkpoint_every=0))
    c2 = components_table(connected_components(g2, checkpoint_every=0))
    assert np.array_equal(np.asarray(c1["label"]), np.asarray(c2["label"]))


def test_hits_matches_reference(tmp_path):
    """Directed HITS (alternating-parity program on the direction-
    tagged weighted graph) vs the dense CPU validator."""
    import ray.data as rd

    from essentials_rd.algorithms import hits, hits_graph_edges, hits_table
    from essentials_rd.graph import build_graph
    from essentials_rd.reference_impl import hits_ref

    src, dst = _random_edges(n=30, m=120, seed=17)
    vids = np.arange(30, dtype=np.int64)
    tagged = hits_graph_edges(edges_ds(src, dst))
    g = build_graph(tagged, str(tmp_path / "g"), 3, symmetrize=False,
                    weighted=True, vertex_ids=vids, persist=False)
    res = hits(g, k=4)
    t = hits_table(res, round_digits=12)
    h_ref, a_ref = hits_ref(vids, src, dst, k=4)
    assert np.array_equal(np.asarray(t["vid"]), vids)
    assert np.allclose(np.asarray(t["hub"]), h_ref, atol=1e-9)
    assert np.allclose(np.asarray(t["auth"]), a_ref, atol=1e-9)


def test_pagerank_weighted_matches_reference(tmp_path):
    from essentials_rd.algorithms.pagerank import pagerank_weighted
    from essentials_rd.reference_impl import pagerank_weighted_ref

    rng = np.random.default_rng(17)
    n_v, n_e = 150, 600
    src = rng.integers(0, n_v, n_e)
    dst = rng.integers(0, n_v, n_e)
    keep = src != dst
    s, d = np.minimum(src, dst)[keep], np.maximum(src, dst)[keep]
    uniq, inv = np.unique(s * 1000 + d, return_index=True)
    s, d = uniq // 1000, uniq % 1000
    w = rng.integers(1, 6, len(s)).astype(np.float64)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(s, pa.int64()),
                "dst": pa.array(d, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )
    g = build_graph(ds, str(tmp_path / "wpr"), 4, symmetrize=True,
                    weighted=True, persist=False)
    res = pagerank_weighted(g, tol=1e-12, max_iters=120, checkpoint_every=0)
    t = res.state_table(["value"])
    got = np.asarray(t["value"], dtype=np.float64)
    vids = np.asarray(t["vid"], dtype=np.int64)
    want = pagerank_weighted_ref(
        vids, np.r_[s, d], np.r_[d, s], np.r_[w, w],
        tol=1e-12, max_iters=120,
    )
    assert np.allclose(got, want, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-9


def test_mis_matches_reference_and_is_maximal_independent(tmp_path):
    from essentials_rd.algorithms import mis
    from essentials_rd.algorithms.mis import mis_table
    from essentials_rd.reference_impl import mis_ref

    src, dst = _random_edges(n=60, m=300, seed=19)
    src, dst = _canon(src, dst)
    vids = np.unique(np.r_[src, dst, [59]])  # 59 possibly isolated
    g = small_graph(tmp_path, src, dst, P=3, vertex_ids=vids)
    res = mis(g, checkpoint_every=0, scatter_mode="fused")
    assert res.converged
    t = mis_table(res)
    got = np.asarray(t["in_set"], np.int64)
    sym_s, sym_d = np.r_[src, dst], np.r_[dst, src]
    want = mis_ref(vids, sym_s, sym_d)
    assert got.tolist() == want.tolist()
    # independent: no edge inside the set
    in_set = {int(v) for v, x in zip(np.asarray(t["vid"]), got) if x == 1}
    assert not any(s in in_set and d in in_set for s, d in zip(src, dst))
    # maximal: every out vertex has an in-set neighbor
    nbr = {}
    for a, b in zip(sym_s.tolist(), sym_d.tolist()):
        nbr.setdefault(a, set()).add(b)
    for v, x in zip(np.asarray(t["vid"]).tolist(), got.tolist()):
        if x == 0:
            assert nbr.get(v, set()) & in_set, v


def _scc_graph(tmp_path, src, dst, vids, P=3):
    from essentials_rd.algorithms import hits_graph_edges
    from essentials_rd.graph import build_graph

    tagged = hits_graph_edges(edges_ds(src, dst))
    return build_graph(tagged, str(tmp_path / "g"), P, symmetrize=False,
                       weighted=True, vertex_ids=vids, persist=False)


def test_scc_planted_cycles_and_dag_bridges(tmp_path):
    """Planted SCCs: a 4-cycle, a 2-cycle, singletons, connected by
    one-way bridges (which must NOT merge components)."""
    from essentials_rd.algorithms import scc_coloring
    from essentials_rd.reference_impl import scc_ref

    # cycle {0,1,2,3}, cycle {10,11}, bridge 3->10, 11->20, chain 20->21
    src = np.array([0, 1, 2, 3, 10, 11, 3, 11, 20], np.int64)
    dst = np.array([1, 2, 3, 0, 11, 10, 10, 20, 21], np.int64)
    vids = np.unique(np.r_[src, dst, [99]])  # plus an isolated vertex
    g = _scc_graph(tmp_path, src, dst, vids)
    tbl, rounds = scc_coloring(g)
    got = dict(zip(np.asarray(tbl["vid"]).tolist(),
                   np.asarray(tbl["scc"]).tolist()))
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[10] == got[11] == 10
    assert got[20] == 20 and got[21] == 21 and got[99] == 99
    expect = scc_ref(vids, src, dst)
    assert np.array_equal(np.asarray(tbl["scc"]), expect)


def test_scc_pure_dag_chain_is_all_singletons_via_trim(tmp_path):
    """A directed chain is the coloring algorithm's worst case without
    trim (one outer round per vertex); the trim phase must peel it in
    ONE outer round."""
    from essentials_rd.algorithms import scc_coloring
    from essentials_rd.reference_impl import scc_ref

    n = 40
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    vids = np.arange(n, dtype=np.int64)
    g = _scc_graph(tmp_path, src, dst, vids)
    tbl, rounds = scc_coloring(g)
    assert rounds == 1, "trim must retire a DAG in one outer round"
    assert np.array_equal(np.asarray(tbl["scc"]), scc_ref(vids, src, dst))
    assert np.array_equal(np.asarray(tbl["scc"]), vids)


@pytest.mark.parametrize("P", [1, 4])
def test_scc_random_matches_tarjan_and_partition_invariant(tmp_path, P):
    """Random directed graph vs the Tarjan validator, at two partition
    counts (labels must be identical — partitioning-independent)."""
    from essentials_rd.algorithms import scc_coloring
    from essentials_rd.reference_impl import scc_ref

    rng = np.random.default_rng(11)
    n, m = 60, 150
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(src[keep] * np.int64(n) + dst[keep])
    src, dst = pairs // n, pairs % n
    vids = np.arange(n, dtype=np.int64)
    g = _scc_graph(tmp_path, src, dst, vids, P=P)
    tbl, _ = scc_coloring(g)
    assert np.array_equal(np.asarray(tbl["scc"]), scc_ref(vids, src, dst))


def _longest_path_dp(n, src, dst, cap):
    """NumPy DP over the low→high topological order."""
    depth = np.zeros(n, np.int64)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    for u in range(n):  # vertex ids ARE a topological order (src < dst)
        m = s == u
        if m.any():
            np.maximum.at(depth, d[m], depth[u] + 1)
    return np.minimum(depth, cap)


def test_longest_path_dag_matches_dp_and_cap(tmp_path):
    from essentials_rd.algorithms import depth_table, longest_path

    src, dst = _random_edges(n=50, m=220, seed=23)
    src, dst = _canon(src, dst)  # low→high: a DAG by construction
    n = 50
    vids = np.arange(n, dtype=np.int64)
    g = small_graph(tmp_path / "a", src, dst, P=3, symmetrize=False,
                    vertex_ids=vids, persist=False)
    res = longest_path(g, checkpoint_every=0, scatter_mode="fused")
    assert res.converged
    got = np.asarray(depth_table(res)["depth"], np.int64)
    want = _longest_path_dp(n, src, dst, cap=1 << 30)
    assert got.tolist() == want.tolist()

    # capped run: depth_K = min(longest, K) exactly
    K = 3
    res_c = longest_path(g, max_iters=K, checkpoint_every=0,
                         scatter_mode="fused")
    got_c = np.asarray(depth_table(res_c)["depth"], np.int64)
    assert got_c.tolist() == np.minimum(want, K).tolist()


def _greedy_matching_ref(src, dst):
    """Sequential greedy by ascending (priority, src, dst) — the
    lexicographically-first matching the parallel local-minima rounds
    must reproduce exactly."""
    from essentials_rd.algorithms.matching import _pri

    p = _pri(src, dst)
    order = np.lexsort((dst, src, p))
    used = set()
    out = []
    for i in order:
        a, b = int(src[i]), int(dst[i])
        if a not in used and b not in used:
            used.add(a)
            used.add(b)
            out.append((a, b))
    return sorted(out)


def test_maximal_matching_equals_greedy_and_is_maximal():
    from essentials_rd.algorithms import maximal_matching

    src, dst = _random_edges(n=80, m=400, seed=31)
    src, dst = _canon(src, dst)
    want = _greedy_matching_ref(src, dst)

    for parts in (1, 6):
        t, rounds, converged = maximal_matching(
            edges_ds(src, dst).repartition(parts))
        assert converged and rounds >= 1
        got = sorted(zip(np.asarray(t["src"]).tolist(),
                         np.asarray(t["dst"]).tolist()))
        assert got == want, f"parts={parts}"

    # matching: no vertex twice; maximal: every edge touches a match
    flat = [v for e in want for v in e]
    assert len(flat) == len(set(flat))
    mset = set(flat)
    assert all(a in mset or b in mset for a, b in zip(src, dst))


def test_sweep_profile_matches_bruteforce_and_layout_invariant():
    """sweep_profile's (cut, vol) prefix columns equal a per-k
    brute-force over the edge list, at any block layout, including
    unranked endpoints and rank gaps."""
    import numpy as np

    from essentials_rd.algorithms.sweep import sweep_profile
    from tests.conftest import edges_ds

    src, dst = _random_edges(n=60, m=240, seed=47)
    src, dst = _canon(src, dst)
    rng = np.random.default_rng(5)
    verts = np.unique(np.r_[src, dst])
    ranked = rng.choice(verts, size=20, replace=False).astype(np.int64)
    deg = np.zeros(verts.max() + 1, np.int64)
    np.add.at(deg, src, 1)
    np.add.at(deg, dst, 1)
    for parts in (1, 7):
        out = sweep_profile(edges_ds(src, dst).repartition(parts),
                            ranked, deg[ranked]).to_pandas()
        assert list(out.k) == list(range(1, 21))
        assert list(out.vid) == list(ranked)
        for k in (1, 5, 20):
            inset = set(ranked[:k].tolist())
            cut = sum((int(a) in inset) != (int(b) in inset)
                      for a, b in zip(src, dst))
            vol = int(deg[ranked[:k]].sum())
            row = out[out.k == k].iloc[0]
            assert (row.cut_k, row.vol_k) == (cut, vol), k


def test_katz_matches_dense_reference_and_partition_invariant():
    """Integer Katz walk sums equal the dense y_{k+1} = A^{k+1} + Ay_k
    recurrence at any partition count."""
    import numpy as np

    from essentials_rd.algorithms.katz import katz, katz_table
    from essentials_rd.graph import build_graph
    from tests.conftest import edges_ds

    src, dst = _random_edges(n=50, m=200, seed=23)
    src, dst = _canon(src, dst)
    verts = np.unique(np.r_[src, dst])
    idx = {int(v): i for i, v in enumerate(verts)}
    adj = np.zeros((len(verts), len(verts)), np.int64)
    for a, b in zip(src, dst):
        adj[idx[int(a)], idx[int(b)]] = 1
        adj[idx[int(b)], idx[int(a)]] = 1
    y = np.ones(len(verts), np.int64)
    for k in range(4):
        y = 4 ** (k + 1) + adj @ y
    for parts in (1, 5):
        g = build_graph(edges_ds(src, dst).repartition(max(parts, 1)),
                        f"/tmp/katz_test_{parts}", num_parts=parts,
                        symmetrize=True, persist=False)
        t = katz_table(katz(g, a_int=4, k_iters=4))
        got = dict(zip(t["vid"].to_pylist(), t["katz_num"].to_pylist()))
        want = {int(v): int(y[idx[int(v)]]) for v in verts}
        assert got == want


def test_fastrp_matches_dense_reference_and_partition_invariant():
    """Multi-channel FastRP equals the dense A^K R recurrence with the
    same splitmix projection, at any partition count."""
    import numpy as np

    from essentials_rd.algorithms.fastrp import (_proj_row, fastrp,
                                                 fastrp_table)
    from essentials_rd.graph import build_graph
    from tests.conftest import edges_ds

    src, dst = _random_edges(n=40, m=150, seed=61)
    src, dst = _canon(src, dst)
    verts = np.unique(np.r_[src, dst])
    idx = {int(v): i for i, v in enumerate(verts)}
    adj = np.zeros((len(verts), len(verts)), np.int64)
    for a, b in zip(src, dst):
        adj[idx[int(a)], idx[int(b)]] = 1
        adj[idx[int(b)], idx[int(a)]] = 1
    d, K = 4, 2
    X = np.stack([_proj_row(verts.astype(np.int64), j)
                  for j in range(d)], axis=1).astype(np.int64)
    for _ in range(K):
        X = adj @ X
    for parts in (1, 5):
        g = build_graph(edges_ds(src, dst).repartition(parts),
                        f"/tmp/fastrp_test_{parts}", num_parts=parts,
                        symmetrize=True, persist=False)
        t = fastrp_table(fastrp(g, d=d, k_iters=K), d=d)
        got = {}
        for v, dim, val in zip(t["vid"].to_pylist(),
                               t["dim"].to_pylist(),
                               t["val"].to_pylist()):
            got[(v, dim)] = val
        for v in verts:
            for j in range(d):
                assert got[(int(v), j)] == int(X[idx[int(v)], j]), (v, j)


def test_squares_total_matches_bruteforce_and_cap_counts():
    """Wedge-pair square count equals the O(n^4-ish) brute force on a
    random graph at any layout; the capped variant reports skipped
    centers."""
    import itertools

    import numpy as np

    from essentials_rd.algorithms.squares import squares_total
    from tests.conftest import edges_ds

    src, dst = _random_edges(n=24, m=70, seed=67)
    src, dst = _canon(src, dst)
    eset = set(zip(src.tolist(), dst.tolist()))

    def adj(a, b):
        return (min(a, b), max(a, b)) in eset

    verts = sorted(set(src.tolist()) | set(dst.tolist()))
    n_sq = 0
    for quad in itertools.combinations(verts, 4):
        # count distinct 4-cycles on these 4 vertices (3 pairings)
        a, b, c, d = quad
        for cyc in ((a, b, c, d), (a, c, b, d), (a, b, d, c)):
            w, x, y, z = cyc
            if adj(w, x) and adj(x, y) and adj(y, z) and adj(z, w):
                n_sq += 1
    for parts in (1, 5):
        out = squares_total(edges_ds(src, dst).repartition(parts))
        assert out.column("squares").to_pylist() == [n_sq]
    capped = squares_total(edges_ds(src, dst), max_degree=3)
    assert "skipped_centers" in capped.schema.names
    degs = {}
    for a, b in eset:
        degs[a] = degs.get(a, 0) + 1
        degs[b] = degs.get(b, 0) + 1
    assert capped.column("skipped_centers").to_pylist() == [
        sum(1 for v in degs.values() if v > 3)]


def test_k4_census_matches_bruteforce_with_planted_k5():
    import itertools

    from essentials_rd.algorithms.kclique import k4_total

    rng = np.random.default_rng(5)
    n = 60
    edges = set()
    for _ in range(500):
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    # planted K5 contributes C(5,4)=5 cliques
    for c in itertools.combinations([50, 51, 52, 53, 54], 2):
        edges.add(c)
    E = sorted(edges)
    adj = {v: set() for v in range(n)}
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(1 for a, b, c in itertools.combinations(range(n), 3)
              if b in adj[a] and c in adj[a] and c in adj[b])
    k4 = sum(1 for q in itertools.combinations(range(n), 4)
             if all(y in adj[x] for x, y in itertools.combinations(q, 2)))
    t = pa.table({"src": pa.array([a for a, _ in E], pa.int64()),
                  "dst": pa.array([b for _, b in E], pa.int64())})
    for parts in (1, 4):
        got = k4_total(rd.from_arrow(t).repartition(parts), num_buckets=8)
        assert got["triangles"][0].as_py() == tri
        assert got["k4"][0].as_py() == k4


def test_k4_zero_on_triangle_free_graph():
    from essentials_rd.algorithms.kclique import k4_total

    # a path graph has no triangles, hence no K4
    t = pa.table({"src": pa.array(list(range(10)), pa.int64()),
                  "dst": pa.array(list(range(1, 11)), pa.int64())})
    got = k4_total(rd.from_arrow(t), num_buckets=4)
    assert got["triangles"][0].as_py() == 0
    assert got["k4"][0].as_py() == 0


def test_pagerank_q30_wire_matches_reference_1e6(tmp_path):
    """int32 fixed-point wire (wire="q30", the bench's low-byte message
    path): converged scores must stay inside the north-star's
    allclose-1e-6 validator vs the CPU reference AND within ~1e-8 of
    the f64-wire engine run (quantization error 2^-31 per message,
    amplified at most alpha/(1-alpha) by the contraction)."""
    src, dst = _random_edges(n=30, m=70, seed=11)
    vids = np.arange(30, dtype=np.int64)
    g = small_graph(tmp_path, src, dst, P=2, symmetrize=False, vertex_ids=vids)
    rq = pagerank(g, alpha=0.6, tol=1e-8, max_iters=100, checkpoint_every=0,
                  scatter_mode="fused", wire="q30")
    rf = pagerank(g, alpha=0.6, tol=1e-8, max_iters=100, checkpoint_every=0,
                  scatter_mode="fused")
    assert rq.converged
    vq = np.asarray(pagerank_table(rq)["pagerank"])
    vf = np.asarray(pagerank_table(rf)["pagerank"])
    p_ref = pagerank_ref(vids, src, dst, alpha=0.6, tol=1e-12, max_iters=1000)
    assert np.allclose(vq, p_ref, atol=1e-6)
    assert np.abs(vq - vf).max() < 1e-7
    assert abs(vq.sum() - 1.0) < 1e-6


def test_bipartite_parity_masks(tmp_path):
    """Planted components: an even cycle (bipartite), an odd cycle
    (not), a path (bipartite), an isolated-ish edge — parity masks
    from each component's min vid must flag exactly the odd cycle."""
    from essentials_rd.algorithms import connected_components
    from essentials_rd.algorithms.bipartite import parity_masks
    from essentials_rd.algorithms.cc import components_table

    edges = []
    # even 6-cycle on 0..5
    for i in range(6):
        edges.append((i, (i + 1) % 6))
    # odd 5-cycle on 10..14
    for i in range(5):
        edges.append((10 + i, 10 + (i + 1) % 5))
    # path 20-21-22-23
    edges += [(20, 21), (21, 22), (22, 23)]
    # triangle with a tail: 30-31-32-30, 32-33 (odd)
    edges += [(30, 31), (31, 32), (32, 30), (32, 33)]
    src = np.array([a for a, _ in edges], np.int64)
    dst = np.array([b for _, b in edges], np.int64)
    g = small_graph(tmp_path, src, dst, P=3, symmetrize=True)

    cc = connected_components(g, max_iters=50, checkpoint_every=0)
    assert cc.converged
    t = components_table(cc)
    label = dict(zip(np.asarray(t["vid"]).tolist(),
                     np.asarray(t["label"]).tolist()))
    roots = sorted(set(label.values()))

    par = parity_masks(g, np.asarray(roots, np.int64), max_iters=50,
                       checkpoint_every=0)
    assert par.converged
    st = par.state_table(["seen"])
    seen = dict(zip(np.asarray(st["vid"]).tolist(),
                    np.asarray(st["seen"]).tolist()))

    odd_by_comp = {}
    for v, lb in label.items():
        odd_by_comp[lb] = max(odd_by_comp.get(lb, 0),
                              1 if seen[v] == 3 else 0)
    assert odd_by_comp[0] == 0     # even cycle
    assert odd_by_comp[10] == 1    # odd cycle
    assert odd_by_comp[20] == 0    # path
    assert odd_by_comp[30] == 1    # triangle + tail
    # every vertex got at least one parity
    assert all(s in (1, 2, 3) for s in seen.values())
