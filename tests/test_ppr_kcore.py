"""PPR + k-core VertexPrograms vs their CPU reference validators."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from essentials_rd.graph import build_graph
from essentials_rd.reference_impl import eigencentrality_ref, kcore_ref, ppr_ref
from essentials_rd.util import np_col


def _dedup_edges(n=80, m=400, seed=5):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep])
    hi = np.maximum(src[keep], dst[keep])
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def _ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def test_ppr_matches_cpu_reference(tmp_path):
    src, dst = _dedup_edges()
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    from essentials_rd.algorithms import ppr
    from essentials_rd.algorithms.ppr import ppr_table

    vids = ray.get(g.vertex_ids_ref)
    source = int(vids[3])
    res = ppr(g, source, tol=0.0, max_iters=12, checkpoint_every=0)
    t = ppr_table(res)
    sym_s, sym_d = np.r_[src, dst], np.r_[dst, src]
    ref = ppr_ref(vids, sym_s, sym_d, source, max_iters=12, tol=0.0)
    assert np.allclose(np.asarray(t["ppr"]), ref, atol=1e-9)
    # a PPR vector is a probability distribution (mass conservation)
    assert abs(np.asarray(t["ppr"]).sum() - 1.0) < 1e-9


def test_ppr_converges_and_localizes(tmp_path):
    src, dst = _dedup_edges(seed=11)
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    from essentials_rd.algorithms import ppr
    from essentials_rd.algorithms.ppr import ppr_table

    vids = ray.get(g.vertex_ids_ref)
    source = int(vids[0])
    res = ppr(g, source, tol=1e-10, checkpoint_every=0)
    assert res.converged
    t = ppr_table(res)
    scores = np.asarray(t["ppr"])
    # the seed holds the maximum personalized score
    assert int(np.asarray(t["vid"])[np.argmax(scores)]) == source


def test_kcore_matches_cpu_reference(tmp_path):
    src, dst = _dedup_edges(seed=7)
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    from essentials_rd.algorithms import kcore
    from essentials_rd.algorithms.kcore import kcore_table

    vids = ray.get(g.vertex_ids_ref)
    sym_s, sym_d = np.r_[src, dst], np.r_[dst, src]
    for k in (2, 3, 4):
        res = kcore(g, k, checkpoint_every=0)
        assert res.converged
        t = kcore_table(res)
        ref = kcore_ref(vids, sym_s, sym_d, k)
        assert np.array_equal(np.asarray(t["in_core"]), ref), f"k={k}"
    # monotonicity: the 4-core is contained in the 2-core
    in2 = kcore_ref(vids, sym_s, sym_d, 2)
    in4 = kcore_ref(vids, sym_s, sym_d, 4)
    assert np.all(in4 <= in2)


def test_spgemm_matches_dense_numpy(tmp_path):
    from essentials_rd.algorithms import spgemm

    rng = np.random.default_rng(21)
    n = 30
    m = 140
    def _mat(seed):
        r = np.random.default_rng(seed)
        s, d = r.integers(0, n, m), r.integers(0, n, m)
        w = r.integers(1, 5, m).astype(np.float64)
        # collapse duplicates like a real COO table
        key = s * n + d
        uk, inv = np.unique(key, return_inverse=True)
        ww = np.bincount(inv, weights=w)
        return uk // n, uk % n, ww
    sa, da, wa = _mat(1)
    sb, db, wb = _mat(2)
    A = np.zeros((n, n)); A[sa, da] = wa
    B = np.zeros((n, n)); B[sb, db] = wb
    ref = A @ B
    ds_a = rd.from_arrow(pa.table({"src": pa.array(sa, pa.int64()),
                                   "dst": pa.array(da, pa.int64()),
                                   "weight": pa.array(wa, pa.float64())}))
    ds_b = rd.from_arrow(pa.table({"src": pa.array(sb, pa.int64()),
                                   "dst": pa.array(db, pa.int64()),
                                   "weight": pa.array(wb, pa.float64())}))
    out = spgemm(ds_a, ds_b, num_buckets=4).take_all()
    got = np.zeros((n, n))
    for r_ in out:
        got[r_["src"], r_["dst"]] = r_["weight"]
    assert np.allclose(got, ref)


def test_eigencentrality_matches_cpu_reference(tmp_path):
    src, dst = _dedup_edges(seed=17)
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    from essentials_rd.algorithms import eigencentrality
    from essentials_rd.algorithms.eigencentrality import centrality_table

    vids = ray.get(g.vertex_ids_ref)
    res = eigencentrality(g, tol=0.0, max_iters=10, checkpoint_every=0)
    t = centrality_table(res)
    sym_s, sym_d = np.r_[src, dst], np.r_[dst, src]
    ref = eigencentrality_ref(vids, sym_s, sym_d, max_iters=10, tol=0.0)
    got = np.asarray(t["centrality"])
    assert np.allclose(got, ref, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9  # L1-normalized every step


def test_coloring_matches_reference_and_is_proper(tmp_path):
    from essentials_rd.reference_impl import color_ref

    src, dst = _dedup_edges(seed=23)
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    from essentials_rd.algorithms import color
    from essentials_rd.algorithms.color import colors_table

    vids = ray.get(g.vertex_ids_ref)
    res = color(g, checkpoint_every=0)
    assert res.converged
    t = colors_table(res)
    got = np.asarray(t["color"])
    sym_s, sym_d = np.r_[src, dst], np.r_[dst, src]
    ref = color_ref(vids, sym_s, sym_d)
    assert np.array_equal(got, ref)
    # proper coloring: no edge joins two same-colored vertices
    pos_s = np.searchsorted(vids, src)
    pos_d = np.searchsorted(vids, dst)
    assert (got[pos_s] != got[pos_d]).all()
    assert (got >= 0).all()


def test_boruvka_msf_matches_kruskal(tmp_path):
    from essentials_rd.algorithms import boruvka_msf
    from essentials_rd.reference_impl import msf_ref

    for seed in (3, 9, 27):
        rng = np.random.default_rng(seed)
        n, m = 70, 300
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        keep = src != dst
        lo = np.minimum(src[keep], dst[keep])
        hi = np.maximum(src[keep], dst[keep])
        pairs = np.unique(lo * np.int64(n) + hi)
        s, d = pairs // n, pairs % n
        w = rng.integers(1, 40, len(s)).astype(np.float64)  # ties likely
        vids = np.arange(n, dtype=np.int64)
        ds = rd.from_arrow(pa.table({
            "src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64()),
            "weight": pa.array(w, pa.float64())})).repartition(5)
        tbl, total = boruvka_msf(ds, vids)
        rs, rd_, rw = msf_ref(vids, s, d, w)
        assert np.array_equal(np_col(tbl, "src"), rs), seed
        assert np.array_equal(np_col(tbl, "dst"), rd_), seed
        assert np.allclose(np_col(tbl, "weight"), rw), seed
        assert abs(total - rw.sum()) < 1e-9


def test_geo_matches_cpu_reference(tmp_path):
    from essentials_rd.algorithms import geo
    from essentials_rd.algorithms.geo import locations_table
    from essentials_rd.reference_impl import geo_ref

    src, dst = _dedup_edges(seed=31)
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    vids = ray.get(g.vertex_ids_ref)
    seeds = vids[vids % 7 == 0]
    slat = (seeds % 180).astype(np.float64)
    slon = (seeds % 360).astype(np.float64)
    res = geo(g, seeds, slat, slon, checkpoint_every=0)
    assert res.converged
    t = locations_table(res)
    sym_s, sym_d = np.r_[src, dst], np.r_[dst, src]
    rlat, rlon = geo_ref(vids, sym_s, sym_d, seeds, slat, slon)
    # later-round means average non-integer earlier means, so summation
    # order costs ulps — allclose, with the located mask exact
    assert np.array_equal(np.asarray(t["lat"]) < 0, rlat < 0)
    assert np.allclose(np.asarray(t["lat"]), rlat, atol=1e-9)
    assert np.allclose(np.asarray(t["lon"]), rlon, atol=1e-9)
    # every vertex connected to a seed is located
    assert (np.asarray(t["lat"]) >= 0).sum() >= len(seeds)


def test_betweenness_matches_cpu_reference(tmp_path):
    from essentials_rd.algorithms import betweenness
    from essentials_rd.reference_impl import betweenness_ref

    src, dst = _dedup_edges(seed=41)
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    vids = ray.get(g.vertex_ids_ref)
    sources = np.sort(vids)[:2]
    t = betweenness(g, sources, scatter_mode="fused")
    sym_s, sym_d = np.r_[src, dst], np.r_[dst, src]
    ref = betweenness_ref(vids, sym_s, sym_d, sources)
    assert np.allclose(np.asarray(t["bc"]), ref, atol=1e-9)
    assert (np.asarray(t["bc"]) >= -1e-12).all()


def test_harmonic_matches_cpu_reference(tmp_path):
    from essentials_rd.algorithms import harmonic, harmonic_table
    from essentials_rd.reference_impl import harmonic_ref

    src, dst = _dedup_edges(seed=47)
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    vids = ray.get(g.vertex_ids_ref)
    sources = np.sort(vids)[:5]
    res = harmonic(g, sources, max_iters=8, checkpoint_every=0,
                   scatter_mode="fused")
    t = harmonic_table(res)
    sym_s, sym_d = np.r_[src, dst], np.r_[dst, src]
    ref = harmonic_ref(vids, sym_s, sym_d, sources, max_depth=8)
    # per-round sums are popcount/r — integer ratios, exact in float64
    assert np.allclose(np.asarray(t["harmonic"]), ref, atol=1e-12)
    # sources never count themselves (their own bit is set at depth 0)
    assert res.converged


def test_harmonic_depth_cap_truncates(tmp_path):
    from essentials_rd.algorithms import harmonic, harmonic_table
    from essentials_rd.reference_impl import harmonic_ref

    # path 0-1-2-3-4-5: from source 0, depth cap 2 reaches only 1, 2
    src = np.array([0, 1, 2, 3, 4], np.int64)
    dst = np.array([1, 2, 3, 4, 5], np.int64)
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 2, symmetrize=True)
    res = harmonic(g, [0], max_iters=2, checkpoint_every=0)
    t = harmonic_table(res)
    vids = np.asarray(t["vid"])
    ref = harmonic_ref(vids, np.r_[src, dst], np.r_[dst, src],
                       np.array([0]), max_depth=2)
    assert np.allclose(np.asarray(t["harmonic"]), ref)
    assert np.asarray(t["harmonic"]).tolist() == [0.0, 1.0, 0.5, 0.0, 0.0, 0.0]
    assert not res.converged  # truncated before the frontier died


def test_coreness_matches_bruteforce_decomposition(tmp_path):
    from essentials_rd.algorithms import coreness
    from essentials_rd.reference_impl import kcore_ref

    src, dst = _dedup_edges(n=60, m=500, seed=13)
    g = build_graph(_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    cap = 6
    t = coreness(g, cap, max_rounds_per_k=64, scatter_mode="fused")
    vids = np.asarray(t["vid"], np.int64)
    sym_s, sym_d = np.r_[src, dst], np.r_[dst, src]
    # brute-force capped core number: exact classic peel per k
    want = np.zeros(len(vids), np.int64)
    for k in range(1, cap + 1):
        want += kcore_ref(vids, sym_s, sym_d, k)
    assert np.asarray(t["core"], np.int64).tolist() == want.tolist()
    # the decomposition refines plain k-core membership
    assert (np.asarray(t["core"]) >= 0).all()
    assert np.asarray(t["core"]).max() <= cap


def test_vertex_cover_covers_and_2approx(tmp_path):
    import itertools

    import numpy as np

    from essentials_rd.algorithms.matching import (
        maximal_matching,
        vertex_cover_2approx,
    )

    from .conftest import edges_ds

    rng = np.random.default_rng(13)
    src = rng.integers(0, 14, 30).astype(np.int64)
    dst = rng.integers(0, 14, 30).astype(np.int64)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep])
    hi = np.maximum(src[keep], dst[keep])
    pairs = np.unique(lo * 14 + hi)
    lo, hi = pairs // 14, pairs % 14
    cover = set(np.asarray(
        vertex_cover_2approx(edges_ds(lo, hi))["vid"]).tolist())
    # validity: every edge has an endpoint in the cover
    assert all(int(a) in cover or int(b) in cover
               for a, b in zip(lo, hi))
    # Gavril bound: |cover| == 2|M| <= 2 OPT; check vs brute-force OPT
    m, _, _ = maximal_matching(edges_ds(lo, hi))
    assert len(cover) == 2 * m.num_rows
    verts = sorted(set(lo.tolist()) | set(hi.tolist()))
    opt = None
    for k in range(1, len(verts) + 1):
        for comb in itertools.combinations(verts, k):
            s = set(comb)
            if all(a in s or b in s for a, b in zip(lo, hi)):
                opt = k
                break
        if opt:
            break
    assert len(cover) <= 2 * opt
