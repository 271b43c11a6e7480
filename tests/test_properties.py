"""Property-based tests (SURVEY.md §5.2 item 4, hypothesis): PR sums to
1, CC labels are fixpoint-stable and component-minimal, TC invariant
under edge permutation — on the NumPy validators (fast), plus a bounded
number of engine-in-the-loop examples (Ray runs are expensive)."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from essentials_rd.reference_impl import cc_ref, pagerank_ref, triangles_ref

EDGE = st.tuples(st.integers(0, 23), st.integers(0, 23))


@st.composite
def edge_lists(draw, max_edges=60):
    edges = draw(st.lists(EDGE, min_size=0, max_size=max_edges))
    e = np.array([(a, b) for a, b in edges if a != b], dtype=np.int64).reshape(-1, 2)
    return e


@given(edge_lists())
@settings(max_examples=60, deadline=None)
def test_pagerank_sums_to_one(e):
    vids = np.unique(np.r_[e.ravel(), [0]])
    p = pagerank_ref(vids, e[:, 0], e[:, 1], tol=1e-12, max_iters=500)
    assert abs(p.sum() - 1.0) < 1e-9
    assert (p > 0).all()


@given(edge_lists())
@settings(max_examples=60, deadline=None)
def test_cc_labels_minimal_and_consistent(e):
    vids = np.unique(np.r_[e.ravel(), [0, 1]])
    labels = cc_ref(vids, e[:, 0], e[:, 1])
    lab = dict(zip(vids.tolist(), labels.tolist()))
    # every edge joins equal labels; every label is the min vid of its class
    for a, b in e.tolist():
        assert lab[a] == lab[b]
    for l in set(lab.values()):
        members = [v for v, x in lab.items() if x == l]
        assert min(members) == l


@given(edge_lists(), st.randoms(use_true_random=False))
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_triangles_invariant_under_permutation(e, rnd):
    if len(e) == 0:
        return
    vids = np.unique(e.ravel())
    t1, _ = triangles_ref(vids, e[:, 0], e[:, 1])
    perm = list(range(len(e)))
    rnd.shuffle(perm)
    e2 = e[perm]
    # also flip random edge directions (undirected invariance)
    flip = np.array([rnd.random() < 0.5 for _ in range(len(e2))])
    s = np.where(flip, e2[:, 1], e2[:, 0])
    d = np.where(flip, e2[:, 0], e2[:, 1])
    t2, _ = triangles_ref(vids, s, d)
    assert t1 == t2


@pytest.mark.slow
def test_engine_matches_reference_on_random_graphs(tmp_path):
    """Engine vs validators on a handful of random graphs (bounded: each
    engine run costs seconds)."""
    from essentials_rd.algorithms import connected_components, pagerank
    from essentials_rd.algorithms.cc import components_table
    from essentials_rd.algorithms.pagerank import pagerank_table

    from .conftest import small_graph

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 40))
        m = int(rng.integers(0, 4 * n))
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        # engine input contract: canonical deduped undirected pairs
        # (what derive_edges produces)
        pairs0 = np.unique(np.minimum(src, dst) * np.int64(n) + np.maximum(src, dst))
        src, dst = pairs0 // n, pairs0 % n
        vids = np.arange(n, dtype=np.int64)
        g = small_graph(tmp_path / f"g{seed}", src, dst, P=3, vertex_ids=vids,
                        symmetrize=True)
        res = pagerank(g, tol=0.0, max_iters=4, checkpoint_every=0,
                       scatter_mode="fused")
        t = pagerank_table(res)
        # reference on the symmetrized simple graph
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        pairs = np.unique(lo * np.int64(n) + hi)
        uu, vv = pairs // n, pairs % n
        s2 = np.r_[uu, vv]
        d2 = np.r_[vv, uu]
        p_ref = pagerank_ref(vids, s2, d2, max_iters=4, tol=0.0)
        assert np.allclose(np.asarray(t["pagerank"]), p_ref, atol=1e-12)

        res_cc = connected_components(g, checkpoint_every=0, scatter_mode="fused")
        tcc = components_table(res_cc)
        assert np.asarray(tcc["label"]).tolist() == cc_ref(vids, s2, d2).tolist()


@pytest.mark.slow
def test_results_invariant_under_partition_count(tmp_path):
    """The partitioning parameter P must not change results: integer
    algorithms (CC, BFS, k-core) are bit-exact across P (min/count of
    ints is order-free); PageRank floats agree to 1e-12 (float partial
    sums regroup with P, so bit-identity is only guaranteed within one
    config — the resume tests pin that)."""
    from essentials_rd.algorithms import bfs, connected_components, kcore, pagerank
    from essentials_rd.algorithms.bfs import depths_table
    from essentials_rd.algorithms.cc import components_table
    from essentials_rd.algorithms.kcore import kcore_table
    from essentials_rd.algorithms.pagerank import pagerank_table

    from .conftest import small_graph

    rng = np.random.default_rng(13)
    n, m = 50, 260
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(
        np.minimum(src[keep], dst[keep]) * np.int64(n)
        + np.maximum(src[keep], dst[keep])
    )
    src, dst = pairs // n, pairs % n
    vids = np.arange(n, dtype=np.int64)

    out = {}
    for P in (2, 5):
        g = small_graph(tmp_path / f"p{P}", src, dst, P=P, vertex_ids=vids,
                        symmetrize=True)
        source = int(vids[0])
        out[P] = {
            "pr": np.asarray(pagerank_table(
                pagerank(g, tol=0.0, max_iters=6, checkpoint_every=0,
                         scatter_mode="fused"))["pagerank"]),
            "cc": np.asarray(components_table(
                connected_components(g, checkpoint_every=0,
                                     scatter_mode="fused"))["label"]),
            "bfs": np.asarray(depths_table(
                bfs(g, source, checkpoint_every=0,
                    scatter_mode="fused"))["depth"]),
            "kcore": np.asarray(kcore_table(
                kcore(g, 3, checkpoint_every=0,
                      scatter_mode="fused"))["in_core"]),
        }
    assert np.allclose(out[2]["pr"], out[5]["pr"], atol=1e-12)
    for key in ("cc", "bfs", "kcore"):
        assert np.array_equal(out[2][key], out[5][key]), key


def _lev(a: str, b: str) -> int:
    """Textbook DP Levenshtein (the spec for _edit1_verify)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(st.lists(st.text(alphabet="abcx", min_size=0, max_size=9),
                min_size=2, max_size=12))
@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_edit1_verify_matches_dp_levenshtein(strs):
    import numpy as np

    from essentials_rd.textops import _codes_and_lens, _edit1_verify

    codes, lens = _codes_and_lens(strs, 16)
    n = len(strs)
    ia, ib = np.triu_indices(n, k=1)
    ok, dist = _edit1_verify(codes, lens,
                             ia.astype(np.int64), ib.astype(np.int64))
    for t, (i, j) in enumerate(zip(ia, ib)):
        want = _lev(strs[i], strs[j])
        assert bool(ok[t]) == (want <= 1), (strs[i], strs[j], want)
        if ok[t]:
            assert dist[t] == want, (strs[i], strs[j])


@given(st.lists(st.text(alphabet="ab", min_size=0, max_size=7),
                min_size=1, max_size=8))
@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_deletion_neighborhood_blocking_is_lossless(strs):
    """FastSS k=1 recall-1.0 claim: any pair at distance ≤ 1 MUST
    share a variant hash."""
    import numpy as np

    from essentials_rd.textops import _codes_and_lens, \
        _deletion_variant_hashes

    codes, lens = _codes_and_lens(strs, 16)
    rows, vh = _deletion_variant_hashes(codes, lens)
    per = {}
    for r, h in zip(rows, vh):
        per.setdefault(int(r), set()).add(int(h))
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            if _lev(strs[i], strs[j]) <= 1:
                assert per.get(i, set()) & per.get(j, set()), (
                    strs[i], strs[j])


@given(st.integers(1, 100), st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([1, 3]), st.integers(0, 3),
       st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_contract_property(q, h, w, c, ri, seed):
    """For ANY size/quality/mode/restart-interval: decode(encode(img))
    must equal the encoder's expected reconstruction bit-for-bit, with
    the original shape and dtype."""
    from essentials_rd.jpegc import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w) if c == 1 else (h, w, c)).astype(
        np.uint8)
    sub = "420" if (c == 3 and seed % 2) else "444"
    buf, expected = encode_jpeg(img, quality=q, subsampling=sub,
                                restart_interval=ri)
    got = decode_jpeg(buf)
    assert got.shape == img.shape and got.dtype == np.uint8
    assert np.array_equal(got, expected)


@given(st.lists(st.floats(min_value=0.0, max_value=1.0,
                          allow_nan=False), min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_q30_quantization_bound(vals):
    """The q30 wire's per-message quantization error is ≤ 2^-31 and
    int sums reproduce the quantized total exactly."""
    x = np.asarray(vals, np.float64)
    q = np.rint(x * float(1 << 30)).astype(np.int64)
    back = q * 2.0 ** -30
    assert np.abs(back - x).max() <= 2.0 ** -31 + 1e-15
    assert int(q.sum()) == sum(int(v) for v in q)  # exact int addition


@given(st.lists(st.integers(0, 30), min_size=2, max_size=80),
       st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_pettitt_identities(xs, _seed):
    """The 2-D-prefix computation of U_t equals the O(n^2) definition
    on arbitrary integer series."""
    x = np.asarray(xs, np.int64)
    n = len(x)
    sg = np.sign(x[None, :] - x[:, None]).astype(np.int64)
    c = np.cumsum(sg, axis=1)
    a = np.cumsum(c[:, n - 1])
    d = np.cumsum(c, axis=0)
    ts = np.arange(n - 1)
    u_fast = a[ts] - d[ts, ts]
    u_brute = np.array([
        sum(np.sign(x[j] - x[i]) for i in range(t + 1)
            for j in range(t + 1, n))
        for t in range(n - 1)
    ], np.int64)
    assert np.array_equal(u_fast, u_brute)
