"""Round-2 additions: BFS/SSSP programs, deterministic sampling, the
batch API, exact similarity join, near-dup clusters via the CC engine."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from essentials_rd.graph import build_graph
from essentials_rd.ops import deterministic_sample, run_batch
from essentials_rd.reference_impl import bfs_ref, sssp_ref
from essentials_rd.util import np_col


def _edge_ds(src, dst, weight=None):
    cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    if weight is not None:
        cols["weight"] = pa.array(weight, pa.float64())
    return rd.from_arrow(pa.table(cols))


def _random_edges(n=60, m=240, seed=3, weighted=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.uniform(0.1, 5.0, len(src)) if weighted else None
    return src, dst, w


def test_bfs_matches_cpu_reference(tmp_path):
    src, dst, _ = _random_edges()
    g = build_graph(_edge_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    from essentials_rd.algorithms import bfs
    from essentials_rd.algorithms.bfs import depths_table

    vids = ray.get(g.vertex_ids_ref)
    source = int(vids[0])
    res = bfs(g, source, checkpoint_every=0)
    assert res.converged
    t = depths_table(res)
    sym_src = np.r_[src, dst]
    sym_dst = np.r_[dst, src]
    ref = bfs_ref(vids, sym_src, sym_dst, source)
    assert np.array_equal(np.asarray(t["depth"]), ref)


def test_sssp_matches_cpu_reference(tmp_path):
    src, dst, w = _random_edges(weighted=True)
    g = build_graph(
        _edge_ds(src, dst, w), str(tmp_path / "g"), 4,
        symmetrize=False, weighted=True,
    )
    from essentials_rd.algorithms import sssp
    from essentials_rd.algorithms.sssp import distances_table

    vids = ray.get(g.vertex_ids_ref)
    source = int(vids[0])
    res = sssp(g, source, checkpoint_every=0)
    assert res.converged
    t = distances_table(res)
    ref = sssp_ref(vids, src, dst, w, source)
    got = np.asarray(t["dist"])
    both_inf = np.isinf(ref) & np.isinf(got)
    assert np.all(both_inf | np.isclose(ref, got, atol=1e-9))


def test_deterministic_sample_is_stable_and_sized():
    n = 20_000
    ds = rd.from_arrow(pa.table({"k": pa.array(np.arange(n), pa.int64())}))
    s1 = deterministic_sample(ds, 0.1, lambda b: np_col(b, "k"), seed=7)
    s2 = deterministic_sample(
        ds.repartition(13), 0.1, lambda b: np_col(b, "k"), seed=7
    )
    k1 = sorted(r["k"] for r in s1.take_all())
    k2 = sorted(r["k"] for r in s2.take_all())
    assert k1 == k2  # block layout must not change the sample
    assert 0.07 * n < len(k1) < 0.13 * n
    s3 = deterministic_sample(ds, 0.1, lambda b: np_col(b, "k"), seed=8)
    assert sorted(r["k"] for r in s3.take_all()) != k1  # seed matters


def test_run_batch_concurrent_problems(tmp_path):
    src, dst, _ = _random_edges()
    g = build_graph(_edge_ds(src, dst), str(tmp_path / "g"), 4, symmetrize=True)
    from essentials_rd.algorithms import connected_components, pagerank

    out = run_batch(
        {
            "pr": lambda: pagerank(g, tol=0.0, max_iters=3, checkpoint_every=0),
            "cc": lambda: connected_components(g, checkpoint_every=0),
        }
    )
    assert out["pr"].supersteps == 3
    assert out["cc"].converged
    # same results as sequential runs
    seq = pagerank(g, tol=0.0, max_iters=3, checkpoint_every=0)
    a = out["pr"].state_table(["value"])
    b = seq.state_table(["value"])
    assert np.allclose(np.asarray(a["value"]), np.asarray(b["value"]), atol=0)


def _near_dup_docs():
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(30):
        toks = rng.choice(words, size=40).tolist()
        rows.append({"doc_id": i, "text": " ".join(toks)})
    # planted: 100-101-102 a chain of near dups of doc 0; 200 exact dup of 1
    base = rows[0]["text"].split(" ")
    for j, did in enumerate([100, 101, 102]):
        t = list(base)
        t[j] = "CHANGED%d" % j
        rows.append({"doc_id": did, "text": " ".join(t)})
    rows.append({"doc_id": 200, "text": rows[1]["text"]})
    return rd.from_items(rows), rows


def _brute_jaccard(rows, k=3, t=0.7):
    def sh(text):
        toks = text.split(" ")
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sets = {r["doc_id"]: sh(r["text"]) for r in rows}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / (len(sets[a]) + len(sets[b]) - inter)
                if j >= t:
                    out[(a, b)] = j
    return out


def test_exact_similarity_join_matches_brute_force():
    from essentials_rd.textops import jaccard_similarity_pairs

    ds, rows = _near_dup_docs()
    got = jaccard_similarity_pairs(ds, threshold=0.7)
    want = _brute_jaccard(rows)
    got_pairs = {
        (a, b): j
        for a, b, j in zip(
            np.asarray(got["a"]), np.asarray(got["b"]), np.asarray(got["jaccard"])
        )
    }
    assert set(got_pairs) == set(want)
    for p, j in want.items():
        assert abs(got_pairs[p] - j) < 1e-12


def test_near_dup_clusters_planted(tmp_path):
    from essentials_rd.textops import near_dup_clusters

    ds, rows = _near_dup_docs()
    t = near_dup_clusters(ds, str(tmp_path / "cc"), threshold=0.7)
    clusters = dict(zip(np.asarray(t["doc_id"]), np.asarray(t["cluster"])))
    # the planted chain 0-100-101-102 is one component with min id 0;
    # exact dup pair (1, 200) is its own component
    assert clusters[0] == clusters[100] == clusters[101] == clusters[102] == 0
    assert clusters[1] == clusters[200] == 1


def test_stratified_sample_balances_and_is_layout_invariant():
    from essentials_rd.ops import stratified_sample

    rng = np.random.default_rng(5)
    n = 6000
    groups = np.array(["a", "b", "c", "tiny"])[
        np.minimum(rng.integers(0, 4, n), np.where(rng.random(n) < 0.99, 2, 3))
    ]
    keys = np.arange(n, dtype=np.int64)
    tbl = pa.table({"k": pa.array(keys), "g": pa.array(groups.astype(object))})
    target = 100

    def run(nblocks):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = stratified_sample(ds, "g", lambda b: np_col(b, "k"), target).to_pandas()
        return out.sort_values("k").reset_index(drop=True)

    s1, s2 = run(2), run(9)
    assert s1.equals(s2)  # block-layout invariant
    sizes = s1.groupby("g").size()
    # tiny group kept whole; big groups land near the target (binomial)
    tiny_n = int((groups == "tiny").sum())
    assert sizes.get("tiny", 0) == tiny_n
    for g in ("a", "b", "c"):
        assert 0.5 * target <= sizes[g] <= 2.0 * target
