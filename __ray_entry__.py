"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes the engine's operator inventory (SURVEY.md §2)
over the driver's parquet tables; ``oracle_sql()`` gives the equivalent
DuckDB SQL per query (fixed-iteration graph algorithms are unrolled as
chained CTEs so integer results match EXACTLY and float results match
after half-up rounding to 6 dp on both sides).

The graph under test is the part co-purchase graph derived from
``lineitem`` (same shared-key → pair → dedup shape as the corpus-derived
repo graph, but reproducible from the registered SQL views); the
corpus-shaped queries run over ``documents`` mapped onto the
(repo, path, commit, lang, content) input shape.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/shutdown() here or below.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

ALPHA = 0.85
PR_ITERS = 8
CC_ITERS = 32
BFS_ITERS = 32
SSSP_ITERS = 16
LP_ITERS = 4
PPR_ITERS = 8
KCORE_K = 3
KCORE_ITERS = 32
TOKEN_CAP = 1000
TOP_K = 20

_GRAPH_CACHE: dict = {}


def _graph(sf_dir: str, *, symmetrize: bool = True, weighted: bool = False):
    from essentials_rd.pipelines import copurchase_graph

    key = (sf_dir, symmetrize, weighted)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = copurchase_graph(
            sf_dir, symmetrize=symmetrize, weighted=weighted
        )
    return _GRAPH_CACHE[key]


# --------------------------------------------------------------- entry


def entry() -> Any:
    """Flagship pipeline on sf0.001: derive the co-purchase edge table,
    run PageRank (fixed 8 iters) + connected components to convergence,
    return the joined per-vertex result."""
    from essentials_rd.algorithms import connected_components, pagerank

    sf_dir = "/root/testdata/sf0.001"
    g, _ = _graph(sf_dir)
    pr = pagerank(g, alpha=ALPHA, tol=0.0, max_iters=PR_ITERS,
                  checkpoint_every=0, scatter_mode="fused")
    cc = connected_components(g, max_iters=2 * CC_ITERS,
                              checkpoint_every=0, scatter_mode="fused")
    tp = pr.state_table(["value"])
    tc = cc.state_table(["label"])
    return pa.table(
        {
            "vid": tp["vid"],
            "pagerank": tp["value"],
            "component": tc["label"],
        }
    )


# ------------------------------------------------------------- queries


def _q_corpus_sha256(sf_dir: str):
    from essentials_rd.derive import add_sha256, corpus_from_documents

    ds = add_sha256(corpus_from_documents(sf_dir))
    return ds.select_columns(["repo", "path", "sha256"])


def _q_shared_token_edges(sf_dir: str):
    import ray

    from essentials_rd.derive import (
        add_sha256,
        build_vertices,
        corpus_from_documents,
        dedup_edges_vid,
        shared_key_edges,
        token_keys,
        vids_to_repos,
    )

    files = add_sha256(corpus_from_documents(sf_dir))
    names_ref, _ = build_vertices(files)
    keys = token_keys(files, min_len=1)
    pairs, _ = shared_key_edges(keys, names_ref, cap=TOKEN_CAP, reason="shared_token")
    deduped = dedup_edges_vid(pairs).select_columns(["src", "dst", "weight"])
    return deduped.map_batches(
        lambda t: vids_to_repos(
            t, names_ref, {"src": "src_repo", "dst": "dst_repo"}
        ),
        batch_format="pyarrow",
    )


def _q_copurchase_edges(sf_dir: str):
    from essentials_rd.pipelines import copurchase_edges

    return copurchase_edges(sf_dir)


NBRF_DIMS = 8
NBRF_SCALE = 1_000_000


def _q_nbr_feat_sum(sf_dir: str):
    """Vector-payload neighbor aggregation (gnn.neighbor_feature_sum):
    per vertex the EXACT sum of its neighbors' integer-quantized
    embedding vectors — the one-hop GraphSAGE/GCN aggregation step,
    i.e. SpMV with a vector payload.  Features reach the edges by one
    partitioned join (never broadcast), blocks pre-combine partial
    vectors before the single dst-bucketed exchange (the PageRank
    message discipline with a d-wide payload).  Output: the first
    NBRF_DIMS dims in long format (vid, dim, val)."""
    import ray.data as rd

    from essentials_rd.gnn import _list_matrix, neighbor_feature_sum
    from essentials_rd.pipelines import copurchase_edges
    from essentials_rd.util import np_col

    edges = copurchase_edges(sf_dir)
    feats = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    n_feat = feats.count()
    out = neighbor_feature_sum(edges, feats, n_feat, scale=NBRF_SCALE)

    def _long(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        vid = np_col(t, "vid")
        m = _list_matrix(t.column("feat"), t.num_rows)[:, :NBRF_DIMS]
        n, d = m.shape
        return pa.table({
            "vid": pa.array(np.repeat(vid, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n),
                            pa.int64()),
            "val": pa.array(m.ravel(), pa.int64()),
        })

    return out.map_batches(_long, batch_format="pyarrow")


def _nbr_feat_sum_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, "
        "e2 AS (SELECT src, dst FROM pairs "
        "UNION ALL SELECT dst AS src, src AS dst FROM pairs), "
        "nf AS (SELECT count(*) AS m FROM embeddings), "
        "f AS (SELECT vec_id, CAST(j.j - 1 AS BIGINT) AS dim, "
        f"CAST(floor(embedding[j.j] * {NBRF_SCALE}) AS BIGINT) AS q "
        "FROM embeddings, LATERAL (SELECT unnest(range(1, "
        f"{NBRF_DIMS} + 1)) AS j) j) "
        "SELECT e2.dst AS vid, f.dim, CAST(sum(f.q) AS BIGINT) AS val "
        "FROM e2 JOIN f ON f.vec_id = e2.src % (SELECT m FROM nf) "
        "GROUP BY 1, 2"
    )


def _q_gnn_two_layer(sf_dir: str):
    """Two-layer GCN-style message passing: h₁ = Σ_nbr q(x) (the
    verified vector-payload neighbor sum), h₂ = Σ_nbr h₁ via
    gnn.neighbor_vec_sum — a k-layer stack is k chained calls, each
    one partitioned join + pre-combined dst exchange; dims are
    independent so the twin checks the first NBRF_DIMS of the exact
    int64 A²x.  The receptive-field composition every GraphSAGE/GCN
    pipeline runs before training."""
    import ray.data as rd

    from essentials_rd.gnn import (
        _list_matrix, neighbor_feature_sum, neighbor_vec_sum,
    )
    from essentials_rd.pipelines import copurchase_edges
    from essentials_rd.util import np_col

    edges = copurchase_edges(sf_dir).select_columns(
        ["src", "dst"]).materialize()
    feats = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    n_feat = feats.count()
    h1 = neighbor_feature_sum(edges, feats, n_feat, scale=NBRF_SCALE)
    h2 = neighbor_vec_sum(edges, h1.materialize())

    def _long(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        vid = np_col(t, "vid")
        m = _list_matrix(t.column("feat"), t.num_rows)[:, :NBRF_DIMS]
        n, d = m.shape
        return pa.table({
            "vid": pa.array(np.repeat(vid, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n),
                            pa.int64()),
            "val": pa.array(m.ravel(), pa.int64()),
        })

    return h2.map_batches(_long, batch_format="pyarrow")


def _gnn_two_layer_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, "
        "e2 AS MATERIALIZED (SELECT src, dst FROM pairs "
        "UNION ALL SELECT dst AS src, src AS dst FROM pairs), "
        "nf AS (SELECT count(*) AS m FROM embeddings), "
        "f AS (SELECT vec_id, CAST(j.j - 1 AS BIGINT) AS dim, "
        f"CAST(floor(embedding[j.j] * {NBRF_SCALE}) AS BIGINT) AS q "
        "FROM embeddings, LATERAL (SELECT unnest(range(1, "
        f"{NBRF_DIMS} + 1)) AS j) j), "
        "h1 AS MATERIALIZED (SELECT e2.dst AS vid, f.dim, "
        "CAST(sum(f.q) AS BIGINT) AS val "
        "FROM e2 JOIN f ON f.vec_id = e2.src % (SELECT m FROM nf) "
        "GROUP BY 1, 2) "
        "SELECT e2.dst AS vid, h1.dim, CAST(sum(h1.val) AS BIGINT) "
        "AS val FROM e2 JOIN h1 ON h1.vid = e2.src GROUP BY 1, 2"
    )


def _q_degree(sf_dir: str):
    import ray

    from essentials_rd.util import np_col

    g, _ = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for t in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(t, "vid"))
        deg[pos] += np_col(t, "outdeg")
    return pa.table({"vid": pa.array(vids, pa.int64()),
                     "degree": pa.array(deg, pa.int64())})


def _q_degree_assortativity(sf_dir: str):
    """Integer-exact degree-assortativity moment sums
    (algorithms.similarity.degree_assortativity_moments): (n, Σx, Σy,
    Σx², Σy², Σxy) over both directions of every co-purchase edge —
    Pearson's r over these IS Newman's assortativity coefficient, and
    the integer sums hash-match where a float r would not.  No
    shuffle: broadcast degree vector + one partial row per edge
    block."""
    from essentials_rd.algorithms.similarity import (
        degree_assortativity_moments,
    )

    g, edges = _graph(sf_dir)
    return degree_assortativity_moments(g, edges)


def _degree_assortativity_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, "
        "xy AS (SELECT CAST(d1.outdeg AS BIGINT) AS x, "
        "CAST(d2.outdeg AS BIGINT) AS y "
        "FROM sym e JOIN deg d1 ON d1.vid = e.src "
        "JOIN deg d2 ON d2.vid = e.dst) "
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(x) AS BIGINT) AS sum_x, "
        "CAST(sum(y) AS BIGINT) AS sum_y, "
        "CAST(sum(x * x) AS BIGINT) AS sum_xx, "
        "CAST(sum(y * y) AS BIGINT) AS sum_yy, "
        "CAST(sum(x * y) AS BIGINT) AS sum_xy FROM xy"
    )


def _pagerank_rounded(sf_dir: str) -> pa.Table:
    from essentials_rd.algorithms import pagerank
    from essentials_rd.pipelines import round_half_up

    g, _ = _graph(sf_dir)
    res = pagerank(g, alpha=ALPHA, tol=0.0, max_iters=PR_ITERS,
                   checkpoint_every=0, scatter_mode="fused")
    t = res.state_table(["value"])
    vals = round_half_up(np.asarray(t["value"], dtype=np.float64), 6)
    return pa.table({"vid": t["vid"], "pagerank": pa.array(vals, pa.float64())})


def _q_pagerank(sf_dir: str):
    return _pagerank_rounded(sf_dir)


def _q_top_pagerank(sf_dir: str):
    t = _pagerank_rounded(sf_dir)
    pr = np.asarray(t["pagerank"], dtype=np.float64)
    vid = np.asarray(t["vid"], dtype=np.int64)
    idx = np.lexsort((vid, -pr))[:TOP_K]
    return t.take(pa.array(idx))


def _cc_table(sf_dir: str) -> pa.Table:
    from essentials_rd.algorithms import connected_components
    from essentials_rd.algorithms.cc import components_table

    g, _ = _graph(sf_dir)
    res = connected_components(g, max_iters=2 * CC_ITERS,
                               checkpoint_every=0, scatter_mode="fused")
    assert res.converged and res.supersteps <= CC_ITERS, (
        "CC did not converge within the oracle's unrolled iteration count"
    )
    return components_table(res)


def _q_cc(sf_dir: str):
    return _cc_table(sf_dir)


def _q_component_sizes(sf_dir: str):
    t = _cc_table(sf_dir)
    labels, counts = np.unique(np.asarray(t["label"]), return_counts=True)
    return pa.table({"label": pa.array(labels, pa.int64()),
                     "size": pa.array(counts.astype(np.int64), pa.int64())})


def _q_lp_modularity(sf_dir: str):
    """Community-quality evaluation: Newman modularity pieces of the
    LP partition — per community the exact (internal edges e_c, total
    degree d_c) plus m, so Q = Σ e_c/m − (d_c/2m)² derives from
    integers.  Labels come from the already-verified LP run (broadcast
    once); internal edges from one zero-new-shuffle scan with
    per-block (label, count) partials; degree sums fold driver-side
    over the O(|V|) label array (tier-accepted, see superstep notes)."""
    import ray

    from essentials_rd.algorithms import label_propagation
    from essentials_rd.algorithms.lp import labels_table
    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir)
    res = label_propagation(g, max_iters=LP_ITERS, checkpoint_every=0,
                            scatter_mode="fused")
    t = labels_table(res)
    vids = np.asarray(t["vid"], np.int64)
    lab = np.asarray(t["label"], np.int64)
    lref = ray.put((vids, lab))

    def _internal(b: pa.Table) -> pa.Table:
        vv, ll = ray.get(lref)
        ls = ll[np.searchsorted(vv, np_col(b, "src").astype(np.int64))]
        ld = ll[np.searchsorted(vv, np_col(b, "dst").astype(np.int64))]
        same = ls == ld
        u, c = np.unique(ls[same], return_counts=True)
        return pa.table({"label": pa.array(u, pa.int64()),
                         "e_c": pa.array(c.astype(np.int64), pa.int64())})

    ic = grouped_pandas_agg(
        edges.select_columns(["src", "dst"]).map_batches(
            _internal, batch_format="pyarrow"),
        keys=["label"], aggs={"e_c": ("e_c", "sum")},
        num_buckets=8).take_all()
    icm = {r["label"]: r["e_c"] for r in ic}
    deg = np.zeros(len(vids), np.int64)
    for dt in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(dt, "vid"))
        deg[pos] += np_col(dt, "outdeg")
    ulab = np.unique(lab)
    d_c = np.zeros(len(ulab), np.int64)
    np.add.at(d_c, np.searchsorted(ulab, lab), deg)
    m = int(edges.count())
    return pa.table({
        "label": pa.array(ulab, pa.int64()),
        "e_c": pa.array([icm.get(int(x), 0) for x in ulab], pa.int64()),
        "d_c": pa.array(d_c, pa.int64()),
        "m": pa.array(np.full(len(ulab), m, np.int64), pa.int64()),
    })


def _q_louvain_move(sf_dir: str):
    """Synchronized Louvain move round (algorithms.louvain): one
    modularity-greedy refinement pass over the verified LP partition —
    every vertex takes the INTEGER-exact gain argmax
    S = 2m·e_{v,c} − k_v·d'_c over its neighboring communities (ties
    to the smallest label), applied simultaneously.  One edge scan
    with per-block partials + one v-keyed exchange; labels/degrees/
    community degrees broadcast once."""
    from essentials_rd.algorithms import label_propagation
    from essentials_rd.algorithms.louvain import modularity_move_round
    from essentials_rd.algorithms.lp import labels_table

    g, edges = _graph(sf_dir)
    res = label_propagation(g, max_iters=LP_ITERS, checkpoint_every=0,
                            scatter_mode="fused")
    t = labels_table(res)
    return modularity_move_round(
        g, edges.select_columns(["src", "dst"]),
        np.asarray(t["vid"], np.int64), np.asarray(t["label"], np.int64))


def _louvain_body(seed_lp: bool = True) -> str:
    """CTE chain seed-partition → one synchronized move round; ends at
    ``lvfinal(vid, label)``.  ``seed_lp=True`` seeds from the shared
    LP unroll (louvain_move1); ``False`` seeds from the singleton
    partition — Louvain's canonical level-1 start
    (louvain_coarse_edges)."""
    seed = (
        f"{_lp_sql_body()}, "
        f"lab AS MATERIALIZED (SELECT vid, label FROM b{LP_ITERS}), "
        if seed_lp else
        "lab AS MATERIALIZED (SELECT vid, vid AS label FROM verts), "
    )
    return (
        seed +
        "lvm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs), "
        "lvdc AS MATERIALIZED (SELECT la.label, "
        "CAST(COALESCE(sum(d.outdeg), 0) AS BIGINT) AS d_c "
        "FROM lab la LEFT JOIN deg d ON d.vid = la.vid GROUP BY 1), "
        "evc AS MATERIALIZED (SELECT e.dst AS vid, l.label AS c, "
        "CAST(count(*) AS BIGINT) AS n FROM sym e "
        "JOIN lab l ON l.vid = e.src GROUP BY 1, 2), "
        "cand AS (SELECT vid, c, CAST(sum(n) AS BIGINT) AS n FROM ("
        "SELECT vid, c, n FROM evc "
        "UNION ALL SELECT la.vid, la.label AS c, 0 AS n FROM lab la "
        "WHERE EXISTS (SELECT 1 FROM evc e WHERE e.vid = la.vid)"
        ") GROUP BY 1, 2), "
        "scored AS (SELECT cd.vid, cd.c, "
        "2 * (SELECT m FROM lvm) * cd.n - d.outdeg * (dc.d_c - "
        "CASE WHEN cd.c = la.label THEN d.outdeg ELSE 0 END) AS s "
        "FROM cand cd JOIN deg d ON d.vid = cd.vid "
        "JOIN lab la ON la.vid = cd.vid "
        "JOIN lvdc dc ON dc.label = cd.c), "
        "win AS (SELECT vid, c FROM (SELECT vid, c, "
        "row_number() OVER (PARTITION BY vid ORDER BY s DESC, c ASC) "
        "AS rn FROM scored) WHERE rn = 1), "
        "lvfinal AS MATERIALIZED (SELECT la.vid, "
        "CAST(COALESCE(w.c, la.label) AS BIGINT) AS label "
        "FROM lab la LEFT JOIN win w ON w.vid = la.vid)"
    )


def _louvain_move_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, {_louvain_body()} "
        "SELECT vid, label FROM lvfinal ORDER BY vid"
    )


def _louvain_coarse_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, {_louvain_body(seed_lp=False)}, "
        "coarse AS (SELECT least(la.label, lb.label) AS src, "
        "greatest(la.label, lb.label) AS dst, "
        "CAST(count(*) AS BIGINT) AS weight "
        "FROM pairs p JOIN lvfinal la ON la.vid = p.src "
        "JOIN lvfinal lb ON lb.vid = p.dst GROUP BY 1, 2) "
        "SELECT src, dst, weight FROM coarse ORDER BY src, dst"
    )


def _q_louvain_coarse(sf_dir: str):
    """Louvain aggregation phase (algorithms.louvain.contract_graph):
    the coarse community graph after one verified move round —
    endpoints relabeled to communities, parallel edges collapsed into
    weights, intra-community edges kept as self-loops (the next
    level's internal-edge weights).  One relabel scan with per-block
    pre-combine + one bucketed exchange on the coarse pair."""
    import ray

    from essentials_rd.algorithms.louvain import (contract_graph,
                                                  modularity_move_round)

    g, edges = _graph(sf_dir)
    e = edges.select_columns(["src", "dst"])
    vids = ray.get(g.vertex_ids_ref)
    # singleton seed — Louvain's canonical level-1 start, and the
    # non-trivial contraction (the LP seed collapses to one community)
    moved = modularity_move_round(g, e, vids, vids.copy())
    return contract_graph(e, np.asarray(moved["vid"], np.int64),
                          np.asarray(moved["label"], np.int64))


def _q_louvain_level2(sf_dir: str):
    """Multilevel Louvain level 2 (algorithms.louvain
    .modularity_move_round_weighted): the weighted singleton-seeded
    move round over the level-1 coarse community graph — self-loop
    weights (internal edges) count twice in degrees and drop out of
    the argmax; gains stay integer-exact through 2W·e − k·d'."""
    import ray

    from essentials_rd.algorithms.louvain import (
        contract_graph, modularity_move_round,
        modularity_move_round_weighted)

    g, edges = _graph(sf_dir)
    e = edges.select_columns(["src", "dst"])
    vids = ray.get(g.vertex_ids_ref)
    moved = modularity_move_round(g, e, vids, vids.copy())
    coarse = contract_graph(e, np.asarray(moved["vid"], np.int64),
                            np.asarray(moved["label"], np.int64))
    return modularity_move_round_weighted(coarse)


def _louvain_level2_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, {_louvain_body(seed_lp=False)}, "
        "coarse AS MATERIALIZED (SELECT least(la.label, lb.label) AS src, "
        "greatest(la.label, lb.label) AS dst, "
        "CAST(count(*) AS BIGINT) AS weight "
        "FROM pairs p JOIN lvfinal la ON la.vid = p.src "
        "JOIN lvfinal lb ON lb.vid = p.dst GROUP BY 1, 2), "
        "wd2 AS MATERIALIZED (SELECT vid, CAST(sum(w) AS BIGINT) AS k "
        "FROM (SELECT src AS vid, CASE WHEN src = dst THEN 2 * weight "
        "ELSE weight END AS w FROM coarse "
        "UNION ALL SELECT dst, weight FROM coarse WHERE src <> dst) "
        "GROUP BY 1), "
        "ww2 AS (SELECT CAST(sum(weight) AS BIGINT) AS w FROM coarse), "
        "ev2 AS (SELECT v, c, CAST(sum(w) AS BIGINT) AS n FROM ("
        "SELECT src AS v, dst AS c, weight AS w FROM coarse "
        "WHERE src <> dst "
        "UNION ALL SELECT dst, src, weight FROM coarse WHERE src <> dst) "
        "GROUP BY 1, 2), "
        "cand2 AS (SELECT v, c, CAST(sum(n) AS BIGINT) AS n FROM ("
        "SELECT v, c, n FROM ev2 "
        "UNION ALL SELECT DISTINCT v, v AS c, 0 AS n FROM ev2) "
        "GROUP BY 1, 2), "
        "sc2 AS (SELECT cd.v, cd.c, "
        "2 * (SELECT w FROM ww2) * cd.n - kv.k * (kc.k - "
        "CASE WHEN cd.c = cd.v THEN kv.k ELSE 0 END) AS s "
        "FROM cand2 cd JOIN wd2 kv ON kv.vid = cd.v "
        "JOIN wd2 kc ON kc.vid = cd.c), "
        "win2 AS (SELECT v, c FROM (SELECT v, c, row_number() OVER "
        "(PARTITION BY v ORDER BY s DESC, c ASC) AS rn FROM sc2) "
        "WHERE rn = 1) "
        "SELECT d.vid, CAST(COALESCE(w2.c, d.vid) AS BIGINT) AS label "
        "FROM wd2 d LEFT JOIN win2 w2 ON w2.v = d.vid ORDER BY 1"
    )


def _q_lp(sf_dir: str):
    from essentials_rd.algorithms import label_propagation
    from essentials_rd.algorithms.lp import labels_table

    g, _ = _graph(sf_dir)
    res = label_propagation(g, max_iters=LP_ITERS, checkpoint_every=0,
                            scatter_mode="fused")
    return labels_table(res)


_TC_CACHE: dict = {}


def _tc(sf_dir: str):
    from essentials_rd.algorithms import triangle_counts
    from essentials_rd.pipelines import _work_dir, part_universe

    if sf_dir not in _TC_CACHE:
        _, edges = _graph(sf_dir)
        _TC_CACHE[sf_dir] = triangle_counts(
            edges.select_columns(["src", "dst"]), _work_dir("tc"), 8,
            vertex_ids=part_universe(sf_dir),
        )
    return _TC_CACHE[sf_dir]


def _q_triangles_total(sf_dir: str):
    total, _ = _tc(sf_dir)
    return pa.table({"triangles": pa.array([total], pa.int64())})


def _q_triangles_per_vertex(sf_dir: str):
    _, per_v = _tc(sf_dir)
    return per_v


DOULION_NUM, DOULION_DEN = 1, 2
DOULION_SEED = 11


def _q_triangles_doulion(sf_dir: str):
    """DOULION sampled triangle estimate (Tsourakakis et al., KDD
    2009) — the TC scale path when even the oriented exact count is
    too large: keep each canonical edge iff splitmix64(packed pair +
    seed·golden) < p·2⁶⁴ (a pure edge function — no RNG state, any
    layout), run the EXACT oriented engine on the sampled subgraph,
    and ship (tri_sampled, edges_kept, p_num, p_den) so the unbiased
    estimate tri_sampled/p³ derives exactly.  Sampling is a stateless
    zero-shuffle filter; everything downstream reuses the verified TC
    engine."""
    from essentials_rd.algorithms import triangle_counts
    from essentials_rd.pipelines import _work_dir, part_universe
    from essentials_rd.util import hash64, np_col

    _, edges = _graph(sf_dir)
    mix = (DOULION_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    thr = np.uint64((2**64) * DOULION_NUM // DOULION_DEN)

    def _keep(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64).view(np.uint64)
        d = np_col(t, "dst").astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            key = (s << np.uint64(32)) + d + np.uint64(mix)
        z = hash64(key.view(np.int64))
        m = z < thr
        return pa.table({
            "src": pa.array(s[m].view(np.int64), pa.int64()),
            "dst": pa.array(d[m].view(np.int64), pa.int64()),
        })

    sampled = (edges.select_columns(["src", "dst"])
               .map_batches(_keep, batch_format="pyarrow")
               .materialize())
    n_kept = sampled.count()
    total, _ = triangle_counts(sampled, _work_dir("doulion"), 8,
                               vertex_ids=part_universe(sf_dir))
    return pa.table({
        "tri_sampled": pa.array([total], pa.int64()),
        "edges_kept": pa.array([n_kept], pa.int64()),
        "p_num": pa.array([DOULION_NUM], pa.int64()),
        "p_den": pa.array([DOULION_DEN], pa.int64()),
    })


def _doulion_sql() -> str:
    # literals on purpose (twin-independence) — engine DOULION_SEED=11,
    # p = 1/2 frozen
    DOULION_NUM, DOULION_DEN = 1, 2
    mix = (11 * 0x9E3779B97F4A7C15) & (2**63 - 1)
    thr = (2**64) * DOULION_NUM // DOULION_DEN
    chain = _sm64_ctes("dlz", "src, dst",
                       f"src * 4294967296 + dst + {mix}", "pairs")
    return (
        f"WITH {_GRAPH_CTES}, {chain}, "
        f"spairs AS MATERIALIZED (SELECT src, dst FROM dlz3 "
        f"WHERE z < CAST('{thr}' AS UBIGINT)) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM spairs e1 "
        "JOIN spairs e2 ON e2.src = e1.src AND e2.dst > e1.dst "
        "JOIN spairs e3 ON e3.src = e1.dst AND e3.dst = e2.dst) "
        "AS tri_sampled, "
        "(SELECT CAST(count(*) AS BIGINT) FROM spairs) AS edges_kept, "
        f"CAST({DOULION_NUM} AS BIGINT) AS p_num, "
        f"CAST({DOULION_DEN} AS BIGINT) AS p_den"
    )


def _q_bfs_depth(sf_dir: str):
    import ray

    from essentials_rd.algorithms import bfs
    from essentials_rd.algorithms.bfs import depths_table

    g, _ = _graph(sf_dir)
    source = int(np.min(ray.get(g.vertex_ids_ref)))
    res = bfs(g, source, max_iters=2 * BFS_ITERS, checkpoint_every=0,
              scatter_mode="fused")
    assert res.converged and res.supersteps <= BFS_ITERS, (
        "BFS did not converge within the oracle's unrolled iteration count"
    )
    return depths_table(res)


VOR_ITERS = 16
VOR_SEEDS = 8


def _vor_seeds(g) -> list[int]:
    import ray as _ray

    from essentials_rd.util import hash64
    vids = np.sort(np.asarray(_ray.get(g.vertex_ids_ref), np.int64))
    h = hash64(vids)
    order = np.lexsort((vids, h.view(np.int64) ^ np.int64(-(1 << 63))))
    # order by (uint64 h, vid): shift-view trick keeps uint64 order
    return vids[order[:VOR_SEEDS]].tolist()


def _q_graph_voronoi(sf_dir: str):
    """Graph Voronoi partition (algorithms.graph_voronoi): every
    vertex assigned to its closest of 8 deterministic smallest-hash
    seeds under hop distance, ties to the smaller seed rank — the
    landmark-assignment primitive — with the whole (dist, seed) pair
    riding ONE packed int64 min-key through the existing BFS-sparse
    superstep engine (no second channel: min over dist·2³²+rank IS the
    lexicographic tie-break).  Supersteps asserted against the
    oracle's unroll bound."""
    from essentials_rd.algorithms.voronoi import (
        graph_voronoi, voronoi_table,
    )

    g, _ = _graph(sf_dir)
    seeds = _vor_seeds(g)
    res = graph_voronoi(g, seeds, max_iters=2 * VOR_ITERS,
                        checkpoint_every=0, scatter_mode="fused")
    assert res.converged and res.supersteps <= VOR_ITERS, (
        res.supersteps, res.converged)
    return voronoi_table(res, seeds)


def _graph_voronoi_sql() -> str:
    # literals on purpose (twin-independence) — engine VOR_SEEDS/VOR_ITERS
    VOR_SEEDS = 8
    VOR_ITERS = 16
    pack = 1 << 32
    chain = _sm64_ctes("vs", "vid", "vid", "verts")
    steps = [
        _GRAPH_CTES, chain,
        f"seeds AS MATERIALIZED (SELECT vid, row_number() OVER "
        f"(ORDER BY z, vid) - 1 AS rank FROM vs3 "
        f"ORDER BY z, vid LIMIT {VOR_SEEDS})",
        "vk0 AS MATERIALIZED (SELECT v.vid, "
        "CAST(COALESCE(s.rank, 4611686018427387904) AS BIGINT) AS key "
        "FROM verts v LEFT JOIN seeds s ON s.vid = v.vid)",
    ]
    for k in range(VOR_ITERS):
        steps.append(f"""
vm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(v.key) + {pack} AS md
  FROM sym e JOIN vk{k} v ON v.vid = e.src
  WHERE v.key < 4611686018427387904
  GROUP BY e.dst
),
vk{k + 1} AS MATERIALIZED (
  SELECT a.vid, LEAST(a.key, COALESCE(m.md, a.key)) AS key
  FROM vk{k} a LEFT JOIN vm{k} m ON m.vid = a.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {body} "
        f"SELECT a.vid, "
        f"CASE WHEN a.key >= 4611686018427387904 THEN -1 "
        f"ELSE a.key // {pack} END AS dist, "
        f"CASE WHEN a.key >= 4611686018427387904 THEN -1 "
        f"ELSE s.vid END AS seed_vid "
        f"FROM vk{VOR_ITERS} a LEFT JOIN seeds s "
        f"ON s.rank = a.key % {pack} AND a.key < 4611686018427387904 "
        f"ORDER BY a.vid"
    )


def _q_voronoi_coarsen(sf_dir: str):
    """Voronoi graph coarsening (the multilevel-partitioner contraction
    step METIS-style pipelines run after seeding): contract every
    vertex to its graph_voronoi region and emit the QUOTIENT graph —
    per region pair (sa ≤ sb) the edge count — off-diagonal rows are
    the cut between regions, diagonal rows the regions' internal
    edges.  The assignment rides the superstep engine;
    the contraction is one partitioned join of the edge list against
    the assignment table (joined on BOTH endpoints) and a pair-keyed
    combine — edges never visit the driver."""
    import ray.data as rd

    from essentials_rd.algorithms.voronoi import (
        graph_voronoi, voronoi_table,
    )
    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir)
    seeds = _vor_seeds(g)
    res = graph_voronoi(g, seeds, max_iters=2 * VOR_ITERS,
                        checkpoint_every=0, scatter_mode="fused")
    assert res.converged and res.supersteps <= VOR_ITERS
    assign = rd.from_arrow(voronoi_table(res, seeds))

    asg_s = assign.map_batches(
        lambda t: pa.table({"src": t.column("vid"),
                            "ra": t.column("seed_vid")}),
        batch_format="pyarrow")
    asg_d = assign.map_batches(
        lambda t: pa.table({"dst": t.column("vid"),
                            "rb": t.column("seed_vid")}),
        batch_format="pyarrow")
    ed = edges.select_columns(["src", "dst"])
    tagged = join(join(ed, asg_s, on="src", broadcast=False),
                  asg_d, on="dst", broadcast=False)

    def _pairs(t: pa.Table) -> pa.Table:
        ra = np_col(t, "ra")
        rb = np_col(t, "rb")
        sa = np.minimum(ra, rb)
        sb = np.maximum(ra, rb)
        return pa.table({"sa": pa.array(sa, pa.int64()),
                         "sb": pa.array(sb, pa.int64()),
                         "one": pa.array(np.ones(len(sa), np.int64))})

    agg = grouped_pandas_agg(
        tagged.map_batches(_pairs, batch_format="pyarrow"),
        keys=["sa", "sb"], aggs={"n": ("one", "sum")},
        key_fn=lambda b: np_col(b, "sa") * np.int64(0x9E3779B1)
        + np_col(b, "sb"))
    rows = sorted(agg.take_all(), key=lambda r: (r["sa"], r["sb"]))
    return pa.table({
        "sa": pa.array([r["sa"] for r in rows], pa.int64()),
        "sb": pa.array([r["sb"] for r in rows], pa.int64()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
    })


def _voronoi_coarsen_sql() -> str:
    inner = _graph_voronoi_sql()
    # reuse the voronoi SQL as a subquery for the assignment table
    return (
        f"WITH asg AS MATERIALIZED ({inner}), "
        "ip AS (SELECT a.seed_vid AS ra, b.seed_vid AS rb "
        "FROM (SELECT * FROM asg) a "
        "JOIN (WITH items AS (SELECT DISTINCT l_orderkey, l_partkey "
        "FROM lineitem) SELECT x.l_partkey AS src, y.l_partkey AS dst "
        "FROM items x JOIN items y ON x.l_orderkey = y.l_orderkey "
        "AND x.l_partkey < y.l_partkey GROUP BY 1, 2) e "
        "ON e.src = a.vid JOIN asg b ON b.vid = e.dst) "
        "SELECT LEAST(ra, rb) AS sa, GREATEST(ra, rb) AS sb, "
        "CAST(count(*) AS BIGINT) AS n FROM ip GROUP BY 1, 2 "
        "ORDER BY 1, 2"
    )


DAG_DEPTH_ITERS = 12


def _q_dag_depth(sf_dir: str):
    """Longest-path layering on the DAG orientation of the co-purchase
    graph (algorithms.longest_path): max-plus relaxation capped at K
    supersteps gives depth = min(longest-path(v), K) exactly — the
    critical-path/topological-layer primitive, frontier-sparse like
    BFS.  Edges run src<dst (acyclic by construction), so the unrolled
    K-step max CTE reproduces it bit-for-bit."""
    from essentials_rd.algorithms import depth_table, longest_path

    g, _ = _graph(sf_dir, symmetrize=False)
    res = longest_path(g, max_iters=DAG_DEPTH_ITERS, checkpoint_every=0,
                       scatter_mode="fused")
    return depth_table(res)


def _dag_depth_sql() -> str:
    steps = [
        "ld0 AS MATERIALIZED (SELECT vid, CAST(0 AS BIGINT) AS depth "
        "FROM verts)"
    ]
    for k in range(DAG_DEPTH_ITERS):
        steps.append(f"""
lm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, max(l.depth + 1) AS md
  FROM pairs e JOIN ld{k} l ON l.vid = e.src
  GROUP BY e.dst
),
ld{k + 1} AS MATERIALIZED (
  SELECT v.vid, greatest(v.depth, COALESCE(m.md, v.depth)) AS depth
  FROM ld{k} v LEFT JOIN lm{k} m ON m.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT vid, CAST(depth AS BIGINT) AS depth "
        f"FROM ld{DAG_DEPTH_ITERS} ORDER BY vid"
    )


def _q_ppr(sf_dir: str):
    """Personalized PageRank from the min vertex id, exactly PPR_ITERS
    power steps (tol=0) — compared against the unrolled-CTE oracle
    after half-up rounding to 6 dp on both sides."""
    import ray

    from essentials_rd.algorithms import ppr
    from essentials_rd.algorithms.ppr import ppr_table
    from essentials_rd.pipelines import round_half_up

    g, _ = _graph(sf_dir)
    source = int(np.min(ray.get(g.vertex_ids_ref)))
    res = ppr(g, source, tol=0.0, max_iters=PPR_ITERS, checkpoint_every=0,
              scatter_mode="fused")
    t = ppr_table(res)
    vals = round_half_up(np.asarray(t["ppr"], dtype=np.float64), 6)
    return pa.table({"vid": t["vid"], "ppr": pa.array(vals, pa.float64())})


SWEEP_T = 100


def _q_sp_counts(sf_dir: str):
    """Shortest-path counts from the min vid (algorithms.bc.sp_counts
    — Brandes' forward pass standalone): exact integer σ(v) per
    vertex plus the BFS depth; the oracle unrolls level-synchronous
    σ accumulation over the shared graph CTEs."""
    import ray

    from essentials_rd.algorithms.bc import sp_counts

    g, _ = _graph(sf_dir)
    source = int(np.min(ray.get(g.vertex_ids_ref)))
    return sp_counts(g, source, max_iters=BFS_ITERS,
                     scatter_mode="fused")


def _sp_counts_sql() -> str:
    big = 1 << 60
    steps = [
        f"""qsrc AS MATERIALIZED (SELECT min(vid) AS s FROM verts),
f0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = (SELECT s FROM qsrc) THEN 0
              ELSE {big} END AS depth,
         CASE WHEN vid = (SELECT s FROM qsrc) THEN 1
              ELSE 0 END AS sig FROM verts)"""
    ]
    for k in range(BFS_ITERS):
        steps.append(f"""
fm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(l.sig) AS s
  FROM sym e JOIN f{k} l ON l.vid = e.src AND l.depth = {k}
  GROUP BY e.dst
),
f{k + 1} AS MATERIALIZED (
  SELECT v.vid,
         CASE WHEN v.depth < {big} THEN v.depth
              WHEN m.s IS NOT NULL THEN {k + 1} ELSE v.depth END AS depth,
         CASE WHEN v.depth < {big} THEN v.sig
              WHEN m.s IS NOT NULL THEN m.s ELSE 0 END AS sig
  FROM f{k} v LEFT JOIN fm{k} m ON m.vid = v.vid
)""")
    return (
        f"WITH {_GRAPH_CTES}, {','.join(steps)} "
        f"SELECT vid, CASE WHEN depth >= {big} THEN -1 ELSE depth END "
        "AS depth, CAST(sig AS BIGINT) AS sigma "
        f"FROM f{BFS_ITERS} ORDER BY vid"
    )


TRIPLE_K = 15


def _q_top_pairs(sf_dir: str):
    """Top-k frequent itemset PAIRS: the co-purchase edge weight IS
    the pair support, so this is one distributed top-k over the
    already-derived table with full (w desc, src, dst) tie-break."""
    from essentials_rd.ops import top_k

    _, edges = _graph(sf_dir, weighted=True)

    def _int_w(t: pa.Table) -> pa.Table:
        w = np.asarray(t.column("weight").to_numpy(zero_copy_only=False),
                       np.int64)
        return pa.table({"src": t.column("src"), "dst": t.column("dst"),
                         "support": pa.array(w, pa.int64())})

    import ray.data as rd  # noqa: F401

    return top_k(edges.map_batches(_int_w, batch_format="pyarrow"),
                 by="support", k=TRIPLE_K, tie_cols=["src", "dst"])


def _top_pairs_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES} "
        "SELECT src, dst, CAST(weight AS BIGINT) AS support FROM pairs "
        f"ORDER BY support DESC, src, dst LIMIT {TRIPLE_K}"
    )


def _q_pair_lift(sf_dir: str):
    """Association-rule statistics for the top-support pairs: each of
    the top-k co-purchase pairs with its exact (n_ab, n_a, n_b, n_orders)
    — confidence n_ab/n_a and lift N·n_ab/(n_a·n_b) derive from four
    int64s with no float ranking anywhere (the selection orders by
    support with full tie-break).  Item frequencies come from one
    grouped count; only the k winning pairs' rows join driver-side."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, top_k
    from essentials_rd.util import np_col

    _, edges = _graph(sf_dir, weighted=True)

    def _int_w(t: pa.Table) -> pa.Table:
        w = np.asarray(t.column("weight").to_numpy(zero_copy_only=False),
                       np.int64)
        return pa.table({"src": t.column("src"), "dst": t.column("dst"),
                         "n_ab": pa.array(w, pa.int64())})

    top = top_k(edges.map_batches(_int_w, batch_format="pyarrow"),
                by="n_ab", k=TRIPLE_K, tie_cols=["src", "dst"])

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def _dedup(t: pa.Table) -> pa.Table:
        op = np.unique(np.stack([np_col(t, "l_orderkey"),
                                 np_col(t, "l_partkey")], axis=1), axis=0)
        return pa.table({"l_orderkey": pa.array(op[:, 0], pa.int64()),
                         "l_partkey": pa.array(op[:, 1], pa.int64())})

    # distinct (order, part) needs a global dedup: bucket by orderkey
    from essentials_rd.ops import hash_bucket_agg

    items = hash_bucket_agg(li, lambda b: np_col(b, "l_orderkey"),
                            _dedup, 16)
    freq = grouped_pandas_agg(
        items, keys=["l_partkey"], aggs={"n": ("l_partkey", "count")},
        num_buckets=8)
    f = {r["l_partkey"]: r["n"] for r in freq.take_all()
         if r["l_partkey"] in set(np_col(top, "src").tolist())
         | set(np_col(top, "dst").tolist())}
    n_orders = int(rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]).count())
    src = np_col(top, "src")
    dst = np_col(top, "dst")
    return pa.table({
        "src": top["src"], "dst": top["dst"], "n_ab": top["n_ab"],
        "n_a": pa.array([f[int(s)] for s in src], pa.int64()),
        "n_b": pa.array([f[int(d)] for d in dst], pa.int64()),
        "n_orders": pa.array([n_orders] * len(src), pa.int64()),
    })


def _pair_lift_sql() -> str:
    return (
        # _GRAPH_CTES already materializes the distinct (order, part)
        # ``items`` CTE — reuse it for the item frequencies
        f"WITH {_GRAPH_CTES}, "
        "freq AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n "
        "FROM items GROUP BY 1), "
        "top AS (SELECT src, dst, CAST(weight AS BIGINT) AS n_ab "
        f"FROM pairs ORDER BY n_ab DESC, src, dst LIMIT {TRIPLE_K}) "
        "SELECT top.src, top.dst, top.n_ab, fa.n AS n_a, fb.n AS n_b, "
        "(SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders "
        "FROM top JOIN freq fa ON fa.l_partkey = top.src "
        "JOIN freq fb ON fb.l_partkey = top.dst "
        "ORDER BY top.n_ab DESC, top.src, top.dst"
    )


def _q_top_triples(sf_dir: str):
    """Top-k frequent itemset TRIPLES (the a-priori step pairs can't
    see): every order's distinct parts expand to their C(p,3) sorted
    triples — the pair-expansion index trick applied twice, no Python
    loop — per-block pre-counts flow through ONE bucketed combine on
    the exact 3-int key, then distributed top-k."""
    import ray.data as rd

    from essentials_rd.ops import (grouped_pandas_agg, hash_bucket_agg,
                                   top_k)
    from essentials_rd.util import np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def _triples(grp: pa.Table) -> pa.Table:
        o = np_col(grp, "l_orderkey")
        p = np_col(grp, "l_partkey")
        # distinct (order, part) then sorted segments per order
        op = np.unique(np.stack([o, p], axis=1), axis=0)
        o, p = op[:, 0], op[:, 1]
        m = len(o)
        starts = np.r_[0, np.flatnonzero(o[1:] != o[:-1]) + 1] \
            if m else np.zeros(0, np.int64)
        ends = np.r_[starts[1:], m] if m else np.zeros(0, np.int64)
        seg_end = np.repeat(ends, ends - starts) if m \
            else np.zeros(0, np.int64)
        idx = np.arange(m)
        cnt = np.maximum(seg_end - idx - 1, 0)
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table({"pa_": pa.array([], pa.int64()),
                             "pb_": pa.array([], pa.int64()),
                             "pc_": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        i_rep = np.repeat(idx, cnt)
        j = (np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
             + np.repeat(idx + 1, cnt))
        # second expansion: k runs j+1 .. seg_end(i)
        se2 = seg_end[i_rep]
        cnt2 = np.maximum(se2 - j - 1, 0)
        tot2 = int(cnt2.sum())
        if tot2 == 0:
            return pa.table({"pa_": pa.array([], pa.int64()),
                             "pb_": pa.array([], pa.int64()),
                             "pc_": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ii = np.repeat(i_rep, cnt2)
        jj = np.repeat(j, cnt2)
        kk = (np.arange(tot2) - np.repeat(np.cumsum(cnt2) - cnt2, cnt2)
              + np.repeat(j + 1, cnt2))
        ta, tb, tc = p[ii], p[jj], p[kk]
        # per-block pre-count identical triples
        arr = np.stack([ta, tb, tc], axis=1)
        uniqt, n = np.unique(arr, axis=0, return_counts=True)
        return pa.table({"pa_": pa.array(uniqt[:, 0], pa.int64()),
                         "pb_": pa.array(uniqt[:, 1], pa.int64()),
                         "pc_": pa.array(uniqt[:, 2], pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    partials = hash_bucket_agg(
        li, lambda b: np_col(b, "l_orderkey"), _triples, 32)
    counts = grouped_pandas_agg(
        partials, keys=["pa_", "pb_", "pc_"], aggs={"support": ("n", "sum")},
        num_buckets=16)
    return top_k(counts, by="support", k=TRIPLE_K,
                 tie_cols=["pa_", "pb_", "pc_"])


def _top_triples_sql() -> str:
    return (
        "WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey, "
        "l_partkey FROM lineitem) "
        "SELECT a.l_partkey AS pa_, b.l_partkey AS pb_, "
        "c.l_partkey AS pc_, CAST(count(*) AS BIGINT) AS support "
        "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        "JOIN items c ON b.l_orderkey = c.l_orderkey "
        "AND b.l_partkey < c.l_partkey "
        "GROUP BY 1, 2, 3 "
        f"ORDER BY support DESC, pa_, pb_, pc_ LIMIT {TRIPLE_K}"
    )


def _q_butterflies(sf_dir: str):
    """Bipartite butterfly (2×2 biclique) count over the ORIGINAL
    order×part graph: a co-purchase edge of weight w means w shared
    orders, so butterflies = Σ C(w, 2) over the derived pair table —
    the hot bipartite-motif primitive reduced to ONE zero-shuffle scan
    of the already-derived weighted edges (each block folds a single
    int64 partial)."""
    from essentials_rd.util import np_col

    _, edges = _graph(sf_dir, weighted=True)

    def _partial(t: pa.Table) -> pa.Table:
        w = np.asarray(t.column("weight").to_numpy(zero_copy_only=False),
                       np.int64)
        return pa.table({"b": pa.array([int((w * (w - 1) // 2).sum())],
                                       pa.int64())})

    parts = (edges.map_batches(_partial, batch_format="pyarrow")
             .take_all())
    return pa.table({"butterflies": pa.array(
        [sum(r["b"] for r in parts)], pa.int64())})


def _butterflies_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES} "
        "SELECT CAST(sum((CAST(weight AS BIGINT) * "
        "(CAST(weight AS BIGINT) - 1)) // 2) AS BIGINT) AS butterflies "
        "FROM pairs"
    )


RICH_KS = [2, 4, 8, 16, 32]


def _q_rich_club(sf_dir: str):
    """Rich-club profile: for each degree threshold k, how many
    vertices exceed it (n_k) and how many edges run between them (e_k)
    — the coefficient φ(k) = e_k / C(n_k, 2) derives from two exact
    ints per row.  Degree vector broadcast once; one zero-shuffle edge
    scan folds a length-|K| counter vector per block."""
    import ray

    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for dt in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(dt, "vid"))
        deg[pos] += np_col(dt, "outdeg")
    ks = np.array(RICH_KS, np.int64)
    n_k = np.array([(deg > k).sum() for k in ks], np.int64)
    deg_ref = ray.put((vids, deg))

    def _partial(t: pa.Table) -> pa.Table:
        vv, dd = ray.get(deg_ref)
        s = dd[np.searchsorted(vv, np_col(t, "src").astype(np.int64))]
        d = dd[np.searchsorted(vv, np_col(t, "dst").astype(np.int64))]
        m = np.minimum(s, d)
        ek = np.array([(m > k).sum() for k in ks], np.int64)
        return pa.table({"ek": pa.array([ek.tobytes()], pa.large_binary())})

    parts = (edges.select_columns(["src", "dst"])
             .map_batches(_partial, batch_format="pyarrow").take_all())
    tot = np.zeros(len(ks), np.int64)
    for r in parts:
        tot += np.frombuffer(r["ek"], np.int64)
    return pa.table({"k": pa.array(ks, pa.int64()),
                     "n_k": pa.array(n_k, pa.int64()),
                     "e_k": pa.array(tot, pa.int64())})


def _rich_club_sql() -> str:
    ks = ", ".join(str(k) for k in RICH_KS)
    return (
        f"WITH {_GRAPH_CTES}, ks AS (SELECT unnest([{ks}]) AS k) "
        "SELECT CAST(ks.k AS BIGINT) AS k, "
        "CAST((SELECT count(*) FROM deg WHERE outdeg > ks.k) AS BIGINT) "
        "AS n_k, "
        "CAST((SELECT count(*) FROM pairs p "
        "JOIN deg da ON da.vid = p.src JOIN deg db ON db.vid = p.dst "
        "WHERE least(da.outdeg, db.outdeg) > ks.k) AS BIGINT) AS e_k "
        "FROM ks ORDER BY ks.k"
    )


def _q_squares(sf_dir: str):
    """4-cycle count (algorithms.squares): the wedge-pair identity
    #C4 = ½·Σ C(cn(u,v), 2) — vectorized sorted-neighbor pair
    expansion per center, one bucketed exchange on the packed pair,
    per-bucket Σ C(c,2) folds, two exact integers out."""
    from essentials_rd.algorithms.squares import squares_total

    _, edges = _graph(sf_dir)
    return squares_total(edges)


def _q_k4(sf_dir: str):
    """4-clique census (algorithms.kclique.k4_total): id-ordered
    kClist — every K4 counted once as its sorted tuple via the
    triangle of its three smallest vertices extended by one semi-join
    probe pair; exact packed (lo<<32|hi) keys everywhere, never a
    hash, so no collision caveat.  The triangle count rides along and
    cross-checks the TC engine."""
    from essentials_rd.algorithms.kclique import k4_total

    _, edges = _graph(sf_dir)
    return k4_total(edges)


def _k4_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, "
        "tri AS (SELECT count(*) AS t FROM pairs e1 "
        "JOIN pairs e2 ON e2.src = e1.src AND e2.dst > e1.dst "
        "JOIN pairs e3 ON e3.src = e1.dst AND e3.dst = e2.dst), "
        "k4c AS (SELECT count(*) AS k FROM pairs e1 "
        "JOIN pairs e2 ON e2.src = e1.src AND e2.dst > e1.dst "
        "JOIN pairs e3 ON e3.src = e1.dst AND e3.dst = e2.dst "
        "JOIN pairs e4 ON e4.src = e1.src AND e4.dst > e2.dst "
        "JOIN pairs e5 ON e5.src = e1.dst AND e5.dst = e4.dst "
        "JOIN pairs e6 ON e6.src = e2.dst AND e6.dst = e4.dst) "
        "SELECT CAST(tri.t AS BIGINT) AS triangles, "
        "CAST(k4c.k AS BIGINT) AS k4 FROM tri, k4c"
    )


def _squares_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, "
        "w AS (SELECT e1.dst AS u, e2.dst AS v, count(*) AS c "
        "FROM sym e1 JOIN sym e2 ON e1.src = e2.src "
        "AND e1.dst < e2.dst GROUP BY 1, 2) "
        "SELECT CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS wedge_pairs, "
        "CAST(sum((c * (c - 1)) // 2) // 2 AS BIGINT) AS squares FROM w"
    )


HUB_H = 10


PERC_NUM, PERC_DEN = 1, 2  # keep each edge with probability 1/2
PERC_SEED = 99


def _q_bond_percolation(sf_dir: str):
    """Bond-percolation robustness (random FAILURE, the complement of
    hub_robustness's targeted attack): keep each edge iff
    splitmix64(src·2³² + dst + seed·golden) < (num/den)·2⁶⁴ — a pure
    function of the edge, identical at any layout — then the verified
    CC engine reports the component-size histogram of the survived
    subgraph.  One stateless filter scan + one persist=False rebuild."""
    import os as _os
    import tempfile

    import ray

    from essentials_rd.algorithms import connected_components
    from essentials_rd.graph import build_graph
    from essentials_rd.util import hash64, np_col

    g, edges = _graph(sf_dir)
    thr = np.uint64((PERC_NUM << 64) // PERC_DEN - 1)  # floor((n/d)·2^64)
    mix = np.uint64((PERC_SEED * 0x9E3779B97F4A7C15) % (1 << 64))

    def _keep(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64).view(np.uint64)
        d = np_col(t, "dst").astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            key = (s << np.uint64(32)) + d + mix
        h = hash64(key.view(np.int64))
        m = h < thr
        return pa.table({"src": pa.array(s[m].view(np.int64), pa.int64()),
                         "dst": pa.array(d[m].view(np.int64), pa.int64())})

    sub = edges.select_columns(["src", "dst"]).map_batches(
        _keep, batch_format="pyarrow")
    vids = ray.get(g.vertex_ids_ref)
    gd = build_graph(sub, _os.path.join(tempfile.gettempdir(),
                                        "essentials_rd_perc"),
                     g.num_parts, symmetrize=True, persist=False,
                     vertex_ids=vids)
    cc = connected_components(gd, max_iters=2 * CC_ITERS,
                              checkpoint_every=0, scatter_mode="fused")
    lab = np.asarray(cc.state_table(["label"])["label"], np.int64)
    _, csz = np.unique(lab, return_counts=True)
    size, n = np.unique(csz, return_counts=True)
    return pa.table({"size": pa.array(size.astype(np.int64), pa.int64()),
                     "n_components": pa.array(n.astype(np.int64),
                                              pa.int64())})


ICM_SAMPLES = 6
ICM_PNUM, ICM_PDEN = 1, 4
ICM_HOPS = 3
ICM_SEED = 11
ICM_NSEEDS = 4


def _q_ic_spread(sf_dir: str):
    """Independent-cascade influence spread (algorithms.icm.ic_spread,
    Kempe–Kleinberg–Tardos): for the top-4-degree candidate seeds, the
    exact number of vertices each reaches within 3 hops in each of 6
    deterministic live-edge samples — edge (u,v) live in sample r iff
    splitmix64(u·2³² + v + (seed+r)·golden) < p·2⁶⁴, each direction
    independent (the IC contract).  Sampling is a stateless
    zero-shuffle filter; all R×S cascades share one bitmask state, two
    exchanges per hop.  The spread estimate is mean(n_reached) per
    seed; the raw integers hash-match SQL where a float mean might
    not."""
    import ray

    from essentials_rd.algorithms.icm import ic_spread
    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for t in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(t, "vid"))
        deg[pos] += np_col(t, "outdeg")
    seeds = vids[np.lexsort((vids, -deg))[:ICM_NSEEDS]]
    return ic_spread(edges.select_columns(["src", "dst"]), seeds,
                     n_samples=ICM_SAMPLES, p_num=ICM_PNUM, p_den=ICM_PDEN,
                     hops=ICM_HOPS, seed=ICM_SEED)


def _ic_spread_sql() -> str:
    thr = (ICM_PNUM << 64) // ICM_PDEN - 1
    chain = _sm64_ctes(
        "icz", "src, dst, r",
        f"src * 4294967296 + dst + 11400714819323198485 * ({ICM_SEED} + r)",
        f"(SELECT src, dst, r FROM sym, "
        f"(SELECT unnest(range({ICM_SAMPLES})) AS r))")
    steps = [
        f"live AS MATERIALIZED (SELECT src, dst, r FROM icz3 "
        f"WHERE z < CAST('{thr}' AS UBIGINT))",
        "sd AS (SELECT vid, row_number() OVER (ORDER BY outdeg DESC, vid)"
        " - 1 AS b FROM (SELECT vid, outdeg FROM deg "
        f"ORDER BY outdeg DESC, vid LIMIT {ICM_NSEEDS}))",
        f"im0 AS (SELECT r, vid, CAST(1 << b AS BIGINT) AS m FROM sd, "
        f"(SELECT unnest(range({ICM_SAMPLES})) AS r))",
    ]
    for k in range(1, ICM_HOPS + 1):
        steps.append(
            f"im{k} AS MATERIALIZED (SELECT r, vid, bit_or(m) AS m FROM ("
            f"SELECT e.r, e.dst AS vid, p.m FROM live e "
            f"JOIN im{k - 1} p ON p.r = e.r AND p.vid = e.src "
            f"UNION ALL SELECT r, vid, m FROM im{k - 1}) GROUP BY r, vid)")
    return (
        f"WITH {_GRAPH_CTES}, {chain}, {', '.join(steps)} "
        f"SELECT m.r AS sample, s.vid AS seed, "
        f"CAST(count(*) AS BIGINT) AS n_reached "
        f"FROM im{ICM_HOPS} m JOIN sd s ON ((m.m >> s.b) & 1) = 1 "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )


ICMS_CANDS = 6   # candidate pool: top-6 degree
ICMS_K = 3       # greedy picks
ICMS_SAMPLES = 4
ICMS_PNUM, ICMS_PDEN = 1, 3
ICMS_HOPS = 2


def _q_influence_seeds(sf_dir: str):
    """Greedy influence maximization (algorithms.icm.influence_seeds —
    the KKT (1−1/e) submodular greedy): pick 3 seeds from the top-6
    degree candidates, each round taking the largest MARGINAL coverage
    over 4 deterministic live-edge samples.  The greedy runs off one
    distributed artifact — the 2⁶-bin reach-mask histogram, pre-combined
    per block — so selection costs a 64-int driver fold after the
    cascade, zero further data passes."""
    import ray

    from essentials_rd.algorithms.icm import influence_seeds
    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for t in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(t, "vid"))
        deg[pos] += np_col(t, "outdeg")
    cands = vids[np.lexsort((vids, -deg))[:ICMS_CANDS]]
    return influence_seeds(edges.select_columns(["src", "dst"]), cands,
                           k=ICMS_K, n_samples=ICMS_SAMPLES,
                           p_num=ICMS_PNUM, p_den=ICMS_PDEN,
                           hops=ICMS_HOPS, seed=ICM_SEED)


def _influence_seeds_sql() -> str:
    thr = (ICMS_PNUM << 64) // ICMS_PDEN - 1
    chain = _sm64_ctes(
        "isz", "src, dst, r",
        f"src * 4294967296 + dst + 11400714819323198485 * ({ICM_SEED} + r)",
        f"(SELECT src, dst, r FROM sym, "
        f"(SELECT unnest(range({ICMS_SAMPLES})) AS r))")
    steps = [
        f"ilive AS MATERIALIZED (SELECT src, dst, r FROM isz3 "
        f"WHERE z < CAST('{thr}' AS UBIGINT))",
        "isd AS (SELECT vid, row_number() OVER (ORDER BY outdeg DESC, vid)"
        " - 1 AS b FROM (SELECT vid, outdeg FROM deg "
        f"ORDER BY outdeg DESC, vid LIMIT {ICMS_CANDS}))",
        f"is0 AS (SELECT r, vid, CAST(1 << b AS BIGINT) AS m FROM isd, "
        f"(SELECT unnest(range({ICMS_SAMPLES})) AS r))",
    ]
    for k in range(1, ICMS_HOPS + 1):
        steps.append(
            f"is{k} AS MATERIALIZED (SELECT r, vid, bit_or(m) AS m FROM ("
            f"SELECT e.r, e.dst AS vid, p.m FROM ilive e "
            f"JOIN is{k - 1} p ON p.r = e.r AND p.vid = e.src "
            f"UNION ALL SELECT r, vid, m FROM is{k - 1}) GROUP BY r, vid)")
    fin = f"is{ICMS_HOPS}"
    picked: list[str] = []
    for j in range(1, ICMS_K + 1):
        cover = (f" AND (m.m & (SELECT mm FROM cm{j - 1})) = 0"
                 if j > 1 else "")
        excl = (" WHERE s.b NOT IN ("
                + " UNION ALL ".join(f"SELECT b FROM c{i}" for i in picked)
                + ")") if picked else ""
        steps.append(
            f"g{j} AS (SELECT s.b, s.vid, CAST(count(m.m) AS BIGINT) AS "
            f"gain FROM isd s LEFT JOIN {fin} m ON ((m.m >> s.b) & 1) = 1"
            f"{cover}{excl} GROUP BY 1, 2)")
        steps.append(
            f"c{j} AS (SELECT b, vid, gain FROM g{j} "
            f"ORDER BY gain DESC, vid LIMIT 1)")
        prev = f"(SELECT mm FROM cm{j - 1}) | " if j > 1 else ""
        steps.append(
            f"cm{j} AS (SELECT {prev}(SELECT CAST(1 << b AS BIGINT) "
            f"FROM c{j}) AS mm)")
        picked.append(str(j))
    sel = " UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS rank, vid AS seed, gain FROM c{j}"
        for j in range(1, ICMS_K + 1))
    return f"WITH {_GRAPH_CTES}, {chain}, {', '.join(steps)} {sel} " \
           "ORDER BY rank"


INCR_CC_DEN = 8  # 1/8 of the edges arrive as the "new" delta batch


def _q_incr_cc(sf_dir: str):
    """Incremental CC maintenance (algorithms.cc.cc_incremental): split
    the derived edges deterministically (splitmix64 of the packed pair,
    a pure function of the edge — ~1/8 land in the delta), run the
    verified hash-min engine on the BASE subgraph only, then fold the
    delta in via cc_incremental — two partitioned label joins + one
    driver fixpoint over the contracted (≤|delta|) pair set + one
    rewrite pass.  The oracle recomputes CC over ALL edges from
    scratch, so a hash match proves the incremental result is
    bit-identical to the full rerun — the graph-IVM contract."""
    import os as _os
    import tempfile

    import ray
    import ray.data as rd

    from essentials_rd.algorithms import connected_components
    from essentials_rd.algorithms.cc import cc_incremental, components_table
    from essentials_rd.graph import build_graph
    from essentials_rd.util import hash64, np_col

    g, edges = _graph(sf_dir)

    def _split(t: pa.Table, want_delta: bool) -> pa.Table:
        s = np_col(t, "src").astype(np.int64).view(np.uint64)
        d = np_col(t, "dst").astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            key = (s << np.uint64(32)) + d
        m = (hash64(key.view(np.int64)).view(np.uint64)
             % np.uint64(INCR_CC_DEN)) == 0
        if not want_delta:
            m = ~m
        return pa.table({"src": pa.array(s[m].view(np.int64), pa.int64()),
                         "dst": pa.array(d[m].view(np.int64), pa.int64())})

    e = edges.select_columns(["src", "dst"])
    base = e.map_batches(lambda t: _split(t, False), batch_format="pyarrow")
    delta = e.map_batches(lambda t: _split(t, True), batch_format="pyarrow")
    vids = ray.get(g.vertex_ids_ref)
    gb = build_graph(base, _os.path.join(tempfile.gettempdir(),
                                         "essentials_rd_incrcc"),
                     g.num_parts, symmetrize=True, persist=False,
                     vertex_ids=vids)
    cc = connected_components(gb, max_iters=2 * CC_ITERS,
                              checkpoint_every=0, scatter_mode="fused")
    labels = rd.from_arrow(components_table(cc))
    out = cc_incremental(labels, delta).take_all()
    out.sort(key=lambda r: r["vid"])
    return pa.table({
        "vid": pa.array([r["vid"] for r in out], pa.int64()),
        "label": pa.array([r["label"] for r in out], pa.int64()),
    })


def _bond_percolation_sql() -> str:
    mix = (PERC_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    thr = (PERC_NUM << 64) // PERC_DEN - 1
    chain = _sm64_ctes("pz", "src, dst",
                       f"src * 4294967296 + dst + {mix}", "pairs")
    steps = ["p0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)"]
    for k in range(CC_ITERS):
        steps.append(f"""
pm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM psym e JOIN p{k} l ON l.vid = e.src GROUP BY e.dst
),
p{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM p{k} v LEFT JOIN pm{k} m ON m.vid = v.vid
)""")
    return (
        f"WITH {_GRAPH_CTES}, {chain}, "
        "pkeep AS MATERIALIZED (SELECT src, dst FROM pz3 "
        f"WHERE z < CAST('{thr}' AS UBIGINT)), "
        "psym AS MATERIALIZED (SELECT src, dst FROM pkeep "
        "UNION ALL SELECT dst, src FROM pkeep), "
        + ",".join(steps) + " "
        "SELECT n AS size, CAST(count(*) AS BIGINT) AS n_components "
        f"FROM (SELECT label, count(*) AS n FROM p{CC_ITERS} GROUP BY 1) "
        "GROUP BY 1 ORDER BY 1"
    )


def _q_hub_robustness(sf_dir: str):
    """Network-robustness what-if (targeted-attack analysis, the
    Albert–Jeong–Barabási shape): remove the top-H degree hubs
    (deterministic (deg desc, vid) order), re-run the SAME hash-min CC
    engine on the remaining subgraph, and report the component-size
    histogram — how the giant component shatters.  Edge filtering is
    one broadcast-set scan; the CC is the already-verified engine on a
    persist=False rebuild."""
    import ray
    import ray.data as rd

    from essentials_rd.algorithms import connected_components
    from essentials_rd.graph import build_graph
    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for dt in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(dt, "vid"))
        deg[pos] += np_col(dt, "outdeg")
    order = np.lexsort((vids, -deg))[:HUB_H]
    hubs = np.sort(vids[order])

    def _drop(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64)
        d = np_col(t, "dst").astype(np.int64)
        keep = ~np.isin(s, hubs) & ~np.isin(d, hubs)
        return pa.table({"src": pa.array(s[keep], pa.int64()),
                         "dst": pa.array(d[keep], pa.int64())})

    sub = edges.map_batches(_drop, batch_format="pyarrow")
    keep_v = vids[~np.isin(vids, hubs)]
    import os as _os
    import tempfile

    gd = build_graph(sub, _os.path.join(tempfile.gettempdir(),
                                        "essentials_rd_hubrob"),
                     g.num_parts, symmetrize=True, persist=False,
                     vertex_ids=keep_v)
    cc = connected_components(gd, max_iters=2 * CC_ITERS,
                              checkpoint_every=0, scatter_mode="fused")
    lab = np.asarray(cc.state_table(["label"])["label"], np.int64)
    _, csz = np.unique(lab, return_counts=True)
    size, n = np.unique(csz, return_counts=True)
    return pa.table({"size": pa.array(size.astype(np.int64), pa.int64()),
                     "n_components": pa.array(n.astype(np.int64),
                                              pa.int64())})


def _hub_robustness_sql() -> str:
    steps = ["r0 AS MATERIALIZED (SELECT vid, vid AS label FROM rverts)"]
    for k in range(CC_ITERS):
        steps.append(f"""
rm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM rsym e JOIN r{k} l ON l.vid = e.src GROUP BY e.dst
),
r{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM r{k} v LEFT JOIN rm{k} m ON m.vid = v.vid
)""")
    return (
        f"WITH {_GRAPH_CTES}, "
        "hub AS MATERIALIZED (SELECT vid FROM deg "
        f"ORDER BY outdeg DESC, vid LIMIT {HUB_H}), "
        "rverts AS MATERIALIZED (SELECT vid FROM verts "
        "WHERE vid NOT IN (SELECT vid FROM hub)), "
        "rsym AS MATERIALIZED (SELECT src, dst FROM sym "
        "WHERE src NOT IN (SELECT vid FROM hub) "
        "AND dst NOT IN (SELECT vid FROM hub)), "
        + ",".join(steps) + " "
        f"SELECT n AS size, CAST(count(*) AS BIGINT) AS n_components "
        f"FROM (SELECT label, count(*) AS n FROM r{CC_ITERS} GROUP BY 1) "
        "GROUP BY 1 ORDER BY 1"
    )


def _q_ppr_sweep(sf_dir: str):
    """PPR sweep-cut conductance profile (algorithms.sweep — the
    Andersen–Chung–Lang local-clustering sweep): rank vertices by the
    6-dp-rounded PPR score (desc, vid tie-break — the exact order the
    oracle's window reproduces), keep the top SWEEP_T, and report each
    prefix's exact integer (cut, volume).  The edge table never moves:
    every block folds two (T+2)-bin endpoint-rank histograms and the
    driver prefix-sums them; conductance derives from the two int64
    columns."""
    import ray

    from essentials_rd.algorithms import ppr
    from essentials_rd.algorithms.ppr import ppr_table
    from essentials_rd.algorithms.sweep import sweep_profile
    from essentials_rd.pipelines import round_half_up
    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    source = int(np.min(vids))
    res = ppr(g, source, tol=0.0, max_iters=PPR_ITERS, checkpoint_every=0,
              scatter_mode="fused")
    t = ppr_table(res)
    tv = np.asarray(t["vid"], np.int64)
    vals6 = round_half_up(np.asarray(t["ppr"], dtype=np.float64), 6)
    nz = vals6 > 0
    tv, vals6 = tv[nz], vals6[nz]
    order = np.lexsort((tv, -vals6))[:SWEEP_T]
    ranked = tv[order]
    deg = np.zeros(len(vids), np.int64)
    for dt in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(dt, "vid"))
        deg[pos] += np_col(dt, "outdeg")
    degrees = deg[np.searchsorted(vids, ranked)]
    return sweep_profile(edges, ranked, degrees)


def _ppr_sweep_sql() -> str:
    """Window twin: rank from the shared PPR unroll, per-rank
    endpoint histograms over the canonical pair list, window prefix
    sums for cut and volume."""
    ppr_body = _ppr_sql_body()
    return (
        f"WITH {_GRAPH_CTES}, {ppr_body}, "
        "ranked AS (SELECT vid, CAST(row_number() OVER ("
        "ORDER BY val6 DESC, vid) AS BIGINT) AS r FROM ("
        f"SELECT vid, ROUND(val, 6) AS val6 FROM q{PPR_ITERS}) "
        f"WHERE val6 > 0 ORDER BY val6 DESC, vid LIMIT {SWEEP_T}), "
        "er AS (SELECT least(COALESCE(ra.r, 1000000), "
        "COALESCE(rb.r, 1000000)) AS minr, "
        "greatest(COALESCE(ra.r, 1000000), COALESCE(rb.r, 1000000)) AS maxr "
        "FROM pairs e LEFT JOIN ranked ra ON ra.vid = e.src "
        "LEFT JOIN ranked rb ON rb.vid = e.dst), "
        "mh AS (SELECT minr AS r, count(*) AS c FROM er "
        f"WHERE minr <= {SWEEP_T} GROUP BY 1), "
        "xh AS (SELECT maxr AS r, count(*) AS c FROM er "
        f"WHERE maxr <= {SWEEP_T} GROUP BY 1) "
        "SELECT r.r AS k, r.vid, "
        "CAST(SUM(COALESCE(mh.c, 0)) OVER w - "
        "SUM(COALESCE(xh.c, 0)) OVER w AS BIGINT) AS cut_k, "
        "CAST(SUM(d.outdeg) OVER w AS BIGINT) AS vol_k "
        "FROM ranked r LEFT JOIN mh ON mh.r = r.r "
        "LEFT JOIN xh ON xh.r = r.r JOIN deg d ON d.vid = r.vid "
        "WINDOW w AS (ORDER BY r.r) ORDER BY r.r"
    )


def _q_kcore(sf_dir: str):
    """k-core membership (k=KCORE_K) by BSP peeling; oracle is the
    unrolled simultaneous-peeling CTE (the k-core is unique, so both
    fixpoints agree)."""
    from essentials_rd.algorithms import kcore
    from essentials_rd.algorithms.kcore import kcore_table

    g, _ = _graph(sf_dir)
    res = kcore(g, KCORE_K, max_iters=2 * KCORE_ITERS, checkpoint_every=0,
                scatter_mode="fused")
    assert res.converged and res.supersteps <= KCORE_ITERS, (
        "k-core did not converge within the oracle's unrolled iteration count"
    )
    return kcore_table(res)


SPGEMM_MOD = 31
EC_ITERS = 6
COLOR_W = 3
COLOR_ITERS = 40


def _q_coloring(sf_dir: str):
    """Deterministic Luby-style greedy coloring of the weight≥COLOR_W
    co-purchase subgraph (full part universe; isolated vertices take
    color 0).  The per-round priority is SQL-reproducible, so the
    oracle replays the exact same rounds."""
    import pyarrow.compute as pc

    from essentials_rd.algorithms import color
    from essentials_rd.algorithms.color import colors_table
    from essentials_rd.graph import build_graph
    from essentials_rd.pipelines import _work_dir, copurchase_edges, part_universe

    edges = copurchase_edges(sf_dir).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("weight"), COLOR_W)),
        batch_format="pyarrow",
    ).select_columns(["src", "dst"])
    g = build_graph(edges, _work_dir("colorg"), 8, symmetrize=True,
                    vertex_ids=part_universe(sf_dir))
    res = color(g, max_iters=2 * COLOR_ITERS, checkpoint_every=0,
                scatter_mode="fused")
    assert res.converged and res.supersteps <= COLOR_ITERS, (
        "coloring did not converge within the oracle's unrolled rounds"
    )
    return colors_table(res)


def _q_eigencentrality(sf_dir: str):
    """Eigenvector centrality, exactly EC_ITERS L1-normalized power
    steps (tol=0); half-up 6dp rounding on both sides."""
    from essentials_rd.algorithms import eigencentrality
    from essentials_rd.algorithms.eigencentrality import centrality_table
    from essentials_rd.pipelines import round_half_up

    g, _ = _graph(sf_dir)
    res = eigencentrality(g, tol=0.0, max_iters=EC_ITERS, checkpoint_every=0,
                          scatter_mode="fused")
    t = centrality_table(res)
    vals = round_half_up(np.asarray(t["centrality"], dtype=np.float64), 6)
    return pa.table({"vid": t["vid"],
                     "centrality": pa.array(vals, pa.float64())})


def _q_spgemm(sf_dir: str):
    """A·A over the weighted canonical co-purchase matrix, rows sampled
    deterministically (src % SPGEMM_MOD == 0) to bound output — the
    sample filter is pushed to the LEFT matrix before the join, so only
    ~1/31 of A participates as rows.  Weights are integer-valued, so
    sums of products are float64-exact on both sides."""
    import pyarrow.compute as pc

    from essentials_rd.algorithms import spgemm
    from essentials_rd.pipelines import copurchase_edges

    edges = copurchase_edges(sf_dir).select_columns(["src", "dst", "weight"])
    def _sample_rows(t):
        from essentials_rd.util import np_col

        keep = np_col(t, "src") % SPGEMM_MOD == 0
        return t.filter(pa.array(keep))

    left = edges.map_batches(_sample_rows, batch_format="pyarrow")
    return spgemm(left, edges, num_buckets=64)


def _q_tfidf(sf_dir: str):
    """Per-document top TF-IDF token (linear idf = tf·N/df, exact
    integer ratio — bit-identical to the SQL oracle; ties by token)."""
    import ray.data as rd

    from essentials_rd.textops import tfidf_top1

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return tfidf_top1(docs)


def _q_fluency(sf_dir: str):
    """Corpus bigram-frequency fluency per document (textops.
    bigram_fluency): n_bigrams + freq_sum = Σ occurrences of corpus
    bigram counts — both exact ints, distributed count + join, the
    bigram vocabulary never driver-collected."""
    import ray.data as rd

    from essentials_rd.textops import bigram_fluency

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return bigram_fluency(docs)


GEO_ITERS = 16
BC_SOURCES = 2
BC_D = 6


def _q_betweenness(sf_dir: str):
    """Sampled-source Brandes betweenness (BC_SOURCES smallest vids),
    unnormalized δ-sums — half-up 6dp rounding on both sides; the
    forward BFS depth is asserted ≤ BC_D (the oracle's unrolled level
    count)."""
    import ray

    from essentials_rd.algorithms import betweenness
    from essentials_rd.pipelines import round_half_up

    g, _ = _graph(sf_dir)
    vids = np.sort(np.asarray(ray.get(g.vertex_ids_ref), np.int64))
    t = betweenness(g, vids[:BC_SOURCES], max_depth=BC_D,
                    scatter_mode="fused")
    vals = round_half_up(np.asarray(t["bc"], dtype=np.float64), 6)
    return pa.table({"vid": t["vid"], "bc": pa.array(vals, pa.float64())})


def _q_edge_betweenness(sf_dir: str):
    """Sampled-source EDGE betweenness (algorithms.edge_betweenness,
    the Girvan-Newman edge-removal score): same forward σ + backward δ
    BSP runs as bc_sampled, but the per-edge dependency
    σ(parent)·(1+δ(child))/σ(child) is a pure endpoint function — each
    source adds one broadcast map_batches stage over the canonical
    pair table, zero extra shuffles.  Unnormalized Σ over the
    BC_SOURCES smallest vids, half-up 6dp both sides; only edges with
    ebc > 0 returned (the zero tail is the bulk of the table)."""
    import ray

    from essentials_rd.algorithms.bc import edge_betweenness
    from essentials_rd.pipelines import round_half_up
    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir)
    vids = np.sort(np.asarray(ray.get(g.vertex_ids_ref), np.int64))
    ds = edge_betweenness(g, edges, vids[:BC_SOURCES], max_depth=BC_D,
                          scatter_mode="fused")
    rows = ds.take_all()
    src = np.array([r["src"] for r in rows], np.int64)
    dst = np.array([r["dst"] for r in rows], np.int64)
    ebc = round_half_up(np.array([r["ebc"] for r in rows], np.float64), 6)
    m = ebc > 0
    o = np.lexsort((dst[m], src[m]))
    return pa.table({
        "src": pa.array(src[m][o], pa.int64()),
        "dst": pa.array(dst[m][o], pa.int64()),
        "ebc": pa.array(ebc[m][o], pa.float64()),
    })


def _ebc_sql() -> str:
    """Per-source per-level edge terms over the same lv/sg/dl unroll
    as _bc_sql: parent at level r, child at r+1 (sym covers both
    orientations; BFS gaps are never > 1)."""
    inner = _bc_sql()
    prefix = inner[len("WITH "):inner.rindex("SELECT v.vid")]
    terms = []
    for i in range(BC_SOURCES):
        for r in range(BC_D):
            djoin = (f"LEFT JOIN dl{i}_{r + 1} dd ON dd.vid = e.dst"
                     if r + 1 < BC_D else
                     f"LEFT JOIN dl{i}_{BC_D} dd ON dd.vid = e.dst")
            terms.append(
                f"SELECT least(e.src, e.dst) AS src, "
                f"greatest(e.src, e.dst) AS dst, "
                f"pu.sigma * (1.0 + COALESCE(dd.delta, 0.0)) / cw.sigma "
                f"AS term FROM sym e "
                f"JOIN sg{i}_{r} pu ON pu.vid = e.src "
                f"JOIN sg{i}_{r + 1} cw ON cw.vid = e.dst {djoin}")
    union = " UNION ALL ".join(terms)
    return (
        f"WITH {prefix.rstrip().rstrip(',')} "
        f"SELECT src, dst, ROUND(sum(term), 6) AS ebc "
        f"FROM ({union}) GROUP BY 1, 2 HAVING ROUND(sum(term), 6) > 0 "
        f"ORDER BY 1, 2"
    )


def _q_euler_check(sf_dir: str):
    """Eulerian-traversal audit per component: (component label,
    n_vertices, n_odd-degree) plus the circuit/path feasibility flags
    (all-even ⇔ circuit; ≤2 odd ⇔ open trail) — the route-inspection
    screen, composed from the degree scan + the verified CC engine.
    Runs on the same splitmix-sparsified (p = 1/32) co-purchase
    subgraph as ``bridges``: the full graph is one big even-ish
    component (a vacuous 1-row check), while the percolated one has
    hundreds of components with real pendant (odd-degree) vertices.
    One grouped fold over driver-small (label, parity) rows."""
    import os as _os
    import tempfile

    import ray

    from essentials_rd.algorithms import connected_components
    from essentials_rd.algorithms.cc import components_table
    from essentials_rd.graph import build_graph
    from essentials_rd.util import hash64, np_col

    g, edges = _graph(sf_dir)
    thr = np.uint64((BRIDGE_NUM << 64) // BRIDGE_DEN - 1)
    mix = np.uint64((BRIDGE_SEED * 0x9E3779B97F4A7C15) % (1 << 64))

    def _keep(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64).view(np.uint64)
        d = np_col(t, "dst").astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            key = (s << np.uint64(32)) + d + mix
        h = hash64(key.view(np.int64))
        m = h < thr
        return pa.table({"src": pa.array(s[m].view(np.int64), pa.int64()),
                         "dst": pa.array(d[m].view(np.int64), pa.int64())})

    sub = edges.select_columns(["src", "dst"]).map_batches(
        _keep, batch_format="pyarrow").materialize()
    vids_all = ray.get(g.vertex_ids_ref)
    gb = build_graph(sub, _os.path.join(tempfile.gettempdir(),
                                        "essentials_rd_euler"),
                     g.num_parts, symmetrize=True, persist=False,
                     vertex_ids=vids_all)
    cc = components_table(connected_components(
        gb, max_iters=2 * CC_ITERS, checkpoint_every=0,
        scatter_mode="fused"))
    vids = np.asarray(cc["vid"], np.int64)
    labels = np.asarray(cc["label"], np.int64)

    vref = ray.put(vids)

    def _degp(b: pa.Table) -> pa.Table:
        vv = ray.get(vref)
        u = np.r_[np_col(b, "src"), np_col(b, "dst")].astype(np.int64)
        i = np.searchsorted(vv, u)
        iu, c = np.unique(i, return_counts=True)
        return pa.table({"i": pa.array(iu, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    deg = np.zeros(len(vids), np.int64)
    for r in sub.map_batches(_degp, batch_format="pyarrow").take_all():
        deg[r["i"]] += r["c"]
    from essentials_rd.ops import euler_parity_fold
    return euler_parity_fold(labels, deg)


def _euler_sql() -> str:
    bmix = (BRIDGE_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    bthr = (BRIDGE_NUM << 64) // BRIDGE_DEN - 1
    keep_chain = _sm64_ctes("kz", "src, dst",
                            f"src * 4294967296 + dst + {bmix}", "pairs")
    steps = [
        keep_chain,
        "bpairs AS MATERIALIZED (SELECT src, dst FROM kz3 "
        f"WHERE z < CAST('{bthr}' AS UBIGINT)), "
        "bsym AS MATERIALIZED (SELECT src, dst FROM bpairs "
        "UNION ALL SELECT dst, src FROM bpairs)",
        "l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)",
    ]
    for k in range(CC_ITERS):
        steps.append(f"""
m{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM bsym e JOIN l{k} l ON l.vid = e.src GROUP BY e.dst
),
l{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM l{k} v LEFT JOIN m{k} m ON m.vid = v.vid
)""")
    steps.append(
        "edeg AS (SELECT src AS vid, CAST(count(*) AS BIGINT) AS d "
        "FROM bsym GROUP BY 1)")
    return (
        f"WITH {_GRAPH_CTES}, " + ",".join(steps) + f"""
SELECT l.label, CAST(count(*) AS BIGINT) AS n_vertices,
       CAST(sum(COALESCE(d.d, 0) % 2) AS BIGINT) AS n_odd,
       CAST(CASE WHEN sum(COALESCE(d.d, 0) % 2) = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS has_circuit,
       CAST(CASE WHEN sum(COALESCE(d.d, 0) % 2) <= 2 THEN 1 ELSE 0 END
            AS BIGINT) AS has_trail
FROM l{CC_ITERS} l LEFT JOIN edeg d ON d.vid = l.vid
GROUP BY 1 ORDER BY 1""")


def _q_reciprocity(sf_dir: str):
    """Directed-edge reciprocity (Garlaschelli–Loffredo) of the
    part-transition graph: within every order, each part at
    l_linenumber r points to every part at r+1 (the tie-safe
    rank-k → k+1 cross product of windows.adjacent_rank_pairs —
    linenumbers repeat in this corpus, so a lag-based sequence would
    be tie-order-dependent); reciprocity = the share of distinct
    directed edges whose reverse also occurs somewhere in the corpus.
    One order-bucketed pair expansion + ONE unordered-pair-bucketed
    pass that fuses the global distinct with the reverse-membership
    test (ops.directed_reciprocity); two int64s per bucket reach the
    driver."""
    import ray.data as rd

    from essentials_rd.ops import directed_reciprocity
    from essentials_rd.windows import adjacent_rank_pairs

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber",
                                  "l_partkey"])
    pairs = adjacent_rank_pairs(li, "l_orderkey", "l_linenumber",
                                "l_partkey")
    return directed_reciprocity(pairs)


def _reciprocity_sql() -> str:
    return """
WITH e0 AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey
   AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
),
e AS MATERIALIZED (SELECT DISTINCT u, v FROM e0),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
r AS (SELECT CAST(count(*) AS BIGINT) AS n_recip
      FROM e a JOIN e b ON b.u = a.v AND b.v = a.u)
SELECT n.n_edges, r.n_recip,
       CAST(r.n_recip / 2 AS BIGINT) AS n_mutual_pairs,
       CAST(r.n_recip AS DOUBLE) / CAST(n.n_edges AS DOUBLE)
         AS reciprocity
FROM n, r"""


THETA_K = 64


def _q_theta_overlap(sf_dir: str):
    """Theta-sketch set intersection (the KMV / bottom-k mergeable
    summary, Bar-Yossef et al.): bottom-64 splitmix64 sketches of the
    urgent-order and high-order customer sets, θ = min of the two
    k-th values, intersection estimate = |sketchA ∩ sketchB below θ|
    · 2⁶⁴/θ — the composable distinct/overlap machinery ad-tech
    audience systems run, every number deterministic because the
    'randomness' is the shared splitmix64 bijection.  Each block
    ships its local bottom-k (ops.bottom_k_hashes); the exact audit
    counts ride ONE custkey-bucketed membership fold.  All estimate
    divisions are single IEEE ops the SQL twin reproduces."""
    import ray.data as rd

    from essentials_rd.ops import bottom_k_hashes, hash_bucket_agg
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"]
                             ).materialize()

    def _keys(pr: str):
        def f(b: pa.Table) -> np.ndarray:
            import pyarrow.compute as pc
            m = pc.equal(b.column("o_orderpriority"), pr)
            return np_col(b.filter(m), "o_custkey").astype(np.int64)
        return f

    ska = bottom_k_hashes(orders, _keys("1-URGENT"), THETA_K)
    skb = bottom_k_hashes(orders, _keys("2-HIGH"), THETA_K)
    assert len(ska) == THETA_K and len(skb) == THETA_K, \
        "set smaller than sketch — estimates degenerate"
    va, vb = int(ska[-1]), int(skb[-1])
    theta = min(va, vb)
    inter = np.intersect1d(ska, skb)
    n_inter = int((inter < np.uint64(theta)).sum())
    two64 = 2.0 ** 64
    est_a = (THETA_K - 1) * two64 / float(va)
    est_b = (THETA_K - 1) * two64 / float(vb)
    est_inter = float(n_inter) * two64 / float(theta)

    def _mem(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ck = np_col(b, "o_custkey").astype(np.int64)
        ia = pc.equal(b.column("o_orderpriority"),
                      "1-URGENT").to_numpy(zero_copy_only=False)
        ib = pc.equal(b.column("o_orderpriority"),
                      "2-HIGH").to_numpy(zero_copy_only=False)
        return pa.table({"ck": pa.array(ck, pa.int64()),
                         "ia": pa.array(ia.astype(np.int8), pa.int8()),
                         "ib": pa.array(ib.astype(np.int8), pa.int8())})

    def _fold(grp: pa.Table) -> pa.Table:
        ck = np_col(grp, "ck")
        ia = np_col(grp, "ia").astype(bool)
        ib = np_col(grp, "ib").astype(bool)
        order = np.argsort(ck, kind="stable")
        ck, ia, ib = ck[order], ia[order], ib[order]
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        ends = np.r_[starts[1:], len(ck)]
        ha = np.logical_or.reduceat(ia, starts)
        hb = np.logical_or.reduceat(ib, starts)
        _ = ends
        return pa.table({
            "na": pa.array([int(ha.sum())], pa.int64()),
            "nb": pa.array([int(hb.sum())], pa.int64()),
            "ni": pa.array([int((ha & hb).sum())], pa.int64()),
        })

    parts = hash_bucket_agg(
        orders.map_batches(_mem, batch_format="pyarrow"),
        lambda b: np_col(b, "ck").astype(np.int64), _fold,
        num_buckets=16).take_all()
    exact_a = sum(r["na"] for r in parts)
    exact_b = sum(r["nb"] for r in parts)
    exact_i = sum(r["ni"] for r in parts)
    return pa.table({
        "k": pa.array([THETA_K], pa.int64()),
        "theta": pa.array([float(theta)], pa.float64()),
        "n_inter_sk": pa.array([n_inter], pa.int64()),
        "est_a": pa.array([est_a], pa.float64()),
        "est_b": pa.array([est_b], pa.float64()),
        "est_inter": pa.array([est_inter], pa.float64()),
        "exact_a": pa.array([exact_a], pa.int64()),
        "exact_b": pa.array([exact_b], pa.int64()),
        "exact_inter": pa.array([exact_i], pa.int64()),
    })


def _theta_overlap_sql() -> str:
    k = THETA_K
    t64 = "18446744073709551616.0"
    ha = _sm64_ctes("tha", "key", "key",
                    "(SELECT DISTINCT o_custkey AS key FROM orders "
                    "WHERE o_orderpriority = '1-URGENT')")
    hb = _sm64_ctes("thb", "key", "key",
                    "(SELECT DISTINCT o_custkey AS key FROM orders "
                    "WHERE o_orderpriority = '2-HIGH')")
    return f"""
WITH {ha}, {hb},
ska AS (SELECT z FROM tha3 ORDER BY z LIMIT {k}),
skb AS (SELECT z FROM thb3 ORDER BY z LIMIT {k}),
va AS (SELECT max(z) AS v FROM ska),
vb AS (SELECT max(z) AS v FROM skb),
th AS (SELECT least((SELECT v FROM va), (SELECT v FROM vb)) AS t),
ni AS (SELECT CAST(count(*) AS BIGINT) AS n
       FROM ska a JOIN skb b ON b.z = a.z
       WHERE a.z < (SELECT t FROM th)),
ea AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS c
       FROM orders WHERE o_orderpriority = '1-URGENT'),
eb AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS c
       FROM orders WHERE o_orderpriority = '2-HIGH'),
ei AS (SELECT CAST(count(*) AS BIGINT) AS c FROM
       (SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT') a
       JOIN (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderpriority = '2-HIGH') b
       ON b.o_custkey = a.o_custkey)
SELECT CAST({k} AS BIGINT) AS k,
       CAST((SELECT t FROM th) AS DOUBLE) AS theta,
       (SELECT n FROM ni) AS n_inter_sk,
       {k - 1} * {t64} / CAST((SELECT v FROM va) AS DOUBLE) AS est_a,
       {k - 1} * {t64} / CAST((SELECT v FROM vb) AS DOUBLE) AS est_b,
       CAST((SELECT n FROM ni) AS DOUBLE) * {t64}
         / CAST((SELECT t FROM th) AS DOUBLE) AS est_inter,
       (SELECT c FROM ea) AS exact_a,
       (SELECT c FROM eb) AS exact_b,
       (SELECT c FROM ei) AS exact_inter"""


def _q_alt_bounds(sf_dir: str):
    """ALT (A*, Landmarks, Triangle inequality — Goldberg–Harrelson)
    preprocessing audit: BFS distance fields from two deterministic
    landmarks (max vid; min vid ≥ the id-range midpoint) give every
    vertex the lower bound max_l |d(l,s) − d(l,v)| on its true
    distance from the bfs_depth source s — the admissible heuristic
    that makes goal-directed search skip work.  Three runs of the
    verified BFS engine (shared graph build), one vectorized
    abs-diff/max readout; the engine asserts lb ≤ dist for every
    vertex (the triangle inequality the oracle then hash-pins).
    Emits (vid, dist, alt_lb) for vertices reachable in all three
    fields."""
    import ray

    from essentials_rd.algorithms import bfs
    from essentials_rd.algorithms.bfs import depths_table
    from essentials_rd.util import np_col

    g, _ = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    s = int(vids.min())
    l1 = int(vids.max())
    mid = (int(vids.min()) + int(vids.max())) // 2
    l2 = int(vids[np.searchsorted(vids, mid)])

    def _depths(src: int) -> tuple:
        res = bfs(g, src, max_iters=2 * BFS_ITERS, checkpoint_every=0,
                  scatter_mode="fused")
        assert res.converged and res.supersteps <= BFS_ITERS
        t = depths_table(res)
        return (np_col(t, "vid").astype(np.int64),
                np_col(t, "depth").astype(np.int64))

    vid_a, ds = _depths(s)
    _, d1 = _depths(l1)
    _, d2 = _depths(l2)
    si = int(np.searchsorted(vid_a, s))
    ok = (ds >= 0) & (d1 >= 0) & (d2 >= 0)
    lb = np.maximum(np.abs(d1 - d1[si]), np.abs(d2 - d2[si]))
    assert (lb[ok] <= ds[ok]).all(), "ALT bound above true distance"
    return pa.table({
        "vid": pa.array(vid_a[ok], pa.int64()),
        "dist": pa.array(ds[ok], pa.int64()),
        "alt_lb": pa.array(lb[ok], pa.int64()),
    })


def _bfs_chain(prefix: str, src_cte: str) -> str:
    """Unrolled BFS CTE chain from an arbitrary single-row source CTE
    (``src_cte`` must select column s); ends at {prefix}{BFS_ITERS}."""
    big = 1 << 60
    steps = [f"""{prefix}0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = (SELECT s FROM {src_cte}) THEN 0
              ELSE {big} END AS depth FROM verts)"""]
    for k in range(BFS_ITERS):
        steps.append(f"""
{prefix}m{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.depth + 1) AS md
  FROM sym e JOIN {prefix}{k} l ON l.vid = e.src AND l.depth < {big}
  GROUP BY e.dst
),
{prefix}{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.depth, COALESCE(m.md, v.depth)) AS depth
  FROM {prefix}{k} v LEFT JOIN {prefix}m{k} m ON m.vid = v.vid
)""")
    return ",".join(steps)


def _alt_bounds_sql() -> str:
    big = 1 << 60
    N = BFS_ITERS
    return f"""
WITH {_GRAPH_CTES},
asrc AS MATERIALIZED (SELECT min(vid) AS s FROM verts),
alm1 AS MATERIALIZED (SELECT max(vid) AS s FROM verts),
alm2 AS MATERIALIZED (
  SELECT min(vid) AS s FROM verts
  WHERE vid >= (SELECT (min(vid) + max(vid)) // 2 FROM verts)),
{_bfs_chain("ax", "asrc")},
{_bfs_chain("ay", "alm1")},
{_bfs_chain("az", "alm2")},
ssel AS (
  SELECT x.vid, x.depth AS dist, y.depth AS dy, z.depth AS dz
  FROM ax{N} x JOIN ay{N} y ON y.vid = x.vid
               JOIN az{N} z ON z.vid = x.vid
  WHERE x.depth < {big} AND y.depth < {big} AND z.depth < {big})
SELECT vid, CAST(dist AS BIGINT) AS dist,
       CAST(greatest(
         abs(dy - (SELECT depth FROM ay{N}
                   WHERE vid = (SELECT s FROM asrc))),
         abs(dz - (SELECT depth FROM az{N}
                   WHERE vid = (SELECT s FROM asrc)))) AS BIGINT)
         AS alt_lb
FROM ssel ORDER BY vid"""


DENSEST_ROUNDS = 16


def _q_densest_peel(sf_dir: str):
    """Densest-subgraph peel (algorithms.densest_peel — the
    Bahmani-Kumar-Vassilvitskii 2(1+ε) MapReduce approximation,
    ε = 1): each round removes every vertex with alive-degree·V ≤
    2·2·E in exact integers, so V at least halves per round and 16
    rounds cover any V ≤ 65536 (sf0.01 has ~2.4k); the densest round
    is a 4-approximation of the maximum-density subgraph.  One
    streaming masked degree scan per round, zero shuffles — the
    threshold is a global scalar.  Emits exactly 16 (round,
    n_vertices, n_edges) rows so the fixed-round SQL unroll compares
    row-for-row."""
    import ray

    from essentials_rd.algorithms.densest import densest_peel

    g, edges = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    t, _ = densest_peel(edges, vids, rounds=DENSEST_ROUNDS)
    return t


def _densest_sql() -> str:
    steps = ["a0 AS MATERIALIZED (SELECT vid FROM verts)"]
    sels = []
    for k in range(DENSEST_ROUNDS):
        steps.append(f"""
d{k} AS MATERIALIZED (
  SELECT e.src AS vid, CAST(count(*) AS BIGINT) AS d
  FROM sym e JOIN a{k} s ON s.vid = e.src
             JOIN a{k} t ON t.vid = e.dst
  GROUP BY 1
),
s{k} AS MATERIALIZED (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM a{k}) AS V,
         CAST(COALESCE((SELECT sum(d) FROM d{k}), 0) AS BIGINT) AS E2
),
a{k + 1} AS MATERIALIZED (
  SELECT a.vid FROM a{k} a JOIN d{k} d ON d.vid = a.vid, s{k} s
  WHERE d.d * s.V > 2 * s.E2
)""")
        sels.append(f"SELECT CAST({k} AS BIGINT) AS round, V AS "
                    f"n_vertices, E2 // 2 AS n_edges FROM s{k}")
    return (f"WITH {_GRAPH_CTES}, " + ",".join(steps)
            + " " + " UNION ALL ".join(sels) + " ORDER BY round")


def _q_gini_stump(sf_dir: str):
    """Decision-stump training statistic (mlfit.gini_split_table):
    per candidate price-band threshold, the exact left/right
    (count, positives) of splitting orders on total price to predict
    urgency, plus the weighted Gini impurity — histogram-based split
    finding a la LightGBM (the quantization IS the candidate
    pruning), one streaming pass with band-sized partials and the
    impurity the only float, reproduced division-for-division by the
    SQL twin."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.mlfit import gini_split_table
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice", "o_orderpriority"])

    def _band(t: pa.Table) -> np.ndarray:
        tp = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        return (np.round(tp, 0).astype(np.int64)) // 10000

    def _label(t: pa.Table) -> np.ndarray:
        return pc.equal(t.column("o_orderpriority"),
                        "1-URGENT").to_numpy(
            zero_copy_only=False).astype(np.int64)

    return gini_split_table(orders, _band, _label)


def _gini_stump_sql() -> str:
    return """
WITH f AS (
  SELECT CAST(ROUND(o_totalprice, 0) AS BIGINT) // 10000 AS band,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders),
g AS (SELECT band, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS p FROM f GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS N_,
               CAST(sum(p) AS BIGINT) AS P_ FROM g),
cum AS (SELECT band,
               CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS nl,
               CAST(sum(p) OVER (ORDER BY band) AS BIGINT) AS pl
        FROM g),
cand AS (SELECT band AS thr, nl, pl,
                (SELECT N_ FROM tot) - nl AS nr,
                (SELECT P_ FROM tot) - pl AS pr
         FROM cum WHERE nl < (SELECT N_ FROM tot))
SELECT thr, nl AS n_left, pl AS pos_left,
       CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
       (CAST(nl * nl - pl * pl - (nl - pl) * (nl - pl) AS DOUBLE)
          / CAST(nl AS DOUBLE)
        + CAST(nr * nr - pr * pr - (nr - pr) * (nr - pr) AS DOUBLE)
          / CAST(nr AS DOUBLE))
       / CAST((SELECT N_ FROM tot) AS DOUBLE) AS gini
FROM cand ORDER BY thr"""


def _q_tree_depth2(sf_dir: str):
    """Depth-2 histogram decision tree (mlfit.tree_depth2): root
    splits orders on the $10k price band, each side then splits on
    order month, every pick by the exact-integer scaled-rational
    criterion ((num<<40)//den, thr) — unbounded Python ints vs
    HUGEINT order candidates identically, so the chosen STRUCTURE
    hash-matches, not just a candidate table.  ONE streaming pass
    folds bounded joint (b1, b2, n, n_pos) histograms, zero shuffles;
    all 3 split decisions are driver math over the cells table."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.mlfit import tree_depth2
    from essentials_rd.util import np_col

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice", "o_orderdate", "o_orderpriority"])

    def _f1(t: pa.Table) -> np.ndarray:
        tp = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        return (np.round(tp, 0).astype(np.int64)) // 10000

    def _f2(t: pa.Table) -> np.ndarray:
        return pc.month(t.column("o_orderdate")).to_numpy(
            zero_copy_only=False).astype(np.int64)

    def _label(t: pa.Table) -> np.ndarray:
        return pc.equal(t.column("o_orderpriority"),
                        "1-URGENT").to_numpy(
            zero_copy_only=False).astype(np.int64)

    return tree_depth2(orders, _f1, _f2, _label)


def _tree_depth2_sql() -> str:
    score = ("(num * CAST(1099511627776 AS HUGEINT)) // den")

    def sc(cand: str, out: str) -> str:
        return (
            f"{out} AS (SELECT thr, "
            "CAST(nl AS HUGEINT) * (CAST(nr AS HUGEINT) * nr "
            "- CAST(pr AS HUGEINT) * pr "
            "- CAST(nr - pr AS HUGEINT) * (nr - pr)) "
            "+ CAST(nr AS HUGEINT) * (CAST(nl AS HUGEINT) * nl "
            "- CAST(pl AS HUGEINT) * pl "
            "- CAST(nl - pl AS HUGEINT) * (nl - pl)) AS num, "
            f"CAST(nl AS HUGEINT) * nr AS den FROM {cand})")

    def side(pfx: str, cmp: str) -> str:
        return (
            f"{pfx}m AS (SELECT b2, CAST(sum(n) AS BIGINT) AS n, "
            f"CAST(sum(p) AS BIGINT) AS p FROM c, root "
            f"WHERE c.b1 {cmp} root.thr GROUP BY 1), "
            f"{pfx}tot AS (SELECT CAST(sum(n) AS BIGINT) AS N_, "
            f"CAST(sum(p) AS BIGINT) AS P_ FROM {pfx}m), "
            f"{pfx}cum AS (SELECT b2, "
            f"CAST(sum(n) OVER (ORDER BY b2) AS BIGINT) AS nl, "
            f"CAST(sum(p) OVER (ORDER BY b2) AS BIGINT) AS pl "
            f"FROM {pfx}m), "
            f"{pfx}cand AS (SELECT b2 AS thr, nl, pl, N_ - nl AS nr, "
            f"P_ - pl AS pr FROM {pfx}cum, {pfx}tot WHERE nl < N_), "
            + sc(f"{pfx}cand", f"{pfx}sc") + ", "
            f"{pfx}pick AS (SELECT thr, num, den FROM {pfx}sc "
            f"ORDER BY {score}, thr LIMIT 1)")

    gini = (
        "floor(CAST({p}.num AS DOUBLE) / (CAST({p}.den AS DOUBLE) "
        "* CAST({t}.N_ AS DOUBLE)) * 1000000 + 0.5) / 1000000")
    return (
        "WITH f AS (SELECT "
        "CAST(ROUND(o_totalprice, 0) AS BIGINT) // 10000 AS b1, "
        "CAST(month(o_orderdate) AS BIGINT) AS b2, "
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y "
        "FROM orders), "
        "c AS (SELECT b1, b2, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(y) AS BIGINT) AS p FROM f GROUP BY 1, 2), "
        "tot AS (SELECT CAST(sum(n) AS BIGINT) AS N_, "
        "CAST(sum(p) AS BIGINT) AS P_ FROM c), "
        "m1 AS (SELECT b1, CAST(sum(n) AS BIGINT) AS n, "
        "CAST(sum(p) AS BIGINT) AS p FROM c GROUP BY 1), "
        "cum1 AS (SELECT b1, "
        "CAST(sum(n) OVER (ORDER BY b1) AS BIGINT) AS nl, "
        "CAST(sum(p) OVER (ORDER BY b1) AS BIGINT) AS pl FROM m1), "
        "cand1 AS (SELECT b1 AS thr, nl, pl, N_ - nl AS nr, "
        "P_ - pl AS pr FROM cum1, tot WHERE nl < N_), "
        + sc("cand1", "sc1") + ", "
        f"root AS (SELECT thr, num, den FROM sc1 ORDER BY {score}, thr "
        "LIMIT 1), "
        + side("l", "<=") + ", " + side("r", ">") + " "
        "SELECT 'root' AS node, root.thr, tot.N_ AS n, tot.P_ AS n_pos, "
        + gini.format(p="root", t="tot") + " AS gini FROM root, tot "
        "UNION ALL SELECT 'left', lpick.thr, ltot.N_, ltot.P_, "
        + gini.format(p="lpick", t="ltot")
        + " FROM ltot LEFT JOIN lpick ON TRUE "
        "UNION ALL SELECT 'right', rpick.thr, rtot.N_, rtot.P_, "
        + gini.format(p="rpick", t="rtot")
        + " FROM rtot LEFT JOIN rpick ON TRUE"
    )


def _q_motif_census(sf_dir: str):
    """Size-4 subgraph census by closed formula (the ESCAPE /
    Pinar-Seshadhri counting identities) as exact int64s: claws
    (K₁,₃) = Σ C(d,3) from the shard degree tables alone; 3-edge
    paths (P₄) = Σ_{(u,v)∈E}(d_u−1)(d_v−1) − 3·triangles (the
    degree-product sum counts one pendant pair per edge, each
    triangle lands in it 3 times); tailed triangles = Σ_v tri(v)·
    (d_v−2) from the cached per-vertex TC output.  One broadcast
    degree lookup + one streaming edge scan — no new shuffle; the
    triangle terms reuse the verified oriented TC engine."""
    import ray

    from essentials_rd.util import np_col

    tri_total, per_v = _tc(sf_dir)
    g, edges = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for t in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(t, "vid"))
        deg[pos] += np_col(t, "outdeg")
    d = deg
    claws = int((d * (d - 1) * (d - 2) // 6).sum())

    vref = ray.put(vids)
    dref = ray.put(deg)

    def _dps(b: pa.Table) -> pa.Table:
        vv, dd = ray.get(vref), ray.get(dref)
        du = dd[np.searchsorted(vv, np_col(b, "src").astype(np.int64))]
        dv = dd[np.searchsorted(vv, np_col(b, "dst").astype(np.int64))]
        s = int(((du - 1) * (dv - 1)).sum())
        return pa.table({"s": pa.array([s], pa.int64())})

    dps = sum(r["s"] for r in edges.select_columns(
        ["src", "dst"]).map_batches(_dps, batch_format="pyarrow")
        .take_all())
    paths3 = dps - 3 * tri_total

    pvt = pa.concat_tables(ray.get(per_v.to_arrow_refs()))
    tv = np_col(pvt, "triangles").astype(np.int64)
    pos = np.searchsorted(vids, np_col(pvt, "vid").astype(np.int64))
    tailed = int((tv * (deg[pos] - 2)).sum())
    return pa.table({
        "claws": pa.array([claws], pa.int64()),
        "paths3": pa.array([paths3], pa.int64()),
        "tailed_triangles": pa.array([tailed], pa.int64()),
    })


def _motif_census_sql() -> str:
    return f"""
WITH {_GRAPH_CTES}, {_ORIENTED_CTE},
tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tris),
cl AS (SELECT CAST(sum(outdeg * (outdeg - 1) * (outdeg - 2) // 6)
              AS BIGINT) AS c FROM deg),
dps AS (SELECT CAST(sum((da.outdeg - 1) * (db.outdeg - 1)) AS BIGINT)
          AS s
        FROM pairs p JOIN deg da ON da.vid = p.src
                     JOIN deg db ON db.vid = p.dst),
corners AS (
  SELECT a AS vid FROM tris UNION ALL
  SELECT b FROM tris UNION ALL
  SELECT c FROM tris
),
pvt AS (SELECT vid, count(*) AS ntri FROM corners GROUP BY 1),
tl AS (SELECT CAST(COALESCE(sum(pvt.ntri * (deg.outdeg - 2)), 0)
              AS BIGINT) AS x
       FROM pvt JOIN deg ON deg.vid = pvt.vid)
SELECT cl.c AS claws, dps.s - 3 * tri.t AS paths3,
       tl.x AS tailed_triangles
FROM cl, dps, tri, tl"""


HC_SOURCES = 4
HC_D = 6


MIS_ITERS = 24


def _q_mis(sf_dir: str):
    """Deterministic Luby maximal independent set (mis.MisProgram):
    one max-combine per superstep carries both the round's priority
    contest and the previous winners' KILL sentinels; the round count
    is asserted within the oracle's unroll."""
    from essentials_rd.algorithms import mis
    from essentials_rd.algorithms.mis import mis_table

    g, _ = _graph(sf_dir)
    res = mis(g, checkpoint_every=0, scatter_mode="fused",
              max_iters=4 * MIS_ITERS)
    assert res.converged and res.supersteps <= MIS_ITERS, (
        f"MIS took {res.supersteps} rounds > oracle unroll {MIS_ITERS}"
    )
    return mis_table(res)


def _mis_sql() -> str:
    """Unrolled deterministic-Luby rounds: kills (undecided neighbors
    of the previous round's winners) resolve before the contest; the
    contest max runs over the PRE-kill undecided neighbor set, exactly
    the engine's message stream."""
    K = 2654435761
    MIN = -(2**63)

    def pri(col: str, r: int) -> str:
        return (f"(CAST(({col} + {r} * {K}) AS HUGEINT) * {K} "
                f"% 2147483648 * 4294967296 + {col})")

    steps = ["u0 AS MATERIALIZED (SELECT vid FROM verts)",
             "f0 AS MATERIALIZED (SELECT vid FROM verts WHERE FALSE)"]
    for r in range(1, MIS_ITERS + 1):
        steps.append(
            f"kl{r} AS MATERIALIZED (SELECT DISTINCT e.dst AS vid "
            f"FROM sym e JOIN f{r - 1} f ON f.vid = e.src "
            f"JOIN u{r - 1} u ON u.vid = e.dst)"
        )
        steps.append(
            f"im{r} AS MATERIALIZED (SELECT e.dst AS vid, "
            f"max({pri('e.src', r)}) AS m FROM sym e "
            f"JOIN u{r - 1} s ON s.vid = e.src GROUP BY e.dst)"
        )
        steps.append(
            f"w{r} AS MATERIALIZED (SELECT u.vid FROM u{r - 1} u "
            f"LEFT JOIN kl{r} k ON k.vid = u.vid "
            f"LEFT JOIN im{r} i ON i.vid = u.vid "
            f"WHERE k.vid IS NULL AND {pri('u.vid', r)} > "
            f"COALESCE(i.m, {MIN}))"
        )
        steps.append(
            f"u{r} AS MATERIALIZED (SELECT u.vid FROM u{r - 1} u "
            f"LEFT JOIN kl{r} k ON k.vid = u.vid "
            f"LEFT JOIN w{r} w ON w.vid = u.vid "
            f"WHERE k.vid IS NULL AND w.vid IS NULL)"
        )
        steps.append(
            f"f{r} AS MATERIALIZED (SELECT vid FROM w{r})"
        )
    body = ",".join(steps)
    union = " UNION ALL ".join(
        f"SELECT vid FROM w{r}" for r in range(1, MIS_ITERS + 1)
    )
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT v.vid, CAST(CASE WHEN m.vid IS NULL THEN 0 ELSE 1 END "
        f"AS BIGINT) AS in_set FROM verts v "
        f"LEFT JOIN ({union}) m ON m.vid = v.vid ORDER BY v.vid"
    )


CORE_CAP = 5


def _q_coreness(sf_dir: str):
    """Capped k-core decomposition (kcore.coreness): per vertex
    min(core number, CORE_CAP) = Σ_{k≤cap} [v ∈ k-core], one
    frontier-sparse peel per k; every peel's round count is asserted
    against the oracle's unroll bound."""
    from essentials_rd.algorithms import coreness

    g, _ = _graph(sf_dir)
    return coreness(g, CORE_CAP, max_rounds_per_k=KCORE_ITERS,
                    scatter_mode="fused")


def _coreness_sql() -> str:
    """CORE_CAP independent unrolled peels (the kcore3 chain per k);
    core = how many of the final cores contain the vertex (cores
    nest)."""
    steps = []
    for k in range(1, CORE_CAP + 1):
        steps.append(f"ck{k}_0 AS MATERIALIZED (SELECT vid FROM verts)")
        for t in range(KCORE_ITERS):
            steps.append(
                f"ck{k}_{t + 1} AS MATERIALIZED ("
                f"SELECT e.src AS vid FROM sym e "
                f"JOIN ck{k}_{t} s ON s.vid = e.src "
                f"JOIN ck{k}_{t} d ON d.vid = e.dst "
                f"GROUP BY e.src HAVING count(*) >= {k})"
            )
    body = ",".join(steps)
    joins = " ".join(
        f"LEFT JOIN ck{k}_{KCORE_ITERS} j{k} ON j{k}.vid = v.vid"
        for k in range(1, CORE_CAP + 1)
    )
    total = " + ".join(
        f"(CASE WHEN j{k}.vid IS NULL THEN 0 ELSE 1 END)"
        for k in range(1, CORE_CAP + 1)
    )
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT v.vid, CAST({total} AS BIGINT) AS core "
        f"FROM verts v {joins} ORDER BY v.vid"
    )


def _q_harmonic(sf_dir: str):
    """Sampled harmonic centrality (HC_SOURCES smallest vids) via ONE
    multi-source bitmask BFS program, depth-truncated at HC_D so the
    unrolled SQL oracle reproduces it level-for-level; half-up 6dp
    rounding on both sides."""
    import ray

    from essentials_rd.algorithms import harmonic, harmonic_table
    from essentials_rd.pipelines import round_half_up

    g, _ = _graph(sf_dir)
    vids = np.sort(np.asarray(ray.get(g.vertex_ids_ref), np.int64))
    res = harmonic(g, vids[:HC_SOURCES], max_iters=HC_D,
                   checkpoint_every=0, scatter_mode="fused")
    t = harmonic_table(res)
    vals = round_half_up(np.asarray(t["harmonic"], np.float64), 6)
    return pa.table({"vid": t["vid"],
                     "harmonic": pa.array(vals, pa.float64())})


def _q_geo(sf_dir: str):
    """Location inference on the co-purchase graph: seeds = vids
    divisible by 7 at (vid%180, vid%360); label-once mean propagation
    to fixpoint; unlocated = -1; half-up 6dp rounding both sides."""
    import ray

    from essentials_rd.algorithms import geo
    from essentials_rd.algorithms.geo import locations_table
    from essentials_rd.pipelines import round_half_up

    g, _ = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    seeds = vids[vids % 7 == 0]
    res = geo(g, seeds, (seeds % 180).astype(np.float64),
              (seeds % 360).astype(np.float64),
              max_iters=2 * GEO_ITERS, checkpoint_every=0,
              scatter_mode="fused")
    assert res.converged and res.supersteps <= GEO_ITERS, (
        "geo did not converge within the oracle's unrolled iteration count"
    )
    t = locations_table(res)
    lat = np.asarray(t["lat"], np.float64)
    lon = np.asarray(t["lon"], np.float64)
    return pa.table(
        {
            "vid": t["vid"],
            "lat": pa.array(
                np.where(lat < 0, -1.0, round_half_up(np.maximum(lat, 0), 6)),
                pa.float64(),
            ),
            "lon": pa.array(
                np.where(lon < 0, -1.0, round_half_up(np.maximum(lon, 0), 6)),
                pa.float64(),
            ),
        }
    )


HITS_K = 4


def _q_hits(sf_dir: str):
    """Directed HITS (hubs + authorities) on the canonical src<dst
    co-purchase digraph: HITS_K unnormalized (authority, hub) rounds
    from h0=1 — all intermediates are exact integers in float64 — with
    ONE final L1 normalization + 6dp half-up rounding on both sides."""
    from essentials_rd.algorithms import hits, hits_graph_edges, hits_table
    from essentials_rd.graph import build_graph
    from essentials_rd.pipelines import (
        _work_dir,
        copurchase_edges,
        part_universe,
    )

    tagged = hits_graph_edges(copurchase_edges(sf_dir))
    g = build_graph(
        tagged, _work_dir("hits"), 8, symmetrize=False, weighted=True,
        vertex_ids=part_universe(sf_dir), persist=False,
    )
    res = hits(g, k=HITS_K)
    return hits_table(res)


SCC_MOD = 4  # SCC runs on the induced subgraph vid % SCC_MOD == 0


def _scc_directed_edges(sf_dir: str, sparse: int | None = None):
    """The deterministic directed graph _q_scc runs on: co-purchase
    edges induced on vid % SCC_MOD == 0, oriented by SplitMix64 parity
    of the packed pair key (shared with the SQL twins).  ``sparse=m``
    additionally keeps only edges with (z >> 1) % m == 0 — the
    condensation query's sparsification, which leaves a DAG of many
    small SCCs instead of one giant one."""
    from essentials_rd.pipelines import copurchase_edges
    from essentials_rd.util import hash64, np_col

    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)

    def _orient(t: pa.Table) -> pa.Table:
        s = np_col(t, "src")
        d = np_col(t, "dst")
        keep = (s % SCC_MOD == 0) & (d % SCC_MOD == 0)
        s, d = s[keep], d[keep]
        with np.errstate(over="ignore"):
            z = hash64(
                s.astype(np.uint64) * np.uint64(1 << 32)
                + d.astype(np.uint64)
                + np.uint64(mix)
            )
        if sparse is not None:
            sel = (z >> np.uint64(1)) % np.uint64(sparse) == 0
            s, d, z = s[sel], d[sel], z[sel]
        fwd = (z & np.uint64(1)) == 0
        return pa.table(
            {
                "src": pa.array(np.where(fwd, s, d), pa.int64()),
                "dst": pa.array(np.where(fwd, d, s), pa.int64()),
            }
        )

    return copurchase_edges(sf_dir).map_batches(
        _orient, batch_format="pyarrow"
    )


def _q_scc(sf_dir: str):
    """Strongly connected components (algorithms/scc.py — trim +
    forward-color + backward-mark rounds) of a deterministic DIRECTED
    graph: the co-purchase edges induced on vid % SCC_MOD == 0, each
    canonical src<dst edge oriented by SplitMix64 parity of its packed
    pair key (cycles guaranteed; the same bit the SQL twin recomputes
    via ``_sm64_ctes``).  Label = min vid of the component."""
    from essentials_rd.algorithms import hits_graph_edges, scc_coloring
    from essentials_rd.graph import build_graph
    from essentials_rd.pipelines import (
        _work_dir,
        copurchase_edges,
        part_universe,
    )
    from essentials_rd.util import hash64, np_col

    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)

    def _orient(t: pa.Table) -> pa.Table:
        s = np_col(t, "src")
        d = np_col(t, "dst")
        keep = (s % SCC_MOD == 0) & (d % SCC_MOD == 0)
        s, d = s[keep], d[keep]
        with np.errstate(over="ignore"):
            z = hash64(
                s.astype(np.uint64) * np.uint64(1 << 32)
                + d.astype(np.uint64)
                + np.uint64(mix)
            )
        fwd = (z & np.uint64(1)) == 0
        return pa.table(
            {
                "src": pa.array(np.where(fwd, s, d), pa.int64()),
                "dst": pa.array(np.where(fwd, d, s), pa.int64()),
            }
        )

    directed = _scc_directed_edges(sf_dir)
    universe = part_universe(sf_dir)
    tagged = hits_graph_edges(directed)
    g = build_graph(
        tagged, _work_dir("scc"), 8, symmetrize=False, weighted=True,
        vertex_ids=universe[universe % SCC_MOD == 0], persist=False,
    )
    tbl, _ = scc_coloring(g)
    return tbl


MSF_W_CAP = 8
MSF_CC_ROUNDS = 6


CON_K = 16       # condensation longest-path cap (shared with the unroll)
CON_SPARSE = 4   # keep edges with (z >> 1) % CON_SPARSE == 0


NEG_K = 3
NEG_TRIES = 12


BAND_SPAN = 25  # cents


REPET_K = 10
REPET_SCALE = 1_000_000


def _q_label_centroids(sf_dir: str):
    """Per-label class centroids (ann.label_centroid_sums): (label,
    dim, n, Σ floor(e·scale)) — the nearest-class-mean prototype
    table, integer-exact so it hash-matches at any layout; per-block
    (labels × d) partials, the n×d matrix never moves."""
    import ray.data as rd

    from essentials_rd.ann import label_centroid_sums

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["label", "embedding"])
    return label_centroid_sums(vecs, scale=GRAM_SCALE)


def _q_most_repetitive(sf_dir: str):
    """Worst boilerplate offenders: bottom-10 docs by the repetition
    ratio floor(n_distinct·10⁶ / n_grams) — integer floor-division is
    deterministic on both sides where a float ratio could tie-drift;
    repetition_stats + top_k(tie_cols) composition."""
    import ray.data as rd

    from essentials_rd.ops import top_k
    from essentials_rd.textops import repetition_stats
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    stats = repetition_stats(docs, k=REP_K)

    def _ratio(t: pa.Table) -> pa.Table:
        nd = np_col(t, "n_distinct")
        ng = np.maximum(np_col(t, "n_grams"), 1)
        return t.append_column(
            "ratio_ppm", pa.array(nd * REPET_SCALE // ng, pa.int64()))

    return top_k(stats.map_batches(_ratio, batch_format="pyarrow"),
                 "ratio_ppm", REPET_K, descending=False,
                 tie_cols=["doc_id"])


def _q_price_band_pairs(sf_dir: str):
    """Keyless self band join (ops.band_join_self): all order pairs
    whose totals differ by ≤ 25 cents — the pure theta-join (no
    equality key) hash joins can't express; range partitioning on the
    value + downward ghost copies keep the exchange ~2×rows, one
    lexsort + window expansion per partition."""
    import ray.data as rd

    from essentials_rd.ops import band_join_self
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        return pa.table(
            {"id": t.column("o_orderkey"),
             "v": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64))}
        )

    return band_join_self(
        orders.map_batches(_cents, batch_format="pyarrow"),
        "id", "v", BAND_SPAN, n_parts=16,
    )


def _q_lang_fertility(sf_dir: str):
    """Tokenizer-fertility table per language: (n_docs, Σ chars,
    Σ whitespace tokens, Σ BPE-ish regex tokens) as exact ints — the
    chars-per-token / cost-estimation numbers a multilingual training
    budget needs; token_counts' compiled-regex pass + one grouped
    sum."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.textops import BPE_TOKEN_RE

    import re as _re

    compiled = _re.compile(BPE_TOKEN_RE)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text", "n_chars"])

    def _cnt(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas()
        nws = s.str.split(" ").str.len().to_numpy(np.int64)
        nre = s.str.count(compiled).to_numpy(np.int64)
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
                "ws": pa.array(nws, pa.int64()),
                "re": pa.array(nre, pa.int64()),
            }
        )

    return grouped_pandas_agg(
        docs.map_batches(_cnt, batch_format="pyarrow"),
        ["lang"],
        {"n_docs": ("ws", "count"), "sum_chars": ("n_chars", "sum"),
         "sum_ws_tokens": ("ws", "sum"), "sum_re_tokens": ("re", "sum")},
        key_fn=lambda b: _str_hash(b.column("lang")),
        num_buckets=4,
    )


def _q_orders_validation(sf_dir: str):
    """Data-quality gate (ops.validate_table): declarative per-rule
    violation counts over orders — the promote/block check before a
    100 TB extract ships; rules chosen so both clean and violated
    regimes appear (totalprice over a deliberately tight cap)."""
    import ray.data as rd

    from essentials_rd.ops import validate_table

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    return validate_table(orders, [
        {"name": "orderkey_positive", "col": "o_orderkey",
         "not_null": True, "min": 1},
        {"name": "custkey_not_null", "col": "o_custkey",
         "not_null": True},
        {"name": "price_under_300k", "col": "o_totalprice",
         "min": 0.0, "max": 300_000.0},
    ])


def _q_lang_confusion(sf_dir: str):
    """Classifier evaluation as a distributed op: the lang-ID
    confusion matrix (label, predicted, n) — lang_id's per-doc argmax
    (integer weights, SQL-exact) fed through one grouped count; the
    model-eval shape every curation pipeline ends with."""
    import ray
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.textops import build_lang_profiles, lang_id
    from essentials_rd.windows import _pair_bucket_key

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"]).materialize()
    prof = build_lang_profiles(docs, top_k=LANG_TOPK)
    preds = lang_id(docs, ray.put(prof)).select_columns(
        ["lang", "pred_lang"])

    def _key(b: pa.Table) -> np.ndarray:
        from essentials_rd.derive import _str_hash

        with np.errstate(over="ignore"):
            return (_str_hash(b.column("lang"))
                    + np.int64(31) * _str_hash(b.column("pred_lang")))

    return grouped_pandas_agg(
        preds, ["lang", "pred_lang"],
        {"n": ("lang", "count")},
        key_fn=_key, num_buckets=8,
    )


def _q_transitivity(sf_dir: str):
    """Global transitivity (clustering) ratio as exact integers:
    (3·triangles, wedges) with wedges = Σ deg·(deg−1)/2 from the shard
    degree tables — the float ratio derives driver-side; reuses the
    cached TC total and the degree pass."""
    import ray

    from essentials_rd.util import np_col

    tri = int(_q_triangles_total(sf_dir)["triangles"][0].as_py())
    g, _ = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for t in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(t, "vid"))
        deg[pos] += np_col(t, "outdeg")
    wedges = int((deg * (deg - 1) // 2).sum())
    return pa.table(
        {
            "tri3": pa.array([3 * tri], pa.int64()),
            "wedges": pa.array([wedges], pa.int64()),
        }
    )


def _q_brand_homophily(sf_dir: str):
    """Attribute homophily of the co-purchase graph: of all edges, how
    many join parts of the SAME brand — (n_edges, n_same) exact ints
    via one broadcast partkey→brand lookup over the edge table (the
    label-agreement signal under any vertex attribute)."""
    import ray
    import ray.data as rd

    from essentials_rd.util import np_col

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])
    rows = part.take_all()
    pk = np.array([r["p_partkey"] for r in rows], np.int64)
    order = np.argsort(pk)
    pk = pk[order]
    brands = np.asarray([rows[i]["p_brand"] for i in order], object)
    bref = ray.put((pk, brands))

    _, edges = _graph(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        k, b = ray.get(bref)
        s = np_col(t, "src")
        d = np_col(t, "dst")
        same = b[np.searchsorted(k, s)] == b[np.searchsorted(k, d)]
        return pa.table(
            {
                "n": pa.array([len(s)], pa.int64()),
                "same": pa.array([int(same.sum())], pa.int64()),
            }
        )

    parts = (edges.select_columns(["src", "dst"])
             .map_batches(_partial, batch_format="pyarrow").take_all())
    return pa.table(
        {
            "n_edges": pa.array([sum(r["n"] for r in parts)], pa.int64()),
            "n_same_brand": pa.array([sum(r["same"] for r in parts)],
                                     pa.int64()),
        }
    )


def _q_negative_samples(sf_dir: str):
    """Deterministic negative sampling (sampling.negative_samples):
    per vertex up to 3 non-neighbors from 12 hash proposals over the
    sorted vertex universe — the link-prediction/GNN training
    counterpart of neighbor_sample_k3, pure function of (graph, seed),
    adjacency tested against the shared packed edge-key object."""
    from essentials_rd.sampling import negative_samples

    g, _ = _graph(sf_dir)
    out = negative_samples(g, NEG_K, tries=NEG_TRIES, seed=SAMPLE_SEED)
    return out


def _neg_samples_ctes() -> str:
    """CTE body reproducing sampling.negative_samples (final CTE
    ``rk``; accepted negatives are ``rn <= NEG_K``) — shared by the
    negative_samples_k3 and linkpred_auc oracles."""
    c_mul = 0x9E3779B97F4A7C15 & (2**63 - 1)
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes(
        "nz", "u, i",
        f"CAST(u AS HUGEINT) * {c_mul} + i + {mix}",
        "(SELECT s.vid AS u, t.i FROM srcs s, "
        f"LATERAL (SELECT unnest(range(0, {NEG_TRIES})) AS i) t)",
    )
    return (
        "srcs AS (SELECT DISTINCT src AS vid FROM sym), "
        "uni AS (SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 "
        "AS BIGINT) AS r FROM verts), "
        "nn2 AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM verts), "
        f"{chain}, "
        "pr0 AS MATERIALIZED (SELECT z3.u, z3.i, "
        "CAST(CAST(z3.z AS HUGEINT) % m.n AS BIGINT) AS r "
        "FROM nz3 z3 CROSS JOIN nn2 m), "
        "prop AS MATERIALIZED (SELECT p.u, p.i, v.vid AS cand "
        "FROM pr0 p JOIN uni v USING (r)), "
        "acc AS (SELECT p.u, p.i, p.cand FROM prop p "
        "LEFT JOIN sym e ON e.src = p.u AND e.dst = p.cand "
        "WHERE p.cand <> p.u AND e.src IS NULL), "
        "rk AS (SELECT u, cand, i, row_number() OVER ("
        "PARTITION BY u ORDER BY i) AS rn FROM acc)"
    )


def _negative_samples_sql() -> str:
    # literal on purpose (twin-independence) — engine NEG_K=3 frozen
    return (
        f"WITH {_GRAPH_CTES}, {_neg_samples_ctes()} "
        "SELECT u AS src, cand AS neg, CAST(i AS BIGINT) AS try_i "
        "FROM rk WHERE rn <= 3 ORDER BY src, try_i"
    )


def _q_linkpred_auc(sf_dir: str):
    """Link-prediction evaluation, exact: AUC of the common-neighbor
    score separating true co-purchase edges (positives) from the
    deterministic negative samples — the standard train-time metric
    for embedding/link models, computed WITHOUT floats until the last
    division.  Composition of three verified ops: edge_similarity
    scores BOTH pair sets against the same packed-edge-key probe
    (it never assumes the pair is an edge), rank_sum_u merges the two
    integer score histograms (only per-side histogram entries move),
    and AUC = U/(n_pos·n_neg) = u2/(2·n_a·n_b) divides exact ints.
    Ties get half credit — exactly the probabilistic AUC definition."""
    from essentials_rd.algorithms.similarity import edge_similarity
    from essentials_rd.ops import rank_sum_u
    from essentials_rd.sampling import negative_samples
    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir)
    pos = edge_similarity(g, edges.select_columns(["src", "dst"]))

    def _canon(t: pa.Table) -> pa.Table:
        u = np_col(t, "src").astype(np.int64)
        w = np_col(t, "neg").astype(np.int64)
        return pa.table({
            "src": pa.array(np.minimum(u, w), pa.int64()),
            "dst": pa.array(np.maximum(u, w), pa.int64()),
        })

    neg_pairs = negative_samples(
        g, NEG_K, tries=NEG_TRIES, seed=SAMPLE_SEED
    ).map_batches(_canon, batch_format="pyarrow")
    neg = edge_similarity(g, neg_pairs)

    r = rank_sum_u(pos.select_columns(["common"]),
                   neg.select_columns(["common"]), "common")
    u2 = int(r["u2_a"][0].as_py())
    na = int(r["n_a"][0].as_py())
    nb = int(r["n_b"][0].as_py())
    return pa.table({
        "u2_a": pa.array([u2], pa.int64()),
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "auc": pa.array([float(u2) / float(2 * na * nb)], pa.float64()),
    })


def _linkpred_auc_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, {_neg_samples_ctes()}, "
        "negp AS (SELECT least(u, cand) AS src, greatest(u, cand) AS dst "
        f"FROM rk WHERE rn <= {NEG_K}), "
        "cn AS (SELECT a.src AS u, b.src AS w, CAST(count(*) AS BIGINT) "
        "AS c FROM sym a JOIN sym b ON b.dst = a.dst AND a.src < b.src "
        "GROUP BY 1, 2), "
        "posc AS (SELECT COALESCE(cn.c, 0) AS v FROM pairs p "
        "LEFT JOIN cn ON cn.u = p.src AND cn.w = p.dst), "
        "negc AS (SELECT COALESCE(cn.c, 0) AS v FROM negp p "
        "LEFT JOIN cn ON cn.u = p.src AND cn.w = p.dst), "
        "e AS (SELECT v, 0 AS s FROM posc "
        "UNION ALL SELECT v, 1 AS s FROM negc), "
        "h AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, "
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM e GROUP BY 1), "
        "cc AS (SELECT v, ca, cb, sum(cb) OVER (ORDER BY v) - cb AS cbb "
        "FROM h), "
        "tt AS (SELECT CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS na, CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS nb FROM e) "
        "SELECT CAST(sum(ca * (2 * cbb + cb)) AS BIGINT) AS u2_a, "
        "tt.na AS n_a, tt.nb AS n_b, "
        "CAST(sum(ca * (2 * cbb + cb)) AS DOUBLE) "
        "/ CAST(2 * tt.na * tt.nb AS DOUBLE) AS auc "
        "FROM cc, tt GROUP BY tt.na, tt.nb"
    )


def _q_activity_gini(sf_dir: str):
    """Inequality diagnostics, integer-exact: the Gini coefficient of
    per-user event counts via its rank form — num = Σ(2·rank − n − 1)·c
    over counts ranked ascending (ties broken by user id; any total
    order over equal counts gives the same num since their coefficient
    sums are equal) — composed from grouped counts + global_rank, with
    (n, num, total) emitted as exact int64 so gini = num/(n·total)
    derives driver-side."""
    import ray.data as rd

    from essentials_rd.ops import global_rank, grouped_pandas_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    counts = grouped_pandas_agg(
        ev, ["user_id"], {"cnt": ("user_id", "count")},
        key_fn=lambda b: np_col(b, "user_id"), num_buckets=16,
    ).materialize()
    n = counts.count()
    ranked = global_rank(counts, "cnt", ["user_id"],
                         key_fn=lambda b: np_col(b, "cnt"), n_parts=8)

    def _partial(t: pa.Table) -> pa.Table:
        c = np_col(t, "cnt")
        r = np_col(t, "rank")
        return pa.table(
            {
                "num": pa.array([int(((2 * r - n - 1) * c).sum())],
                                pa.int64()),
                "total": pa.array([int(c.sum())], pa.int64()),
            }
        )

    rows = ranked.map_batches(_partial, batch_format="pyarrow").take_all()
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "gini_num": pa.array([sum(r["num"] for r in rows)], pa.int64()),
            "total_events": pa.array([sum(r["total"] for r in rows)],
                                     pa.int64()),
        }
    )


def _activity_gini_sql() -> str:
    return (
        "WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt "
        "FROM events GROUP BY user_id), "
        "r AS (SELECT cnt, CAST(row_number() OVER ("
        "ORDER BY cnt, user_id) AS BIGINT) AS rank, "
        "CAST(count(*) OVER () AS BIGINT) AS n FROM c) "
        "SELECT CAST(max(n) AS BIGINT) AS n_users, "
        "CAST(sum((2 * rank - n - 1) * cnt) AS BIGINT) AS gini_num, "
        "CAST(sum(cnt) AS BIGINT) AS total_events FROM r"
    )


def _q_scc_condensed_depth(sf_dir: str):
    """Two-algorithm composition: SCC coloring condenses the directed
    graph (condensation = one vertex per SCC, cross-component edges
    distinct) — a DAG by construction — then the max-plus
    longest-path engine layers it: each SCC's critical-path depth,
    capped at CON_K (min(longest, K) semantics keep the SQL unroll
    finite on any graph).  The scheduling/stratification shape over
    cyclic inputs."""
    import ray
    import ray.data as rd

    from essentials_rd.algorithms import depth_table, longest_path
    from essentials_rd.graph import build_graph
    from essentials_rd.pipelines import _work_dir
    from essentials_rd.util import np_col

    from essentials_rd.algorithms import hits_graph_edges, scc_coloring
    from essentials_rd.pipelines import part_universe

    directed = _scc_directed_edges(sf_dir, sparse=CON_SPARSE).materialize()
    universe = part_universe(sf_dir)
    gd = build_graph(
        hits_graph_edges(directed), _work_dir("sccsp"), 8,
        symmetrize=False, weighted=True,
        vertex_ids=universe[universe % SCC_MOD == 0], persist=False,
    )
    labs, _ = scc_coloring(gd)
    vid = np.asarray(labs["vid"], np.int64)
    scc = np.asarray(labs["scc"], np.int64)
    lref = ray.put((vid, scc))

    def _condense(t: pa.Table) -> pa.Table:
        v_, s_ = ray.get(lref)
        u = s_[np.searchsorted(v_, np_col(t, "src"))]
        w = s_[np.searchsorted(v_, np_col(t, "dst"))]
        keep = u != w
        u, w = u[keep], w[keep]
        if not len(u):
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        dd = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        return pa.table({"src": pa.array(u[dd], pa.int64()),
                         "dst": pa.array(w[dd], pa.int64())})

    cedges = directed.map_batches(_condense, batch_format="pyarrow")
    g = build_graph(
        cedges, _work_dir("scccond"), 4, symmetrize=False,
        vertex_ids=np.unique(scc), persist=False,
    )
    res = longest_path(g, max_iters=CON_K, checkpoint_every=0,
                       scatter_mode="fused")
    t = depth_table(res)
    return pa.table({"scc": t["vid"], "depth": t["depth"]})


def _scc_condensed_depth_sql() -> str:
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes(
        "sc", "src, dst",
        f"CAST(src AS HUGEINT) * 4294967296 + dst + {mix}",
        f"(SELECT src, dst FROM pairs "
        f"WHERE src % {SCC_MOD} = 0 AND dst % {SCC_MOD} = 0)",
    )
    steps = [f"""{_scc_ctes(chain, sparse=CON_SPARSE)},
cedges AS MATERIALIZED (
  SELECT DISTINCT la.scc AS src, lb.scc AS dst
  FROM dedges d JOIN labs la ON la.vid = d.u
  JOIN labs lb ON lb.vid = d.v WHERE la.scc <> lb.scc
),
cverts AS (SELECT DISTINCT scc AS vid FROM labs),
cd0 AS MATERIALIZED (SELECT vid, CAST(0 AS BIGINT) AS depth FROM cverts)"""]
    for k in range(CON_K):
        steps.append(f"""
cm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, max(l.depth + 1) AS md
  FROM cedges e JOIN cd{k} l ON l.vid = e.src GROUP BY e.dst
),
cd{k + 1} AS MATERIALIZED (
  SELECT v.vid, greatest(v.depth, COALESCE(m.md, v.depth)) AS depth
  FROM cd{k} v LEFT JOIN cm{k} m ON m.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH RECURSIVE {body} "
        f"SELECT vid AS scc, CAST(depth AS BIGINT) AS depth "
        f"FROM cd{CON_K} ORDER BY scc"
    )


def _q_msf(sf_dir: str):
    """Borůvka minimum spanning forest of the weighted co-purchase
    graph.  The forest itself is not ANSI-SQL-expressible, but its
    (n_edges, total_weight) summary IS, via the threshold sweep
    total = Σ_t t·(C(t−1) − C(t)) with C(t) = #components of the
    subgraph of edges with weight ≤ t (``_msf_sql``, weights are small
    ints).  Edge-level exactness stays pinned by pytest vs a Kruskal
    validator (unique forest under the (w, src, dst) tie-break)."""
    from essentials_rd.algorithms import boruvka_msf
    from essentials_rd.pipelines import copurchase_edges, part_universe

    tbl, total = boruvka_msf(
        copurchase_edges(sf_dir), part_universe(sf_dir)
    )
    if tbl.num_rows:
        wmax = max(tbl.column("weight").to_pylist())
        assert wmax <= MSF_W_CAP, (
            f"MSF picked an edge of weight {wmax} > {MSF_W_CAP}; raise "
            "MSF_W_CAP so the SQL threshold sweep stays exact"
        )
    return pa.table(
        {
            "n_edges": pa.array([tbl.num_rows], pa.int64()),
            "total_weight": pa.array([total], pa.float64()),
        }
    )


def _q_sssp_dist(sf_dir: str):
    """Weighted single-source shortest paths from the min vertex id over
    the symmetrized co-purchase graph (weight = #shared orders).
    Bellman-Ford fixpoint; unreachable reported as -1 for SQL parity."""
    import ray

    from essentials_rd.algorithms import sssp
    from essentials_rd.algorithms.sssp import distances_table

    g, _ = _graph(sf_dir, weighted=True)
    source = int(np.min(ray.get(g.vertex_ids_ref)))
    res = sssp(g, source, max_iters=2 * SSSP_ITERS, checkpoint_every=0,
               scatter_mode="fused")
    assert res.converged and res.supersteps <= SSSP_ITERS, (
        "SSSP did not converge within the oracle's unrolled iteration count"
    )
    t = distances_table(res)
    dist = np.asarray(t["dist"], dtype=np.float64)
    dist = np.where(np.isfinite(dist), dist, -1.0)
    return pa.table({"vid": t["vid"], "dist": pa.array(dist, pa.float64())})


def _q_sssp_parent(sf_dir: str):
    """Shortest-path tree / routing table: parent(v) = the MIN
    neighbor u whose relaxed distance achieves dist(v) — deterministic
    because distances are exact integer-valued doubles on both
    engines.  One broadcast of the converged distance vector + one
    zero-new-shuffle edge scan with per-block min partials folded by a
    small grouped min; source points to itself, unreached to -1."""
    import ray
    import ray.data as rd

    from essentials_rd.algorithms import sssp
    from essentials_rd.algorithms.sssp import distances_table
    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    g, edges = _graph(sf_dir, weighted=True)
    vids_all = np.sort(np.asarray(ray.get(g.vertex_ids_ref), np.int64))
    source = int(vids_all.min())
    res = sssp(g, source, max_iters=2 * SSSP_ITERS, checkpoint_every=0,
               scatter_mode="fused")
    t = distances_table(res)
    dist = np.asarray(t["dist"], np.float64)
    dref = ray.put((vids_all, dist))

    def _cand(b: pa.Table) -> pa.Table:
        vv, dd = ray.get(dref)
        s = np_col(b, "src").astype(np.int64)
        d = np_col(b, "dst").astype(np.int64)
        w = np.asarray(b.column("weight").to_numpy(zero_copy_only=False),
                       np.float64)
        u = np.r_[s, d]
        v = np.r_[d, s]
        ww = np.r_[w, w]
        du = dd[np.searchsorted(vv, u)]
        dv = dd[np.searchsorted(vv, v)]
        ok = np.isfinite(du) & (du + ww == dv)
        v, u = v[ok], u[ok]
        # per-block partial min parent per v
        order = np.lexsort((u, v))
        v, u = v[order], u[order]
        st = np.r_[0, np.flatnonzero(v[1:] != v[:-1]) + 1] \
            if len(v) else np.zeros(0, np.int64)
        return pa.table({"vid": pa.array(v[st], pa.int64()),
                         "parent": pa.array(u[st], pa.int64())})

    cand = edges.select_columns(["src", "dst", "weight"]).map_batches(
        _cand, batch_format="pyarrow")
    rows = grouped_pandas_agg(
        cand, keys=["vid"], aggs={"parent": ("parent", "min")},
        num_buckets=8).take_all()
    pmap = {r["vid"]: r["parent"] for r in rows}
    parent = np.array(
        [v if v == source else pmap.get(int(v), -1) for v in vids_all],
        np.int64)
    return pa.table({"vid": pa.array(vids_all, pa.int64()),
                     "parent": pa.array(parent, pa.int64())})


def _q_widest_path(sf_dir: str):
    """Single-source widest (bottleneck / max-capacity) path from the
    min vertex id over the weighted symmetrized co-purchase graph —
    the max-min semiring dual of sssp_dist on the SAME engine loop
    (algorithms.widest): frontier vertices relax out-edges with
    min(width(u), w(u, v)), combine takes max, fixpoint is exact
    because widths are monotone non-decreasing from 0.  Unreachable =
    0, source carries the BIG sentinel; integer weights are exact in
    float64 on both sides, so the unrolled-CTE oracle hash-matches."""
    import ray

    from essentials_rd.algorithms import widest_path
    from essentials_rd.algorithms.widest import widths_table

    g, _ = _graph(sf_dir, weighted=True)
    source = int(np.min(ray.get(g.vertex_ids_ref)))
    res = widest_path(g, source, max_iters=2 * SSSP_ITERS,
                      checkpoint_every=0, scatter_mode="fused")
    assert res.converged and res.supersteps <= SSSP_ITERS, (
        "widest-path did not converge within the oracle's unrolled "
        "iteration count"
    )
    t = widths_table(res)
    return pa.table({"vid": t["vid"], "width": t["width"]})


def _q_spmv(sf_dir: str):
    from essentials_rd.algorithms import spmv
    from essentials_rd.algorithms.spmv import spmv_table
    from essentials_rd.pipelines import round_half_up

    g, _ = _graph(sf_dir, symmetrize=False, weighted=True)
    res = spmv(g)
    t = spmv_table(res)
    y = round_half_up(np.asarray(t["y"], dtype=np.float64), 6)
    return pa.table({"vid": t["vid"], "y": pa.array(y, pa.float64())})


KATZ_A = 4
KATZ_K = 4
FASTRP_D = 8
FASTRP_K = 2


def _q_fastrp(sf_dir: str):
    """FastRP node embeddings (algorithms.fastrp): X_K = A^K R with R
    the splitmix-derived ±1/0 very-sparse projection — all d
    dimensions travel as separate packed message columns in the SAME
    exchange, one superstep per hop; every entry an exact integer so
    the unrolled oracle matches bit-for-bit.  Long (vid, dim, val)
    form."""
    from essentials_rd.algorithms.fastrp import fastrp, fastrp_table

    g, _ = _graph(sf_dir)
    res = fastrp(g, d=FASTRP_D, k_iters=FASTRP_K, scatter_mode="fused")
    return fastrp_table(res, d=FASTRP_D)


def _fastrp_sql() -> str:
    # literals on purpose (twin-independence) — must equal the
    # engine's FASTRP_D / FASTRP_K; a module edit breaks the pair loudly
    FASTRP_D = 8
    FASTRP_K = 2
    chain = _sm64_ctes(
        "fp", "vid, dim", "vid * 2654435761 + dim",
        "(SELECT v.vid, d.dim FROM verts v, "
        f"(SELECT unnest(range(0, {FASTRP_D})) AS dim) d)")
    steps = [
        "fx0 AS MATERIALIZED (SELECT vid, dim, "
        "CASE WHEN z % 6 = 0 THEN 1 WHEN z % 6 = 1 THEN -1 ELSE 0 END "
        "AS val FROM fp3)"]
    for k in range(FASTRP_K):
        steps.append(
            f"fx{k + 1} AS MATERIALIZED (SELECT e.dst AS vid, x.dim, "
            f"sum(x.val) AS val FROM sym e JOIN fx{k} x ON x.vid = e.src "
            "GROUP BY 1, 2)")
    return (
        f"WITH {_GRAPH_CTES}, {chain}, {', '.join(steps)} "
        "SELECT v.vid, d.dim, CAST(COALESCE(x.val, 0) AS BIGINT) AS val "
        f"FROM verts v CROSS JOIN (SELECT unnest(range(0, {FASTRP_D})) "
        f"AS dim) d LEFT JOIN fx{FASTRP_K} x "
        "ON x.vid = v.vid AND x.dim = d.dim ORDER BY v.vid, d.dim"
    )


def _q_katz(sf_dir: str):
    """Truncated Katz centrality (algorithms.katz): α = 1/4, K = 4,
    via the integer-exact scaled recurrence y_{k+1} = 4^{k+1} +
    Σ_{u~v} y_k(u) — emitted as the exact int64 walk sum y_K (the
    score is y_K/4^K), so the unrolled oracle matches with no float
    rounding anywhere."""
    from essentials_rd.algorithms.katz import katz, katz_table

    g, _ = _graph(sf_dir)
    res = katz(g, a_int=KATZ_A, k_iters=KATZ_K, scatter_mode="fused")
    return katz_table(res)


def _katz_sql() -> str:
    steps = ["k0 AS MATERIALIZED (SELECT vid, CAST(1 AS HUGEINT) AS y "
             "FROM verts)"]
    for t in range(KATZ_K):
        steps.append(f"""k{t + 1} AS MATERIALIZED (
  SELECT v.vid, {KATZ_A ** (t + 1)} + COALESCE(s.s, 0) AS y
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, sum(k.y) AS s
    FROM sym e JOIN k{t} k ON k.vid = e.src GROUP BY e.dst
  ) s ON s.vid = v.vid)""")
    return (
        f"WITH {_GRAPH_CTES}, {','.join(steps)} "
        f"SELECT vid, CAST(y AS BIGINT) AS katz_num FROM k{KATZ_K} "
        "ORDER BY vid"
    )


def _q_nbr_deg(sf_dir: str):
    """Average-neighbor-degree feature (algorithms.spmv.NbrDegProgram):
    one SpMV superstep with x = the degree vector gives each vertex the
    exact integer Σ of its neighbors' degrees — emitted alongside the
    degree so the ratio derives from two int64s.  Same one-exchange
    cost as any SpMV; no extra pass builds x."""
    from essentials_rd.algorithms.spmv import (neighbor_degree_sums,
                                               spmv_table)

    g, _ = _graph(sf_dir)
    res = neighbor_degree_sums(g)
    t = spmv_table(res)
    return pa.table({
        "vid": t["vid"],
        "degree": pa.array(np.asarray(t["x"], np.float64)
                           .astype(np.int64), pa.int64()),
        "sum_nbr_deg": pa.array(np.asarray(t["y"], np.float64)
                                .astype(np.int64), pa.int64()),
    })


def _nbr_deg_sql() -> str:
    return f"""
WITH {_GRAPH_CTES},
s AS (SELECT e.src AS vid, sum(d.outdeg) AS snd
      FROM sym e JOIN deg d ON d.vid = e.dst GROUP BY 1)
SELECT v.vid, CAST(d.outdeg AS BIGINT) AS degree,
CAST(COALESCE(s.snd, 0) AS BIGINT) AS sum_nbr_deg
FROM verts v JOIN deg d ON d.vid = v.vid
LEFT JOIN s ON s.vid = v.vid ORDER BY v.vid
"""


COSINE_DUP_T = 0.4
SESSION_GAP_MIN = 30


def _q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate over the event stream (windows.py):
    hourly window × event_type, integer-exact aggregates."""
    import ray.data as rd

    from essentials_rd.windows import tumbling_window_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])
    return tumbling_window_agg(ev, every_minutes=60)


def _q_user_sessions(sf_dir: str):
    """Sessionization (30-min inactivity gap) — per-user session stats
    via one user-bucketed shuffle (windows.py)."""
    import ray.data as rd

    from essentials_rd.windows import sessionize

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    return sessionize(ev, gap_minutes=SESSION_GAP_MIN)


def _q_user_lag_moments(sf_dir: str):
    """Per-user lag-1 moment tuple (windows.lag1_moments): eight exact
    int64s over the (ts, event_id)-ordered half-up-cents value stream
    from which lag-1 autocorrelation and Durbin-Watson derive exactly
    — the SEQUENCE-ordered statistic the unordered moment queries
    cannot express.  One user-bucketed exchange, cumsum-difference
    segment kernel."""
    import ray.data as rd

    from essentials_rd.windows import lag1_moments

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return lag1_moments(ev)


def _user_lag_moments_sql() -> str:
    return (
        "WITH o AS (SELECT user_id, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS x, "
        "lead(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS y FROM events) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(x) AS BIGINT) AS sum_x, "
        "CAST(sum(x * x) AS BIGINT) AS sum_xx, "
        "CAST(count(y) AS BIGINT) AS n_pairs, "
        "CAST(COALESCE(sum(x) FILTER (WHERE y IS NOT NULL), 0) "
        "AS BIGINT) AS sum_a, "
        "CAST(COALESCE(sum(y), 0) AS BIGINT) AS sum_b, "
        "CAST(COALESCE(sum(x * y), 0) AS BIGINT) AS sum_ab "
        "FROM o GROUP BY user_id"
    )


def _q_user_cusum(sf_dir: str):
    """Per-user CUSUM changepoint statistics (windows.cusum_stats,
    Page 1954): max/min excursions of the count-scaled prefix sums
    P_i = Σ(n·x_j − T) over the (ts, event_id)-ordered half-up-cents
    value stream, plus the 1-based first-argmax position — the
    estimated mean-shift location.  Exact int64 end to end (the n·x
    scaling removes the mean division), one user-bucketed exchange,
    segmented cumsum/reduceat kernel."""
    import ray.data as rd

    from essentials_rd.windows import cusum_stats

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return cusum_stats(ev)


def _user_cusum_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, ts, event_id, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS x FROM events), "
        "s AS (SELECT user_id, ts, event_id, x, "
        "CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n, "
        "CAST(sum(x) OVER (PARTITION BY user_id) AS BIGINT) AS t "
        "FROM e), "
        "p AS (SELECT user_id, n, "
        "CAST(sum(n * x - t) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS pf, "
        "CAST(row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS BIGINT) AS pos FROM s), "
        "m AS (SELECT user_id, any_value(n) AS n, "
        "CAST(max(pf) AS BIGINT) AS cusum_max, "
        "CAST(min(pf) AS BIGINT) AS cusum_min FROM p GROUP BY 1) "
        "SELECT m.user_id, m.n, m.cusum_max, m.cusum_min, "
        "CAST(min(p.pos) AS BIGINT) AS argmax_pos "
        "FROM m JOIN p ON p.user_id = m.user_id "
        "AND p.pf = m.cusum_max GROUP BY 1, 2, 3, 4"
    )


IV_MOD_MIN = 45  # interval duration: (event_id % 45 + 1) minutes


def _q_user_intervals(sf_dir: str):
    """Per-user interval UNION (windows.merge_intervals): each event
    opens a half-open extent [ts, ts + (event_id % 45 + 1) min) and
    overlapping/touching extents collapse into maximal merged
    intervals — the gaps-and-islands shape (playback spans, locks)
    that point-event sessionization cannot express.  One user-bucketed
    exchange, banded-cummax kernel, no Python loop."""
    import ray.data as rd

    from essentials_rd.util import np_col
    from essentials_rd.windows import _epoch_us, merge_intervals

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def _mk(batch: pa.Table) -> pa.Table:
        t = _epoch_us(batch, "ts")
        eid = np_col(batch, "event_id").astype(np.int64)
        dur = (eid % IV_MOD_MIN + 1) * 60_000_000
        return pa.table({
            "user_id": batch.column("user_id").cast(pa.int64()),
            "s": pa.array(t, pa.int64()),
            "e": pa.array(t + dur, pa.int64()),
        })

    return merge_intervals(ev.map_batches(_mk, batch_format="pyarrow"))


def _user_intervals_sql() -> str:
    return (
        "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, "
        f"epoch_us(ts) + ((event_id % {IV_MOD_MIN}) + 1) * 60000000 AS e "
        "FROM events), "
        "m AS (SELECT user_id, s, e, CASE WHEN s <= max(e) OVER "
        "(PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND 1 PRECEDING) THEN 0 ELSE 1 END AS new FROM iv), "
        "g AS (SELECT user_id, s, e, sum(new) OVER (PARTITION BY user_id "
        "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS gid FROM m) "
        "SELECT user_id, min(s) AS iv_start, max(e) AS iv_end, "
        "CAST(count(*) AS BIGINT) AS n_src FROM g GROUP BY user_id, gid"
    )


HOP_SIZE_MIN = 120
HOP_MIN = 60
TOPK_PER_LANG = 3
QUANTILES = [0.25, 0.5, 0.75, 0.9]


def _q_events_hopping(sf_dir: str):
    """Hopping (overlapping) windows — size 2h advancing hourly; each
    event replicated into its size/hop covering windows inside
    map_batches, then the standard bucketed (window, key) aggregate."""
    import ray.data as rd

    from essentials_rd.windows import hopping_window_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])
    return hopping_window_agg(ev, size_minutes=HOP_SIZE_MIN,
                              hop_minutes=HOP_MIN)


def _q_top_docs_per_lang(sf_dir: str):
    """Exact per-group top-k (ops.grouped_top_k): the TOPK_PER_LANG
    longest documents per language, ties by doc_id."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_top_k

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"])

    def _proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "lang": t.column("lang"),
                "doc_id": t.column("doc_id"),
                "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        )

    proj = docs.map_batches(_proj, batch_format="pyarrow")
    out = grouped_top_k(
        proj, ["lang"], "n_chars", TOPK_PER_LANG, descending=True,
        tie_cols=["doc_id"], key_fn=lambda b: _str_hash(b.column("lang")),
    )
    rows = out.take_all()
    rows.sort(key=lambda r: (r["lang"], r["rank"]))
    return pa.table(
        {
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
            "rank": pa.array([r["rank"] for r in rows], pa.int64()),
        }
    )


def _q_quantity_quantiles(sf_dir: str):
    """Exact discrete quantiles of l_quantity from the distributed
    value histogram (ops.exact_quantiles, quantile_disc semantics)."""
    import ray.data as rd

    from essentials_rd.ops import exact_quantiles

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity"])
    vals = exact_quantiles(li, "l_quantity", QUANTILES)
    return pa.table(
        {
            "q": pa.array(QUANTILES, pa.float64()),
            "value": pa.array(vals, pa.int64()),
        }
    )


DYADIC_QUANTILES = [0.25, 0.5, 0.75, 0.875]


def _q_quantity_quantiles_cont(sf_dir: str):
    """Interpolated (``quantile_cont``) quantiles of l_quantity from
    the same distributed value histogram as ``quantity_quantiles``
    (ops.exact_quantiles_cont).  Every q is DYADIC (k/2^m), so the
    position q*(n-1), its fractional part and the linear interpolation
    between two small-integer values are all exactly representable
    doubles — the result is bit-identical to DuckDB's quantile_cont
    regardless of how either engine arranges the lerp."""
    import ray.data as rd

    from essentials_rd.ops import exact_quantiles_cont

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity"])
    vals = exact_quantiles_cont(li, "l_quantity", DYADIC_QUANTILES)
    return pa.table(
        {
            "q": pa.array(DYADIC_QUANTILES, pa.float64()),
            "value": pa.array(vals, pa.float64()),
        }
    )


SKETCH_FRAC = 0.2


def _q_price_quantiles_sampled(sf_dir: str):
    """Sample-sketch quantiles — the bounded-memory scale path beside
    the exact value-histogram (`quantity_quantiles`): a deterministic
    SplitMix64 row sample (pure function of o_orderkey, identical at
    any cluster size) feeds the exact quantile kernel, so the estimate
    is a deterministic sketch the SQL twin reproduces bit-for-bit via
    the shared sm64 chain.  Values are half-up cents (exact ints)."""
    import ray.data as rd

    from essentials_rd.ops import deterministic_sample, exact_quantiles
    from essentials_rd.util import np_col as _nc

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    sample = deterministic_sample(
        orders, SKETCH_FRAC, lambda b: _nc(b, "o_orderkey"),
        seed=SAMPLE_SEED,
    )

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(_nc(t, "o_totalprice") * 100.0 + 0.5).astype(np.int64)
        return pa.table({"cents": pa.array(c, pa.int64())})

    vals = exact_quantiles(
        sample.map_batches(_cents, batch_format="pyarrow"), "cents",
        QUANTILES,
    )
    return pa.table(
        {
            "q": pa.array(QUANTILES, pa.float64()),
            "value": pa.array(vals, pa.int64()),
        }
    )


RANGE_PARTS = 8


def _q_orders_range_parts(sf_dir: str):
    """Deterministic range partitioner (ops.range_partition): equi-depth
    boundaries from the exact quantiles of a SplitMix64 sample (pure
    function of the data — identical at any cluster size, and the SQL
    twin recomputes them bit-for-bit via the shared sm64 chain), rows
    routed by searchsorted; per-partition (n, min, max) — the layout
    stats a distributed sort / range-partitioned write runs on."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, range_partition
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(
            np.asarray(t.column("o_totalprice").to_numpy(zero_copy_only=False),
                       np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {"o_orderkey": t.column("o_orderkey").cast(pa.int64()),
             "cents": pa.array(c, pa.int64())}
        )

    cents = orders.map_batches(_cents, batch_format="pyarrow")
    routed, _bounds = range_partition(
        cents, "cents", RANGE_PARTS,
        key_fn=lambda b: np_col(b, "o_orderkey"),
        sample_frac=SKETCH_FRAC, seed=SAMPLE_SEED,
    )
    agg = grouped_pandas_agg(
        routed,
        keys=["part_id"],
        aggs={"n": ("cents", "count"), "min_cents": ("cents", "min"),
              "max_cents": ("cents", "max")},
        num_buckets=8,
    )
    rows = agg.take_all()
    return pa.table(
        {
            "part_id": pa.array([r["part_id"] for r in rows], pa.int64()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "min_cents": pa.array([r["min_cents"] for r in rows], pa.int64()),
            "max_cents": pa.array([r["max_cents"] for r in rows], pa.int64()),
        }
    ).sort_by("part_id")


def _q_sorted_write(sf_dir: str):
    """Globally sorted partitioned output (sinks.write_sorted — the
    external-sort / terasort layout): orders cents range-partitioned by
    the same deterministic sampler as orders_range_parts, per-partition
    sorted and atomically written; this query READS THE FILES BACK,
    asserts in-file and cross-partition sortedness (raising, not
    reporting, on violation — the oracle can't see files), and emits
    the same per-partition (n, min, max) stats the shared bounds CTE
    reproduces."""
    import os

    import pyarrow.parquet as _pq
    import ray.data as rd

    from essentials_rd.sinks import _part_dir, write_sorted
    from essentials_rd.util import np_col

    base = ("/tmp/essentials_rd_sortwrite_"
            + os.path.basename(os.path.normpath(sf_dir)))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {"o_orderkey": t.column("o_orderkey").cast(pa.int64()),
             "cents": pa.array(c, pa.int64())})

    write_sorted(orders.map_batches(_cents, batch_format="pyarrow"),
                 base, "cents",
                 key_fn=lambda b: np_col(b, "o_orderkey"),
                 num_partitions=RANGE_PARTS, sample_frac=SKETCH_FRAC,
                 tie_cols=["o_orderkey"])
    rows = []
    prev_max = None
    for p in range(RANGE_PARTS):
        f = os.path.join(_part_dir(base, p), "data.parquet")
        if not os.path.exists(f):
            continue
        t = _pq.read_table(f)
        v = np_col(t, "cents")
        if len(v) == 0:
            continue
        if not (np.diff(v) >= 0).all():
            raise AssertionError(f"partition {p} not sorted")
        if prev_max is not None and v[0] < prev_max:
            raise AssertionError(f"partition {p} overlaps previous range")
        prev_max = v[-1]
        rows.append((p, len(v), int(v[0]), int(v[-1])))
    return pa.table({
        "part_id": pa.array([r[0] for r in rows], pa.int64()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "min_cents": pa.array([r[2] for r in rows], pa.int64()),
        "max_cents": pa.array([r[3] for r in rows], pa.int64()),
    })


WELCH_A, WELCH_B = "purchase", "view"


PERM_B, PERM_SEED = 32, 23


def _q_perm_test(sf_dir: str):
    """Randomization test for the purchase-vs-view mean difference —
    the distribution-free companion to Welch: 32 deterministic
    random-relabelings (replicate b reassigns each pooled row by bit b
    of splitmix64(event_id + seed·golden) — exchangeable under the
    sharp null) each yield a mean difference; the answer is how many
    relabeled |diffs| reach the observed |diff|.  ALL 32 replicates
    fold in ONE streaming pass: per block a 32-lane bit-matrix
    popcount/sum gives (n_b, s_b) per lane (2·32 ints), the complement
    comes from the pooled totals; every float is computed in the SQL
    twin's expression order.  Output: (n_a, n_b, obs_diff 6dp,
    n_extreme, n_reps)."""
    import math

    import ray.data as rd

    from essentials_rd.util import hash64, np_col

    mix = np.int64((PERM_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1))
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), object)
        keep = (et == WELCH_A) | (et == WELCH_B)
        tt = t.take(pa.array(np.flatnonzero(keep)))
        et = et[keep]
        c = np.floor(np.asarray(tt.column("value").to_numpy(
            zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        eid = np_col(tt, "event_id")
        with np.errstate(over="ignore"):
            h = hash64(eid + mix)
        bits = ((h[:, None] >> np.arange(PERM_B, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        nb = bits.sum(axis=0)
        sb = (bits * c[:, None]).sum(axis=0)
        ga = et == WELCH_A
        return pa.table({
            "i": pa.array(np.arange(PERM_B + 2, dtype=np.int64)),
            "n": pa.array(np.r_[nb, int(ga.sum()), int((~ga).sum())],
                          pa.int64()),
            "s": pa.array(np.r_[sb, int(c[ga].sum()),
                                int(c[~ga].sum())], pa.int64()),
        })

    acc_n = np.zeros(PERM_B + 2, dtype=object)
    acc_s = np.zeros(PERM_B + 2, dtype=object)
    for r in ev.map_batches(_partial, batch_format="pyarrow").take_all():
        acc_n[int(r["i"])] += int(r["n"])
        acc_s[int(r["i"])] += int(r["s"])
    n_a, n_b_ = int(acc_n[PERM_B]), int(acc_n[PERM_B + 1])
    s_a, s_b_ = int(acc_s[PERM_B]), int(acc_s[PERM_B + 1])
    n_tot, s_tot = n_a + n_b_, s_a + s_b_
    obs = float(s_a) / float(n_a) - float(s_b_) / float(n_b_)
    n_extreme = 0
    for b in range(PERM_B):
        nb, sb = int(acc_n[b]), int(acc_s[b])
        if nb == 0 or nb == n_tot:
            continue
        diff = (float(sb) / float(nb)
                - float(s_tot - sb) / float(n_tot - nb))
        if abs(diff) >= abs(obs):
            n_extreme += 1
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b_], pa.int64()),
        "obs_diff": pa.array([r6(obs)], pa.float64()),
        "n_extreme": pa.array([n_extreme], pa.int64()),
        "n_reps": pa.array([PERM_B], pa.int64()),
    })


def _perm_test_sql() -> str:
    mix = (PERM_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes(
        "pm", "c, ga", f"event_id + {mix}",
        "(SELECT event_id, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c, "
        f"CASE WHEN event_type = '{WELCH_A}' THEN 1 ELSE 0 END AS ga "
        "FROM events WHERE event_type IN "
        f"('{WELCH_A}', '{WELCH_B}'))")
    lanes = ", ".join(
        f"CAST(SUM((z >> {b}) & 1) AS BIGINT) AS n{b}, "
        f"CAST(SUM(CASE WHEN (z >> {b}) & 1 = 1 THEN c ELSE 0 END) "
        f"AS BIGINT) AS s{b}"
        for b in range(PERM_B))
    reps = " UNION ALL ".join(
        f"SELECT n{b} AS nb, s{b} AS sb FROM lanes" for b in range(PERM_B))
    return (
        f"WITH {chain}, "
        f"lanes AS (SELECT {lanes}, "
        "CAST(SUM(ga) AS BIGINT) AS na, "
        "CAST(SUM(1 - ga) AS BIGINT) AS nbg, "
        "CAST(SUM(CASE WHEN ga = 1 THEN c ELSE 0 END) AS BIGINT) AS sa, "
        "CAST(SUM(CASE WHEN ga = 0 THEN c ELSE 0 END) AS BIGINT) AS sbg "
        "FROM pm3), "
        "ob AS (SELECT na, nbg, sa, sbg, na + nbg AS nt, "
        "sa + sbg AS st, CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - "
        "CAST(sbg AS DOUBLE) / CAST(nbg AS DOUBLE) AS obs FROM lanes), "
        f"rp AS ({reps}), "
        "ex AS (SELECT CAST(count(*) AS BIGINT) AS k FROM rp, ob "
        "WHERE rp.nb > 0 AND rp.nb < ob.nt AND "
        "abs(CAST(rp.sb AS DOUBLE) / CAST(rp.nb AS DOUBLE) - "
        "CAST(ob.st - rp.sb AS DOUBLE) / CAST(ob.nt - rp.nb AS DOUBLE)) "
        ">= abs(ob.obs)) "
        "SELECT ob.na AS n_a, ob.nbg AS n_b, "
        "floor(ob.obs * 1000000 + 0.5) / 1000000 AS obs_diff, "
        "ex.k AS n_extreme, "
        f"CAST({PERM_B} AS BIGINT) AS n_reps FROM ob, ex"
    )


def _q_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t-test — the parametric companion to
    the suite's rank-sum/KS/EMD drift tests — comparing purchase vs
    view event values: per group the EXACT integer moments (n, Σcents,
    Σcents²) fold as one 6-int partial per block (zero shuffles, no
    value ever leaves its block), then t = (m₁−m₂)/√(v₁/n₁+v₂/n₂) and
    the Welch–Satterthwaite df are driver floats COMPUTED IN THE SAME
    IEEE EXPRESSION ORDER as the SQL twin (every intermediate is a
    correctly-rounded op on the same exact ints), floored half-up to
    6dp."""
    import math

    import ray.data as rd

    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), object)
        c = np.floor(np.asarray(t.column("value").to_numpy(
            zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        out = []
        for g in (WELCH_A, WELCH_B):
            m = et == g
            v = c[m]
            out.append((int(m.sum()), int(v.sum()),
                        int((v * v).sum())))
        return pa.table({
            "g": pa.array([0, 1], pa.int64()),
            "n": pa.array([out[0][0], out[1][0]], pa.int64()),
            "s": pa.array([out[0][1], out[1][1]], pa.int64()),
            "ss": pa.array([out[0][2], out[1][2]], pa.int64()),
        })

    acc = {0: [0, 0, 0], 1: [0, 0, 0]}
    for r in ev.map_batches(_partial, batch_format="pyarrow").take_all():
        a = acc[int(r["g"])]
        a[0] += int(r["n"]); a[1] += int(r["s"]); a[2] += int(r["ss"])
    (n1, s1, ss1), (n2, s2, ss2) = acc[0], acc[1]
    m1 = float(s1) / float(n1)
    m2 = float(s2) / float(n2)
    v1 = (float(ss1) - float(s1) * float(s1) / float(n1)) / float(n1 - 1)
    v2 = (float(ss2) - float(s2) * float(s2) / float(n2)) / float(n2 - 1)
    a_ = v1 / float(n1)
    b_ = v2 / float(n2)
    se2 = a_ + b_
    t_stat = (m1 - m2) / math.sqrt(se2)
    df = (se2 * se2) / (a_ * a_ / float(n1 - 1)
                        + b_ * b_ / float(n2 - 1))
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    return pa.table({
        "n_a": pa.array([n1], pa.int64()),
        "n_b": pa.array([n2], pa.int64()),
        "mean_diff": pa.array([r6(m1 - m2)], pa.float64()),
        "t_stat": pa.array([r6(t_stat)], pa.float64()),
        "df": pa.array([r6(df)], pa.float64()),
    })


def _welch_ttest_sql() -> str:
    return (
        "WITH b AS (SELECT event_type AS g, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events "
        f"WHERE event_type IN ('{WELCH_A}', '{WELCH_B}')), "
        "s AS (SELECT g, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(c) AS BIGINT) AS sv, "
        "CAST(sum(c * c) AS BIGINT) AS ss FROM b GROUP BY g), "
        f"x AS (SELECT n, sv, ss FROM s WHERE g = '{WELCH_A}'), "
        f"y AS (SELECT n, sv, ss FROM s WHERE g = '{WELCH_B}'), "
        "f AS (SELECT x.n AS n1, y.n AS n2, "
        "CAST(x.sv AS DOUBLE) / CAST(x.n AS DOUBLE) AS m1, "
        "CAST(y.sv AS DOUBLE) / CAST(y.n AS DOUBLE) AS m2, "
        "(CAST(x.ss AS DOUBLE) - CAST(x.sv AS DOUBLE) * "
        "CAST(x.sv AS DOUBLE) / CAST(x.n AS DOUBLE)) "
        "/ CAST(x.n - 1 AS DOUBLE) AS v1, "
        "(CAST(y.ss AS DOUBLE) - CAST(y.sv AS DOUBLE) * "
        "CAST(y.sv AS DOUBLE) / CAST(y.n AS DOUBLE)) "
        "/ CAST(y.n - 1 AS DOUBLE) AS v2 FROM x, y), "
        "w AS (SELECT n1, n2, m1, m2, v1 / CAST(n1 AS DOUBLE) AS a, "
        "v2 / CAST(n2 AS DOUBLE) AS b2 FROM f) "
        "SELECT n1 AS n_a, n2 AS n_b, "
        "floor((m1 - m2) * 1000000 + 0.5) / 1000000 AS mean_diff, "
        "floor(((m1 - m2) / sqrt(a + b2)) * 1000000 + 0.5) / 1000000 "
        "AS t_stat, "
        "floor((((a + b2) * (a + b2)) / (a * a / CAST(n1 - 1 AS DOUBLE) "
        "+ b2 * b2 / CAST(n2 - 1 AS DOUBLE))) * 1000000 + 0.5) "
        "/ 1000000 AS df FROM w"
    )


def _q_logistic_newton(sf_dir: str):
    """One exact Newton step of logistic regression
    (mlfit.logistic_newton1): classify orders URGENT vs not from the
    $10k price band — β₁ = 2·(XᵀX)⁻¹(2Xᵀy − Xᵀ1), the only logistic
    iterate that is a pure rational of integer data sums (σ(0)=½ makes
    W=¼·I exact), emitted as exact (num, den) per coefficient.  ONE
    streaming pass folds the 5 integer Gram/moment sums (zero
    shuffles); the solve is driver Cramer over unbounded ints."""
    import ray.data as rd

    from essentials_rd.mlfit import logistic_newton1

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice", "o_orderpriority"])

    def _xy(t: pa.Table):
        p = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        band = (np.floor(p * 100.0 + 0.5).astype(np.int64)
                // 1_000_000)
        y = (np.asarray(t.column("o_orderpriority").to_pylist(),
                        object) == "1-URGENT").astype(np.int64)
        X = np.stack([np.ones(len(band), np.int64), band], axis=1)
        return X, y

    return logistic_newton1(orders, _xy, p=2)


def _logistic_newton_sql() -> str:
    return (
        "WITH b AS (SELECT "
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 1000000 "
        "AS x, CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 "
        "END AS y FROM orders), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(x) AS HUGEINT) AS sx, "
        "CAST(sum(x * x) AS HUGEINT) AS sxx, "
        "CAST(sum(y) AS HUGEINT) AS sy, "
        "CAST(sum(x * y) AS HUGEINT) AS sxy FROM b), "
        "v AS (SELECT n, sx, sxx, 2 * sy - n AS b0, "
        "2 * sxy - sx AS b1, n * sxx - sx * sx AS den FROM s) "
        "SELECT CAST(0 AS BIGINT) AS j, "
        "CAST(2 * (b0 * sxx - sx * b1) AS BIGINT) AS num, "
        "CAST(den AS BIGINT) AS den, CAST(n AS BIGINT) AS n FROM v "
        "UNION ALL SELECT CAST(1 AS BIGINT), "
        "CAST(2 * (n * b1 - b0 * sx) AS BIGINT), "
        "CAST(den AS BIGINT), CAST(n AS BIGINT) FROM v ORDER BY j"
    )


CDC_K = 6


def _q_cdc_chunks(sf_dir: str):
    """Content-defined chunking dedup ledger (textops.gear_chunks +
    cdc_dedup_stats): gear-hash CDC over every document — cut when the
    rolling 64-codepoint gear state ≡ 0 mod 2^6 (~64-char expected
    chunks; boundaries are LOCAL, so an insertion re-chunks O(1)
    chunks — the property fixed blocks lack), chunk identity = md5 —
    folded to (n_docs, n_chunks, total_chars, n_distinct,
    unique_chars): the bytes a content-addressed store would keep.
    One streaming chunk pass + one digest-bucketed dedup exchange."""
    import ray.data as rd

    from essentials_rd.textops import cdc_dedup_stats, gear_chunks

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    n_docs = docs.count()
    stats = cdc_dedup_stats(
        gear_chunks(docs, "text", "doc_id", k=CDC_K))
    return pa.table({
        "n_docs": pa.array([int(n_docs)], pa.int64()),
        "n_chunks": stats["n_chunks"],
        "total_chars": stats["total_chars"],
        "n_distinct": stats["n_distinct"],
        "unique_chars": stats["unique_chars"],
    })


def _cdc_chunks_sql() -> str:
    # literal on purpose (twin-independence) — engine CDC_K=6 frozen
    mod = 1 << 6
    m64 = 1 << 64
    gear = _sm64_ctes("gr", "b", "b", "(SELECT range AS b FROM range(256))")
    return (
        f"WITH RECURSIVE {gear}, "
        "docs AS (SELECT doc_id, text, length(text) AS n "
        "FROM documents WHERE length(text) > 0), "
        "rec(doc_id, i, h) AS ("
        "SELECT d.doc_id, 1, g.z FROM docs d JOIN gr3 g "
        "ON g.b = ord(substr(d.text, 1, 1)) % 256 "
        "UNION ALL "
        "SELECT r.doc_id, r.i + 1, "
        f"CAST((CAST(r.h AS HUGEINT) * 2 + g.z) % {m64} AS UBIGINT) "
        "FROM rec r JOIN docs d ON d.doc_id = r.doc_id "
        "JOIN gr3 g ON g.b = ord(substr(d.text, r.i + 1, 1)) % 256 "
        "WHERE r.i < d.n), "
        f"cuts AS (SELECT doc_id, i, CASE WHEN h % {mod} = 0 "
        "THEN 1 ELSE 0 END AS c FROM rec), "
        "cid AS (SELECT doc_id, i, COALESCE(SUM(c) OVER ("
        "PARTITION BY doc_id ORDER BY i "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn "
        "FROM cuts), "
        "ch AS (SELECT doc_id, cn, min(i) AS s, max(i) AS e "
        "FROM cid GROUP BY 1, 2), "
        "ck AS (SELECT md5(substr(d.text, CAST(ch.s AS INTEGER), "
        "CAST(ch.e - ch.s + 1 AS INTEGER))) AS m, ch.e - ch.s + 1 AS clen "
        "FROM ch JOIN docs d USING (doc_id)), "
        "dk AS (SELECT DISTINCT m, clen FROM ck) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) "
        "AS n_docs, "
        "(SELECT CAST(count(*) AS BIGINT) FROM ck) AS n_chunks, "
        "(SELECT CAST(COALESCE(sum(clen), 0) AS BIGINT) FROM ck) "
        "AS total_chars, "
        "(SELECT CAST(count(*) AS BIGINT) FROM dk) AS n_distinct, "
        "(SELECT CAST(COALESCE(sum(clen), 0) AS BIGINT) FROM dk) "
        "AS unique_chars"
    )


SDRIFT_NONE = "<none>"


def _q_schema_drift(sf_dir: str):
    """Schema-evolution read (sources.read_union_by_name): three epoch
    file sets written from orders with DRIFTED schemas — epoch 0
    (keys ≡0 mod 3) predates the priority column, epoch 1 stores cents
    as int32 (promoted to int64 on read) and adds priority, epoch 2
    dropped cents — then ONE union-by-name read aligns columns by
    name, null-fills what each epoch lacks, promotes int32→int64, and
    a grouped aggregate over the unified view emits per priority
    (nulls bucketed '<none>'): row count, non-null cents count, cents
    sum.  Planning is one footer read per file; data reads stay one
    pruned read_parquet per schema group."""
    import glob
    import os
    import shutil

    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.sources import read_union_by_name
    from essentials_rd.util import np_col

    base_dir = ("/tmp/essentials_rd_sdrift_"
                + os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(base_dir, ignore_errors=True)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"])

    def _proj(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"k": t.column("o_orderkey").cast(pa.int64()),
                         "cents": pa.array(c, pa.int64()),
                         "prio": t.column("o_orderpriority")})

    full = orders.map_batches(_proj, batch_format="pyarrow")

    def _epoch(mod: int, cols: list[str], cast32: bool):
        def _f(t: pa.Table) -> pa.Table:
            keep = np_col(t, "k") % 3 == mod
            t = t.take(pa.array(np.flatnonzero(keep)))
            out = {}
            for c in cols:
                col = t.column(c)
                if c == "cents" and cast32:
                    col = col.cast(pa.int32())
                out[c] = col
            return pa.table(out)
        return _f

    for mod, cols, cast32 in ((0, ["k", "cents"], False),
                              (1, ["k", "cents", "prio"], True),
                              (2, ["k", "prio"], False)):
        full.map_batches(_epoch(mod, cols, cast32),
                         batch_format="pyarrow").write_parquet(
            os.path.join(base_dir, f"epoch{mod}"))

    paths = sorted(glob.glob(os.path.join(base_dir, "*", "*.parquet")))
    ds = read_union_by_name(paths)

    def _prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        prio = pc.fill_null(t.column("prio"), SDRIFT_NONE)
        cents = t.column("cents")
        nn = pc.cast(pc.is_valid(cents), pa.int64())
        cv = pc.fill_null(cents, 0)
        return pa.table({"prio": prio,
                         "one": pa.array(np.ones(t.num_rows, np.int64),
                                         pa.int64()),
                         "nn": nn, "cv": cv})

    from essentials_rd.windows import _str_or_int_key
    agg = grouped_pandas_agg(
        ds.map_batches(_prep, batch_format="pyarrow"),
        keys=["prio"],
        aggs={"n_rows": ("one", "sum"), "n_cents": ("nn", "sum"),
              "sum_cents": ("cv", "sum")},
        key_fn=lambda b: _str_or_int_key(b.column("prio")).view(np.int64),
        num_buckets=8)
    rows = sorted(agg.take_all(), key=lambda r: r["prio"])
    return pa.table({
        "prio": pa.array([r["prio"] for r in rows], pa.string()),
        "n_rows": pa.array([int(r["n_rows"]) for r in rows], pa.int64()),
        "n_cents": pa.array([int(r["n_cents"]) for r in rows], pa.int64()),
        "sum_cents": pa.array([int(r["sum_cents"]) for r in rows],
                              pa.int64()),
    })


def _schema_drift_sql() -> str:
    return (
        "WITH base AS (SELECT o_orderkey AS k, "
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents, "
        "o_orderpriority AS prio FROM orders), "
        f"eff AS (SELECT CASE WHEN k % 3 = 0 THEN '{SDRIFT_NONE}' "
        "ELSE prio END AS prio, "
        "CASE WHEN k % 3 = 2 THEN NULL ELSE cents END AS c FROM base) "
        "SELECT prio, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(c) AS BIGINT) AS n_cents, "
        "CAST(COALESCE(sum(c), 0) AS BIGINT) AS sum_cents "
        "FROM eff GROUP BY 1 ORDER BY 1"
    )


def _q_time_travel(sf_dir: str):
    """Time-travel reads over a versioned table log
    (sinks.versioned_log_init/commit + read_version — the
    delta-lake/iceberg shape on plain partitioned Parquet): version 0
    snapshots orders (key, cents); commit 1 upserts +1000 cents for
    keys ≡3 (mod 10) and deletes keys ≡7 (mod 10); commit 2 upserts
    base+5000 for keys ≡2 (mod 7) — re-INSERTING any ≡7 keys deleted
    at v1 — and deletes keys ≡4 (mod 10) not already claimed by the
    upsert.  Each version then reconstructs AS OF with ONE
    merge_upsert key co-shuffle (later versions' files never opened;
    the atomic manifest swap is the commit point) and folds to
    (n_rows, sum_cents).  Deltas are pure functions of the base table
    so the SQL twin replays all three snapshots with a CASE ladder."""
    import os
    import shutil

    import ray.data as rd

    from essentials_rd.sinks import (
        read_version, versioned_log_commit, versioned_log_init,
    )
    from essentials_rd.util import np_col

    base_dir = ("/tmp/essentials_rd_ttravel_"
                + os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(base_dir, ignore_errors=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def _base(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"k": t.column("o_orderkey").cast(pa.int64()),
                         "cents": pa.array(c, pa.int64())})

    snap = orders.map_batches(_base, batch_format="pyarrow")
    key = lambda b: np_col(b, "k")  # noqa: E731
    versioned_log_init(snap, base_dir, key)

    def _delta1(t: pa.Table) -> pa.Table:
        k = np_col(t, "k")
        c = np_col(t, "cents")
        up = k % 10 == 3
        de = k % 10 == 7
        kk = np.concatenate([k[up], k[de]])
        cc = np.concatenate([c[up] + 1000, np.zeros(de.sum(), np.int64)])
        op = ["U"] * int(up.sum()) + ["D"] * int(de.sum())
        return pa.table({"k": pa.array(kk, pa.int64()),
                         "cents": pa.array(cc, pa.int64()),
                         "op": pa.array(op, pa.string())})

    def _delta2(t: pa.Table) -> pa.Table:
        k = np_col(t, "k")
        c = np_col(t, "cents")
        up = k % 7 == 2
        de = (k % 10 == 4) & ~up  # one op per key per commit
        kk = np.concatenate([k[up], k[de]])
        cc = np.concatenate([c[up] + 5000, np.zeros(de.sum(), np.int64)])
        op = ["U"] * int(up.sum()) + ["D"] * int(de.sum())
        return pa.table({"k": pa.array(kk, pa.int64()),
                         "cents": pa.array(cc, pa.int64()),
                         "op": pa.array(op, pa.string())})

    versioned_log_commit(
        snap.map_batches(_delta1, batch_format="pyarrow"), base_dir, key)
    versioned_log_commit(
        snap.map_batches(_delta2, batch_format="pyarrow"), base_dir, key)

    def _fold(t: pa.Table) -> pa.Table:
        c = np_col(t, "cents")
        return pa.table({"n": pa.array([len(c)], pa.int64()),
                         "s": pa.array([int(c.sum())], pa.int64())})

    out = []
    for v in (0, 1, 2):
        rows = read_version(base_dir, v, "k").map_batches(
            _fold, batch_format="pyarrow").take_all()
        out.append((v, sum(int(r["n"]) for r in rows),
                    sum(int(r["s"]) for r in rows)))
    return pa.table({
        "version": pa.array([r[0] for r in out], pa.int64()),
        "n_rows": pa.array([r[1] for r in out], pa.int64()),
        "sum_cents": pa.array([r[2] for r in out], pa.int64()),
    })


def _time_travel_sql() -> str:
    return (
        "WITH base AS (SELECT o_orderkey AS k, "
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents "
        "FROM orders), "
        "eff AS (SELECT v.version, "
        "CASE WHEN v.version >= 2 AND k % 7 = 2 THEN cents + 5000 "
        "WHEN v.version >= 2 AND k % 10 = 4 THEN NULL "
        "WHEN v.version >= 1 AND k % 10 = 3 THEN cents + 1000 "
        "WHEN v.version >= 1 AND k % 10 = 7 THEN NULL "
        "ELSE cents END AS c "
        "FROM base CROSS JOIN (VALUES (0), (1), (2)) v(version)) "
        "SELECT CAST(version AS BIGINT) AS version, "
        "CAST(count(c) AS BIGINT) AS n_rows, "
        "CAST(COALESCE(sum(c), 0) AS BIGINT) AS sum_cents "
        "FROM eff GROUP BY 1 ORDER BY 1"
    )


ZM_LO = 10_000_000   # $100k in cents
ZM_HI = 15_000_000   # $150k


def _q_zonemap_scan(sf_dir: str):
    """Zone-map-pruned range scan (sinks.read_range_zonemap): Parquet
    FOOTER min/max stats over the write_sorted layout decide
    driver-side which of the P files can hold cents ∈ [lo, hi] — the
    data-skipping read where a selective range opens O(1) files; this
    query asserts pruning actually skipped files (raising if every
    partition opened) and returns the matched rows the SQL twin
    recomputes with a plain WHERE."""
    import os

    import ray.data as rd

    from essentials_rd.sinks import read_range_zonemap, write_sorted
    from essentials_rd.util import np_col

    base = ("/tmp/essentials_rd_sortwrite_"
            + os.path.basename(os.path.normpath(sf_dir)))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {"o_orderkey": t.column("o_orderkey").cast(pa.int64()),
             "cents": pa.array(c, pa.int64())})

    write_sorted(orders.map_batches(_cents, batch_format="pyarrow"),
                 base, "cents",
                 key_fn=lambda b: np_col(b, "o_orderkey"),
                 num_partitions=RANGE_PARTS, sample_frac=SKETCH_FRAC,
                 tie_cols=["o_orderkey"])
    ds, n_opened = read_range_zonemap(base, RANGE_PARTS, "cents",
                                      ZM_LO, ZM_HI)
    if n_opened >= RANGE_PARTS:
        raise AssertionError("zone map pruned nothing on a sorted layout")
    if ds is None:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "cents": pa.array([], pa.int64())})
    return ds


def _zonemap_scan_sql() -> str:
    return (
        "SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) "
        "AS cents FROM orders "
        f"WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) "
        f"BETWEEN {ZM_LO} AND {ZM_HI} ORDER BY o_orderkey"
    )


ZB_BOX = (5_000_000, 20_000_000, 9_800, 10_300)  # cents lo/hi, day lo/hi


def _q_zorder_box_scan(sf_dir: str):
    """Z-order-clustered 2-D box query (sinks.write_zordered +
    read_box_zonemap): orders laid out on the Morton curve of
    (cents, epoch-day), so each file's footer carries a tight 2-D
    bounding box and the price×date box opens a fraction of the P
    files (asserted engine-side — the oracle can't see file opens);
    rows match the plain two-predicate WHERE."""
    import os

    import ray.data as rd

    from essentials_rd.sinks import read_box_zonemap, write_zordered
    from essentials_rd.util import np_col

    base = ("/tmp/essentials_rd_zorder_"
            + os.path.basename(os.path.normpath(sf_dir)))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice",
                                      "o_orderdate"])

    def _prep(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        day = (t.column("o_orderdate").cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table(
            {"o_orderkey": t.column("o_orderkey").cast(pa.int64()),
             "cents": pa.array(c, pa.int64()),
             "oday": pa.array(day, pa.int64())})

    write_zordered(orders.map_batches(_prep, batch_format="pyarrow"),
                   base, "cents", "oday",
                   key_fn=lambda b: np_col(b, "o_orderkey"),
                   num_partitions=RANGE_PARTS, sample_frac=SKETCH_FRAC)
    ds, n_opened = read_box_zonemap(base, RANGE_PARTS, "cents", "oday",
                                    *ZB_BOX)
    if n_opened >= RANGE_PARTS:
        raise AssertionError("2-D zone map pruned nothing on z-order")
    if ds is None:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "cents": pa.array([], pa.int64()),
                         "oday": pa.array([], pa.int64())})
    return ds.map_batches(
        lambda t: t.select(["o_orderkey", "cents", "oday"]),
        batch_format="pyarrow")


def _zorder_box_sql() -> str:
    cl, ch, dl, dh = ZB_BOX
    return (
        "SELECT o_orderkey, cents, oday FROM ("
        "SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) "
        "AS cents, CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS "
        "oday FROM orders) "
        f"WHERE cents BETWEEN {cl} AND {ch} "
        f"AND oday BETWEEN {dl} AND {dh} ORDER BY o_orderkey"
    )


def _q_orders_price_rank(sf_dir: str):
    """Distributed global ORDER BY (ops.global_rank): every order's
    exact 1-based position under the (price-cents, o_orderkey) total
    order — range-partitioned so equal values co-locate, prefix-sum
    offsets, per-partition local sort; boundaries affect balance only,
    never the ranks."""
    import ray.data as rd

    from essentials_rd.ops import global_rank
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(np_col(t, "o_totalprice") * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {"o_orderkey": t.column("o_orderkey").cast(pa.int64()),
             "cents": pa.array(c, pa.int64())}
        )

    cents = orders.map_batches(_cents, batch_format="pyarrow")
    out = global_rank(
        cents, "cents", ["o_orderkey"],
        key_fn=lambda b: np_col(b, "o_orderkey"),
        n_parts=RANGE_PARTS, sample_frac=SKETCH_FRAC, seed=SAMPLE_SEED,
        rank_col="price_rank",
    )
    return out.select_columns(["o_orderkey", "cents", "price_rank"])


THROTTLE_MIN = 120


def _q_events_throttled(sf_dir: str):
    """Windowed ingest dedup (windows.throttle_events): keep an event
    iff it's the (user, type) key's first or the gap to the key's
    previous occurrence under (ts, id) strictly exceeds the window —
    SQL LAG semantics, one user-bucketed shuffle."""
    import ray.data as rd

    from essentials_rd.windows import throttle_events

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    out = throttle_events(ev, window_minutes=THROTTLE_MIN)
    return out.select_columns(["event_id", "user_id", "event_type"])


def _q_latest_user_event(sf_dir: str):
    """Changelog compaction (ops.latest_by_key): each user's single
    most recent event row under the (ts, event_id) total order —
    per-block pre-combined arg-max, then one bucketed shuffle."""
    import ray.data as rd

    from essentials_rd.ops import latest_by_key

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    from essentials_rd.util import np_col

    out = latest_by_key(
        ev, "user_id", ["ts", "event_id"],
        key_fn=lambda b: np_col(b, "user_id"),
    )
    return out.select_columns(["user_id", "event_id", "event_type"])


PROPS_PATTERN = r'"k": (?P<v>-?\d+)'


def _q_props_field_stats(sf_dir: str):
    """Schema-on-read typed extraction (textops.extract_int_field):
    the JSON-ish props column's k field pulled through Arrow's
    extract_regex kernel with the pattern shared VERBATIM with the
    DuckDB twin, then grouped integer stats per event_type."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.textops import extract_int_field

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    ex = extract_int_field(ev, "props", PROPS_PATTERN, out_col="v",
                           keep_cols=["event_type"])

    def _nonnull(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.is_valid(t.column("v")))

    agg = grouped_pandas_agg(
        ex.map_batches(_nonnull, batch_format="pyarrow"),
        keys=["event_type"],
        aggs={"n": ("v", "count"), "sum_v": ("v", "sum"),
              "min_v": ("v", "min"), "max_v": ("v", "max")},
        key_fn=lambda b: _str_hash(b.column("event_type")),
        num_buckets=4,
    )
    rows = agg.take_all()
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows],
                                   pa.string()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "sum_v": pa.array([r["sum_v"] for r in rows], pa.int64()),
            "min_v": pa.array([r["min_v"] for r in rows], pa.int64()),
            "max_v": pa.array([r["max_v"] for r in rows], pa.int64()),
        }
    ).sort_by("event_type")


ROLL_K = 3


def _q_rolling_value(sf_dir: str):
    """Per-user sliding 3-row window (SQL ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW) over event value-cents — one user-bucketed shuffle,
    prefix-sum kernel (windows.rolling_window_agg); integer cents keep
    the sum bit-exact vs the SQL window oracle."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.windows import rolling_window_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("__cents__", c)

    return rolling_window_agg(ev.map_batches(_cents, batch_format="pyarrow"),
                              k=ROLL_K)


def _q_user_range_sum(sf_dir: str):
    """Time-based RANGE sliding window (windows.range_window_agg):
    per event the sum/count of integer cents over the same user's
    trailing 2-hour window — value-defined frame, so all ts-peers are
    in regardless of tie-break; one user-bucketed shuffle + composed
    rank searchsorted kernel."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.windows import range_window_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("__cents__", c)

    return range_window_agg(
        ev.map_batches(_cents, batch_format="pyarrow"),
        span_us=2 * 3600 * 1_000_000,
    )


def _q_user_running_total(sf_dir: str):
    """Per-user running total (SQL ROWS UNBOUNDED PRECEDING) — the
    k=None case of the same prefix-sum kernel as `rolling_value_sum`:
    one user-bucketed shuffle, cumulative sums clamped at each user's
    segment start.  Integer cents keep it bit-exact."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.windows import rolling_window_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("__cents__", c)

    out = rolling_window_agg(ev.map_batches(_cents, batch_format="pyarrow"),
                             k=None)
    return out.rename_columns({"roll_sum": "run_sum", "roll_n": "run_n"})


def _q_quantity_moments(sf_dir: str):
    """Exact grouped integer moments (ops.grouped_moments): n / Σv /
    Σv² of lineitem quantity per return flag — per-block partials
    pre-combine before one tiny bucketed sum, and variance derives
    exactly as (n·sumsq − sum²)/n² from the integer outputs."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_moments

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_returnflag", "l_quantity"])

    def _qty(t: pa.Table) -> pa.Table:
        q = np.asarray(
            t.column("l_quantity").to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "qty": pa.array(np.floor(q + 0.5).astype(np.int64), pa.int64()),
            }
        )

    agg = grouped_moments(
        line.map_batches(_qty, batch_format="pyarrow"),
        keys=["l_returnflag"], val="qty",
        key_fn=lambda b: _str_hash(b.column("l_returnflag")),
        num_buckets=4,
    )
    rows = agg.take_all()
    return pa.table(
        {
            "l_returnflag": pa.array(
                [r["l_returnflag"] for r in rows], pa.string()
            ),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "sum_v": pa.array([r["sum_v"] for r in rows], pa.int64()),
            "sumsq_v": pa.array([r["sumsq_v"] for r in rows], pa.int64()),
        }
    ).sort_by("l_returnflag")


WPS_K = 25
WPS_SEED = 9


def _q_weighted_sample_parts(sf_dir: str):
    """Priority sampling (sampling.weighted_priority_sample, Duffield-
    Lund-Thorup / Sequential Poisson): 25 parts drawn weight-
    proportionally by retail-price cents via integer priorities
    q = splitmix64(key + seed·golden) // w, k smallest win — plus the
    DLT per-row weight estimator max(w, 2⁶⁴ // tau) from the (k+1)-st
    priority.  Stateless per-block priorities, per-block bottom-(k+1)
    partials, driver re-slice; zero shuffles, no RNG state."""
    import ray.data as rd

    from essentials_rd.sampling import weighted_priority_sample

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_retailprice"])

    def _cents(t: pa.Table) -> pa.Table:
        p = np.asarray(
            t.column("p_retailprice").to_numpy(zero_copy_only=False),
            np.float64)
        return pa.table({
            "p_partkey": t.column("p_partkey").cast(pa.int64()),
            "w_cents": pa.array(np.floor(p * 100 + 0.5).astype(np.int64)),
        })

    return weighted_priority_sample(
        part.map_batches(_cents, batch_format="pyarrow"),
        "p_partkey", "w_cents", k=WPS_K, seed=WPS_SEED)


def _weighted_sample_parts_sql() -> str:
    mix = (WPS_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes(
        "wz", "p_partkey, w_cents", f"p_partkey + {mix}", "pw")
    return (
        "WITH pw AS (SELECT p_partkey, "
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS w_cents "
        f"FROM part), {chain}, "
        "qq AS (SELECT p_partkey, w_cents, "
        "CAST(z // CAST(w_cents AS UBIGINT) AS BIGINT) AS q FROM wz3), "
        "o AS (SELECT *, CAST(row_number() OVER "
        "(ORDER BY q, p_partkey) AS BIGINT) AS rank FROM qq), "
        f"tau AS (SELECT q AS t FROM o WHERE rank = {WPS_K + 1}) "
        "SELECT p_partkey, w_cents, q, rank, "
        "greatest(w_cents, CAST(CAST('18446744073709551616' AS HUGEINT) "
        "// t AS BIGINT)) AS w_est "
        f"FROM o, tau WHERE rank <= {WPS_K}"
    )


def _q_chisq_type_hour(sf_dir: str):
    """Pearson chi-square independence audit (ops.contingency_chisq):
    event_type x hour-of-day contingency with exact int64 counts,
    marginals and deviations dev = N*n_ab - n_a*n_b over the FULL
    cross product (zero cells included), plus the half-up-6dp cell chi
    contribution — the usage-bias screen.  One streaming pass with
    <=cells-row per-block partials, zero shuffles."""
    import ray.data as rd

    from essentials_rd.ops import contingency_chisq
    from essentials_rd.windows import _epoch_us

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def _hod(t: pa.Table) -> pa.Table:
        us = _epoch_us(t, "ts")
        return pa.table({
            "event_type": t.column("event_type"),
            "hod": pa.array(us // 3_600_000_000 % 24, pa.int64()),
        })

    return contingency_chisq(
        ev.map_batches(_hod, batch_format="pyarrow"), "event_type", "hod")


def _chisq_type_hour_sql() -> str:
    return (
        "WITH e AS (SELECT event_type, "
        "epoch_us(ts) // 3600000000 % 24 AS hod FROM events), "
        "cells AS (SELECT event_type, hod, "
        "CAST(count(*) AS BIGINT) AS n_ab FROM e GROUP BY 1, 2), "
        "ma AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_a "
        "FROM e GROUP BY 1), "
        "mb AS (SELECT hod, CAST(count(*) AS BIGINT) AS n_b "
        "FROM e GROUP BY 1), "
        "nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e), "
        "fc AS (SELECT ma.event_type, mb.hod, "
        "COALESCE(c.n_ab, 0) AS n_ab, ma.n_a, mb.n_b, nt.n "
        "FROM ma CROSS JOIN mb CROSS JOIN nt "
        "LEFT JOIN cells c ON c.event_type = ma.event_type "
        "AND c.hod = mb.hod) "
        "SELECT event_type, hod, n_ab, n_a, n_b, "
        "n * n_ab - n_a * n_b AS dev, "
        "floor((CAST(n * n_ab - n_a * n_b AS DOUBLE) "
        "* CAST(n * n_ab - n_a * n_b AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(n_a AS DOUBLE) "
        "* CAST(n_b AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS cell_chi "
        "FROM fc"
    )


def _q_qty_emd_returned(sf_dir: str):
    """Exact 1-D Wasserstein-1 drift profile (ops.emd_profile):
    the earth-mover distance between the quantity distributions of
    returned (l_returnflag = 'R') and non-returned lineitems, as the
    per-distinct-value integer step-integral table — cumulative counts
    per side plus contrib = |cum_a·n_b − cum_b·n_a| · gap, so
    W1 = Σ contrib / (n_a·n_b) derives downstream with zero float
    aggregates.  Same bounded-histogram plan as ks_drift: per-block
    (value, count) partials, ONE bucketed exchange, driver fold."""
    import ray.data as rd

    from essentials_rd.ops import emd_profile

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_returnflag"],
    )

    def _qx(t: pa.Table) -> pa.Table:
        q = np.asarray(
            t.column("l_quantity").to_numpy(zero_copy_only=False),
            np.float64)
        flag = np.asarray(t.column("l_returnflag").to_numpy(
            zero_copy_only=False), object)
        return pa.table({
            "v": pa.array(np.floor(q + 0.5).astype(np.int64)),
            "s": pa.array((flag == "R").astype(np.int64), pa.int64()),
        })

    both = line.map_batches(_qx, batch_format="pyarrow")
    a = both.filter(expr="s == 1").select_columns(["v"])
    b = both.filter(expr="s == 0").select_columns(["v"])
    return emd_profile(a, b, "v")


def _qty_emd_returned_sql() -> str:
    return (
        "WITH li AS (SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS s "
        "FROM lineitem), "
        "c AS (SELECT v, "
        "CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a, "
        "CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b "
        "FROM li GROUP BY 1), "
        "t AS (SELECT CAST(sum(a) AS BIGINT) AS n_a, "
        "CAST(sum(b) AS BIGINT) AS n_b FROM c), "
        "cu AS (SELECT v, "
        "CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS cum_a, "
        "CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cum_b, "
        "CAST(COALESCE(LEAD(v) OVER (ORDER BY v) - v, 0) AS BIGINT) "
        "AS gap FROM c) "
        "SELECT cu.v, cu.cum_a, cu.cum_b, cu.gap, "
        "CAST(abs(cu.cum_a * t.n_b - cu.cum_b * t.n_a) * cu.gap "
        "AS BIGINT) AS contrib "
        "FROM cu, t"
    )


def _q_hourly_acf(sf_dir: str):
    """Lag-1..6 autocorrelation of the zero-filled hourly event-count
    series (windows.series_acf) — the seasonality / burst-memory
    screen.  The float mean is scaled out (d_t = n·c_t − T) so the
    (num, den) sufficient statistics are exact integers at any event
    count; acf = num/den is ONE float division half-up 6dp.  One
    streaming pass with per-block (hour, count) partials; the series
    is calendar-bounded, so the fold is driver math by contract."""
    import ray.data as rd

    from essentials_rd.windows import series_acf

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    return series_acf(ev, "ts", bucket_us=3_600_000_000, max_lag=6)


def _hourly_acf_sql() -> str:
    return (
        "WITH h AS (SELECT epoch_us(ts) // 3600000000 AS b, "
        "CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1), "
        "bd AS (SELECT min(b) AS lo, max(b) AS hi FROM h), "
        "g AS (SELECT unnest(generate_series(lo, hi)) AS b FROM bd), "
        "z AS (SELECT g.b, COALESCE(h.c, 0) AS c "
        "FROM g LEFT JOIN h ON h.b = g.b), "
        "st AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(c) AS BIGINT) AS t FROM z), "
        "dv AS (SELECT z.b, st.n * z.c - st.t AS d FROM z, st), "
        "k AS (SELECT unnest(generate_series(1, 6)) AS lag), "
        "dn AS (SELECT CAST(sum(d * d) AS BIGINT) AS den FROM dv), "
        "nm AS (SELECT k.lag, CAST(sum(a.d * b.d) AS BIGINT) AS num "
        "FROM k, dv a, dv b WHERE b.b = a.b + k.lag GROUP BY k.lag) "
        "SELECT k.lag, COALESCE(nm.num, 0) AS num, dn.den, "
        "CASE WHEN dn.den = 0 THEN NULL ELSE "
        "floor(CAST(COALESCE(nm.num, 0) AS DOUBLE) "
        "/ CAST(dn.den AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS acf "
        "FROM k LEFT JOIN nm ON nm.lag = k.lag CROSS JOIN dn"
    )


def _q_spearman_qty_price(sf_dir: str):
    """Exact Spearman rank correlation (mlfit.spearman_exact) between
    quantity and extended price in half-up cents — doubled average-tie
    ranks keep every sufficient statistic int64-exact (Σcx², Σcy²,
    Σcx·cy over centered ranks c = 2r − (n+1)), and rho is the single
    float division √-expression, emitted half-up 6dp.  Rank lookups
    build from per-column value HISTOGRAMS via global_cumsum over the
    distinct-value table (|distinct| rows move, never the data), two
    hash joins, one streaming moment pass."""
    import ray.data as rd

    from essentials_rd.mlfit import spearman_exact

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )

    def _ints(t: pa.Table) -> pa.Table:
        q = np.asarray(
            t.column("l_quantity").to_numpy(zero_copy_only=False),
            np.float64)
        p = np.asarray(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False),
            np.float64)
        return pa.table({
            "qx": pa.array(np.floor(q + 0.5).astype(np.int64)),
            "py": pa.array(np.floor(p * 100 + 0.5).astype(np.int64)),
        })

    return spearman_exact(
        line.map_batches(_ints, batch_format="pyarrow"), "qx", "py")


def _spearman_qty_price_sql() -> str:
    return (
        "WITH li AS (SELECT "
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS qx, "
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS py "
        "FROM lineitem), "
        "r AS (SELECT "
        "2 * CAST(rank() OVER (ORDER BY qx) AS BIGINT) "
        "+ CAST(count(*) OVER (PARTITION BY qx) AS BIGINT) - 1 AS rx2, "
        "2 * CAST(rank() OVER (ORDER BY py) AS BIGINT) "
        "+ CAST(count(*) OVER (PARTITION BY py) AS BIGINT) - 1 AS ry2 "
        "FROM li), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r), "
        "s AS (SELECT any_value(nn.n) AS n, "
        "CAST(sum((rx2 - (nn.n + 1)) * (rx2 - (nn.n + 1))) AS BIGINT) "
        "AS sxx, "
        "CAST(sum((ry2 - (nn.n + 1)) * (ry2 - (nn.n + 1))) AS BIGINT) "
        "AS syy, "
        "CAST(sum((rx2 - (nn.n + 1)) * (ry2 - (nn.n + 1))) AS BIGINT) "
        "AS sxy FROM r, nn) "
        "SELECT n, sxx, syy, sxy, "
        "CASE WHEN sxx = 0 OR syy = 0 THEN 0.0 ELSE "
        "floor(CAST(sxy AS DOUBLE) / "
        "sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)) "
        "* 1000000 + 0.5) / 1000000 END AS rho FROM s"
    )


def _q_kendall_qty_disc(sf_dir: str):
    """Exact Kendall tau-b (mlfit.kendall_tau_b) between lineitem
    quantity and discount cents — the concordance-based rank
    correlation, computed from the bounded 50×11 contingency table:
    conc/disc/tie counts are exact integers via suffix-cumsum matrix
    math over the cells table, tau is the single √-division half-up
    6dp.  One streaming pass with per-block (x, y, n) partials, ZERO
    shuffles — data rows never move."""
    import ray.data as rd

    from essentials_rd.mlfit import kendall_tau_b

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount"],
    )

    def _ints(t: pa.Table) -> pa.Table:
        q = np.asarray(
            t.column("l_quantity").to_numpy(zero_copy_only=False),
            np.float64)
        d = np.asarray(
            t.column("l_discount").to_numpy(zero_copy_only=False),
            np.float64)
        return pa.table({
            "x": pa.array(np.floor(q + 0.5).astype(np.int64)),
            "y": pa.array(np.floor(d * 100 + 0.5).astype(np.int64)),
        })

    return kendall_tau_b(
        line.map_batches(_ints, batch_format="pyarrow"), "x", "y")


def _kendall_qty_disc_sql() -> str:
    return (
        "WITH li AS (SELECT "
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS x, "
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y "
        "FROM lineitem), "
        "cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n "
        "FROM li GROUP BY 1, 2), "
        "cc AS (SELECT COALESCE(CAST(sum(a.n * b.n) AS BIGINT), 0) "
        "AS conc FROM cells a JOIN cells b ON b.x > a.x AND b.y > a.y), "
        "dd AS (SELECT COALESCE(CAST(sum(a.n * b.n) AS BIGINT), 0) "
        "AS disc FROM cells a JOIN cells b ON b.x > a.x AND b.y < a.y), "
        "mx AS (SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS ties_x "
        "FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM li GROUP BY x)), "
        "my AS (SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS ties_y "
        "FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM li GROUP BY y)), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM li), "
        "s AS (SELECT nn.n, cc.conc, dd.disc, mx.ties_x, my.ties_y, "
        "nn.n * (nn.n - 1) // 2 AS n0 "
        "FROM nn, cc, dd, mx, my) "
        "SELECT n, conc, disc, ties_x, ties_y, "
        "CASE WHEN n0 = ties_x OR n0 = ties_y THEN NULL ELSE "
        "floor(CAST(conc - disc AS DOUBLE) / "
        "sqrt(CAST(n0 - ties_x AS DOUBLE) * CAST(n0 - ties_y AS DOUBLE)) "
        "* 1000000 + 0.5) / 1000000 END AS tau FROM s"
    )


def _q_qty_price_comoments(sf_dir: str):
    """Exact grouped bivariate moments (ops.grouped_comoments): n / Σx
    / Σy / Σx² / Σy² / Σxy of (quantity, price-dollars) per return
    flag — the integer-exact covariance/correlation building block.
    covar_pop's numerator n·Σxy − Σx·Σy and both variance numerators
    derive exactly from these, where emitting a float covariance
    directly would hash-differ from DuckDB's own float accumulation."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_comoments

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def _ints(t: pa.Table) -> pa.Table:
        # floor(x + 0.5) == SQL ROUND's half-away-from-zero for the
        # positive domain here; pc.round's default half-to-even would
        # diverge on exact .5 dollar boundaries
        q = np.asarray(
            t.column("l_quantity").to_numpy(zero_copy_only=False), np.float64
        )
        p = np.asarray(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False),
            np.float64,
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "qty": pa.array(np.floor(q + 0.5).astype(np.int64)),
                "usd": pa.array(np.floor(p + 0.5).astype(np.int64)),
            }
        )

    agg = grouped_comoments(
        line.map_batches(_ints, batch_format="pyarrow"),
        keys=["l_returnflag"], x="qty", y="usd",
        key_fn=lambda b: _str_hash(b.column("l_returnflag")),
        num_buckets=4,
    )
    rows = agg.take_all()
    cols = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    out = {
        "l_returnflag": pa.array(
            [r["l_returnflag"] for r in rows], pa.string()
        )
    }
    for c in cols:
        out[c] = pa.array([r[c] for r in rows], pa.int64())
    return pa.table(out).sort_by("l_returnflag")


PROFILE_COLS = ["o_custkey", "o_orderkey"]


def _q_orders_profile(sf_dir: str):
    """One-pass table profile (ops.profile_table): n / n_null / min /
    max / EXACT ndv per integer column — min/max/null from per-block
    partials, ndv from a pair-hash-bucketed distinct so one
    high-cardinality column can't become a straggler bucket."""
    import ray.data as rd

    from essentials_rd.ops import profile_table

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=PROFILE_COLS)
    return profile_table(orders, PROFILE_COLS)


def _q_last_order_asof(sf_dir: str):
    """Backward as-of join (ops.asof_join): every event picks the same
    user's most recent order at-or-before the event time, ties on
    o_orderdate broken by max o_orderkey; NULL when no prior order."""
    import ray.data as rd

    from essentials_rd.ops import asof_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])
    return asof_join(
        ev, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        left_carry=["event_id"], right_vals=["o_orderkey"],
        out_names={"o_orderkey": "last_orderkey"},
    )


SAMPLE_FRAC = 0.1
SAMPLE_SEED = 42


def _q_sampled_docs(sf_dir: str):
    """Value-deterministic sampling (ops.deterministic_sample, R7):
    keep iff splitmix64(doc_id + seed·golden) < frac·2⁶⁴ — a pure
    function of the row, identical across runs/block layouts/cluster
    sizes, and exactly reproducible by the SQL oracle's split-multiply
    SplitMix64 emulation."""
    import ray.data as rd

    from essentials_rd.ops import deterministic_sample
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    return deterministic_sample(
        docs, SAMPLE_FRAC, lambda b: np_col(b, "doc_id"), seed=SAMPLE_SEED
    )


_MOD64 = "18446744073709551616"


def _sm64_mulmod(za: str, c: int) -> str:
    return (
        f"CAST((((CAST({za} AS HUGEINT) >> 32) * {c} % 4294967296)"
        f" * 4294967296 + (CAST({za} AS HUGEINT) % 4294967296) * {c})"
        f" % {_MOD64} AS UBIGINT)"
    )


def _sm64_ctes(prefix: str, carry: str, key_expr: str, source: str) -> str:
    """CTE chain computing ``z = splitmix64((key_expr) mod 2⁶⁴)`` —
    exactly ``util.hash64`` — in HUGEINT arithmetic with 64×64
    multiplies split into 32-bit halves so int128 never overflows.
    The final CTE is ``{prefix}3(carry..., z)``."""
    return (
        f"{prefix}0 AS (SELECT {carry}, "
        f"CAST(((CAST({key_expr} AS HUGEINT) % {_MOD64} + {_MOD64})"
        f" % {_MOD64} + 11400714819323198485)"
        f" % {_MOD64} AS UBIGINT) AS z FROM {source}), "
        f"{prefix}1 AS (SELECT {carry}, "
        f"{_sm64_mulmod('xor(z, z >> 30)', 0xBF58476D1CE4E5B9)} AS z FROM {prefix}0), "
        f"{prefix}2 AS (SELECT {carry}, "
        f"{_sm64_mulmod('xor(z, z >> 27)', 0x94D049BB133111EB)} AS z FROM {prefix}1), "
        f"{prefix}3 AS (SELECT {carry}, xor(z, z >> 31) AS z FROM {prefix}2)"
    )


def _sampled_docs_sql() -> str:
    """DuckDB twin of ops.deterministic_sample's keep rule: the shared
    SplitMix64 CTE chain (``_sm64_ctes``) over doc_id + seed·golden."""
    # literals on purpose (twin-independence) — engine SAMPLE_FRAC=0.1,
    # SAMPLE_SEED=42 frozen
    threshold = int(0.1 * float(2**64 - 1))
    mix = (42 * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes("z", "doc_id, n_chars", f"doc_id + {mix}", "documents")
    return (
        f"WITH {chain} "
        f"SELECT doc_id, n_chars FROM z3 "
        f"WHERE z < CAST('{threshold}' AS UBIGINT)"
    )


# 63-bit golden-ratio multiplier for the checksum's column pre-mix
# (truncated so the SQL twin's literal stays in BIGINT range; the
# product is computed in HUGEINT and reduced mod 2^64 either side)
_CKSUM_MIX = 0x9E3779B97F4A7C15 & (2**63 - 1)


def _q_orders_checksum(sf_dir: str):
    """Order-insensitive distributed table checksum
    (ops.table_checksum): Σ splitmix64(o_orderkey·C + o_custkey) mod
    2⁶⁴ plus the row count — the anti-entropy primitive for validating
    a table copy without moving it.  No shuffle: one (n, partial) row
    per block, folded driver-side."""
    import ray.data as rd

    from essentials_rd.ops import table_checksum
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def _key(b: pa.Table) -> np.ndarray:
        ok = np_col(b, "o_orderkey").astype(np.uint64)
        ck = np_col(b, "o_custkey").astype(np.uint64)
        with np.errstate(over="ignore"):
            return ok * np.uint64(_CKSUM_MIX) + ck

    return table_checksum(orders, _key)


def _orders_checksum_sql() -> str:
    chain = _sm64_ctes(
        "z", "o_orderkey",
        f"CAST(o_orderkey AS HUGEINT) * {_CKSUM_MIX} + o_custkey",
        "orders",
    )
    half = "9223372036854775808"
    return (
        f"WITH {chain}, m AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        f"((sum(CAST(z AS HUGEINT)) % {_MOD64}) + {_MOD64}) % {_MOD64} AS s "
        f"FROM z3) "
        f"SELECT n, CAST(CASE WHEN s >= {half} THEN s - {_MOD64} "
        f"ELSE s END AS BIGINT) AS checksum FROM m"
    )


MERKLE_WIDTH = 4096   # orderkeys per level-0 range
MERKLE_LEVELS = 6     # root is a single node at both test scales


def _q_orders_merkle(sf_dir: str):
    """Merkle range-checksum tree (ops.merkle_range_tree): the layered
    anti-entropy primitive — two replicas of a 100 TB table localize
    the diverging key range in O(log ranges) digest comparisons
    instead of re-reading either side.  Level-0 node = o_orderkey //
    {width}, digest = Σ splitmix64(o_orderkey·C + o_custkey) mod 2⁶⁴;
    each level above rehashes child digests and halves the node id.
    One pre-combined partial row per (block, node) leaves the scan —
    no shuffle; the SQL twin replays every level exactly."""
    import ray.data as rd

    from essentials_rd.ops import merkle_range_tree
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def _key(b: pa.Table) -> np.ndarray:
        ok = np_col(b, "o_orderkey").astype(np.uint64)
        ck = np_col(b, "o_custkey").astype(np.uint64)
        with np.errstate(over="ignore"):
            return ok * np.uint64(_CKSUM_MIX) + ck

    def _node(b: pa.Table) -> np.ndarray:
        return np_col(b, "o_orderkey") // MERKLE_WIDTH

    return merkle_range_tree(orders, _key, _node, levels=MERKLE_LEVELS)


def _orders_merkle_sql() -> str:
    half = "9223372036854775808"
    chain = _sm64_ctes(
        "z", "o_orderkey",
        f"CAST(o_orderkey AS HUGEINT) * {_CKSUM_MIX} + o_custkey",
        "orders",
    )
    parts = [chain,
             f"lvl0 AS (SELECT o_orderkey // {MERKLE_WIDTH} AS node, "
             "CAST(count(*) AS BIGINT) AS n, "
             f"((sum(CAST(z AS HUGEINT)) % {_MOD64}) + {_MOD64}) % {_MOD64}"
             " AS h FROM z3 GROUP BY 1)"]
    for k in range(1, MERKLE_LEVELS + 1):
        parts.append(_sm64_ctes(
            f"mk{k}", "node, n", "h",
            f"(SELECT node, n, h FROM lvl{k - 1})"))
        parts.append(
            f"lvl{k} AS (SELECT node // 2 AS node, "
            f"CAST(sum(n) AS BIGINT) AS n, "
            f"((sum(CAST(z AS HUGEINT)) % {_MOD64}) + {_MOD64}) % {_MOD64}"
            f" AS h FROM mk{k}3 GROUP BY 1)")
    sel = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS level, CAST(node AS BIGINT) AS node,"
        f" n, CAST(CASE WHEN h >= {half} THEN h - {_MOD64} ELSE h END"
        f" AS BIGINT) AS h FROM lvl{k}"
        for k in range(MERKLE_LEVELS + 1))
    return f"WITH {', '.join(parts)} {sel} ORDER BY level, node"


MERKLE_CORRUPT_MOD = 512   # ~1/512 of replica-B rows perturbed
MERKLE_CORRUPT_SALT = (13 * 0x9E3779B97F4A7C15) & (2**63 - 1)


def _q_merkle_diff(sf_dir: str):
    """Anti-entropy localization (ops.merkle_diff): replica A = orders
    as stored; replica B = orders with a deterministic corruption
    (rows where splitmix64(o_orderkey + salt) % {mod} == 0 get
    o_custkey + 1 — the SQL twin replays the same splitmix chain, so
    the 'divergence' is a pure function of the data).  Both replicas
    reduce to Merkle range trees with the SAME distributed scan as
    orders_merkle (one pre-combined partial row per (block, node), no
    shuffle); the top-down digest walk then localizes the diverging
    level-0 key ranges touching only differing nodes' children —
    O(log ranges · diverging) compares instead of a flat level-0 scan
    (pytest pins the comparison count).  Output: the diverging
    level-0 ranges with both sides' (n, h)."""
    import ray.data as rd

    from essentials_rd.ops import merkle_diff, merkle_range_tree
    from essentials_rd.util import hash64, np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def _corrupt(b: pa.Table) -> pa.Table:
        ok = np_col(b, "o_orderkey").astype(np.int64)
        ck = np_col(b, "o_custkey").astype(np.int64)
        with np.errstate(over="ignore"):
            z = hash64(ok.astype(np.uint64)
                       + np.uint64(MERKLE_CORRUPT_SALT))
        hit = (z % np.uint64(MERKLE_CORRUPT_MOD)) == 0
        return pa.table({
            "o_orderkey": pa.array(ok, pa.int64()),
            "o_custkey": pa.array(np.where(hit, ck + 1, ck), pa.int64()),
        })

    def _key(b: pa.Table) -> np.ndarray:
        ok = np_col(b, "o_orderkey").astype(np.uint64)
        ck = np_col(b, "o_custkey").astype(np.uint64)
        with np.errstate(over="ignore"):
            return ok * np.uint64(_CKSUM_MIX) + ck

    def _node(b: pa.Table) -> np.ndarray:
        return np_col(b, "o_orderkey") // MERKLE_WIDTH

    tree_a = merkle_range_tree(orders, _key, _node, levels=MERKLE_LEVELS)
    tree_b = merkle_range_tree(
        orders.map_batches(_corrupt, batch_format="pyarrow"),
        _key, _node, levels=MERKLE_LEVELS)
    diff, _ = merkle_diff(tree_a, tree_b, MERKLE_LEVELS)
    return diff


def _merkle_diff_sql() -> str:
    half = "9223372036854775808"
    # replica B: corruption decided by the same splitmix chain
    corrupt = _sm64_ctes("c", "o_orderkey, o_custkey",
                         f"o_orderkey + {MERKLE_CORRUPT_SALT}", "orders")
    parts = [
        corrupt,
        "orders_b AS (SELECT o_orderkey, CASE WHEN z % "
        f"{MERKLE_CORRUPT_MOD} = 0 THEN o_custkey + 1 ELSE o_custkey "
        "END AS o_custkey FROM c3)",
    ]
    for tag, src in (("a", "orders"), ("b", "orders_b")):
        parts.append(_sm64_ctes(
            f"d{tag}", "o_orderkey",
            f"CAST(o_orderkey AS HUGEINT) * {_CKSUM_MIX} + o_custkey",
            src))
        parts.append(
            f"lvl0{tag} AS (SELECT o_orderkey // {MERKLE_WIDTH} AS node, "
            "CAST(count(*) AS BIGINT) AS n, "
            f"CAST(CASE WHEN ((sum(CAST(z AS HUGEINT)) % {_MOD64})"
            f" + {_MOD64}) % {_MOD64} >= {half} THEN "
            f"((sum(CAST(z AS HUGEINT)) % {_MOD64}) + {_MOD64})"
            f" % {_MOD64} - {_MOD64} ELSE ((sum(CAST(z AS HUGEINT))"
            f" % {_MOD64}) + {_MOD64}) % {_MOD64} END AS BIGINT) AS h "
            f"FROM d{tag}3 GROUP BY 1)")
    return (
        f"WITH {', '.join(parts)} "
        "SELECT COALESCE(a.node, b.node) AS node, "
        "COALESCE(a.n, 0) AS n_a, COALESCE(a.h, 0) AS h_a, "
        "COALESCE(b.n, 0) AS n_b, COALESCE(b.h, 0) AS h_b "
        "FROM lvl0a a FULL OUTER JOIN lvl0b b ON a.node = b.node "
        "WHERE a.node IS NULL OR b.node IS NULL OR a.n != b.n "
        "OR a.h != b.h ORDER BY 1"
    )


def _q_ols_order_price(sf_dir: str, ridge: int = 0):
    """Distributed closed-form OLS (mlfit.ols_fit_exact): fit
    o_totalprice cents ~ b0 + b1·(lineitem count) + b2·(Σ quantity)
    per order.  Integer features/target make the normal equations
    exact: one grouped lineitem aggregate, one partitioned join to
    orders, then ONE zero-shuffle Gram pass (per-block int64 partials
    → unbounded Python-int driver fold) and a Cramer solve over exact
    integer determinants — the only floats are the three final
    det_i/det divisions, which the SQL twin reproduces bit-for-bit
    from HUGEINT sums.  The 100-TB shape: the data pass touches each
    row once, the model is 3×3 driver-side."""
    import ray.data as rd

    from essentials_rd.mlfit import ols_fit_exact
    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def _proj(b: pa.Table) -> pa.Table:
        ok = np_col(b, "l_orderkey").astype(np.int64)
        qty = np.asarray(b.column("l_quantity").to_numpy(
            zero_copy_only=False), np.float64)
        return pa.table({
            "ok": pa.array(ok, pa.int64()),
            "one": pa.array(np.ones(len(ok), np.int64)),
            "qty": pa.array(np.floor(qty + 0.5).astype(np.int64)),
        })

    feat = grouped_pandas_agg(
        li.map_batches(_proj, batch_format="pyarrow"),
        keys=["ok"], aggs={"k": ("one", "sum"), "q": ("qty", "sum")},
    )

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def _y(b: pa.Table) -> pa.Table:
        tp = np.asarray(b.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        return pa.table({
            "ok": b.column("o_orderkey"),
            "y": pa.array(np.floor(tp * 100.0 + 0.5).astype(np.int64)),
        })

    joined = join(feat, orders.map_batches(_y, batch_format="pyarrow"),
                  on="ok", broadcast=False)

    def _xy(b: pa.Table):
        k = np_col(b, "k").astype(np.int64)
        q = np_col(b, "q").astype(np.int64)
        X = np.stack([np.ones(len(k), np.int64), k, q], axis=1)
        return X, np_col(b, "y").astype(np.int64)

    coefs, _ = ols_fit_exact(joined, _xy, p=3, ridge=ridge)
    return pa.table({
        "coef": pa.array(["b0", "b1", "b2"], pa.string()),
        "value": pa.array(coefs, pa.float64()),
    })


RIDGE_LAMBDA = 1_000_000


def _q_ridge_order_price(sf_dir: str):
    """Tikhonov-regularized variant of ols_order_price (integer λ
    added to the non-intercept Gram diagonal — still exact; the SQL
    twin adds the same λ inside its cofactor expansion).  Shows the
    regularization path costs nothing extra: same single data pass,
    the λ shift is a driver-side 2-int add."""
    return _q_ols_order_price(sf_dir, ridge=RIDGE_LAMBDA)


def _ols_sql(ridge: int = 0) -> str:
    s11 = f"(s11 + {ridge})" if ridge else "s11"
    s22 = f"(s22 + {ridge})" if ridge else "s22"
    m = [["s00", "s01", "s02"], ["s01", s11, "s12"], ["s02", "s12", s22]]
    c = ["c0", "c1", "c2"]

    def det3(a):
        return (f"{a[0][0]}*({a[1][1]}*{a[2][2]} - {a[1][2]}*{a[2][1]})"
                f" - {a[0][1]}*({a[1][0]}*{a[2][2]} - {a[1][2]}*{a[2][0]})"
                f" + {a[0][2]}*({a[1][0]}*{a[2][1]} - {a[1][1]}*{a[2][0]})")

    def repl(i):
        return [[c[r] if j == i else m[r][j] for j in range(3)]
                for r in range(3)]

    dets = ", ".join(
        [f"({det3(m)}) AS det"]
        + [f"({det3(repl(i))}) AS det{i}" for i in range(3)])
    sel = " UNION ALL ".join(
        f"SELECT 'b{i}' AS coef, CAST(det{i} AS DOUBLE)"
        f"/CAST(det AS DOUBLE) AS value FROM d" for i in range(3))
    return f"""
WITH feat AS (
  SELECT l_orderkey AS ok, CAST(count(*) AS HUGEINT) AS k,
         CAST(sum(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS HUGEINT) AS q
  FROM lineitem GROUP BY 1),
j AS (
  SELECT f.k, f.q,
         CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT) AS y
  FROM feat f JOIN orders o ON o.o_orderkey = f.ok),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS s00, sum(k) AS s01, sum(q) AS s02,
         sum(k*k) AS s11, sum(k*q) AS s12, sum(q*q) AS s22,
         sum(y) AS c0, sum(k*y) AS c1, sum(q*y) AS c2
  FROM j),
d AS (SELECT {dets} FROM s)
SELECT coef, value FROM ({sel}) ORDER BY coef"""


def _q_price_qty_slope(sf_dir: str):
    """Per-group simple regression (mlfit.grouped_simple_ols):
    extendedprice cents ~ quantity within each (returnflag,
    linestatus) class — grouped model fitting as a dataflow op.  The
    group key is the SQL-replayable int ascii(flag)·256 +
    ascii(status); partials are five exact int64 sums per (block,
    key) via lexsort+reduceat, the exchange moves only those, and the
    2×2 Cramer solve per group divides exact Python ints so the
    DOUBLE twin matches bit-for-bit."""
    import ray.data as rd

    from essentials_rd.mlfit import grouped_simple_ols

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice"])

    def _ascii1(col: pa.ChunkedArray) -> np.ndarray:
        # ord() only over the handful of distinct one-char values
        d = col.combine_chunks().dictionary_encode()
        vals = np.array([ord(v.as_py()) for v in d.dictionary], np.int64)
        return vals[np.asarray(d.indices)]

    def _kxy(b: pa.Table):
        f = _ascii1(b.column("l_returnflag"))
        s = _ascii1(b.column("l_linestatus"))
        qty = np.asarray(b.column("l_quantity").to_numpy(
            zero_copy_only=False), np.float64)
        ep = np.asarray(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False), np.float64)
        return (f * 256 + s,
                np.floor(qty + 0.5).astype(np.int64),
                np.floor(ep * 100.0 + 0.5).astype(np.int64))

    return grouped_simple_ols(li, _kxy)


def _price_qty_slope_sql() -> str:
    return """
WITH s AS (
  SELECT ascii(l_returnflag) * 256 + ascii(l_linestatus) AS key,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(CAST(ROUND(l_quantity, 0) AS BIGINT) AS HUGEINT)) AS sx,
         sum(CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
             AS HUGEINT)) AS sy,
         sum(CAST(CAST(ROUND(l_quantity, 0) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sxy,
         sum(CAST(CAST(ROUND(l_quantity, 0) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS sxx
  FROM lineitem GROUP BY 1),
b AS (
  SELECT key, n, sx, sy,
         CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
  FROM s)
SELECT CAST(key AS BIGINT) AS key, CAST(n AS BIGINT) AS n, slope,
       CASE WHEN slope IS NULL THEN NULL
            ELSE (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) END AS intercept
FROM b ORDER BY key"""


def _region_weight_matrix(sf_dir: str) -> list:
    """Shared Kirchhoff input: the 5×5 exact-integer region-level
    trade weight matrix (w[i][j] = both-orientation lineitem count
    between customer region i and supplier region j, diagonal 0).
    The distributed part is real: lineitem⋈orders is a partitioned
    big-big join (broadcast only the constant-cardinality
    cust/supp→region dims; at 100 TB those become partitioned joins
    too), then ≤25 (rc, rs) partial-count rows leave each block and
    the driver folds the matrix.  Used by spanning_trees_regions and
    effective_resistance."""
    import ray
    import ray.data as rd

    from essentials_rd.mlfit import int_det
    from essentials_rd.ops import join
    from essentials_rd.util import np_col

    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_regionkey"]).take_all()
    n2r = {int(r["n_nationkey"]): int(r["n_regionkey"]) for r in nat}

    def _dim_map(table: str, key: str, nk: str) -> dict:
        rows = rd.read_parquet(f"{sf_dir}/{table}.parquet",
                               columns=[key, nk]).take_all()
        return {int(r[key]): n2r[int(r[nk])] for r in rows}

    c2r_ref = ray.put(_dim_map("customer", "c_custkey", "c_nationkey"))
    s2r_ref = ray.put(_dim_map("supplier", "s_suppkey", "s_nationkey"))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def _oc(t: pa.Table) -> pa.Table:
        m = ray.get(c2r_ref)
        ck = np_col(t, "o_custkey").astype(np.int64)
        mk = np.array(sorted(m), np.int64)
        mv = np.array([m[k] for k in sorted(m)], np.int64)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "rc": pa.array(mv[np.searchsorted(mk, ck)], pa.int64()),
        })

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey"])

    def _ls(t: pa.Table) -> pa.Table:
        m = ray.get(s2r_ref)
        sk = np_col(t, "l_suppkey").astype(np.int64)
        mk = np.array(sorted(m), np.int64)
        mv = np.array([m[k] for k in sorted(m)], np.int64)
        return pa.table({
            "o_orderkey": t.column("l_orderkey"),
            "rs": pa.array(mv[np.searchsorted(mk, sk)], pa.int64()),
        })

    j = join(line.map_batches(_ls, batch_format="pyarrow"),
             orders.map_batches(_oc, batch_format="pyarrow"),
             on="o_orderkey", how="inner", broadcast=False,
             num_buckets=16)

    R = 5

    def _partial(t: pa.Table) -> pa.Table:
        k = np_col(t, "rc").astype(np.int64) * R + np_col(t, "rs")
        cnt = np.bincount(k, minlength=R * R).astype(np.int64)
        return pa.table({
            "k": pa.array(np.arange(R * R, dtype=np.int64)),
            "c": pa.array(cnt, pa.int64()),
        })

    rows = j.map_batches(_partial, batch_format="pyarrow").take_all()
    cnt = np.zeros(R * R, np.int64)
    for r in rows:
        cnt[r["k"]] += r["c"]
    cnt = cnt.reshape(R, R)
    return [[int(cnt[i][j] + cnt[j][i]) if i != j else 0
             for j in range(R)] for i in range(R)]


def _q_spanning_trees(sf_dir: str):
    """Kirchhoff matrix-tree theorem over the region-level trade
    multigraph: weighted-spanning-tree count = det of a 4×4 Laplacian
    minor, computed with the SAME exact-integer Bareiss determinant as
    the OLS solver (mlfit.int_det) — zero floats until the final
    readout cast.  Weight matrix via _region_weight_matrix (the
    partitioned lineitem⋈orders fold); self-loops drop (they never
    enter a Laplacian).  Output: n_trees as DOUBLE (the exact int
    exceeds int64 beyond ~sf0.03; both engines cast the same exact
    integer) + the exact total cross-region weight as the int64
    audit column."""
    from essentials_rd.mlfit import int_det

    R = 5
    w = _region_weight_matrix(sf_dir)
    lap = [[sum(w[i]) if i == j else -w[i][j]
            for j in range(1, R)] for i in range(1, R)]
    n_trees = int_det(lap)
    cross = sum(w[i][j] for i in range(R) for j in range(i + 1, R))
    return pa.table({
        "n_trees": pa.array([float(n_trees)], pa.float64()),
        "cross_weight": pa.array([cross], pa.int64()),
    })


def _q_eff_resistance(sf_dir: str):
    """Pairwise effective resistance between the 5 trade regions by
    the all-minors matrix-tree theorem: R_eff(u,v) = F(u,v) / T where
    T = spanning-tree count (det of the 4×4 Laplacian minor) and
    F(u,v) = #spanning 2-forests separating u from v (det of the 3×3
    minor with BOTH u and v deleted) — the commute-distance /
    current-flow metric, exact integers end to end (same Bareiss
    int_det as the OLS solver), ONE float division per pair at
    readout.  Reuses the _region_weight_matrix fold; 10 rows."""
    from essentials_rd.mlfit import int_det

    R = 5
    w = _region_weight_matrix(sf_dir)
    lap = [[sum(w[i]) if i == j else -w[i][j]
            for j in range(R)] for i in range(R)]

    def _minor(drop: set) -> list:
        keep = [i for i in range(R) if i not in drop]
        return [[lap[a][b] for b in keep] for a in keep]

    T = int_det(_minor({0}))
    us, vs, fs, ts, rs = [], [], [], [], []
    for u in range(R):
        for v in range(u + 1, R):
            F = int_det(_minor({u, v}))
            us.append(u)
            vs.append(v)
            fs.append(float(F))
            ts.append(float(T))
            rs.append(None if T == 0 else float(F) / float(T))
    return pa.table({
        "r_u": pa.array(us, pa.int64()),
        "r_v": pa.array(vs, pa.int64()),
        "forests2": pa.array(fs, pa.float64()),
        "n_trees": pa.array(ts, pa.float64()),
        "r_eff": pa.array(rs, pa.float64()),
    })


def _eff_resistance_sql() -> str:
    from itertools import permutations

    R = 5
    wname = {}
    for i in range(R):
        for jj in range(i + 1, R):
            wname[(i, jj)] = f"w{i}{jj}"
            wname[(jj, i)] = f"w{i}{jj}"
    wcols = ", ".join(
        f"sum(CASE WHEN i = {i} AND j = {jj} THEN w ELSE 0 END) AS w{i}{jj}"
        for i in range(R) for jj in range(i + 1, R))
    ent = [[None] * R for _ in range(R)]
    for a in range(R):
        for b in range(R):
            if a == b:
                ent[a][b] = "(" + " + ".join(
                    wname[(a, o)] for o in range(R) if o != a) + ")"
            else:
                ent[a][b] = f"(- {wname[(a, b)]})"

    def _det(keep: list) -> str:
        k = len(keep)
        terms = []
        for perm in permutations(range(k)):
            inv = sum(1 for x in range(k) for y in range(x + 1, k)
                      if perm[x] > perm[y])
            prod = " * ".join(ent[keep[x]][keep[perm[x]]]
                              for x in range(k))
            terms.append(("- " if inv % 2 else "+ ") + prod)
        return " ".join(terms)

    t4 = _det([1, 2, 3, 4])
    exprs = [f"({t4}) AS t4"]
    sels = []
    for u in range(R):
        for v in range(u + 1, R):
            keep = [i for i in range(R) if i not in (u, v)]
            exprs.append(f"({_det(keep)}) AS f{u}{v}")
            sels.append(
                f"SELECT CAST({u} AS BIGINT) AS r_u, "
                f"CAST({v} AS BIGINT) AS r_v, "
                f"CAST(f{u}{v} AS DOUBLE) AS forests2, "
                f"CAST(t4 AS DOUBLE) AS n_trees, "
                f"CASE WHEN t4 = 0 THEN NULL ELSE "
                f"CAST(f{u}{v} AS DOUBLE) / CAST(t4 AS DOUBLE) END "
                f"AS r_eff FROM d")
    body = " UNION ALL ".join(sels)
    return f"""
WITH dirw AS (
  SELECT nc.n_regionkey AS rc, ns.n_regionkey AS rs,
         CAST(count(*) AS HUGEINT) AS c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer cu ON cu.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = cu.c_nationkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  GROUP BY 1, 2),
und AS (
  SELECT least(rc, rs) AS i, greatest(rc, rs) AS j, sum(c) AS w
  FROM dirw WHERE rc <> rs GROUP BY 1, 2),
ws AS (SELECT {wcols} FROM und),
d AS (SELECT {", ".join(exprs)} FROM ws)
{body} ORDER BY r_u, r_v"""


def _spanning_trees_sql() -> str:
    from itertools import permutations

    R = 5
    wname = {}
    for i in range(R):
        for jj in range(i + 1, R):
            wname[(i, jj)] = f"w{i}{jj}"
            wname[(jj, i)] = f"w{i}{jj}"
    wcols = ", ".join(
        f"sum(CASE WHEN i = {i} AND j = {jj} THEN w ELSE 0 END) AS w{i}{jj}"
        for i in range(R) for jj in range(i + 1, R))
    ent = [[None] * (R - 1) for _ in range(R - 1)]
    for a in range(1, R):
        for b in range(1, R):
            if a == b:
                ent[a - 1][b - 1] = "(" + " + ".join(
                    wname[(a, o)] for o in range(R) if o != a) + ")"
            else:
                ent[a - 1][b - 1] = f"(- {wname[(a, b)]})"
    terms = []
    for perm in permutations(range(R - 1)):
        inv = sum(1 for x in range(R - 1) for y in range(x + 1, R - 1)
                  if perm[x] > perm[y])
        prod = " * ".join(ent[x][perm[x]] for x in range(R - 1))
        terms.append(("- " if inv % 2 else "+ ") + prod)
    det = " ".join(terms)
    total = " + ".join(f"w{i}{jj}" for i in range(R)
                       for jj in range(i + 1, R))
    return f"""
WITH dirw AS (
  SELECT nc.n_regionkey AS rc, ns.n_regionkey AS rs,
         CAST(count(*) AS HUGEINT) AS c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer cu ON cu.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = cu.c_nationkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  GROUP BY 1, 2),
und AS (
  SELECT least(rc, rs) AS i, greatest(rc, rs) AS j, sum(c) AS w
  FROM dirw WHERE rc <> rs GROUP BY 1, 2),
ws AS (SELECT {wcols} FROM und),
d AS (SELECT ({det}) AS det, ({total}) AS total FROM ws)
SELECT CAST(det AS DOUBLE) AS n_trees,
       CAST(total AS BIGINT) AS cross_weight FROM d"""


def _q_user_lifetable(sf_dir: str):
    """Survival-analysis life table over user lifetimes (first→last
    event, whole days): for every observed lifetime d, the number of
    users whose observation ENDS at d (``n_end``) and the number still
    at risk at d (``n_at_risk`` = users with lifetime ≥ d) — the exact
    integer backbone the Kaplan-Meier product Π(1 − d_i/n_i) derives
    from.  One bucketed min/max aggregate per user, then a
    bounded-domain lifetime histogram (≤ observation-window days) whose
    suffix sum folds driver-side — at 100 TB the histogram is still
    days-sized."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64())})

    spans = grouped_pandas_agg(
        ev.map_batches(_prep, batch_format="pyarrow"),
        keys=["user_id"],
        aggs={"lo": ("ts_us", "min"), "hi": ("ts_us", "max")})

    day_us = 86_400_000_000

    def _life(t: pa.Table) -> pa.Table:
        d = (np_col(t, "hi") - np_col(t, "lo")) // day_us
        u, c = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(u, pa.int64()),
                         "n_end": pa.array(c.astype(np.int64), pa.int64())})

    hist = grouped_pandas_agg(
        spans.map_batches(_life, batch_format="pyarrow"),
        keys=["d"], aggs={"n_end": ("n_end", "sum")}).take_all()
    hist.sort(key=lambda r: r["d"])
    d = np.array([r["d"] for r in hist], np.int64)
    n_end = np.array([r["n_end"] for r in hist], np.int64)
    at_risk = np.cumsum(n_end[::-1])[::-1]
    return pa.table({
        "d": pa.array(d, pa.int64()),
        "n_end": pa.array(n_end, pa.int64()),
        "n_at_risk": pa.array(at_risk, pa.int64()),
    })


_USER_LIFETABLE_SQL = """
WITH spans AS (
  SELECT user_id,
         (epoch_us(max(ts)) - epoch_us(min(ts))) // 86400000000 AS d
  FROM events GROUP BY 1),
h AS (SELECT d, CAST(count(*) AS BIGINT) AS n_end FROM spans GROUP BY 1)
SELECT d, n_end,
       CAST(sum(n_end) OVER (ORDER BY d DESC) AS BIGINT) AS n_at_risk
FROM h ORDER BY d
"""


BRIDGE_NUM, BRIDGE_DEN = 1, 32  # sparsify: keep each edge w.p. 1/32
BRIDGE_SEED = 5


def _q_bridges(sf_dir: str):
    """Bridge (cut-edge) finding WITHOUT DFS (algorithms.find_bridges):
    XOR subtree sketches over a BFS spanning forest — CC gives the
    component-minimum roots, a multi-source forest BFS grows one tree
    per component in the same superstep loop, parent = min neighbor
    one level up (one edge scan, per-block min partials), every
    non-tree edge gets the splitmix64(lo·2³² + hi) label, and a tree
    edge is a bridge iff the XOR of labels with exactly one endpoint
    below it is zero (both-endpoint labels cancel — the AGM sketch
    trick).  The SQL twin replays the identical labels, so the
    comparison is exact; truth-level false bridges need a 64-bit XOR
    collision (pytest pins vs Tarjan).  Runs on the splitmix-
    sparsified (p = 1/32, the bond-percolation keep rule) co-purchase
    subgraph — the full graph is 2-edge-connected at both test scales
    (0 bridges, a vacuous check), while the sparsified one has real
    pendant trees AND surviving cycles.  Returns the bridge edges."""
    import os as _os
    import tempfile

    import ray

    from essentials_rd.algorithms import find_bridges
    from essentials_rd.graph import build_graph
    from essentials_rd.util import hash64, np_col

    g, edges = _graph(sf_dir)
    thr = np.uint64((BRIDGE_NUM << 64) // BRIDGE_DEN - 1)
    mix = np.uint64((BRIDGE_SEED * 0x9E3779B97F4A7C15) % (1 << 64))

    def _keep(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64).view(np.uint64)
        d = np_col(t, "dst").astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            key = (s << np.uint64(32)) + d + mix
        h = hash64(key.view(np.int64))
        m = h < thr
        return pa.table({"src": pa.array(s[m].view(np.int64), pa.int64()),
                         "dst": pa.array(d[m].view(np.int64), pa.int64())})

    sub = edges.select_columns(["src", "dst"]).map_batches(
        _keep, batch_format="pyarrow").materialize()
    vids = ray.get(g.vertex_ids_ref)
    gb = build_graph(sub, _os.path.join(tempfile.gettempdir(),
                                        "essentials_rd_bridges"),
                     g.num_parts, symmetrize=True, persist=False,
                     vertex_ids=vids)
    t, info = find_bridges(gb, sub, max_iters=2 * CC_ITERS,
                           scatter_mode="fused")
    assert info["max_depth"] <= BFS_ITERS, (
        "forest deeper than the oracle's unrolled walk"
    )
    return t


def _bridges_sql() -> str:
    big = 1 << 60
    bmix = (BRIDGE_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    bthr = (BRIDGE_NUM << 64) // BRIDGE_DEN - 1
    keep_chain = _sm64_ctes("kz", "src, dst",
                            f"src * 4294967296 + dst + {bmix}", "pairs")
    steps = [
        keep_chain,
        "bpairs AS MATERIALIZED (SELECT src, dst FROM kz3 "
        f"WHERE z < CAST('{bthr}' AS UBIGINT)), "
        "bsym AS MATERIALIZED (SELECT src, dst FROM bpairs "
        "UNION ALL SELECT dst, src FROM bpairs)",
        "l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)",
    ]
    for k in range(CC_ITERS):
        steps.append(f"""
m{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM bsym e JOIN l{k} l ON l.vid = e.src GROUP BY e.dst
),
l{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM l{k} v LEFT JOIN m{k} m ON m.vid = v.vid
)""")
    steps.append(
        f"roots AS (SELECT vid FROM l{CC_ITERS} WHERE vid = label)")
    steps.append(
        "d0 AS MATERIALIZED (SELECT vid, CASE WHEN vid IN "
        f"(SELECT vid FROM roots) THEN 0 ELSE {big} END AS depth "
        "FROM verts)")
    for k in range(BFS_ITERS):
        steps.append(f"""
fm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.depth + 1) AS md
  FROM bsym e JOIN d{k} l ON l.vid = e.src AND l.depth < {big}
  GROUP BY e.dst
),
d{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.depth, COALESCE(m.md, v.depth)) AS depth
  FROM d{k} v LEFT JOIN fm{k} m ON m.vid = v.vid
)""")
    D = BFS_ITERS
    steps.append(f"""
par AS MATERIALIZED (
  SELECT v.vid, CASE WHEN v.depth = 0 THEN v.vid ELSE p.parent END
    AS parent
  FROM d{D} v LEFT JOIN (
    SELECT e.dst AS vid, CAST(min(e.src) AS BIGINT) AS parent
    FROM bsym e JOIN d{D} du ON du.vid = e.src
    JOIN d{D} dv ON dv.vid = e.dst
    WHERE du.depth + 1 = dv.depth GROUP BY 1) p ON p.vid = v.vid),
tre AS MATERIALIZED (
  SELECT least(vid, parent) AS lo, greatest(vid, parent) AS hi,
         vid AS c FROM par WHERE parent <> vid),
ntedge AS MATERIALIZED (
  SELECT p.src AS lo, p.dst AS hi FROM bpairs p
  LEFT JOIN tre t ON t.lo = p.src AND t.hi = p.dst
  WHERE t.lo IS NULL)""")
    steps.append(_sm64_ctes(
        "bz", "lo, hi", "CAST(lo AS HUGEINT) * 4294967296 + hi",
        "ntedge"))
    steps.append("""
incid AS (SELECT lo AS vid, z FROM bz3
          UNION ALL SELECT hi AS vid, z FROM bz3),
sx AS (SELECT vid, bit_xor(z) AS s FROM incid GROUP BY 1),
w0 AS (SELECT vid AS u, vid AS a FROM verts)""")
    for k in range(D):
        steps.append(f"""
w{k + 1} AS MATERIALIZED (
  SELECT w.u, p.parent AS a FROM w{k} w
  JOIN par p ON p.vid = w.a WHERE p.parent <> w.a)""")
    anc = " UNION ALL ".join(f"SELECT u, a FROM w{k}"
                             for k in range(D + 1))
    steps.append(f"""
anc AS ({anc}),
subx AS (
  SELECT anc.a AS vid,
         bit_xor(COALESCE(sx.s, CAST(0 AS UBIGINT))) AS x
  FROM anc LEFT JOIN sx ON sx.vid = anc.u GROUP BY 1)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        "SELECT t.lo AS src, t.hi AS dst FROM tre t "
        "JOIN subx ON subx.vid = t.c WHERE subx.x = 0 ORDER BY 1, 2"
    )


def _q_two_edge_components(sf_dir: str):
    """2-edge-connected components of the same sparsified subgraph as
    ``bridges``: delete the sketch-found bridges, rerun the verified
    CC engine — every vertex labels with the minimum vid of its
    2ECC (bridge endpoints separate, cycles stay together).  The
    classic bridge-tree decomposition, as a two-stage composition of
    already-verified ops; one broadcast bridge-key set filters the
    kept edges, one persist=False rebuild, one CC fixpoint."""
    import os as _os
    import tempfile

    import ray

    from essentials_rd.algorithms import connected_components, find_bridges
    from essentials_rd.algorithms.cc import components_table
    from essentials_rd.graph import build_graph
    from essentials_rd.util import hash64, np_col

    g, edges = _graph(sf_dir)
    thr = np.uint64((BRIDGE_NUM << 64) // BRIDGE_DEN - 1)
    mix = np.uint64((BRIDGE_SEED * 0x9E3779B97F4A7C15) % (1 << 64))

    def _keep(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64).view(np.uint64)
        d = np_col(t, "dst").astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            key = (s << np.uint64(32)) + d + mix
        h = hash64(key.view(np.int64))
        m = h < thr
        return pa.table({"src": pa.array(s[m].view(np.int64), pa.int64()),
                         "dst": pa.array(d[m].view(np.int64), pa.int64())})

    sub = edges.select_columns(["src", "dst"]).map_batches(
        _keep, batch_format="pyarrow").materialize()
    vids = ray.get(g.vertex_ids_ref)
    tmp = tempfile.gettempdir()
    gb = build_graph(sub, _os.path.join(tmp, "essentials_rd_2ecc_a"),
                     g.num_parts, symmetrize=True, persist=False,
                     vertex_ids=vids)
    br, _ = find_bridges(gb, sub, max_iters=2 * CC_ITERS,
                         scatter_mode="fused")
    bkeys = np.sort(
        (np.asarray(br["src"], np.int64).astype(np.uint64)
         << np.uint64(32))
        | np.asarray(br["dst"], np.int64).astype(np.uint64))
    bref = ray.put(bkeys)

    def _drop_bridges(t: pa.Table) -> pa.Table:
        bk = ray.get(bref)
        lo = np_col(t, "src").astype(np.uint64)
        hi = np_col(t, "dst").astype(np.uint64)
        key = (lo << np.uint64(32)) | hi
        pos = np.searchsorted(bk, key)
        isb = (pos < len(bk)) & (bk[np.minimum(pos, max(len(bk) - 1, 0))]
                                 == key) if len(bk) else \
            np.zeros(len(key), bool)
        return t.filter(pa.array(~isb))

    core = sub.map_batches(_drop_bridges, batch_format="pyarrow")
    g2 = build_graph(core, _os.path.join(tmp, "essentials_rd_2ecc_b"),
                     g.num_parts, symmetrize=True, persist=False,
                     vertex_ids=vids)
    cc = connected_components(g2, max_iters=2 * CC_ITERS,
                              checkpoint_every=0, scatter_mode="fused")
    return components_table(cc)


def _two_edge_components_sql() -> str:
    inner = _bridges_sql()
    # reuse the full bridges derivation as a subquery, then CC over
    # the sparsified edges minus the bridge set
    steps = [
        f"br AS MATERIALIZED (SELECT src, dst FROM ({inner}))",
        "cpairs AS MATERIALIZED (SELECT p.src, p.dst FROM ("
        "SELECT src, dst FROM kz3 WHERE z < CAST('"
        f"{(BRIDGE_NUM << 64) // BRIDGE_DEN - 1}' AS UBIGINT)) p "
        "LEFT JOIN br b ON b.src = p.src AND b.dst = p.dst "
        "WHERE b.src IS NULL)",
        "csym AS MATERIALIZED (SELECT src, dst FROM cpairs "
        "UNION ALL SELECT dst, src FROM cpairs)",
        "t0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)",
    ]
    for k in range(CC_ITERS):
        steps.append(f"""
tm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM csym e JOIN t{k} l ON l.vid = e.src GROUP BY e.dst
),
t{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM t{k} v LEFT JOIN tm{k} m ON m.vid = v.vid
)""")
    # _bridges_sql is a full "WITH <ctes> SELECT ..." statement; splice
    # its CTE list in front of ours and wrap its final SELECT as `br`.
    prefix = inner[len("WITH "):inner.rindex("SELECT t.lo")]
    final_select = inner[inner.rindex("SELECT t.lo"):]
    steps[0] = f"br AS MATERIALIZED ({final_select})"
    body = prefix.rstrip() + ", " + ",".join(steps)
    return (f"WITH {body} "
            f"SELECT vid, label FROM t{CC_ITERS} ORDER BY vid")


def _q_rand_index(sf_dir: str):
    """Partition-agreement metric, exact: the (adjusted) Rand index
    between the LP communities (k=4 rounds) and the CC ground truth
    on the same graph — the standard clustering-evaluation number,
    computed entirely from exact pair-counting integers (contingency
    Σ C(n_ij,2), per-side Σ C(a_i,2)/Σ C(b_j,2), N = C(n,2)); ARI is
    ONE float division of two exact ints, NULL when the denominator
    degenerates.  Both labelings come from already-verified engines;
    the contingency fold runs on the driver-sized label tables."""
    from essentials_rd.algorithms import (
        connected_components, label_propagation,
    )
    from essentials_rd.algorithms.cc import components_table
    from essentials_rd.algorithms.lp import labels_table

    g, _ = _graph(sf_dir)
    lp = labels_table(label_propagation(
        g, max_iters=LP_ITERS, checkpoint_every=0, scatter_mode="fused"))
    cc = components_table(connected_components(
        g, max_iters=2 * CC_ITERS, checkpoint_every=0,
        scatter_mode="fused"))
    from essentials_rd.ops import pair_counting_ari

    la = np.asarray(lp["label"], np.int64)
    lb = np.asarray(cc["label"], np.int64)
    assert lp["vid"].equals(cc["vid"])
    N, s_both, s_a, s_b, ari = pair_counting_ari(la, lb)
    return pa.table({
        "n_pairs": pa.array([N], pa.int64()),
        "s_both": pa.array([s_both], pa.int64()),
        "s_a": pa.array([s_a], pa.int64()),
        "s_b": pa.array([s_b], pa.int64()),
        "ari": pa.array([ari], pa.float64()),
    })


def _rand_index_sql() -> str:
    cc_steps = ["l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)"]
    for k in range(CC_ITERS):
        cc_steps.append(f"""
m{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM sym e JOIN l{k} l ON l.vid = e.src GROUP BY e.dst
),
l{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM l{k} v LEFT JOIN m{k} m ON m.vid = v.vid
)""")
    return (
        f"WITH {_GRAPH_CTES}, {_lp_sql_body()}, "
        + ",".join(cc_steps) + ", "
        f"jj AS (SELECT a.label AS la, c.label AS lc FROM b{LP_ITERS} a "
        f"JOIN l{CC_ITERS} c ON c.vid = a.vid), "
        "ct AS (SELECT la, lc, CAST(count(*) AS HUGEINT) AS n "
        "FROM jj GROUP BY 1, 2), "
        "sij AS (SELECT sum(n * (n - 1) / 2) AS s FROM ct), "
        "sa AS (SELECT sum(n * (n - 1) / 2) AS s FROM "
        "(SELECT sum(n) AS n FROM ct GROUP BY la)), "
        "sb AS (SELECT sum(n * (n - 1) / 2) AS s FROM "
        "(SELECT sum(n) AS n FROM ct GROUP BY lc)), "
        "rin AS (SELECT sum(n) AS n FROM ct) "
        "SELECT CAST(rin.n * (rin.n - 1) / 2 AS BIGINT) AS n_pairs, "
        "CAST(sij.s AS BIGINT) AS s_both, CAST(sa.s AS BIGINT) AS s_a, "
        "CAST(sb.s AS BIGINT) AS s_b, "
        "CASE WHEN (sa.s + sb.s) * (rin.n * (rin.n - 1) / 2) "
        "- 2 * sa.s * sb.s = 0 THEN NULL ELSE "
        "CAST(2 * (sij.s * (rin.n * (rin.n - 1) / 2) - sa.s * sb.s) "
        "AS DOUBLE) / CAST((sa.s + sb.s) * (rin.n * (rin.n - 1) / 2) "
        "- 2 * sa.s * sb.s AS DOUBLE) END AS ari "
        "FROM sij, sa, sb, rin"
    )


EDGE_CUT_PARTS = 8


def _q_edge_cut(sf_dir: str):
    """Partitioner edge-cut diagnostic: the (p_src, p_dst) histogram of
    co-purchase edges under the engine's own splitmix64 hash
    partitioner (util.part_of, P=8) — the quantity that prices every
    BSP superstep's shuffle (off-diagonal mass = messages that cross
    workers).  Zero shuffle: one ≤P² partial row per block, folded
    driver-side."""
    from essentials_rd.pipelines import copurchase_edges
    from essentials_rd.util import np_col, part_of

    edges = copurchase_edges(sf_dir)
    P = EDGE_CUT_PARTS

    def _partial(b: pa.Table) -> pa.Table:
        k = (part_of(np_col(b, "src"), P).astype(np.int64) * P
             + part_of(np_col(b, "dst"), P).astype(np.int64))
        return pa.table({
            "k": pa.array(np.arange(P * P, dtype=np.int64), pa.int64()),
            "c": pa.array(np.bincount(k, minlength=P * P).astype(np.int64),
                          pa.int64()),
        })

    rows = edges.map_batches(_partial, batch_format="pyarrow").take_all()
    tot = np.zeros(P * P, np.int64)
    for r in rows:
        tot[r["k"]] += r["c"]
    nz = np.flatnonzero(tot)
    return pa.table({
        "p_src": pa.array(nz // P, pa.int64()),
        "p_dst": pa.array(nz % P, pa.int64()),
        "n_edges": pa.array(tot[nz], pa.int64()),
    })


def _edge_cut_sql() -> str:
    P = EDGE_CUT_PARTS
    sz = _sm64_ctes("ecs", "dst", "src", "pairs")
    dz = _sm64_ctes("ecd", "zs", "dst", "(SELECT z AS zs, dst FROM ecs3)")
    return (
        f"WITH {_GRAPH_CTES}, {sz}, {dz} "
        f"SELECT CAST(zs % {P} AS BIGINT) AS p_src, "
        f"CAST(z % {P} AS BIGINT) AS p_dst, "
        "CAST(count(*) AS BIGINT) AS n_edges "
        "FROM ecd3 GROUP BY 1, 2 ORDER BY 1, 2"
    )


STRAT_TARGET = 30


def _q_stratified_docs(sf_dir: str):
    """Per-group deterministic sampling (ops.stratified_sample): ~30
    docs per language, integer-exact thresholds, reproducible by the
    SQL oracle through the shared SplitMix64 chain."""
    import ray.data as rd

    from essentials_rd.ops import stratified_sample
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    return stratified_sample(
        docs, "lang", lambda b: np_col(b, "doc_id"), STRAT_TARGET,
        seed=SAMPLE_SEED,
    )


def _stratified_docs_sql() -> str:
    # literals on purpose (twin-independence) — engine SAMPLE_SEED=42,
    # STRAT_TARGET=30
    SAMPLE_SEED = 42
    STRAT_TARGET = 30
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes(
        "z", "doc_id, lang, n", f"doc_id + {mix}",
        "(SELECT d.doc_id, d.lang, c.n FROM documents d "
        "JOIN (SELECT lang, count(*) AS n FROM documents GROUP BY lang) c "
        "ON c.lang = d.lang)",
    )
    return (
        f"WITH {chain} "
        f"SELECT doc_id, lang FROM z3 "
        f"WHERE n <= {STRAT_TARGET} OR "
        f"z < CAST(CAST({STRAT_TARGET} AS HUGEINT) * 18446744073709551615 "
        f"// n AS UBIGINT)"
    )


# exact per-language document budgets for the corpus-mix query — picked
# so sf0.001 exercises BOTH branches (de has 71 docs < 100 → kept whole;
# the rest are real cuts) and fr (absent) is dropped entirely
MIX_QUOTAS = {"en": 120, "de": 100, "es": 40, "zh": 25}


def _q_mixed_corpus(sf_dir: str):
    """EXACT-quota corpus mixing (ops.quota_mix_sample): per language
    keep exactly min(quota, available) docs, selected by the splitmix64
    priority rank with doc_id tie-break — the hard-budget counterpart
    of stratified_docs' Bernoulli thresholds."""
    import ray.data as rd

    from essentials_rd.ops import quota_mix_sample
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])
    return quota_mix_sample(
        docs, "lang", lambda b: np_col(b, "doc_id"), MIX_QUOTAS,
        seed=SAMPLE_SEED,
    )


def _mixed_corpus_sql() -> str:
    # literals on purpose (twin-independence) — engine SAMPLE_SEED and
    # MIX_QUOTAS frozen; a quota/seed edit breaks the pair loudly
    SAMPLE_SEED = 42
    MIX_QUOTAS = {"en": 120, "de": 100, "es": 40, "zh": 25}
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes("z", "doc_id, lang", f"doc_id + {mix}", "documents")
    values = ", ".join(f"('{g}', {q})" for g, q in MIX_QUOTAS.items())
    return (
        f"WITH {chain}, q(lang, quota) AS (VALUES {values}), "
        f"r AS (SELECT doc_id, z3.lang, quota, "
        f"row_number() OVER (PARTITION BY z3.lang ORDER BY z, doc_id) AS rn "
        f"FROM z3 JOIN q ON q.lang = z3.lang) "
        f"SELECT doc_id, lang FROM r WHERE rn <= quota"
    )


def _q_pagerank_weighted(sf_dir: str):
    """Edge-weighted PageRank (WeightedPageRankProgram): mass splits
    proportionally to co-purchase edge weights; fixed PR_ITERS power
    steps vs the unrolled weighted-CTE oracle, 6-dp half-up on both
    sides."""
    from essentials_rd.algorithms.pagerank import pagerank_weighted
    from essentials_rd.pipelines import round_half_up

    g, _ = _graph(sf_dir, weighted=True)
    res = pagerank_weighted(g, alpha=ALPHA, tol=0.0, max_iters=PR_ITERS,
                            checkpoint_every=0, scatter_mode="fused")
    t = res.state_table(["value"])
    vals = round_half_up(np.asarray(t["value"], dtype=np.float64), 6)
    return pa.table({"vid": t["vid"], "pagerank": pa.array(vals, pa.float64())})


def _pagerank_weighted_sql() -> str:
    steps = [
        "symw AS MATERIALIZED (SELECT src, dst, weight FROM pairs "
        "UNION ALL SELECT dst AS src, src AS dst, weight FROM pairs)",
        "wdeg AS MATERIALIZED (SELECT v.vid, "
        "COALESCE(sum(e.weight), 0.0) AS wsum, count(e.src) AS outdeg "
        "FROM verts v LEFT JOIN symw e ON e.src = v.vid GROUP BY v.vid)",
        "p0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT n FROM nn) AS val FROM verts)",
    ]
    for k in range(PR_ITERS):
        steps.append(f"""
agg{k} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(p.val * e.weight / d.wsum) AS s
  FROM symw e JOIN p{k} p ON p.vid = e.src JOIN wdeg d ON d.vid = e.src
  GROUP BY e.dst
),
dang{k} AS MATERIALIZED (
  SELECT COALESCE(sum(p.val), 0.0) AS dm
  FROM p{k} p JOIN wdeg d ON d.vid = p.vid WHERE d.outdeg = 0
),
p{k + 1} AS MATERIALIZED (
  SELECT v.vid,
         (1.0 - {ALPHA})/(SELECT n FROM nn)
         + {ALPHA} * (COALESCE(a.s, 0.0) + (SELECT dm FROM dang{k})/(SELECT n FROM nn)) AS val
  FROM verts v LEFT JOIN agg{k} a ON a.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT vid, ROUND(val, 6) AS pagerank FROM p{PR_ITERS} ORDER BY vid"
    )


def _q_degree_hist(sf_dir: str):
    """Degree histogram (the classic first diagnostic of a web-scale
    graph): per-shard degree tables fold into one |V|-sized driver
    array (the repo's documented O(|V|) ≪ O(|E|) driver allowance),
    then a single bincount."""
    import ray

    from essentials_rd.util import np_col

    g, _ = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for t in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(t, "vid"))
        deg[pos] += np_col(t, "outdeg")
    hist = np.bincount(deg)
    nz = np.flatnonzero(hist)
    return pa.table({"degree": pa.array(nz.astype(np.int64), pa.int64()),
                     "n_vertices": pa.array(hist[nz].astype(np.int64),
                                            pa.int64())})


def _q_edge_jaccard(sf_dir: str):
    """Per-edge neighborhood similarity (algorithms.similarity):
    common-neighbor count + Jaccard for every canonical co-purchase
    edge — TC's min-side packed-key probe crediting edges, no
    shuffle."""
    from essentials_rd.algorithms.similarity import edge_similarity

    g, edges = _graph(sf_dir)
    return edge_similarity(g, edges.select_columns(["src", "dst"]))


def _edge_jaccard_sql() -> str:
    return f"""
WITH {_GRAPH_CTES},
common AS (
  SELECT p.src AS u, p.dst AS v, count(*) AS c
  FROM pairs p
  JOIN sym a ON a.src = p.src
  JOIN sym b ON b.src = p.dst AND b.dst = a.dst
  GROUP BY 1, 2
)
SELECT p.src, p.dst,
       CAST(COALESCE(c.c, 0) AS BIGINT) AS common,
       ROUND(1.0 * COALESCE(c.c, 0)
             / (da.outdeg + db.outdeg - COALESCE(c.c, 0)), 6) AS jaccard
FROM pairs p
LEFT JOIN common c ON c.u = p.src AND c.v = p.dst
JOIN deg da ON da.vid = p.src
JOIN deg db ON db.vid = p.dst
"""


KTRUSS_K = 12
KTRUSS_ROUNDS = 7


def _q_ktruss(sf_dir: str):
    """k-truss subgraph (algorithms.similarity.ktruss): iterative
    support peeling, one no-checkpoint build + edge-support probe per
    round; must reach fixpoint within the oracle's unrolled rounds."""
    from essentials_rd.algorithms.similarity import ktruss

    _, edges = _graph(sf_dir)
    truss, rounds, converged = ktruss(edges, KTRUSS_K,
                                      max_rounds=KTRUSS_ROUNDS)
    assert converged, (
        "ktruss did not converge within the oracle's unrolled rounds"
    )
    return truss


def _ktruss_sql() -> str:
    """Unrolled truss peeling: per round recompute each surviving
    edge's in-subgraph support with the triple join and keep support
    ≥ k−2.  Extra rounds past the engine's fixpoint are no-ops, so a
    fixed unroll count compares exactly."""
    steps = [
        "e0 AS MATERIALIZED (SELECT src, dst FROM pairs)",
    ]
    for r in range(KTRUSS_ROUNDS - 1):
        steps.append(
            f"s{r} AS MATERIALIZED (SELECT src, dst FROM e{r} "
            f"UNION ALL SELECT dst AS src, src AS dst FROM e{r})"
        )
        steps.append(f"""c{r} AS MATERIALIZED (
  SELECT p.src, p.dst, count(*) AS c
  FROM e{r} p
  JOIN s{r} a ON a.src = p.src
  JOIN s{r} b ON b.src = p.dst AND b.dst = a.dst
  GROUP BY 1, 2
)""")
        steps.append(
            f"e{r + 1} AS MATERIALIZED (SELECT p.src, p.dst FROM e{r} p "
            f"JOIN c{r} c ON c.src = p.src AND c.dst = p.dst "
            f"WHERE c.c >= {KTRUSS_K - 2})"
        )
    body = ", ".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT src, dst FROM e{KTRUSS_ROUNDS - 1}"
    )


NS_K = 3
WALK_STEPS = 3


def _q_neighbor_sample(sf_dir: str):
    """GraphSAGE-style deterministic fanout sampling
    (sampling.sample_neighbors): per vertex the NS_K neighbors with the
    smallest splitmix64(src·2³² + dst + seed·golden) — one vectorized
    task per CSR shard, zero shuffle, bit-reproduced by the SQL chain
    + ROW_NUMBER oracle."""
    from essentials_rd.sampling import sample_neighbors

    g, _ = _graph(sf_dir)
    return sample_neighbors(g, NS_K, seed=SAMPLE_SEED)


def _neighbor_sample_sql() -> str:
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes(
        "ns", "src, dst", f"src * 4294967296 + dst + {mix}", "sym"
    )
    return (
        f"WITH {_GRAPH_CTES}, {chain}, "
        "ranked AS (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY z, dst) AS rn "
        "FROM ns3) "
        f"SELECT src, dst FROM ranked WHERE rn <= {NS_K}"
    )


def _q_random_walks(sf_dir: str):
    """Deterministic random walks (sampling.random_walks): one
    WALK_STEPS-step walk per vertex over the co-purchase graph, next
    hop = (splitmix64(wid·2³² + v·2654435761 + t + seed·golden) mod
    deg(v))-th dst-sorted neighbor; per-step object-store task
    exchange, unrolled-CTE oracle."""
    from essentials_rd.sampling import random_walks

    g, _ = _graph(sf_dir)
    return random_walks(g, WALK_STEPS, seed=SAMPLE_SEED)


def _walks_cte() -> tuple[str, str]:
    """(CTE body, walk-rows SELECT) for the deterministic random-walk
    unrolled chain — shared by the random_walks oracle and the
    skip-gram pair oracle built on top of the same walks."""
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    steps = [
        "rankadj AS MATERIALIZED (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rn "
        "FROM sym)",
        "w0 AS (SELECT vid AS wid, vid AS cur FROM verts)",
    ]
    for t in range(1, WALK_STEPS + 1):
        steps.append(_sm64_ctes(
            f"h{t}", "wid, cur",
            f"wid * 4294967296 + cur * 2654435761 + {t} + {mix}",
            f"w{t - 1}",
        ))
        steps.append(
            f"p{t} AS (SELECT z.wid, z.cur, COALESCE(d.outdeg, 0) AS dg, "
            f"z.z FROM h{t}3 z LEFT JOIN deg d ON d.vid = z.cur)"
        )
        steps.append(
            f"w{t} AS (SELECT p.wid, "
            f"CASE WHEN p.cur < 0 OR p.dg = 0 THEN -1 ELSE r.dst END AS cur "
            f"FROM p{t} p LEFT JOIN rankadj r ON r.src = p.cur "
            f"AND p.dg > 0 AND r.rn = CAST(p.z % GREATEST(p.dg, 1) AS BIGINT))"
        )
    body = ", ".join(steps)
    sel = " UNION ALL ".join(
        f"SELECT wid, {t} AS step, cur AS node FROM w{t}"
        for t in range(1, WALK_STEPS + 1)
    )
    return body, sel


def _random_walks_sql() -> str:
    body, sel = _walks_cte()
    return f"WITH {_GRAPH_CTES}, {body} {sel}"


SKIPGRAM_WINDOW = 2


def _q_skipgram(sf_dir: str):
    """Skip-gram positive-pair counts (sampling.walk_skipgram_pairs):
    the DeepWalk training-data step — over the deterministic
    random-walk corpus, count every ordered (node@s, node@s+d) pair
    with 1 ≤ d ≤ SKIPGRAM_WINDOW and both nodes alive; wid-bucketed
    exchange + window-shift alignment (no per-row Python), packed-key
    pre-combine, one tiny distinct-pair combine."""
    from essentials_rd.sampling import random_walks, walk_skipgram_pairs

    g, _ = _graph(sf_dir)
    walks = random_walks(g, WALK_STEPS, seed=SAMPLE_SEED)
    return walk_skipgram_pairs(walks, window=SKIPGRAM_WINDOW)


def _skipgram_sql() -> str:
    body, sel = _walks_cte()
    return (
        f"WITH {_GRAPH_CTES}, {body}, walks AS ({sel}) "
        "SELECT x.node AS a, y.node AS b, CAST(count(*) AS BIGINT) AS n "
        "FROM walks x JOIN walks y ON y.wid = x.wid "
        f"AND y.step > x.step AND y.step <= x.step + {SKIPGRAM_WINDOW} "
        "WHERE x.node >= 0 AND y.node >= 0 GROUP BY 1, 2"
    )


N2V_P, N2V_Q = 2.0, 0.5  # powers of two → dyadic weights, exact sums


def _q_node2vec(sf_dir: str):
    """node2vec-biased walks (sampling.node2vec_walks): second-order
    sampling with return weight 1/p, in-neighbor weight 1, outward
    weight 1/q over the co-purchase graph; the inverse-CDF pick runs on
    dyadic weights so every cumulative sum is EXACT and the SQL twin's
    window sums match bit-for-bit."""
    from essentials_rd.sampling import node2vec_walks

    g, _ = _graph(sf_dir)
    return node2vec_walks(g, WALK_STEPS, p=N2V_P, q=N2V_Q,
                          seed=SAMPLE_SEED)


def _node2vec_sql() -> str:
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    w_back, w_out = 1.0 / N2V_P, 1.0 / N2V_Q
    steps = ["n0 AS (SELECT vid AS wid, vid AS cur, "
             "CAST(-1 AS BIGINT) AS prev FROM verts)"]
    for t in range(1, WALK_STEPS + 1):
        steps.append(_sm64_ctes(
            f"nh{t}", "wid, cur, prev",
            f"wid * 4294967296 + cur * 2654435761 + {t} + {mix}",
            f"n{t - 1}",
        ))
        steps.append(
            f"cd{t} AS (SELECT h.wid, h.cur, h.prev, h.z, e.dst AS cand, "
            f"CASE WHEN h.prev < 0 THEN 1.0 "
            f"WHEN e.dst = h.prev THEN {w_back!r} "
            f"WHEN ep.src IS NOT NULL THEN 1.0 "
            f"ELSE {w_out!r} END AS wt "
            f"FROM nh{t}3 h JOIN sym e ON e.src = h.cur "
            f"LEFT JOIN sym ep ON ep.src = h.prev AND ep.dst = e.dst)"
        )
        steps.append(
            f"cw{t} AS (SELECT wid, z, cand, "
            f"sum(wt) OVER (PARTITION BY wid ORDER BY cand "
            f"ROWS UNBOUNDED PRECEDING) AS cw, "
            f"sum(wt) OVER (PARTITION BY wid) AS tw, "
            f"row_number() OVER (PARTITION BY wid ORDER BY cand) AS rk "
            f"FROM cd{t})"
        )
        steps.append(
            f"pk{t} AS (SELECT wid, COALESCE(min(CASE WHEN cw > "
            f"(CAST(z AS DOUBLE) / 18446744073709551616.0) * tw "
            f"THEN rk END), max(rk)) AS prk FROM cw{t} GROUP BY wid)"
        )
        steps.append(
            f"n{t} AS (SELECT h.wid, COALESCE(c.cand, -1) AS cur, "
            f"h.cur AS prev FROM nh{t}3 h "
            f"LEFT JOIN pk{t} k ON k.wid = h.wid "
            f"LEFT JOIN cw{t} c ON c.wid = h.wid AND c.rk = k.prk)"
        )
    body = ", ".join(steps)
    sel = " UNION ALL ".join(
        f"SELECT wid, {t} AS step, cur AS node FROM n{t}"
        for t in range(1, WALK_STEPS + 1)
    )
    return f"WITH {_GRAPH_CTES}, {body} {sel}"


CONTAM_GRAM_K = 4
CONTAM_FRAC = 0.1
CONTAM_SEED = 9


def _q_contaminated_docs(sf_dir: str):
    """Benchmark decontamination (textops.contamination): the
    deterministic 10% doc sample plays the held-out benchmark; every
    remaining doc reports its count of DISTINCT shared token 4-grams
    (exact-string semantics via hash-prefilter + verify)."""
    import ray.data as rd

    from essentials_rd.ops import deterministic_sample
    from essentials_rd.textops import contamination
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    key = lambda b: np_col(b, "doc_id")  # noqa: E731
    bench = deterministic_sample(docs, CONTAM_FRAC, key, seed=CONTAM_SEED)
    rest = deterministic_sample(docs, CONTAM_FRAC, key, seed=CONTAM_SEED,
                                complement=True)
    return contamination(rest, bench, gram_k=CONTAM_GRAM_K)


def _contaminated_docs_sql() -> str:
    # literals on purpose (twin-independence) — engine CONTAM_GRAM_K=4,
    # CONTAM_FRAC=0.1, CONTAM_SEED=9 frozen
    k = 4
    threshold = int(0.1 * float(2**64 - 1))
    mix = (9 * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes("cz", "doc_id, text", f"doc_id + {mix}", "documents")
    return f"""
WITH {chain},
bench AS (SELECT doc_id, text FROM cz3 WHERE z < CAST('{threshold}' AS UBIGINT)),
rest AS (SELECT doc_id, text FROM cz3 WHERE z >= CAST('{threshold}' AS UBIGINT)),
btoks AS (SELECT string_split(text, ' ') AS ts FROM bench),
bidx AS (SELECT ts, unnest(range(1, greatest(len(ts) - {k - 1}, 0) + 1)) AS i
         FROM btoks),
bgrams AS (SELECT DISTINCT array_to_string(list_slice(ts, i, i + {k - 1}), ' ')
           AS gram FROM bidx),
rtoks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM rest),
ridx AS (SELECT doc_id, ts,
                unnest(range(1, greatest(len(ts) - {k - 1}, 0) + 1)) AS i
         FROM rtoks),
rgrams AS (SELECT doc_id,
                  array_to_string(list_slice(ts, i, i + {k - 1}), ' ') AS gram
           FROM ridx)
SELECT r.doc_id, CAST(count(DISTINCT r.gram) AS BIGINT) AS n_shared
FROM rgrams r JOIN bgrams b ON b.gram = r.gram
GROUP BY r.doc_id
"""


HH_K = 25


def _q_top_tokens(sf_dir: str):
    """EXACT global top-25 tokens via the two-pass Misra–Gries
    sketch-then-recount heavy hitter (textops.heavy_hitters_tokens):
    O(m) driver traffic, no vocabulary shuffle, certified exact."""
    import ray.data as rd

    from essentials_rd.textops import heavy_hitters_tokens

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return heavy_hitters_tokens(docs, k=HH_K)


def _q_lang_diversity(sf_dir: str):
    """Per-language Simpson-diversity pieces
    (textops.lang_token_diversity): (Σn, distinct, Σn²) over the
    whitespace token distribution — collision probability and
    type-token ratio derive from three exact int64s; vocabulary moves
    only as per-block distinct pre-counts."""
    import ray.data as rd

    from essentials_rd.textops import lang_token_diversity

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text"])
    return lang_token_diversity(docs)


def _lang_diversity_sql() -> str:
    return (
        "SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS n_distinct, "
        "CAST(sum(n * n) AS BIGINT) AS sum_n2 FROM ("
        "SELECT lang, tok, count(*) AS n FROM ("
        "SELECT lang, unnest(string_split(text, ' ')) AS tok "
        "FROM documents) GROUP BY 1, 2) GROUP BY 1 ORDER BY 1"
    )


def _q_event_gaps(sf_dir: str):
    """Per-key LAG window (windows.lag_diff): gap to the user's previous
    event under the (ts, event_id) total order, first row = -1."""
    import ray.data as rd

    from essentials_rd.windows import lag_diff

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    return lag_diff(ev)


SIMHASH_T = 3


def _q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (textops.simhash_near_pairs): hamming ≤
    SIMHASH_T via 4×16-bit pigeonhole banding + in-bucket exact
    popcount verify; the token hash is the SQL-reproducible code-point
    polynomial, so the oracle recomputes the full sketch bit-for-bit."""
    import ray.data as rd

    from essentials_rd.textops import simhash_near_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return simhash_near_pairs(docs, max_hamming=SIMHASH_T)


HASH_TRICK_D = 16


def _q_hash_features(sf_dir: str):
    """Hashing-trick doc features (textops.hashing_trick_features,
    d=16): signed token-hash counts, no vocabulary, no fit pass, zero
    shuffle; sparse (doc_id, dim, val) oracle-checked through the
    code-point token key."""
    import ray.data as rd

    from essentials_rd.textops import hashing_trick_features

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return hashing_trick_features(docs, d=HASH_TRICK_D)


def _hash_features_sql() -> str:
    chain = _sm64_ctes(
        "hf", "doc_id", _token_key_sql(),
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents)")
    return (
        f"WITH {chain} "
        f"SELECT doc_id, CAST(z % {HASH_TRICK_D} AS BIGINT) AS dim, "
        "CAST(SUM(CASE WHEN (z >> 32) & 1 = 0 THEN 1 ELSE -1 END) "
        "AS BIGINT) AS val FROM hf3 GROUP BY 1, 2 "
        "HAVING SUM(CASE WHEN (z >> 32) & 1 = 0 THEN 1 ELSE -1 END) != 0 "
        "ORDER BY 1, 2"
    )


QUERY_TEXT = "data processing engine"


BM25_K = 10
BM25_SCALE = 1_000_000


def _q_bm25(sf_dir: str):
    """Exact-integer BM25 retrieval (textops.bm25_topk): linear idf
    N/df and rational k1=6/5, b=3/4 make every per-term value an exact
    integer floor-quotient, so the ranking is bit-identical at any
    layout and in SQL.  One stats fold, one tokenize pass restricted
    to query tokens, one bucketed per-doc sum, one top-k — the corpus
    vocabulary is never built."""
    import ray.data as rd

    from essentials_rd.textops import bm25_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return bm25_topk(docs, QUERY_TEXT, k=BM25_K, scale=BM25_SCALE)


def _bm25_sql() -> str:
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
st AS MATERIALIZED (SELECT (SELECT count(*) FROM documents) AS n,
                           (SELECT count(*) FROM tok) AS t),
q AS (SELECT DISTINCT unnest(string_split('{QUERY_TEXT}', ' ')) AS token),
tf AS MATERIALIZED (
  SELECT doc_id, token, count(*) AS tf FROM tok JOIN q USING (token)
  GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT f.doc_id,
    CAST((CAST({BM25_SCALE} AS HUGEINT) * 22 * s.n * f.tf * s.t) //
         (CAST(d.df AS HUGEINT) *
          (10 * f.tf * s.t + 3 * s.t + 9 * l.dl * s.n)) AS BIGINT) AS term
  FROM tf f JOIN df d USING (token) JOIN dl l USING (doc_id), st s
)
SELECT doc_id, CAST(sum(term) AS BIGINT) AS score FROM sc GROUP BY 1
ORDER BY score DESC, doc_id LIMIT {BM25_K}"""


RRF_DEPTH, RRF_C, RRF_TOPK, RRF_SCALE = 50, 60, 10, 1_000_000


def _q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion — THE standard hybrid-search combiner:
    fuse the lexical BM25 top-50 for the fixed query with the dense
    top-50 by cosine to document 0's embedding (the two retrieval
    stacks already in the engine), score = Σ ⌊10⁶/(60+rank)⌋ over the
    lists a doc appears in (integer floors, so the fusion is exact and
    layout-proof), top-10 by (rrf desc, doc_id).  Both rankings run
    distributed; the fusion folds two ≤50-row lists."""
    import ray.data as rd

    from essentials_rd.ann import brute_force_topk
    from essentials_rd.textops import bm25_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    bm = bm25_topk(docs, QUERY_TEXT, k=RRF_DEPTH,
                   scale=BM25_SCALE)
    bm_rank = {int(d): i + 1 for i, d in
               enumerate(bm.column("doc_id").to_pylist())}

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    q0 = [r for r in emb.filter(expr="vec_id == 0").take_all()]
    qm = np.array([q0[0]["embedding"]], np.float64)
    ann = brute_force_topk(emb, qm, np.array([0], np.int64),
                           k=RRF_DEPTH)
    cos_rank = {int(v): int(r) for v, r in
                zip(ann.column("vec_id").to_pylist(),
                    ann.column("rank").to_pylist())}

    fused = []
    for d in set(bm_rank) | set(cos_rank):
        score = 0
        if d in bm_rank:
            score += RRF_SCALE // (RRF_C + bm_rank[d])
        if d in cos_rank:
            score += RRF_SCALE // (RRF_C + cos_rank[d])
        fused.append((d, score))
    fused.sort(key=lambda t: (-t[1], t[0]))
    top = fused[:RRF_TOPK]
    return pa.table({
        "doc_id": pa.array([t[0] for t in top], pa.int64()),
        "rrf": pa.array([t[1] for t in top], pa.int64()),
        "bm_rank": pa.array([bm_rank.get(t[0], 0) for t in top],
                            pa.int64()),
        "cos_rank": pa.array([cos_rank.get(t[0], 0) for t in top],
                             pa.int64()),
    })


def _rrf_fusion_sql() -> str:
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
st AS MATERIALIZED (SELECT (SELECT count(*) FROM documents) AS n,
                           (SELECT count(*) FROM tok) AS t),
q AS (SELECT DISTINCT unnest(string_split('{QUERY_TEXT}', ' ')) AS token),
tf AS MATERIALIZED (
  SELECT doc_id, token, count(*) AS tf FROM tok JOIN q USING (token)
  GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT f.doc_id,
    CAST((CAST({BM25_SCALE} AS HUGEINT) * 22 * s.n * f.tf * s.t) //
         (CAST(d.df AS HUGEINT) *
          (10 * f.tf * s.t + 3 * s.t + 9 * l.dl * s.n)) AS BIGINT) AS term
  FROM tf f JOIN df d USING (token) JOIN dl l USING (doc_id), st s
),
bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
        AS br FROM (SELECT doc_id, CAST(sum(term) AS BIGINT) AS score
        FROM sc GROUP BY 1 ORDER BY score DESC, doc_id
        LIMIT {RRF_DEPTH})),
qv AS MATERIALIZED (SELECT CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings WHERE vec_id = 0),
cosr AS (SELECT vec_id AS doc_id, row_number() OVER (
    ORDER BY cosine DESC, vec_id) AS cr FROM (
  SELECT c.vec_id, ROUND(list_cosine_similarity(qv.e,
    CAST(c.embedding AS DOUBLE[])), 6) AS cosine
  FROM embeddings c, qv WHERE c.vec_id != 0
  ORDER BY cosine DESC, c.vec_id LIMIT {RRF_DEPTH})),
fused AS (
  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
    COALESCE({RRF_SCALE} // ({RRF_C} + b.br), 0)
      + COALESCE({RRF_SCALE} // ({RRF_C} + c.cr), 0) AS rrf,
    COALESCE(b.br, 0) AS bm_rank, COALESCE(c.cr, 0) AS cos_rank
  FROM bmr b FULL OUTER JOIN cosr c ON c.doc_id = b.doc_id
)
SELECT doc_id, CAST(rrf AS BIGINT) AS rrf,
  CAST(bm_rank AS BIGINT) AS bm_rank, CAST(cos_rank AS BIGINT) AS cos_rank
FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPK}"""


def _q_doc_query_scores(sf_dir: str):
    """Vocabulary-free text retrieval: score every document by the
    exact integer dot product of its hashing-trick vector with the
    fixed query string's vector (same featurizer, same d) — top-k with
    doc_id tie-break.  The query vector is 16 ints computed inline;
    scoring is one vectorized pass over the sparse feature rows, one
    grouped sum, one top-k — no vocabulary, no model, no shuffle
    beyond the featurizer's none."""
    import pandas as pd
    import ray.data as rd

    from essentials_rd.textops import _flat_token_keys_oracle
    from essentials_rd.textops import hashing_trick_features
    from essentials_rd.ops import grouped_pandas_agg, top_k
    from essentials_rd.util import np_col

    _, h = _flat_token_keys_oracle(pd.Series([QUERY_TEXT]))
    qv = np.zeros(HASH_TRICK_D, np.int64)
    dim = (h % np.uint64(HASH_TRICK_D)).astype(np.int64)
    sign = np.where(((h >> np.uint64(32)) & np.uint64(1)) == 0, 1, -1)
    np.add.at(qv, dim, sign)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    feats = hashing_trick_features(docs, d=HASH_TRICK_D)

    def _score(t: pa.Table) -> pa.Table:
        dims = np_col(t, "dim")
        # candidates = docs touching a NONZERO query dim (the SQL twin's
        # join semantics); zero-dim rows would only add score-0 noise
        m = qv[dims] != 0
        t = t.filter(pa.array(m))
        contrib = np_col(t, "val") * qv[np_col(t, "dim")]
        return pa.table({"doc_id": t.column("doc_id"),
                         "s": pa.array(contrib, pa.int64())})

    scores = grouped_pandas_agg(
        feats.map_batches(_score, batch_format="pyarrow"),
        keys=["doc_id"], aggs={"score": ("s", "sum")}, num_buckets=8)
    return top_k(scores, by="score", k=TOP_K, tie_cols=["doc_id"])


def _doc_query_scores_sql() -> str:
    qchain = _sm64_ctes(
        "qz", "1 AS one", _token_key_sql(),
        f"(SELECT unnest(string_split('{QUERY_TEXT}', ' ')) AS tok)")
    dchain = _sm64_ctes(
        "dz", "doc_id", _token_key_sql(),
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents)")
    d = HASH_TRICK_D
    return (
        f"WITH {qchain}, {dchain}, "
        f"qv AS (SELECT CAST(z % {d} AS BIGINT) AS dim, "
        "CAST(SUM(CASE WHEN (z >> 32) & 1 = 0 THEN 1 ELSE -1 END) AS "
        "BIGINT) AS qval FROM qz3 GROUP BY 1 "
        "HAVING SUM(CASE WHEN (z >> 32) & 1 = 0 THEN 1 ELSE -1 END) "
        "!= 0), "
        f"dv AS (SELECT doc_id, CAST(z % {d} AS BIGINT) AS dim, "
        "CAST(SUM(CASE WHEN (z >> 32) & 1 = 0 THEN 1 ELSE -1 END) AS "
        "BIGINT) AS val FROM dz3 GROUP BY 1, 2) "
        "SELECT dv.doc_id, CAST(SUM(dv.val * qv.qval) AS BIGINT) AS "
        "score FROM dv JOIN qv USING (dim) GROUP BY 1 "
        f"ORDER BY score DESC, doc_id LIMIT {TOP_K}"
    )


def _token_key_sql() -> str:
    """textops._flat_token_keys_oracle's key over a ``tok`` column:
    code-point polynomial (first 8 chars ·31^i + capped length ·31^8),
    fed into the shared SplitMix64 chain by the callers."""
    terms = " + ".join(
        f"(CASE WHEN length(tok) >= {i + 1} THEN "
        f"CAST(unicode(substr(tok, {i + 1}, 1)) AS HUGEINT) ELSE 0 END)"
        f" * {31 ** i}"
        for i in range(8)
    )
    return f"({terms} + CAST(LEAST(length(tok), 64) AS HUGEINT) * {31 ** 8})"


GC_K = 5  # greedy max-coverage rounds


def _q_greedy_cover(sf_dir: str):
    """Greedy maximum-coverage selection (textops.greedy_cover): k
    rounds of the submodular (1−1/e) greedy — each picks the document
    covering the most not-yet-covered distinct token keys (gain desc,
    id asc), exact integers on the shared code-point token key.  The
    distinct (doc, keys) table materializes once; each round is one
    scan with the covered/selected sets broadcast and per-block top-1
    partials carrying the winner's own key list."""
    import ray.data as rd

    from essentials_rd.textops import greedy_cover

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return greedy_cover(docs, k=GC_K)


def _greedy_cover_sql() -> str:
    key = _token_key_sql()
    chain = _sm64_ctes(
        "gcz", "doc_id", key,
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents)")
    parts = [
        chain,
        "gdt AS MATERIALIZED (SELECT DISTINCT doc_id, "
        "CAST(CASE WHEN z >= CAST(9223372036854775808 AS UBIGINT) "
        f"THEN CAST(z AS HUGEINT) - {_MOD64} "
        "ELSE CAST(z AS HUGEINT) END AS BIGINT) AS key FROM gcz3)",
    ]
    for r in range(1, GC_K + 1):
        if r == 1:
            parts.append(
                "gg1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain "
                "FROM gdt GROUP BY 1)")
        else:
            parts.append(
                f"gg{r} AS (SELECT d.doc_id, "
                "CAST(count(CASE WHEN c.key IS NULL THEN 1 END) AS BIGINT) "
                f"AS gain FROM gdt d LEFT JOIN gcov{r - 1} c "
                "ON c.key = d.key WHERE d.doc_id NOT IN "
                f"(SELECT doc_id FROM gsel{r - 1}) GROUP BY 1)")
        parts.append(
            f"gw{r} AS (SELECT CAST({r} AS BIGINT) AS round, doc_id, gain "
            f"FROM gg{r} ORDER BY gain DESC, doc_id LIMIT 1)")
        cov_prev = (f"SELECT key FROM gcov{r - 1} UNION "
                    if r > 1 else "")
        parts.append(
            f"gcov{r} AS ({cov_prev}SELECT d.key FROM gdt d "
            f"JOIN gw{r} w ON w.doc_id = d.doc_id)")
        sel_prev = (f"SELECT doc_id FROM gsel{r - 1} UNION ALL "
                    if r > 1 else "")
        parts.append(f"gsel{r} AS ({sel_prev}SELECT doc_id FROM gw{r})")
    union = " UNION ALL ".join(
        f"SELECT round, doc_id, gain FROM gw{r}"
        for r in range(1, GC_K + 1))
    return f"WITH {', '.join(parts)} SELECT * FROM ({union}) ORDER BY round"


def _simhash_sql() -> str:
    """DuckDB twin of the full SimHash sketch: token key = code-point
    polynomial (first 8 chars ·31^i + capped length ·31^8) through the
    shared SplitMix64 chain, per-(doc, bit) ±1 votes, bit set when the
    vote sum is positive, pairs by bit_count(xor) ≤ T."""
    key = _token_key_sql()
    chain = _sm64_ctes(
        "sz", "doc_id", key,
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents)",
    )
    return (
        f"WITH {chain}, "
        "simbits AS (SELECT doc_id, b, "
        "SUM(CASE WHEN (z >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s "
        "FROM sz3, (SELECT unnest(range(64)) AS b) GROUP BY doc_id, b), "
        "simsh AS MATERIALIZED (SELECT doc_id, "
        "CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS HUGEINT) << b "
        "ELSE CAST(0 AS HUGEINT) END) AS UBIGINT) AS h "
        "FROM simbits GROUP BY doc_id) "
        "SELECT a, b, hamming FROM ("
        "SELECT x.doc_id AS a, y.doc_id AS b, "
        "CAST(bit_count(xor(x.h, y.h)) AS BIGINT) AS hamming "
        "FROM simsh x JOIN simsh y ON x.doc_id < y.doc_id"
        f") WHERE hamming <= {SIMHASH_T}"
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
FUNNEL = ["signup", "click", "purchase"]


def _q_funnel(sf_dir: str):
    """Ordered funnel (windows.funnel_stages): per user the count of
    signup→click→purchase stages completed in strict time order; one
    user-bucketed shuffle, one masked segment-min pass per stage."""
    import ray.data as rd

    from essentials_rd.windows import funnel_stages

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel_stages(ev, FUNNEL)


def _funnel_sql() -> str:
    parts = []
    for i, s in enumerate(FUNNEL):
        if i == 0:
            parts.append(
                f"f0 AS (SELECT user_id, min(epoch_us(ts)) AS t "
                f"FROM events WHERE event_type = '{s}' GROUP BY user_id)"
            )
        else:
            parts.append(
                f"f{i} AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t "
                f"FROM events e JOIN f{i - 1} p ON p.user_id = e.user_id "
                f"WHERE e.event_type = '{s}' AND epoch_us(e.ts) > p.t "
                f"GROUP BY e.user_id)"
            )
    joins = " ".join(
        f"LEFT JOIN f{i} ON f{i}.user_id = u.user_id"
        for i in range(len(FUNNEL))
    )
    total = " + ".join(
        f"(CASE WHEN f{i}.user_id IS NULL THEN 0 ELSE 1 END)"
        for i in range(len(FUNNEL))
    )
    return (
        "WITH " + ", ".join(parts) + " "
        "SELECT u.user_id, CAST(" + total + " AS BIGINT) AS stage "
        "FROM (SELECT DISTINCT user_id FROM events) u " + joins
    )


def _q_user_event_pivot(sf_dir: str):
    """Pivot/crosstab (ops.pivot_counts): one wide row per user with a
    count column per event type; per-block indicator partials
    pre-aggregate before the single bucketed shuffle."""
    import ray.data as rd

    from essentials_rd.ops import pivot_counts
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type", EVENT_TYPES,
                        key_fn=lambda b: np_col(b, "user_id"))


def _q_event_unpivot(sf_dir: str):
    """UNPIVOT roundtrip (ops.unpivot, the melt inverse of
    pivot_counts): the wide user × event-type crosstab melts back to
    long (user_id, event_type, n) with zero rows dropped — which must
    equal the plain grouped count, exactly what the oracle computes.
    Stateless melt, zero shuffle beyond the pivot's own."""
    import ray.data as rd

    from essentials_rd.ops import pivot_counts, unpivot
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    wide = pivot_counts(ev, "user_id", "event_type", EVENT_TYPES,
                        key_fn=lambda b: np_col(b, "user_id"))
    long = unpivot(wide, ["user_id"], [f"n_{c}" for c in EVENT_TYPES],
                   var_name="event_type", value_name="n")

    def _clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater(t.column("n"), 0))
        et = pc.utf8_replace_slice(t.column("event_type"), 0, 2, "")
        return pa.table({"user_id": t.column("user_id"),
                         "event_type": et,
                         "n": t.column("n")})

    return long.map_batches(_clean, batch_format="pyarrow")


def _event_unpivot_sql() -> str:
    return (
        "SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    )


def _q_doc_char_rank(sf_dir: str):
    """Ranking window (ops.grouped_rank): row_number + percent_rank of
    every doc within its language by (n_chars desc, doc_id asc) — a
    total order, so both sides divide the same two integers and the
    pct doubles are bit-identical with no rounding convention."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_rank

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    return grouped_rank(docs, "lang", "n_chars", "doc_id",
                        key_fn=lambda b: _str_hash(b.column("lang")),
                        descending=True)


RA_CAP = 100
RA_K = 40


Q1_CUTOFF = "1998-09-02"


OUTLIER_K = 0.5  # fence multiplier (exactly representable)


GREP_NEEDLE = "spark window"
GREP_PARTS = 32


MM_ITERS = 12


PACK_SEQ_LEN = 2048


CURATE_MIN_STOP = 0.05   # stopword-ratio floor (on 6-dp-rounded values)
CURATE_MIN_TOKENS = 20   # token-count floor


TOP_BIGRAMS_K = 20


HIST_LO = 0
HIST_WIDTH = 5_000_000   # $50k bins in cents
HIST_BINS = 12


def _q_price_histogram(sf_dir: str):
    """Equi-width histogram (ops.int_histogram): order totals in cents
    into $50k bins — one length-n_bins bincount partial per block,
    zero shuffle, driver folds vectors not rows."""
    import ray.data as rd

    from essentials_rd.ops import int_histogram

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        return pa.table(
            {"cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64))}
        )

    return int_histogram(orders.map_batches(_cents, batch_format="pyarrow"),
                         "cents", HIST_LO, HIST_WIDTH, HIST_BINS)


TSN_M, TSN_SEED = 512, 11


def _q_theil_sen(sf_dir: str):
    """Theil–Sen robust slope of price-vs-quantity
    (mlfit.theil_sen_slope): the median of pairwise slopes — the
    estimator 29% arbitrary outliers can't wreck where one ruins OLS —
    over a fixed-size hash coreset: the 512 smallest-splitmix-hash
    lineitem rows are picked by a distributed bottom-k (layout/cluster
    invariant), all distinct-x pairs form driver-side (O(m²)
    independent of N), each slope quantized to exact
    floor(10⁶·Δcents/Δqty) with Δx>0 by orientation, and the exact
    lower median reported."""
    import ray.data as rd

    from essentials_rd.mlfit import theil_sen_slope
    from essentials_rd.util import np_col

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_orderkey",
                 "l_linenumber"])

    def _project(t: pa.Table) -> pa.Table:
        p = np.asarray(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False), np.float64)
        return pa.table({
            "q": pa.array(np_col(t, "l_quantity").astype(np.int64),
                          pa.int64()),
            "cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64),
                              pa.int64()),
            "rk": pa.array(np_col(t, "l_orderkey") * np.int64(8)
                           + np_col(t, "l_linenumber"), pa.int64()),
        })

    return theil_sen_slope(
        line.map_batches(_project, batch_format="pyarrow"),
        "q", "cents", lambda t: np_col(t, "rk"),
        m=TSN_M, seed=TSN_SEED)


def _theil_sen_sql() -> str:
    mix = (TSN_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes(
        "tsn", "q, cents, rk", f"rk + {mix}",
        "(SELECT CAST(l_quantity AS BIGINT) AS q, "
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents, "
        "l_orderkey * 8 + l_linenumber AS rk FROM lineitem)")
    return (
        f"WITH {chain}, "
        # tie-break through (rk, q, cents): rk is NOT unique in the
        # sf lineitem, so the payload must join the total order
        f"samp AS (SELECT q, cents FROM tsn3 ORDER BY z, rk, q, cents "
        f"LIMIT {TSN_M}), "
        "pr AS (SELECT b.cents - a.cents AS dy, b.q - a.q AS dx "
        "FROM samp a JOIN samp b ON a.q < b.q), "
        # DuckDB // truncates; numpy floors — recover floor via the
        # %-wrap identity (valid because dx > 0 by pair orientation)
        "sl AS (SELECT CAST((dy * 1000000 - (((dy * 1000000) % dx) + dx) "
        "% dx) // dx AS BIGINT) AS s FROM pr), "
        "st AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM sl), "
        "mr AS (SELECT CAST(count(*) AS BIGINT) AS m_rows FROM samp), "
        "med AS (SELECT s FROM sl ORDER BY s LIMIT 1 OFFSET "
        "greatest((SELECT (n_pairs - 1) // 2 FROM st), 0)) "
        "SELECT mr.m_rows, st.n_pairs, "
        "CAST(COALESCE((SELECT s FROM med), 0) AS BIGINT) AS slope_q "
        "FROM mr, st"
    )


def _q_qty_price_trend(sf_dir: str):
    """Per-group linear-regression slope as an EXACT rational, derived
    from grouped_comoments: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    with both numerator and denominator exact int64 — the drift/trend
    signal without float-accumulation hash risk."""
    t = _q_qty_price_comoments(sf_dir)
    n = np.asarray(t["n"], np.int64)
    sx = np.asarray(t["sum_x"], np.int64)
    sy = np.asarray(t["sum_y"], np.int64)
    sxx = np.asarray(t["sum_xx"], np.int64)
    sxy = np.asarray(t["sum_xy"], np.int64)
    return pa.table(
        {
            "l_returnflag": t["l_returnflag"],
            "num": pa.array(n * sxy - sx * sy, pa.int64()),
            "den": pa.array(n * sxx - sx * sx, pa.int64()),
        }
    )


SPLIT_FRACS = [0.8, 0.1, 0.1]
SPLIT_LABELS = ["train", "val", "test"]


def _split_thresholds() -> list[int]:
    # the ENGINE's exact uint64 thresholds, shared with the SQL twin
    cum = np.cumsum(SPLIT_FRACS)[:-1]
    return [int(t) for t in (cum * float(2**64 - 1)).astype(np.uint64)]


REP_K = 5


DECAY_CLAMP = 40  # max age in days: 2^-40 keeps every sum exactly representable


WS_NUM, WS_DEN = 1, 600  # inclusion probability = min(1, n_chars/600)


def _q_weighted_docs(sf_dir: str):
    """Weight-proportional deterministic sampling (ops.weighted_sample):
    docs kept with probability min(1, n_chars/600) — importance
    sampling by length as an exact RATIONAL threshold on
    splitmix64(doc_id ^ seed), reproducible by the SQL twin in
    HUGEINT arithmetic.  Zero shuffle."""
    import ray.data as rd

    from essentials_rd.ops import weighted_sample
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    return weighted_sample(
        docs,
        key_fn=lambda b: np_col(b, "doc_id"),
        weight_fn=lambda b: np_col(b, "n_chars"),
        rate_num=WS_NUM, rate_den=WS_DEN, seed=SAMPLE_SEED,
    )


def _weighted_docs_sql() -> str:
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes("wz", "doc_id, n_chars", f"doc_id + {mix}",
                       "documents")
    two64 = 1 << 64
    return (
        f"WITH {chain} SELECT doc_id, n_chars FROM wz3 "
        f"WHERE CAST(z AS HUGEINT) < least(CAST('{two64 - 1}' AS HUGEINT), "
        f"CAST(n_chars AS HUGEINT) * {WS_NUM} * "
        f"CAST('{two64}' AS HUGEINT) // {WS_DEN}) ORDER BY doc_id"
    )


def _q_decayed_activity(sf_dir: str):
    """Recency-weighted user activity: Σ 2^(−age_days) per user, ages
    clamped at 40 from the GLOBAL max event day — every term is a
    dyadic float and the clamped exponent range keeps all partial sums
    within 53 bits, so the float result is EXACTLY order-independent
    (the rare float aggregate that hash-matches without quantization).
    Two passes: a tiny max-reduce for the anchor, then per-block
    partial sums folded through one bucketed combine."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def _days(t: pa.Table) -> pa.Table:
        d = (np.asarray(t.column("ts").cast(pa.int64()))
             // 86_400_000_000).astype(np.int64)
        return pa.table({"user_id": t.column("user_id").cast(pa.int64()),
                         "day": pa.array(d, pa.int64())})

    days = ev.map_batches(_days, batch_format="pyarrow").materialize()
    anchor = int(days.max("day"))

    def _partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        u = np_col(t, "user_id")
        age = np.minimum(anchor - np_col(t, "day"), DECAY_CLAMP)
        w = np.ldexp(1.0, -age.astype(np.int64))
        df = pd.DataFrame({"user_id": u, "__w__": w})
        g = df.groupby("user_id", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False
                                    ).replace_schema_metadata()

    return grouped_pandas_agg(
        days.map_batches(_partial, batch_format="pyarrow"),
        keys=["user_id"],
        aggs={"activity": ("__w__", "sum")},
        key_fn=lambda b: np_col(b, "user_id"),
        num_buckets=16,
    )


def _decayed_activity_sql() -> str:
    return (
        "WITH d AS (SELECT user_id, "
        "epoch_us(ts) // 86400000000 AS day FROM events), "
        "a AS (SELECT max(day) AS m FROM d) "
        "SELECT user_id, CAST(sum(pow(2.0, "
        f"-least((SELECT m FROM a) - day, {DECAY_CLAMP}))) AS DOUBLE) "
        "AS activity FROM d GROUP BY user_id ORDER BY user_id"
    )


def _q_doc_repetition(sf_dir: str):
    """k-gram repetition quality signal (textops.repetition_stats):
    per doc the total and DISTINCT token 5-gram counts — low
    distinct/total flags boilerplate/looped text (the Gopher-family
    filter).  Exact string distinct, stateless scan."""
    import ray.data as rd

    from essentials_rd.textops import repetition_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return repetition_stats(docs, k=REP_K)


SPAN_W = 6  # duplicated-span gram width (tokens)


def _q_dup_span_coverage(sf_dir: str):
    """Cross-document duplicated-span coverage (textops.
    dup_span_coverage): per doc the token positions opening a
    SPAN_W-gram that also occurs in ANOTHER doc — the substring-level
    dedup audit (Lee et al. 2022) that surfaces boilerplate and
    copy-paste chains whole-doc Jaccard misses.  Exact gram strings
    end to end (no hash anywhere), one gram-bucketed df aggregate +
    one partitioned join + one per-doc sum."""
    import ray.data as rd

    from essentials_rd.textops import dup_span_coverage

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return dup_span_coverage(docs, width=SPAN_W)


def _dup_span_sql() -> str:
    w = SPAN_W
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS MATERIALIZED (
  SELECT doc_id, array_to_string(toks[i.i:i.i + {w - 1}], ' ') AS gram
  FROM t, LATERAL (SELECT unnest(range(1, len(toks) - {w} + 2)) AS i) i
),
dg AS MATERIALIZED (
  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2
),
dfx AS (SELECT gram, count(*) AS df FROM dg GROUP BY 1),
np AS (SELECT doc_id, count(*) AS n_pos FROM g GROUP BY 1),
dup AS (
  SELECT dg.doc_id, sum(dg.cnt) AS n_dup FROM dg
  JOIN dfx USING (gram) WHERE dfx.df >= 2 GROUP BY 1
)
SELECT d.doc_id, CAST(COALESCE(np.n_pos, 0) AS BIGINT) AS n_pos,
  CAST(COALESCE(dup.n_dup, 0) AS BIGINT) AS n_dup_pos
FROM documents d LEFT JOIN np USING (doc_id) LEFT JOIN dup USING (doc_id)"""


def _q_attribution(sf_dir: str):
    """Last-touch attribution (windows.last_touch_attribution): for
    every purchase, the most recent strictly-prior click of the same
    user under the (ts, event_id) total order — the per-user ASOF
    self-join marketing attribution needs; one user-bucketed exchange,
    segmented running arg-max kernel (band-offset accumulate, no row
    loop), -1 sentinels for unattributed conversions."""
    import ray.data as rd

    from essentials_rd.windows import last_touch_attribution

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])
    return last_touch_attribution(ev, src_type="click",
                                  conv_type="purchase")


_ATTRIBUTION_SQL = """
WITH e AS (SELECT event_id, user_id,
                  CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type
           FROM events WHERE event_type IN ('click', 'purchase')),
m AS (SELECT event_id, user_id, ts_us, event_type,
        last_value(CASE WHEN event_type = 'click' THEN event_id END
                   IGNORE NULLS) OVER w AS src_eid,
        last_value(CASE WHEN event_type = 'click' THEN ts_us END
                   IGNORE NULLS) OVER w AS src_ts
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT event_id, user_id,
       CAST(COALESCE(src_eid, -1) AS BIGINT) AS src_event_id,
       CAST(COALESCE(ts_us - src_ts, -1) AS BIGINT) AS gap_us
FROM m WHERE event_type = 'purchase'
"""


KC_K = 5
KC_SCALE = 1_000_000


def _q_kcenter(sf_dir: str):
    """Gonzalez farthest-point k-center selection (ann.kcenter_select):
    pick 5 maximally-spread exemplars from the embedding table — the
    coreset / diversity-selection curation step — with EXACT int64
    squared-L2 distances over floor(x·1e6)-quantized components, seed
    = smallest vec_id, winner rank (d² DESC, vec_id ASC).  Each round
    is one fully-parallel scan with the ≤ k·d-int selected matrix
    broadcast and per-block top-1 partials."""
    import ray.data as rd

    from essentials_rd.ann import kcenter_select

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    return kcenter_select(vecs, k=KC_K, scale=KC_SCALE)


def _kcenter_sql() -> str:
    steps = [
        "kex AS MATERIALIZED (SELECT vec_id, j.j AS j, "
        f"CAST(floor(embedding[j.j] * {KC_SCALE}) AS BIGINT) AS q "
        "FROM embeddings, LATERAL "
        "(SELECT unnest(range(1, len(embedding) + 1)) AS j) j)",
        "kw0 AS (SELECT min(vec_id) AS vid FROM embeddings)",
        "ksel0 AS (SELECT vid FROM kw0)",
    ]
    for r in range(KC_K - 1):
        w = f"kw{r}" if r == 0 else f"kw{r}"
        steps.append(
            f"kdist{r} AS MATERIALIZED (SELECT a.vec_id, "
            f"CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d2 "
            f"FROM kex a JOIN kex b ON b.vec_id = "
            f"(SELECT vid FROM {w}) AND b.j = a.j GROUP BY a.vec_id)")
        if r == 0:
            steps.append("kmind0 AS (SELECT vec_id, d2 FROM kdist0)")
        else:
            steps.append(
                f"kmind{r} AS (SELECT m.vec_id, least(m.d2, d.d2) AS d2 "
                f"FROM kmind{r - 1} m JOIN kdist{r} d USING (vec_id))")
        steps.append(
            f"kw{r + 1} AS (SELECT vec_id AS vid, d2 FROM kmind{r} "
            f"WHERE vec_id NOT IN (SELECT vid FROM ksel{r}) "
            f"ORDER BY d2 DESC, vec_id ASC LIMIT 1)")
        steps.append(
            f"ksel{r + 1} AS (SELECT vid FROM ksel{r} "
            f"UNION ALL SELECT vid FROM kw{r + 1})")
    sel = " UNION ALL ".join(
        ["SELECT 0 AS sel_round, vid AS vec_id, "
         "CAST(0 AS BIGINT) AS d2 FROM kw0"]
        + [f"SELECT {r}, vid, d2 FROM kw{r}"
           for r in range(1, KC_K)])
    return (f"WITH {', '.join(steps)} "
            f"SELECT * FROM ({sel}) ORDER BY sel_round")


BPE_ROUNDS = 6


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE merge training (textops.bpe_train_rounds,
    Sennrich et al. 2016): 6 greedy merge rounds over the documents
    corpus — the corpus is scanned ONCE into the (word, count) table
    and every round touches only that vocabulary-bounded table (one
    weighted pair-count exchange emitting per-bucket top-1 partials,
    one replace rewrite with a fresh U+E000+r placeholder).  The
    oracle replays every round — winner selection AND the rewritten
    vocabulary — via substr/replace SQL, whose leftmost-non-
    overlapping semantics match Python/Arrow exactly."""
    import ray.data as rd

    from essentials_rd.textops import bpe_train_rounds

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return bpe_train_rounds(docs, rounds=BPE_ROUNDS)


def _bpe_sql() -> str:
    steps = [
        "bw AS MATERIALIZED (SELECT w AS t, CAST(count(*) AS BIGINT)"
        " AS cnt FROM (SELECT unnest(string_split(text, ' ')) AS w"
        " FROM documents) WHERE w <> '' GROUP BY w)",
        "bd0 AS (SELECT t, cnt FROM bw)",
    ]
    for r in range(BPE_ROUNDS):
        steps.append(
            f"bp{r} AS MATERIALIZED (SELECT substr(t, i.i, 2) AS pr,"
            f" cnt FROM bd{r}, LATERAL (SELECT"
            f" unnest(range(1, length(t))) AS i) i)")
        steps.append(
            f"bwin{r} AS MATERIALIZED (SELECT pr,"
            f" CAST(sum(cnt) AS BIGINT) AS c FROM bp{r}"
            f" GROUP BY pr ORDER BY c DESC, pr ASC LIMIT 1)")
        steps.append(
            f"bd{r + 1} AS MATERIALIZED (SELECT replace(t,"
            f" (SELECT pr FROM bwin{r}), chr({0xE000 + r})) AS t,"
            f" cnt FROM bd{r})")
    sel = " UNION ALL ".join(
        f'SELECT {r} AS "round", pr AS pair, c AS cnt FROM bwin{r}'
        for r in range(BPE_ROUNDS))
    return (f"WITH {', '.join(steps)} "
            f'SELECT * FROM ({sel}) ORDER BY "round"')


KANON_K = 5
LDIV_L = 3
BAND_CENTS = 100_000  # $1000 sensitive-value bands
BAND_OFF = 10**9      # shift cents positive so // is floor in BOTH engines


def _q_privacy_audit(sf_dir: str):
    """k-anonymity + l-diversity audit: per quasi-identifier class
    (nation, mktsegment) the member count n and the number l of
    distinct sensitive-value bands ($1000 acctbal buckets), plus the
    k>=5 / l>=3 release flags — the re-identification screen a data
    release runs before publishing.  One bucketed exchange on the
    class key; the distinct-within-group count is a lexsort +
    boundary-compare kernel.  Cents are shifted positive before the
    band division so floor-vs-truncate semantics can never diverge
    between numpy and SQL."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"])

    def _project(t: pa.Table) -> pa.Table:
        cents = np.floor(np_col(t, "c_acctbal") * 100.0 + 0.5
                         ).astype(np.int64)
        assert (cents > -BAND_OFF).all()
        band = (cents + BAND_OFF) // BAND_CENTS
        return pa.table({
            "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
            "c_mktsegment": t.column("c_mktsegment"),
            "band": pa.array(band, pa.int64()),
        })

    def _audit(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({
                "c_nationkey": pa.array([], pa.int64()),
                "c_mktsegment": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "l": pa.array([], pa.int64()),
                "k_ok": pa.array([], pa.bool_()),
                "l_ok": pa.array([], pa.bool_()),
            })
        nat = np_col(grp, "c_nationkey")
        seg_arr = grp.column("c_mktsegment").combine_chunks()
        segc = np.asarray(
            seg_arr.dictionary_encode().indices).astype(np.int64)
        band = np_col(grp, "band")
        order = np.lexsort((band, segc, nat))
        natS, segS, bd = nat[order], segc[order], band[order]
        newg = np.r_[True,
                     (natS[1:] != natS[:-1]) | (segS[1:] != segS[:-1])]
        starts = np.flatnonzero(newg)
        n = np.diff(np.r_[starts, len(natS)]).astype(np.int64)
        newband = newg | np.r_[True, bd[1:] != bd[:-1]]
        cs = np.r_[np.int64(0), np.cumsum(newband.astype(np.int64))]
        ends = np.r_[starts[1:], len(natS)]
        l = cs[ends] - cs[starts]
        first = order[starts]
        return pa.table({
            "c_nationkey": pa.array(nat[first], pa.int64()),
            "c_mktsegment": seg_arr.take(pa.array(first)),
            "n": pa.array(n, pa.int64()),
            "l": pa.array(l, pa.int64()),
            "k_ok": pa.array(n >= KANON_K, pa.bool_()),
            "l_ok": pa.array(l >= LDIV_L, pa.bool_()),
        })

    proj = cust.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        proj,
        lambda t: (np.asarray(_str_hash(t.column("c_mktsegment")))
                   .astype(np.int64) * np.int64(31)
                   + np_col(t, "c_nationkey")),
        _audit,
        num_buckets=16,
    )


def _privacy_audit_sql() -> str:
    return (
        "SELECT c_nationkey, c_mktsegment, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(count(DISTINCT (CAST(floor(c_acctbal * 100 + 0.5) AS "
        f"BIGINT) + {BAND_OFF}) // {BAND_CENTS}) AS BIGINT) AS l, "
        f"count(*) >= {KANON_K} AS k_ok, "
        "count(DISTINCT (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) "
        f"+ {BAND_OFF}) // {BAND_CENTS}) >= {LDIV_L} AS l_ok "
        "FROM customer GROUP BY 1, 2"
    )


def _q_doc_splits(sf_dir: str):
    """Deterministic train/val/test assignment (ops.split_assign):
    thresholds on splitmix64(doc_id ^ seed-mix) — identical across
    runs, layouts, cluster sizes and across any table keyed by doc_id
    (leakage-safe joins).  Zero shuffle."""
    import ray.data as rd

    from essentials_rd.ops import split_assign
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    return split_assign(docs, SPLIT_FRACS, SPLIT_LABELS,
                        key_fn=lambda b: np_col(b, "doc_id"),
                        seed=SAMPLE_SEED)


def _doc_splits_sql() -> str:
    t1, t2 = _split_thresholds()
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes("sz", "doc_id", f"doc_id + {mix}", "documents")
    return (
        f"WITH {chain} SELECT doc_id, "
        f"CASE WHEN z < CAST('{t1}' AS UBIGINT) THEN 'train' "
        f"WHEN z < CAST('{t2}' AS UBIGINT) THEN 'val' "
        f"ELSE 'test' END AS split FROM sz3 ORDER BY doc_id"
    )


def _q_leakage_splits(sf_dir: str):
    """LEAKAGE-SAFE train/val/test assignment: the split key is the
    near-duplicate CLUSTER (min doc_id of the verified-Jaccard
    component; a doc in no pair is its own cluster), so near-dups can
    never straddle a split boundary — the contamination mode plain
    per-doc splitting (doc_splits) cannot prevent.  Exact pair graph →
    hash-min CC engine → one partitioned left join ships labels back
    to the corpus → splitmix64 thresholds on the cluster id.  Output:
    (doc_id, cluster, split)."""
    import ray.data as rd

    from essentials_rd.ops import join, split_assign
    from essentials_rd.pipelines import _work_dir
    from essentials_rd.textops import near_dup_clusters
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    t = near_dup_clusters(docs, _work_dir("lsplit"), threshold=JACCARD_T,
                          shingle_k=SHINGLE_K, exact=True)
    labels = rd.from_arrow(t.select(["doc_id", "cluster"]))
    joined = join(docs.select_columns(["doc_id"]), labels, on="doc_id",
                  how="left", broadcast=False)

    def _coalesce(b: pa.Table) -> pa.Table:
        ids = np_col(b, "doc_id")
        c = b.column("cluster").to_numpy(zero_copy_only=False)
        c = np.asarray(c, np.float64)
        cl = np.where(np.isnan(c), ids, c).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "cluster": pa.array(cl, pa.int64())})

    keyed = joined.map_batches(_coalesce, batch_format="pyarrow")
    return split_assign(keyed, SPLIT_FRACS, SPLIT_LABELS,
                        key_fn=lambda b: np_col(b, "cluster"),
                        seed=SAMPLE_SEED)


def _leakage_splits_sql() -> str:
    t1, t2 = _split_thresholds()
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes("lsz", "doc_id, cluster", f"cluster + {mix}", "lab")
    return (
        f"WITH {_SHINGLE_CTE}, {_dup_cc_body()}, "
        f"lab AS (SELECT d.doc_id, "
        f"COALESCE(x.label, d.doc_id) AS cluster FROM documents d "
        f"LEFT JOIN x{DUP_CC_ITERS} x ON x.vid = d.doc_id), "
        f"{chain} SELECT doc_id, cluster, "
        f"CASE WHEN z < CAST('{t1}' AS UBIGINT) THEN 'train' "
        f"WHEN z < CAST('{t2}' AS UBIGINT) THEN 'val' "
        f"ELSE 'test' END AS split FROM lsz3"
    )


def _q_user_gap_median(sf_dir: str):
    """Window + quantile composition: per-user MEDIAN inter-event gap
    in microseconds — lag_diff's (ts,id)-ordered gaps feed
    grouped_quantiles (quantile_disc semantics), all integer-exact."""
    import ray.data as rd

    from essentials_rd.ops import grouped_quantiles
    from essentials_rd.windows import lag_diff

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    gaps = lag_diff(ev).filter(expr="gap_us >= 0")
    out = grouped_quantiles(gaps, "user_id", "gap_us", [0.5])
    return out.map_batches(
        lambda t: t.select(["user_id", "value"]).rename_columns(
            ["user_id", "median_gap_us"]),
        batch_format="pyarrow",
    )


VOCAB_COVER = 0.9


def _q_vocab_coverage(sf_dir: str):
    """Vocabulary coverage analysis on ops.global_cumsum: distinct
    corpus tokens ordered by (count desc, token) with an exact
    exclusive prefix sum — the row set with prefix < 90% of total
    token mass IS the minimal covering vocabulary (Zipf head).
    Returns its size and token mass as one row."""
    import ray.data as rd

    from essentials_rd.ops import global_cumsum, hash_bucket_agg
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _toks(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas()
        flat = s.str.split(" ").explode()
        vc = flat.value_counts()
        return pa.table({"tok": pa.array(vc.index.to_numpy(object).tolist(),
                                         pa.string()),
                         "c": pa.array(vc.to_numpy(np.int64), pa.int64())})

    from essentials_rd.derive import _str_hash

    def _sum(grp: pa.Table) -> pa.Table:
        import pandas as pd

        df = grp.to_pandas().groupby("tok", as_index=False)["c"].sum()
        return pa.Table.from_pandas(df, preserve_index=False
                                    ).replace_schema_metadata()

    counts = hash_bucket_agg(
        docs.map_batches(_toks, batch_format="pyarrow"),
        lambda b: np.asarray(_str_hash(b.column("tok"))),
        _sum,
    )

    def _negc(t: pa.Table) -> pa.Table:
        return t.append_column(
            "negc", pa.array(-np_col(t, "c"), pa.int64()))

    pref = global_cumsum(
        counts.map_batches(_negc, batch_format="pyarrow"),
        "negc", ["tok"], "c",
        key_fn=lambda b: np_col(b, "negc"),
        out_col="prefix",
    )

    def _head(t: pa.Table) -> pa.Table:
        # total token mass is known only after the fact; emit partials
        c = np_col(t, "c")
        p = np_col(t, "prefix")
        return pa.table({"c": pa.array(c, pa.int64()),
                         "p": pa.array(p, pa.int64())})

    rows = pref.map_batches(_head, batch_format="pyarrow").take_all()
    c = np.array([r["c"] for r in rows], np.int64)
    p = np.array([r["p"] for r in rows], np.int64)
    total = int(c.sum())
    cut = VOCAB_COVER * total
    mask = p < cut
    return pa.table(
        {
            "n_vocab": pa.array([int(mask.sum())], pa.int64()),
            "covered_mass": pa.array([int(c[mask].sum())], pa.int64()),
            "total_mass": pa.array([total], pa.int64()),
        }
    )


PMI_K, PMI_MIN = 20, 5


def _q_pmi_bigrams(sf_dir: str):
    """PMI collocation ranking (textops.pmi_bigrams): top-20 bigrams
    with support ≥ 5 by the exact integer PMI quantization
    ⌊10⁶·co·Nu²/(Nb·ca·cb)⌋ — monotone in PMI so the log never enters;
    Python-int products so no overflow at any corpus size; ties to the
    bigram string.  Shared bucketed bigram/unigram counts + two
    string-keyed partitioned margin joins + distributed top-k."""
    import ray.data as rd

    from essentials_rd.textops import pmi_bigrams

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return pmi_bigrams(docs, k=PMI_K, min_count=PMI_MIN)


def _pmi_bigrams_sql() -> str:
    return (
        "WITH uni AS (SELECT w AS tok, CAST(count(*) AS BIGINT) AS n "
        "FROM (SELECT unnest(string_split(text, ' ')) AS w "
        "FROM documents) GROUP BY 1), "
        "bgc AS (SELECT bg, CAST(count(*) AS BIGINT) AS co FROM ("
        "SELECT t[i.i] || ' ' || t[i.i + 1] AS bg FROM "
        "(SELECT string_split(text, ' ') AS t FROM documents) toks, "
        "LATERAL (SELECT unnest(range(1, len(t))) AS i) i) "
        f"GROUP BY bg HAVING count(*) >= {PMI_MIN}), "
        "nu AS (SELECT CAST(sum(n) AS HUGEINT) AS v FROM uni), "
        "nb AS (SELECT CAST(count(*) AS HUGEINT) AS v FROM ("
        "SELECT t[i.i] FROM (SELECT string_split(text, ' ') AS t "
        "FROM documents) toks, LATERAL (SELECT unnest(range(1, len(t))) "
        "AS i) i)), "
        "sc AS (SELECT g.bg, g.co, a.n AS ca, b.n AS cb, "
        "CAST((CAST(g.co AS HUGEINT) * nu.v * nu.v * 1000000) "
        "// (nb.v * a.n * b.n) AS BIGINT) AS q "
        "FROM bgc g JOIN uni a ON a.tok = split_part(g.bg, ' ', 1) "
        "JOIN uni b ON b.tok = substr(g.bg, strpos(g.bg, ' ') + 1), "
        "nu, nb) "
        "SELECT bg, co, ca, cb, q FROM (SELECT *, row_number() OVER "
        "(ORDER BY q DESC, bg) AS rn FROM sc) "
        f"WHERE rn <= {PMI_K} ORDER BY q DESC, bg"
    )


def _q_top_bigrams(sf_dir: str):
    """Global top-k corpus bigrams (textops.top_bigrams): distributed
    bigram count (vocabulary never driver-collected) + per-block
    partial top-k merged driver-side, bigram string as the
    deterministic tie-break at the k-boundary."""
    import ray.data as rd

    from essentials_rd.textops import top_bigrams

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return top_bigrams(docs, TOP_BIGRAMS_K)


def _q_curated_docs(sf_dir: str):
    """END-TO-END training-data curation pipeline, one query: keep a
    doc iff it (1) passes the quality gate (stopword_ratio ≥ 0.05 on
    the 6-dp-rounded signal, ≥ 20 tokens), (2) language-ID agrees with
    its label (integer-weight argmax, SQL-exact), and (3) is its
    near-dup cluster's representative (min doc_id) or unclustered —
    quality_score + lang_id + near_dup_clusters + semi-joins composed
    end to end, every stage the already-oracle-checked operator."""
    import ray
    import ray.data as rd

    from essentials_rd.ops import join
    from essentials_rd.pipelines import _work_dir
    from essentials_rd.textops import (
        build_lang_profiles, lang_id, near_dup_clusters, quality_score,
    )
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"]).materialize()

    def _qmask(t: pa.Table) -> pa.Table:
        sr = np_col(t, "stopword_ratio")
        nt = np_col(t, "n_tokens")
        keep = (sr >= CURATE_MIN_STOP) & (nt >= CURATE_MIN_TOKENS)
        return t.select(["doc_id"]).filter(pa.array(keep))

    qual_ok = quality_score(docs).map_batches(_qmask,
                                              batch_format="pyarrow")

    prof = build_lang_profiles(docs, top_k=LANG_TOPK)

    def _lmask(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.equal(t.column("pred_lang"), t.column("lang"))
        return t.select(["doc_id"]).filter(keep)

    lang_ok = lang_id(docs, ray.put(prof)).map_batches(
        _lmask, batch_format="pyarrow")

    cl = near_dup_clusters(docs, _work_dir("curate"), threshold=JACCARD_T,
                           shingle_k=SHINGLE_K, exact=True)
    nonrep = np.sort(
        np.asarray(cl["doc_id"], np.int64)[
            np.asarray(cl["doc_id"], np.int64)
            != np.asarray(cl["cluster"], np.int64)
        ]
    )
    nref = ray.put(nonrep)

    kept = join(docs.select_columns(["doc_id", "lang"]), qual_ok,
                on="doc_id", how="semi", broadcast=False)
    kept = join(kept, lang_ok, on="doc_id", how="semi", broadcast=False)

    def _drop_nonrep(t: pa.Table) -> pa.Table:
        bad = ray.get(nref)
        did = np_col(t, "doc_id")
        if not len(bad):
            return t
        pos = np.searchsorted(bad, did)
        hit = (pos < len(bad)) & (bad[np.minimum(pos, len(bad) - 1)] == did)
        return t.filter(pa.array(~hit))

    return kept.map_batches(_drop_nonrep, batch_format="pyarrow")


def _curated_docs_sql() -> str:
    return (
        f"WITH {_SHINGLE_CTE}, {_dup_cc_body()}, {_lang_ctes()}, "
        f"nonrep AS (SELECT vid FROM x{DUP_CC_ITERS} WHERE vid <> label), "
        "q AS (SELECT doc_id FROM documents WHERE "
        "round(CAST(len(list_filter(string_split(text, ' '), t -> "
        "list_contains(['the','a','an','of','to','in','and','is','for'], "
        f"t))) AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6) "
        f">= {CURATE_MIN_STOP} "
        f"AND len(string_split(text, ' ')) >= {CURATE_MIN_TOKENS}), "
        "lp AS (SELECT d.doc_id FROM documents d LEFT JOIN best b "
        "ON b.doc_id = d.doc_id WHERE COALESCE(b.plang, "
        "(SELECT min(lang) FROM documents)) = d.lang) "
        "SELECT d.doc_id, d.lang FROM documents d "
        "JOIN q USING (doc_id) JOIN lp ON lp.doc_id = d.doc_id "
        "LEFT JOIN nonrep v ON v.vid = d.doc_id WHERE v.vid IS NULL "
        "ORDER BY d.doc_id"
    )


def _q_doc_packing(sf_dir: str):
    """Sequence-packing manifest (textops.pack_sequences over
    ops.global_cumsum): docs concatenated in id order into one token
    stream split into 2048-token windows — each doc's exact (offset,
    first_seq, last_seq) placement, a pure function of the ordered
    counts (greedy bin packing would be partitioning-dependent).
    Token counts use the whitespace rule shared with the twin."""
    import ray.data as rd

    from essentials_rd.textops import pack_sequences, token_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    cts = token_counts(docs).select_columns(["doc_id", "n_ws_tokens"])
    return pack_sequences(cts, PACK_SEQ_LEN, n_col="n_ws_tokens")


def _q_daily_top_spender(sf_dir: str):
    """Two-stage composition: exact per-(day, user) cent totals
    (grouped_pandas_agg with per-block partials) feed grouped_top_k for
    the top spender per day under the (total desc, user asc) total
    order — the daily-leaderboard shape, all integer-exact."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, grouped_top_k
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.cast(pc.floor(pc.divide(
            pc.cast(t.column("ts"), pa.int64()), 86_400_000_000)),
            pa.int64())
        v = np.asarray(t.column("value").to_numpy(zero_copy_only=False),
                       np.float64)
        return pa.table(
            {
                "day": day,
                "user_id": t.column("user_id").cast(pa.int64()),
                "cents": pa.array(np.floor(v * 100.0).astype(np.int64)),
            }
        )

    totals = grouped_pandas_agg(
        ev.map_batches(_prep, batch_format="pyarrow"),
        keys=["day", "user_id"],
        aggs={"total_c": ("cents", "sum")},
        key_fn=lambda b: np_col(b, "day") * np.int64(100003)
        + np_col(b, "user_id"),
        num_buckets=16,
    )
    out = grouped_top_k(totals, ["day"], "total_c", 1, descending=True,
                        tie_cols=["user_id"],
                        key_fn=lambda b: np_col(b, "day"), num_buckets=16)
    return out.drop_columns(["rank"])


def _q_matching(sf_dir: str):
    """Deterministic maximal matching (algorithms.maximal_matching):
    local-minimum-priority edge rounds — provably equal to the
    sequential greedy matching under the (splitmix64, src, dst) edge
    order, hence a pure function of the graph; per round one partial
    min pass + one winner/prune pass, alive edges shrink
    geometrically.  Round count asserted against the oracle's unroll
    bound."""
    from essentials_rd.algorithms import maximal_matching

    _, edges = _graph(sf_dir)
    t, rounds, converged = maximal_matching(edges)
    assert converged and rounds <= MM_ITERS, (rounds, converged)
    return t


def _matching_sql() -> str:
    from essentials_rd.algorithms.matching import MM_C

    chain = _sm64_ctes("mz", "src, dst",
                       f"CAST(src AS HUGEINT) * {MM_C} + dst", "pairs")
    steps = [_GRAPH_CTES, chain,
             "ae1 AS MATERIALIZED (SELECT src, dst, z FROM mz3)"]
    for r in range(1, MM_ITERS + 1):
        steps.append(f"""
inc{r} AS (SELECT src AS vtx, z, src, dst FROM ae{r}
  UNION ALL SELECT dst AS vtx, z, src, dst FROM ae{r}),
mp{r} AS MATERIALIZED (SELECT vtx, z, src, dst FROM (
  SELECT vtx, z, src, dst, row_number() OVER (PARTITION BY vtx
    ORDER BY z, src, dst) AS rn FROM inc{r}) WHERE rn = 1),
w{r} AS MATERIALIZED (SELECT e.src, e.dst FROM ae{r} e
  JOIN mp{r} a ON a.vtx = e.src AND a.z = e.z
    AND a.src = e.src AND a.dst = e.dst
  JOIN mp{r} b ON b.vtx = e.dst AND b.z = e.z
    AND b.src = e.src AND b.dst = e.dst),
mv{r} AS (SELECT src AS vid FROM w{r}
  UNION SELECT dst AS vid FROM w{r}),
ae{r + 1} AS MATERIALIZED (SELECT e.src, e.dst, e.z FROM ae{r} e
  LEFT JOIN mv{r} x ON x.vid = e.src
  LEFT JOIN mv{r} y ON y.vid = e.dst
  WHERE x.vid IS NULL AND y.vid IS NULL)""")
    body = ",".join(steps)
    union = " UNION ALL ".join(
        f"SELECT src, dst, {r} AS round FROM w{r}"
        for r in range(1, MM_ITERS + 1)
    )
    return (
        f"WITH {body} SELECT src, dst, CAST(round AS BIGINT) AS round "
        f"FROM ({union}) ORDER BY src, dst"
    )


WM_ITERS = 12


def _q_weighted_matching(sf_dir: str):
    """Greedy WEIGHTED matching (algorithms.weighted_matching —
    Hoepman/Preis local-max rounds): an edge matches iff it is the
    best at BOTH endpoints under (co-purchase weight DESC, splitmix hash, src, dst) — the hash tie-break keeps rounds O(log) where tie-heavy weights would serialize;
    the fixpoint provably equals the sequential greedy scan in that
    order — the ½-approximation to maximum-weight matching — computed
    in O(log) broadcast-fold rounds, each one partial-max pass + one
    winner/prune pass.  Round count asserted against the oracle's
    unroll bound."""
    import ray.data as rd

    from essentials_rd.algorithms.matching import weighted_matching
    from essentials_rd.pipelines import copurchase_edges
    from essentials_rd.util import np_col

    edges = copurchase_edges(sf_dir)

    def _int_w(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("src"), "dst": t.column("dst"),
            "weight": pa.array(
                np_col(t, "weight").astype(np.int64), pa.int64()),
        })

    t, rounds, converged = weighted_matching(
        edges.map_batches(_int_w, batch_format="pyarrow"),
        max_rounds=WM_ITERS)
    assert converged and rounds <= WM_ITERS, (rounds, converged)
    return t


def _weighted_matching_sql() -> str:
    from essentials_rd.algorithms.matching import MM_C

    chain = _sm64_ctes("wz", "src, dst, weight",
                       f"CAST(src AS HUGEINT) * {MM_C} + dst", "pairs")
    steps = [_GRAPH_CTES, chain,
             "we1 AS MATERIALIZED (SELECT src, dst, "
             "CAST(weight AS BIGINT) AS w, z FROM wz3)"]
    for r in range(1, WM_ITERS + 1):
        steps.append(f"""
winc{r} AS (SELECT src AS vtx, src, dst, w, z FROM we{r}
  UNION ALL SELECT dst AS vtx, src, dst, w, z FROM we{r}),
wbp{r} AS MATERIALIZED (SELECT vtx, src, dst, w FROM (
  SELECT vtx, src, dst, w, row_number() OVER (PARTITION BY vtx
    ORDER BY w DESC, z, src, dst) AS rn FROM winc{r}) WHERE rn = 1),
ww{r} AS MATERIALIZED (SELECT e.src, e.dst, e.w FROM we{r} e
  JOIN wbp{r} a ON a.vtx = e.src AND a.src = e.src AND a.dst = e.dst
  JOIN wbp{r} b ON b.vtx = e.dst AND b.src = e.src AND b.dst = e.dst),
wmv{r} AS (SELECT src AS vid FROM ww{r}
  UNION SELECT dst AS vid FROM ww{r}),
we{r + 1} AS MATERIALIZED (SELECT e.src, e.dst, e.w, e.z FROM we{r} e
  LEFT JOIN wmv{r} x ON x.vid = e.src
  LEFT JOIN wmv{r} y ON y.vid = e.dst
  WHERE x.vid IS NULL AND y.vid IS NULL)""")
    body = ",".join(steps)
    union = " UNION ALL ".join(
        f"SELECT src, dst, w, {r} AS round FROM ww{r}"
        for r in range(1, WM_ITERS + 1)
    )
    return (
        f"WITH {body} SELECT src, dst, w, CAST(round AS BIGINT) AS round "
        f"FROM ({union}) ORDER BY src, dst"
    )


def _q_trimmed_qty(sf_dir: str):
    """Exact 10%-trimmed quantity aggregate per return flag
    (ops.trimmed_sum): drop the floor(n/10) smallest and largest
    ranks, sum the middle exactly — the robust mean with no float
    order statistic anywhere; bounded-domain histogram plan, rows
    never move."""
    import ray.data as rd

    from essentials_rd.ops import trimmed_sum
    from essentials_rd.util import np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])

    def _prep(t: pa.Table) -> pa.Table:
        q = np.floor(np.asarray(t.column("l_quantity").to_numpy(
            zero_copy_only=False), np.float64) + 0.5).astype(np.int64)
        return pa.table({"l_returnflag": t.column("l_returnflag"),
                         "v": pa.array(q, pa.int64())})

    return trimmed_sum(li.map_batches(_prep, batch_format="pyarrow"),
                       "l_returnflag", "v", trim_num=1, trim_den=10)


_TRIMMED_QTY_SQL = """
WITH q AS (SELECT l_returnflag AS key,
                  CAST(floor(l_quantity + 0.5) AS BIGINT) AS v
           FROM lineitem),
h AS (SELECT key, v, count(*) AS c FROM q GROUP BY 1, 2),
nn AS (SELECT key, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
w AS (SELECT key, v, c,
             sum(c) OVER (PARTITION BY key ORDER BY v) - c AS cumb
      FROM h)
SELECT w.key AS l_returnflag, nn.n,
       CAST(nn.n // 10 AS BIGINT) AS k_trim,
       CAST(sum(greatest(least(cumb + c, nn.n - nn.n // 10)
                         - greatest(cumb, nn.n // 10), 0) * v)
            AS BIGINT) AS t_sum
FROM w JOIN nn USING (key) GROUP BY 1, 2, 3
"""


def _q_benford(sf_dir: str):
    """Benford first-significant-digit audit over order totals — the
    fraud / synthetic-data screen: exact per-digit counts of the
    leading digit of o_totalprice cents.  Zero shuffles: per-block
    ≤ 9-row partials fold driver-side; the digit extraction is a
    vectorized integer-division loop (≤ 10 passes), no strings and
    no float log10 anywhere."""
    import ray.data as rd

    ords = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_totalprice"])

    def _digits(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        d = np.floor(v * 100.0 + 0.5).astype(np.int64)
        assert (d > 0).all(), "Benford needs positive values"
        while True:
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        uv, cnt = np.unique(d, return_counts=True)
        return pa.table({"digit": pa.array(uv, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    parts = ords.map_batches(_digits, batch_format="pyarrow").take_all()
    tot: dict[int, int] = {}
    for r in parts:
        tot[r["digit"]] = tot.get(r["digit"], 0) + r["n"]
    ks = sorted(tot)
    return pa.table({"digit": pa.array(ks, pa.int64()),
                     "n": pa.array([tot[k] for k in ks], pa.int64())})


_BENFORD_SQL = """
SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                        AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY 1 ORDER BY 1
"""


def _q_vertex_cover(sf_dir: str):
    """2-approximate minimum vertex cover (Gavril): the endpoint set
    of the deterministic maximal matching — every edge is covered
    (maximality) and |cover| = 2·|M| ≤ 2·OPT.  All distributed work
    is the matching's local-minimum rounds; the cover is a distinct
    over its endpoints."""
    from essentials_rd.algorithms.matching import vertex_cover_2approx

    _, edges = _graph(sf_dir)
    return vertex_cover_2approx(edges)


def _vcover_sql() -> str:
    inner = _matching_sql().replace(" ORDER BY src, dst", "")
    return (
        f"WITH vcm AS MATERIALIZED ({inner}) "
        "SELECT DISTINCT vid FROM (SELECT src AS vid FROM vcm "
        "UNION ALL SELECT dst AS vid FROM vcm) ORDER BY vid"
    )


def _q_orders_diff(sf_dir: str):
    """Snapshot diff (ops.table_diff): two deterministic versions of
    orders — A drops every 7th key, B drops every 5th and bumps every
    11th key's cents — classified added/removed/changed in ONE key-hash
    co-shuffle where unchanged keys never leave their bucket (the
    what-changed-between-extracts primitive)."""
    import ray.data as rd

    from essentials_rd.ops import table_diff
    from essentials_rd.util import np_col

    def _load(drop_mod: int, bump11: bool):
        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_totalprice"])

        def _prep(t: pa.Table) -> pa.Table:
            k = np_col(t, "o_orderkey")
            keep = (k % drop_mod) != 0
            p = np.asarray(t.column("o_totalprice").to_numpy(
                zero_copy_only=False), np.float64)
            v = np.floor(p * 100.0 + 0.5).astype(np.int64)
            if bump11:
                v = v + ((k % 11) == 0)
            return pa.table({"k": pa.array(k[keep], pa.int64()),
                             "v": pa.array(v[keep], pa.int64())})

        return orders.map_batches(_prep, batch_format="pyarrow")

    return table_diff(
        _load(7, False), _load(5, True),
        key_fn=lambda t: np_col(t, "k"),
        val_fn=lambda t: np_col(t, "v"),
        key_col="o_orderkey",
    )


def _q_cust_status_history(sf_dir: str):
    """SCD type-2 dimension history (ops.scd2_intervals): orders as a
    per-customer changelog (seq = o_orderkey, unique) → versioned
    status rows with half-open [seq_from, seq_to) validity and an
    is_current flag; every version survives (vs latest_by_key's
    current-row-only compaction)."""
    import ray.data as rd

    from essentials_rd.ops import scd2_intervals
    from essentials_rd.util import np_col

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderstatus"],
    )
    out = scd2_intervals(
        orders, "o_custkey", "o_orderkey",
        lambda b: np_col(b, "o_custkey"),
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            ["o_custkey", "seq_from", "o_orderstatus", "seq_to",
             "is_current"]
        ),
        batch_format="pyarrow",
    )


_CUST_STATUS_HISTORY_SQL = (
    "SELECT o_custkey, o_orderkey AS seq_from, o_orderstatus, "
    "coalesce(lead(o_orderkey) OVER "
    "(PARTITION BY o_custkey ORDER BY o_orderkey), "
    "9223372036854775807) AS seq_to, "
    "CAST(CASE WHEN lead(o_orderkey) OVER "
    "(PARTITION BY o_custkey ORDER BY o_orderkey) IS NULL "
    "THEN 1 ELSE 0 END AS BIGINT) AS is_current "
    "FROM orders"
)


def _q_orders_merged(sf_dir: str):
    """CDC MERGE / log compaction (ops.merge_upsert): a deterministic
    changeset derived from orders itself — updates (k%7: +100 cents,
    seq 1), deletes (k%5, seq 2), later updates that outrank both
    (k%21: +200 cents, seq 3), brand-new inserts (negative keys from
    k%9) and no-op deletes of absent keys (k%13) — applied to the
    keyed snapshot in ONE key-hash co-shuffle with vectorized
    last-writer-wins resolution per bucket.  The oracle replays the
    same log with a window function, so a hash match proves MERGE
    semantics end to end (upsert, delete, seq precedence, insert,
    absent-delete no-op)."""
    import ray.data as rd

    from essentials_rd.ops import merge_upsert
    from essentials_rd.util import np_col

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderstatus"])

    def _snap(t: pa.Table) -> pa.Table:
        k = np_col(t, "o_orderkey")
        p = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64),
                              pa.int64()),
            "status": t.column("o_orderstatus"),
        })

    def _changes(t: pa.Table) -> pa.Table:
        s = _snap(t)
        k, c = np_col(s, "k"), np_col(s, "cents")
        u1 = k % 7 == 0
        d2 = k % 5 == 0
        u3 = k % 21 == 0
        ins = k % 9 == 0
        dn = k % 13 == 0
        ks = np.r_[k[u1], k[d2], k[u3], -2 * k[ins] - 1, -2 * k[dn] - 2]
        cs = np.r_[c[u1] + 100, np.zeros(d2.sum(), np.int64),
                   c[u3] + 200, k[ins], np.zeros(dn.sum(), np.int64)]
        st = (["X"] * int(u1.sum()) + [""] * int(d2.sum())
              + ["Y"] * int(u3.sum()) + ["N"] * int(ins.sum())
              + [""] * int(dn.sum()))
        seq = np.r_[np.full(u1.sum(), 1), np.full(d2.sum(), 2),
                    np.full(u3.sum(), 3), np.full(ins.sum(), 1),
                    np.full(dn.sum(), 1)].astype(np.int64)
        op = (["U"] * int(u1.sum()) + ["D"] * int(d2.sum())
              + ["U"] * int(u3.sum()) + ["U"] * int(ins.sum())
              + ["D"] * int(dn.sum()))
        return pa.table({
            "k": pa.array(ks, pa.int64()),
            "cents": pa.array(cs.astype(np.int64), pa.int64()),
            "status": pa.array(st, pa.string()),
            "seq": pa.array(seq, pa.int64()),
            "op": pa.array(op, pa.string()),
        })

    return merge_upsert(
        orders.map_batches(_snap, batch_format="pyarrow"),
        orders.map_batches(_changes, batch_format="pyarrow"),
        "k")


_ORDERS_MERGED_SQL = """
WITH snap AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderstatus AS status
  FROM orders
), ch AS (
  SELECT k, cents + 100 AS cents, 'X' AS status, 1 AS seq, 'U' AS op
  FROM snap WHERE k % 7 = 0
  UNION ALL SELECT k, 0, '', 2, 'D' FROM snap WHERE k % 5 = 0
  UNION ALL SELECT k, cents + 200, 'Y', 3, 'U' FROM snap WHERE k % 21 = 0
  UNION ALL SELECT -2 * k - 1, k, 'N', 1, 'U' FROM snap WHERE k % 9 = 0
  UNION ALL SELECT -2 * k - 2, 0, '', 1, 'D' FROM snap WHERE k % 13 = 0
), win AS (
  SELECT * FROM ch
  QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1
), kept AS (
  SELECT s.k, s.cents, s.status FROM snap s
  WHERE NOT EXISTS (SELECT 1 FROM win w WHERE w.k = s.k)
)
SELECT k, cents, status FROM kept
UNION ALL
SELECT k, CAST(cents AS BIGINT) AS cents, status FROM win WHERE op = 'U'
ORDER BY k
"""


def _q_substring_search(sf_dir: str):
    """Trigram-index substring search (textops.build_trigram_index +
    substring_search): grep over the corpus WITHOUT scanning it — the
    needle's distinct trigram hashes AND-probe only their postings
    partitions (lossless blocking: a true match contains every gram;
    hash collisions only add candidates), then one id-pruned scan
    verifies contains() exactly and counts occurrences."""
    import ray.data as rd

    from essentials_rd.pipelines import _work_dir
    from essentials_rd.textops import build_trigram_index, substring_search

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    idx = _work_dir("trigram")
    build_trigram_index(docs, idx, num_partitions=GREP_PARTS)
    return substring_search(idx, GREP_PARTS, docs, GREP_NEEDLE)


DICT_TERMS = ["order", "fast", "scan merge", "window window", "zzqx"]


def _q_dict_term_census(sf_dir: str):
    """Multi-pattern dictionary census (textops.dict_term_stats): for
    each blocklist/policy term — including a two-word phrase and a
    deliberately absent term whose zero row is part of the screen's
    result — the corpus-wide NON-OVERLAPPING occurrence total and the
    containing-doc count, in ONE streaming scan with one Arrow
    count_substring C++ sweep per term and a k-int partial per block.
    ZERO shuffles; the content-filter pass of an LLM data pipeline."""
    import ray.data as rd

    from essentials_rd.textops import dict_term_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return dict_term_stats(docs, DICT_TERMS)


def _dict_term_census_sql() -> str:
    sels = []
    for t in DICT_TERMS:
        sels.append(
            f"SELECT '{t}' AS term, "
            f"CAST(COALESCE(SUM((length(text) - "
            f"length(replace(text, '{t}', ''))) // length('{t}')), 0) "
            "AS BIGINT) AS n_occurrences, "
            "CAST(COALESCE(SUM(CASE WHEN contains(text, "
            f"'{t}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_docs "
            "FROM documents")
    return " UNION ALL ".join(sels)


def _q_price_outliers(sf_dir: str):
    """IQR outlier filter, composed from existing operators: exact
    per-priority quartiles of order totals (grouped_quantiles
    cont=True — dyadic q makes q1/q3 bit-exact doubles) drive a Tukey-style
    k·IQR fence, broadcast to one filtering scan.  The fences are
    single IEEE expressions over bit-exact inputs, so the outlier SET
    matches SQL exactly — the distributed anomaly-screen shape."""
    import ray
    import ray.data as rd

    from essentials_rd.ops import grouped_quantiles
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority",
                                      "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        p = np.asarray(t.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "pr": t.column("o_orderpriority"),
                "cents": pa.array(np.floor(p * 100.0 + 0.5).astype(np.int64)),
            }
        )

    cts = orders.map_batches(_cents, batch_format="pyarrow").materialize()
    qs = grouped_quantiles(cts, "pr", "cents", [0.25, 0.75],
                           cont=True).take_all()
    fence = {}
    for r in qs:
        fence.setdefault(r["pr"], {})[r["q"]] = r["value"]
    lo, hi = {}, {}
    for k, d in fence.items():
        iqr = d[0.75] - d[0.25]
        lo[k] = d[0.25] - OUTLIER_K * iqr
        hi[k] = d[0.75] + OUTLIER_K * iqr
    ref = ray.put((lo, hi))

    def _filter(t: pa.Table) -> pa.Table:
        lo_, hi_ = ray.get(ref)
        pr = t.column("pr").to_pylist()
        c = np_col(t, "cents").astype(np.float64)
        lob = np.array([lo_[p] for p in pr])
        hib = np.array([hi_[p] for p in pr])
        keep = (c < lob) | (c > hib)
        return t.filter(pa.array(keep))

    out = cts.map_batches(_filter, batch_format="pyarrow")
    # concat arrow blocks so an empty result keeps its schema
    tabs = ray.get(out.to_arrow_refs())
    return pa.concat_tables(tabs) if tabs else pa.table(
        {"o_orderkey": pa.array([], pa.int64()),
         "pr": pa.array([], pa.string()),
         "cents": pa.array([], pa.int64())})


def _price_outliers_sql() -> str:
    return (
        "WITH c AS MATERIALIZED (SELECT o_orderkey, "
        "o_orderpriority AS pr, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents "
        "FROM orders), "
        "f AS (SELECT pr, quantile_cont(cents, 0.25) AS q1, "
        "quantile_cont(cents, 0.75) AS q3 FROM c GROUP BY pr) "
        "SELECT c.o_orderkey, c.pr, c.cents FROM c JOIN f USING (pr) "
        f"WHERE c.cents < f.q1 - {OUTLIER_K} * (f.q3 - f.q1) "
        f"OR c.cents > f.q3 + {OUTLIER_K} * (f.q3 - f.q1)"
    )


def _q_tpch_q1_cents(sf_dir: str):
    """TPC-H Q1 pricing summary, integer-exact: per (returnflag,
    linestatus) over lineitems shipped by the cutoff — sum_qty,
    sum_base (cents), sum_disc (cents·(100−disc%), 1e-4 dollars) and
    sum_charge (·(100+tax%), 1e-6 dollars) as exact int64 so grouped
    totals hash-match (averages derive driver-side as two of these
    integers divided).  One scan with per-block partials pre-combined
    before a 4-bucket exchange."""
    import datetime

    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_pandas_agg

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_shipdate",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    cutoff = datetime.datetime.fromisoformat(Q1_CUTOFF + "T23:59:59.999999")

    def _prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"),
                                   pa.scalar(cutoff, pa.timestamp("us"))))

        def f64(c):
            return np.asarray(t.column(c).to_numpy(zero_copy_only=False),
                              np.float64)

        qty = np.floor(f64("l_quantity") + 0.5).astype(np.int64)
        cents = np.floor(f64("l_extendedprice") * 100.0 + 0.5).astype(np.int64)
        dp = np.floor(f64("l_discount") * 100.0 + 0.5).astype(np.int64)
        tp = np.floor(f64("l_tax") * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pa.array(qty, pa.int64()),
                "base_c": pa.array(cents, pa.int64()),
                "disc_s": pa.array(cents * (100 - dp), pa.int64()),
                "charge_s": pa.array(cents * (100 - dp) * (100 + tp),
                                     pa.int64()),
            }
        )

    def _key(b: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (_str_hash(b.column("l_returnflag"))
                    + np.int64(31) * _str_hash(b.column("l_linestatus")))

    return grouped_pandas_agg(
        line.map_batches(_prep, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "n": ("qty", "count"),
            "sum_qty": ("qty", "sum"),
            "sum_base": ("base_c", "sum"),
            "sum_disc": ("disc_s", "sum"),
            "sum_charge": ("charge_s", "sum"),
        },
        key_fn=_key,
        num_buckets=4,
    )


def _tpch_q1_sql() -> str:
    return (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(qty) AS BIGINT) AS sum_qty, "
        "CAST(sum(cents) AS BIGINT) AS sum_base, "
        "CAST(sum(cents * (100 - dp)) AS BIGINT) AS sum_disc, "
        "CAST(sum(cents * (100 - dp) * (100 + tp)) AS BIGINT) "
        "AS sum_charge FROM ("
        "SELECT l_returnflag, l_linestatus, "
        "CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty, "
        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents, "
        "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS dp, "
        "CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS tp "
        f"FROM lineitem WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 23:59:59.999999') "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )


HLL_P = 10
HLL_GROUP_P = 8
CM_DEPTH = 4
CM_WIDTH = 256


def _q_hll_user_regs(sf_dir: str):
    """HyperLogLog distinct-user sketch as its full (reg, rho) register
    table (ops.hll_registers, p=2^10): per-block register folds
    tree-merged as Ray tasks, zero shuffle, 1 KiB to the driver at ANY
    input size — and because registers are max-of-splitmix64-rank the
    whole sketch (not just the float estimate) is a deterministic
    function of the value set the SQL twin reproduces bit-for-bit."""
    import ray.data as rd

    from essentials_rd.ops import hll_registers

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return hll_registers(ev, "user_id", p=HLL_P)


def _q_type_user_hll(sf_dir: str):
    """Per-event-type HLL distinct-user sketches (ops.hll_registers_by,
    p=2^8): each block folds a dense (types × 256) register matrix,
    only nonzero (type, reg, rho) cells move through ONE bucketed
    grouped max — the per-segment distinct-count shape that at 100 TB
    replaces a full-row exact-distinct shuffle with ≤ blocks·types·256
    exchanged rows."""
    import ray.data as rd

    from essentials_rd.ops import hll_registers_by

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    out = hll_registers_by(ev, "event_type", "user_id", p=HLL_GROUP_P)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["event_type"], r["reg"]))
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "reg": pa.array([r["reg"] for r in rows], pa.int64()),
        "rho": pa.array([r["rho"] for r in rows], pa.int64()),
    })


BLOOM_K = 8
BLOOM_BITS = 4096


def _q_bloom_bits_urgent(sf_dir: str):
    """Bloom filter of URGENT orderkeys as its sorted set-bit-position
    table (ops.bloom_bits, k=8, m=4096) — the same tree-folded bitmap
    bloom_join broadcasts, emitted as the OR-mergeable artifact a
    second pipeline would intersect against; double-hash probes make
    the whole filter SQL-reproducible bit for bit."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.ops import bloom_bits

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderpriority"),
                                    "1-URGENT")).select(["o_orderkey"]),
        batch_format="pyarrow")
    return bloom_bits(urgent, "o_orderkey", k=BLOOM_K, n_bits=BLOOM_BITS)


def _bloom_bits_urgent_sql() -> str:
    c1 = _sm64_ctes("bz", "o_orderkey", "o_orderkey",
                    "(SELECT o_orderkey FROM orders "
                    "WHERE o_orderpriority = '1-URGENT')")
    c2 = _sm64_ctes("bw", "h1", "h1", "bi")
    return (
        f"WITH {c1}, bi AS (SELECT z AS h1 FROM bz3), {c2}, "
        "probes AS (SELECT DISTINCT CAST((("
        "CAST(h1 AS HUGEINT) + i.i * CAST(z | CAST(1 AS UBIGINT) "
        f"AS HUGEINT)) % {_MOD64}) % {BLOOM_BITS} AS BIGINT) AS pos "
        f"FROM bw3, (SELECT unnest(range(0, {BLOOM_K})) AS i) i) "
        "SELECT pos FROM probes ORDER BY pos"
    )


ANOM_K = 3


def _q_dedup_summary(sf_dir: str):
    """One-row corpus dedup report — the number every curation run
    logs first: (n_docs, n_distinct, n_dup_docs, max_group) from the
    verified exact-dup grouping (sha256-keyed, collision-safe
    bucketing); group rows fold to four scalars per block."""
    import ray.data as rd

    from essentials_rd.textops import exact_dup_groups
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    groups = exact_dup_groups(docs, min_size=1)

    def _partial(t: pa.Table) -> pa.Table:
        n = np_col(t, "n_docs")
        return pa.table({
            "docs": pa.array([int(n.sum())], pa.int64()),
            "groups": pa.array([len(n)], pa.int64()),
            "dup_docs": pa.array([int((n[n > 1] - 1).sum())], pa.int64()),
            "mx": pa.array([int(n.max()) if len(n) else 0], pa.int64()),
        })

    parts = groups.map_batches(_partial, batch_format="pyarrow").take_all()
    return pa.table({
        "n_docs": pa.array([sum(r["docs"] for r in parts)], pa.int64()),
        "n_distinct": pa.array([sum(r["groups"] for r in parts)],
                               pa.int64()),
        "n_dup_docs": pa.array([sum(r["dup_docs"] for r in parts)],
                               pa.int64()),
        "max_group": pa.array([max((r["mx"] for r in parts), default=0)],
                              pa.int64()),
    })


def _dedup_summary_sql() -> str:
    return (
        "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(count(DISTINCT text) AS BIGINT) AS n_distinct, "
        "CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs, "
        "CAST((SELECT max(c) FROM (SELECT count(*) AS c FROM documents "
        "GROUP BY text)) AS BIGINT) AS max_group FROM documents"
    )


def _q_fk_violations(sf_dir: str):
    """Referential-integrity audit — the cross-table CI gate
    validate_table (single-table rules) can't express: per foreign key,
    how many child rows reference a missing parent.  Parents are
    deterministically thinned (every 7th orderkey / 5th partkey
    dropped) so the violation counts are non-trivial at every sf; each
    count is one distributed ANTI join consumed by a zero-shuffle
    count fold."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.ops import join
    from essentials_rd.util import np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def _thin(tbl: str, key: str, mod: int):
        ds = rd.read_parquet(f"{sf_dir}/{tbl}.parquet", columns=[key])
        return ds.map_batches(
            lambda t: t.filter(pa.array(
                np_col(t, key).astype(np.int64) % mod != 0)),
            batch_format="pyarrow")

    def _count(ds) -> int:
        parts = ds.map_batches(
            lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow").take_all()
        return sum(r["n"] for r in parts)

    bad_orders = join(
        li.map_batches(lambda t: pa.table(
            {"o_orderkey": t.column("l_orderkey")}),
            batch_format="pyarrow"),
        _thin("orders", "o_orderkey", 7).rename_columns(["o_orderkey"]),
        on="o_orderkey", how="anti", broadcast=False, num_buckets=16)
    bad_parts = join(
        li.map_batches(lambda t: pa.table(
            {"p_partkey": t.column("l_partkey")}),
            batch_format="pyarrow"),
        _thin("part", "p_partkey", 5).rename_columns(["p_partkey"]),
        on="p_partkey", how="anti", broadcast=False, num_buckets=16)
    return pa.table({
        "fk": pa.array(["l_orderkey->orders", "l_partkey->part"],
                       pa.string()),
        "n_bad": pa.array([_count(bad_orders), _count(bad_parts)],
                          pa.int64()),
    })


def _fk_violations_sql() -> str:
    return (
        "SELECT 'l_orderkey->orders' AS fk, CAST(count(*) AS BIGINT) AS "
        "n_bad FROM lineitem WHERE l_orderkey NOT IN ("
        "SELECT o_orderkey FROM orders WHERE o_orderkey % 7 != 0) "
        "UNION ALL "
        "SELECT 'l_partkey->part' AS fk, CAST(count(*) AS BIGINT) AS "
        "n_bad FROM lineitem WHERE l_partkey NOT IN ("
        "SELECT p_partkey FROM part WHERE p_partkey % 5 != 0) "
        "ORDER BY fk"
    )


HOURLY_QS = [0.5, 0.95]


def _q_hourly_value_bands(sf_dir: str):
    """Ops-dashboard percentile bands: exact per-hour P50/P95 of the
    event value (cents) — grouped_quantiles keyed on the epoch-hour
    bucket; only (hour, value, count) histogram entries move."""
    import ray.data as rd

    from essentials_rd.ops import grouped_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        hr = (t.column("ts").cast(pa.int64())
              .to_numpy(zero_copy_only=False) // 3_600_000_000)
        c = np.floor(np.asarray(
            t.column("value").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"hour": pa.array(hr, pa.int64()),
                         "cents": pa.array(c, pa.int64())})

    out = grouped_quantiles(ev.map_batches(_prep, batch_format="pyarrow"),
                            "hour", "cents", HOURLY_QS)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["hour"], r["q"]))
    return pa.table({
        "hour": pa.array([r["hour"] for r in rows], pa.int64()),
        "q": pa.array([r["q"] for r in rows], pa.float64()),
        "value": pa.array([r["value"] for r in rows], pa.int64()),
    })


def _hourly_value_bands_sql() -> str:
    sel = " UNION ALL ".join(
        f"SELECT hour, {q} AS q, CAST(quantile_disc(cents, {q}) AS "
        "BIGINT) AS value FROM e GROUP BY hour"
        for q in HOURLY_QS)
    return (
        "WITH e AS (SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS "
        "hour, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents "
        f"FROM events) {sel} ORDER BY hour, q"
    )


ED_JITTER = 1 << 35  # simulated network delay bound, µs (~9.5 h)


def _q_event_disorder(sf_dir: str):
    """Late-data / watermark-sizing audit (windows.event_disorder):
    each event's ARRIVAL is its event time plus a deterministic
    splitmix64 network delay (mod 2³⁵ µs — the textbook late-data
    model; event_id order alone is trivially in-order in this corpus),
    and an event is late when its event time falls behind the running
    max of earlier ARRIVALS for the same user.  Per user:
    (n_events, n_late, max_disorder_us) — max_disorder sizes the
    allowed lateness a correct windowing config needs.  One
    user-bucketed exchange, band-offset segmented running max."""
    import ray.data as rd

    from essentials_rd.util import hash64, np_col
    from essentials_rd.windows import event_disorder

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def _arrive(b: pa.Table) -> pa.Table:
        eid = np_col(b, "event_id").astype(np.int64)
        t = np.asarray(b.column("ts").combine_chunks().cast(
            pa.timestamp("us")).cast(pa.int64()))
        jit = (hash64(eid).view(np.uint64)
               % np.uint64(ED_JITTER)).astype(np.int64)
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "event_id": pa.array(eid, pa.int64()),
            "ts": b.column("ts"),
            "arr_us": pa.array(t + jit, pa.int64()),
        })

    return event_disorder(ev.map_batches(_arrive, batch_format="pyarrow"),
                          seq_col="arr_us", tie_col="event_id")


def _event_disorder_sql() -> str:
    chain = _sm64_ctes(
        "edz", "user_id, event_id, t", "event_id",
        "(SELECT user_id, event_id, epoch_us(ts) AS t FROM events)")
    return (
        f"WITH {chain}, "
        f"ea AS (SELECT user_id, event_id, t, "
        f"t + CAST(z % {ED_JITTER} AS BIGINT) AS arr FROM edz3), "
        "ew AS (SELECT user_id, t, "
        "max(t) OVER (PARTITION BY user_id ORDER BY arr, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm "
        "FROM ea) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(COALESCE(sum(CASE WHEN pm > t THEN 1 END), 0) AS BIGINT) "
        "AS n_late, "
        "CAST(COALESCE(max(CASE WHEN pm > t THEN pm - t END), 0) "
        "AS BIGINT) AS max_disorder_us "
        "FROM ew GROUP BY 1 ORDER BY 1"
    )


def _q_value_drift(sf_dir: str):
    """Distribution-drift monitor (ops.ks_drift): EXACT two-sample
    Kolmogorov–Smirnov distance between the event-value (cents)
    distributions of the even- vs odd-event_id cohorts — the
    yesterday-vs-today extract comparison, integer-exact via the
    cross-multiplied CDF max.  Only histogram entries move."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.ops import ks_drift
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def _cohort(par: int):
        def _m(t: pa.Table) -> pa.Table:
            eid = np_col(t, "event_id").astype(np.int64)
            v = np.asarray(t.column("value").to_numpy(
                zero_copy_only=False), np.float64)
            m = (eid % 2) == par
            c = np.floor(v[m] * 100.0 + 0.5).astype(np.int64)
            return pa.table({"c": pa.array(c, pa.int64())})
        return _m

    return ks_drift(ev.map_batches(_cohort(0), batch_format="pyarrow"),
                    ev.map_batches(_cohort(1), batch_format="pyarrow"),
                    "c")


_VALUE_DRIFT_SQL = """
WITH e AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                  CAST(event_id % 2 AS BIGINT) AS s FROM events),
h AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
      FROM e GROUP BY 1),
c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cca,
             sum(cb) OVER (ORDER BY v) AS ccb FROM h),
t AS (SELECT CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM e)
SELECT CAST(max(abs(cca * t.nb - ccb * t.na)) AS BIGINT) AS d_num,
       t.na AS n_a, t.nb AS n_b
FROM c, t GROUP BY t.na, t.nb
"""


def _q_value_rank_sum(sf_dir: str):
    """Mann–Whitney rank-sum drift test (ops.rank_sum_u): exact
    integer (2·U, n_a, n_b, tie_sum) between the event-value (cents)
    distributions of the even- vs odd-USER cohorts — the location-
    shift twin of value_drift's KS shape test.  Only per-side
    histogram entries move."""
    import ray.data as rd

    from essentials_rd.ops import rank_sum_u
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def _cohort(par: int):
        def _m(t: pa.Table) -> pa.Table:
            uid = np_col(t, "user_id").astype(np.int64)
            v = np.asarray(t.column("value").to_numpy(
                zero_copy_only=False), np.float64)
            m = (uid % 2) == par
            c = np.floor(v[m] * 100.0 + 0.5).astype(np.int64)
            return pa.table({"c": pa.array(c, pa.int64())})
        return _m

    return rank_sum_u(
        ev.map_batches(_cohort(0), batch_format="pyarrow"),
        ev.map_batches(_cohort(1), batch_format="pyarrow"), "c")


_VALUE_RANK_SUM_SQL = """
WITH e AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                  CAST(user_id % 2 AS BIGINT) AS s FROM events),
h AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb
      FROM e GROUP BY 1),
c AS (SELECT v, ca, cb, sum(cb) OVER (ORDER BY v) - cb AS cbb FROM h),
t AS (SELECT CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM e)
SELECT CAST(sum(ca * (2 * cbb + cb)) AS BIGINT) AS u2_a,
       t.na AS n_a, t.nb AS n_b,
       CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS BIGINT)
         AS tie_sum
FROM c, t GROUP BY t.na, t.nb
"""


def _q_user_drawdown(sf_dir: str):
    """Per-user maximum drawdown of the cumulative event value — the
    classic peak-to-trough sequence kernel (finance/monitoring) under
    the (ts, event_id) total order: one user-bucketed exchange, then
    segmented cumsum + segmented running-max via the per-segment
    int64-offset trick (no Python loop), max-reduceat per user.
    Integer cents end to end."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("value").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64()),
                         "event_id": t.column("event_id"),
                         "c": pa.array(c, pa.int64())})

    def _dd(grp: pa.Table) -> pa.Table:
        u = np_col(grp, "user_id")
        ts = np_col(grp, "ts_us")
        eid = np_col(grp, "event_id")
        c = np_col(grp, "c")
        order = np.lexsort((eid, ts, u))
        u, c = u[order], c[order]
        m = len(u)
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1] \
            if m else np.zeros(0, np.int64)
        seg = np.cumsum(np.r_[False, u[1:] != u[:-1]]) if m \
            else np.zeros(0, np.int64)
        gcum = np.cumsum(c)
        base = np.r_[np.int64(0), gcum[starts[1:] - 1]] \
            if m else np.zeros(0, np.int64)
        cum = gcum - base[seg]          # segmented cumulative sum
        # segmented running max: offset each segment into its own band
        assert m == 0 or np.abs(cum).max() < 1 << 44, "band overflow"
        band = seg.astype(np.int64) << 45
        runmax = np.maximum.accumulate(cum + band) - band
        dd = runmax - cum               # ≥ 0 by construction
        mx = np.maximum.reduceat(dd, starts) if m else np.zeros(0, np.int64)
        return pa.table({"user_id": pa.array(u[starts], pa.int64()),
                         "max_drawdown_c": pa.array(mx, pa.int64())})

    out = hash_bucket_agg(
        ev.map_batches(_prep, batch_format="pyarrow"),
        lambda b: np_col(b, "user_id"), _dd, 16)
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "max_drawdown_c": pa.array([r["max_drawdown_c"] for r in rows],
                                   pa.int64())})


def _user_drawdown_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, ts, event_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "r AS (SELECT user_id, ts, event_id, SUM(c) OVER w AS cum "
        "FROM e WINDOW w AS (PARTITION BY user_id "
        "ORDER BY ts, event_id)), "
        "m AS (SELECT user_id, MAX(cum) OVER w - cum AS dd FROM r "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT user_id, CAST(MAX(dd) AS BIGINT) AS max_drawdown_c "
        "FROM m GROUP BY 1 ORDER BY 1"
    )


def _q_hourly_anomalies(sf_dir: str):
    """Robust anomaly screen over the event stream: hours whose event
    count deviates from the median hourly count by more than
    K·MAD — median and MAD from the engine's exact distributed value
    histogram (quantile_disc semantics), the fence an integer
    cross-comparison so the flagged SET matches SQL exactly.  One
    bucketed per-hour collapse + two histogram passes; emits
    (hour, n, med, mad) for flagged hours."""
    import ray.data as rd

    from essentials_rd.ops import exact_quantiles, grouped_pandas_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def _prep(t: pa.Table) -> pa.Table:
        hr = (t.column("ts").cast(pa.int64())
              .to_numpy(zero_copy_only=False) // 3_600_000_000)
        return pa.table({"hour": pa.array(hr, pa.int64())})

    per_hour = grouped_pandas_agg(
        ev.map_batches(_prep, batch_format="pyarrow"),
        keys=["hour"], aggs={"n": ("hour", "count")},
        num_buckets=16).materialize()
    med = exact_quantiles(per_hour, "n", [0.5])[0]

    def _dev(t: pa.Table) -> pa.Table:
        d = np.abs(np_col(t, "n") - med)
        return pa.table({"hour": t.column("hour"),
                         "dev": pa.array(d, pa.int64())})

    devs = per_hour.map_batches(_dev, batch_format="pyarrow").materialize()
    mad = exact_quantiles(devs, "dev", [0.5])[0]

    def _flag(t: pa.Table) -> pa.Table:
        n = np_col(t, "n")
        keep = np.abs(n - med) > ANOM_K * mad
        t = t.filter(pa.array(keep))
        k = t.num_rows
        return pa.table({"hour": t.column("hour"), "n": t.column("n"),
                         "med": pa.array(np.full(k, med, np.int64),
                                         pa.int64()),
                         "mad": pa.array(np.full(k, mad, np.int64),
                                         pa.int64())})

    return per_hour.map_batches(_flag, batch_format="pyarrow")


def _hourly_anomalies_sql() -> str:
    return (
        "WITH ph AS (SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS "
        "hour, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "m AS (SELECT CAST(quantile_disc(n, 0.5) AS BIGINT) AS med "
        "FROM ph), "
        "d AS (SELECT CAST(quantile_disc(abs(ph.n - m.med), 0.5) AS "
        "BIGINT) AS mad FROM ph, m) "
        "SELECT hour, n, m.med, d.mad FROM ph, m, d "
        f"WHERE abs(ph.n - m.med) > {ANOM_K} * d.mad ORDER BY hour"
    )


def _q_hourly_user_hll(sf_dir: str):
    """Unique-visitors-per-window at 100-TB scale: per-HOUR HLL
    distinct-user sketches (the same hll_registers_by grouped fold,
    keyed on the epoch-hour bucket) — the streaming dashboard shape
    where an exact per-window distinct would shuffle every event;
    sketch rows per hour are OR-mergeable across ingest batches."""
    import ray.data as rd

    from essentials_rd.ops import hll_registers_by

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def _prep(t: pa.Table) -> pa.Table:
        hr = (t.column("ts").cast(pa.int64())
              .to_numpy(zero_copy_only=False) // 3_600_000_000)
        return pa.table({"hour": pa.array(hr, pa.int64()),
                         "user_id": t.column("user_id")})

    out = hll_registers_by(ev.map_batches(_prep, batch_format="pyarrow"),
                           "hour", "user_id", p=HLL_GROUP_P)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["hour"], r["reg"]))
    return pa.table({
        "hour": pa.array([r["hour"] for r in rows], pa.int64()),
        "reg": pa.array([r["reg"] for r in rows], pa.int64()),
        "rho": pa.array([r["rho"] for r in rows], pa.int64()),
    })


def _hourly_user_hll_sql() -> str:
    chain = _sm64_ctes(
        "hz", "hour, user_id", "user_id",
        "(SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour, "
        "user_id FROM events)")
    unroll, last = _hll_unroll_ctes("hour", "hz3", HLL_GROUP_P)
    return (
        f"WITH {chain}, {unroll} "
        "SELECT hour, reg, CAST(max(rnk) + 1 AS BIGINT) AS rho "
        f"FROM {last} GROUP BY 1, 2 ORDER BY 1, 2"
    )


def _q_cm_sketch_users(sf_dir: str):
    """Count-min sketch of per-user event counts (ops.cm_sketch,
    depth 4 × width 256): each block folds one d×w int64 matrix,
    driver sums block partials — the zero-shuffle heavy-hitter /
    frequency-estimation sketch, mergeable by addition across
    pipelines; the (j, slot, n) table is integer-exact through the
    shared SplitMix64 CTE chain."""
    import ray.data as rd

    from essentials_rd.ops import cm_sketch

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return cm_sketch(ev, "user_id", depth=CM_DEPTH, width=CM_WIDTH)


def _hll_unroll_ctes(carry: str, src: str, p: int) -> tuple[str, str]:
    """CTE chain computing each row's (carry…, reg, rnk) from the
    splitmix hash z of ``src`` — the unrolled binary leading-zero count
    over rest = (z<<p) | (2^p−1), exactly ops._hll_rank's shift loop.
    Returns (ctes, final_cte_name); rho = max(rnk)+1 per group."""
    m = 1 << p
    c = f"{carry}, " if carry else ""
    steps = [
        f"hc0 AS (SELECT {c}CAST(z >> {64 - p} AS BIGINT) AS reg, "
        f"CAST((CAST(z AS HUGEINT) * {m}) % {_MOD64} AS UBIGINT) "
        f"| CAST({m - 1} AS UBIGINT) AS cur, 0 AS rnk FROM {src})"]
    prev = "hc0"
    for i, b in enumerate((32, 16, 8, 4, 2, 1)):
        lim = 1 << (64 - b)
        steps.append(
            f"hc{i + 1} AS (SELECT {c}reg, "
            f"CASE WHEN cur < {lim} THEN "
            f"CAST((CAST(cur AS HUGEINT) * {1 << b}) % {_MOD64} AS UBIGINT) "
            f"ELSE cur END AS cur, "
            f"rnk + CASE WHEN cur < {lim} THEN {b} ELSE 0 END AS rnk "
            f"FROM {prev})")
        prev = f"hc{i + 1}"
    return ", ".join(steps), prev


def _hll_user_regs_sql() -> str:
    # literal on purpose (twin-independence) — engine HLL_P=10 frozen
    p = 10
    chain = _sm64_ctes("hz", "user_id", "user_id", "events")
    unroll, last = _hll_unroll_ctes("", "hz3", p)
    return (
        f"WITH {chain}, {unroll}, "
        f"mx AS (SELECT reg, max(rnk) + 1 AS rho FROM {last} GROUP BY reg) "
        f"SELECT g.reg, CAST(COALESCE(mx.rho, 0) AS BIGINT) AS rho "
        f"FROM (SELECT unnest(range(0, {1 << p})) AS reg) g "
        "LEFT JOIN mx USING (reg) ORDER BY g.reg"
    )


def _type_user_hll_sql() -> str:
    # literal on purpose (twin-independence) — engine HLL_GROUP_P=8 frozen
    chain = _sm64_ctes("hz", "event_type, user_id", "user_id", "events")
    unroll, last = _hll_unroll_ctes("event_type", "hz3", 8)
    return (
        f"WITH {chain}, {unroll} "
        "SELECT event_type, reg, CAST(max(rnk) + 1 AS BIGINT) AS rho "
        f"FROM {last} GROUP BY 1, 2 ORDER BY 1, 2"
    )


def _cm_sketch_users_sql() -> str:
    # literals on purpose (twin-independence) — engine CM_DEPTH=4,
    # CM_WIDTH=256 frozen
    CM_DEPTH = 4
    CM_WIDTH = 256
    chains, selects = [], []
    for j in range(CM_DEPTH):
        seed = (j * 0x9E3779B97F4A7C15) % (1 << 64)
        chains.append(_sm64_ctes(f"cm{j}_", "user_id",
                                 f"user_id + {seed}", "events"))
        selects.append(f"SELECT {j} AS j, CAST(z % {CM_WIDTH} AS BIGINT) "
                       f"AS slot FROM cm{j}_3")
    return (
        "WITH " + ", ".join(chains) + ", "
        "u AS (" + " UNION ALL ".join(selects) + "), "
        "cnt AS (SELECT j, slot, CAST(count(*) AS BIGINT) AS n "
        "FROM u GROUP BY 1, 2) "
        "SELECT CAST(g.j AS BIGINT) AS j, CAST(g.slot AS BIGINT) AS slot, "
        "CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n FROM ("
        f"SELECT jj.j, ss.slot FROM (SELECT unnest(range(0, {CM_DEPTH})) "
        f"AS j) jj, (SELECT unnest(range(0, {CM_WIDTH})) AS slot) ss) g "
        "LEFT JOIN cnt ON cnt.j = g.j AND cnt.slot = g.slot "
        "ORDER BY g.j, g.slot"
    )


CHAO_FRAC, CHAO_SEED = 0.2, 7


def _q_chao1_parts(sf_dir: str):
    """Sample-based distinct-count estimation (ops.chao1_estimate):
    scan only a deterministic 20% Bernoulli row sample of lineitem
    (keyed on l_orderkey·8 + l_linenumber, the stable row identity)
    and estimate the number of distinct part keys in the FULL table
    via Chao1's singleton/doubleton correction d + f1(f1−1)/(2(f2+1)),
    audited against the exact distinct count — the estimator to reach
    for when the scan is the cost and HLL's full pass is off the
    table.  Sample counts via one bucketed combine; d/f1/f2 fold as
    4-int block partials; distinct table never driver-materialized."""
    import ray.data as rd

    from essentials_rd.ops import chao1_estimate, int_value_counts
    from essentials_rd.util import np_col

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_orderkey",
                                    "l_linenumber"])

    def _rk(t: pa.Table) -> np.ndarray:
        return (np_col(t, "l_orderkey") * np.int64(8)
                + np_col(t, "l_linenumber"))

    est = chao1_estimate(line, "l_partkey", CHAO_FRAC, _rk,
                         seed=CHAO_SEED)
    exact = int_value_counts(
        line.select_columns(["l_partkey"]), "l_partkey").count()
    return est.append_column(
        "exact_distinct", pa.array([int(exact)], pa.int64()))


def _chao1_parts_sql() -> str:
    threshold = int(CHAO_FRAC * float(2**64 - 1))
    mix = (CHAO_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes(
        "ch", "l_partkey",
        f"l_orderkey * 8 + l_linenumber + {mix}", "lineitem")
    return (
        f"WITH {chain}, "
        f"samp AS (SELECT l_partkey FROM ch3 "
        f"WHERE z < CAST('{threshold}' AS UBIGINT)), "
        "vc AS (SELECT l_partkey, count(*) AS c FROM samp GROUP BY 1), "
        "st AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_sample, "
        "CAST(count(*) AS BIGINT) AS d, "
        "CAST(COALESCE(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END), 0) "
        "AS BIGINT) AS f1, "
        "CAST(COALESCE(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END), 0) "
        "AS BIGINT) AS f2 FROM vc), "
        "ex AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS v "
        "FROM lineitem) "
        "SELECT n_sample, d, f1, f2, "
        "floor((d + CAST(f1 * (f1 - 1) AS DOUBLE) "
        "/ CAST(2 * (f2 + 1) AS DOUBLE)) * 1000000 + 0.5) / 1000000 "
        "AS chao1, ex.v AS exact_distinct FROM st, ex"
    )


HIVE_PRIOS = ["1-URGENT", "3-MEDIUM"]


ENC_COLS = ["band", "custkey", "prio_digit", "status_ord"]


def _q_encoding_advisor(sf_dir: str):
    """Storage-encoding advisor (ops.sorted_run_stats): for four
    orders columns, (n, ndv, runs-under-the-o_orderkey-total-order)
    and the plain/dict/RLE pick by the stated integer cost model
    (plain n·64, dict n·ceil(log2 ndv)+ndv·64, RLE runs·96; ties
    lexicographic) — the decision every columnar writer makes.  The
    global-order run count needs NO sort gather: range partition +
    per-partition internal changes + a P-row boundary stitch on the
    driver (empty partitions skipped so their neighbors stitch)."""
    import ray.data as rd

    from essentials_rd.ops import sorted_run_stats
    from essentials_rd.util import np_col

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority",
                 "o_custkey", "o_totalprice"])

    def _proj(t: pa.Table) -> pa.Table:
        st = np.asarray([ord(x[0]) for x in
                         t.column("o_orderstatus").to_pylist()],
                        np.int64)
        pr = np.asarray([int(x[0]) for x in
                         t.column("o_orderpriority").to_pylist()],
                        np.int64)
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "status_ord": pa.array(st, pa.int64()),
            "prio_digit": pa.array(pr, pa.int64()),
            "custkey": t.column("o_custkey").cast(pa.int64()),
            "band": pa.array(c // 1_000_000, pa.int64()),
        })

    stats = sorted_run_stats(
        orders.map_batches(_proj, batch_format="pyarrow"),
        "o_orderkey", ENC_COLS)
    rows = sorted(stats.to_pylist(), key=lambda r: r["col"])
    best, pb_l, db_l, rb_l = [], [], [], []
    for r in rows:
        n, ndv, runs = r["n"], r["ndv"], r["runs"]
        bw = max(1, (ndv - 1).bit_length())
        pb_, db_, rb_ = n * 64, n * bw + ndv * 64, runs * 96
        pb_l.append(pb_); db_l.append(db_); rb_l.append(rb_)
        best.append(min((db_, "dict"), (pb_, "plain"),
                        (rb_, "rle"))[1])
    return pa.table({
        "col": pa.array([r["col"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "ndv": pa.array([r["ndv"] for r in rows], pa.int64()),
        "runs": pa.array([r["runs"] for r in rows], pa.int64()),
        "plain_bits": pa.array(pb_l, pa.int64()),
        "dict_bits": pa.array(db_l, pa.int64()),
        "rle_bits": pa.array(rb_l, pa.int64()),
        "best": pa.array(best, pa.string()),
    })


def _encoding_advisor_sql() -> str:
    exprs = {
        "band": "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) "
                "// 1000000",
        "custkey": "o_custkey",
        "prio_digit": "CAST(substr(o_orderpriority, 1, 1) AS BIGINT)",
        "status_ord": "ord(o_orderstatus)",
    }
    pieces = []
    for name in ENC_COLS:
        pieces.append(
            f"SELECT '{name}' AS col, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(count(DISTINCT v) AS BIGINT) AS ndv, "
            f"CAST(1 + SUM(CASE WHEN v != pv THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS runs FROM (SELECT v, lag(v) OVER "
            f"(ORDER BY o_orderkey) AS pv FROM (SELECT o_orderkey, "
            f"CAST({exprs[name]} AS BIGINT) AS v FROM orders))")
    return (
        "WITH st AS (" + " UNION ALL ".join(pieces) + "), "
        "bw AS (SELECT col, n, ndv, runs, GREATEST(1, (SELECT "
        "MIN(b.range) FROM range(1, 64) b WHERE "
        "(CAST(1 AS HUGEINT) << b.range) >= ndv)) AS w FROM st), "
        "cost AS (SELECT col, n, ndv, runs, n * 64 AS plain_bits, "
        "n * w + ndv * 64 AS dict_bits, runs * 96 AS rle_bits FROM bw) "
        "SELECT col, n, ndv, runs, "
        "CAST(plain_bits AS BIGINT) AS plain_bits, "
        "CAST(dict_bits AS BIGINT) AS dict_bits, "
        "CAST(rle_bits AS BIGINT) AS rle_bits, "
        "CASE WHEN dict_bits <= plain_bits AND dict_bits <= rle_bits "
        "THEN 'dict' WHEN plain_bits <= rle_bits THEN 'plain' "
        "ELSE 'rle' END AS best FROM cost ORDER BY col"
    )


PARITY_PARTS, PARITY_LOST = 16, 3


def _q_parity_recover(sf_dir: str):
    """XOR-parity shard recovery (sinks.write_parity /
    recover_partition — RAID-5 for the partitioned sink): orders laid
    out by hash(o_orderkey) into 16 partitions, ONE parity sidecar =
    byte-wise XOR of all partition files; partition 3's file is then
    DELETED and reconstructed byte-identically from parity ⊕ the 15
    survivors (sha256 of the original file asserted, not assumed —
    resume protects mid-write crashes, parity protects finished shards
    lost afterwards); the query reads ONLY the recovered partition and
    emits its (n, sum_cents), which the SQL twin reproduces from the
    shared splitmix partition-routing rule z % 16 = 3."""
    import hashlib as _hl
    import os
    import shutil

    import ray.data as rd

    from essentials_rd.sinks import (
        _part_dir, recover_partition, write_parity, write_partitioned,
    )
    from essentials_rd.util import np_col

    base_dir = ("/tmp/essentials_rd_parity_"
                + os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(base_dir, ignore_errors=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def _proj(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "cents": pa.array(c, pa.int64())})

    write_partitioned(orders.map_batches(_proj, batch_format="pyarrow"),
                      base_dir, lambda b: np_col(b, "o_orderkey"),
                      PARITY_PARTS)
    write_parity(base_dir, PARITY_PARTS)

    victim = os.path.join(_part_dir(base_dir, PARITY_LOST),
                          "data.parquet")
    with open(victim, "rb") as f:
        want_sha = _hl.sha256(f.read()).hexdigest()
    os.remove(victim)
    recovered = recover_partition(base_dir, PARITY_PARTS, PARITY_LOST)
    with open(recovered, "rb") as f:
        got_sha = _hl.sha256(f.read()).hexdigest()
    assert got_sha == want_sha, "recovered shard is not byte-identical"

    ds = rd.read_parquet([recovered])
    n = s_ = 0
    for r in ds.map_batches(
            lambda t: pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([int(np_col(t, "cents").sum())],
                              pa.int64())}),
            batch_format="pyarrow").take_all():
        n += int(r["n"]); s_ += int(r["s"])
    return pa.table({
        "part": pa.array([PARITY_LOST], pa.int64()),
        "n": pa.array([n], pa.int64()),
        "sum_cents": pa.array([s_], pa.int64()),
    })


def _parity_recover_sql() -> str:
    chain = _sm64_ctes("py", "o_orderkey, c", "o_orderkey",
                       "(SELECT o_orderkey, "
                       "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) "
                       "AS c FROM orders)")
    return (
        f"WITH {chain} "
        f"SELECT CAST({PARITY_LOST} AS BIGINT) AS part, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(COALESCE(sum(c), 0) AS BIGINT) AS sum_cents "
        f"FROM py3 WHERE z % {PARITY_PARTS} = {PARITY_LOST}"
    )


CH_NODES, CH_VNODES = 6, 64


def _ch_ring(n_nodes: int) -> tuple[np.ndarray, np.ndarray]:
    from essentials_rd.util import hash64

    node = np.repeat(np.arange(n_nodes, dtype=np.int64), CH_VNODES)
    v = np.tile(np.arange(CH_VNODES, dtype=np.int64), n_nodes)
    pos = hash64(node * np.int64(1 << 32) + v)
    order = np.argsort(pos)
    return pos[order], node[order]


def _q_consistent_hash(sf_dir: str):
    """Consistent-hashing rebalancing audit — the shard-ring property
    every distributed store leans on: keys (orders) map to the first
    ring vnode clockwise of their hash (64 splitmix vnodes per node,
    wrap to the ring minimum); adding node 6 to a 6-node ring must
    move ONLY keys whose arc lands on the new node (~1/(N+1) of them)
    and every move must target the new node — asserted, not assumed.
    One streaming pass assigns each key under BOTH rings (two
    searchsorted probes against the broadcast rings) and folds
    per-old-node (stayed, moved) counts."""
    import ray as _ray
    import ray.data as rd

    from essentials_rd.util import hash64, np_col

    pos_a, node_a = _ch_ring(CH_NODES)
    pos_b, node_b = _ch_ring(CH_NODES + 1)
    ref = _ray.put((pos_a, node_a, pos_b, node_b))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def _assign(t: pa.Table) -> pa.Table:
        pa_, na_, pb_, nb_ = _ray.get(ref)
        h = hash64(np_col(t, "o_orderkey"))

        def _ring(pos, node):
            i = np.searchsorted(pos, h, side="left")
            i[i == len(pos)] = 0  # wrap to ring minimum
            return node[i]

        a = _ring(pa_, na_)
        b = _ring(pb_, nb_)
        key = a * np.int64(2) + (a != b)
        cnt = np.bincount(key, minlength=2 * CH_NODES)
        n_bad = int(((a != b) & (b != CH_NODES)).sum())
        return pa.table({
            "node": pa.array(np.arange(CH_NODES, dtype=np.int64),
                             pa.int64()),
            "stayed": pa.array(cnt[0::2][:CH_NODES], pa.int64()),
            "moved": pa.array(cnt[1::2][:CH_NODES], pa.int64()),
            "bad": pa.array(np.full(CH_NODES, n_bad, np.int64),
                            pa.int64()),
        })

    stayed = np.zeros(CH_NODES, np.int64)
    moved = np.zeros(CH_NODES, np.int64)
    bad = 0
    for r in orders.map_batches(_assign,
                                batch_format="pyarrow").take_all():
        stayed[int(r["node"])] += int(r["stayed"])
        moved[int(r["node"])] += int(r["moved"])
        bad += int(r["bad"])
    assert bad == 0, "a key moved to an OLD node — ring property broken"
    return pa.table({
        "node": pa.array(np.arange(CH_NODES, dtype=np.int64)),
        "n_stayed": pa.array(stayed, pa.int64()),
        "n_moved": pa.array(moved, pa.int64()),
    })


def _consistent_hash_sql() -> str:
    ring = _sm64_ctes(
        "ch_r", "node, v",
        "node * 4294967296 + v",
        f"(SELECT a.range AS node, b.range AS v "
        f"FROM range({CH_NODES + 1}) a, range({CH_VNODES}) b)")
    keys = _sm64_ctes("ch_k", "o_orderkey", "o_orderkey", "orders")
    return (
        f"WITH {ring}, {keys}, "
        "ra AS (SELECT node, CAST(z AS HUGEINT) AS p FROM ch_r3 "
        f"WHERE node < {CH_NODES}), "
        "rb AS (SELECT node, CAST(z AS HUGEINT) AS p FROM ch_r3), "
        "ka AS (SELECT k.o_orderkey, "
        "COALESCE(r.node, (SELECT node FROM ra ORDER BY p LIMIT 1)) "
        "AS na FROM (SELECT o_orderkey, CAST(z AS HUGEINT) AS h "
        "FROM ch_k3) k ASOF LEFT JOIN ra r ON -k.h >= -r.p), "
        "kb AS (SELECT k.o_orderkey, "
        "COALESCE(r.node, (SELECT node FROM rb ORDER BY p LIMIT 1)) "
        "AS nb FROM (SELECT o_orderkey, CAST(z AS HUGEINT) AS h "
        "FROM ch_k3) k ASOF LEFT JOIN rb r ON -k.h >= -r.p) "
        "SELECT ka.na AS node, "
        "CAST(SUM(CASE WHEN ka.na = kb.nb THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_stayed, "
        "CAST(SUM(CASE WHEN ka.na != kb.nb THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_moved FROM ka JOIN kb USING (o_orderkey) "
        "GROUP BY 1 ORDER BY 1"
    )


BLOOM_SC_PARTS, BLOOM_SC_KEYS = 16, 5


def _q_bloom_sidecar(sf_dir: str):
    """Bloom-sidecar partition skipping
    (sinks.write_bloom_sidecars/read_partitioned_bloom — the
    parquet-bloom-filter idea at partition level): orders laid out by
    hash(o_orderkey), then point lookups BY A DIFFERENT COLUMN
    (o_custkey) probe each partition's n_bits/8-byte sidecar
    driver-side and open only bloom-positive files — no false
    negatives by construction, false positives only cost a file read;
    per looked-up customer (the 5 smallest distinct custkeys) the
    exact (n_orders, sum_cents)."""
    import os
    import shutil

    import ray.data as rd

    from essentials_rd.ops import top_k
    from essentials_rd.sinks import (
        read_partitioned_bloom, write_bloom_sidecars, write_partitioned,
    )
    from essentials_rd.util import np_col

    base_dir = ("/tmp/essentials_rd_bloomsc_"
                + os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(base_dir, ignore_errors=True)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def _proj(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey"),
                         "cents": pa.array(c, pa.int64())})

    write_partitioned(orders.map_batches(_proj, batch_format="pyarrow"),
                      base_dir, lambda b: np_col(b, "o_orderkey"),
                      BLOOM_SC_PARTS)
    write_bloom_sidecars(base_dir, BLOOM_SC_PARTS, "o_custkey")

    from essentials_rd.ops import int_value_counts
    distinct_cust = int_value_counts(
        orders.select_columns(["o_custkey"]), "o_custkey")
    keys = sorted(top_k(distinct_cust, "value", BLOOM_SC_KEYS,
                        descending=False).column("value").to_pylist())

    out = []
    for ck in keys:
        ds, n_open, n_skip = read_partitioned_bloom(
            base_dir, BLOOM_SC_PARTS, "o_custkey", int(ck))
        n = s_ = 0
        if ds is not None:
            for r in ds.map_batches(
                    lambda t: pa.table({
                        "n": pa.array([t.num_rows], pa.int64()),
                        "s": pa.array([int(np_col(t, "cents").sum())],
                                      pa.int64())}),
                    batch_format="pyarrow").take_all():
                n += int(r["n"]); s_ += int(r["s"])
        out.append((int(ck), n, s_))
    return pa.table({
        "custkey": pa.array([o[0] for o in out], pa.int64()),
        "n_orders": pa.array([o[1] for o in out], pa.int64()),
        "sum_cents": pa.array([o[2] for o in out], pa.int64()),
    })


def _bloom_sidecar_sql() -> str:
    return (
        "WITH ks AS (SELECT DISTINCT o_custkey FROM orders "
        f"ORDER BY 1 LIMIT {BLOOM_SC_KEYS}) "
        "SELECT k.o_custkey AS custkey, "
        "CAST(count(o.o_orderkey) AS BIGINT) AS n_orders, "
        "CAST(COALESCE(sum(CAST(floor(o.o_totalprice * 100 + 0.5) "
        "AS BIGINT)), 0) AS BIGINT) AS sum_cents "
        "FROM ks k LEFT JOIN orders o ON o.o_custkey = k.o_custkey "
        "GROUP BY 1 ORDER BY 1"
    )


def _q_hive_prune(sf_dir: str):
    """Hive-style categorical partitioning + directory pruning
    (sinks.write_hive/read_hive): orders written one
    o_orderpriority=VALUE directory each (atomic per-partition commit,
    exact value in a _VALUE manifest so reads never re-parse paths),
    then a PRUNED read of two priorities opens only those directories'
    files and aggregates (priority, n, sum_cents) — the other three
    partitions are never touched (pytest proves it by corrupting
    them)."""
    import os
    import shutil

    import ray.data as rd

    from essentials_rd.sinks import read_hive, write_hive
    from essentials_rd.util import np_col

    base_dir = ("/tmp/essentials_rd_hive_"
                + os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(base_dir, ignore_errors=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderpriority", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"prio": t.column("o_orderpriority"),
                         "cents": pa.array(c, pa.int64())})

    write_hive(orders.map_batches(_cents, batch_format="pyarrow"),
               base_dir, "prio")
    pruned = read_hive(base_dir, "prio", values=HIVE_PRIOS)

    def _fold(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"prio": t.column("prio").to_pylist(),
                           "cents": np_col(t, "cents")})
        g = df.groupby("prio")["cents"].agg(["count", "sum"])
        return pa.table({
            "prio": pa.array(g.index.tolist(), pa.string()),
            "n": pa.array(g["count"].astype(np.int64).to_numpy()),
            "s": pa.array(g["sum"].astype(np.int64).to_numpy()),
        })

    acc = {}
    for r in pruned.map_batches(_fold, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["prio"], [0, 0])
        a[0] += int(r["n"]); a[1] += int(r["s"])
    prios = sorted(acc)
    return pa.table({
        "prio": pa.array(prios, pa.string()),
        "n": pa.array([acc[p][0] for p in prios], pa.int64()),
        "sum_cents": pa.array([acc[p][1] for p in prios], pa.int64()),
    })


def _hive_prune_sql() -> str:
    vals = ", ".join(f"'{v}'" for v in HIVE_PRIOS)
    return (
        "SELECT o_orderpriority AS prio, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS sum_cents FROM orders "
        f"WHERE o_orderpriority IN ({vals}) GROUP BY 1 ORDER BY 1"
    )


def _q_allen_census(sf_dir: str):
    """Allen interval-algebra census (windows.allen_census): classify
    every user's ordered event-type pair of activity spans
    [min ts, max ts] into the 13 Allen relations via one fixed
    comparison ladder (degenerate point intervals resolved by ladder
    ORDER, identical in engine and SQL), census with explicit zero
    rows.  One user-bucketed exchange; 13-int partials."""
    import ray.data as rd

    from essentials_rd.windows import allen_census

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    return allen_census(ev)


def _allen_census_sql() -> str:
    rels = ", ".join(
        f"('{r}')" for r in (
            "equals", "precedes", "preceded_by", "meets", "met_by",
            "starts", "started_by", "finishes", "finished_by",
            "during", "contains", "overlaps", "overlapped_by"))
    return (
        "WITH iv AS (SELECT user_id AS u, event_type AS t, "
        "min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e "
        "FROM events GROUP BY 1, 2), "
        "pr AS (SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2 "
        "FROM iv a JOIN iv b ON a.u = b.u AND a.t < b.t), "
        "cl AS (SELECT CASE "
        "WHEN s1 = s2 AND e1 = e2 THEN 'equals' "
        "WHEN e1 < s2 THEN 'precedes' "
        "WHEN e2 < s1 THEN 'preceded_by' "
        "WHEN e1 = s2 THEN 'meets' "
        "WHEN e2 = s1 THEN 'met_by' "
        "WHEN s1 = s2 AND e1 < e2 THEN 'starts' "
        "WHEN s1 = s2 AND e2 < e1 THEN 'started_by' "
        "WHEN e1 = e2 AND s1 > s2 THEN 'finishes' "
        "WHEN e1 = e2 AND s2 > s1 THEN 'finished_by' "
        "WHEN s1 > s2 AND e1 < e2 THEN 'during' "
        "WHEN s1 < s2 AND e2 < e1 THEN 'contains' "
        "WHEN s1 < s2 AND s2 < e1 AND e1 < e2 THEN 'overlaps' "
        "ELSE 'overlapped_by' END AS rel FROM pr), "
        "cn AS (SELECT rel, count(*) AS n FROM cl GROUP BY 1), "
        f"rl AS (SELECT * FROM (VALUES {rels}) AS v(rel)) "
        "SELECT rl.rel, CAST(COALESCE(cn.n, 0) AS BIGINT) AS n_pairs "
        "FROM rl LEFT JOIN cn USING (rel) ORDER BY rl.rel"
    )


ITEMCOS_K = 3


def _q_item_cosine(sf_dir: str):
    """Item-item cosine top-k — the "bought X, also bought Y" serving
    table collaborative filtering starts from: over the distinct
    (order, part) incidence, sim(i,j) = co(i,j)/√(d_i·d_j) (cosine of
    binary order-incidence vectors), ranked per item by the EXACT
    integer quantization floor(10⁶·co²/(d_i·d_j)) — order-isomorphic
    to cosine on positives, so the ranking needs no floats — with
    top-3 per item kept by one grouped_top_k bucket pass.  Pipeline:
    one order-bucketed pair expansion (copurchase_edges), one distinct
    count for degrees, two partitioned joins, one group-top-k — every
    exchange keyed, nothing driver-side."""
    import ray.data as rd

    from essentials_rd.ops import grouped_top_k, int_value_counts, join
    from essentials_rd.pipelines import copurchase_edges, copurchase_items
    from essentials_rd.util import np_col

    edges = copurchase_edges(sf_dir)
    deg = int_value_counts(
        copurchase_items(sf_dir).select_columns(["l_partkey"]),
        "l_partkey")

    def _sym(t: pa.Table) -> pa.Table:
        s = np_col(t, "src")
        d = np_col(t, "dst")
        co = np_col(t, "weight").astype(np.int64)
        return pa.table({
            "i": pa.array(np.concatenate([s, d]), pa.int64()),
            "j": pa.array(np.concatenate([d, s]), pa.int64()),
            "co": pa.array(np.concatenate([co, co]), pa.int64()),
        })

    sym = edges.map_batches(_sym, batch_format="pyarrow")
    di = deg.map_batches(
        lambda t: pa.table({"i": t.column("value"),
                            "di": t.column("count")}),
        batch_format="pyarrow")
    dj = deg.map_batches(
        lambda t: pa.table({"j": t.column("value"),
                            "dj": t.column("count")}),
        batch_format="pyarrow")
    scored = join(join(sym, di, on="i", broadcast=False),
                  dj, on="j", broadcast=False)

    def _q(t: pa.Table) -> pa.Table:
        co = np_col(t, "co")
        q = (co * co * np.int64(1_000_000)) // (
            np_col(t, "di") * np_col(t, "dj"))
        return pa.table({"i": t.column("i"), "j": t.column("j"),
                         "co": pa.array(co, pa.int64()),
                         "qscore": pa.array(q, pa.int64())})

    top = grouped_top_k(
        scored.map_batches(_q, batch_format="pyarrow"),
        ["i"], "qscore", ITEMCOS_K, descending=True, tie_cols=["j"])
    t = pa.Table.from_pylist(top.take_all())
    t = t.select(["i", "rank", "j", "co", "qscore"]).rename_columns(
        ["item", "rank", "nbr", "co", "qscore"])
    return t.sort_by([("item", "ascending"), ("rank", "ascending")])


def _item_cosine_sql() -> str:
    return (
        "WITH items AS (SELECT DISTINCT l_orderkey AS o, "
        "l_partkey AS p FROM lineitem), "
        "pr AS (SELECT a.p AS i, b.p AS j, count(*) AS co FROM items a "
        "JOIN items b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2), "
        "sym AS (SELECT i, j, co FROM pr "
        "UNION ALL SELECT j, i, co FROM pr), "
        "deg AS (SELECT p, count(*) AS d FROM items GROUP BY 1), "
        "sc AS (SELECT s.i, s.j, s.co, "
        "(s.co * s.co * 1000000) // (di.d * dj.d) AS q FROM sym s "
        "JOIN deg di ON di.p = s.i JOIN deg dj ON dj.p = s.j), "
        "rk AS (SELECT i, j, co, q, ROW_NUMBER() OVER ("
        "PARTITION BY i ORDER BY q DESC, j) AS r FROM sc) "
        "SELECT CAST(i AS BIGINT) AS item, CAST(r AS BIGINT) AS rank, "
        "CAST(j AS BIGINT) AS nbr, CAST(co AS BIGINT) AS co, "
        "CAST(q AS BIGINT) AS qscore FROM rk "
        f"WHERE r <= {ITEMCOS_K} ORDER BY 1, 2"
    )


HH_PHI_DEN = 200


def _q_heavy_hitters(sf_dir: str):
    """Exact heavy hitters without a full shuffle
    (ops.exact_heavy_hitters): every user with ≥ ⌈N/200⌉ events, by
    the two-pass screen-then-verify shape — pass 1 is a zero-shuffle
    block scan whose weighted-pigeonhole screen cannot miss a global
    heavy hitter at any layout (a φ-heavy key is φ-heavy in some
    block); pass 2 broadcasts the ≤ blocks·200 candidates once and
    moves ONLY their rows through the exact count, pruning the
    screen's false positives against θ = (N+199)//200.  Output is
    exactly `HAVING count(*) ≥ θ` — the candidate set may vary with
    layout, the answer cannot."""
    import ray.data as rd

    from essentials_rd.ops import exact_heavy_hitters

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    out, info = exact_heavy_hitters(ev, "user_id",
                                    phi_den=HH_PHI_DEN)
    t = pa.Table.from_pylist(out.take_all())
    if t.num_rows == 0:
        return pa.table({"value": pa.array([], pa.int64()),
                         "count": pa.array([], pa.int64())})
    return t.select(["value", "count"]).sort_by("value")


def _heavy_hitters_sql() -> str:
    # literal on purpose (twin-independence) — engine HH_PHI_DEN
    HH_PHI_DEN = 200
    return (
        "SELECT user_id AS value, CAST(count(*) AS BIGINT) AS count "
        "FROM events GROUP BY 1 HAVING count(*) >= "
        f"(SELECT (count(*) + {HH_PHI_DEN - 1}) // {HH_PHI_DEN} "
        "FROM events) ORDER BY 1"
    )


JOP_DEPTH, JOP_WIDTH = 4, 1024
JOP_TYPES = ("view", "click", "purchase")


def _q_join_order_plan(sf_dir: str):
    """Sketch-driven join-order planning — the System-R decision CM
    sketches exist to price: a 3-way join views ⋈ clicks ⋈ purchases
    on user_id has three possible first pairs; build ONE cm_sketch per
    relation (same per-row seeds, so any pair's slot-wise dot is a
    certified upper bound on that pair's join size), price all three
    pairs by cm_inner_product, pick the cheapest first join (argmin
    with lexical tie-break), then execute the 3-way co-occurrence
    count joining the CHOSEN pair first.  Emits per candidate pair its
    estimate and whether it was chosen, plus the (order-invariant)
    exact triple total that audits the plan's result.  All three
    sketches are zero-shuffle block folds; the exact path is two
    partitioned joins of distributed value-count tables — the distinct
    sets never touch the driver."""
    import ray.data as rd

    from essentials_rd.ops import (
        cm_inner_product, cm_sketch, int_value_counts, join,
    )
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    rels = {t: ev.filter(expr=f"event_type == '{t}'")
              .select_columns(["user_id"]) for t in JOP_TYPES}
    sks = {t: cm_sketch(rels[t], "user_id", depth=JOP_DEPTH,
                        width=JOP_WIDTH) for t in JOP_TYPES}
    pairs = sorted(
        (min(a, b), max(a, b))
        for i, a in enumerate(JOP_TYPES) for b in JOP_TYPES[i + 1:])
    ests = {}
    for a, b in pairs:
        _, ests[f"{a}*{b}"] = cm_inner_product(
            sks[a], sks[b], depth=JOP_DEPTH, width=JOP_WIDTH)
    chosen = min(ests, key=lambda p: (ests[p], p))
    if ests[chosen] == 0:
        # certified-empty elimination: every CM dot is an UPPER bound,
        # so a 0-estimate first pair proves the 3-way join is empty —
        # skip execution entirely (the optimizer win sketches buy)
        names = sorted(ests)
        return pa.table({
            "pair": pa.array(names, pa.string()),
            "est": pa.array([ests[p] for p in names], pa.int64()),
            "chosen": pa.array([int(p == chosen) for p in names],
                               pa.int64()),
            "triple_total": pa.array([0] * len(names), pa.int64()),
        })

    # execute with the chosen pair first (result is order-invariant;
    # the plan decides which intermediate is materialized smallest)
    counts = {t: int_value_counts(rels[t], "user_id") for t in JOP_TYPES}
    a, b = chosen.split("*")
    (c,) = [t for t in JOP_TYPES if t not in (a, b)]
    first = join(counts[a], counts[b], on="value", broadcast=False)

    def _mul2(t: pa.Table) -> pa.Table:
        m = np_col(t, "count").astype(object) * np_col(
            t, "count_r").astype(object)
        return pa.table({"value": t.column("value"),
                         "m": pa.array([int(x) for x in m], pa.int64())})

    both = first.map_batches(_mul2, batch_format="pyarrow")
    trip = join(both, counts[c], on="value", broadcast=False)

    def _mul3(t: pa.Table) -> pa.Table:
        s = (np_col(t, "m").astype(object)
             * np_col(t, "count").astype(object)).sum()
        return pa.table({"s": pa.array([int(s)], pa.int64())})

    total = sum(int(r["s"]) for r in trip.map_batches(
        _mul3, batch_format="pyarrow").take_all())
    names = sorted(ests)
    return pa.table({
        "pair": pa.array(names, pa.string()),
        "est": pa.array([ests[p] for p in names], pa.int64()),
        "chosen": pa.array([int(p == chosen) for p in names], pa.int64()),
        "triple_total": pa.array([total] * len(names), pa.int64()),
    })


def _join_order_plan_sql() -> str:
    initial = {"view": "v", "click": "c", "purchase": "p"}
    chains, dots = [], []
    for t in JOP_TYPES:
        for j in range(JOP_DEPTH):
            seed = (j * 0x9E3779B97F4A7C15) % (1 << 64)
            chains.append(_sm64_ctes(
                f"jo{initial[t]}{j}_", "user_id", f"user_id + {seed}",
                f"(SELECT user_id FROM events "
                f"WHERE event_type = '{t}')"))
    pairs = sorted(
        (min(a, b), max(a, b))
        for i, a in enumerate(JOP_TYPES) for b in JOP_TYPES[i + 1:])
    for a, b in pairs:
        for j in range(JOP_DEPTH):
            dots.append(
                f"SELECT '{a}*{b}' AS pair, CAST(COALESCE((SELECT "
                f"SUM(x.n * y.n) FROM "
                f"(SELECT z % {JOP_WIDTH} AS slot, count(*) AS n "
                f"FROM jo{initial[a]}{j}_3 GROUP BY 1) x JOIN "
                f"(SELECT z % {JOP_WIDTH} AS slot, count(*) AS n "
                f"FROM jo{initial[b]}{j}_3 GROUP BY 1) y USING (slot)), "
                "0) AS BIGINT) AS dot")
    return (
        "WITH " + ", ".join(chains) + ", "
        "dots AS (" + " UNION ALL ".join(dots) + "), "
        "ests AS (SELECT pair, CAST(min(dot) AS BIGINT) AS est "
        "FROM dots GROUP BY pair), "
        "pick AS (SELECT pair FROM ests ORDER BY est, pair LIMIT 1), "
        "ex AS (SELECT CAST(COALESCE(SUM(CAST(v.c AS HUGEINT) * c.c "
        "* p.c), 0) AS BIGINT) AS v FROM "
        "(SELECT user_id, count(*) AS c FROM events "
        "WHERE event_type = 'view' GROUP BY 1) v JOIN "
        "(SELECT user_id, count(*) AS c FROM events "
        "WHERE event_type = 'click' GROUP BY 1) c USING (user_id) JOIN "
        "(SELECT user_id, count(*) AS c FROM events "
        "WHERE event_type = 'purchase' GROUP BY 1) p USING (user_id)) "
        "SELECT e.pair, e.est, CAST(CASE WHEN e.pair = pick.pair "
        "THEN 1 ELSE 0 END AS BIGINT) AS chosen, ex.v AS triple_total "
        "FROM ests e, pick, ex ORDER BY e.pair"
    )


CMJ_DEPTH, CMJ_WIDTH = 4, 1024


def _q_cm_join_size(sf_dir: str):
    """Sketch-based join-size estimation (ops.cm_sketch ×2 +
    cm_inner_product): |views ⋈ purchases on user_id| =
    Σ_u v(u)·p(u) — the behavioral-co-occurrence cardinality a query
    optimizer prices — estimated by the min over rows of the
    CM-sketch dot product (every row an upper bound: colliding cross
    terms only ADD), audited against the exact size from a
    partitioned join of the two distributed value-count tables.  Both
    sketches are zero-shuffle block folds; the dot is driver math
    over 2·d·w ints."""
    import ray.data as rd

    from essentials_rd.ops import (
        cm_inner_product, cm_sketch, int_value_counts, join,
    )
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    views = ev.filter(expr="event_type == 'view'").select_columns(
        ["user_id"])
    purch = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["user_id"])
    sa = cm_sketch(views, "user_id", depth=CMJ_DEPTH, width=CMJ_WIDTH)
    sb = cm_sketch(purch, "user_id", depth=CMJ_DEPTH, width=CMJ_WIDTH)
    dots, est = cm_inner_product(sa, sb, depth=CMJ_DEPTH, width=CMJ_WIDTH)

    ca = int_value_counts(views, "user_id")
    cb = int_value_counts(purch, "user_id")
    joined = join(ca, cb, on="value", broadcast=False)

    def _prod(t: pa.Table) -> pa.Table:
        p = np_col(t, "count").astype(object) * np_col(
            t, "count_r").astype(object)
        return pa.table({"s": pa.array([int(p.sum())], pa.int64())})

    exact = sum(int(r["s"]) for r in joined.map_batches(
        _prod, batch_format="pyarrow").take_all())
    return pa.table({
        "j": pa.array(np.arange(CMJ_DEPTH, dtype=np.int64), pa.int64()),
        "dot": pa.array(dots, pa.int64()),
        "est": pa.array(np.full(CMJ_DEPTH, est, np.int64), pa.int64()),
        "exact": pa.array(np.full(CMJ_DEPTH, exact, np.int64), pa.int64()),
    })


def _cm_join_size_sql() -> str:
    chains, dots = [], []
    for j in range(CMJ_DEPTH):
        seed = (j * 0x9E3779B97F4A7C15) % (1 << 64)
        for side, etype in (("a", "view"), ("b", "purchase")):
            chains.append(_sm64_ctes(
                f"cj{side}{j}_", "user_id", f"user_id + {seed}",
                f"(SELECT user_id FROM events "
                f"WHERE event_type = '{etype}')"))
        dots.append(
            f"SELECT {j} AS j, CAST(COALESCE((SELECT SUM(a.n * b.n) FROM "
            f"(SELECT z % {CMJ_WIDTH} AS slot, count(*) AS n "
            f"FROM cja{j}_3 GROUP BY 1) a JOIN "
            f"(SELECT z % {CMJ_WIDTH} AS slot, count(*) AS n "
            f"FROM cjb{j}_3 GROUP BY 1) b USING (slot)), 0) AS BIGINT) "
            "AS dot")
    return (
        "WITH " + ", ".join(chains) + ", "
        "dots AS (" + " UNION ALL ".join(dots) + "), "
        "est AS (SELECT CAST(min(dot) AS BIGINT) AS v FROM dots), "
        "ex AS (SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS v "
        "FROM (SELECT user_id, count(*) AS c FROM events "
        "WHERE event_type = 'view' GROUP BY 1) a JOIN "
        "(SELECT user_id, count(*) AS c FROM events "
        "WHERE event_type = 'purchase' GROUP BY 1) b USING (user_id)) "
        "SELECT CAST(dots.j AS BIGINT) AS j, dots.dot, est.v AS est, "
        "ex.v AS exact FROM dots, est, ex ORDER BY dots.j"
    )


AMS_K = 32


def _q_ams_f2(sf_dir: str):
    """AMS tug-of-war F₂ sketch of per-user event counts (ops.ams_f2,
    k=32 counters): each block folds one k-vector of ±1 sign sums,
    driver adds block vectors — the zero-shuffle self-join-size /
    skew estimator, mergeable by addition; f2_est = (Σ z_j²)//k floors
    to an exact integer the SQL twin reproduces in HUGEINT, audited
    against the exact F₂ = Σ c_u² from the distributed value-count
    combine (ops.exact_f2; distinct table never driver-materialized)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import ams_f2, exact_f2

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    sk = ams_f2(ev, "user_id", k=AMS_K)
    ex = exact_f2(ev, "user_id")
    return sk.append_column(
        "f2_exact", pa.array(np.full(sk.num_rows, ex, np.int64), pa.int64()))


def _ams_f2_sql() -> str:
    top = 1 << 63
    chains, selects = [], []
    for j in range(AMS_K):
        seed = (j * 0x9E3779B97F4A7C15) % (1 << 64)
        chains.append(_sm64_ctes(f"am{j}_", "user_id",
                                 f"user_id + {seed}", "events"))
        selects.append(
            f"SELECT {j} AS j, CAST(SUM(CASE WHEN z >= "
            f"CAST('{top}' AS UBIGINT) THEN 1 ELSE -1 END) AS BIGINT) "
            f"AS zj FROM am{j}_3")
    return (
        "WITH " + ", ".join(chains) + ", "
        "sk AS (" + " UNION ALL ".join(selects) + "), "
        "est AS (SELECT CAST((SUM(CAST(zj AS HUGEINT) * CAST(zj AS "
        f"HUGEINT)) // {AMS_K}) AS BIGINT) AS v FROM sk), "
        "ex AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) "
        "AS BIGINT) AS v FROM (SELECT count(*) AS c FROM events "
        "GROUP BY user_id)) "
        "SELECT CAST(sk.j AS BIGINT) AS j, sk.zj, est.v AS f2_est, "
        "ex.v AS f2_exact FROM sk, est, ex ORDER BY sk.j"
    )


CS_DEPTH, CS_WIDTH = 5, 64


def _q_cs_point_users(sf_dir: str):
    """Count-Sketch point queries (ops.count_sketch + cs_estimate,
    depth 5 × width 64): per-user event-count estimates as the median
    over rows of sign·counter — the UNBIASED two-sided estimator
    (count-min only over-counts; signed collisions cancel here) —
    audited against exact counts from the distributed value-count
    combine.  Sketch: one d×w int64 matrix per block, driver adds,
    ZERO shuffle, mergeable by addition; probe set = the bounded user
    dimension (point queries are driver math by contract)."""
    import ray.data as rd

    from essentials_rd.ops import count_sketch, cs_estimate, int_value_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    sk = count_sketch(ev, "user_id", depth=CS_DEPTH, width=CS_WIDTH)
    ex = int_value_counts(ev, "user_id").to_pandas()
    ex = ex.sort_values("value").reset_index(drop=True)
    users = ex.value.to_numpy(np.int64)
    est = cs_estimate(sk, users, depth=CS_DEPTH, width=CS_WIDTH)
    exact = ex["count"].to_numpy(np.int64)
    return pa.table({
        "user_id": pa.array(users, pa.int64()),
        "exact": pa.array(exact, pa.int64()),
        "est": pa.array(est, pa.int64()),
        "err": pa.array(est - exact, pa.int64()),
    })


def _cs_point_users_sql() -> str:
    top = 1 << 63
    chains, cnt_sel, est_sel = [], [], []
    for j in range(CS_DEPTH):
        seed = (j * 0x9E3779B97F4A7C15) % (1 << 64)
        chains.append(_sm64_ctes(f"cs{j}_", "user_id",
                                 f"user_id + {seed}", "events"))
        cnt_sel.append(
            f"SELECT {j} AS j, CAST(z % {CS_WIDTH} AS BIGINT) AS slot, "
            f"CASE WHEN z >= CAST('{top}' AS UBIGINT) THEN 1 ELSE -1 END "
            f"AS sgn FROM cs{j}_3")
        est_sel.append(
            f"SELECT DISTINCT user_id, {j} AS j, "
            f"CAST(z % {CS_WIDTH} AS BIGINT) AS slot, "
            f"CASE WHEN z >= CAST('{top}' AS UBIGINT) THEN 1 ELSE -1 END "
            f"AS sgn FROM cs{j}_3")
    return (
        "WITH " + ", ".join(chains) + ", "
        "rows_ AS (" + " UNION ALL ".join(cnt_sel) + "), "
        "cnt AS (SELECT j, slot, CAST(SUM(sgn) AS BIGINT) AS c "
        "FROM rows_ GROUP BY 1, 2), "
        "probe AS (" + " UNION ALL ".join(est_sel) + "), "
        "ej AS (SELECT p.user_id, p.j, "
        "p.sgn * COALESCE(cnt.c, 0) AS est_j "
        "FROM probe p LEFT JOIN cnt ON cnt.j = p.j AND cnt.slot = p.slot), "
        "md AS (SELECT user_id, "
        "CAST(quantile_disc(est_j, 0.5) AS BIGINT) AS est "
        "FROM ej GROUP BY 1), "
        "ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact "
        "FROM events GROUP BY 1) "
        "SELECT ex.user_id, ex.exact, md.est, md.est - ex.exact AS err "
        "FROM ex JOIN md USING (user_id)"
    )


def _q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shipping priority (essentials_rd.tpch.q3): top-10
    unshipped-revenue BUILDING-segment orders, integer 1e-4-dollar
    revenue units, date as epoch-day int64."""
    from essentials_rd import tpch

    return tpch.q3(sf_dir)


def _q_tpch_q4(sf_dir: str):
    """TPC-H Q4 order-priority check (essentials_rd.tpch.q4), adapted
    to EXISTS(l_shipdate > o_orderdate) — late-shipped — via one
    grouped max per order; see tpch.py docstring."""
    from essentials_rd import tpch

    return tpch.q4(sf_dir)


def _q_tpch_q5(sf_dir: str):
    """TPC-H Q5 local-supplier volume (essentials_rd.tpch.q5): ASIA
    1997 revenue where customer and supplier share a nation."""
    from essentials_rd import tpch

    return tpch.q5(sf_dir)


def _q_tpch_q6(sf_dir: str):
    """TPC-H Q6 forecast revenue (essentials_rd.tpch.q6): one filtered
    scan, zero shuffle, exact integer cents·dp units."""
    from essentials_rd import tpch

    return tpch.q6(sf_dir)


def _q_tpch_q10(sf_dir: str):
    """TPC-H Q10 returned items (essentials_rd.tpch.q10): top-20
    customers by lost 'R'-flag revenue in 1997Q4."""
    from essentials_rd import tpch

    return tpch.q10(sf_dir)


def _q_tpch_q12(sf_dir: str):
    """TPC-H Q12 priority split (essentials_rd.tpch.q12), grouped by
    l_linestatus (snapshot carries no l_shipmode)."""
    from essentials_rd import tpch

    return tpch.q12(sf_dir)


def _q_tpch_q14(sf_dir: str):
    """TPC-H Q14 promotion effect (essentials_rd.tpch.q14): PROMO
    share of 1997-09 revenue as two exact int64 units."""
    from essentials_rd import tpch

    return tpch.q14(sf_dir)


def _q_tpch_q18(sf_dir: str):
    """TPC-H Q18 large-volume customers (essentials_rd.tpch.q18):
    orders with > 200 total units, top-100 by order value."""
    from essentials_rd import tpch

    return tpch.q18(sf_dir)


_TPCH_REV = ("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) * "
             "(100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))")


def _tpch_q3_sql() -> str:
    return (
        "SELECT o.o_orderkey, o.oday, CAST(sum(l.rev_u) AS BIGINT) AS "
        "revenue_u FROM ("
        f"SELECT l_orderkey, {_TPCH_REV} AS rev_u FROM lineitem "
        "WHERE l_shipdate > TIMESTAMP '1998-03-15 00:00:00') l JOIN ("
        "SELECT o_orderkey, CAST(FLOOR(epoch(o_orderdate) / 86400) AS "
        "BIGINT) AS oday FROM orders "
        "WHERE o_orderdate < TIMESTAMP '1998-03-15 00:00:00' "
        "AND o_custkey IN (SELECT c_custkey FROM customer "
        "WHERE c_mktsegment = 'BUILDING')) o "
        "ON l.l_orderkey = o.o_orderkey "
        "GROUP BY 1, 2 ORDER BY revenue_u DESC, o.o_orderkey LIMIT 10"
    )


def _tpch_q4_sql() -> str:
    return (
        "SELECT o_orderpriority AS pr, CAST(count(*) AS BIGINT) AS "
        "n_late FROM orders JOIN ("
        "SELECT l_orderkey, max(l_shipdate) AS ms FROM lineitem "
        "GROUP BY 1) mx ON mx.l_orderkey = o_orderkey "
        "WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00' "
        "AND ms > o_orderdate GROUP BY 1 ORDER BY 1"
    )


def _tpch_q5_sql() -> str:
    return (
        f"SELECT n_name, CAST(sum({_TPCH_REV}) AS BIGINT) AS revenue_u "
        "FROM customer, orders, lineitem, supplier, nation, region "
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
        "AND r_name = 'ASIA' "
        "AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' "
        "GROUP BY n_name ORDER BY revenue_u DESC"
    )


def _tpch_q6_sql() -> str:
    return (
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(COALESCE(sum(cents * dp), 0) AS BIGINT) AS rev_u FROM ("
        "SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents, "
        "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS dp, "
        "CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') "
        "WHERE dp BETWEEN 5 AND 7 AND qty < 24"
    )


def _tpch_q10_sql() -> str:
    return (
        "WITH pc AS (SELECT o_custkey AS c_custkey, "
        "CAST(sum(l.rev_u) AS BIGINT) AS revenue_u, "
        "CAST(count(*) AS BIGINT) AS n_items FROM ("
        f"SELECT l_orderkey, {_TPCH_REV} AS rev_u FROM lineitem "
        "WHERE l_returnflag = 'R') l "
        "JOIN orders ON l.l_orderkey = o_orderkey "
        "WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' GROUP BY 1) "
        "SELECT c_custkey, revenue_u, n_items, c_name, "
        "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS acctbal_c "
        "FROM pc JOIN customer USING (c_custkey) "
        "ORDER BY revenue_u DESC, c_custkey LIMIT 20"
    )


def _tpch_q12_sql() -> str:
    return (
        "SELECT l_linestatus, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_n, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 0 ELSE 1 END) AS BIGINT) AS low_n "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
        "GROUP BY 1 ORDER BY 1"
    )


def _tpch_q14_sql() -> str:
    return (
        "SELECT CAST(COALESCE(sum(CASE WHEN p_type = 'PROMO' "
        "THEN rev_u ELSE 0 END), 0) AS BIGINT) AS promo_rev_u, "
        "CAST(COALESCE(sum(rev_u), 0) AS BIGINT) AS total_rev_u FROM ("
        f"SELECT l_partkey, {_TPCH_REV} AS rev_u FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00') l "
        "JOIN part ON p_partkey = l_partkey"
    )


def _tpch_q18_sql() -> str:
    return (
        "WITH po AS (SELECT l_orderkey AS o_orderkey, "
        "CAST(sum(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS "
        "sum_qty FROM lineitem GROUP BY 1 "
        "HAVING sum(CAST(ROUND(l_quantity, 0) AS BIGINT)) > 200) "
        "SELECT c_custkey, c_name, o_orderkey, "
        "CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS oday, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS total_c, "
        "sum_qty FROM po JOIN orders USING (o_orderkey) "
        "JOIN customer ON c_custkey = o_custkey "
        "ORDER BY total_c DESC, o_orderkey LIMIT 100"
    )


def _q_price_mad(sf_dir: str):
    """Per-priority robust (median, MAD) of order price cents
    (ops.grouped_mad): two exact quantile_disc passes joined by the
    auto-picked shape — every output an int64 present in the data."""
    import ray.data as rd

    from essentials_rd.ops import grouped_mad
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderpriority", "o_totalprice"])

    def _prep(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"pr": t.column("o_orderpriority"),
                         "cents": pa.array(c, pa.int64())})

    out = grouped_mad(orders.map_batches(_prep, batch_format="pyarrow"),
                      "pr", "cents")
    rows = out.take_all()
    rows.sort(key=lambda r: r["pr"])
    return pa.table({
        "pr": pa.array([r["pr"] for r in rows], pa.string()),
        "med": pa.array([r["med"] for r in rows], pa.int64()),
        "mad": pa.array([r["mad"] for r in rows], pa.int64()),
    })


def _price_mad_sql() -> str:
    return (
        "WITH c AS (SELECT o_orderpriority AS pr, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents "
        "FROM orders), "
        "m AS (SELECT pr, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS "
        "med FROM c GROUP BY 1) "
        "SELECT pr, m.med, CAST(quantile_disc(abs(c.cents - m.med), 0.5) "
        "AS BIGINT) AS mad FROM c JOIN m USING (pr) "
        "GROUP BY pr, m.med ORDER BY pr"
    )


def _q_user_frontier(sf_dir: str):
    """Per-event-type user frontier (ops.pareto_front_2d_by): per
    type, the users no other user dominates on (event count, total
    value cents) — grouped aggregation collapses to one row per
    (type, user) first, then the zero-shuffle per-group skyline."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_pandas_agg, pareto_front_2d_by
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("value").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "user_id": t.column("user_id"),
                         "cents": pa.array(c, pa.int64())})

    per_user = grouped_pandas_agg(
        ev.map_batches(_prep, batch_format="pyarrow"),
        keys=["event_type", "user_id"],
        aggs={"n_events": ("cents", "count"),
              "val_c": ("cents", "sum")},
        key_fn=lambda b: _str_hash(b.column("event_type"))
        + np_col(b, "user_id").astype(np.int64) * np.int64(31),
        num_buckets=16)
    return pareto_front_2d_by(per_user, "event_type", "n_events",
                              "val_c")


def _user_frontier_sql() -> str:
    return (
        "WITH pu AS (SELECT event_type, user_id, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS "
        "val_c FROM events GROUP BY 1, 2) "
        "SELECT * FROM pu a WHERE NOT EXISTS ("
        "SELECT 1 FROM pu b WHERE b.event_type = a.event_type AND "
        "b.n_events >= a.n_events AND b.val_c >= a.val_c AND "
        "(b.n_events > a.n_events OR b.val_c > a.val_c)) "
        "ORDER BY event_type, user_id"
    )


def _q_incr_rollup(sf_dir: str):
    """Incremental view maintenance (ops.incremental_grouped_sum):
    yesterday's per-priority revenue rollup (version A of orders)
    updated to today's (version B — same deterministic versions as
    orders_diff) by re-aggregating ONLY the diff-touched keys' rows;
    the result is bit-identical to aggregating B from scratch, which
    is exactly what the oracle does."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, incremental_grouped_sum
    from essentials_rd.derive import _str_hash
    from essentials_rd.util import np_col

    def _load(drop_mod: int, bump11: bool):
        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderkey", "o_totalprice",
                                          "o_orderpriority"])

        def _prep(t: pa.Table) -> pa.Table:
            k = np_col(t, "o_orderkey")
            keep = (k % drop_mod) != 0
            p = np.asarray(t.column("o_totalprice").to_numpy(
                zero_copy_only=False), np.float64)
            v = np.floor(p * 100.0 + 0.5).astype(np.int64)
            if bump11:
                v = v + ((k % 11) == 0)
            return pa.table({
                "o_orderkey": pa.array(k[keep], pa.int64()),
                "pr": t.column("o_orderpriority").filter(pa.array(keep)),
                "v": pa.array(v[keep], pa.int64())})

        return orders.map_batches(_prep, batch_format="pyarrow")

    old, new = _load(7, False).materialize(), _load(5, True).materialize()
    old_rows = grouped_pandas_agg(
        old, keys=["pr"], aggs={"total": ("v", "sum")},
        key_fn=lambda b: _str_hash(b.column("pr")),
        num_buckets=4).take_all()
    old_rows.sort(key=lambda r: r["pr"])
    old_agg = pa.table({
        "pr": pa.array([r["pr"] for r in old_rows], pa.string()),
        "total": pa.array([r["total"] for r in old_rows], pa.int64())})
    return incremental_grouped_sum(old, new, "o_orderkey", "pr", "v",
                                   old_agg)


def _incr_rollup_sql() -> str:
    return (
        "SELECT o_orderpriority AS pr, CAST(sum(v) AS BIGINT) AS total "
        "FROM (SELECT o_orderkey, o_orderpriority, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) + "
        "CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END AS v "
        "FROM orders WHERE o_orderkey % 5 != 0) "
        "GROUP BY 1 ORDER BY 1"
    )


def _q_pareto_orders(sf_dir: str):
    """2-D skyline (ops.pareto_front_2d): orders on the
    (price, recency) pareto front — no other order is both at least as
    expensive AND at least as recent with one strict.  Per-block local
    fronts + one driver re-run of the same kernel; zero shuffle."""
    import ray.data as rd

    from essentials_rd.ops import pareto_front_2d

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice",
                                      "o_orderdate"])

    def _prep(t: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        day = (t.column("o_orderdate").cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "cents": pa.array(cents, pa.int64()),
                         "oday": pa.array(day, pa.int64())})

    return pareto_front_2d(orders.map_batches(_prep,
                                              batch_format="pyarrow"),
                           "cents", "oday")


def _pareto_orders_sql() -> str:
    return (
        "WITH c AS (SELECT o_orderkey, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents, "
        "CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT) AS oday "
        "FROM orders) "
        "SELECT * FROM c a WHERE NOT EXISTS ("
        "SELECT 1 FROM c b WHERE b.cents >= a.cents AND "
        "b.oday >= a.oday AND (b.cents > a.cents OR b.oday > a.oday)) "
        "ORDER BY cents DESC"
    )


COPART_P = 16


def _q_copart_join(sf_dir: str):
    """Co-partitioned storage join (sinks.copartitioned_join): orders
    and the per-order lineitem quantity rollup are both written through
    the resumable partitioned sink with the SAME splitmix64(o_orderkey)
    % P routing, then joined with ZERO shuffle — each partition pair
    merges in one Ray task reading exactly two files.  This is the
    bucketed-layout-reuse pattern that at 100 TB deletes the join
    exchange entirely; the sink cache under /tmp is _SUCCESS-gated so
    re-runs skip finished partitions."""
    import os

    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.sinks import copartitioned_join, write_partitioned
    from essentials_rd.util import np_col

    base = ("/tmp/essentials_rd_copart_"
            + os.path.basename(os.path.normpath(sf_dir)))
    key_fn = lambda b: np_col(b, "o_orderkey").astype(np.int64)  # noqa: E731

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    write_partitioned(orders, f"{base}/orders", key_fn, COPART_P)

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_quantity"])

    def _lprep(t: pa.Table) -> pa.Table:
        qty = np.floor(np.asarray(
            t.column("l_quantity").to_numpy(zero_copy_only=False),
            np.float64) + 0.5).astype(np.int64)
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "qty": pa.array(qty, pa.int64())})

    liagg = grouped_pandas_agg(
        line.map_batches(_lprep, batch_format="pyarrow"),
        keys=["o_orderkey"], aggs={"sum_qty": ("qty", "sum")},
        num_buckets=COPART_P)
    write_partitioned(liagg, f"{base}/liagg", key_fn, COPART_P)

    return copartitioned_join(f"{base}/orders", f"{base}/liagg",
                              COPART_P, on="o_orderkey", how="inner")


def _copart_join_sql() -> str:
    return (
        "SELECT o_orderkey, o_orderpriority, la.sum_qty FROM orders "
        "JOIN (SELECT l_orderkey AS o_orderkey, "
        "CAST(sum(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS "
        "sum_qty FROM lineitem GROUP BY 1) la USING (o_orderkey) "
        "ORDER BY o_orderkey"
    )


def _q_tpch_q7(sf_dir: str):
    """TPC-H Q7 volume shipping (essentials_rd.tpch.q7): nation-pair
    revenue per ship year, both directions between NATION_1/2."""
    from essentials_rd import tpch

    return tpch.q7(sf_dir)


def _q_tpch_q13(sf_dir: str):
    """TPC-H Q13 order-count distribution (essentials_rd.tpch.q13),
    zero-order customers included via the distributed left join."""
    from essentials_rd import tpch

    return tpch.q13(sf_dir)


def _q_tpch_q15(sf_dir: str):
    """TPC-H Q15 top supplier (essentials_rd.tpch.q15): quarter
    revenue leader under the (rev desc, suppkey) total order."""
    from essentials_rd import tpch

    return tpch.q15(sf_dir)


def _q_tpch_q17(sf_dir: str):
    """TPC-H Q17 small-quantity revenue (essentials_rd.tpch.q17):
    correlated 0.2·avg subquery as exact integer cross-multiplication."""
    from essentials_rd import tpch

    return tpch.q17(sf_dir)


def _q_tpch_q22(sf_dir: str):
    """TPC-H Q22 (essentials_rd.tpch.q22): above-average-balance
    customers with no orders, per nation; exact bal·n > Σ filter."""
    from essentials_rd import tpch

    return tpch.q22(sf_dir)


def _tpch_q7_sql() -> str:
    return (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "CAST(year(l_shipdate) AS BIGINT) AS l_year, "
        f"CAST(sum({_TPCH_REV}) AS BIGINT) AS revenue_u "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation sn ON sn.n_nationkey = s_nationkey "
        "JOIN nation cn ON cn.n_nationkey = c_nationkey "
        "WHERE sn.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', "
        "'NATION_3') AND cn.n_name IN ('NATION_0', 'NATION_1', "
        "'NATION_2', 'NATION_3') AND sn.n_name <> cn.n_name "
        "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
        "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
    )


def _tpch_q13_sql() -> str:
    return (
        "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
        "SELECT c_custkey, CAST(count(o_custkey) AS BIGINT) AS c_count "
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
        "GROUP BY 1) GROUP BY 1 ORDER BY 1"
    )


def _tpch_q15_sql() -> str:
    return (
        "SELECT l_suppkey AS s_suppkey, "
        f"CAST(sum({_TPCH_REV}) AS BIGINT) AS total_rev_u FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00' "
        "GROUP BY 1 ORDER BY total_rev_u DESC, s_suppkey LIMIT 1"
    )


def _tpch_q17_sql() -> str:
    return (
        "WITH li AS (SELECT l_partkey, "
        "CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty, "
        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#12'), "
        "st AS (SELECT l_partkey, sum(qty) AS sum_qty, "
        "count(*) AS n_li FROM li GROUP BY 1) "
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(COALESCE(sum(cents), 0) AS BIGINT) AS sum_cents "
        "FROM li JOIN st USING (l_partkey) "
        "WHERE 5 * qty * n_li < sum_qty"
    )


def _tpch_q22_sql() -> str:
    return (
        "WITH cb AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS "
        "c_nationkey, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c "
        "FROM customer), "
        "g AS (SELECT sum(bal_c) AS s, count(*) AS n FROM cb "
        "WHERE bal_c > 0) "
        "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust, "
        "CAST(sum(bal_c) AS BIGINT) AS totacctbal_c "
        "FROM cb, g WHERE bal_c * g.n > g.s "
        "AND c_custkey NOT IN (SELECT o_custkey FROM orders "
        "WHERE o_orderpriority = '1-URGENT') "
        "GROUP BY 1 ORDER BY 1"
    )


def _q_tpch_q2(sf_dir: str):
    """TPC-H Q2 min-cost supplier (essentials_rd.tpch.q2), adapted:
    per small-LARGE part, the EUROPE supplier with min shipped cents
    (tie-break min suppkey); top-k by balance."""
    from essentials_rd import tpch

    return tpch.q2(sf_dir)


def _q_tpch_q8(sf_dir: str):
    """TPC-H Q8 national market share (essentials_rd.tpch.q8): exact
    (total, nation) revenue int64 pair per order year."""
    from essentials_rd import tpch

    return tpch.q8(sf_dir)


def _q_tpch_q9(sf_dir: str):
    """TPC-H Q9 product profit (essentials_rd.tpch.q9), adapted to
    revenue (no ps_supplycost), per (supplier nation, order year)."""
    from essentials_rd import tpch

    return tpch.q9(sf_dir)


def _q_tpch_q11(sf_dir: str):
    """TPC-H Q11 important stock (essentials_rd.tpch.q11): parts with
    >1.5x-average shipped value from EUROPE suppliers, exact ints."""
    from essentials_rd import tpch

    return tpch.q11(sf_dir)


def _q_tpch_q16(sf_dir: str):
    """TPC-H Q16 supplier-count per part combo (essentials_rd.tpch.q16),
    distinct suppliers, low-balance suppliers excluded."""
    from essentials_rd import tpch

    return tpch.q16(sf_dir)


def _q_tpch_q19(sf_dir: str):
    """TPC-H Q19 disjunctive-predicate revenue (essentials_rd.tpch.q19):
    three (brand, size-band, qty-band) branches, zero shuffle."""
    from essentials_rd import tpch

    return tpch.q19(sf_dir)


def _q_tpch_q20(sf_dir: str):
    """TPC-H Q20 part promotion (essentials_rd.tpch.q20), adapted:
    suppliers dominating a 'small '-part's 1997 shipments (2q_s>q_tot)."""
    from essentials_rd import tpch

    return tpch.q20(sf_dir)


def _q_tpch_q21(sf_dir: str):
    """TPC-H Q21 waiting suppliers (essentials_rd.tpch.q21), adapted:
    unique 'R'-returning supplier on finished multi-supplier orders."""
    from essentials_rd import tpch

    return tpch.q21(sf_dir)


def _tpch_q2_sql() -> str:
    return (
        "WITH sup AS (SELECT s_suppkey, s_name, "
        "CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS bal_c, n_name "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'EUROPE'), "
        "pk AS (SELECT p_partkey FROM part WHERE p_size <= 10 "
        "AND p_type = 'LARGE'), "
        "pp AS (SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, "
        "sum(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS cost_c "
        "FROM lineitem JOIN pk ON p_partkey = l_partkey "
        "JOIN sup ON sup.s_suppkey = l_suppkey GROUP BY 1, 2), "
        "mn AS (SELECT p_partkey, min(cost_c) AS min_c FROM pp "
        "GROUP BY 1), "
        "win AS (SELECT pp.p_partkey, min(pp.s_suppkey) AS s_suppkey "
        "FROM pp JOIN mn ON pp.p_partkey = mn.p_partkey "
        "AND pp.cost_c = mn.min_c GROUP BY 1) "
        "SELECT sup.bal_c AS s_acctbal_c, win.s_suppkey AS s_suppkey, "
        "sup.s_name, sup.n_name, win.p_partkey "
        "FROM win JOIN sup ON sup.s_suppkey = win.s_suppkey "
        "ORDER BY s_acctbal_c DESC, win.s_suppkey, p_partkey LIMIT 100"
    )


def _tpch_q8_sql() -> str:
    return (
        "WITH pk AS (SELECT p_partkey FROM part "
        "WHERE p_type = 'ECONOMY'), "
        "rc AS (SELECT c_custkey FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA'), "
        "o AS (SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS "
        "o_year FROM orders JOIN rc ON o_custkey = c_custkey "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'), "
        "sn AS (SELECT s_suppkey, n_name FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey) "
        f"SELECT o_year, CAST(sum({_TPCH_REV}) AS BIGINT) AS total_rev_u, "
        f"CAST(COALESCE(sum({_TPCH_REV}) FILTER (WHERE n_name = "
        "'NATION_2'), 0) AS BIGINT) AS nation_rev_u "
        "FROM lineitem JOIN pk ON l_partkey = p_partkey "
        "JOIN o ON l_orderkey = o_orderkey "
        "JOIN sn ON l_suppkey = sn.s_suppkey "
        "GROUP BY 1 ORDER BY 1"
    )


def _tpch_q9_sql() -> str:
    return (
        "SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, "
        f"CAST(sum({_TPCH_REV}) AS BIGINT) AS profit_u "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "WHERE p_name LIKE '%widget%' "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )


def _tpch_q11_sql() -> str:
    return (
        "WITH sup AS (SELECT s_suppkey FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'EUROPE'), "
        "v AS (SELECT l_partkey AS p_partkey, "
        "sum(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS value_c "
        "FROM lineitem JOIN sup ON l_suppkey = s_suppkey GROUP BY 1), "
        "g AS (SELECT sum(value_c) AS total, count(*) AS n FROM v) "
        "SELECT p_partkey, CAST(value_c AS BIGINT) AS value_c "
        "FROM v, g WHERE 2 * value_c * g.n > 3 * g.total "
        "ORDER BY value_c DESC, p_partkey"
    )


def _tpch_q16_sql() -> str:
    return (
        "WITH pk AS (SELECT p_partkey, p_brand, p_type, "
        "CAST(p_size AS BIGINT) AS p_size FROM part "
        "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' "
        "AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)), "
        "pairs AS (SELECT DISTINCT p_brand, p_type, p_size, l_suppkey "
        "FROM lineitem JOIN pk ON p_partkey = l_partkey "
        "WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier "
        "WHERE s_acctbal < 1000.0)) "
        "SELECT p_brand, p_type, p_size, "
        "CAST(count(*) AS BIGINT) AS supplier_cnt FROM pairs "
        "GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, 1, 2, 3"
    )


def _tpch_q19_sql() -> str:
    _q = "CAST(ROUND(l_quantity, 0) AS BIGINT)"
    return (
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        f"CAST(COALESCE(sum({_TPCH_REV}), 0) AS BIGINT) AS rev_u "
        "FROM lineitem JOIN part ON p_partkey = l_partkey WHERE "
        f"(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND {_q} "
        "BETWEEN 1 AND 11) OR "
        f"(p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND {_q} "
        "BETWEEN 10 AND 20) OR "
        f"(p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND {_q} "
        "BETWEEN 20 AND 30)"
    )


def _tpch_q20_sql() -> str:
    return (
        "WITH pk AS (SELECT p_partkey FROM part "
        "WHERE p_name LIKE 'small %'), "
        "pp AS (SELECT l_partkey, l_suppkey, "
        "sum(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS qty_s "
        "FROM lineitem JOIN pk ON p_partkey = l_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
        "GROUP BY 1, 2), "
        "tot AS (SELECT l_partkey, sum(qty_s) AS qty_total FROM pp "
        "GROUP BY 1) "
        "SELECT DISTINCT pp.l_suppkey AS s_suppkey, s_name "
        "FROM pp JOIN tot ON pp.l_partkey = tot.l_partkey "
        "JOIN supplier ON s_suppkey = pp.l_suppkey "
        "WHERE 2 * pp.qty_s > tot.qty_total ORDER BY s_suppkey"
    )


def _tpch_q21_sql() -> str:
    return (
        "WITH li AS (SELECT l_orderkey AS o_orderkey, l_suppkey AS "
        "s_suppkey, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r "
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "WHERE o_orderstatus = 'F'), "
        "pp AS (SELECT o_orderkey, s_suppkey, max(r) AS any_r FROM li "
        "GROUP BY 1, 2), "
        "po AS (SELECT o_orderkey, count(*) AS n_supp, sum(any_r) AS "
        "n_r FROM pp GROUP BY 1), "
        "blamed AS (SELECT pp.s_suppkey FROM pp JOIN po USING "
        "(o_orderkey) WHERE any_r = 1 AND n_supp >= 2 AND n_r = 1) "
        "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait "
        "FROM blamed JOIN supplier USING (s_suppkey) "
        "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100"
    )


def _q_two_hop_sizes(sf_dir: str):
    """Exact distinct 2-hop neighborhood size per vertex
    (algorithms.similarity.two_hop_counts) — the r=2 neighborhood
    function over the co-purchase graph; one mid-vertex self-join +
    two bucketed collapses, zeros filled from the vertex id vector."""
    from essentials_rd.algorithms.similarity import two_hop_counts

    g, edges = _graph(sf_dir)
    return two_hop_counts(g, edges.select_columns(["src", "dst"]))


def _two_hop_sql() -> str:
    return f"""
WITH {_GRAPH_CTES},
two AS (
  SELECT e1.src AS v, e2.dst AS w
  FROM sym e1 JOIN sym e2 ON e1.dst = e2.src
  WHERE e2.dst <> e1.src
  UNION
  SELECT src AS v, dst AS w FROM sym
)
SELECT v.vid, CAST(COALESCE(t.c, 0) AS BIGINT) AS n2
FROM verts v LEFT JOIN (
  SELECT v AS vid, count(*) AS c FROM two GROUP BY 1) t
ON t.vid = v.vid ORDER BY v.vid
"""


def _q_orders_cube(sf_dir: str):
    """CUBE grouping sets (ops.rollup_agg cube=True) over orders by
    (priority, status): all four grouping sets in ONE scan via
    per-block per-set partials; revenue as half-up cents per row so
    every total is integer-exact at any partitioning."""
    import ray.data as rd

    from essentials_rd.ops import rollup_agg
    from essentials_rd.util import np_col as _nc

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(_nc(t, "o_totalprice") * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "o_orderstatus": t.column("o_orderstatus"),
                "cents": pa.array(c, pa.int64()),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    ).map_batches(_cents, batch_format="pyarrow")
    out = rollup_agg(orders, ["o_orderpriority", "o_orderstatus"],
                     "cents", cube=True)

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["o_orderpriority", "o_orderstatus", "n_orders", "total_cents"]
        )

    return out.map_batches(_rename, batch_format="pyarrow")


HB_P = 4        # HyperBall register precision (16 registers/vertex)
HB_ROUNDS = 2   # ball radius — cross-validated against two_hop_sizes


def _q_hyperball_r2(sf_dir: str):
    """HyperBall (algorithms.hyperball): per-vertex HLL sketches of
    the radius-2 ball, kept sparse as (vid, reg, rho) rows — one
    edge join + one (vid, reg) grouped max per round; the 100-TB
    neighborhood-function path where exact two_hop_sizes' sum-deg²
    intermediate outgrows the cluster.  Registers (not the float
    estimate) ship to the oracle, bit-for-bit."""
    from essentials_rd.algorithms.hyperball import hyperball

    g, edges = _graph(sf_dir)
    return hyperball(g, edges.select_columns(["src", "dst"]),
                     p=HB_P, rounds=HB_ROUNDS)


def _hyperball_sql() -> str:
    chain = _sm64_ctes("hbz", "vid", "vid", "verts")
    unroll, last = _hll_unroll_ctes("vid", "hbz3", HB_P)
    steps = [
        f"b0 AS (SELECT vid, CAST(reg AS BIGINT) AS reg, "
        f"CAST(rnk + 1 AS BIGINT) AS rho FROM {last})"]
    for i in range(HB_ROUNDS):
        steps.append(
            f"b{i + 1} AS (SELECT vid, reg, max(rho) AS rho FROM ("
            f"SELECT e.dst AS vid, b.reg, b.rho FROM sym e "
            f"JOIN b{i} b ON b.vid = e.src "
            f"UNION ALL SELECT vid, reg, rho FROM b{i}) GROUP BY 1, 2)")
    body = ", ".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {chain}, {unroll}, {body} "
        f"SELECT vid, reg, CAST(rho AS BIGINT) AS rho FROM b{HB_ROUNDS} "
        "ORDER BY 1, 2"
    )


WL_ROUNDS = 3   # 1-WL refinement depth (depth-3 neighborhood trees)


def _q_wl_colors(sf_dir: str):
    """Weisfeiler–Leman color refinement (algorithms.wl.wl_refine):
    3 rounds of the 1-WL structural fingerprint over the co-purchase
    graph — c₀ = degree, each round folds the neighbour-color multiset
    order-invariantly (wrapped sum / xor / count of splitmix64(c)) and
    rehashes with the vertex's own color, so colors are a pure
    function of graph structure (isomorphic components ⇒ identical
    color multisets, pinned in pytest).  One partitioned join + one
    bucketed exchange per round; the color table rides the exchange
    so no 64-bit value crosses a pandas left join."""
    from essentials_rd.algorithms.wl import wl_refine

    g, edges = _graph(sf_dir)
    return wl_refine(g, edges.select_columns(["src", "dst"]),
                     rounds=WL_ROUNDS)


def _wl_sql() -> str:
    half = "CAST(9223372036854775808 AS UBIGINT)"
    steps = ["w0 AS MATERIALIZED "
             "(SELECT vid, CAST(outdeg AS UBIGINT) AS c FROM deg)"]
    for k in range(WL_ROUNDS):
        steps.append(_sm64_ctes(f"wm{k}_", "vid", "c", f"w{k}"))
        steps.append(
            f"wg{k} AS MATERIALIZED (SELECT e.dst AS vid, m.z "
            f"FROM sym e JOIN wm{k}_3 m ON m.vid = e.src)")
        steps.append(
            f"wa{k} AS MATERIALIZED (SELECT vid, "
            f"CAST(sum(CAST(z AS HUGEINT)) % {_MOD64} AS UBIGINT) AS s, "
            f"bit_xor(z) AS x, CAST(count(*) AS HUGEINT) AS n "
            f"FROM wg{k} GROUP BY vid)")
        steps.append(
            f"wc{k} AS MATERIALIZED (SELECT v.vid, "
            f"CAST((5 * CAST(v.c AS HUGEINT) "
            f"+ 3 * CAST(COALESCE(a.s, 0) AS HUGEINT) "
            f"+ 7 * CAST(COALESCE(a.x, 0) AS HUGEINT) "
            f"+ COALESCE(a.n, 0)) % {_MOD64} AS UBIGINT) AS k "
            f"FROM w{k} v LEFT JOIN wa{k} a ON a.vid = v.vid)")
        steps.append(_sm64_ctes(f"wn{k}_", "vid", "k", f"wc{k}"))
        steps.append(
            f"w{k + 1} AS MATERIALIZED (SELECT vid, z AS c FROM wn{k}_3)")
    body = ", ".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT vid, CAST(CASE WHEN c >= {half} "
        f"THEN CAST(c AS HUGEINT) - {_MOD64} "
        f"ELSE CAST(c AS HUGEINT) END AS BIGINT) AS color "
        f"FROM w{WL_ROUNDS} ORDER BY vid"
    )


TR_TMOD = 32    # edge activation times 0..31 (splitmix of the pair)
TR_ITERS = 24   # oracle unroll depth; engine convergence asserted <=


def _q_temporal_reach(sf_dir: str):
    """Temporal earliest-arrival reachability (algorithms.temporal):
    every co-purchase edge gets a deterministic activation time
    splitmix64(src·2³² + dst) mod 32 (the shared SplitMix64 chain, a
    pure function of the canonical pair), and an edge may only extend
    a path that has arrived by its time — the time-respecting path
    class static BFS cannot express.  Edge times ride the CSR weights
    lane; one filtered-relaxation superstep per round to fixpoint.
    Monotone min ⇒ the fixed-k unrolled oracle matches exactly."""
    import os as _os
    import tempfile

    import ray

    from essentials_rd.algorithms.temporal import temporal_reach
    from essentials_rd.graph import build_graph
    from essentials_rd.util import hash64, np_col

    g, edges = _graph(sf_dir)
    vids = ray.get(g.vertex_ids_ref)
    src_vid = int(vids.min())

    def _times(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64).view(np.uint64)
        d = np_col(t, "dst").astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            key = (s << np.uint64(32)) + d
        tt = (hash64(key.view(np.int64)).view(np.uint64)
              % np.uint64(TR_TMOD)).astype(np.float64)
        return pa.table({"src": pa.array(s.view(np.int64), pa.int64()),
                         "dst": pa.array(d.view(np.int64), pa.int64()),
                         "weight": pa.array(tt, pa.float64())})

    te = edges.select_columns(["src", "dst"]).map_batches(
        _times, batch_format="pyarrow")
    gt = build_graph(te, _os.path.join(tempfile.gettempdir(),
                                       "essentials_rd_treach"),
                     g.num_parts, symmetrize=True, weighted=True,
                     persist=False, vertex_ids=vids)
    res = temporal_reach(gt, src_vid, max_iters=200,
                         checkpoint_every=0, scatter_mode="fused")
    assert res.supersteps <= TR_ITERS, res.supersteps
    t = res.state_table(["arr"])
    arr = np.asarray(t["arr"], np.float64)
    out = np.where(np.isfinite(arr), arr, -1.0).astype(np.int64)
    return pa.table({"vid": t["vid"],
                     "arr": pa.array(out, pa.int64())})


def _temporal_reach_sql() -> str:
    big = 1 << 60
    chain = _sm64_ctes("trz", "src, dst", "src * 4294967296 + dst",
                       "pairs")
    steps = [
        f"tt AS MATERIALIZED (SELECT src, dst, "
        f"CAST(z % {TR_TMOD} AS BIGINT) AS t FROM trz3)",
        "symt AS MATERIALIZED (SELECT src, dst, t FROM tt "
        "UNION ALL SELECT dst AS src, src AS dst, t FROM tt)",
        "trsrc AS (SELECT min(vid) AS s FROM verts)",
        f"ta0 AS MATERIALIZED (SELECT vid, CASE WHEN vid = "
        f"(SELECT s FROM trsrc) THEN 0 ELSE {big} END AS arr FROM verts)",
    ]
    for k in range(TR_ITERS):
        steps.append(f"""
trm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(e.t) AS mt
  FROM symt e JOIN ta{k} s ON s.vid = e.src
  WHERE s.arr < {big} AND e.t >= s.arr GROUP BY e.dst
),
ta{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.arr, COALESCE(m.mt, v.arr)) AS arr
  FROM ta{k} v LEFT JOIN trm{k} m ON m.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {chain}, {body} "
        f"SELECT vid, CASE WHEN arr >= {big} THEN -1 ELSE arr END AS arr "
        f"FROM ta{TR_ITERS} ORDER BY vid"
    )


RM_SCALE = 7     # R-MAT: 2^7 = 128 vertices
RM_EDGES = 2000
RM_SEED = 7


def _q_rmat_edges(sf_dir: str):
    """Deterministic R-MAT generator (sources.rmat_edges — the
    Graph500 Kronecker edge factory with EXACT dyadic (9,3,3,1)/16
    quadrant probabilities): every edge is a pure function of its
    index via one splitmix64 draw (one nibble per recursion level),
    so generation is zero-I/O, zero-shuffle, identical at any
    parallelism — and bit-reproducible in SQL."""
    from essentials_rd.sources import rmat_edges

    out = rmat_edges(RM_SCALE, RM_EDGES, seed=RM_SEED).take_all()
    out.sort(key=lambda r: r["i"])
    return pa.table({
        "i": pa.array([r["i"] for r in out], pa.int64()),
        "src": pa.array([r["src"] for r in out], pa.int64()),
        "dst": pa.array([r["dst"] for r in out], pa.int64()),
    })


def _rmat_sql() -> str:
    mix = (RM_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes("rmz", "i", f"i + {mix}",
                       f"(SELECT unnest(range({RM_EDGES})) AS i)")
    src = " + ".join(
        f"(CASE WHEN ((z >> {4 * lvl}) & 15) >= 12 THEN "
        f"{1 << (RM_SCALE - 1 - lvl)} ELSE 0 END)"
        for lvl in range(RM_SCALE))
    dst = " + ".join(
        f"(CASE WHEN (((z >> {4 * lvl}) & 15) >= 9 AND "
        f"((z >> {4 * lvl}) & 15) < 12) OR ((z >> {4 * lvl}) & 15) >= 15 "
        f"THEN {1 << (RM_SCALE - 1 - lvl)} ELSE 0 END)"
        for lvl in range(RM_SCALE))
    return (
        f"WITH {chain} "
        f"SELECT i, CAST({src} AS BIGINT) AS src, "
        f"CAST({dst} AS BIGINT) AS dst FROM rmz3 ORDER BY i"
    )


MEDIA_IMG_N = 48    # coded PPM images through the real netpbm decoder
MEDIA_WAV_N = 40    # coded WAV PCM16 clips through the real RIFF decoder
MEDIA_SEED = 7


def _q_media_img_stats(sf_dir: str):
    """REAL image decode (multimodal.decode_netpbm): synthesize binary
    P6 PPM payloads whose pixel stream is splitmix64(i·2³² + j +
    seed·golden) mod 256 — a pure function of (media_id, j) — encode
    them to actual netpbm bytes, ship through the MediaStatsStage actor
    pool, and emit exact int64 (count, sum, min, max) per image.  The
    SQL twin replays the pixel stream via the shared _sm64_ctes chain
    without ever seeing a payload, so equality certifies the
    encode→decode round trip is bit-exact end to end."""
    import ray.data as rd

    from essentials_rd.multimodal import media_stats, synth_coded_media

    media = rd.from_arrow(synth_coded_media(MEDIA_IMG_N, kind="image",
                                            seed=MEDIA_SEED))
    out = media_stats(media).drop_columns(["sample_rate"]).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        k: pa.array([r[k] for r in out], pa.int64())
        for k in ("media_id", "n_vals", "val_sum", "val_min", "val_max")
    })


def _q_wav_features(sf_dir: str):
    """REAL audio feature extraction (multimodal.WavFeatureStage):
    decode the coded PCM16 WAVs and emit time-domain features — zero
    crossings (adjacent-sample product < 0) and absolute peak — exact
    integers; the SQL twin replays the sample stream through the
    shared splitmix chain and a LAG window, certifying decode →
    feature end to end."""
    import ray.data as rd

    from essentials_rd.multimodal import synth_coded_media, wav_features

    media = rd.from_arrow(synth_coded_media(MEDIA_WAV_N, kind="audio",
                                            seed=MEDIA_SEED))
    out = wav_features(media).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        k: pa.array([r[k] for r in out], pa.int64())
        for k in ("media_id", "n_samples", "zero_crossings",
                  "abs_peak")
    })


def _wav_features_sql() -> str:
    mix = (MEDIA_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "wf", "media_id, j", f"media_id * 4294967296 + j + {mix}", "pix")
    return (
        "WITH dims AS (SELECT i AS media_id, "
        f"CAST(400 + 61 * (i % 7) AS BIGINT) AS nv "
        f"FROM (SELECT unnest(range({MEDIA_WAV_N})) AS i)), "
        "pix AS (SELECT media_id, unnest(range(nv)) AS j FROM dims), "
        f"{chain}, "
        "sm AS (SELECT media_id, j, "
        "CAST(z % 65536 AS BIGINT) - 32768 AS s FROM wf3), "
        "lg AS (SELECT media_id, s, lag(s) OVER ("
        "PARTITION BY media_id ORDER BY j) AS ps FROM sm) "
        "SELECT media_id, CAST(count(*) AS BIGINT) AS n_samples, "
        "CAST(COALESCE(SUM(CASE WHEN ps * s < 0 THEN 1 ELSE 0 END), 0) "
        "AS BIGINT) AS zero_crossings, "
        "CAST(max(abs(s)) AS BIGINT) AS abs_peak "
        "FROM lg GROUP BY media_id ORDER BY media_id"
    )


MEDIA_JPEG_N = 36   # coded images through the pure-NumPy T.81 JPEG codec


def _q_media_jpeg_roundtrip(sf_dir: str):
    """REAL baseline-JPEG codec (jpegc: pure-NumPy T.81 — markers,
    canonical Huffman with byte stuffing, dequant + IDCT): synthesize
    splitmix-chain images (grayscale even ids / RGB 4:4:4 odd), encode
    to actual JPEG bytes, decode through the JpegVerifyStage actor pool
    which ASSERTS the decoder reproduces the encoder's exact expected
    reconstruction bit-for-bit (one wrong entropy bit scrambles every
    later block, so the assert pins the whole lossy round trip — the
    query ERRORS on any decode drift).  The emitted facts — parsed
    dims/components/quality and the coded-pixel sum — are closed forms
    of media_id plus the shared splitmix chain, which the SQL twin
    replays without ever seeing a byte; DCT arithmetic itself is pinned
    by the in-stage assert, not the oracle (SQL cannot run an 8×8 float
    IDCT honestly)."""
    import ray.data as rd

    from essentials_rd.multimodal import jpeg_roundtrip, synth_coded_jpeg

    media = rd.from_arrow(synth_coded_jpeg(MEDIA_JPEG_N, seed=MEDIA_SEED))
    out = jpeg_roundtrip(media).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        k: pa.array([r[k] for r in out], pa.int64())
        for k in ("media_id", "width", "height", "n_components",
                  "quality", "coded_sum")
    })


def _media_jpeg_sql() -> str:
    # literals on purpose (twin-independence) — engine MEDIA_SEED=7,
    # MEDIA_JPEG_N=36 frozen
    MEDIA_SEED = 7
    MEDIA_JPEG_N = 36
    mix = (MEDIA_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "jp", "media_id, j", f"media_id * 4294967296 + j + {mix}", "pix")
    return (
        "WITH dims AS (SELECT i AS media_id, "
        "CAST(9 + (i % 5) * 7 AS BIGINT) AS width, "
        "CAST(10 + (i % 4) * 9 AS BIGINT) AS height, "
        "CAST(CASE WHEN i % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) "
        "AS n_components, "
        "CAST(35 + (i % 3) * 30 AS BIGINT) AS quality "
        f"FROM (SELECT unnest(range({MEDIA_JPEG_N})) AS i)), "
        "pix AS (SELECT media_id, "
        "unnest(range(width * height * n_components)) AS j FROM dims), "
        f"{chain}, "
        "sums AS (SELECT media_id, "
        "CAST(SUM(CAST(z % 256 AS BIGINT)) AS BIGINT) AS coded_sum "
        "FROM jp3 GROUP BY media_id) "
        "SELECT d.media_id, d.width, d.height, d.n_components, d.quality, "
        "s.coded_sum FROM dims d JOIN sums s USING (media_id) "
        "ORDER BY d.media_id"
    )


def _q_media_jpeg_quality(sf_dir: str):
    """JPEG encoder forensics (jpegc.probe_quality): recover each
    image's quality factor purely from its STORED luminance
    quantization table — marker-walk the real bytes, invert the
    Annex-K scaling (scales are injective across both quality regimes,
    so the smallest exact match IS the encoder's q).  The SQL twin
    replays the closed-form per-id quality, so a hash match certifies
    the DQT parse + formula inverse end to end; a stream whose tables
    match no q would surface as -1 and break the hash."""
    import ray.data as rd

    from essentials_rd.jpegc import probe_quality
    from essentials_rd.multimodal import synth_coded_jpeg

    media = rd.from_arrow(
        synth_coded_jpeg(MEDIA_JPEG_N, seed=MEDIA_SEED)
        .select(["media_id", "payload"])
    )

    def _probe(t: pa.Table) -> pa.Table:
        q = [probe_quality(p.as_py()) for p in t.column("payload")]
        return pa.table({
            "media_id": t.column("media_id"),
            "quality": pa.array(np.asarray(q, np.int64), pa.int64()),
        })

    out = media.map_batches(_probe, batch_format="pyarrow",
                            batch_size=8).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        "media_id": pa.array([r["media_id"] for r in out], pa.int64()),
        "quality": pa.array([r["quality"] for r in out], pa.int64()),
    })


def _media_jpeg_quality_sql() -> str:
    return (
        "SELECT CAST(i AS BIGINT) AS media_id, "
        "CAST(35 + (i % 3) * 30 AS BIGINT) AS quality "
        f"FROM (SELECT unnest(range({MEDIA_JPEG_N})) AS i) ORDER BY i"
    )


MEDIA_PNG_N = 24


def _q_media_png_roundtrip(sf_dir: str):
    """REAL PNG codec (pngc: RFC 2083 — chunk CRC-32 verification,
    stdlib-zlib inflate, the five scanline defilters): synthesize
    splitmix-chain images cycling all four supported color types
    (gray / gray+alpha / RGB / RGBA) and all three deflate block kinds
    (zlib level 0 stored / 6 fixed+dynamic / 9 dynamic), encode to
    actual PNG bytes, decode through the PngVerifyStage actor pool
    which ASSERTS losslessness (decoded bit-equal to the ORIGINAL
    pixels — stronger than JPEG's shipped-reconstruction contract).
    The emitted facts — dims/channels and the DECODED-pixel sum — are
    closed forms of media_id plus the shared splitmix chain, which the
    SQL twin replays without ever seeing a byte; a silent decode
    corruption therefore fails the oracle, not just the in-stage
    assert."""
    import ray.data as rd

    from essentials_rd.multimodal import png_roundtrip, synth_coded_png

    media = rd.from_arrow(synth_coded_png(MEDIA_PNG_N, seed=MEDIA_SEED))
    out = png_roundtrip(media).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        k: pa.array([r[k] for r in out], pa.int64())
        for k in ("media_id", "width", "height", "n_channels",
                  "decoded_sum")
    })


def _media_png_sql() -> str:
    # literals on purpose (twin-independence) — engine MEDIA_SEED=7,
    # MEDIA_PNG_N=24 frozen
    MEDIA_SEED = 7
    MEDIA_PNG_N = 24
    mix = (MEDIA_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "pg", "media_id, j", f"media_id * 4294967296 + j + {mix}", "pix")
    return (
        "WITH dims AS (SELECT i AS media_id, "
        "CAST(6 + (i % 6) * 5 AS BIGINT) AS width, "
        "CAST(7 + (i % 5) * 6 AS BIGINT) AS height, "
        "CAST(1 + (i % 4) AS BIGINT) AS n_channels "
        f"FROM (SELECT unnest(range({MEDIA_PNG_N})) AS i)), "
        "pix AS (SELECT media_id, "
        "unnest(range(width * height * n_channels)) AS j FROM dims), "
        f"{chain}, "
        "sums AS (SELECT media_id, "
        "CAST(SUM(CAST(z % 256 AS BIGINT)) AS BIGINT) AS decoded_sum "
        "FROM pg3 GROUP BY media_id) "
        "SELECT d.media_id, d.width, d.height, d.n_channels, "
        "s.decoded_sum FROM dims d JOIN sums s USING (media_id) "
        "ORDER BY d.media_id"
    )


def _q_media_resize(sf_dir: str):
    """REAL image resize (multimodal.ResizeStatsStage): decode the coded P6
    PPMs, downsample 2× nearest-neighbor (every even row/column), emit
    exact integer stats of the RESIZED stream + output dims.  The SQL
    twin replays ONLY the kept pixels' coded indices j =
    (2r·W + 2c)·3 + ch through the shared splitmix chain — equality
    certifies decode → transform → stat end to end without the oracle
    ever seeing a byte."""
    import ray.data as rd

    from essentials_rd.multimodal import media_resize, synth_coded_media

    media = rd.from_arrow(synth_coded_media(MEDIA_IMG_N, kind="image",
                                            seed=MEDIA_SEED))
    out = media_resize(media).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        k: pa.array([r[k] for r in out], pa.int64())
        for k in ("media_id", "out_w", "out_h", "n_vals", "val_sum",
                  "val_min", "val_max")
    })


def _media_resize_sql() -> str:
    mix = (MEDIA_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "rz", "media_id, ow, oh",
        f"media_id * 4294967296 + j + {mix}", "pix")
    return (
        "WITH dims AS (SELECT i AS media_id, "
        "CAST(12 + (i % 5) * 2 AS BIGINT) AS w, "
        "CAST(8 + (i % 3) * 3 AS BIGINT) AS h, "
        "CAST((12 + (i % 5) * 2 + 1) // 2 AS BIGINT) AS ow, "
        "CAST((8 + (i % 3) * 3 + 1) // 2 AS BIGINT) AS oh "
        f"FROM (SELECT unnest(range({MEDIA_IMG_N})) AS i)), "
        "pix AS (SELECT media_id, ow, oh, "
        "((2 * (k // (ow * 3))) * w + 2 * ((k % (ow * 3)) // 3)) * 3 "
        "+ k % 3 AS j FROM (SELECT media_id, w, h, ow, oh, "
        "unnest(range(ow * oh * 3)) AS k FROM dims)), "
        f"{chain} "
        "SELECT media_id, CAST(max(ow) AS BIGINT) AS out_w, "
        "CAST(max(oh) AS BIGINT) AS out_h, "
        "CAST(count(*) AS BIGINT) AS n_vals, "
        "CAST(sum(z % 256) AS BIGINT) AS val_sum, "
        "CAST(min(z % 256) AS BIGINT) AS val_min, "
        "CAST(max(z % 256) AS BIGINT) AS val_max "
        "FROM rz3 GROUP BY media_id ORDER BY media_id"
    )


def _q_media_wav_stats(sf_dir: str):
    """REAL audio decode (multimodal.decode_wav_pcm16): RIFF WAV PCM16
    payloads whose sample stream is splitmix64(...) mod 2¹⁶ − 32768;
    exact int64 stats per clip plus the sample_rate parsed from the
    fmt chunk — same oracle construction as media_img_stats."""
    import ray.data as rd

    from essentials_rd.multimodal import media_stats, synth_coded_media

    media = rd.from_arrow(synth_coded_media(MEDIA_WAV_N, kind="audio",
                                            seed=MEDIA_SEED))
    out = media_stats(media).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        k: pa.array([r[k] for r in out], pa.int64())
        for k in ("media_id", "n_vals", "val_sum", "val_min", "val_max",
                  "sample_rate")
    })


def _media_img_sql() -> str:
    mix = (MEDIA_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "mz", "media_id", f"media_id * 4294967296 + j + {mix}", "pix")
    return (
        "WITH dims AS (SELECT i AS media_id, "
        "CAST((12 + (i % 5) * 2) * (8 + (i % 3) * 3) * 3 AS BIGINT) AS nv "
        f"FROM (SELECT unnest(range({MEDIA_IMG_N})) AS i)), "
        "pix AS (SELECT media_id, unnest(range(nv)) AS j FROM dims), "
        f"{chain} "
        "SELECT media_id, CAST(count(*) AS BIGINT) AS n_vals, "
        "CAST(sum(z % 256) AS BIGINT) AS val_sum, "
        "CAST(min(z % 256) AS BIGINT) AS val_min, "
        "CAST(max(z % 256) AS BIGINT) AS val_max "
        "FROM mz3 GROUP BY media_id ORDER BY media_id"
    )


def _media_wav_sql() -> str:
    mix = (MEDIA_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "wvz", "media_id", f"media_id * 4294967296 + j + {mix}", "pix")
    return (
        "WITH dims AS (SELECT i AS media_id, "
        f"CAST(400 + 61 * (i % 7) AS BIGINT) AS nv "
        f"FROM (SELECT unnest(range({MEDIA_WAV_N})) AS i)), "
        "pix AS (SELECT media_id, unnest(range(nv)) AS j FROM dims), "
        f"{chain} "
        "SELECT media_id, CAST(count(*) AS BIGINT) AS n_vals, "
        "CAST(sum(CAST(z % 65536 AS BIGINT) - 32768) AS BIGINT) AS val_sum, "
        "CAST(min(CAST(z % 65536 AS BIGINT) - 32768) AS BIGINT) AS val_min, "
        "CAST(max(CAST(z % 65536 AS BIGINT) - 32768) AS BIGINT) AS val_max, "
        "CAST(8000 + 4000 * (media_id % 3) AS BIGINT) AS sample_rate "
        "FROM wvz3 GROUP BY media_id ORDER BY media_id"
    )


def _q_media_sobel(sf_dir: str):
    """REAL image convolution (multimodal.SobelStage): decode the
    coded P6 PPMs, collapse to an integer luma plane (r + 2g + b), run
    the classic 3×3 Sobel Gx/Gy stencils over interior pixels and emit
    exact int64 stats of |Gx| + |Gy| — the first real convolution
    through the media path.  The SQL twin rebuilds the luma plane from
    the shared splitmix pixel chain and evaluates the SAME stencil as
    one offsets-table join + GROUP BY target pixel, so equality
    certifies decode → pointwise map → stencil → stat end to end."""
    import ray.data as rd

    from essentials_rd.multimodal import media_sobel, synth_coded_media

    media = rd.from_arrow(synth_coded_media(MEDIA_IMG_N, kind="image",
                                            seed=MEDIA_SEED))
    out = media_sobel(media).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        k: pa.array([r[k] for r in out], pa.int64())
        for k in ("media_id", "n_interior", "grad_sum", "grad_max")
    })


def _media_sobel_sql() -> str:
    mix = (MEDIA_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "sb", "media_id, w, h, j",
        f"media_id * 4294967296 + j + {mix}", "pix")
    return (
        "WITH dims AS (SELECT i AS media_id, "
        "CAST(12 + (i % 5) * 2 AS BIGINT) AS w, "
        "CAST(8 + (i % 3) * 3 AS BIGINT) AS h "
        f"FROM (SELECT unnest(range({MEDIA_IMG_N})) AS i)), "
        "pix AS (SELECT media_id, w, h, unnest(range(w * h * 3)) AS j "
        "FROM dims), "
        f"{chain}, "
        "lum AS (SELECT media_id, w, h, (j // 3) // w AS r, "
        "(j // 3) % w AS c, "
        "sum((CAST(z % 256 AS BIGINT)) * "
        "(CASE WHEN j % 3 = 1 THEN 2 ELSE 1 END)) AS v "
        "FROM sb3 GROUP BY 1, 2, 3, 4, 5), "
        "offs(dr, dc, wx, wy) AS (VALUES "
        "(-1, -1, -1, -1), (-1, 0, 0, -2), (-1, 1, 1, -1), "
        "(0, -1, -2, 0), (0, 1, 2, 0), "
        "(1, -1, -1, 1), (1, 0, 0, 2), (1, 1, 1, 1)), "
        "g AS (SELECT l.media_id, l.r - o.dr AS tr, l.c - o.dc AS tc, "
        "l.w, l.h, sum(l.v * o.wx) AS gx, sum(l.v * o.wy) AS gy "
        "FROM lum l CROSS JOIN offs o GROUP BY 1, 2, 3, 4, 5 "
        "HAVING tr >= 1 AND tr <= h - 2 AND tc >= 1 AND tc <= w - 2) "
        "SELECT media_id, CAST(count(*) AS BIGINT) AS n_interior, "
        "CAST(sum(abs(gx) + abs(gy)) AS BIGINT) AS grad_sum, "
        "CAST(max(abs(gx) + abs(gy)) AS BIGINT) AS grad_max "
        "FROM g GROUP BY media_id ORDER BY media_id"
    )


def _q_wav_hadamard(sf_dir: str):
    """REAL spectral transform (multimodal.HadamardStage): decode the
    coded PCM16 WAVs and take the Walsh–Hadamard transform of the
    first 64 samples — a ±1 orthogonal transform that stays EXACT
    integer end to end (a float DFT could never hash-match), with the
    64×64 sign matrix built once per actor in __init__.  Emits DC +
    low/high sequency-band energies; the SQL twin replays the sample
    chain and evaluates the same matrix via bit_count parity."""
    import ray.data as rd

    from essentials_rd.multimodal import synth_coded_media, wav_hadamard

    media = rd.from_arrow(synth_coded_media(MEDIA_WAV_N, kind="audio",
                                            seed=MEDIA_SEED))
    out = wav_hadamard(media).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        k: pa.array([r[k] for r in out], pa.int64())
        for k in ("media_id", "dc", "e_low", "e_high")
    })


def _wav_hadamard_sql() -> str:
    mix = (MEDIA_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "wh", "media_id, j", f"media_id * 4294967296 + j + {mix}", "pix")
    return (
        f"WITH dims AS (SELECT unnest(range({MEDIA_WAV_N})) AS media_id), "
        "pix AS (SELECT media_id, unnest(range(64)) AS j FROM dims), "
        f"{chain}, "
        "sm AS (SELECT media_id, j, "
        "CAST(z % 65536 AS BIGINT) - 32768 AS s FROM wh3), "
        "ks AS (SELECT unnest(range(64)) AS k), "
        "co AS (SELECT media_id, k, sum(s * "
        "(1 - 2 * (bit_count(j & k) % 2))) AS c "
        "FROM sm CROSS JOIN ks GROUP BY 1, 2) "
        "SELECT media_id, "
        "CAST(max(CASE WHEN k = 0 THEN c END) AS BIGINT) AS dc, "
        "CAST(sum(CASE WHEN k < 32 THEN c * c ELSE 0 END) AS BIGINT) "
        "AS e_low, "
        "CAST(sum(CASE WHEN k >= 32 THEN c * c ELSE 0 END) AS BIGINT) "
        "AS e_high "
        "FROM co GROUP BY media_id ORDER BY media_id"
    )


def _q_diameter_lb(sf_dir: str):
    """Double-sweep diameter lower bound (Magnien-Latapy-Habib): BFS
    from the min vid, re-BFS from the farthest vertex found (tie-break
    min vid) — the second eccentricity is a sharp diameter lower bound
    at the cost of exactly two frontier-sparse BFS runs on the shared
    engine.  Both sweeps and the deterministic pivot selection are
    reproduced by the unrolled level CTEs."""
    import ray

    from essentials_rd.algorithms import bfs
    from essentials_rd.algorithms.bfs import depths_table

    g, _ = _graph(sf_dir)
    s0 = int(np.min(ray.get(g.vertex_ids_ref)))
    t0 = depths_table(bfs(g, s0, max_iters=2 * BFS_ITERS,
                          checkpoint_every=0, scatter_mode="fused"))
    vid = np.asarray(t0["vid"], np.int64)
    dep = np.asarray(t0["depth"], np.int64)
    reach = dep >= 0
    order = np.lexsort((vid[reach], -dep[reach]))
    s1 = int(vid[reach][order[0]])
    ecc0 = int(dep[reach][order[0]])
    t1 = depths_table(bfs(g, s1, max_iters=2 * BFS_ITERS,
                          checkpoint_every=0, scatter_mode="fused"))
    d1 = np.asarray(t1["depth"], np.int64)
    dia = int(d1.max())
    return pa.table(
        {
            "s0": pa.array([s0], pa.int64()),
            "ecc_s0": pa.array([ecc0], pa.int64()),
            "s1": pa.array([s1], pa.int64()),
            "diameter_lb": pa.array([dia], pa.int64()),
        }
    )


def _diameter_lb_sql() -> str:
    big = 1 << 60

    def sweep(pfx: str, src_cte: str) -> str:
        steps = [
            f"""{pfx}0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = (SELECT s FROM {src_cte}) THEN 0
              ELSE {big} END AS depth FROM verts)"""
        ]
        for k in range(BFS_ITERS):
            steps.append(f"""
{pfx}m{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.depth + 1) AS md
  FROM sym e JOIN {pfx}{k} l ON l.vid = e.src AND l.depth < {big}
  GROUP BY e.dst
),
{pfx}{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.depth, COALESCE(m.md, v.depth)) AS depth
  FROM {pfx}{k} v LEFT JOIN {pfx}m{k} m ON m.vid = v.vid
)""")
        return ",".join(steps)

    return (
        f"WITH {_GRAPH_CTES}, "
        f"dsrc AS (SELECT min(vid) AS s FROM verts), "
        f"{sweep('da', 'dsrc')}, "
        f"piv AS (SELECT vid AS s, depth AS ecc FROM da{BFS_ITERS} "
        f"WHERE depth < {big} ORDER BY depth DESC, vid LIMIT 1), "
        f"{sweep('db', 'piv')} "
        f"SELECT (SELECT s FROM dsrc) AS s0, "
        f"(SELECT ecc FROM piv) AS ecc_s0, "
        f"(SELECT s FROM piv) AS s1, "
        f"CAST(max(depth) AS BIGINT) AS diameter_lb "
        f"FROM db{BFS_ITERS} WHERE depth < {big}"
    )


def _q_ra_link_pred(sf_dir: str):
    """Resource-allocation link prediction
    (algorithms.similarity.ra_link_prediction): top-40 NON-edges of the
    co-purchase graph by Σ over common neighbors of RA_SCALE//deg(u) —
    integer RA weights make the distributed sum bit-exact where float
    1/deg would drift; hub centers above deg RA_CAP are skipped (the
    standard cutoff bounding wedge fan-out).  Two bucketed shuffles,
    per-bucket local top-k, driver merges buckets·k rows."""
    from essentials_rd.algorithms.similarity import ra_link_prediction

    _, edges = _graph(sf_dir)
    return ra_link_prediction(edges, k=RA_K, deg_cap=RA_CAP)


def _ra_link_pred_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, "
        f"du AS (SELECT vid, outdeg FROM deg WHERE outdeg <= {RA_CAP}), "
        "wdg AS (SELECT a.dst AS v, b.dst AS w, "
        "(1048576 // d.outdeg) AS s "
        "FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst "
        "JOIN du d ON d.vid = a.src), "
        "agg AS (SELECT v, w, CAST(sum(s) AS BIGINT) AS score, "
        "CAST(count(*) AS BIGINT) AS n_common FROM wdg GROUP BY 1, 2), "
        "cand AS (SELECT agg.* FROM agg LEFT JOIN pairs p "
        "ON p.src = agg.v AND p.dst = agg.w WHERE p.src IS NULL) "
        "SELECT v, w, score, n_common, "
        "CAST(row_number() OVER (ORDER BY score DESC, v, w) AS BIGINT) "
        f"AS rank FROM cand ORDER BY score DESC, v, w LIMIT {RA_K}"
    )


def _q_event_trigrams(sf_dir: str):
    """Order-3 sequential patterns (windows.ngram_counts, the n = 3
    generalization of the Markov transition matrix): counts of every
    event-type triple occurring consecutively in a user's (ts,
    event_id)-ordered stream — the higher-order behavioral statistic
    sequence-mining and next-event models consume.  One user-bucketed
    shuffle with ≤|alphabet|³ partial rows per bucket."""
    import ray.data as rd

    from essentials_rd.windows import ngram_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    return ngram_counts(ev, "event_type", n=3)


def _q_seasonal_naive(sf_dir: str):
    """Seasonal-naive forecast evaluation — the baseline every
    time-series model must beat, scored with exact integers: hourly
    event counts on the DENSE min..max epoch-hour grid (absent hours
    count 0 — skipping them would flatter the forecast), forecast for
    hour t = count(t−24) (season = day) vs the naive lag-1 forecast;
    per hour-of-day the cell count and both sums of absolute errors —
    the MASE numerator/denominator pair before the division.  One
    bucketed count combine (~#hours rows reach the driver), grid math
    driver-side."""
    import ray.data as rd

    from essentials_rd.ops import int_value_counts
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def _hour(t: pa.Table) -> pa.Table:
        h = (np.asarray(t.column("ts").cast(pa.int64()))
             // 3_600_000_000).astype(np.int64)
        return pa.table({"h": pa.array(h, pa.int64())})

    rows = int_value_counts(
        ev.map_batches(_hour, batch_format="pyarrow"), "h").take_all()
    hs = np.array([r["value"] for r in rows], np.int64)
    cs = np.array([r["count"] for r in rows], np.int64)
    lo, hi = int(hs.min()), int(hs.max())
    grid = np.zeros(hi - lo + 1, np.int64)
    grid[hs - lo] = cs
    hour_idx = (np.arange(lo, hi + 1) % 24).astype(np.int64)
    n_p = np.zeros(24, np.int64)
    sae_s = np.zeros(24, np.int64)
    sae_1 = np.zeros(24, np.int64)
    for t in range(24, len(grid)):
        hod = int(hour_idx[t])
        n_p[hod] += 1
        sae_s[hod] += abs(int(grid[t]) - int(grid[t - 24]))
        sae_1[hod] += abs(int(grid[t]) - int(grid[t - 1]))
    return pa.table({
        "hod": pa.array(np.arange(24, dtype=np.int64)),
        "n_pairs": pa.array(n_p, pa.int64()),
        "sae_seasonal": pa.array(sae_s, pa.int64()),
        "sae_lag1": pa.array(sae_1, pa.int64()),
    })


def _seasonal_naive_sql() -> str:
    return (
        "WITH hc AS (SELECT epoch_us(ts) // 3600000000 AS h, "
        "count(*) AS c FROM events GROUP BY 1), "
        "bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hc), "
        "grid AS (SELECT (SELECT lo FROM bounds) + r.range AS h, "
        "COALESCE(hc.c, 0) AS c FROM range(0, 200000) r "
        "LEFT JOIN hc ON hc.h = (SELECT lo FROM bounds) + r.range "
        "WHERE (SELECT lo FROM bounds) + r.range <= "
        "(SELECT hi FROM bounds)), "
        "er AS (SELECT g.h % 24 AS hod, "
        "abs(g.c - s.c) AS es, abs(g.c - p.c) AS e1 "
        "FROM grid g JOIN grid s ON s.h = g.h - 24 "
        "JOIN grid p ON p.h = g.h - 1) "
        "SELECT r.range AS hod, "
        "CAST(COALESCE(count(er.hod), 0) AS BIGINT) AS n_pairs, "
        "CAST(COALESCE(sum(er.es), 0) AS BIGINT) AS sae_seasonal, "
        "CAST(COALESCE(sum(er.e1), 0) AS BIGINT) AS sae_lag1 "
        "FROM range(0, 24) r LEFT JOIN er ON er.hod = r.range "
        "GROUP BY 1 ORDER BY 1"
    )


def _q_position_attribution(sf_dir: str):
    """U-shaped (40-20-40) multi-touch attribution
    (windows.position_attribution): every purchase distributes exactly
    10⁶ micro-credits over its strictly-prior view/click touches —
    first 40%, last 40%, middles flooring the 20% pool with the
    remainder pinned to the earliest middle, k=1 all / k=2 split /
    k=0 to '<none>' — so Σ credit ≡ 10⁶·#purchases exactly.  One
    user-bucketed exchange, per-type partial sums."""
    import ray.data as rd

    from essentials_rd.windows import position_attribution

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])
    return position_attribution(ev)


def _position_attribution_sql() -> str:
    return (
        "WITH e AS (SELECT user_id AS u, event_id AS eid, "
        "CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type AS ty "
        "FROM events WHERE event_type IN ('view', 'click', 'purchase')), "
        "t AS (SELECT u, eid, ts_us, ty, row_number() OVER ("
        "PARTITION BY u ORDER BY ts_us, eid) AS rn "
        "FROM e WHERE ty != 'purchase'), "
        "c AS (SELECT e.u, e.eid, e.ts_us, "
        "CAST(COALESCE((SELECT count(*) FROM t WHERE t.u = e.u AND "
        "(t.ts_us < e.ts_us OR (t.ts_us = e.ts_us AND t.eid < e.eid))"
        "), 0) AS BIGINT) AS k FROM e WHERE e.ty = 'purchase'), "
        "cr AS (SELECT t.ty AS ch, CASE "
        "WHEN c.k = 1 THEN 1000000 "
        "WHEN c.k = 2 THEN 500000 "
        "WHEN t.rn = 1 OR t.rn = c.k THEN 400000 "
        "ELSE 200000 // (c.k - 2) + CASE WHEN t.rn = 2 "
        "THEN 200000 - (200000 // (c.k - 2)) * (c.k - 2) "
        "ELSE 0 END END AS credit "
        "FROM c JOIN t ON t.u = c.u AND t.rn <= c.k "
        "UNION ALL SELECT '<none>', 1000000 FROM c WHERE c.k = 0) "
        "SELECT ch AS touch_type, CAST(sum(credit) AS BIGINT) "
        "AS credit_micros FROM cr GROUP BY 1 ORDER BY 1"
    )


def _q_markov_next(sf_dir: str):
    """First-order Markov next-event prediction eval
    (windows.transition_counts composed): train the argmax-transition
    predictor — per previous event type, the most frequent successor
    under the (count DESC, successor ASC) tie order — and score it on
    the same sequences: per prev type, total transitions and hits
    where the actual successor equals the prediction (the self-eval
    every sequence-model baseline starts from).  One user-bucketed
    shuffle builds the |alphabet|²-row transition table; argmax and
    scoring are joins over that tiny table, never the events."""
    import ray.data as rd

    from essentials_rd.ops import grouped_top_k, join
    from essentials_rd.windows import _str_or_int_key, transition_counts
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    trans = transition_counts(ev, "event_type")
    pred = grouped_top_k(
        trans, ["prev_val"], "n", 1, descending=True,
        tie_cols=["next_val"],
        key_fn=lambda b: _str_or_int_key(
            b.column("prev_val")).view(np.int64))
    pred = pred.map_batches(
        lambda t: pa.table({"prev_val": t.column("prev_val"),
                            "predicted": t.column("next_val")}),
        batch_format="pyarrow")
    rows = {}
    joined = join(trans, pred, on="prev_val", broadcast=False)
    for r in joined.take_all():
        a = rows.setdefault(r["prev_val"], [r["predicted"], 0, 0])
        a[1] += int(r["n"])
        if r["next_val"] == r["predicted"]:
            a[2] += int(r["n"])
    prevs = sorted(rows)
    return pa.table({
        "prev_val": pa.array(prevs, pa.string()),
        "predicted": pa.array([rows[p][0] for p in prevs], pa.string()),
        "n_total": pa.array([rows[p][1] for p in prevs], pa.int64()),
        "n_hits": pa.array([rows[p][2] for p in prevs], pa.int64()),
    })


def _markov_next_sql() -> str:
    return (
        "WITH pr AS (SELECT lag(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS prev, event_type AS nxt FROM events), "
        "tc AS (SELECT prev, nxt, count(*) AS n FROM pr "
        "WHERE prev IS NOT NULL GROUP BY 1, 2), "
        "pd AS (SELECT prev, nxt AS predicted FROM ("
        "SELECT prev, nxt, row_number() OVER (PARTITION BY prev "
        "ORDER BY n DESC, nxt) AS rn FROM tc) WHERE rn = 1) "
        "SELECT t.prev AS prev_val, p.predicted, "
        "CAST(sum(t.n) AS BIGINT) AS n_total, "
        "CAST(COALESCE(sum(CASE WHEN t.nxt = p.predicted THEN t.n "
        "ELSE 0 END), 0) AS BIGINT) AS n_hits "
        "FROM tc t JOIN pd p USING (prev) GROUP BY 1, 2 ORDER BY 1"
    )


def _q_event_transitions(sf_dir: str):
    """Markov transition-count matrix (windows.transition_counts):
    (prev_type, next_type, n) over every user's event sequence under
    the (ts, event_id) total order — one user-bucketed shuffle with
    per-bucket |alphabet|²-row partials, then a tiny combine."""
    import ray.data as rd

    from essentials_rd.windows import transition_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    out = transition_counts(ev, "event_type")
    return out.rename_columns({"prev_val": "prev_type",
                               "next_val": "next_type"})


def _q_supplier_edit1(sf_dir: str):
    """Typo-level fuzzy-duplicate join (textops.edit1_pairs): all
    supplier-name pairs within Levenshtein distance 1 via the lossless
    FastSS k=1 deletion-neighborhood blocking + exact vectorized
    verify — numeric-suffix names make single-digit substitutions
    dense, the worst case for the blocking.  One variant-hash bucketed
    shuffle + one tiny pair-distinct."""
    import ray.data as rd

    from essentials_rd.textops import edit1_pairs

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    return edit1_pairs(sup, "s_suppkey", "s_name", num_buckets=16)


def _q_supplier_entities(sf_dir: str):
    """Entity resolution end to end: the edit-distance-1 fuzzy-dup
    pair graph (lossless FastSS blocking + exact verify) feeds the
    same hash-min CC superstep engine as the link graph, giving every
    supplier an entity cluster id (min suppkey of its component;
    suppliers in no pair are their own singleton entity) — the
    blocking → pairwise-match → transitive-closure pipeline every
    master-data system runs."""
    import ray.data as rd

    from essentials_rd.algorithms import connected_components
    from essentials_rd.algorithms.cc import components_table
    from essentials_rd.graph import build_graph
    from essentials_rd.pipelines import _work_dir
    from essentials_rd.textops import edit1_pairs
    from essentials_rd.util import np_col

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"])
    pairs = edit1_pairs(sup, "s_suppkey", "s_name", num_buckets=16)
    edges = pairs.map_batches(
        lambda t: pa.table({"src": t.column("a_id"),
                            "dst": t.column("b_id")}),
        batch_format="pyarrow").materialize()
    lab: dict[int, int] = {}
    if edges.count() > 0:
        g = build_graph(edges, _work_dir("supent"), 8,
                        symmetrize=True, persist=False)
        res = connected_components(g, checkpoint_every=0)
        t = components_table(res)
        lab = dict(zip(np.asarray(t["vid"], np.int64).tolist(),
                       np.asarray(t["label"], np.int64).tolist()))
    lk = np.array(sorted(lab), np.int64)
    lv = np.array([lab[k] for k in lk], np.int64)

    def _assign(t: pa.Table) -> pa.Table:
        keys = np_col(t, "s_suppkey")
        if len(lk) == 0:
            out = keys.astype(np.int64)
            return pa.table({"s_suppkey": pa.array(keys, pa.int64()),
                             "cluster": pa.array(out, pa.int64())})
        idx = np.searchsorted(lk, keys)
        idx_c = np.minimum(idx, len(lk) - 1)
        found = (idx < len(lk)) & (lk[idx_c] == keys)
        out = np.where(found, lv[idx_c], keys).astype(np.int64)
        return pa.table({"s_suppkey": pa.array(keys, pa.int64()),
                         "cluster": pa.array(out, pa.int64())})

    return sup.select_columns(["s_suppkey"]).map_batches(
        _assign, batch_format="pyarrow")


def _supplier_entities_sql() -> str:
    return (
        "WITH nd AS MATERIALIZED (SELECT a.s_suppkey AS a, "
        "b.s_suppkey AS b FROM supplier a JOIN supplier b "
        "ON a.s_suppkey < b.s_suppkey "
        f"WHERE levenshtein(a.s_name, b.s_name) <= 1), {_dup_cc_body()} "
        "SELECT s.s_suppkey, CAST(COALESCE(x.label, s.s_suppkey) "
        f"AS BIGINT) AS cluster FROM supplier s LEFT JOIN "
        f"x{DUP_CC_ITERS} x ON x.vid = s.s_suppkey ORDER BY s_suppkey"
    )


def _q_qty_dense_rank(sf_dir: str):
    """Dense-rank window (ops.grouped_rank dense=True): every lineitem
    ranked within its return flag by row_number over the (quantity,
    packed line id) total order PLUS dense_rank over quantity alone —
    heavy integer ties (50 distinct quantities over tens of thousands
    of rows per key) exercise the tie-sharing/no-gaps contract."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_rank
    from essentials_rd.util import np_col

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_quantity"],
    )

    def _prep(t: pa.Table) -> pa.Table:
        q = np.asarray(
            t.column("l_quantity").to_numpy(zero_copy_only=False),
            np.float64,
        )
        lid = (np_col(t, "l_orderkey") * np.int64(10)
               + np_col(t, "l_linenumber"))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "qty": pa.array(np.floor(q + 0.5).astype(np.int64)),
                "lid": pa.array(lid, pa.int64()),
            }
        )

    return grouped_rank(
        line.map_batches(_prep, batch_format="pyarrow"),
        "l_returnflag", "qty", "lid",
        key_fn=lambda b: _str_hash(b.column("l_returnflag")),
        num_buckets=4, dense=True,
    ).drop_columns(["pct"])


def _q_doc_char_ntile(sf_dir: str):
    """NTILE window (ops.grouped_rank n_tiles=7): each doc's septile
    within its language under the (n_chars, doc_id) total order —
    front-loaded remainder per the SQL NTILE contract, integer-exact."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_rank

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    out = grouped_rank(docs, "lang", "n_chars", "doc_id",
                       key_fn=lambda b: _str_hash(b.column("lang")),
                       n_tiles=7)
    return out.select_columns(["doc_id", "lang", "tile"])


def _q_cust_user_outer(sf_dir: str):
    """FULL OUTER join (ops.join how='outer' — forced onto the
    co-shuffled path, where each bucket sees both complete sides):
    customers vs per-user event counts on the shared key space,
    surfacing both customers with no events and event users outside
    the customer table."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import np_col

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(
        lambda t: pa.table({
            "key": t.column("c_custkey"),
            "c_flag": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    ue = grouped_pandas_agg(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(lambda t: t.rename_columns(["key"]),
                     batch_format="pyarrow"),
        ["key"], {"n_events": ("key", "count")},
        key_fn=lambda b: np_col(b, "key"),
    )
    j = join(cust, ue, on="key", how="outer")

    def _fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t.column("key").cast(pa.int64()),
            "has_cust": pc.fill_null(
                t.column("c_flag").cast(pa.int64()), 0),
            "n_events": pc.fill_null(
                t.column("n_events").cast(pa.int64()), 0),
        })

    return j.map_batches(_fin, batch_format="pyarrow")


def _q_user_top_event(sf_dir: str):
    """Per-user modal event type (ops.grouped_mode): per-block partial
    (user, type, n) counts combine before the single bucketed shuffle;
    argmax with the deterministic (count desc, type asc) tie-break."""
    import ray.data as rd

    from essentials_rd.ops import grouped_mode
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type",
                        key_fn=lambda b: np_col(b, "user_id"))


def _q_revenue_by_region(sf_dir: str):
    """TPC-H-Q5-shaped star join: lineitem ⋈(partitioned hash) orders
    on the orderkey — the big-big exchange — then the three dimension
    hops (customer→nation→region) collapse into ONE broadcast
    custkey→region_name lookup built driver-side from the tiny dims
    and ray.put once.  Revenue is made integer-exact per row
    (half-up-rounded micros) BEFORE the sum, so the grouped totals are
    bit-identical to the oracle regardless of summation order."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.pipelines import round_half_up
    from essentials_rd.util import np_col

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).rename_columns({"o_orderkey": "l_orderkey"})
    j = join(li, orders, on="l_orderkey", how="inner", broadcast=False,
             num_buckets=32)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rk = np_col(reg, "r_regionkey")
    rorder = np.argsort(rk)
    rname = np.asarray(reg["r_name"], dtype=object)[rorder]
    nk = np_col(nat, "n_nationkey")
    norder = np.argsort(nk)
    n_region = np_col(nat, "n_regionkey")[norder]
    ck = np_col(cust, "c_custkey")
    corder = np.argsort(ck)
    c_keys = ck[corder]
    c_nat = np_col(cust, "c_nationkey")[corder]
    c_region_name = rname[
        np.searchsorted(rk[rorder], n_region[
            np.searchsorted(nk[norder], c_nat)])
    ]
    map_ref = ray.put((c_keys, c_region_name))

    def _rev(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(map_ref)
        pos = np.searchsorted(keys, np_col(batch, "o_custkey"))
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        micros = round_half_up(price * (1.0 - disc) * 1e6, 0).astype(
            np.int64)
        return pa.table({
            "r_name": pa.array(names[pos].tolist(), pa.string()),
            "revenue_micros": pa.array(micros, pa.int64()),
        })

    rows = j.map_batches(_rev, batch_format="pyarrow")
    return grouped_pandas_agg(
        rows, ["r_name"],
        {"revenue_micros": ("revenue_micros", "sum"),
         "n_items": ("revenue_micros", "count")},
        key_fn=lambda b: _str_hash(b.column("r_name")),
        num_buckets=8,
    )


KM_C = 8       # k-means clusters
KM_ITERS = 2   # unrolled Lloyd iterations


def _km_seed_ranks() -> np.ndarray:
    """The engine's centroid seeding is a pure function of (seed,
    sample size): rng.choice over the C·4 smallest-hash rows.  Both
    sides can therefore precompute the chosen RANKS (data-independent)
    and the SQL picks the same rows by the same splitmix64 order."""
    rng = np.random.default_rng(SAMPLE_SEED)
    return np.sort(rng.choice(KM_C * 4, size=KM_C, replace=False))


def _q_kmeans_buckets(sf_dir: str):
    """Distributed Lloyd k-means (ann.kmeans_centroids: per-block
    partial (count, vector-sum) combine, no per-vector shuffle) + final
    nearest-centroid assignment; per-bucket (n, min_vid, max_vid).  The
    argmax margins are ~1e-4 on this data — five orders above the
    summation-order ulp noise between numpy and DuckDB, so integer
    outputs match exactly."""
    import ray
    import ray.data as rd

    from essentials_rd.ann import _batch_matrix, _normalize, kmeans_centroids
    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    vectors = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
    cent = kmeans_centroids(vectors, KM_C, iters=KM_ITERS, seed=SAMPLE_SEED)
    c_ref = ray.put(cent)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, "embedding"))
        b = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "bucket": pa.array(b, pa.int64())})

    asg = vectors.map_batches(_assign, batch_format="pyarrow")
    return grouped_pandas_agg(
        asg, ["bucket"],
        {"n": ("vec_id", "count"), "min_vid": ("vec_id", "min"),
         "max_vid": ("vec_id", "max")},
        key_fn=lambda t: np_col(t, "bucket"),
    )


def _kmeans_parts() -> list[str]:
    """Shared unrolled-Lloyd CTE parts: unnest embeddings to (vec_id,
    j, x) as ``ex``, L2-normalize as ``xn``, seed centroids by
    splitmix64-rank (the precomputed data-independent choice ranks),
    then KM_ITERS assign/update rounds (argmax dot with min-cid
    tie-break = np.argmax first-max) and a final assignment
    ``asg{KM_ITERS}``; empty clusters keep their previous centroid.
    Used by both the kmeans_buckets and knn_graph oracles."""
    ranks = ", ".join(str(int(r) + 1) for r in _km_seed_ranks())
    chain = _sm64_ctes("kz", "vec_id", "vec_id", "embeddings")

    def assign(t: int) -> str:
        return (
            f"dot{t} AS (SELECT x.vec_id, c.cid, sum(x.x * c.c) AS d "
            f"FROM xn x JOIN c{t} c USING (j) GROUP BY 1, 2), "
            f"asg{t} AS (SELECT vec_id, cid FROM ("
            f"SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY d DESC, cid ASC) AS rn FROM dot{t}) WHERE rn = 1)"
        )

    parts = [
        "ex AS MATERIALIZED (SELECT vec_id, j.j AS j, "
        "CAST(embedding[j.j] AS DOUBLE) AS x FROM embeddings, "
        "LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS j) j), "
        "xn AS MATERIALIZED (SELECT e.vec_id, e.j, "
        "e.x / CASE WHEN n.nv = 0 THEN 1 ELSE n.nv END AS x FROM ex e "
        "JOIN (SELECT vec_id, sqrt(sum(x*x)) AS nv FROM ex "
        "GROUP BY vec_id) n USING (vec_id)), "
        f"{chain}, "
        "rk AS (SELECT vec_id, row_number() OVER "
        "(ORDER BY (z >> 1), vec_id) AS r FROM kz3), "
        f"seeds AS (SELECT vec_id, row_number() OVER (ORDER BY r) - 1 "
        f"AS cid FROM rk WHERE r IN ({ranks})), "
        "c0 AS MATERIALIZED (SELECT s.cid, x.j, x.x AS c "
        "FROM seeds s JOIN xn x USING (vec_id))"
    ]
    for t in range(KM_ITERS):
        parts.append(assign(t))
        parts.append(
            f"cnt{t} AS (SELECT cid, count(*) AS n FROM asg{t} "
            f"GROUP BY cid), "
            f"mean{t} AS (SELECT a.cid, x.j, sum(x.x) / max(n.n) AS m "
            f"FROM asg{t} a JOIN xn x USING (vec_id) "
            f"JOIN cnt{t} n ON n.cid = a.cid GROUP BY a.cid, x.j), "
            f"c{t + 1} AS MATERIALIZED ("
            f"SELECT m.cid, m.j, m.m / CASE WHEN q.nv = 0 THEN 1 "
            f"ELSE q.nv END AS c FROM mean{t} m JOIN "
            f"(SELECT cid, sqrt(sum(m*m)) AS nv FROM mean{t} "
            f"GROUP BY cid) q USING (cid) "
            f"UNION ALL SELECT c.cid, c.j, c.c FROM c{t} c "
            f"LEFT JOIN cnt{t} k ON k.cid = c.cid WHERE k.cid IS NULL)"
        )
    parts.append(assign(KM_ITERS))
    return parts


def _kmeans_sql() -> str:
    return (
        "WITH " + ", ".join(_kmeans_parts()) +
        f" SELECT CAST(cid AS BIGINT) AS bucket, "
        f"CAST(count(*) AS BIGINT) AS n, min(vec_id) AS min_vid, "
        f"max(vec_id) AS max_vid FROM asg{KM_ITERS} GROUP BY cid"
    )


KNN_K = 3
KNN_MOD = 17     # query rows: vec_id % KNN_MOD == 0 (the scout shape)
KNN_SCALE = 1e3  # integer quantization for the exact dot ranking


def _q_knn_graph(sf_dir: str):
    """Bucketed kNN graph (ann.knn_graph): per query vector the top-3
    neighbors inside its IVF bucket by EXACT integer-quantized inner
    product — one groupby shuffle, per-bucket O(|B|²d) matmul, ranking
    bit-exact at any layout.  Buckets come from the same distributed
    Lloyd centroids the kmeans_buckets oracle unrolls."""
    import ray.data as rd

    from essentials_rd.ann import kmeans_centroids, knn_graph

    vectors = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
    cent = kmeans_centroids(vectors, KM_C, iters=KM_ITERS, seed=SAMPLE_SEED)
    return knn_graph(vectors, cent, KNN_K, scale=KNN_SCALE,
                     query_mod=KNN_MOD)


def _knn_graph_sql() -> str:
    parts = _kmeans_parts()
    parts.append(
        "exq AS MATERIALIZED (SELECT vec_id, j, "
        f"CAST(floor(x * {KNN_SCALE:.1f}) AS BIGINT) AS q FROM ex)"
    )
    parts.append(
        "kdots AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, "
        "sum(a.q * b.q) AS dot_q FROM exq a "
        f"JOIN asg{KM_ITERS} sa ON sa.vec_id = a.vec_id "
        f"JOIN asg{KM_ITERS} sb ON sb.cid = sa.cid "
        "JOIN exq b ON b.vec_id = sb.vec_id AND b.j = a.j "
        f"WHERE a.vec_id % {KNN_MOD} = 0 AND b.vec_id <> a.vec_id "
        "GROUP BY 1, 2)"
    )
    parts.append(
        "knn AS (SELECT vec_id, nbr_id, dot_q, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY dot_q DESC, nbr_id) AS rank "
        "FROM kdots)"
    )
    return (
        "WITH " + ", ".join(parts) +
        " SELECT vec_id, nbr_id, CAST(dot_q AS BIGINT) AS dot_q, "
        f"CAST(rank AS BIGINT) AS rank FROM knn WHERE rank <= {KNN_K}"
    )


PQ_M = 2      # subspaces
PQ_K = 4      # codewords per subspace
PQ_ITERS = 2  # unrolled Lloyd iterations per codebook
PQ_DIM = 64


def _pq_seed_ranks() -> np.ndarray:
    """Same data-independent seeding contract as _km_seed_ranks, at
    the PQ codebook size: rng.choice over the K·4 hash-smallest rows
    (the SAME rows seed every subspace — the sample is picked by
    vec_id, not by vector content)."""
    rng = np.random.default_rng(SAMPLE_SEED)
    return np.sort(rng.choice(PQ_K * 4, size=PQ_K, replace=False))


def _q_pq_codes(sf_dir: str):
    """Product quantization (ann.pq_codebooks + ann.pq_encode): train
    an independent PQ_K-codeword spherical Lloyd codebook per
    PQ_DIM/PQ_M-dim subspace (per-block partial combine, no per-vector
    shuffle) and assign every vector its code tuple — the
    memory-compression scale path for embedding tables (m small ints
    replace d floats; ADC search over the codes is pq_adc_topk,
    recall-pinned in the tests).  Argmax margins dwarf summation-order
    ulp noise, so codes match the unrolled-SQL Lloyd exactly."""
    import ray.data as rd

    from essentials_rd.ann import pq_codebooks, pq_encode

    vectors = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
    books = pq_codebooks(vectors, m=PQ_M, k=PQ_K, iters=PQ_ITERS,
                         seed=SAMPLE_SEED, dim=PQ_DIM)
    return pq_encode(vectors, books)


def _lloyd_sub_parts(p: str, lo: int, hi: int) -> list[str]:
    """Prefixed Lloyd-unroll CTE chain over the ``[lo, hi)`` dimension
    slice of ``embeddings`` — _kmeans_parts generalized to a subspace
    (PQ_K codewords, PQ_ITERS rounds, shared ``pqseeds``).  All CTE
    names carry prefix ``p`` so several subspaces coexist in one
    WITH."""

    def assign(t: int) -> str:
        return (
            f"{p}dot{t} AS (SELECT x.vec_id, c.cid, sum(x.x * c.c) AS d "
            f"FROM {p}xn x JOIN {p}c{t} c USING (j) GROUP BY 1, 2), "
            f"{p}asg{t} AS (SELECT vec_id, cid FROM ("
            f"SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY d DESC, cid ASC) AS rn FROM {p}dot{t}) WHERE rn = 1)"
        )

    parts = [
        f"{p}ex AS MATERIALIZED (SELECT vec_id, j.j AS j, "
        f"CAST(embedding[j.j + {lo}] AS DOUBLE) AS x FROM embeddings, "
        f"LATERAL (SELECT unnest(range(1, {hi - lo} + 1)) AS j) j), "
        f"{p}xn AS MATERIALIZED (SELECT e.vec_id, e.j, "
        f"e.x / CASE WHEN n.nv = 0 THEN 1 ELSE n.nv END AS x FROM {p}ex e "
        f"JOIN (SELECT vec_id, sqrt(sum(x*x)) AS nv FROM {p}ex "
        f"GROUP BY vec_id) n USING (vec_id)), "
        f"{p}c0 AS MATERIALIZED (SELECT s.cid, x.j, x.x AS c "
        f"FROM pqseeds s JOIN {p}xn x USING (vec_id))"
    ]
    for t in range(PQ_ITERS):
        parts.append(assign(t))
        parts.append(
            f"{p}cnt{t} AS (SELECT cid, count(*) AS n FROM {p}asg{t} "
            f"GROUP BY cid), "
            f"{p}mean{t} AS (SELECT a.cid, x.j, sum(x.x) / max(n.n) AS m "
            f"FROM {p}asg{t} a JOIN {p}xn x USING (vec_id) "
            f"JOIN {p}cnt{t} n ON n.cid = a.cid GROUP BY a.cid, x.j), "
            f"{p}c{t + 1} AS MATERIALIZED ("
            f"SELECT m.cid, m.j, m.m / CASE WHEN q.nv = 0 THEN 1 "
            f"ELSE q.nv END AS c FROM {p}mean{t} m JOIN "
            f"(SELECT cid, sqrt(sum(m*m)) AS nv FROM {p}mean{t} "
            f"GROUP BY cid) q USING (cid) "
            f"UNION ALL SELECT c.cid, c.j, c.c FROM {p}c{t} c "
            f"LEFT JOIN {p}cnt{t} k ON k.cid = c.cid WHERE k.cid IS NULL)"
        )
    parts.append(assign(PQ_ITERS))
    return parts


def _pq_codes_sql() -> str:
    ranks = ", ".join(str(int(r) + 1) for r in _pq_seed_ranks())
    sub = PQ_DIM // PQ_M
    chain = _sm64_ctes("pqz", "vec_id", "vec_id", "embeddings")
    parts = [
        f"{chain}",
        "pqrk AS (SELECT vec_id, row_number() OVER "
        "(ORDER BY (z >> 1), vec_id) AS r FROM pqz3)",
        f"pqseeds AS (SELECT vec_id, row_number() OVER (ORDER BY r) - 1 "
        f"AS cid FROM pqrk WHERE r IN ({ranks}))",
    ]
    sel = []
    for s in range(PQ_M):
        p = f"s{s}"
        parts += _lloyd_sub_parts(p, s * sub, (s + 1) * sub)
        sel.append(f"JOIN {p}asg{PQ_ITERS} {p} USING (vec_id)"
                   if s else f"{p}asg{PQ_ITERS} {p}")
    cols = ", ".join(
        f"CAST(s{s}.cid AS BIGINT) AS code_{s}" for s in range(PQ_M)
    )
    return (
        "WITH " + ", ".join(parts) +
        f" SELECT s0.vec_id, {cols} FROM " + " ".join(sel)
    )


IVFPQ_QID = 23    # query = this vector's embedding
IVFPQ_NPROBE = 3
IVFPQ_K = 5
IVFPQ_SCALE = 1e6


def _q_ivfpq(sf_dir: str):
    """IVF-PQ composed search (ann.ivfpq_topk): coarse IVF quantizer
    prunes to nprobe buckets, PQ codes ADC-score the survivors — the
    standard billion-scale ANN layout, with every ranking over
    integer-quantized dots so the whole path (centroid train, bucket
    probe, subspace codebooks, code assignment, ADC ranking) is
    bit-exact at any layout and hash-checked against the composed
    Lloyd-unroll SQL."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    from essentials_rd.ann import ivfpq_topk

    vectors = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
    qt = _pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "=", IVFPQ_QID)])
    query = np.asarray(qt.column("embedding").to_pylist()[0], np.float64)
    return ivfpq_topk(vectors, query, num_centroids=KM_C,
                      nprobe=IVFPQ_NPROBE, m=PQ_M, codewords=PQ_K,
                      iters=KM_ITERS, k=IVFPQ_K, seed=SAMPLE_SEED,
                      scale=IVFPQ_SCALE)


def _ivfpq_sql() -> str:
    """Composed oracle: the shared unrolled-Lloyd centroid chain
    (_kmeans_parts — unprefixed names) plus the per-subspace PQ chains
    (_lloyd_sub_parts — s{s}-prefixed) coexist in one WITH; the query
    row's normalized components come straight from the xn / s{s}xn
    tables, the bucket probe and ADC lookup tables are
    floor(scale·dot) integers, and the final ranking mirrors the
    engine's (score desc, id asc) total order."""
    t = KM_ITERS
    scale = int(IVFPQ_SCALE)
    sub = PQ_DIM // PQ_M
    chain = _sm64_ctes("pqz", "vec_id", "vec_id", "embeddings")
    parts = list(_kmeans_parts())
    parts += [
        f"{chain}",
        "pqrk AS (SELECT vec_id, row_number() OVER "
        "(ORDER BY (z >> 1), vec_id) AS r FROM pqz3)",
        "pqseeds AS (SELECT vec_id, row_number() OVER (ORDER BY r) - 1 "
        "AS cid FROM pqrk WHERE r IN (" +
        ", ".join(str(int(r) + 1) for r in _pq_seed_ranks()) + "))",
    ]
    luts, joins = [], []
    for s in range(PQ_M):
        p = f"s{s}"
        parts += _lloyd_sub_parts(p, s * sub, (s + 1) * sub)
        parts.append(
            f"lut{s} AS (SELECT c.cid, CAST(floor({scale} * "
            f"sum(q.x * c.c)) AS BIGINT) AS l FROM {p}c{PQ_ITERS} c "
            f"JOIN (SELECT j, x FROM {p}xn WHERE vec_id = {IVFPQ_QID}) q "
            f"USING (j) GROUP BY c.cid)"
        )
        luts.append(f"l{s}.l")
        joins.append(f"JOIN {p}asg{PQ_ITERS} a{s} USING (vec_id) "
                     f"JOIN lut{s} l{s} ON l{s}.cid = a{s}.cid")
    parts += [
        f"pb AS (SELECT c.cid, CAST(floor({scale} * sum(q.x * c.c)) "
        f"AS BIGINT) AS d FROM c{t} c "
        f"JOIN (SELECT j, x FROM xn WHERE vec_id = {IVFPQ_QID}) q "
        f"USING (j) GROUP BY c.cid)",
        f"probed AS (SELECT cid FROM (SELECT cid, row_number() OVER "
        f"(ORDER BY d DESC, cid ASC) AS rn FROM pb) "
        f"WHERE rn <= {IVFPQ_NPROBE})",
        f"cand AS (SELECT a.vec_id, CAST(a.cid AS BIGINT) AS bucket "
        f"FROM asg{t} a JOIN probed p ON p.cid = a.cid)",
        "sc AS (SELECT c.vec_id, c.bucket, " + " + ".join(luts) +
        " AS score_q FROM cand c " + " ".join(joins) + ")",
    ]
    return (
        "WITH " + ", ".join(parts) +
        " SELECT vec_id, bucket, score_q, rn AS rank FROM "
        "(SELECT vec_id, bucket, score_q, row_number() OVER "
        "(ORDER BY score_q DESC, vec_id ASC) AS rn FROM sc) "
        f"WHERE rn <= {IVFPQ_K}"
    )


GANN_QID = 17    # query = this vector's embedding
GANN_ENTRY = 4   # deterministic entry points: vec_id < 4
GANN_BEAM = 6
GANN_HOPS = 3
GANN_TOPK = 5
GANN_P = 16      # index partitions


def _q_graph_ann(sf_dir: str):
    """Graph-ANN serving path (ann.build_ann_index +
    ann.graph_ann_search): persist the full kNN neighbor graph and the
    vector table hash-partitioned by id through the resumable sink,
    then answer a query with fixed-hop BEAM search — per hop ONE
    partition-pruned adjacency probe + ONE vector probe (O(hops×beam)
    files opened, never a scan), exact integer-quantized dots, (dot
    desc, id asc) total order.  The oracle unrolls the identical
    beam rounds over the same kdots adjacency, so the whole serving
    path — graph build, entry, expansion, ranking — is hash-checked."""
    import os as _os
    import tempfile

    import ray.data as rd

    from essentials_rd.ann import (_batch_matrix, _probe_parts,
                                   build_ann_index, graph_ann_search,
                                   kmeans_centroids, knn_graph)

    vectors = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
    cent = kmeans_centroids(vectors, KM_C, iters=KM_ITERS, seed=SAMPLE_SEED)
    adj = knn_graph(vectors, cent, KNN_K, scale=KNN_SCALE, query_mod=None)
    idx = tempfile.mkdtemp(prefix="essentials_rd_gann_")
    build_ann_index(vectors, adj, idx, GANN_P)
    qt = _probe_parts(_os.path.join(idx, "vec"), GANN_P,
                      np.array([GANN_QID], np.int64),
                      ["vec_id", "embedding"], "vec_id")
    query = _batch_matrix(qt, "embedding")[0]
    return graph_ann_search(
        idx, GANN_P, query, np.arange(GANN_ENTRY, dtype=np.int64),
        beam=GANN_BEAM, hops=GANN_HOPS, k=GANN_TOPK, scale=KNN_SCALE)


def _graph_ann_sql() -> str:
    parts = _kmeans_parts()
    parts.append(
        "exq AS MATERIALIZED (SELECT vec_id, j, "
        f"CAST(floor(x * {KNN_SCALE:.1f}) AS BIGINT) AS q FROM ex)"
    )
    parts.append(
        "gdots AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, "
        "sum(a.q * b.q) AS dot_q FROM exq a "
        f"JOIN asg{KM_ITERS} sa ON sa.vec_id = a.vec_id "
        f"JOIN asg{KM_ITERS} sb ON sb.cid = sa.cid "
        "JOIN exq b ON b.vec_id = sb.vec_id AND b.j = a.j "
        "WHERE b.vec_id <> a.vec_id GROUP BY 1, 2)"
    )
    parts.append(
        "adjk AS (SELECT vec_id, nbr_id FROM ("
        "SELECT vec_id, nbr_id, row_number() OVER (PARTITION BY vec_id "
        "ORDER BY dot_q DESC, nbr_id) AS rn FROM gdots) "
        f"WHERE rn <= {KNN_K})"
    )
    parts.append(f"gqv AS (SELECT j, q FROM exq WHERE vec_id = {GANN_QID})")
    parts.append(
        "gsc AS MATERIALIZED (SELECT e.vec_id, sum(e.q * v.q) AS dot "
        "FROM exq e JOIN gqv v ON v.j = e.j GROUP BY 1)")
    parts.append(
        f"gb0 AS (SELECT vec_id, dot FROM gsc WHERE vec_id < {GANN_ENTRY} "
        f"ORDER BY dot DESC, vec_id LIMIT {GANN_BEAM})")
    for h in range(1, GANN_HOPS + 1):
        parts.append(
            f"gc{h} AS (SELECT DISTINCT vec_id FROM ("
            f"SELECT a.nbr_id AS vec_id FROM adjk a "
            f"JOIN gb{h - 1} b ON b.vec_id = a.vec_id "
            f"UNION SELECT vec_id FROM gb{h - 1}))")
        parts.append(
            f"gb{h} AS (SELECT s.vec_id, s.dot FROM gsc s "
            f"JOIN gc{h} c ON c.vec_id = s.vec_id "
            f"ORDER BY dot DESC, s.vec_id LIMIT {GANN_BEAM})")
    return (
        "WITH " + ", ".join(parts) +
        " SELECT vec_id, CAST(dot AS BIGINT) AS dot_q, "
        "CAST(row_number() OVER (ORDER BY dot DESC, vec_id) AS BIGINT) "
        f"AS rank FROM gb{GANN_HOPS} "
        f"ORDER BY rank LIMIT {GANN_TOPK}"
    )


def _q_cohort_retention(sf_dir: str):
    """Daily cohort retention (windows.cohort_retention): cohort =
    each user's first-event day; cells count distinct same-cohort
    users active N days later.  Cohorting never leaves the user
    bucket; only (cohort, offset) partial counts shuffle again."""
    import ray.data as rd

    from essentials_rd.windows import cohort_retention

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return cohort_retention(ev)


CHUNK_TOKENS = 64
REDACT_RE = "[0-9]+"


def _q_doc_chunks(sf_dir: str):
    """Context-window chunking (textops.chunk_documents): per-doc
    64-token chunks with token/char counts — partitioning-independent
    by construction, unlike cross-doc greedy packing."""
    import ray.data as rd

    from essentials_rd.textops import chunk_documents

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return chunk_documents(docs, CHUNK_TOKENS)


def _q_redacted_docs(sf_dir: str):
    """Regex scrubbing audit (textops.redact_pattern): digit runs →
    '#', per-doc hit count + redacted length; the RE2 pattern string is
    shared verbatim with the oracle."""
    import ray.data as rd

    from essentials_rd.textops import redact_pattern

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return redact_pattern(docs, REDACT_RE)


WINNOW_W = 8   # fingerprint window (grams per min-window)
WINNOW_K = 5   # tokens per gram


def _q_winnow_fp(sf_dir: str):
    """Winnowing fingerprints (textops.fingerprints, MOSS scheme):
    distinct per-doc window-mins of rolling 5-token-gram hashes —
    recomputable by the oracle because both the token key and the
    ·POLY^next gram fold are exact mod-2⁶⁴ integer arithmetic."""
    import ray.data as rd

    from essentials_rd.textops import fingerprints

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return fingerprints(docs, window=WINNOW_W, gram_k=WINNOW_K)


def _winnow_sql() -> str:
    """DuckDB twin of textops.fingerprints: token keys through the
    SplitMix64 chain, gram fold c←(c·POLY)^next via LEAD (NULL leads
    beyond the doc leave the carry unchanged, which also yields the
    short-doc all-token gram at i=1), then DISTINCT window-mins with
    the whole-doc min for docs with fewer grams than the window."""
    poly = 0x100000001B3
    key = _token_key_sql()
    chain = _sm64_ctes(
        "wz", "doc_id, i", key,
        "(SELECT doc_id, i.i AS i, t[i.i] AS tok "
        "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),"
        " LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i)",
    )

    def step(c: str, z: str) -> str:
        return (f"CASE WHEN {z} IS NULL THEN {c} "
                f"ELSE xor({_sm64_mulmod(c, poly)}, {z}) END")

    g_chain = []
    for j in range(1, WINNOW_K):
        rest = ", ".join(f"n{x}" for x in range(j + 1, WINNOW_K))
        rest = (", " + rest) if rest else ""
        prev = "z" if j == 1 else "c"
        g_chain.append(
            f"g{j} AS (SELECT doc_id, i, cnt{rest}, "
            f"{step(prev, f'n{j}')} AS c FROM g{j - 1})"
        )
    leads = ", ".join(
        f"lead(z, {j}) OVER w AS n{j}" for j in range(1, WINNOW_K)
    )
    return (
        f"WITH {chain}, "
        f"g0 AS (SELECT doc_id, i, z, "
        f"count(*) OVER (PARTITION BY doc_id) AS cnt, {leads} "
        f"FROM wz3 WINDOW w AS (PARTITION BY doc_id ORDER BY i)), "
        + ", ".join(g_chain) + ", "
        f"grams AS MATERIALIZED (SELECT doc_id, i, c AS gh "
        f"FROM g{WINNOW_K - 1} "
        f"WHERE i + {WINNOW_K - 1} <= cnt OR (cnt < {WINNOW_K} AND i = 1)), "
        f"wm AS (SELECT doc_id, gh, "
        f"count(*) OVER (PARTITION BY doc_id) AS m, "
        f"row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn, "
        f"min(gh) OVER (PARTITION BY doc_id ORDER BY i "
        f"ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS wmin "
        f"FROM grams), "
        f"fps AS (SELECT DISTINCT doc_id, wmin AS fp FROM wm "
        f"WHERE m >= {WINNOW_W} AND rn <= m - {WINNOW_W - 1} "
        f"UNION "
        f"SELECT doc_id, min(gh) AS fp FROM wm WHERE m < {WINNOW_W} "
        f"GROUP BY doc_id) "
        f"SELECT doc_id, "
        f"CAST(CASE WHEN fp >= CAST(9223372036854775808 AS UBIGINT) "
        f"THEN CAST(fp AS HUGEINT) - {_MOD64} "
        f"ELSE CAST(fp AS HUGEINT) END AS BIGINT) AS fp FROM fps"
    )


WINDOW_US = 2 * 3600 * 1_000_000  # 2-hour post-purchase window


def _q_events_in_windows(sf_dir: str):
    """Bounded interval join (ops.interval_join): every event that
    falls inside another SAME-USER purchase event's half-open 2-hour
    window [purchase_ts, purchase_ts + 2h), self-pairs excluded — one
    co-shuffle + per-bucket searchsorted window probe, never a per-key
    scan."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.ops import interval_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def _windows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        lo = t.column("ts").combine_chunks().cast(
            pa.timestamp("us")).cast(pa.int64())
        hi = pc.add(lo, WINDOW_US)
        return pa.table({"window_event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "lo": lo, "hi": hi})

    wins = ev.map_batches(_windows, batch_format="pyarrow")
    pairs = interval_join(
        ev.select_columns(["event_id", "ts", "user_id"]), wins,
        left_key="user_id", right_key="user_id",
        left_ts="ts", right_lo="lo", right_hi="hi",
        left_carry=["event_id"], right_carry=["window_event_id"],
        max_span=WINDOW_US,
    )
    return pairs.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("event_id"),
                                        t.column("window_event_id"))),
        batch_format="pyarrow",
    )


def _q_clustering_coeff(sf_dir: str):
    """Per-vertex local clustering coefficient 2·tri(v)/(deg(v)·(deg(v)−1))
    from the cached triangle counts + degree table (0 when deg < 2),
    rounded half-up to 6 dp on both sides."""
    from essentials_rd.pipelines import round_half_up
    from essentials_rd.util import np_col

    import ray.data as rd

    _, per_v = _tc(sf_dir)
    if isinstance(per_v, rd.Dataset):
        per_v = pa.Table.from_pandas(per_v.to_pandas())
    degt = _q_degree(sf_dir)
    vid_t = np_col(per_v, "vid")
    tri = np_col(per_v, "triangles").astype(np.float64)
    vid_d = np_col(degt, "vid")
    deg = np_col(degt, "degree")
    # align the degree rows to the triangle rows by vid
    pos = np.searchsorted(vid_d, vid_t)
    assert np.array_equal(vid_d[pos], vid_t)
    deg = deg[pos]
    denom = (deg * (deg - 1)).astype(np.float64)
    cc = np.zeros(len(tri), np.float64)
    ok = deg >= 2
    cc[ok] = round_half_up(2.0 * tri[ok] / denom[ok], 6)
    return pa.table({"vid": pa.array(vid_t, pa.int64()),
                     "clustering": pa.array(cc, pa.float64())})


def _clustering_coeff_sql() -> str:
    return f"""
WITH {_GRAPH_CTES}, {_ORIENTED_CTE},
corners AS (
  SELECT a AS vid FROM tris UNION ALL
  SELECT b FROM tris UNION ALL
  SELECT c FROM tris
),
tri AS (
  SELECT v.vid, count(c.vid) AS t
  FROM verts v LEFT JOIN corners c ON c.vid = v.vid GROUP BY v.vid
)
SELECT t.vid,
       CASE WHEN d.outdeg < 2 THEN 0.0
            ELSE ROUND(2.0 * t.t / (d.outdeg * (d.outdeg - 1)), 6)
       END AS clustering
FROM tri t JOIN deg d ON d.vid = t.vid ORDER BY t.vid
"""


def _q_parts_per_order(sf_dir: str):
    """Exact count(DISTINCT l_partkey) per order (ops.
    grouped_distinct_count): only distinct pairs move through the one
    key-bucketed shuffle."""
    import ray.data as rd

    from essentials_rd.ops import grouped_distinct_count

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    return grouped_distinct_count(li, "l_orderkey", "l_partkey",
                                  out_col="n_parts")


def _q_lang_char_quantiles(sf_dir: str):
    """Exact per-language discrete quantiles of document length
    (ops.grouped_quantiles, quantile_disc semantics) — the histogram
    moves, the rows don't."""
    import ray.data as rd

    from essentials_rd.ops import grouped_quantiles

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "n_chars"])
    return grouped_quantiles(docs, "lang", "n_chars", QUANTILES)


def _q_lang_char_quantiles_cont(sf_dir: str):
    """Exact per-language INTERPOLATED quantiles of document length
    (ops.grouped_quantiles(cont=True), quantile_cont semantics) —
    dyadic q values make the per-key position, fraction and lerp
    exactly representable doubles, so the hash matches DuckDB
    bit-for-bit."""
    import ray.data as rd

    from essentials_rd.ops import grouped_quantiles

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "n_chars"])
    return grouped_quantiles(docs, "lang", "n_chars", DYADIC_QUANTILES,
                             cont=True)


def _q_token_counts(sf_dir: str):
    """Whitespace + BPE-ish regex token counts per document (the same
    RE2-compatible pattern runs in DuckDB's regexp_extract_all)."""
    import ray.data as rd

    from essentials_rd.textops import token_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return token_counts(docs)


def _q_quality_score(sf_dir: str):
    """Per-document quality signals (punct/stopword ratios, mean token
    length) — stateless vectorized stage, oracle-exact after 6-dp
    half-up rounding on both sides."""
    import ray.data as rd

    from essentials_rd.textops import quality_score

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return quality_score(docs)


def _q_cosine_near_dup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (broadcast matrix + one
    matmul per block; scale path = per-IVF-bucket, ann.py docstring)."""
    import ray.data as rd

    from essentials_rd.ann import cosine_near_dup_pairs

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    return cosine_near_dup_pairs(vecs, COSINE_DUP_T)


LSH_NBITS = 72   # 24 bands × 3 bits: recall 1.0 on the fixture at
LSH_BANDS = 24   # COSINE_DUP_T (verified at sf0.001 + sf0.01; pytest
                 # pins the banding math on planted high-threshold dups)


def _q_lsh_cosine(sf_dir: str):
    """Random-hyperplane LSH variant of cosine_near_dup (ann.
    lsh_near_dup_pairs — the brief's LSH-bucketed ANN scale path):
    sign-random-projection signatures band vectors into buckets, the
    exact float64 kernel verifies within buckets (precision 1.0 by
    construction).  At the fixture's low 0.4 threshold the banding is
    recall-1.0 by parameter choice (deterministic, data-independent
    planes), so the exact-pair oracle applies verbatim; the operator's
    performance regime is high-threshold near-dup, where buckets are
    sparse (see pytest)."""
    import ray.data as rd

    from essentials_rd.ann import lsh_near_dup_pairs

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    return lsh_near_dup_pairs(vecs, COSINE_DUP_T, nbits=LSH_NBITS,
                              bands=LSH_BANDS)


DBSCAN_EPS = 20       # integer units after x1000 quantization
DBSCAN_MINPTS = 4     # eps-ball INCLUDING self
DBSCAN_Q = 1000
DBSCAN_CC_ITERS = 40  # ≥ measured min-propagation rounds (13 sf0.001 / 21 sf0.01 / 29 sf0.1 — the r5 sf0.1 sweep caught 24 being too small)


def _q_dbscan(sf_dir: str):
    """Grid-partitioned DBSCAN (dbscan.grid_dbscan) over the
    integer-quantized first two embedding dims: cell side == eps makes
    the 3×3 grid join a lossless blocking of the eps-neighbor
    predicate (exact integer distance compares — no all-pairs), core
    flags are exact in-bucket counts, clusters come from the SAME
    hash-min CC superstep engine as the link graph, border points take
    the MIN adjacent core cluster (the deterministic variant of
    DBSCAN's order-dependent border rule) and noise is -1.  The oracle
    recomputes the whole path from the brute-force pair predicate, so
    equality also certifies the grid blocking is lossless."""
    import ray.data as rd

    from essentials_rd.dbscan import grid_dbscan
    from essentials_rd.pipelines import _work_dir
    from essentials_rd.util import np_col

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])

    def _quant(t: pa.Table) -> pa.Table:
        m = np.array(t.column("embedding").to_pylist(), np.float64)
        return pa.table({
            "vec_id": t.column("vec_id").cast(pa.int64()),
            "px": pa.array(np.floor(m[:, 0] * DBSCAN_Q).astype(np.int64),
                           pa.int64()),
            "py": pa.array(np.floor(m[:, 1] * DBSCAN_Q).astype(np.int64),
                           pa.int64()),
        })

    pts = vecs.map_batches(_quant, batch_format="pyarrow")
    out, steps = grid_dbscan(pts, _work_dir("dbscan"), DBSCAN_EPS,
                             DBSCAN_MINPTS)
    assert steps <= DBSCAN_CC_ITERS, (steps, DBSCAN_CC_ITERS)
    return out


def _dbscan_sql() -> str:
    eps2 = DBSCAN_EPS * DBSCAN_EPS
    steps = [
        f"""pts AS MATERIALIZED (SELECT vec_id,
      CAST(floor(embedding[1] * {DBSCAN_Q}) AS BIGINT) AS px,
      CAST(floor(embedding[2] * {DBSCAN_Q}) AS BIGINT) AS py
      FROM embeddings),
nb AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b FROM pts a, pts b
  WHERE a.vec_id <> b.vec_id AND
  (a.px-b.px)*(a.px-b.px) + (a.py-b.py)*(a.py-b.py) <= {eps2}),
cnt AS (SELECT a AS vec_id, count(*) AS n FROM nb GROUP BY a),
cls AS MATERIALIZED (SELECT p.vec_id,
  COALESCE(c.n, 0) + 1 >= {DBSCAN_MINPTS} AS is_core
  FROM pts p LEFT JOIN cnt c USING (vec_id)),
cc AS MATERIALIZED (SELECT nb.a, nb.b FROM nb
  JOIN cls ca ON ca.vec_id = nb.a JOIN cls cb ON cb.vec_id = nb.b
  WHERE ca.is_core AND cb.is_core),
x0 AS (SELECT vec_id AS vid, vec_id AS label FROM cls WHERE is_core)"""
    ]
    for k in range(DBSCAN_CC_ITERS):
        steps.append(f"""
xm{k} AS MATERIALIZED (SELECT e.b AS vid, min(l.label) AS ml
  FROM cc e JOIN x{k} l ON l.vid = e.a GROUP BY e.b),
x{k + 1} AS MATERIALIZED (SELECT v.vid,
  least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM x{k} v LEFT JOIN xm{k} m ON m.vid = v.vid)""")
    n = DBSCAN_CC_ITERS
    return (
        "WITH " + ",".join(steps) + f""",
border AS (SELECT nb.a AS vec_id, min(x.label) AS label FROM nb
  JOIN cls ca ON ca.vec_id = nb.a JOIN cls cb ON cb.vec_id = nb.b
  JOIN x{n} x ON x.vid = nb.b
  WHERE NOT ca.is_core AND cb.is_core GROUP BY nb.a)
SELECT vid AS vec_id, label, CAST(2 AS BIGINT) AS role FROM x{n}
UNION ALL SELECT vec_id, label, CAST(1 AS BIGINT) AS role FROM border
UNION ALL SELECT c.vec_id, CAST(-1 AS BIGINT) AS label,
  CAST(0 AS BIGINT) AS role FROM cls c
  LEFT JOIN border b ON b.vec_id = c.vec_id
  WHERE NOT c.is_core AND b.vec_id IS NULL"""
    )


def _q_embedding_clusters(sf_dir: str):
    """Embedding near-duplicate CLUSTERS (ann.cosine_dup_clusters):
    exact cosine pair graph → the same hash-min CC engine as the link
    graph and text dup_clusters; cluster = min vec_id of the component.
    Supersteps asserted within the oracle's unroll bound."""
    import ray.data as rd

    from essentials_rd.ann import cosine_dup_clusters
    from essentials_rd.pipelines import _work_dir

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    t, supersteps = cosine_dup_clusters(vecs, _work_dir("embcc"),
                                        COSINE_DUP_T)
    assert supersteps <= DUP_CC_ITERS, supersteps
    return t.sort_by("vec_id")


INDEX_PARTS = 16
PROBE_TOKENS = ["join", "scan", "sort"]


def _q_token_postings(sf_dir: str):
    """Inverted index round-trip (textops.build_inverted_index →
    probe_inverted_index): postings hash-partitioned on the token
    through the resumable sink, then a 3-token probe that reads ONLY
    the partitions those tokens hash into — partition pruning is the
    index's point.  Returns the probed (token, doc_id, tf) postings."""
    import ray.data as rd

    from essentials_rd.pipelines import _work_dir
    from essentials_rd.textops import build_inverted_index, probe_inverted_index

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = _work_dir("invidx")
    build_inverted_index(docs, out, num_partitions=INDEX_PARTS)
    return probe_inverted_index(out, INDEX_PARTS, PROBE_TOKENS)


def _q_docs_with_all_tokens(sf_dir: str):
    """AND-query against the inverted index: docs containing ALL probe
    tokens.  Reads only the probed tokens' partitions (same pruning as
    `token_postings`), then intersects the postings — the probe result
    is the per-token posting lists, already sub-corpus-sized."""
    import ray.data as rd

    from essentials_rd.pipelines import _work_dir
    from essentials_rd.textops import build_inverted_index, probe_inverted_index
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = _work_dir("invidx_and")
    build_inverted_index(docs, out, num_partitions=INDEX_PARTS)
    post = probe_inverted_index(out, INDEX_PARTS, PROBE_TOKENS)
    ids = np_col(post, "doc_id")
    uk, cnt = np.unique(ids, return_counts=True)
    return pa.table(
        {"doc_id": pa.array(uk[cnt == len(PROBE_TOKENS)], pa.int64())}
    )


PHRASE = ["order", "fast"]


def _q_phrase_hits(sf_dir: str):
    """Exact phrase search (textops.build_positional_index →
    phrase_query): (token, doc_id, pos) postings hash-partitioned on
    the token, then the phrase probe reads ONLY its tokens' partitions
    and intersects shifted position sets (packed doc·2³²|(pos−i)
    keys), so 'order fast' matches consecutive tokens only — the
    positional upgrade of the boolean AND index.  Returns
    (doc_id, n_hits) for matching docs."""
    import ray.data as rd

    from essentials_rd.pipelines import _work_dir
    from essentials_rd.textops import build_positional_index, phrase_query

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = _work_dir("posidx")
    build_positional_index(docs, out, num_partitions=INDEX_PARTS)
    return phrase_query(out, INDEX_PARTS, PHRASE)


def _phrase_hits_sql() -> str:
    cond = " AND ".join(
        f"l[i + {i}] = '{tok}'" if i else f"l[i] = '{tok}'"
        for i, tok in enumerate(PHRASE))
    return (
        "WITH s AS (SELECT doc_id, string_split(text, ' ') AS l "
        "FROM documents), "
        "c AS (SELECT doc_id, CAST(len(list_filter("
        f"range(1, len(l) - {len(PHRASE) - 2}), i -> {cond})) AS BIGINT) "
        "AS n_hits FROM s) "
        "SELECT doc_id, n_hits FROM c WHERE n_hits > 0"
    )


GRAM_SCALE = 1e6


def _q_embedding_gram(sf_dir: str):
    """EXACT distributed Gram matrix over integer-quantized embeddings
    (ann.gram_matrix): per-block d×d int64 partials tree-merged as Ray
    tasks — only 32 KB per block leaves the scan, and integer sums make
    the result bit-identical at any block layout / cluster size (a
    float Gram's reduction order changes the ulps).  Upper triangle as
    (i, j, g) rows, 1-based to match SQL list indexing."""
    import ray.data as rd

    from essentials_rd.ann import gram_matrix

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["embedding"])
    g = gram_matrix(vecs, scale=GRAM_SCALE)
    d = g.shape[0]
    i, j = np.triu_indices(d)
    return pa.table(
        {
            "i": pa.array(i.astype(np.int64) + 1, pa.int64()),
            "j": pa.array(j.astype(np.int64) + 1, pa.int64()),
            "g": pa.array(g[i, j], pa.int64()),
        }
    )


def _q_embedding_dim_stats(sf_dir: str):
    """Per-dimension stats of the embedding list column
    (ann.dim_stats): (dim, n, min, max, Σ floor(e·scale)) computed
    WITHOUT exploding — one (d,)-sized partial per block, folded
    driver-side; min/max are pure comparisons and the quantized sum is
    integer, so all columns are bit-exact at any layout."""
    import ray.data as rd

    from essentials_rd.ann import dim_stats

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["embedding"])
    return dim_stats(vecs, scale=GRAM_SCALE)


SEQ_LEN = 8


def _q_user_event_seq(sf_dir: str):
    """Ordered per-user event sequences (windows.event_sequences):
    first SEQ_LEN event types under the (ts, event_id) total order,
    '|'-joined — the sequence-assembly step of a behavioral training
    pipeline, capped so a hot user can't blow up a row."""
    import ray.data as rd

    from essentials_rd.windows import event_sequences

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return event_sequences(ev, max_len=SEQ_LEN)


SEQ_TYPE_MAP = {"view": "v", "click": "c", "purchase": "p",
                "signup": "s", "error": "e"}
SEQ_PATTERN = "vc*p"  # view → any clicks → purchase conversion path


def _q_conversion_paths(sf_dir: str):
    """MATCH_RECOGNIZE-class sequence pattern matching
    (windows.seq_pattern_counts): each user's event stream becomes a
    character string under the (ts, event_id) total order and the
    conversion-path motif ``vc*p`` (view → any clicks → purchase) is
    counted with leftmost non-overlapping regex semantics — Python
    ``re`` and DuckDB ``regexp_extract_all`` agree, so counts
    hash-match.  ONE user-bucketed shuffle, per-bucket lexsort +
    C-level string join + one vectorized str.count sweep."""
    import ray.data as rd

    from essentials_rd.windows import seq_pattern_counts

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return seq_pattern_counts(ev, SEQ_PATTERN, SEQ_TYPE_MAP)


def _conversion_paths_sql() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in sorted(SEQ_TYPE_MAP.items()))
    return (
        f"WITH ch AS (SELECT user_id, ts, event_id, "
        f"CASE event_type {cases} ELSE 'x' END AS ch FROM events), "
        "s AS (SELECT user_id, "
        "string_agg(ch, '' ORDER BY ts, event_id) AS seq, "
        "CAST(count(*) AS BIGINT) AS n_events FROM ch GROUP BY 1) "
        "SELECT user_id, n_events, "
        f"CAST(len(regexp_extract_all(seq, '{SEQ_PATTERN}')) AS BIGINT) "
        "AS n_matches FROM s"
    )


def _q_urgent_orders_by_priority(sf_dir: str):
    """Predicate pushdown at the read: the priority filter goes into
    ``read_parquet(filter=...)`` as a pyarrow dataset expression, so
    non-matching row groups/rows never enter the pipeline — followed by
    a small bucketed aggregate.  (SURVEY §4: "prune at the read".)"""
    import pyarrow.dataset as pads
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_pandas_agg

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pads.field("o_orderpriority") == "1-URGENT"),
    )
    return grouped_pandas_agg(
        orders,
        keys=["o_orderpriority"],
        aggs={
            "n_orders": ("o_orderkey", "count"),
            "min_orderkey": ("o_orderkey", "min"),
            "max_orderkey": ("o_orderkey", "max"),
        },
        key_fn=lambda b: _str_hash(b.column("o_orderpriority")),
    )


def _q_orders_rollup(sf_dir: str):
    """Multi-level grouped aggregate (ops.rollup_agg — SQL ROLLUP) over
    orders by (priority, status): all three grouping levels in ONE scan
    via per-block partials per grouping set.  Revenue is half-up cents
    per row BEFORE summing (integer-exact at any partitioning, same
    trick as revenue_by_region); grouped-out keys take 'ALL' so the
    result is NULL-free for the driver's value-hash compare."""
    import ray.data as rd

    from essentials_rd.ops import rollup_agg
    from essentials_rd.util import np_col as _nc

    def _cents(t: pa.Table) -> pa.Table:
        # half-up cents per row (prices > 0), = DuckDB ROUND(x*100, 0)
        c = np.floor(_nc(t, "o_totalprice") * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "o_orderstatus": t.column("o_orderstatus"),
                "cents": pa.array(c, pa.int64()),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    ).map_batches(_cents, batch_format="pyarrow")
    out = rollup_agg(orders, ["o_orderpriority", "o_orderstatus"], "cents")

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["o_orderpriority", "o_orderstatus", "n_orders", "total_cents"]
        )

    return out.map_batches(_rename, batch_format="pyarrow")


def _q_orders_per_nation(sf_dir: str):
    """Two-shape join exercise (ops.join, SURVEY.md §2.4 R3): customer
    ⋈(broadcast) nation — small side ray.put once — then orders
    ⋈(partitioned hash) the result on o_custkey, grouped per nation.
    Integer-only aggregates so the oracle compare is bit-exact."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_pandas_agg, join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderkey"])
    cn = join(cust.rename_columns({"c_nationkey": "n_nationkey"}), nat,
              on="n_nationkey", how="inner", broadcast=True)
    oc = join(orders.rename_columns({"o_custkey": "c_custkey"}), cn,
              on="c_custkey", how="inner", broadcast=False, num_buckets=32)
    agg = grouped_pandas_agg(
        oc,
        keys=["n_name"],
        aggs={
            "n_orders": ("o_orderkey", "count"),
            "max_orderkey": ("o_orderkey", "max"),
        },
        key_fn=lambda b: _str_hash(b.column("n_name")),
        num_buckets=8,
    )
    rows = agg.take_all()
    return pa.table(
        {
            "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
            "n_orders": pa.array([r["n_orders"] for r in rows], pa.int64()),
            "max_orderkey": pa.array([r["max_orderkey"] for r in rows], pa.int64()),
        }
    )


def _q_cust_no_orders(sf_dir: str):
    """Distributed ANTI join (ops.join how='anti'): customers that
    placed no URGENT order (the unfiltered anti join is empty at every
    sf — filtered at the read so the result is non-trivial)."""
    import ray.data as rd

    from essentials_rd.ops import join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'").select_columns(["o_custkey"])
    res = join(cust, orders.rename_columns({"o_custkey": "c_custkey"}),
               on="c_custkey", how="anti", broadcast=False, num_buckets=32)
    rows = res.take_all()
    return pa.table(
        {"c_custkey": pa.array([r["c_custkey"] for r in rows], pa.int64())}
    )


def _q_bloom_join_urgent(sf_dir: str):
    """Bloom-pre-filtered join (ops.bloom_join): lineitem — the big
    probe side — is filtered through a tree-built Bloom filter over the
    urgent orders' keys INSIDE map_batches before the partitioned
    join's co-shuffle, so the ~95 % of lineitem rows whose order isn't
    urgent never enter the exchange.  False positives are dropped by
    the exact join, so the result is identical to the plain join; the
    grouped integer aggregates make the oracle compare bit-exact."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import bloom_join, grouped_pandas_agg

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_returnflag"],
    )
    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'").select_columns(
        ["o_orderkey"]
    ).rename_columns({"o_orderkey": "l_orderkey"})

    def _qty_int(t: pa.Table) -> pa.Table:
        q = np.asarray(
            t.column("l_quantity").to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                "l_returnflag": t.column("l_returnflag"),
                "qty": pa.array(np.floor(q + 0.5).astype(np.int64), pa.int64()),
            }
        )

    j = bloom_join(
        line.map_batches(_qty_int, batch_format="pyarrow"), urgent,
        on="l_orderkey", how="inner", num_buckets=32,
    )
    agg = grouped_pandas_agg(
        j,
        keys=["l_returnflag"],
        aggs={"n": ("l_orderkey", "count"), "sum_qty": ("qty", "sum")},
        key_fn=lambda b: _str_hash(b.column("l_returnflag")),
        num_buckets=4,
    )
    rows = agg.take_all()
    return pa.table(
        {
            "l_returnflag": pa.array(
                [r["l_returnflag"] for r in rows], pa.string()
            ),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "sum_qty": pa.array([r["sum_qty"] for r in rows], pa.int64()),
        }
    ).sort_by("l_returnflag")


SKEW_HOT = 40


def _q_skew_join_nations(sf_dir: str):
    """Skew-aware join (ops.skew_join): events.user_id is power-law-ish
    (busiest user ≫ median), so keys with > SKEW_HOT left rows are
    routed around the shuffle via a broadcast of just their right rows
    while the cold tail takes the partitioned path — union equals the
    plain join exactly.  The hot census is distributed (per-block
    pre-combined counts, one tiny combine).  Integer cents keep the
    grouped compare bit-exact (floor(value·100), the repo's shared
    events convention)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, skew_join
    from essentials_rd.util import np_col

    def _cents(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "cents": c,
            }
        )

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).map_batches(_cents, batch_format="pyarrow")
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).rename_columns({"c_custkey": "user_id"})
    j = skew_join(events, cust, on="user_id", how="inner",
                  hot_threshold=SKEW_HOT, num_buckets=32)
    agg = grouped_pandas_agg(
        j,
        keys=["c_nationkey"],
        aggs={"n_events": ("user_id", "count"), "sum_cents": ("cents", "sum")},
        key_fn=lambda b: np_col(b, "c_nationkey"),
        num_buckets=8,
    )
    rows = agg.take_all()
    return pa.table(
        {
            "c_nationkey": pa.array(
                [r["c_nationkey"] for r in rows], pa.int64()
            ),
            "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
            "sum_cents": pa.array([r["sum_cents"] for r in rows], pa.int64()),
        }
    ).sort_by("c_nationkey")


PRICE_SPLIT = 150_000.0


def _q_status_priority_intersect(sf_dir: str):
    """SQL INTERSECT via ops.set_op: the distinct
    (o_orderstatus, o_orderpriority) pairs that occur BOTH among
    orders priced >= PRICE_SPLIT and among cheaper orders — one
    co-shuffle on the full-row hash, multi-column string keys."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.ops import set_op

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    hi = orders.filter(
        expr=f"o_totalprice >= {PRICE_SPLIT}"
    ).select_columns(["o_orderstatus", "o_orderpriority"])
    lo = orders.filter(
        expr=f"o_totalprice < {PRICE_SPLIT}"
    ).select_columns(["o_orderstatus", "o_orderpriority"])
    out = set_op(hi, lo, "intersect", num_buckets=8)
    rows = out.take_all()
    return pa.table(
        {
            "o_orderstatus": pa.array(
                [r["o_orderstatus"] for r in rows], pa.string()
            ),
            "o_orderpriority": pa.array(
                [r["o_orderpriority"] for r in rows], pa.string()
            ),
        }
    )


def _q_cust_f_not_o(sf_dir: str):
    """SQL EXCEPT via ops.set_op: custkeys holding a finished ('F')
    order but no open ('O') order."""
    import ray.data as rd

    from essentials_rd.ops import set_op

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"]
    )
    f = orders.filter(expr="o_orderstatus == 'F'").select_columns(["o_custkey"])
    o = orders.filter(expr="o_orderstatus == 'O'").select_columns(["o_custkey"])
    out = set_op(f, o, "except", num_buckets=8)
    rows = out.take_all()
    return pa.table(
        {"o_custkey": pa.array([r["o_custkey"] for r in rows], pa.int64())}
    )


def _q_text_stats(sf_dir: str):
    import ray.data as rd

    from essentials_rd.textops import text_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return text_stats(docs)


def _q_exact_dup_groups(sf_dir: str):
    import ray.data as rd

    from essentials_rd.textops import exact_dup_groups

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    rows = exact_dup_groups(docs).take_all()
    # explicit schema so an empty result still compares against the
    # oracle's (equally empty) typed frame
    return pa.table(
        {
            "sha256": pa.array([r["sha256"] for r in rows], pa.string()),
            "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
            "keep_id": pa.array([r["keep_id"] for r in rows], pa.int64()),
        }
    )


def _q_ann(sf_dir: str):
    import ray.data as rd

    from essentials_rd.ann import brute_force_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qrows = sorted(
        (r for r in ds.filter(expr="vec_id < 3").take_all()),
        key=lambda r: r["vec_id"],
    )
    queries_m = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    return brute_force_topk(ds, queries_m, qids, k=5)


def _q_cohort_ltv(sf_dir: str):
    """Cohort LTV matrix — the cumulative-revenue-by-cohort-age view
    every subscription/commerce dashboard is built on: users cohorted
    by the calendar month of their FIRST event (any type), purchase
    cents accumulated per (cohort_month, age_in_months) cell and
    summed cumulatively along age — exact integers.  One user-bucketed
    first-event fold, one partitioned join of purchases to cohorts,
    one cell combine (cells are months², driver-small); month index =
    months since 1970-01 via datetime64[M], matching SQL's
    year·12+month arithmetic exactly."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts",
                                  "value"])

    def _mon(t: pa.Table) -> np.ndarray:
        us = np.asarray(t.column("ts").cast(pa.int64()))
        return us.astype("datetime64[us]").astype(
            "datetime64[M]").astype(np.int64)

    def _first(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("user_id").cast(pa.int64()),
                         "m": pa.array(_mon(t), pa.int64())})

    cohorts = grouped_pandas_agg(
        ev.map_batches(_first, batch_format="pyarrow"),
        keys=["user_id"], aggs={"cm": ("m", "min")})

    def _purch(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), object)
        keep = et == "purchase"
        tt = t.take(pa.array(np.flatnonzero(keep)))
        c = np.floor(np.asarray(tt.column("value").to_numpy(
            zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"user_id": tt.column("user_id").cast(pa.int64()),
                         "pm": pa.array(_mon(tt), pa.int64()),
                         "cents": pa.array(c, pa.int64())})

    purch = ev.map_batches(_purch, batch_format="pyarrow")
    tagged = join(purch, cohorts, on="user_id", broadcast=False)

    cells: dict[tuple, list] = {}
    def _cell(t: pa.Table) -> pa.Table:
        cm = np_col(t, "cm")
        age = np_col(t, "pm") - cm
        c = np_col(t, "cents")
        key = cm * np.int64(1 << 16) + age
        import pandas as pd
        g = pd.DataFrame({"k": key, "c": c, "n": 1}).groupby("k").agg(
            n=("n", "sum"), c=("c", "sum"))
        return pa.table({
            "k": pa.array(g.index.to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        })

    for r in tagged.map_batches(_cell, batch_format="pyarrow").take_all():
        k = int(r["k"])
        a = cells.setdefault((k >> 16, k & 0xFFFF), [0, 0])
        a[0] += int(r["n"]); a[1] += int(r["c"])
    out = []
    for cm in sorted({c for c, _ in cells}):
        ages = sorted(a for c, a in cells if c == cm)
        cum = 0
        for a in range(0, max(ages) + 1):
            n, c = cells.get((cm, a), (0, 0))
            cum += c
            out.append((cm, a, n, cum))
    return pa.table({
        "cohort_m": pa.array([o[0] for o in out], pa.int64()),
        "age": pa.array([o[1] for o in out], pa.int64()),
        "n_purch": pa.array([o[2] for o in out], pa.int64()),
        "cum_cents": pa.array([o[3] for o in out], pa.int64()),
    })


def _cohort_ltv_sql() -> str:
    mexpr = ("(CAST(date_part('year', {c}) AS BIGINT) * 12 "
             "+ CAST(date_part('month', {c}) AS BIGINT) - 1 "
             "- 1970 * 12)")
    return (
        "WITH fm AS (SELECT user_id, "
        f"min({mexpr.format(c='ts')}) AS cm FROM events GROUP BY 1), "
        "pc AS (SELECT e.user_id, "
        f"{mexpr.format(c='e.ts')} - f.cm AS age, "
        "CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents, f.cm "
        "FROM events e JOIN fm f USING (user_id) "
        "WHERE e.event_type = 'purchase'), "
        "cells AS (SELECT cm, age, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(cents) AS BIGINT) AS c FROM pc GROUP BY 1, 2), "
        "mx AS (SELECT cm, max(age) AS ma FROM cells GROUP BY 1), "
        "grid AS (SELECT mx.cm, r.range AS age FROM mx, "
        "range(0, 4096) r WHERE r.range <= mx.ma), "
        "fl AS (SELECT g.cm, g.age, COALESCE(cells.n, 0) AS n, "
        "COALESCE(cells.c, 0) AS c FROM grid g "
        "LEFT JOIN cells ON cells.cm = g.cm AND cells.age = g.age) "
        "SELECT cm AS cohort_m, age, n AS n_purch, "
        "CAST(sum(c) OVER (PARTITION BY cm ORDER BY age) AS BIGINT) "
        "AS cum_cents FROM fl ORDER BY 1, 2"
    )


def _q_quantile_normalize(sf_dir: str):
    """Cross-source quantile normalization — the batch-effect
    correction ML pipelines apply before mixing corpora: every doc's
    n_chars maps to the POOLED length distribution's value at its
    within-source quantile position, norm = pooled_sorted[⌈r·N/n_s⌉]
    under the (n_chars, doc_id) total order — exact integers end to
    end.  Per source (n_docs, sum_raw, sum_norm): after normalization
    every source carries the pooled shape.  The pooled lookup rides
    the distributed value histogram (cumulative counts broadcast,
    distinct values never rows); ranks come from one source-bucketed
    sort."""
    import ray as _ray
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg, int_value_counts
    from essentials_rd.util import np_col
    from essentials_rd.windows import _str_or_int_key

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])

    hist = sorted(
        (int(r["value"]), int(r["count"]))
        for r in int_value_counts(
            docs.select_columns(["n_chars"]), "n_chars").take_all())
    vals = np.array([h[0] for h in hist], np.int64)
    cum = np.cumsum(np.array([h[1] for h in hist], np.int64))
    n_pool = int(cum[-1])
    ref = _ray.put((vals, cum))

    def _per_source(grp: pa.Table) -> pa.Table:
        v_, c_ = _ray.get(ref)
        src = np.asarray(grp.column("source").to_pylist(), object)
        nc = np_col(grp, "n_chars")
        did = np_col(grp, "doc_id")
        out_s, out_n, out_raw, out_norm = [], [], [], []
        for s_ in np.unique(src):
            m = src == s_
            order = np.lexsort((did[m], nc[m]))
            ncs = nc[m][order]
            ns = len(ncs)
            r = np.arange(1, ns + 1, dtype=np.int64)
            idx = (r * n_pool + ns - 1) // ns  # ceil(r*N/ns), 1-based
            norm = v_[np.searchsorted(c_, idx, side="left")]
            out_s.append(str(s_))
            out_n.append(ns)
            out_raw.append(int(ncs.sum()))
            out_norm.append(int(norm.sum()))
        return pa.table({
            "source": pa.array(out_s, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "sum_raw": pa.array(out_raw, pa.int64()),
            "sum_norm": pa.array(out_norm, pa.int64()),
        })

    rows = sorted(hash_bucket_agg(
        docs, lambda b: _str_or_int_key(
            b.column("source")).view(np.int64),
        _per_source).take_all(), key=lambda r: r["source"])
    return pa.table({
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "sum_raw": pa.array([r["sum_raw"] for r in rows], pa.int64()),
        "sum_norm": pa.array([r["sum_norm"] for r in rows], pa.int64()),
    })


def _quantile_normalize_sql() -> str:
    return (
        "WITH pool AS (SELECT n_chars AS v, row_number() OVER ("
        "ORDER BY n_chars, doc_id) AS rn FROM documents), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), "
        "rk AS (SELECT source, n_chars, row_number() OVER ("
        "PARTITION BY source ORDER BY n_chars, doc_id) AS r, "
        "count(*) OVER (PARTITION BY source) AS ns FROM documents), "
        "mp AS (SELECT rk.source, rk.n_chars, p.v AS norm FROM rk, nn "
        "JOIN pool p ON p.rn = (rk.r * nn.n + rk.ns - 1) // rk.ns) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_raw, "
        "CAST(sum(norm) AS BIGINT) AS sum_norm "
        "FROM mp GROUP BY 1 ORDER BY 1"
    )


def _q_hourly_gapfill(sf_dir: str):
    """Linear-interpolation gap fill — the time-series imputation step
    before any regular-grid model: hourly event-value sums (cents) on
    the dense min..max hour grid, with every EMPTY hour filled by
    exact integer interpolation between its nearest non-empty
    neighbors, value = prev + ⌊(next−prev)·offset/gap⌋ (floor of the
    exact rational, so engine and SQL agree bit-for-bit; leading
    hours before the first observation carry it backward).  Output:
    per hour-of-gap-status the row count and value sum — plus the
    filled series' global sum, auditing that imputation touched only
    the gaps.  One bucketed sum combine; grid math driver-side."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def _proj(t: pa.Table) -> pa.Table:
        h = (np.asarray(t.column("ts").cast(pa.int64()))
             // 3_600_000_000).astype(np.int64)
        c = np.floor(np.asarray(t.column("value").to_numpy(
            zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    rows = grouped_pandas_agg(
        ev.map_batches(_proj, batch_format="pyarrow"),
        keys=["h"], aggs={"s": ("c", "sum")}).take_all()
    hs = np.array([r["h"] for r in rows], np.int64)
    ss = np.array([int(r["s"]) for r in rows], np.int64)
    o = np.argsort(hs)
    hs, ss = hs[o], ss[o]
    lo, hi = int(hs[0]), int(hs[-1])
    grid = np.full(hi - lo + 1, -1, np.int64)
    grid[hs - lo] = ss
    filled = grid.copy()
    present = np.flatnonzero(grid >= 0)
    for a, b in zip(present, present[1:]):
        if b - a > 1:
            pv, nv = int(grid[a]), int(grid[b])
            for t in range(a + 1, b):
                filled[t] = pv + (nv - pv) * (t - a) // (b - a)
    n_obs = int((grid >= 0).sum())
    n_fill = len(grid) - n_obs
    return pa.table({
        "n_hours": pa.array([len(grid)], pa.int64()),
        "n_observed": pa.array([n_obs], pa.int64()),
        "n_filled": pa.array([n_fill], pa.int64()),
        "sum_observed": pa.array([int(ss.sum())], pa.int64()),
        "sum_filled_total": pa.array([int(filled.sum())], pa.int64()),
    })


def _hourly_gapfill_sql() -> str:
    return (
        "WITH hv AS (SELECT epoch_us(ts) // 3600000000 AS h, "
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS s FROM events GROUP BY 1), "
        "bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hv), "
        "grid AS (SELECT (SELECT lo FROM bounds) + r.range AS h, hv.s "
        "FROM range(0, 200000) r LEFT JOIN hv "
        "ON hv.h = (SELECT lo FROM bounds) + r.range "
        "WHERE (SELECT lo FROM bounds) + r.range <= "
        "(SELECT hi FROM bounds)), "
        "nb AS (SELECT h, s, "
        "max(CASE WHEN s IS NOT NULL THEN h END) OVER (ORDER BY h "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph, "
        "min(CASE WHEN s IS NOT NULL THEN h END) OVER (ORDER BY h "
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh "
        "FROM grid), "
        "fl AS (SELECT n.h, CASE WHEN n.s IS NOT NULL THEN n.s "
        "WHEN pv.s IS NULL THEN nv.s "
        "WHEN nv.s IS NULL THEN pv.s "
        "ELSE pv.s + ((nv.s - pv.s) * (n.h - n.ph) "
        "- ((((nv.s - pv.s) * (n.h - n.ph)) % (n.nh - n.ph)) "
        "+ (n.nh - n.ph)) % (n.nh - n.ph)) // (n.nh - n.ph) "
        "END AS v, n.s FROM nb n "
        "LEFT JOIN hv pv ON pv.h = n.ph LEFT JOIN hv nv ON nv.h = n.nh) "
        "SELECT CAST(count(*) AS BIGINT) AS n_hours, "
        "CAST(count(s) AS BIGINT) AS n_observed, "
        "CAST(count(*) - count(s) AS BIGINT) AS n_filled, "
        "CAST(COALESCE(sum(s), 0) AS BIGINT) AS sum_observed, "
        "CAST(COALESCE(sum(v), 0) AS BIGINT) AS sum_filled_total "
        "FROM fl"
    )


def _q_user_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user — the SQL
    'gaps and islands' problem: per user the count of distinct active
    days and the longest run of consecutive days.  ONE user-bucketed
    exchange; per bucket a lexsort + per-user-segment vectorized
    diff==1 run-length kernel over the distinct day sets (no per-row
    Python)."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def _proj(t: pa.Table) -> pa.Table:
        d = (np.asarray(t.column("ts").cast(pa.int64()))
             // 86_400_000_000).astype(np.int64)
        return pa.table({"u": t.column("user_id").cast(pa.int64()),
                         "d": pa.array(d, pa.int64())})

    def _streaks(grp: pa.Table) -> pa.Table:
        u = np_col(grp, "u")
        d = np_col(grp, "d")
        # distinct (u, day)
        key = np.unique(u * np.int64(1 << 22) + d)
        uu = key >> np.int64(22)
        dd = key & np.int64((1 << 22) - 1)
        starts = np.flatnonzero(np.r_[True, uu[1:] != uu[:-1]])
        out_u, out_n, out_s = [], [], []
        for st, en in zip(starts, np.r_[starts[1:], len(uu)]):
            days = dd[st:en]
            # runs of consecutive days
            brk = np.flatnonzero(np.r_[True, np.diff(days) != 1])
            lens = np.diff(np.r_[brk, len(days)])
            out_u.append(int(uu[st]))
            out_n.append(len(days))
            out_s.append(int(lens.max()))
        return pa.table({
            "user_id": pa.array(out_u, pa.int64()),
            "n_days": pa.array(out_n, pa.int64()),
            "max_streak": pa.array(out_s, pa.int64()),
        })

    rows = sorted(hash_bucket_agg(
        ev.map_batches(_proj, batch_format="pyarrow"),
        lambda b: np_col(b, "u"), _streaks).take_all(),
        key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "n_days": pa.array([r["n_days"] for r in rows], pa.int64()),
        "max_streak": pa.array([int(r["max_streak"]) for r in rows],
                               pa.int64()),
    })


def _user_streaks_sql() -> str:
    return (
        "WITH ud AS (SELECT DISTINCT user_id, "
        "epoch_us(ts) // 86400000000 AS d FROM events), "
        "isl AS (SELECT user_id, d - row_number() OVER ("
        "PARTITION BY user_id ORDER BY d) AS grp FROM ud), "
        "runs AS (SELECT user_id, grp, count(*) AS len FROM isl "
        "GROUP BY 1, 2) "
        "SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days, "
        "CAST(max(len) AS BIGINT) AS max_streak FROM runs "
        "GROUP BY 1 ORDER BY 1"
    )


TTC_QS = [0.5, 0.9]


def _q_time_to_convert(sf_dir: str):
    """Time-to-convert quantiles — the product-analytics latency
    metric: per user the microseconds from FIRST view to FIRST
    purchase (users with a purchase before any view convert in <0
    time? no — only users whose first purchase follows their first
    view count; the others are reported in the converts/negatives
    split), exact P50/P90 over the deltas via the distributed value
    histogram (driver sees distinct deltas, never users).  One
    user-bucketed min fold + one histogram combine."""
    import ray.data as rd

    from essentials_rd.ops import exact_quantiles, grouped_pandas_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])

    def _proj(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), object)
        keep = (et == "view") | (et == "purchase")
        tt = t.take(pa.array(np.flatnonzero(keep)))
        et = et[keep]
        ts = np.asarray(tt.column("ts").cast(pa.int64()))
        big = np.int64(1 << 62)
        isv = et == "view"
        return pa.table({
            "u": tt.column("user_id").cast(pa.int64()),
            "v": pa.array(np.where(isv, ts, big), pa.int64()),
            "p": pa.array(np.where(~isv, ts, big), pa.int64()),
        })

    agg = grouped_pandas_agg(
        ev.map_batches(_proj, batch_format="pyarrow"),
        keys=["u"], aggs={"fv": ("v", "min"), "fp": ("p", "min")})

    def _delta(t: pa.Table) -> pa.Table:
        fv = np_col(t, "fv")
        fp = np_col(t, "fp")
        big = np.int64(1 << 62)
        conv = (fv < big) & (fp < big) & (fp >= fv)
        return pa.table({
            "delta": pa.array(fp[conv] - fv[conv], pa.int64()),
            "n_conv": pa.array(np.full(int(conv.sum()), 1, np.int64)),
        })

    deltas = agg.map_batches(_delta, batch_format="pyarrow")
    n_conv = deltas.count()
    if n_conv == 0:
        p50 = p90 = 0
    else:
        p50, p90 = exact_quantiles(deltas, "delta", TTC_QS)
    return pa.table({
        "n_converts": pa.array([int(n_conv)], pa.int64()),
        "p50_us": pa.array([int(p50)], pa.int64()),
        "p90_us": pa.array([int(p90)], pa.int64()),
    })


def _time_to_convert_sql() -> str:
    return (
        "WITH f AS (SELECT user_id, "
        "min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) "
        "AS fv, "
        "min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) "
        "AS fp FROM events GROUP BY 1), "
        "d AS (SELECT fp - fv AS delta FROM f "
        "WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv) "
        "SELECT CAST(count(*) AS BIGINT) AS n_converts, "
        "CAST(COALESCE(quantile_disc(delta, 0.5), 0) AS BIGINT) "
        "AS p50_us, "
        "CAST(COALESCE(quantile_disc(delta, 0.9), 0) AS BIGINT) "
        "AS p90_us FROM d"
    )


MMR_POOL, MMR_K = 50, 5


def _q_mmr_diverse(sf_dir: str):
    """MMR diversified retrieval (maximal marginal relevance, λ=½ with
    equal integer scales): from the BM25 top-50 pool, greedily pick 5
    documents maximizing relevance MINUS the max similarity to
    anything already picked — marginal m(d) = bm25(d) −
    max_s ⌊10⁶·cos6dp(d,s)+½⌋, ties to the smaller doc_id — the
    redundancy-killing reranker every retrieval stack ends with.  BM25
    runs distributed; the greedy runs over the 50-doc pool (embedding
    rows gathered for the pool only).  Output: (rank, doc_id, rel,
    penalty, marginal) per pick — penalty 0 for the first."""
    import ray.data as rd

    from essentials_rd.pipelines import round_half_up
    from essentials_rd.textops import bm25_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    bm = bm25_topk(docs, QUERY_TEXT, k=MMR_POOL, scale=BM25_SCALE)
    pool = bm.column("doc_id").to_pylist()
    rel = dict(zip(pool, bm.column("score").to_pylist()))

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    pool_set = set(int(p) for p in pool)

    def _keep(t: pa.Table) -> pa.Table:
        from essentials_rd.util import np_col as _nc
        ids = _nc(t, "vec_id")
        m = np.isin(ids, list(pool_set))
        return t.take(pa.array(np.flatnonzero(m)))

    rows = emb.map_batches(_keep, batch_format="pyarrow").take_all()
    vecs = {int(r["vec_id"]): np.asarray(r["embedding"], np.float64)
            for r in rows}
    for d in vecs:
        vecs[d] = vecs[d] / np.linalg.norm(vecs[d])

    def _sim(a, b):
        c = round_half_up(np.array([float(vecs[a] @ vecs[b])]), 6)[0]
        return int(np.floor(c * 1_000_000 + 0.5))

    selected, out = [], []
    cands = sorted(pool_set)
    for rank in range(1, MMR_K + 1):
        best = None
        for d in cands:
            if d in selected:
                continue
            pen = max((_sim(d, s) for s in selected), default=0)
            m = int(rel[d]) - pen
            key = (-m, d)
            if best is None or key < best[0]:
                best = (key, d, int(rel[d]), pen, m)
        _, d, r_, pen, m = best
        selected.append(d)
        out.append((rank, d, r_, pen, m))
    return pa.table({
        "rank": pa.array([o[0] for o in out], pa.int64()),
        "doc_id": pa.array([o[1] for o in out], pa.int64()),
        "rel": pa.array([o[2] for o in out], pa.int64()),
        "penalty": pa.array([o[3] for o in out], pa.int64()),
        "marginal": pa.array([o[4] for o in out], pa.int64()),
    })


def _mmr_sql() -> str:
    bm_pool = f"""
tok AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
st AS MATERIALIZED (SELECT (SELECT count(*) FROM documents) AS n,
                           (SELECT count(*) FROM tok) AS t),
q AS (SELECT DISTINCT unnest(string_split('{QUERY_TEXT}', ' ')) AS token),
tf AS MATERIALIZED (
  SELECT doc_id, token, count(*) AS tf FROM tok JOIN q USING (token)
  GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
scx AS (
  SELECT f.doc_id,
    CAST((CAST({BM25_SCALE} AS HUGEINT) * 22 * s.n * f.tf * s.t) //
         (CAST(d.df AS HUGEINT) *
          (10 * f.tf * s.t + 3 * s.t + 9 * l.dl * s.n)) AS BIGINT) AS term
  FROM tf f JOIN df d USING (token) JOIN dl l USING (doc_id), st s
),
pool AS MATERIALIZED (
  SELECT p.doc_id, p.score, CAST(e.embedding AS DOUBLE[]) AS v
  FROM (SELECT doc_id, CAST(sum(term) AS BIGINT) AS score FROM scx
        GROUP BY 1 ORDER BY score DESC, doc_id LIMIT {MMR_POOL}) p
  JOIN embeddings e ON e.vec_id = p.doc_id
)"""
    steps = ["p1 AS (SELECT 1 AS rank, doc_id, score AS rel, "
             "CAST(0 AS BIGINT) AS penalty, score AS marginal, v "
             "FROM pool ORDER BY score DESC, doc_id LIMIT 1)"]
    for i in range(2, MMR_K + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT doc_id, v FROM p{j}" for j in range(1, i))
        steps.append(f"""
sel{i} AS ({prev_union}),
c{i} AS (SELECT p.doc_id, p.score, p.v,
  (SELECT MAX(CAST(floor(ROUND(list_cosine_similarity(p.v, s.v), 6)
    * 1000000 + 0.5) AS BIGINT)) FROM sel{i} s) AS pen
  FROM pool p WHERE p.doc_id NOT IN (SELECT doc_id FROM sel{i})),
p{i} AS (SELECT {i} AS rank, doc_id, score AS rel, pen AS penalty,
  score - pen AS marginal, v FROM c{i}
  ORDER BY score - pen DESC, doc_id LIMIT 1)""")
    picks = " UNION ALL ".join(
        f"SELECT rank, doc_id, rel, penalty, marginal FROM p{j}"
        for j in range(1, MMR_K + 1))
    return (
        f"WITH {bm_pool}, " + ",".join(steps)
        + f" SELECT CAST(rank AS BIGINT) AS rank, doc_id, rel, "
        f"CAST(penalty AS BIGINT) AS penalty, "
        f"CAST(marginal AS BIGINT) AS marginal FROM ({picks}) "
        f"ORDER BY rank"
    )


def _q_mutual_nn(sf_dir: str):
    """Reciprocal-nearest-neighbor merge pairs (ann.mutual_nn_pairs):
    one round of RNN agglomerative clustering — embedding pairs that
    are each other's cosine 1-NN under the shared (−cos6dp, vec_id)
    order, emitted once as (a<b, cosine).  Streaming all-vs-all: each
    block multiplies against the broadcast normalized matrix, 1 row
    per vector reaches the driver."""
    import ray.data as rd

    from essentials_rd.ann import mutual_nn_pairs

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return mutual_nn_pairs(emb)


def _mutual_nn_sql() -> str:
    return (
        "WITH e AS MATERIALIZED (SELECT vec_id, "
        "CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        "s AS MATERIALIZED (SELECT a.vec_id AS i, b.vec_id AS j, "
        "ROUND(list_cosine_similarity(a.v, b.v), 6) AS c "
        "FROM e a JOIN e b ON a.vec_id != b.vec_id), "
        "nn AS (SELECT i, j, c FROM (SELECT i, j, c, row_number() "
        "OVER (PARTITION BY i ORDER BY c DESC, j) AS rn FROM s) "
        "WHERE rn = 1) "
        "SELECT x.i AS a, x.j AS b, x.c AS cosine FROM nn x "
        "JOIN nn y ON y.i = x.j AND y.j = x.i AND x.i < x.j "
        "ORDER BY 1"
    )


JACCARD_T = 0.7
SHINGLE_K = 3
LANG_TOPK = 40
DUP_CC_ITERS = 16


def _q_near_dup_pairs(sf_dir: str):
    """EXACT near-duplicate pairs at shingle-Jaccard ≥ 0.7 via the
    prefix-filter set-similarity join — misses nothing, so the DuckDB
    brute-force oracle reproduces it row-for-row (Jaccard over hashed
    shingles == over shingle strings absent 64-bit collisions)."""
    import ray.data as rd

    from essentials_rd.pipelines import round_half_up
    from essentials_rd.textops import jaccard_similarity_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    t = jaccard_similarity_pairs(docs, threshold=JACCARD_T,
                                 shingle_k=SHINGLE_K)
    j = round_half_up(np.asarray(t["jaccard"], dtype=np.float64), 6)
    return pa.table({"a": t["a"], "b": t["b"],
                     "jaccard": pa.array(j, pa.float64())})


def _q_minhash_lsh_pairs(sf_dir: str):
    """MinHash+LSH banding → candidate pairs → exact-Jaccard verify.
    The LSH banding itself is not SQL-expressible, but the VERIFIED
    pair set is oracle-checkable against the brute-force shingle-
    Jaccard SQL (the banding config's recall is 1.0 on the driver
    corpus — pinned independently by the planted-dup recall pytest, so
    a red oracle row here means lost recall, loudly)."""
    import ray.data as rd

    from essentials_rd.pipelines import round_half_up
    from essentials_rd.textops import (
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    sigs = minhash_signatures(docs, shingle_k=SHINGLE_K)
    pairs = lsh_candidate_pairs(sigs)
    t = verify_jaccard(docs, pairs, threshold=JACCARD_T,
                       shingle_k=SHINGLE_K)
    j = round_half_up(np.asarray(t["jaccard"], dtype=np.float64), 6)
    return pa.table({"a": t["a"], "b": t["b"],
                     "jaccard": pa.array(j, pa.float64())})


def _q_dup_clusters(sf_dir: str):
    """Near-duplicate CLUSTERS: exact pair graph → the hash-min CC
    engine; cluster = min doc_id of the component (docs in ≥1 pair)."""
    import ray.data as rd

    from essentials_rd.pipelines import _work_dir
    from essentials_rd.textops import near_dup_clusters

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    t = near_dup_clusters(docs, _work_dir("dupcc"), threshold=JACCARD_T,
                          shingle_k=SHINGLE_K, exact=True)
    return t.sort_by("doc_id")


def _q_lang_pred(sf_dir: str):
    """Token language-ID (actor-pool stage, model built + broadcast
    once).  INTEGER profile weights make the classifier's argmax exactly
    reproducible in SQL — see ``_lang_pred_sql``."""
    import ray
    import ray.data as rd

    from essentials_rd.textops import build_lang_profiles, lang_id

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"]).materialize()
    prof = build_lang_profiles(docs, top_k=LANG_TOPK)
    rows = lang_id(docs, ray.put(prof)).take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "pred_lang": pa.array([r["pred_lang"] for r in rows], pa.string()),
        }
    )


WM_DELAY_US = 30 * 60 * 1_000_000  # 30-minute allowed lateness


def _q_late_events(sf_dir: str):
    """Streaming watermark / late-data accounting — the event-time vs
    arrival-order bookkeeping every streaming engine does before
    dropping or side-outputting late records: with arrival order =
    event_id, the watermark at each arrival is max(event time of all
    STRICTLY EARLIER arrivals) − 30 min, and an event is late iff its
    own event time is below that watermark.  The driver data is
    ts-ordered by event_id, so arrival order is SIMULATED network
    reordering: arrival rank = splitmix64(event_id) — a pure function
    both sides compute, guaranteeing genuinely late events.  The scan
    rides ops.global_prefix_max (exclusive distributed running max —
    one value-pure range partition + per-partition max pass + carried
    local scan, driver sees n_parts scalars); per event type the
    result reports totals, late counts and the worst lateness."""
    import ray.data as rd

    from essentials_rd.ops import (PREFIX_MAX_NEG_INF, global_prefix_max)
    from essentials_rd.util import hash64, np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])

    def _proj(t: pa.Table) -> pa.Table:
        eid = np.asarray(t.column("event_id").cast(pa.int64()))
        # unsigned splitmix order ≡ signed order after the sign-bit flip
        arr = (hash64(eid.astype(np.uint64))
               ^ np.uint64(1 << 63)).astype(np.int64)
        return pa.table({
            "arr": pa.array(arr, pa.int64()),
            "eid": pa.array(eid, pa.int64()),
            "t_us": t.column("ts").cast(pa.int64()),
            "event_type": t.column("event_type"),
        })

    wm = global_prefix_max(
        ev.map_batches(_proj, batch_format="pyarrow"),
        "arr", ["eid"], "t_us",
        lambda b: np_col(b, "eid"))

    def _partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), object)
        ts = np_col(t, "t_us")
        pm = np_col(t, "prev_max")
        # first arrival carries the −inf sentinel: never late
        late = (pm > PREFIX_MAX_NEG_INF) & (ts < pm - WM_DELAY_US)
        lateness = np.where(late, pm - WM_DELAY_US - ts, 0)
        out_t, out_n, out_l, out_m = [], [], [], []
        for ty in np.unique(et):
            m = et == ty
            out_t.append(str(ty))
            out_n.append(int(m.sum()))
            out_l.append(int(late[m].sum()))
            out_m.append(int(lateness[m].max()) if m.any() else 0)
        return pa.table({
            "event_type": pa.array(out_t, pa.string()),
            "n": pa.array(out_n, pa.int64()),
            "n_late": pa.array(out_l, pa.int64()),
            "max_late": pa.array(out_m, pa.int64()),
        })

    acc: dict[str, list[int]] = {}
    for r in wm.map_batches(_partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["event_type"], [0, 0, 0])
        a[0] += r["n"]
        a[1] += r["n_late"]
        a[2] = max(a[2], r["max_late"])
    keys = sorted(acc)
    return pa.table({
        "event_type": pa.array(keys, pa.string()),
        "n_events": pa.array([acc[k][0] for k in keys], pa.int64()),
        "n_late": pa.array([acc[k][1] for k in keys], pa.int64()),
        "max_lateness_us": pa.array([acc[k][2] for k in keys], pa.int64()),
    })


def _late_events_sql() -> str:
    # literal on purpose (twin-independence) — engine WM_DELAY_US (30 min)
    WM_DELAY_US = 1_800_000_000
    chain = _sm64_ctes("wz", "event_id, event_type, t",
                       "event_id",
                       "(SELECT event_id, event_type, epoch_us(ts) AS t "
                       "FROM events)")
    return (
        f"WITH {chain}, "
        "w AS (SELECT event_type, t, "
        "max(t) OVER (ORDER BY z, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm "
        "FROM wz3) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
        f"CAST(sum(CASE WHEN t < pm - {WM_DELAY_US} THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_late, "
        f"CAST(COALESCE(max(CASE WHEN t < pm - {WM_DELAY_US} "
        f"THEN pm - {WM_DELAY_US} - t END), 0) AS BIGINT) "
        "AS max_lateness_us "
        "FROM w GROUP BY 1 ORDER BY 1"
    )


def _q_herfindahl(sf_dir: str):
    """Herfindahl–Hirschman concentration index — the antitrust /
    market-structure scalar: HHI = Σ sᵢ² over nations' revenue shares
    of the lineitem⋈orders⋈customer trade, released as the exact
    integer ⌊10⁶·Σrᵢ²/(Σr)²⌋ (Python-int / HUGEINT — no float
    shares); ≤25 revenue cells leave the distributed fold.  1e6/25 =
    40000 is the perfectly-even floor; 1e6 is monopoly."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = {r["c_custkey"]: r["c_nationkey"]
            for r in rd.read_parquet(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_nationkey"]).take_all()}
    import ray
    cref = ray.put(cust)

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(t.column("l_extendedprice")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"k": t.column("l_orderkey"),
                         "c": pa.array(c, pa.int64())})

    per_order = grouped_pandas_agg(
        li.map_batches(_cents, batch_format="pyarrow"),
        keys=["k"], aggs={"c": ("c", "sum")})

    def _nat(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        return pa.table({
            "k": t.column("o_orderkey"),
            "n": pa.array([cm[x] for x in
                           t.column("o_custkey").to_pylist()],
                          pa.int64())})

    j = join(per_order,
             orders.map_batches(_nat, batch_format="pyarrow"),
             on="k", broadcast=False)
    rev: dict[int, int] = {}
    for r in grouped_pandas_agg(
            j, keys=["n"], aggs={"c": ("c", "sum")}).take_all():
        rev[int(r["n"])] = rev.get(int(r["n"]), 0) + int(r["c"])
    tot = sum(rev.values())
    hhi = (1_000_000 * sum(v * v for v in rev.values())) // (tot * tot) \
        if tot else 0
    return pa.table({
        "n_nations": pa.array([len(rev)], pa.int64()),
        "total_cents": pa.array([tot], pa.int64()),
        "hhi_q6": pa.array([hhi], pa.int64()),
    })


def _herfindahl_sql() -> str:
    return (
        "WITH rev AS (SELECT cu.c_nationkey AS n, "
        "CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) "
        "AS HUGEINT) AS r "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer cu ON cu.c_custkey = o.o_custkey GROUP BY 1), "
        "t AS (SELECT sum(r) AS tot, sum(r * r) AS sq, "
        "count(*) AS k FROM rev) "
        "SELECT CAST(k AS BIGINT) AS n_nations, "
        "CAST(tot AS BIGINT) AS total_cents, "
        "CAST((1000000 * sq) // (tot * tot) AS BIGINT) AS hhi_q6 FROM t"
    )


def _q_sign_test(sf_dir: str):
    """Exact sign test — the distribution-free paired-comparison test
    (the third nonparametric beside the suite's rank-sum and
    permutation tests): per calendar day, purchase cents vs view
    cents; days with a strict winner are Bernoulli(½) under the null,
    and the two-sided p-value is the EXACT binomial tail
    2·min(P(X≤m), P(X≥m))·... released as the quantized integer
    ⌊10⁶·Σ_{i≤m∨i≥n−m} C(n,i)/2ⁿ⌋ computed in unbounded Python ints —
    no normal approximation, no floats; the SQL twin builds the same
    binomials with a recursive HUGEINT CTE (C(n,i) =
    C(n,i−1)·(n−i+1)/i, always an exact division).  One bucketed
    (day, type) cents fold; day count is calendar-small."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def _day(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), object)
        keep = (et == "view") | (et == "purchase")
        tt = t.filter(pa.array(keep))
        et = et[keep]
        d = (np.asarray(tt.column("ts").cast(pa.int64()))
             // 86_400_000_000).astype(np.int64)
        c = np.floor(np.asarray(tt.column("value")) * 100.0
                     + 0.5).astype(np.int64)
        isv = (et == "view").astype(np.int64)
        return pa.table({"d": pa.array(d, pa.int64()),
                         "v": pa.array(c * isv, pa.int64()),
                         "p": pa.array(c * (1 - isv), pa.int64())})

    rows = grouped_pandas_agg(
        ev.map_batches(_day, batch_format="pyarrow"),
        keys=["d"], aggs={"v": ("v", "sum"), "p": ("p", "sum")}
    ).take_all()
    wins = sum(1 for r in rows if int(r["p"]) > int(r["v"]))
    losses = sum(1 for r in rows if int(r["p"]) < int(r["v"]))
    n = wins + losses  # strict winners only (ties drop — the sign test rule)
    m = min(wins, losses)
    # two-sided exact tail: Σ C(n,i) over i ≤ m and i ≥ n−m
    binom = [1]
    for i in range(1, n + 1):
        binom.append(binom[-1] * (n - i + 1) // i)
    tail = sum(b for i, b in enumerate(binom)
               if i <= m or i >= n - m)
    tail = min(tail, 1 << n)  # cap at 1 (m = n−m double-counts center)
    pq_ = (1_000_000 * tail) >> n if n else 1_000_000
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "n_purchase_wins": pa.array([wins], pa.int64()),
        "p_two_sided_q6": pa.array([int(pq_)], pa.int64()),
    })


def _sign_test_sql() -> str:
    return (
        "WITH dd AS (SELECT epoch_us(ts) // 86400000000 AS d, "
        "sum(CASE WHEN event_type = 'view' THEN "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS v, "
        "sum(CASE WHEN event_type = 'purchase' THEN "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS p "
        "FROM events WHERE event_type IN ('view', 'purchase') "
        "GROUP BY 1), "
        "wl AS (SELECT CAST(sum(CASE WHEN p > v THEN 1 ELSE 0 END) "
        "AS BIGINT) AS w, CAST(sum(CASE WHEN p < v THEN 1 ELSE 0 END) "
        "AS BIGINT) AS l FROM dd), "
        "nm AS (SELECT w + l AS n, least(w, l) AS m, w FROM wl), "
        "bn AS (WITH RECURSIVE bc(i, c) AS ("
        "SELECT 0, CAST(1 AS HUGEINT) "
        "UNION ALL SELECT i + 1, "
        "(c * ((SELECT n FROM nm) - i)) // (i + 1) "
        "FROM bc WHERE i < (SELECT n FROM nm)) "
        "SELECT i, c FROM bc), "
        "pw AS (SELECT sum(c) AS p2n FROM bn), "  # Σ C(n,i) = 2ⁿ exactly
        "tl AS (SELECT least(sum(c), (SELECT p2n FROM pw)) AS t "
        "FROM bn, nm WHERE bn.i <= nm.m OR bn.i >= nm.n - nm.m) "
        "SELECT CAST(nm.n AS BIGINT) AS n_days, "
        "CAST(nm.w AS BIGINT) AS n_purchase_wins, "
        "CAST(CASE WHEN nm.n = 0 THEN 1000000 ELSE "
        "(1000000 * tl.t) // (SELECT p2n FROM pw) END AS BIGINT) "
        "AS p_two_sided_q6 "
        "FROM nm, tl"
    )


def _q_learned_index(sf_dir: str):
    """Learned-index error bound — the ε every PGM/RMI-style learned
    index must know before it can replace a B-tree: fit rank ≈ a+b·key
    over the sorted order keys by EXACT integer OLS (the Cramer
    machinery) and report the exact maximum scaled residual
    max|den·rank − (a + b·key)| plus its floor in rank units — the
    search-window radius a lookup needs.  Ranks come from the
    distributed global_rank op (range partition + offset prefix, no
    driver sort); the Gram and residual passes are one streaming scan
    each with Python-int exactness (SQL twin in HUGEINT)."""
    import ray.data as rd

    from essentials_rd.ops import global_rank
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])
    ranked = global_rank(
        orders.map_batches(
            lambda t: pa.table({"k": t.column("o_orderkey")}),
            batch_format="pyarrow"),
        "k", [], lambda b: np_col(b, "k")).materialize()

    def _sums(t: pa.Table) -> pa.Table:
        k = np_col(t, "k")
        r = np_col(t, "rank")
        return pa.table({c: pa.array([v], pa.int64()) for c, v in {
            "n": len(k), "sk": int(k.sum()), "sr": int(r.sum()),
            "skk": int((k.astype(object) * k.astype(object)).sum()),
            "skr": int((k.astype(object) * r.astype(object)).sum()),
        }.items()})

    S = {"n": 0, "sk": 0, "sr": 0, "skk": 0, "skr": 0}
    for row in ranked.map_batches(_sums, batch_format="pyarrow") \
            .take_all():
        for c in S:
            S[c] += int(row[c])
    den = S["n"] * S["skk"] - S["sk"] * S["sk"]
    b = S["n"] * S["skr"] - S["sk"] * S["sr"]
    a = S["skk"] * S["sr"] - S["sk"] * S["skr"]

    def _maxres(t: pa.Table) -> pa.Table:
        k = np_col(t, "k")
        r = np_col(t, "rank")
        m = 0
        for i in range(len(k)):
            m = max(m, abs(den * int(r[i]) - (a + b * int(k[i]))))
        return pa.table({"m": pa.array([str(m)], pa.string())})

    mx = 0
    for row in ranked.map_batches(_maxres, batch_format="pyarrow") \
            .take_all():
        mx = max(mx, int(row["m"]))
    eps = mx // den if den > 0 else 0
    return pa.table({
        "n_keys": pa.array([S["n"]], pa.int64()),
        "eps_ranks": pa.array([int(eps)], pa.int64()),
        "max_res_scaled": pa.array([str(mx)], pa.string()),
    })


def _learned_index_sql() -> str:
    return (
        "WITH rk AS (SELECT o_orderkey AS k, "
        "CAST(row_number() OVER (ORDER BY o_orderkey) AS HUGEINT) AS r "
        "FROM orders), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "sum(CAST(k AS HUGEINT)) AS sk, sum(r) AS sr, "
        "sum(CAST(k AS HUGEINT) * k) AS skk, "
        "sum(CAST(k AS HUGEINT) * r) AS skr FROM rk), "
        "co AS (SELECT n * skk - sk * sk AS den, "
        "n * skr - sk * sr AS b, skk * sr - sk * skr AS a, n FROM s), "
        "res AS (SELECT max(abs(co.den * rk.r "
        "- (co.a + co.b * rk.k))) AS m FROM rk, co) "
        "SELECT CAST((SELECT n FROM co) AS BIGINT) AS n_keys, "
        "CAST((SELECT m FROM res) // (SELECT den FROM co) AS BIGINT) "
        "AS eps_ranks, "
        "CAST((SELECT m FROM res) AS VARCHAR) AS max_res_scaled"
    )


def _q_interval_union(sf_dir: str):
    """Sweep-line interval union — the coverage primitive under
    calendar/SLA/sensor-uptime analytics: each user's activity span
    [first hour, last hour] contributes ±1 boundary events, and the
    union length (hours covered by ≥1 user) plus the peak concurrency
    fall out of one prefix sum over the SORTED DISTINCT boundary
    values — the same distributed value-histogram shape as
    exact_quantiles (the driver sees one row per distinct boundary,
    never users), so the sweep needs no global sort of raw data.
    One user-bucketed min/max fold feeds it."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def _prep(t: pa.Table) -> pa.Table:
        h = (np.asarray(t.column("ts").cast(pa.int64()))
             // 3_600_000_000).astype(np.int64)
        return pa.table({"u": t.column("user_id").cast(pa.int64()),
                         "h": pa.array(h, pa.int64())})

    spans = grouped_pandas_agg(
        ev.map_batches(_prep, batch_format="pyarrow"),
        keys=["u"], aggs={"s": ("h", "min"), "e": ("h", "max")})

    def _bounds(t: pa.Table) -> pa.Table:
        import pandas as pd
        s = np.asarray(t.column("s"), np.int64)
        e = np.asarray(t.column("e"), np.int64) + 1  # half-open [s, e+1)
        b = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), np.int64),
                            -np.ones(len(e), np.int64)])
        agg = pd.Series(d).groupby(pd.Series(b)).sum()
        return pa.table({"b": pa.array(agg.index.to_numpy(np.int64)),
                         "d": pa.array(agg.to_numpy(np.int64))})

    acc: dict[int, int] = {}
    for r in spans.map_batches(_bounds, batch_format="pyarrow") \
            .take_all():
        acc[int(r["b"])] = acc.get(int(r["b"]), 0) + int(r["d"])
    bs = sorted(acc)
    cov = 0
    peak = 0
    cur = 0
    for i, b in enumerate(bs):
        if cur > 0 and i > 0:
            cov += b - bs[i - 1]
        cur += acc[b]
        peak = max(peak, cur)
    return pa.table({
        "union_hours": pa.array([cov], pa.int64()),
        "peak_concurrency": pa.array([peak], pa.int64()),
        "n_boundaries": pa.array([len(bs)], pa.int64()),
    })


def _interval_union_sql() -> str:
    return (
        "WITH sp AS (SELECT user_id, "
        "min(epoch_us(ts) // 3600000000) AS s, "
        "max(epoch_us(ts) // 3600000000) + 1 AS e FROM events "
        "GROUP BY 1), "
        "bd AS (SELECT b, sum(d) AS d FROM ("
        "SELECT s AS b, 1 AS d FROM sp "
        "UNION ALL SELECT e AS b, -1 AS d FROM sp) GROUP BY 1), "
        "sw AS (SELECT b, d, "
        "sum(d) OVER (ORDER BY b) AS cur, "
        "lead(b) OVER (ORDER BY b) AS nb FROM bd) "
        "SELECT CAST(COALESCE(sum(CASE WHEN cur > 0 THEN nb - b END), 0) "
        "AS BIGINT) AS union_hours, "
        "CAST(max(cur) AS BIGINT) AS peak_concurrency, "
        "CAST(count(*) AS BIGINT) AS n_boundaries FROM sw"
    )


def _boost_from_hist(hist: dict) -> dict:
    """Shared 2-round deterministic integer boosting over the (band →
    (n_pos, n_neg)) histogram: stump = (threshold t, direction d) with
    d=0 meaning 'predict 1 iff band ≥ t' and d=1 the complement;
    argmin (error, t, d); round-2 reweights misclassified cells by the
    integer factor K = max(1, (n−e1)//e1) (cells, not rows — weights
    are a pure function of (band, label), the property that lets both
    rounds run off ONE histogram, exactly LightGBM's
    histogram-split-finding trick); final = weighted ±1 vote with
    integer votes (n−e1, n−e2u), predict 1 on strict majority."""
    bands = sorted(hist)
    cands = bands + [bands[-1] + 1]
    n = sum(p + q for p, q in hist.values())

    def argmin_err(wp, wn):
        best = None
        for t in cands:
            above_p = sum(w for b, w in wp.items() if b >= t)
            above_n = sum(w for b, w in wn.items() if b >= t)
            tot_p = sum(wp.values())
            tot_n = sum(wn.values())
            for d in (0, 1):
                err = ((tot_p - above_p) + above_n if d == 0
                       else above_p + (tot_n - above_n))
                key = (err, t, d)
                if best is None or key < best:
                    best = key
        return best

    wp1 = {b: p for b, (p, q) in hist.items()}
    wn1 = {b: q for b, (p, q) in hist.items()}
    e1, t1, d1 = argmin_err(wp1, wn1)

    def s(b, t, d):
        return (1 if b >= t else 0) if d == 0 else (1 if b < t else 0)

    K = max(1, (n - e1) // e1) if e1 > 0 else 1
    wp2 = {b: p * (K if s(b, t1, d1) == 0 else 1)
           for b, (p, q) in hist.items()}
    wn2 = {b: q * (K if s(b, t1, d1) == 1 else 1)
           for b, (p, q) in hist.items()}
    e2w, t2, d2 = argmin_err(wp2, wn2)
    e2u = sum(p for b, (p, q) in hist.items() if s(b, t2, d2) == 0) \
        + sum(q for b, (p, q) in hist.items() if s(b, t2, d2) == 1)
    v1, v2 = n - e1, n - e2u
    correct = 0
    for b, (p, q) in hist.items():
        vote = v1 * (2 * s(b, t1, d1) - 1) + v2 * (2 * s(b, t2, d2) - 1)
        pred = 1 if vote > 0 else 0
        correct += p if pred == 1 else q
    return {"t1": t1, "d1": d1, "e1": e1, "k": K, "t2": t2, "d2": d2,
            "e2w": e2w, "e2u": e2u, "n": n, "final_correct": correct}


def _q_boost_stumps(sf_dir: str):
    """Two-round deterministic integer boosting (AdaBoost's shape with
    an integer reweight factor so everything stays hash-exact): both
    stump selections run off ONE distributed (price-band → pos/neg)
    histogram — the LightGBM histogram split-finding pattern, where
    the exchange moves band cells, never rows — and every argmin,
    reweight and the final weighted ±1 vote is driver integer math
    replayed verbatim by the SQL twin.  Labels: URGENT orders;
    feature: $10k price band."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice", "o_orderpriority"])

    def _bands(t: pa.Table) -> pa.Table:
        p = np.asarray(t.column("o_totalprice")).astype(np.float64)
        band = (np.floor(p * 100.0 + 0.5).astype(np.int64)
                // 1_000_000)
        y = (np.asarray(t.column("o_orderpriority").to_pylist(),
                        object) == "1-URGENT").astype(np.int64)
        return pa.table({"b": pa.array(band, pa.int64()),
                         "pos": pa.array(y, pa.int64()),
                         "neg": pa.array(1 - y, pa.int64())})

    hist: dict[int, list] = {}
    for r in grouped_pandas_agg(
            orders.map_batches(_bands, batch_format="pyarrow"),
            keys=["b"], aggs={"p": ("pos", "sum"),
                              "q": ("neg", "sum")}).take_all():
        a = hist.setdefault(int(r["b"]), [0, 0])
        a[0] += int(r["p"])
        a[1] += int(r["q"])
    res = _boost_from_hist({b: tuple(v) for b, v in hist.items()})
    return pa.table({k: pa.array([res[k]], pa.int64())
                     for k in ("n", "t1", "d1", "e1", "k", "t2", "d2",
                               "e2w", "e2u", "final_correct")})


def _boost_stumps_sql() -> str:
    # stump predicate: d=0 → b >= t; d=1 → b < t
    return """
WITH hist AS MATERIALIZED (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 1000000 AS b,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
              END) AS BIGINT) AS p,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1
              END) AS BIGINT) AS q
  FROM orders GROUP BY 1),
tot AS (SELECT sum(p) AS tp, sum(q) AS tn, sum(p + q) AS n FROM hist),
cand AS (SELECT b AS t FROM hist UNION SELECT max(b) + 1 FROM hist),
r1c AS (
  SELECT c.t, d.d,
         CASE WHEN d.d = 0
              THEN (tot.tp - COALESCE(a.ap, 0)) + COALESCE(a.an, 0)
              ELSE COALESCE(a.ap, 0) + (tot.tn - COALESCE(a.an, 0)) END
         AS err
  FROM cand c CROSS JOIN (SELECT 0 AS d UNION ALL SELECT 1) d
  CROSS JOIN tot
  LEFT JOIN (SELECT c2.t, sum(h.p) AS ap, sum(h.q) AS an
             FROM cand c2 JOIN hist h ON h.b >= c2.t GROUP BY 1) a
    ON a.t = c.t),
r1 AS (SELECT t AS t1, d AS d1, err AS e1 FROM r1c
       ORDER BY err, t, d LIMIT 1),
kk AS (SELECT CASE WHEN e1 > 0 THEN greatest(1, (n - e1) // e1)
              ELSE 1 END AS k FROM r1, tot),
w2 AS MATERIALIZED (
  SELECT h.b,
         h.p * (CASE WHEN (CASE WHEN r1.d1 = 0 THEN h.b >= r1.t1
                           ELSE h.b < r1.t1 END) THEN 1 ELSE kk.k END)
         AS wp,
         h.q * (CASE WHEN (CASE WHEN r1.d1 = 0 THEN h.b >= r1.t1
                           ELSE h.b < r1.t1 END) THEN kk.k ELSE 1 END)
         AS wn,
         h.p, h.q
  FROM hist h, r1, kk),
tot2 AS (SELECT sum(wp) AS tp, sum(wn) AS tn FROM w2),
r2c AS (
  SELECT c.t, d.d,
         CASE WHEN d.d = 0
              THEN (tot2.tp - COALESCE(a.ap, 0)) + COALESCE(a.an, 0)
              ELSE COALESCE(a.ap, 0) + (tot2.tn - COALESCE(a.an, 0)) END
         AS err
  FROM cand c CROSS JOIN (SELECT 0 AS d UNION ALL SELECT 1) d
  CROSS JOIN tot2
  LEFT JOIN (SELECT c2.t, sum(w.wp) AS ap, sum(w.wn) AS an
             FROM cand c2 JOIN w2 w ON w.b >= c2.t GROUP BY 1) a
    ON a.t = c.t),
r2 AS (SELECT t AS t2, d AS d2, err AS e2w FROM r2c
       ORDER BY err, t, d LIMIT 1),
e2u AS (SELECT sum(CASE WHEN (CASE WHEN r2.d2 = 0 THEN h.b >= r2.t2
                              ELSE h.b < r2.t2 END)
                        THEN h.q ELSE h.p END) AS e2u
        FROM hist h, r2),
fin AS (
  SELECT sum(CASE WHEN
    (tot.n - r1.e1) * (CASE WHEN (CASE WHEN r1.d1 = 0
                                  THEN h.b >= r1.t1 ELSE h.b < r1.t1
                                  END) THEN 1 ELSE -1 END)
    + (tot.n - e2u.e2u) * (CASE WHEN (CASE WHEN r2.d2 = 0
                                      THEN h.b >= r2.t2
                                      ELSE h.b < r2.t2 END)
                           THEN 1 ELSE -1 END) > 0
    THEN h.p ELSE h.q END) AS final_correct
  FROM hist h, r1, r2, e2u, tot)
SELECT CAST(tot.n AS BIGINT) AS n, CAST(r1.t1 AS BIGINT) AS t1,
       CAST(r1.d1 AS BIGINT) AS d1, CAST(r1.e1 AS BIGINT) AS e1,
       CAST(kk.k AS BIGINT) AS k, CAST(r2.t2 AS BIGINT) AS t2,
       CAST(r2.d2 AS BIGINT) AS d2, CAST(r2.e2w AS BIGINT) AS e2w,
       CAST(e2u.e2u AS BIGINT) AS e2u,
       CAST(fin.final_correct AS BIGINT) AS final_correct
FROM tot, r1, kk, r2, e2u, fin"""


XCORR_MAXLAG = 24


def _q_xcorr(sf_dir: str):
    """Lead-lag cross-correlation — the econometrics/ops-analytics
    primitive behind "purchases follow views by L hours": exact
    integer dot products between the hourly view series and the
    purchase series shifted by lag 0..24 on the shared dense grid
    (absent hours are explicit zeros — skipping them would bias every
    lag differently), plus the argmax lag (ties to the smaller lag).
    One bucketed (hour, type) count combine — the driver folds
    calendar-small series; SQL twin joins the two grids at each
    offset."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def _hour(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), object)
        keep = (et == "view") | (et == "purchase")
        tt = t.filter(pa.array(keep))
        h = (np.asarray(tt.column("ts").cast(pa.int64()))
             // 3_600_000_000).astype(np.int64)
        isv = (np.asarray(tt.column("event_type").to_pylist(), object)
               == "view").astype(np.int64)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "v": pa.array(isv, pa.int64()),
                         "p": pa.array(1 - isv, pa.int64())})

    rows = grouped_pandas_agg(
        ev.map_batches(_hour, batch_format="pyarrow"),
        keys=["h"], aggs={"v": ("v", "sum"), "p": ("p", "sum")}
    ).take_all()
    hmin = min(r["h"] for r in rows)
    hmax = max(r["h"] for r in rows)
    n = int(hmax - hmin + 1)
    v = np.zeros(n, np.int64)
    p = np.zeros(n, np.int64)
    for r in rows:
        v[r["h"] - hmin] = int(r["v"])
        p[r["h"] - hmin] = int(r["p"])
    lags = list(range(XCORR_MAXLAG + 1))
    dots = [int((v[: n - L] * p[L:]).sum()) if L < n else 0
            for L in lags]
    best = max(range(len(lags)), key=lambda i: (dots[i], -i))
    return pa.table({
        "lag": pa.array(lags, pa.int64()),
        "dot": pa.array(dots, pa.int64()),
        "best_lag": pa.array([lags[best]] * len(lags), pa.int64()),
    })


def _xcorr_sql() -> str:
    return (
        "WITH hv AS (SELECT epoch_us(ts) // 3600000000 AS h, "
        "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v, "
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p "
        "FROM events WHERE event_type IN ('view', 'purchase') "
        "GROUP BY 1), "
        "bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hv), "
        "grid AS (SELECT h0 + g.g AS h FROM bounds, "
        "LATERAL (SELECT unnest(range(h1 - h0 + 1)) AS g) g), "
        "dense AS (SELECT g.h, COALESCE(hv.v, 0) AS v, "
        "COALESCE(hv.p, 0) AS p FROM grid g "
        "LEFT JOIN hv ON hv.h = g.h), "
        f"lags AS (SELECT unnest(range({XCORR_MAXLAG + 1})) AS lag), "
        "dots AS (SELECT l.lag, CAST(COALESCE(sum(a.v * b.p), 0) "
        "AS BIGINT) AS dot FROM lags l "
        "LEFT JOIN dense a ON true "
        "LEFT JOIN dense b ON b.h = a.h + l.lag GROUP BY 1), "
        "bst AS (SELECT lag AS bl FROM dots "
        "ORDER BY dot DESC, lag LIMIT 1) "
        "SELECT d.lag, d.dot, CAST((SELECT bl FROM bst) AS BIGINT) "
        "AS best_lag FROM dots d ORDER BY d.lag"
    )


SP_SEED, SP_GRID, SP_R = 67, 4096, 64


def _q_spatial_join(sf_dir: str):
    """Grid-bucketed spatial radius self-join — THE scalable spatial
    join (PostGIS/GeoSpark shape): parts get deterministic planar
    coordinates from one splitmix draw (x = z mod 4096, y = z>>12 mod
    4096 — SQL-replayable), and all pairs within L∞ distance 64 are
    found by grid hashing: each point lands HOME in its r-cell and
    PROBES its 3×3 neighborhood, every bucket joins home×probe with
    the exact distance filter, and each qualifying pair counts
    EXACTLY once at the smaller-id point's home cell (a within-r pair
    can never be more than one cell apart, so the anchor always sees
    the probe).  One cell-bucketed exchange, 10 rows per point —
    never the quadratic candidate set; the SQL twin is the quadratic
    self-join the grid must reproduce."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import hash64, np_col

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"])
    mix = np.uint64((SP_SEED * 0x9E3779B97F4A7C15) % (1 << 64))
    R = np.int64(SP_R)

    def _points(t: pa.Table) -> pa.Table:
        pk = np.asarray(t.column("p_partkey")).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = hash64(pk + mix)
        x = (z % np.uint64(SP_GRID)).astype(np.int64)
        y = ((z >> np.uint64(12)) % np.uint64(SP_GRID)).astype(np.int64)
        k = pk.astype(np.int64)
        cx, cy = x // R, y // R
        # home row + 9 probe rows (dedup: probe includes home cell too;
        # role distinguishes them)
        rows_k, rows_x, rows_y, rows_c, rows_role = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cell = (cx + dx) * np.int64(1 << 20) + (cy + dy)
                rows_k.append(k)
                rows_x.append(x)
                rows_y.append(y)
                rows_c.append(cell)
                rows_role.append(np.zeros(len(k), np.int8))
        home_cell = cx * np.int64(1 << 20) + cy
        rows_k.append(k)
        rows_x.append(x)
        rows_y.append(y)
        rows_c.append(home_cell)
        rows_role.append(np.ones(len(k), np.int8))
        return pa.table({
            "k": pa.array(np.concatenate(rows_k), pa.int64()),
            "x": pa.array(np.concatenate(rows_x), pa.int64()),
            "y": pa.array(np.concatenate(rows_y), pa.int64()),
            "cell": pa.array(np.concatenate(rows_c), pa.int64()),
            "role": pa.array(np.concatenate(rows_role), pa.int8()),
        })

    def _pairs(grp: pa.Table) -> pa.Table:
        cell = np_col(grp, "cell")
        role = np.asarray(grp.column("role"), np.int8)
        k = np_col(grp, "k")
        x = np_col(grp, "x")
        y = np_col(grp, "y")
        n_pairs = 0
        dist_sum = 0
        order = np.argsort(cell, kind="stable")
        cell, role, k, x, y = (cell[order], role[order], k[order],
                               x[order], y[order])
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        for st, en in zip(starts, np.r_[starts[1:], len(cell)]):
            m = slice(st, en)
            hm = role[m] == 1
            pr = ~hm
            if not hm.any() or not pr.any():
                continue
            hk, hx, hy = k[m][hm], x[m][hm], y[m][hm]
            pk_, px, py = k[m][pr], x[m][pr], y[m][pr]
            dx = np.abs(hx[:, None] - px[None, :])
            dy = np.abs(hy[:, None] - py[None, :])
            ok = (dx <= SP_R) & (dy <= SP_R) & (hk[:, None] < pk_[None, :])
            n_pairs += int(ok.sum())
            dist_sum += int(np.maximum(dx, dy)[ok].sum())
        return pa.table({"n": pa.array([n_pairs], pa.int64()),
                         "s": pa.array([dist_sum], pa.int64())})

    tot_n = tot_s = 0
    for r in hash_bucket_agg(
            parts.map_batches(_points, batch_format="pyarrow"),
            lambda b: np_col(b, "cell"), _pairs).take_all():
        tot_n += r["n"]
        tot_s += r["s"]
    return pa.table({
        "n_pairs": pa.array([tot_n], pa.int64()),
        "linf_sum": pa.array([tot_s], pa.int64()),
    })


def _spatial_join_sql() -> str:
    mix = (SP_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes("spz", "p_partkey", f"p_partkey + {mix}", "part")
    return (
        f"WITH {chain}, "
        "pts AS MATERIALIZED (SELECT p_partkey AS k, "
        f"CAST(z % {SP_GRID} AS BIGINT) AS x, "
        f"CAST((z >> 12) % {SP_GRID} AS BIGINT) AS y FROM spz3) "
        "SELECT CAST(count(*) AS BIGINT) AS n_pairs, "
        "CAST(COALESCE(sum(greatest(abs(a.x - b.x), abs(a.y - b.y))), 0) "
        "AS BIGINT) AS linf_sum "
        "FROM pts a JOIN pts b ON a.k < b.k "
        f"AND abs(a.x - b.x) <= {SP_R} AND abs(a.y - b.y) <= {SP_R}"
    )


SP_TRI = ((200, 200), (3800, 600), (1800, 3600))  # CCW triangle


def _q_points_in_triangle(sf_dir: str):
    """Point-in-polygon by the exact integer orientation predicate —
    computational geometry's foundational test (the orient2d cross
    product that robust geometry libraries guard with arbitrary
    precision; integer coordinates make it EXACT here, no epsilon):
    the same splitmix part coordinates as the spatial join, counted
    inside/on a fixed CCW triangle iff all three edge cross products
    are ≥ 0.  Stateless vectorized fold, zero shuffles; SQL twin
    evaluates the identical predicates."""
    import ray.data as rd

    from essentials_rd.util import hash64

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"])
    mix = np.uint64((SP_SEED * 0x9E3779B97F4A7C15) % (1 << 64))
    (ax, ay), (bx, by), (cx, cy) = SP_TRI

    def _cnt(t: pa.Table) -> pa.Table:
        pk = np.asarray(t.column("p_partkey")).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = hash64(pk + mix)
        x = (z % np.uint64(SP_GRID)).astype(np.int64)
        y = ((z >> np.uint64(12)) % np.uint64(SP_GRID)).astype(np.int64)
        d1 = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
        d2 = (cx - bx) * (y - by) - (cy - by) * (x - bx)
        d3 = (ax - cx) * (y - cy) - (ay - cy) * (x - cx)
        inside = (d1 >= 0) & (d2 >= 0) & (d3 >= 0)
        border = inside & ((d1 == 0) | (d2 == 0) | (d3 == 0))
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "i": pa.array([int(inside.sum())], pa.int64()),
            "b": pa.array([int(border.sum())], pa.int64())})

    tot = [0, 0, 0]
    for r in parts.map_batches(_cnt, batch_format="pyarrow").take_all():
        tot[0] += r["n"]
        tot[1] += r["i"]
        tot[2] += r["b"]
    return pa.table({
        "n_points": pa.array([tot[0]], pa.int64()),
        "n_inside": pa.array([tot[1]], pa.int64()),
        "n_on_edge": pa.array([tot[2]], pa.int64()),
    })


def _points_in_triangle_sql() -> str:
    mix = (SP_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes("ptz", "p_partkey", f"p_partkey + {mix}", "part")
    (ax, ay), (bx, by), (cx, cy) = SP_TRI
    d1 = f"(({bx}-{ax})*(y-{ay}) - ({by}-{ay})*(x-{ax}))"
    d2 = f"(({cx}-{bx})*(y-{by}) - ({cy}-{by})*(x-{bx}))"
    d3 = f"(({ax}-{cx})*(y-{cy}) - ({ay}-{cy})*(x-{cx}))"
    return (
        f"WITH {chain}, "
        f"pts AS (SELECT CAST(z % {SP_GRID} AS BIGINT) AS x, "
        f"CAST((z >> 12) % {SP_GRID} AS BIGINT) AS y FROM ptz3) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_points, "
        f"CAST(sum(CASE WHEN {d1} >= 0 AND {d2} >= 0 AND {d3} >= 0 "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_inside, "
        f"CAST(sum(CASE WHEN {d1} >= 0 AND {d2} >= 0 AND {d3} >= 0 "
        f"AND ({d1} = 0 OR {d2} = 0 OR {d3} = 0) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_on_edge "
        "FROM pts"
    )


LIS_CAP = 8


def _q_lis_user(sf_dir: str):
    """Longest strictly-increasing subsequence of the most active
    user's value stream — the classic trend-detection DP (and the
    patience-sorting showcase): the engine runs the O(n log n)
    patience algorithm (binary search over pile tops) over the first
    8 value-cents under the (ts, event_id) order, while the SQL twin
    — which cannot express the online pile structure — evaluates the
    O(n²) recurrence f(i) = 1 + max f(j) over j<i, v_j < v_i as
    generated per-cell CTE columns; the hash match certifies the two
    classic formulations agree on real data."""
    import bisect

    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"])
    cnt = grouped_pandas_agg(
        ev.map_batches(
            lambda t: pa.table({"u": t.column("user_id"),
                                "one": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        keys=["u"], aggs={"n": ("one", "sum")}).take_all()
    utop = int(sorted(cnt, key=lambda r: (-r["n"], r["u"]))[0]["u"])

    def _vals(t: pa.Table) -> pa.Table:
        m = np.asarray(t.column("user_id")) == utop
        tt = t.filter(pa.array(m))
        c = np.floor(np.asarray(tt.column("value")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({
            "ts": tt.column("ts").cast(pa.int64()),
            "eid": tt.column("event_id").cast(pa.int64()),
            "c": pa.array(c, pa.int64())})

    rows = sorted(ev.map_batches(_vals, batch_format="pyarrow")
                  .take_all(), key=lambda r: (r["ts"], r["eid"]))
    vals = [int(r["c"]) for r in rows[:LIS_CAP]]

    piles: list[int] = []
    for v in vals:
        # strictly increasing: replace the first pile top >= v
        i = bisect.bisect_left(piles, v)
        if i == len(piles):
            piles.append(v)
        else:
            piles[i] = v
    return pa.table({
        "user_id": pa.array([utop], pa.int64()),
        "n_vals": pa.array([len(vals)], pa.int64()),
        "lis_len": pa.array([len(piles)], pa.int64()),
    })


def _lis_user_sql() -> str:
    n = LIS_CAP
    cells = []
    for i in range(1, n + 1):
        terms = ["1"]
        for j in range(1, i):
            terms.append(
                f"CASE WHEN v{j} < v{i} THEN f{j} + 1 ELSE 1 END")
        expr = terms[0] if len(terms) == 1 else \
            "GREATEST(" + ", ".join(terms) + ")"
        cells.append(f"CASE WHEN {i} <= nv THEN {expr} ELSE 0 END AS f{i}")
    vcols = ", ".join(
        f"COALESCE(max(CASE WHEN rn = {i} THEN c END), 0) AS v{i}"
        for i in range(1, n + 1))
    fmax = "GREATEST(" + ", ".join(f"f{i}" for i in range(1, n + 1)) + ")"
    return (
        "WITH cnts AS (SELECT user_id, count(*) AS n FROM events "
        "GROUP BY 1), "
        "tu AS (SELECT user_id FROM cnts "
        "ORDER BY n DESC, user_id LIMIT 1), "
        "sv AS (SELECT e.user_id, "
        "CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS c, "
        "row_number() OVER (ORDER BY e.ts, e.event_id) AS rn "
        "FROM events e JOIN tu ON tu.user_id = e.user_id), "
        f"pv AS (SELECT max(user_id) AS user_id, {vcols}, "
        f"CAST(least(count(*), {n}) AS BIGINT) AS nv "
        f"FROM sv WHERE rn <= {n}), "
        f"dp AS (SELECT user_id, nv, {', '.join(cells)} FROM pv) "
        "SELECT user_id, nv AS n_vals, "
        f"CAST({fmax} AS BIGINT) AS lis_len FROM dp"
    )


def _q_weighted_median(sf_dir: str):
    """Exact weighted median — the L1-optimal location (facility
    placement, robust aggregation) that plain quantile_disc cannot
    express: the smallest quantity level whose cumulative revenue
    weight reaches half the total, i.e. the revenue-weighted median
    order quantity.  One bucketed (value → Σweight) fold (the
    distributed value histogram with WEIGHTS — driver sees one row
    per distinct quantity, never the data), integer cumulative
    compare 2·cum ≥ total so no float division enters."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])

    def _prep(t: pa.Table) -> pa.Table:
        q = np.asarray(t.column("l_quantity")).astype(np.int64)
        c = np.floor(np.asarray(t.column("l_extendedprice")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"q": pa.array(q, pa.int64()),
                         "w": pa.array(c, pa.int64())})

    rows = sorted(grouped_pandas_agg(
        li.map_batches(_prep, batch_format="pyarrow"),
        keys=["q"], aggs={"w": ("w", "sum")}).take_all(),
        key=lambda r: r["q"])
    total = sum(int(r["w"]) for r in rows)
    cum = 0
    med = rows[-1]["q"]
    for r in rows:
        cum += int(r["w"])
        if 2 * cum >= total:
            med = int(r["q"])
            break
    return pa.table({
        "w_median_qty": pa.array([med], pa.int64()),
        "total_weight": pa.array([total], pa.int64()),
        "n_levels": pa.array([len(rows)], pa.int64()),
    })


def _weighted_median_sql() -> str:
    return (
        "WITH lv AS (SELECT CAST(l_quantity AS BIGINT) AS q, "
        "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS w FROM lineitem GROUP BY 1), "
        "cw AS (SELECT q, w, sum(w) OVER (ORDER BY q) AS cum, "
        "(SELECT sum(w) FROM lv) AS tot FROM lv) "
        "SELECT CAST(min(q) AS BIGINT) AS w_median_qty, "
        "CAST(max(tot) AS BIGINT) AS total_weight, "
        "CAST((SELECT count(*) FROM lv) AS BIGINT) AS n_levels "
        "FROM cw WHERE 2 * cum >= tot"
    )


VIT_T = [[0, -3], [-2, 0]]  # transition scores (A→A, A→I / I→A, I→I)
VIT_E = [{"v": 1, "c": 2, "p": 4, "s": 0, "e": -1},   # emit: Active
         {"v": 0, "c": -1, "p": -3, "s": 1, "e": 2}]  # emit: Idle


def _q_viterbi(sf_dir: str):
    """Viterbi decoding — the max-product sequence-labeling DP every
    HMM/CRF tagger runs, made hash-exact with INTEGER scores (the
    lang_pred trick applied to dynamic programming): the most active
    user's first 8 events (by the (ts,event_id) total order) decode
    into Active/Idle states under fixed integer transition + emission
    scores, forward-carrying (score, path) per state with ties broken
    toward the lexicographically-earlier state at every max, so the
    decoded path is unique and layout-free.  The SQL twin unrolls the
    same 8 steps as MATERIALIZED row CTEs (the LCS trick: stop the
    optimizer inlining the recurrence)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.windows import event_sequences

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    cnt = grouped_pandas_agg(
        ev.map_batches(
            lambda t: pa.table({"u": t.column("user_id"),
                                "one": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        keys=["u"], aggs={"n": ("one", "sum")}).take_all()
    utop = int(sorted(cnt, key=lambda r: (-r["n"], r["u"]))[0]["u"])
    seq = next(r["seq"] for r in event_sequences(ev, max_len=8)
               .take_all() if r["user_id"] == utop)
    obs = [SEQ_TYPE_MAP.get(x, "x") for x in seq.split("|") if x][:8]

    names = "AI"
    score = [VIT_E[s].get(obs[0], -5) for s in range(2)]
    path = [names[s] for s in range(2)]
    for o in obs[1:]:
        ns, np_ = [0, 0], ["", ""]
        for s in range(2):
            # tie → earlier predecessor state (index 0 first)
            cand = [(score[p] + VIT_T[p][s], p) for p in range(2)]
            best = max(cand, key=lambda c: (c[0], -c[1]))
            ns[s] = best[0] + VIT_E[s].get(o, -5)
            np_[s] = path[best[1]] + names[s]
        score, path = ns, np_
    w = max(range(2), key=lambda s: (score[s], -s))
    return pa.table({
        "user_id": pa.array([utop], pa.int64()),
        "n_obs": pa.array([len(obs)], pa.int64()),
        "score": pa.array([score[w]], pa.int64()),
        "path": pa.array([path[w]], pa.string()),
    })


def _viterbi_sql() -> str:
    enc = " ".join(f"WHEN '{t}' THEN '{c}'"
                   for t, c in sorted(SEQ_TYPE_MAP.items()))

    def emit(s, ochar):
        items = " ".join(f"WHEN '{c}' THEN {v}"
                         for c, v in sorted(VIT_E[s].items()))
        return f"(CASE {ochar} {items} ELSE -5 END)"

    steps = []
    for i in range(2, 9):
        o = f"substr(obs, {i}, 1)"
        cells = []
        for s, nm in ((0, "A"), (1, "I")):
            e = emit(s, o)
            c0 = f"sc_a + {VIT_T[0][s]}"
            c1 = f"sc_i + {VIT_T[1][s]}"
            cells.append(
                f"CASE WHEN {i} > n_obs THEN sc_{nm.lower()} ELSE "
                f"CASE WHEN {c0} >= {c1} THEN {c0} ELSE {c1} END + {e} "
                f"END AS n_sc_{nm.lower()}")
            cells.append(
                f"CASE WHEN {i} > n_obs THEN pt_{nm.lower()} ELSE "
                f"(CASE WHEN {c0} >= {c1} THEN pt_a ELSE pt_i END) "
                f"|| '{nm}' END AS n_pt_{nm.lower()}")
        steps.append(
            f"v{i} AS MATERIALIZED (SELECT user_id, n_obs, obs, "
            f"{', '.join(cells)} FROM w{i - 1}), "
            f"w{i} AS MATERIALIZED (SELECT user_id, n_obs, obs, "
            "n_sc_a AS sc_a, n_sc_i AS sc_i, "
            f"n_pt_a AS pt_a, n_pt_i AS pt_i FROM v{i})")
        last = f"w{i}"
    body = ", ".join(steps)
    e0a = emit(0, "substr(obs, 1, 1)")
    e0i = emit(1, "substr(obs, 1, 1)")
    return (
        "WITH cnts AS (SELECT user_id, count(*) AS n FROM events "
        "GROUP BY 1), "
        "tu AS (SELECT user_id FROM cnts "
        "ORDER BY n DESC, user_id LIMIT 1), "
        "sq AS (SELECT e.user_id, substr(string_agg("
        f"CASE e.event_type {enc} ELSE 'x' END, '' "
        "ORDER BY e.ts, e.event_id), 1, 8) AS obs "
        "FROM events e JOIN tu ON tu.user_id = e.user_id GROUP BY 1), "
        "v1 AS (SELECT user_id, length(obs) AS n_obs, obs, "
        f"{e0a} AS sc_a, {e0i} AS sc_i, "
        "'A' AS pt_a, 'I' AS pt_i FROM sq), "
        "w1 AS (SELECT * FROM v1), "
        f"{body} "
        "SELECT user_id, CAST(n_obs AS BIGINT) AS n_obs, "
        "CAST(CASE WHEN sc_a >= sc_i THEN sc_a ELSE sc_i END AS BIGINT) "
        "AS score, "
        "CASE WHEN sc_a >= sc_i THEN pt_a ELSE pt_i END AS path "
        f"FROM {last}"
    )


PERIOD_DOCS, PERIOD_LEN = 10, 32


def _q_doc_periods(sf_dir: str):
    """Smallest-period detection via the KMP failure function — the
    string-periodicity primitive under repetition filters and
    tandem-repeat finders: for each of the 10 smallest docs, the
    smallest p ≥ 1 with s[0..n−p) = s[p..n) over the first 32 chars,
    which equals n − fail[n] of the classic KMP prefix function (the
    engine computes KMP; the SQL twin — which cannot express the
    linear-time automaton — checks ALL p by direct prefix/suffix
    comparison and takes the min, so the hash match certifies the
    failure-function identity on real data).  p = n means aperiodic;
    p ≤ n/2 flags true tandem repetition."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    ids = sorted(r["doc_id"] for r in docs.groupby("doc_id").count()
                 .take_all())[:PERIOD_DOCS]
    keep = set(ids)

    def _per(t: pa.Table) -> pa.Table:
        out_id, out_n, out_p = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            if d not in keep:
                continue
            s = s[:PERIOD_LEN]
            n = len(s)
            fail = [0] * (n + 1)
            k = 0
            for i in range(1, n):
                while k and s[i] != s[k]:
                    k = fail[k]
                if s[i] == s[k]:
                    k += 1
                fail[i + 1] = k
            out_id.append(d)
            out_n.append(n)
            out_p.append(n - fail[n])
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "n_chars": pa.array(out_n, pa.int64()),
                         "period": pa.array(out_p, pa.int64())})

    rows = sorted(docs.map_batches(_per, batch_format="pyarrow")
                  .take_all(), key=lambda r: r["doc_id"])
    return pa.table({
        k: pa.array([r[k] for r in rows], pa.int64())
        for k in ("doc_id", "n_chars", "period")
    })


def _doc_periods_sql() -> str:
    return (
        "WITH sel AS (SELECT doc_id, "
        f"substr(text, 1, {PERIOD_LEN}) AS s FROM documents "
        "WHERE doc_id IN (SELECT doc_id FROM documents "
        f"ORDER BY doc_id LIMIT {PERIOD_DOCS})), "
        "cand AS (SELECT doc_id, length(s) AS n, p.p AS p FROM sel, "
        "LATERAL (SELECT unnest(range(1, length(s) + 1)) AS p) p "
        "WHERE substr(s, 1, length(s) - p.p) = substr(s, p.p + 1)) "
        "SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars, "
        "CAST(min(p) AS BIGINT) AS period "
        "FROM cand GROUP BY doc_id ORDER BY doc_id"
    )


RICE_TOKENS, RICE_KMAX = 5, 16


def _q_rice_postings(sf_dir: str):
    """Rice/Golomb parameter selection for delta-encoded posting lists
    — the bits-per-gap planning step every inverted-index compressor
    (Lucene-style) runs: for the 5 highest-df tokens, the doc-id gaps
    g (first gap = id+1) cost q+1+k bits each under Rice(k) with
    q = (g−1)>>k, and the released parameter is the argmin-k total
    (ties to smaller k).  Exact integers throughout — the cost table
    is a 16-lane per-token fold over the gap stream, and gaps come
    from one token-bucketed sorted-diff pass over the DISTINCT
    (token, doc) presence pairs (vocabulary never driver-collected
    until the 5-row release)."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _presence(batch: pa.Table) -> pa.Table:
        import pandas as pd
        s = batch.column("text").to_pandas()
        ids = np_col(batch, "doc_id")
        toks = s.str.split(" ")
        counts = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().to_numpy(object)
        doc = np.repeat(ids, counts)
        codes, uq = pd.factorize(pd.Series(flat))
        key = doc.astype(np.int64) * np.int64(len(uq)) + codes
        ku = np.unique(key)
        return pa.table({
            "tok": pa.array(
                np.asarray(uq, object)[(ku % len(uq))].tolist(),
                pa.string()),
            "d": pa.array((ku // len(uq)).astype(np.int64), pa.int64()),
        })

    pres = docs.map_batches(_presence, batch_format="pyarrow") \
        .materialize()

    def _df(grp: pa.Table) -> pa.Table:
        import pandas as pd
        df = grp.to_pandas().drop_duplicates()  # (tok, d) unique already
        agg = df.groupby("tok").size()
        return pa.table({"tok": pa.array(agg.index.tolist(), pa.string()),
                         "df": pa.array(agg.to_numpy(np.int64))})

    dfs: dict[str, int] = {}
    for r in hash_bucket_agg(
            pres, lambda b: np.asarray(_str_hash(b.column("tok"))),
            _df).take_all():
        dfs[r["tok"]] = dfs.get(r["tok"], 0) + int(r["df"])
    top = sorted(dfs.items(), key=lambda kv: (-kv[1], kv[0]))[:RICE_TOKENS]
    keep = {t for t, _ in top}

    def _gap_costs(grp: pa.Table) -> pa.Table:
        import pandas as pd
        df = grp.to_pandas()
        df = df[df["tok"].isin(keep)]
        out_t, out_k, out_b, out_n = [], [], [], []
        for tok, g in df.groupby("tok"):
            d = np.sort(g["d"].to_numpy(np.int64))
            gaps = np.diff(np.r_[np.int64(-1), d])
            for k in range(RICE_KMAX):
                q = (gaps - 1) >> k
                out_t.append(tok)
                out_k.append(k)
                out_b.append(int(q.sum()) + len(gaps) * (k + 1))
                out_n.append(len(gaps))
        return pa.table({"tok": pa.array(out_t, pa.string()),
                         "k": pa.array(out_k, pa.int64()),
                         "bits": pa.array(out_b, pa.int64()),
                         "n": pa.array(out_n, pa.int64())})

    acc: dict[tuple, list] = {}
    for r in hash_bucket_agg(
            pres, lambda b: np.asarray(_str_hash(b.column("tok"))),
            _gap_costs).take_all():
        a = acc.setdefault((r["tok"], r["k"]), [0, 0])
        a[0] += int(r["bits"])
        a[1] += int(r["n"])
    rows = []
    for tok, df_ in top:
        cand = [(acc[(tok, k)][0], k) for k in range(RICE_KMAX)]
        bits, k = min(cand)
        rows.append((tok, df_, k, bits))
    return pa.table({
        "tok": pa.array([r[0] for r in rows], pa.string()),
        "df": pa.array([r[1] for r in rows], pa.int64()),
        "best_k": pa.array([r[2] for r in rows], pa.int64()),
        "total_bits": pa.array([r[3] for r in rows], pa.int64()),
    })


def _rice_postings_sql() -> str:
    return (
        "WITH pres AS (SELECT DISTINCT doc_id, w AS tok FROM ("
        "SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents)), "
        "dfs AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM pres "
        "GROUP BY 1), "
        "top AS (SELECT tok, df FROM (SELECT *, row_number() OVER ("
        f"ORDER BY df DESC, tok) AS rn FROM dfs) WHERE rn <= {RICE_TOKENS}), "
        "gaps AS (SELECT p.tok, p.doc_id - COALESCE(lag(p.doc_id) OVER ("
        "PARTITION BY p.tok ORDER BY p.doc_id), -1) AS g "
        "FROM pres p JOIN top t ON t.tok = p.tok), "
        f"ks AS (SELECT unnest(range({RICE_KMAX})) AS k), "
        "cost AS (SELECT g.tok, ks.k, "
        "CAST(sum((g.g - 1) >> ks.k) + count(*) * (ks.k + 1) AS BIGINT) "
        "AS bits FROM gaps g CROSS JOIN ks GROUP BY 1, 2), "
        "best AS (SELECT tok, k AS best_k, bits FROM (SELECT *, "
        "row_number() OVER (PARTITION BY tok ORDER BY bits, k) AS rn "
        "FROM cost) WHERE rn = 1) "
        "SELECT t.tok, t.df, b.best_k, b.bits AS total_bits "
        "FROM top t JOIN best b ON b.tok = t.tok "
        "ORDER BY t.df DESC, t.tok"
    )


BWT_DOCS, BWT_LEN = 10, 48


def _q_doc_bwt(sf_dir: str):
    """Burrows–Wheeler transform — the reversible permutation at the
    heart of bzip2-family compressors (clusters equal characters so
    MTF+RLE bite): for the 10 smallest doc_ids, the BWT of the first
    48 characters + a chr(1) sentinel (unique smallest, so rotation
    order is total and the transform invertible — inversion pinned in
    pytest).  A stateless per-doc map_batches kernel (each doc's
    rotation sort is local, the shape of a per-record compression
    stage); the SQL twin sorts the SAME rotations via LATERAL
    substr-concat + ORDER BY string_agg, relying on UTF-8 byte order
    = codepoint order so Python and DuckDB agree on any text."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    ids = sorted(r["doc_id"] for r in docs.groupby("doc_id").count()
                 .take_all())[:BWT_DOCS]
    keep = set(ids)

    def _bwt(t: pa.Table) -> pa.Table:
        out_id, out_b = [], []
        did = t.column("doc_id").to_pylist()
        txt = t.column("text").to_pylist()
        for d, s in zip(did, txt):
            if d not in keep:
                continue
            s = s[:BWT_LEN] + "\x01"
            rots = sorted(s[i:] + s[:i] for i in range(len(s)))
            out_id.append(d)
            out_b.append("".join(r[-1] for r in rots))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "bwt": pa.array(out_b, pa.string())})

    rows = sorted(docs.map_batches(_bwt, batch_format="pyarrow")
                  .take_all(), key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "bwt": pa.array([r["bwt"] for r in rows], pa.string()),
    })


def _doc_bwt_sql() -> str:
    return (
        "WITH sel AS (SELECT doc_id, "
        f"substr(text, 1, {BWT_LEN}) || chr(1) AS s FROM documents "
        "WHERE doc_id IN (SELECT doc_id FROM documents "
        f"ORDER BY doc_id LIMIT {BWT_DOCS})), "
        "rot AS (SELECT doc_id, "
        "substr(s, i.i + 1) || substr(s, 1, i.i) AS r FROM sel, "
        "LATERAL (SELECT unnest(range(length(s))) AS i) i) "
        "SELECT doc_id, string_agg(substr(r, length(r), 1), '' "
        "ORDER BY r) AS bwt FROM rot GROUP BY doc_id ORDER BY doc_id"
    )


def _q_shapley_linear(sf_dir: str):
    """Shapley attribution for the exact linear model — the
    explainability release every scored decision needs: for a linear
    model Shapley values are exactly φ_j = β_j·(x_j − E[x_j])
    (independence-free closed form), so the EXACT OLS machinery
    (integer Gram + Cramer) yields exact attributions: β_j =
    float(det_j)/float(det) and the centering term
    float(n·x_j − Σx_j)/float(n) are each one division of exact
    ints — the SQL twin reproduces both doubles bit-for-bit.
    Explains the minimum-orderkey order under the ols_order_price
    model (features: lineitem count, quantity sum); the efficiency
    identity Σφ + E[ŷ] = ŷ(x) is pinned in pytest."""
    import ray.data as rd

    from essentials_rd.mlfit import int_det, ols_fit_exact
    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def _proj(b: pa.Table) -> pa.Table:
        ok = np_col(b, "l_orderkey").astype(np.int64)
        qty = np.asarray(b.column("l_quantity").to_numpy(
            zero_copy_only=False), np.float64)
        return pa.table({
            "ok": pa.array(ok, pa.int64()),
            "one": pa.array(np.ones(len(ok), np.int64)),
            "qty": pa.array(np.floor(qty + 0.5).astype(np.int64)),
        })

    feat = grouped_pandas_agg(
        li.map_batches(_proj, batch_format="pyarrow"),
        keys=["ok"], aggs={"k": ("one", "sum"), "q": ("qty", "sum")},
    ).materialize()

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def _y(b: pa.Table) -> pa.Table:
        tp = np.asarray(b.column("o_totalprice").to_numpy(
            zero_copy_only=False), np.float64)
        return pa.table({
            "ok": b.column("o_orderkey"),
            "y": pa.array(np.floor(tp * 100.0 + 0.5).astype(np.int64)),
        })

    joined = join(feat, orders.map_batches(_y, batch_format="pyarrow"),
                  on="ok", broadcast=False)

    def _xy(b: pa.Table):
        k = np_col(b, "k").astype(np.int64)
        q = np_col(b, "q").astype(np.int64)
        X = np.stack([np.ones(len(k), np.int64), k, q], axis=1)
        return X, np_col(b, "y").astype(np.int64)

    _coefs, info = ols_fit_exact(joined, _xy, p=3)
    gram, xty, det = info["gram"], info["xty"], info["det"]
    n, s01, s02 = gram[0][0], gram[0][1], gram[0][2]

    # the explained point: the min-orderkey order's features
    ok_min = min(r["ok"] for r in feat.take_all())
    pt = next(r for r in feat.take_all() if r["ok"] == ok_min)
    x = [None, int(pt["k"]), int(pt["q"])]
    sx = [None, s01, s02]

    dets = []
    for i in range(3):
        a_i = [row[:i] + [xty[r]] + row[i + 1:]
               for r, row in enumerate(gram)]
        dets.append(int_det(a_i))

    from essentials_rd.pipelines import round_half_up
    phis = []
    for j in (1, 2):
        beta = float(dets[j]) / float(det)
        cent = float(n * x[j] - sx[j]) / float(n)
        phis.append(beta * cent)
    base = float(xty[0]) / float(n)
    vals = round_half_up(np.array(phis + [base], np.float64), 6)
    return pa.table({
        "term": pa.array(["phi_linecount", "phi_qtysum", "base_rate"],
                         pa.string()),
        "value": pa.array(vals, pa.float64()),
    })


def _shapley_sql() -> str:
    m = [["s00", "s01", "s02"], ["s01", "s11", "s12"],
         ["s02", "s12", "s22"]]
    c = ["c0", "c1", "c2"]

    def det3(a):
        return (f"{a[0][0]}*({a[1][1]}*{a[2][2]} - {a[1][2]}*{a[2][1]})"
                f" - {a[0][1]}*({a[1][0]}*{a[2][2]} - {a[1][2]}*{a[2][0]})"
                f" + {a[0][2]}*({a[1][0]}*{a[2][1]} - {a[1][1]}*{a[2][0]})")

    def repl(i):
        return [[c[r] if j == i else m[r][j] for j in range(3)]
                for r in range(3)]

    dets = ", ".join(
        [f"({det3(m)}) AS det"]
        + [f"({det3(repl(i))}) AS det{i}" for i in range(3)])

    def phi(j, xcol, sxcol):
        return (f"(CAST(det{j} AS DOUBLE) / CAST(det AS DOUBLE)) * "
                f"(CAST(s00 * pt.{xcol} - {sxcol} AS DOUBLE) / "
                "CAST(s00 AS DOUBLE))")

    return f"""
WITH feat AS (
  SELECT l_orderkey AS ok, CAST(count(*) AS HUGEINT) AS k,
         CAST(sum(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS HUGEINT) AS q
  FROM lineitem GROUP BY 1),
j AS (
  SELECT f.k, f.q,
         CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT) AS y
  FROM feat f JOIN orders o ON o.o_orderkey = f.ok),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS s00, sum(k) AS s01, sum(q) AS s02,
         sum(k*k) AS s11, sum(k*q) AS s12, sum(q*q) AS s22,
         sum(y) AS c0, sum(k*y) AS c1, sum(q*y) AS c2
  FROM j),
d AS (SELECT {dets} FROM s),
pt AS (SELECT k, q FROM feat WHERE ok = (SELECT min(l_orderkey) FROM lineitem))
SELECT term, ROUND(value, 6) AS value FROM (
  SELECT 'phi_linecount' AS term, {phi(1, 'k', 's01')} AS value FROM d, s, pt
  UNION ALL
  SELECT 'phi_qtysum', {phi(2, 'q', 's02')} FROM d, s, pt
  UNION ALL
  SELECT 'base_rate', CAST(c0 AS DOUBLE) / CAST(s00 AS DOUBLE) FROM s
) ORDER BY term"""


SOUNDEX_K = 20


def _q_soundex_blocks(sf_dir: str):
    """Phonetic blocking census (textops.soundex_blocks) — entity
    resolution's first stage, on the American Soundex key of each
    part name's first word: per block the row count and distinct-word
    count, top-20.  The engine key and the SQL twin's chained-regexp
    pipeline implement the SAME rule order (h/w transparent before
    collapsing, one regexp per digit class because RE2 has no
    backreferences), pinned to the classic vectors in pytest."""
    import ray.data as rd

    from essentials_rd.textops import soundex_blocks

    parts = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
    return soundex_blocks(parts, "p_name", k=SOUNDEX_K)


def _soundex_sql() -> str:
    inner = ("translate(substr(w, 1, 1) || "
             "regexp_replace(substr(w, 2), '[hw]', '', 'g'), "
             "'abcdefghijklmnopqrstuvwxyz', "
             "'01230120022455012623010202')")
    for d in "123456":
        inner = (f"regexp_replace({inner}, '{d}{{2,}}', '{d}', 'g')")
    code = ("substr(rpad(substr(upper(w), 1, 1) || "
            f"replace(substr({inner}, 2), '0', ''), 4, '0'), 1, 4)")
    return (
        "WITH fw AS (SELECT regexp_replace(split_part(p_name, ' ', 1), "
        "'[^a-z]', '', 'g') AS w FROM part), "
        f"cd AS (SELECT {code} AS code, w FROM fw), "
        "blk AS (SELECT code, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(DISTINCT w) AS BIGINT) AS n_words "
        "FROM cd GROUP BY 1) "
        "SELECT code, n_rows, n_words FROM ("
        "SELECT *, row_number() OVER (ORDER BY n_rows DESC, code) AS rn "
        f"FROM blk) WHERE rn <= {SOUNDEX_K} ORDER BY n_rows DESC, code"
    )


KNAP_N = 12


def _q_knapsack(sf_dir: str):
    """0/1 knapsack with an exhaustive certificate — the budgeted
    selection primitive (campaign/shelf/batch budgeting): the 12
    smallest part keys as items (weight = p_size, value = retail
    cents), capacity = half the total weight, solved by the classic
    DP over capacity; the engine ALSO enumerates all 2¹² subsets and
    asserts the DP met the true optimum, and the SQL twin — which
    cannot express the DP table — prices every subset via a
    bit-test join over range(4096) and takes the max, so the hash
    match proves optimality.  Emits the capacity, optimum, and the
    feasible-subset count as audit."""
    import ray.data as rd

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"])
    rows = sorted(parts.take_all(), key=lambda r: r["p_partkey"])[:KNAP_N]
    w = [int(r["p_size"]) for r in rows]
    v = [int(np.floor(r["p_retailprice"] * 100.0 + 0.5)) for r in rows]
    cap = sum(w) // 2

    dp = [0] * (cap + 1)
    for i in range(KNAP_N):
        for c in range(cap, w[i] - 1, -1):
            dp[c] = max(dp[c], dp[c - w[i]] + v[i])
    best_dp = dp[cap]

    best_enum = 0
    n_feas = 0
    for m in range(1 << KNAP_N):
        tw = tv = 0
        for i in range(KNAP_N):
            if m >> i & 1:
                tw += w[i]
                tv += v[i]
        if tw <= cap:
            n_feas += 1
            best_enum = max(best_enum, tv)
    assert best_dp == best_enum, (best_dp, best_enum)
    return pa.table({
        "n_items": pa.array([KNAP_N], pa.int64()),
        "capacity": pa.array([cap], pa.int64()),
        "best_value": pa.array([best_dp], pa.int64()),
        "n_feasible": pa.array([n_feas], pa.int64()),
    })


def _knapsack_sql() -> str:
    return (
        "WITH it AS (SELECT p_size AS w, "
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS v, "
        "row_number() OVER (ORDER BY p_partkey) - 1 AS i "
        f"FROM (SELECT * FROM part ORDER BY p_partkey LIMIT {KNAP_N})), "
        "cp AS (SELECT sum(w) // 2 AS cap FROM it), "
        f"ms AS (SELECT unnest(range({1 << KNAP_N})) AS m), "
        "sub AS (SELECT ms.m, "
        "COALESCE(sum(CASE WHEN (ms.m >> it.i) & 1 = 1 THEN it.w END), 0) "
        "AS tw, "
        "COALESCE(sum(CASE WHEN (ms.m >> it.i) & 1 = 1 THEN it.v END), 0) "
        "AS tv FROM ms CROSS JOIN it GROUP BY ms.m), "
        "fe AS (SELECT * FROM sub, cp WHERE tw <= cap) "
        f"SELECT CAST({KNAP_N} AS BIGINT) AS n_items, "
        "CAST((SELECT cap FROM cp) AS BIGINT) AS capacity, "
        "CAST(max(tv) AS BIGINT) AS best_value, "
        "CAST(count(*) AS BIGINT) AS n_feasible FROM fe"
    )


LCS_CAP = 8


def _q_lcs_users(sf_dir: str):
    """Longest-common-subsequence similarity of the two most active
    users' behavior strings — the classic sequence-alignment DP
    (edit-distance family) behavioral analytics uses to compare
    journeys: event types encode to chars under the (ts, event_id)
    total order (first 8 events per user), LCS by the textbook
    O(n·m) recurrence.  The SQL twin evaluates the SAME 64-cell DP as
    one generated row-major lateral-alias chain (cells reference
    earlier aliases — SQL can express the table, just not the loop);
    beyond-length cells are guarded so ''='' can never phantom-match.
    The distributed piece is the per-user sequence assembly (the
    existing user-bucketed event_sequences machinery)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.windows import event_sequences

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    cnt = grouped_pandas_agg(
        ev.map_batches(
            lambda t: pa.table({"u": t.column("user_id"),
                                "one": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        keys=["u"], aggs={"n": ("one", "sum")}).take_all()
    top2 = sorted(cnt, key=lambda r: (-r["n"], r["u"]))[:2]
    ua, ub = int(top2[0]["u"]), int(top2[1]["u"])

    seqs = {r["user_id"]: r["seq"]
            for r in event_sequences(ev, max_len=LCS_CAP).take_all()
            if r["user_id"] in (ua, ub)}
    enc = {t: c for t, c in SEQ_TYPE_MAP.items()}
    sa = "".join(enc.get(x, "x") for x in seqs[ua].split("|") if x)
    sb = "".join(enc.get(x, "x") for x in seqs[ub].split("|") if x)

    la, lb = len(sa), len(sb)
    L = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            L[i][j] = (L[i - 1][j - 1] + 1 if sa[i - 1] == sb[j - 1]
                       else max(L[i - 1][j], L[i][j - 1]))
    return pa.table({
        "user_a": pa.array([ua], pa.int64()),
        "user_b": pa.array([ub], pa.int64()),
        "len_a": pa.array([la], pa.int64()),
        "len_b": pa.array([lb], pa.int64()),
        "lcs_len": pa.array([L[la][lb]], pa.int64()),
    })


def _lcs_users_sql() -> str:
    enc = " ".join(f"WHEN '{t}' THEN '{c}'"
                   for t, c in sorted(SEQ_TYPE_MAP.items()))
    # one MATERIALIZED CTE per DP row: within a row the left-neighbor
    # lateral chain is only LCS_CAP deep; across rows the
    # materialization stops DuckDB from inlining the whole 64-cell
    # expression tree (which is exponential without it)
    n = LCS_CAP
    row_ctes = []
    for i in range(1, n + 1):
        cells = []
        for j in range(1, n + 1):
            up = f"l_{i - 1}_{j}" if i > 1 else "0"
            left = f"l_{i}_{j - 1}" if j > 1 else "0"
            diag = f"l_{i - 1}_{j - 1}" if (i > 1 and j > 1) else "0"
            cells.append(
                f"CASE WHEN {i} <= la AND {j} <= lb AND "
                f"substr(sa, {i}, 1) = substr(sb, {j}, 1) "
                f"THEN {diag} + 1 ELSE GREATEST({up}, {left}) END "
                f"AS l_{i}_{j}")
        src = "base" if i == 1 else f"w{i - 1}"
        row_ctes.append(
            f"w{i} AS MATERIALIZED (SELECT *, {', '.join(cells)} "
            f"FROM {src})")
    rows_sql = ", ".join(row_ctes)
    return (
        "WITH cnts AS (SELECT user_id, count(*) AS n FROM events "
        "GROUP BY 1), "
        "t2 AS (SELECT user_id, row_number() OVER ("
        "ORDER BY n DESC, user_id) AS r FROM cnts), "
        "sq AS (SELECT e.user_id, string_agg("
        f"CASE e.event_type {enc} ELSE 'x' END, '' "
        "ORDER BY e.ts, e.event_id) AS s "
        "FROM events e JOIN t2 ON t2.user_id = e.user_id AND t2.r <= 2 "
        "GROUP BY 1), "
        "pair AS (SELECT "
        "(SELECT user_id FROM t2 WHERE r = 1) AS user_a, "
        "(SELECT user_id FROM t2 WHERE r = 2) AS user_b, "
        f"substr((SELECT s FROM sq JOIN t2 USING (user_id) WHERE r = 1)"
        f", 1, {LCS_CAP}) AS sa, "
        f"substr((SELECT s FROM sq JOIN t2 USING (user_id) WHERE r = 2)"
        f", 1, {LCS_CAP}) AS sb), "
        "base AS (SELECT user_a, user_b, sa, sb, "
        "length(sa) AS la, length(sb) AS lb FROM pair), "
        f"{rows_sql} "
        f"SELECT user_a, user_b, CAST(la AS BIGINT) AS len_a, "
        f"CAST(lb AS BIGINT) AS len_b, "
        f"CAST(l_{n}_{n} AS BIGINT) AS lcs_len FROM w{n}"
    )


ORC_PARTS = 16


def _q_orc_roundtrip(sf_dir: str):
    """ORC interchange round trip (sinks.write_columnar_partitioned /
    read_columnar_partitioned): orders hash-partitioned into 16 ORC
    files (atomic commit + _SUCCESS markers, same layout contract as
    the Parquet sink), read back one Ray task per partition through
    pyarrow's real ORC parser, and aggregated per priority — equality
    with the SQL twin over the ORIGINAL parquet certifies the
    container round trip byte-semantics (values, not files).  The
    multi-engine-lake format beside Parquet; Feather/Arrow-IPC rides
    the same generalized sink (pytest-pinned)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.pipelines import _work_dir
    from essentials_rd.sinks import (read_columnar_partitioned,
                                     write_columnar_partitioned)
    from essentials_rd.util import np_col

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    out_dir = _work_dir(f"orc_rt_{sf_dir.replace('/', '_')}")
    write_columnar_partitioned(
        orders, out_dir, lambda b: np_col(b, "o_orderkey"), ORC_PARTS,
        fmt="orc")
    back = read_columnar_partitioned(out_dir, ORC_PARTS, fmt="orc")

    def _prep(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(t.column("o_totalprice")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"prio": t.column("o_orderpriority"),
                         "c": pa.array(c, pa.int64()),
                         "one": pa.array(np.ones(len(c), np.int64))})

    from essentials_rd.derive import _str_hash
    rows = sorted(grouped_pandas_agg(
        back.map_batches(_prep, batch_format="pyarrow"),
        keys=["prio"], aggs={"n": ("one", "sum"), "s": ("c", "sum")},
        key_fn=lambda b: np.asarray(_str_hash(b.column("prio")))
    ).take_all(), key=lambda r: r["prio"])
    return pa.table({
        "priority": pa.array([r["prio"] for r in rows], pa.string()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "sum_cents": pa.array([int(r["s"]) for r in rows], pa.int64()),
    })


def _orc_roundtrip_sql() -> str:
    return (
        "SELECT o_orderpriority AS priority, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS sum_cents "
        "FROM orders GROUP BY 1 ORDER BY 1"
    )


def _q_isotonic(sf_dir: str):
    """Isotonic (monotone) regression with an exhaustive certificate —
    the shape-constrained fit probability calibration and monotone
    dose-response use: mean cents per quantity level fit by PAVA
    (pool-adjacent-violators, exact rational pooling with
    cross-multiplied mean compares — no floats), released as
    floor(10⁶·mean) per level.  Because floor is monotone, the
    quantized release obeys the minimax identity fit(i) = max_{j≤i}
    min_{k≥i} ⌊10⁶·mean(j..k)⌋ EXACTLY, so the SQL twin — which
    cannot express the sequential pooling — evaluates that formula
    over all O(L²) intervals and a hash match proves PAVA found the
    true L2 projection (the engine asserts it too).  The distributed
    piece is the per-level (n, Σcents) fold (≤ 50 level rows move)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])

    def _prep(t: pa.Table) -> pa.Table:
        q = np.asarray(t.column("l_quantity")).astype(np.int64)
        c = np.floor(np.asarray(t.column("l_extendedprice")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"q": pa.array(q, pa.int64()),
                         "c": pa.array(c, pa.int64()),
                         "one": pa.array(np.ones(len(q), np.int64))})

    rows = sorted(grouped_pandas_agg(
        li.map_batches(_prep, batch_format="pyarrow"),
        keys=["q"], aggs={"n": ("one", "sum"), "s": ("c", "sum")}
    ).take_all(), key=lambda r: r["q"])
    qs = [int(r["q"]) for r in rows]
    ns = [int(r["n"]) for r in rows]
    ss = [int(r["s"]) for r in rows]
    L = len(qs)

    # PAVA: stack of (sum, n, count_of_levels); merge on violation
    stack: list[list[int]] = []
    for i in range(L):
        cur = [ss[i], ns[i], 1]
        # violation: prev mean >= cur mean  ⇔  s1·n2 >= s2·n1
        while stack and stack[-1][0] * cur[1] >= cur[0] * stack[-1][1]:
            p = stack.pop()
            cur = [p[0] + cur[0], p[1] + cur[1], p[2] + cur[2]]
        stack.append(cur)
    fit = []
    for s, n, cnt in stack:
        fit.extend([(1_000_000 * s) // n] * cnt)

    # exhaustive minimax certificate on the quantized interval means
    cs = [0]
    cn = [0]
    for i in range(L):
        cs.append(cs[-1] + ss[i])
        cn.append(cn[-1] + ns[i])
    for i in range(L):
        best = None
        for j in range(i + 1):
            mn = None
            for k in range(i, L):
                m = (1_000_000 * (cs[k + 1] - cs[j])) // (cn[k + 1] - cn[j])
                mn = m if mn is None else min(mn, m)
            best = mn if best is None else max(best, mn)
        assert fit[i] == best, (i, fit[i], best)

    return pa.table({
        "qty": pa.array(qs, pa.int64()),
        "n": pa.array(ns, pa.int64()),
        "mean_q": pa.array([(1_000_000 * s) // n
                            for s, n in zip(ss, ns)], pa.int64()),
        "fit_q": pa.array(fit, pa.int64()),
    })


def _isotonic_sql() -> str:
    return (
        "WITH lev AS (SELECT CAST(l_quantity AS BIGINT) AS q, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS s FROM lineitem GROUP BY 1), "
        "cum AS (SELECT q, n, s, "
        "sum(s) OVER (ORDER BY q) AS cs, sum(n) OVER (ORDER BY q) AS cn, "
        "row_number() OVER (ORDER BY q) AS r FROM lev), "
        "iv AS (SELECT a.r AS j, b.r AS k, "
        "(1000000 * (b.cs - COALESCE(a2.cs, 0))) "
        "// (b.cn - COALESCE(a2.cn, 0)) AS mq "
        "FROM cum a JOIN cum b ON b.r >= a.r "
        "LEFT JOIN cum a2 ON a2.r = a.r - 1), "
        "minr AS (SELECT j, k AS i, min(mq) OVER ("
        "PARTITION BY j ORDER BY k DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn "
        "FROM iv), "
        "fit AS (SELECT i, max(mn) AS f FROM minr m "
        "WHERE m.j <= m.i GROUP BY i) "
        "SELECT c.q AS qty, c.n, "
        "CAST((1000000 * c.s) // c.n AS BIGINT) AS mean_q, "
        "CAST(f.f AS BIGINT) AS fit_q "
        "FROM cum c JOIN fit f ON f.i = c.r ORDER BY qty"
    )


CONF_SEED = 59
CONF_Q = 0.9


def _q_conformal(sf_dir: str):
    """Split-conformal prediction interval — the
    distribution-free uncertainty wrapper modern ML serving adds to a
    point model, run EXACTLY: lineitem rows split
    calibration/test by a value-pure splitmix rule (~50/50), an OLS
    line cents ~ quantity fits on the CALIBRATION half as exact
    rationals (den·ŷ = a + b·qty with integer a, b, den — the
    logistic/ALS Cramer machinery), nonconformity = |den·cents −
    (a + b·qty)| stays integer (scaled by den, a monotone change that
    cannot reorder quantiles), the calibration q90 comes from the
    distributed value histogram, and coverage on the TEST half counts
    |residual| ≤ q̂.  Exact end to end: Python-int solve, integer
    quantile, integer compares."""
    import ray.data as rd

    from essentials_rd.ops import exact_quantiles
    from essentials_rd.util import hash64, np_col

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice"])
    mix = np.uint64((CONF_SEED * 0x9E3779B97F4A7C15) % (1 << 64))
    half = np.uint64(1 << 63)

    def _prep(t: pa.Table) -> pa.Table:
        ok = np.asarray(t.column("l_orderkey")).astype(np.uint64)
        ln = np.asarray(t.column("l_linenumber")).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = hash64(ok * np.uint64(8) + ln + mix)
        cal = z < half
        q = np.asarray(t.column("l_quantity")).astype(np.int64)
        c = np.floor(np.asarray(t.column("l_extendedprice")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"cal": pa.array(cal),
                         "q": pa.array(q, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    prep = li.map_batches(_prep, batch_format="pyarrow").materialize()

    # exact OLS on the calibration half: 5 integer sums, Cramer solve
    def _sums(t: pa.Table) -> pa.Table:
        m = np.asarray(t.column("cal"))
        q = np_col(t, "q")[m]
        c = np_col(t, "c")[m]
        return pa.table({k: pa.array([v], pa.int64()) for k, v in {
            "n": len(q), "sx": int(q.sum()), "sy": int(c.sum()),
            "sxx": int((q * q).sum()), "sxy": int((q * c).sum()),
        }.items()})

    S = {"n": 0, "sx": 0, "sy": 0, "sxx": 0, "sxy": 0}
    for r in prep.map_batches(_sums, batch_format="pyarrow").take_all():
        for k in S:
            S[k] += int(r[k])
    den = S["n"] * S["sxx"] - S["sx"] * S["sx"]
    b = S["n"] * S["sxy"] - S["sx"] * S["sy"]
    a = S["sxx"] * S["sy"] - S["sx"] * S["sxy"]
    # ŷ(q) = (a + b·q)/den exact rational; the score uses the FLOORED
    # milli-cent prediction (same floor both sides — any measurable
    # score is a valid conformal score, and this one stays int64)

    def _resid(t: pa.Table) -> pa.Table:
        q = np_col(t, "q")
        c = np_col(t, "c")
        r = np.empty(len(q), np.int64)
        for i in range(len(q)):  # Python ints: a·b·q exceeds int64
            pred = (1000 * (a + b * int(q[i]))) // den
            r[i] = abs(1000 * int(c[i]) - pred)
        return pa.table({"cal": t.column("cal"),
                         "r": pa.array(r, pa.int64())})

    resid = prep.map_batches(_resid, batch_format="pyarrow").materialize()
    qhat = int(exact_quantiles(
        resid.filter(expr="cal == True"), "r", [CONF_Q])[0])

    def _cover(t: pa.Table) -> pa.Table:
        m = ~np.asarray(t.column("cal"))
        r = np_col(t, "r")[m]
        return pa.table({
            "n": pa.array([int(m.sum())], pa.int64()),
            "cov": pa.array([int((r <= qhat).sum())], pa.int64())})

    n_test = covered = 0
    for r in resid.map_batches(_cover, batch_format="pyarrow").take_all():
        n_test += r["n"]
        covered += r["cov"]
    return pa.table({
        "n_cal": pa.array([S["n"]], pa.int64()),
        "n_test": pa.array([n_test], pa.int64()),
        "qhat": pa.array([qhat], pa.int64()),
        "n_covered": pa.array([covered], pa.int64()),
    })


def _conformal_sql() -> str:
    mix = (CONF_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "cf", "q, c", f"l_orderkey * 8 + l_linenumber + {mix}",
        "(SELECT l_orderkey, l_linenumber, "
        "CAST(l_quantity AS BIGINT) AS q, "
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c "
        "FROM lineitem)")
    half = 1 << 63
    return (
        f"WITH {chain}, "
        f"sp AS MATERIALIZED (SELECT q, c, "
        f"z < CAST('{half}' AS UBIGINT) AS cal FROM cf3), "
        "s AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(q) AS HUGEINT) AS sx, CAST(sum(c) AS HUGEINT) AS sy, "
        "CAST(sum(q * q) AS HUGEINT) AS sxx, "
        "CAST(sum(q * c) AS HUGEINT) AS sxy FROM sp WHERE cal), "
        "co AS (SELECT n * sxx - sx * sx AS den, "
        "n * sxy - sx * sy AS b, sxx * sy - sx * sxy AS a, n FROM s), "
        "rs AS MATERIALIZED (SELECT sp.cal, abs(1000 * sp.c - "
        "((1000 * (co.a + co.b * sp.q)) "
        "- (((1000 * (co.a + co.b * sp.q)) % co.den + co.den) % co.den)) "
        "// co.den) AS r FROM sp, co), "
        f"qh AS (SELECT quantile_disc(r, {CONF_Q}) AS qhat FROM rs "
        "WHERE cal) "
        "SELECT CAST((SELECT n FROM co) AS BIGINT) AS n_cal, "
        "CAST(count(*) AS BIGINT) AS n_test, "
        "CAST((SELECT qhat FROM qh) AS BIGINT) AS qhat, "
        "CAST(sum(CASE WHEN r <= (SELECT qhat FROM qh) THEN 1 ELSE 0 "
        "END) AS BIGINT) AS n_covered "
        "FROM rs WHERE NOT cal"
    )


FIEDLER_ITERS = 8


def _q_fiedler(sf_dir: str):
    """Fiedler spectral-bisection direction (algorithms.fiedler):
    deflated power iteration on the shifted Laplacian M = 2·d_max·I − L
    — each superstep one neighbor-sum scatter plus the Σx broadcast
    partial that removes the constant eigencomponent (the same side
    channel PageRank's dangling mass rides), fixed 1/c contraction so
    the whole run is a pure function of the graph; splitmix start
    vector, exactly FIEDLER_ITERS rounds, half-up 6 dp both sides."""
    from essentials_rd.algorithms.fiedler import fiedler
    from essentials_rd.pipelines import round_half_up

    g, _ = _graph(sf_dir)
    res = fiedler(g, max_iters=FIEDLER_ITERS, checkpoint_every=0,
                  scatter_mode="fused")
    t = res.state_table(["value"])
    vals = round_half_up(np.asarray(t["value"], dtype=np.float64), 6)
    return pa.table({"vid": t["vid"],
                     "fiedler": pa.array(vals, pa.float64())})


def _fiedler_sql() -> str:
    chain = _sm64_ctes("fx", "vid", "vid", "verts")
    steps = [
        "fc AS (SELECT 2.0 * greatest(max(outdeg), 1) AS c FROM deg)",
        "f0 AS MATERIALIZED (SELECT vid, "
        "CAST(CAST(z % 1001 AS BIGINT) - 500 AS DOUBLE) AS val FROM fx3)",
    ]
    c = "(SELECT c FROM fc)"
    n = "(SELECT n FROM nn)"
    for k in range(FIEDLER_ITERS):
        steps.append(f"""
fsx{k} AS MATERIALIZED (SELECT sum(val) AS sx FROM f{k}),
fagg{k} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(p.val) AS s
  FROM sym e JOIN f{k} p ON p.vid = e.src GROUP BY e.dst
),
f{k + 1} AS MATERIALIZED (
  SELECT v.vid,
         ((COALESCE(a.s, 0.0) + ({c} - d.outdeg) * p.val)
          - {c} * (SELECT sx FROM fsx{k}) / {n}) / {c} AS val
  FROM verts v JOIN f{k} p ON p.vid = v.vid
  JOIN deg d ON d.vid = v.vid
  LEFT JOIN fagg{k} a ON a.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {chain}, {body} "
        f"SELECT vid, ROUND(val, 6) AS fiedler FROM f{FIEDLER_ITERS} "
        "ORDER BY vid"
    )


HOPD_SIZE, HOPD_HOP = 6, 1  # hours


def _q_hopping_distinct(sf_dir: str):
    """Exact distinct users per HOPPING window (6 h advancing hourly)
    — the sliding-reach metric (DAU-style but overlapping) that no
    subtractable aggregate expresses, because distinct doesn't
    subtract: each event fans out to its 6 covering windows inside
    map_batches (bounded stateless replication), then
    ops.grouped_distinct_count dedups (window, user) pairs — only
    DISTINCT pairs move through the one bucketed exchange, so the
    shuffle is bounded by reach·windows, not event count."""
    import ray.data as rd

    from essentials_rd.ops import grouped_distinct_count
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def _expand(t: pa.Table) -> pa.Table:
        h = (np.asarray(t.column("ts").cast(pa.int64()))
             // 3_600_000_000).astype(np.int64)
        u = np.asarray(t.column("user_id").cast(pa.int64()))
        wins = (h[:, None]
                - np.arange(HOPD_SIZE, dtype=np.int64)[None, :]).ravel()
        users = np.repeat(u, HOPD_SIZE)
        return pa.table({"w": pa.array(wins, pa.int64()),
                         "u": pa.array(users, pa.int64())})

    out = grouped_distinct_count(
        ev.map_batches(_expand, batch_format="pyarrow"), "w", "u")
    rows = sorted(out.take_all(), key=lambda r: r["w"])
    return pa.table({
        "win_start_hour": pa.array([r["w"] for r in rows], pa.int64()),
        "n_users": pa.array([r["n_distinct"] for r in rows], pa.int64()),
    })


def _hopping_distinct_sql() -> str:
    return (
        "SELECT w AS win_start_hour, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ("
        "SELECT user_id, epoch_us(ts) // 3600000000 - j.j AS w "
        f"FROM events, LATERAL (SELECT unnest(range({HOPD_SIZE})) AS j) j"
        ") GROUP BY 1 ORDER BY 1"
    )


NRA_K = 5


def _q_nra_topk(sf_dir: str):
    """Fagin-family NRA top-k aggregation join (ops.nra_topk): the
    top-5 parts by combined (total quantity + total revenue cents)
    found WITHOUT scanning either ranked list to the bottom — both
    per-part aggregates stream in descending-score order (Ray sort +
    lazy iter_batches: unscanned blocks never reach the driver),
    [lower, upper] bounds maintain provisional winners, and the scan
    stops when the top-5's exact scores provably dominate every
    remaining bound.  The SQL twin is the full-scan ORDER BY LIMIT
    the early stop must reproduce exactly; the early-termination
    property itself is pinned by pytest on a skewed fixture."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, nra_topk

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def _proj(t: pa.Table) -> pa.Table:
        q = np.asarray(t.column("l_quantity")).astype(np.int64)
        c = np.floor(np.asarray(t.column("l_extendedprice")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"k": t.column("l_partkey").cast(pa.int64()),
                         "q": pa.array(q, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    proj = li.map_batches(_proj, batch_format="pyarrow").materialize()
    aggA = grouped_pandas_agg(
        proj.select_columns(["k", "q"]), keys=["k"],
        aggs={"v": ("q", "sum")})
    aggB = grouped_pandas_agg(
        proj.select_columns(["k", "c"]), keys=["k"],
        aggs={"v": ("c", "sum")})
    rows, _sa, _sb = nra_topk(aggA, aggB, "k", "v", NRA_K)
    return pa.table({
        "part": pa.array([r[0] for r in rows], pa.int64()),
        "combined": pa.array([r[1] for r in rows], pa.int64()),
        "qty_sum": pa.array([r[2] for r in rows], pa.int64()),
        "cents_sum": pa.array([r[3] for r in rows], pa.int64()),
    })


def _nra_topk_sql() -> str:
    return (
        "WITH a AS (SELECT l_partkey AS p, "
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS va "
        "FROM lineitem GROUP BY 1), "
        "b AS (SELECT l_partkey AS p, "
        "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS vb FROM lineitem GROUP BY 1) "
        "SELECT a.p AS part, CAST(a.va + b.vb AS BIGINT) AS combined, "
        "a.va AS qty_sum, b.vb AS cents_sum "
        "FROM a JOIN b ON b.p = a.p "
        f"ORDER BY combined DESC, part LIMIT {NRA_K}"
    )


HAAR_N, HAAR_LEVELS = 64, 6


def _q_haar_hourly(sf_dir: str):
    """Haar wavelet decomposition of the hourly event-count series —
    the multi-resolution transform (unnormalized Haar lifting: pairs →
    (sum, diff)) that stays EXACT integer end to end, giving the
    per-scale detail energies a change-detector or compressor reads.
    The distributed piece is the hourly count combine (driver sees one
    row per hour — calendar-small by construction); the first 64 hours
    of the dense grid (zero hours explicit) lift through 6 levels in
    exact ints, emitting per level the coefficient count, Σ|d| and
    Σd², plus the final approximation as level 0.  Parseval for the
    unnormalized lifting: Σ 2^−ℓ·energy(ℓ) + 2^−L·a² = Σx² (pinned in
    pytest)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def _hour(t: pa.Table) -> pa.Table:
        h = (np.asarray(t.column("ts").cast(pa.int64()))
             // 3_600_000_000).astype(np.int64)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "one": pa.array(np.ones(len(h), np.int64))})

    rows = grouped_pandas_agg(
        ev.map_batches(_hour, batch_format="pyarrow"),
        keys=["h"], aggs={"n": ("one", "sum")}).take_all()
    hmin = min(r["h"] for r in rows)
    v = np.zeros(HAAR_N, np.int64)
    for r in rows:
        off = r["h"] - hmin
        if 0 <= off < HAAR_N:
            v[off] = r["n"]

    levels, absums, energies, ncs = [], [], [], []
    x = v.astype(object)  # Python ints: exact through all levels
    for lvl in range(1, HAAR_LEVELS + 1):
        s = x[0::2] + x[1::2]
        d = x[0::2] - x[1::2]
        levels.append(lvl)
        ncs.append(len(d))
        absums.append(int(sum(abs(int(t)) for t in d)))
        energies.append(int(sum(int(t) * int(t) for t in d)))
        x = s
    a = int(x[0])
    return pa.table({
        "level": pa.array([0] + levels, pa.int64()),
        "n_coeffs": pa.array([1] + ncs, pa.int64()),
        "d_abs_sum": pa.array([abs(a)] + absums, pa.int64()),
        "d_energy": pa.array([a * a] + energies, pa.int64()),
    })


def _haar_hourly_sql() -> str:
    steps = [
        "hc AS (SELECT epoch_us(ts) // 3600000000 AS h, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)",
        "h0 AS (SELECT min(h) AS m FROM hc)",
        f"grid AS (SELECT unnest(range({HAAR_N})) AS i)",
        "l0 AS (SELECT g.i, COALESCE(c.n, 0) AS v FROM grid g "
        "LEFT JOIN hc c ON c.h = (SELECT m FROM h0) + g.i)",
    ]
    stats = []
    for k in range(1, HAAR_LEVELS + 1):
        steps.append(
            f"l{k} AS (SELECT i // 2 AS i, sum(v) AS v, "
            "sum(CASE WHEN i % 2 = 0 THEN v ELSE -v END) AS d "
            f"FROM l{k - 1} GROUP BY 1)")
        stats.append(
            f"SELECT {k} AS level, CAST(count(*) AS BIGINT) AS n_coeffs, "
            "CAST(sum(abs(d)) AS BIGINT) AS d_abs_sum, "
            f"CAST(sum(d * d) AS BIGINT) AS d_energy FROM l{k}")
    stats.insert(0,
                 "SELECT 0 AS level, CAST(1 AS BIGINT) AS n_coeffs, "
                 "CAST(abs(v) AS BIGINT) AS d_abs_sum, "
                 f"CAST(v * v AS BIGINT) AS d_energy FROM l{HAAR_LEVELS}")
    body = ", ".join(steps)
    return (f"WITH {body} " + " UNION ALL ".join(stats)
            + " ORDER BY level")


CHI2_K, CHI2_LANG = 10, "en"


def _q_chi2_tokens(sf_dir: str):
    """χ² feature selection (textops.chi2_tokens): top-10 tokens
    separating English documents from the rest by the exact integer
    χ² quantization over the 2×2 document-presence contingency —
    the supervised ranking every text classifier's feature pruning
    runs; vocabulary never driver-collected, zero-variance
    always-present tokens excluded exactly as χ² demands."""
    import ray.data as rd

    from essentials_rd.textops import chi2_tokens

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    return chi2_tokens(docs, CHI2_LANG, k=CHI2_K)


def _chi2_tokens_sql() -> str:
    return (
        "WITH pres AS (SELECT DISTINCT doc_id, w AS tok FROM ("
        "SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents)), "
        "lab AS (SELECT doc_id, CASE WHEN lang = "
        f"'{CHI2_LANG}' THEN 1 ELSE 0 END AS t FROM documents), "
        "nn AS (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(t) AS HUGEINT) AS nt FROM lab), "
        "cnt AS (SELECT p.tok, CAST(sum(l.t) AS HUGEINT) AS a, "
        "CAST(count(*) AS HUGEINT) AS ab FROM pres p "
        "JOIN lab l ON l.doc_id = p.doc_id GROUP BY 1), "
        "sc AS (SELECT tok, a, ab, "
        "CAST((nn.n * (a * ((nn.n - nn.nt) - (ab - a)) "
        "- (ab - a) * (nn.nt - a)) "
        "* (a * ((nn.n - nn.nt) - (ab - a)) - (ab - a) * (nn.nt - a)) "
        "* 1000000) // (ab * (nn.n - ab) * nn.nt * (nn.n - nn.nt)) "
        "AS BIGINT) AS q "
        "FROM cnt, nn WHERE ab < nn.n) "
        "SELECT tok, CAST(a AS BIGINT) AS a, CAST(ab AS BIGINT) AS ab, "
        "q FROM (SELECT *, row_number() OVER (ORDER BY q DESC, tok) "
        f"AS rn FROM sc) WHERE rn <= {CHI2_K} ORDER BY q DESC, tok"
    )


SHAMIR_P = 2**31 - 1          # Mersenne prime: products fit int64
SHAMIR_SEED = 71
# Lagrange-at-0 weights for reconstruction points {1, 3, 5} mod p —
# precomputed with modular inverses so neither side needs pow-mod
SHAMIR_W = {1: 1879048193, 3: 1610612734, 5: 805306368}


def _q_shamir(sf_dir: str):
    """Shamir secret sharing over GF(2³¹−1) — threshold cryptography
    as a data operator (the split-the-root-credential pattern): the
    secret is the corpus-wide order-cents total mod p (a distributed
    fold), the degree-2 polynomial's coefficients come from splitmix
    draws mod p, 5 shares evaluate at x = 1..5, and the query
    RECONSTRUCTS from shares {1, 3, 5} via Lagrange interpolation at
    0 with precomputed modular-inverse weights — exact modular
    arithmetic end to end (Mersenne p keeps every product in int64),
    with the engine asserting reconstruction ≡ secret and pytest
    pinning that EVERY 3-subset reconstructs while 2 shares leave the
    secret information-theoretically free."""
    import ray.data as rd

    from essentials_rd.util import hash64

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])

    def _sum(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(t.column("o_totalprice")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"s": pa.array([int(c.sum())], pa.int64())})

    secret = sum(int(r["s"]) for r in orders.map_batches(
        _sum, batch_format="pyarrow").take_all()) % SHAMIR_P
    mix = np.uint64((SHAMIR_SEED * 0x9E3779B97F4A7C15) % (1 << 64))
    with np.errstate(over="ignore"):
        a1 = int(hash64(np.array([1], np.uint64) + mix)[0]) % SHAMIR_P
        a2 = int(hash64(np.array([2], np.uint64) + mix)[0]) % SHAMIR_P
    shares = {x: (secret + a1 * x + a2 * x * x) % SHAMIR_P
              for x in range(1, 6)}
    rec = sum(SHAMIR_W[x] * shares[x] for x in (1, 3, 5)) % SHAMIR_P
    assert rec == secret, (rec, secret)
    xs = sorted(shares)
    return pa.table({
        "x": pa.array(xs, pa.int64()),
        "share": pa.array([shares[x] for x in xs], pa.int64()),
        "reconstructed": pa.array([rec] * len(xs), pa.int64()),
        "secret_mod_p": pa.array([secret] * len(xs), pa.int64()),
    })


def _shamir_sql() -> str:
    p = SHAMIR_P
    mix = (SHAMIR_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes("shz", "i", f"i + {mix}",
                       "(SELECT unnest(range(1, 3)) AS i)")
    w = SHAMIR_W
    return (
        f"WITH {chain}, "
        "sec AS (SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) "
        f"AS BIGINT)) % {p} AS BIGINT) AS s FROM orders), "
        f"cf AS (SELECT max(CASE WHEN i = 1 THEN CAST(z % {p} AS BIGINT) "
        "END) AS a1, "
        f"max(CASE WHEN i = 2 THEN CAST(z % {p} AS BIGINT) END) AS a2 "
        "FROM shz3), "
        "xs AS (SELECT unnest(range(1, 6)) AS x), "
        "sh AS (SELECT x, CAST((sec.s + ((cf.a1 * x) % "
        f"{p}) + ((((cf.a2 * x) % {p}) * x) % {p})) % {p} AS BIGINT) "
        "AS share FROM xs, sec, cf), "
        "rec AS (SELECT CAST(("
        f"(({w[1]} * (SELECT share FROM sh WHERE x = 1)) % {p} + "
        f"({w[3]} * (SELECT share FROM sh WHERE x = 3)) % {p} + "
        f"({w[5]} * (SELECT share FROM sh WHERE x = 5)) % {p}"
        f") % {p}) AS BIGINT) AS r) "
        "SELECT sh.x, sh.share, (SELECT r FROM rec) AS reconstructed, "
        "(SELECT s FROM sec) AS secret_mod_p FROM sh ORDER BY sh.x"
    )


HOT_HALF_H, HOT_K = 168, 10  # one-week half-life, top-10


def _q_hot_ranking(sf_dir: str):
    """Recency-decayed 'hot' ranking (the Reddit/HN-family scoring)
    made hash-exact: each event's cents decay by integer
    right-shift — cents >> (age_hours // 168), a stepwise 2^-⌊age/λ⌋
    half-life that keeps every score an exact int64 where the
    textbook exp decay would float-drift; per-user decayed scores sum
    through one bucketed fold and the top-10 release breaks ties by
    user id.  Age is measured from the corpus max ts (a pure function
    of the data, so the ranking is reproducible — a wall-clock 'now'
    would not be)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, top_k

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def _mx(t: pa.Table) -> pa.Table:
        h = np.asarray(t.column("ts").cast(pa.int64()))
        return pa.table({"m": pa.array([int(h.max()) if len(h) else 0],
                                       pa.int64())})

    tmax = max(r["m"] for r in ev.map_batches(
        _mx, batch_format="pyarrow").take_all())

    def _score(t: pa.Table) -> pa.Table:
        ts = np.asarray(t.column("ts").cast(pa.int64()))
        c = np.floor(np.asarray(t.column("value")) * 100.0
                     + 0.5).astype(np.int64)
        age_h = (tmax - ts) // 3_600_000_000
        shift = np.minimum(age_h // HOT_HALF_H, 62).astype(np.int64)
        return pa.table({"u": t.column("user_id").cast(pa.int64()),
                         "s": pa.array(c >> shift, pa.int64())})

    agg = grouped_pandas_agg(
        ev.map_batches(_score, batch_format="pyarrow"),
        keys=["u"], aggs={"hot": ("s", "sum")})
    t = top_k(agg, "hot", HOT_K, descending=True, tie_cols=["u"])
    return t.rename_columns(["user_id", "hot_score"])


def _hot_ranking_sql() -> str:
    return (
        "WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events), "
        "sc AS (SELECT user_id, "
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) >> "
        "least(((SELECT m FROM mx) - epoch_us(ts)) // 3600000000 "
        f"// {HOT_HALF_H}, 62)) AS BIGINT) AS hot_score "
        "FROM events GROUP BY 1) "
        "SELECT user_id, hot_score FROM (SELECT *, row_number() OVER ("
        "ORDER BY hot_score DESC, user_id) AS rn FROM sc) "
        f"WHERE rn <= {HOT_K} ORDER BY hot_score DESC, user_id"
    )


def _q_pareto_point(sf_dir: str):
    """The 80/20 point — the Pareto-principle statistic operators
    actually quote: the smallest number of TOP users whose combined
    event cents reach 80% of the total, plus their exact share.
    Same distributed user-total value histogram as the Lorenz curve
    (one row per distinct total reaches the driver), walked top-down
    with the integer threshold 5·acc ≥ 4·total (no float shares)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, int_value_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(t.column("value")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"u": t.column("user_id").cast(pa.int64()),
                         "c": pa.array(c, pa.int64())})

    totals = grouped_pandas_agg(
        ev.map_batches(_cents, batch_format="pyarrow"),
        keys=["u"], aggs={"c": ("c", "sum")})
    hist: dict[int, int] = {}
    for r in int_value_counts(totals, "c").take_all():
        hist[int(r["value"])] = hist.get(int(r["value"]), 0) \
            + int(r["count"])
    vals = sorted(hist, reverse=True)
    n = sum(hist.values())
    tot = sum(v * hist[v] for v in vals)
    acc = 0
    k = 0
    for v in vals:
        for _ in range(hist[v]):
            acc += v
            k += 1
            if 5 * acc >= 4 * tot:
                break
        if 5 * acc >= 4 * tot:
            break
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "k_top": pa.array([k], pa.int64()),
        "top_share_q6": pa.array([(1_000_000 * acc) // tot if tot
                                  else 0], pa.int64()),
    })


def _pareto_point_sql() -> str:
    return (
        "WITH ut AS (SELECT user_id, "
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS c FROM events GROUP BY 1), "
        "rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, user_id) "
        "AS r, sum(c) OVER (ORDER BY c DESC, user_id) AS cum FROM ut), "
        "nn AS (SELECT count(*) AS n, sum(c) AS tot FROM ut), "
        "kk AS (SELECT min(r) AS k, min_by(cum, r) AS acc FROM rk, nn "
        "WHERE 5 * cum >= 4 * tot) "
        "SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_users, "
        "CAST((SELECT k FROM kk) AS BIGINT) AS k_top, "
        "CAST((1000000 * (SELECT acc FROM kk)) "
        "// (SELECT tot FROM nn) AS BIGINT) AS top_share_q6"
    )


def _q_fano(sf_dir: str):
    """Fano factor (index of dispersion) of the hourly event counts —
    the burstiness statistic point-process monitoring quotes (1 =
    Poisson, >1 overdispersed/bursty): on the DENSE hour grid (zero
    hours included — dropping them inflates the mean and masks
    burstiness), the exact integer release ⌊10⁶·(m·Σx²−S²)/(m·S)⌋
    where m = grid hours and S = Σ counts.  Calendar-small after one
    bucketed hourly combine."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def _hour(t: pa.Table) -> pa.Table:
        h = (np.asarray(t.column("ts").cast(pa.int64()))
             // 3_600_000_000).astype(np.int64)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "one": pa.array(np.ones(len(h), np.int64))})

    rows = grouped_pandas_agg(
        ev.map_batches(_hour, batch_format="pyarrow"),
        keys=["h"], aggs={"n": ("one", "sum")}).take_all()
    hmin = min(r["h"] for r in rows)
    hmax = max(r["h"] for r in rows)
    m = int(hmax - hmin + 1)
    S = sum(int(r["n"]) for r in rows)
    S2 = sum(int(r["n"]) ** 2 for r in rows)
    num = m * S2 - S * S
    fano = (1_000_000 * num) // (m * S) if S else 0
    return pa.table({
        "grid_hours": pa.array([m], pa.int64()),
        "total_events": pa.array([S], pa.int64()),
        "fano_q6": pa.array([fano], pa.int64()),
    })


def _fano_sql() -> str:
    return (
        "WITH hc AS (SELECT epoch_us(ts) // 3600000000 AS h, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "g AS (SELECT max(h) - min(h) + 1 AS m, "
        "CAST(sum(n) AS HUGEINT) AS s, "
        "CAST(sum(n * n) AS HUGEINT) AS s2 FROM hc) "
        "SELECT CAST(m AS BIGINT) AS grid_hours, "
        "CAST(s AS BIGINT) AS total_events, "
        "CAST((1000000 * (m * s2 - s * s)) // (m * s) AS BIGINT) "
        "AS fano_q6 FROM g"
    )


def _q_lorenz(sf_dir: str):
    """Lorenz curve — the inequality curve under every Gini number
    (the suite has the scalar; this is the full distributional
    release): users ranked by total event cents, and for each decile
    d the exact share ⌊10⁶·(value held by the poorest ⌈d·n/10⌉
    users)/total⌋.  Rides the distributed value histogram over USER
    TOTALS (driver sees one row per distinct total, never users);
    within a tied total, partial membership is resolved by taking the
    exact user-count prefix — SQL mirrors with a window over ranked
    totals.  Monotone convex by construction (pinned in pytest)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(t.column("value")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"u": t.column("user_id").cast(pa.int64()),
                         "c": pa.array(c, pa.int64())})

    totals = grouped_pandas_agg(
        ev.map_batches(_cents, batch_format="pyarrow"),
        keys=["u"], aggs={"c": ("c", "sum")})

    # distributed histogram over user totals: (total_value → n_users);
    # the driver folds one row per DISTINCT total, never per user
    from essentials_rd.ops import int_value_counts
    hist: dict[int, int] = {}
    for r in int_value_counts(totals, "c").take_all():
        hist[int(r["value"])] = hist.get(int(r["value"]), 0) \
            + int(r["count"])
    vals = sorted(hist)
    n = sum(hist.values())
    tot = sum(v * hist[v] for v in vals)
    ds_, shares = [], []
    for d in range(1, 11):
        k = (d * n + 9) // 10  # ceil(d·n/10) poorest users
        left = k
        acc = 0
        for v in vals:
            take = min(left, hist[v])
            acc += take * v
            left -= take
            if left == 0:
                break
        ds_.append(d)
        shares.append((1_000_000 * acc) // tot if tot else 0)
    for i in range(1, 10):  # convexity of the Lorenz curve
        assert shares[i] >= shares[i - 1]
    return pa.table({
        "decile": pa.array(ds_, pa.int64()),
        "share_q6": pa.array(shares, pa.int64()),
    })


def _lorenz_sql() -> str:
    return (
        "WITH ut AS (SELECT user_id, "
        "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS c FROM events GROUP BY 1), "
        "rk AS (SELECT c, row_number() OVER (ORDER BY c, user_id) "
        "AS r, sum(c) OVER (ORDER BY c, user_id) AS cum FROM ut), "
        "nn AS (SELECT count(*) AS n, sum(c) AS tot FROM ut), "
        "dec AS (SELECT unnest(range(1, 11)) AS d) "
        "SELECT d.d AS decile, "
        "CAST((1000000 * (SELECT cum FROM rk, nn "
        "WHERE rk.r = (d.d * nn.n + 9) // 10)) "
        "// (SELECT tot FROM nn) AS BIGINT) AS share_q6 "
        "FROM dec d ORDER BY 1"
    )


def _q_littles_law(sf_dir: str):
    """Little's-law audit (L·T = Σ sojourn) — queueing theory's
    conservation identity checked EXACTLY: the time-integral of user
    concurrency (Σ count·segment-length over the boundary sweep) must
    equal the sum of all user span lengths, two INDEPENDENT
    computations of the same quantity (one through the ±1 boundary
    sweep, one through the per-user min/max fold) whose integer
    equality certifies the sweep machinery end to end; the released
    row carries both sides plus the derived average concurrency as an
    exact rational numerator over the observed horizon."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def _prep(t: pa.Table) -> pa.Table:
        h = (np.asarray(t.column("ts").cast(pa.int64()))
             // 3_600_000_000).astype(np.int64)
        return pa.table({"u": t.column("user_id").cast(pa.int64()),
                         "h": pa.array(h, pa.int64())})

    spans = grouped_pandas_agg(
        ev.map_batches(_prep, batch_format="pyarrow"),
        keys=["u"], aggs={"s": ("h", "min"), "e": ("h", "max")}
    ).take_all()
    sum_sojourn = sum(int(r["e"]) - int(r["s"]) + 1 for r in spans)
    acc: dict[int, int] = {}
    for r in spans:
        acc[int(r["s"])] = acc.get(int(r["s"]), 0) + 1
        acc[int(r["e"]) + 1] = acc.get(int(r["e"]) + 1, 0) - 1
    bs = sorted(acc)
    integral = 0
    cur = 0
    for i, b in enumerate(bs):
        if i > 0:
            integral += cur * (b - bs[i - 1])
        cur += acc[b]
    assert integral == sum_sojourn, (integral, sum_sojourn)
    horizon = bs[-1] - bs[0]
    return pa.table({
        "n_users": pa.array([len(spans)], pa.int64()),
        "sum_sojourn_hours": pa.array([sum_sojourn], pa.int64()),
        "concurrency_integral": pa.array([integral], pa.int64()),
        "horizon_hours": pa.array([horizon], pa.int64()),
    })


def _littles_law_sql() -> str:
    return (
        "WITH sp AS (SELECT user_id, "
        "min(epoch_us(ts) // 3600000000) AS s, "
        "max(epoch_us(ts) // 3600000000) + 1 AS e FROM events "
        "GROUP BY 1), "
        "bd AS (SELECT b, sum(d) AS d FROM ("
        "SELECT s AS b, 1 AS d FROM sp "
        "UNION ALL SELECT e AS b, -1 AS d FROM sp) GROUP BY 1), "
        "sw AS (SELECT b, sum(d) OVER (ORDER BY b) AS cur, "
        "lead(b) OVER (ORDER BY b) AS nb FROM bd) "
        "SELECT CAST((SELECT count(*) FROM sp) AS BIGINT) AS n_users, "
        "CAST((SELECT sum(e - s) FROM sp) AS BIGINT) "
        "AS sum_sojourn_hours, "
        "CAST(COALESCE(sum(cur * (nb - b)), 0) AS BIGINT) "
        "AS concurrency_integral, "
        "CAST(max(b) - min(b) AS BIGINT) AS horizon_hours FROM sw"
    )


def _q_simpson(sf_dir: str):
    """Simpson's-paradox audit — the aggregation-reversal check every
    observational analysis should run before trusting a pooled trend:
    the sign of each nation's qty→price-cents slope numerator
    n·Σxy − Σx·Σy (an exact integer — no division needed for sign)
    versus the POOLED slope numerator over all nations; the audit
    reports how many groups agree/disagree with the pooled direction
    and flags a full reversal (pooled sign opposite to every group).
    One grouped_comoments bucketed fold (per-block partials, rows
    never shuffle) + the same six sums totalled for the pooled row."""
    import ray.data as rd

    from essentials_rd.ops import grouped_comoments
    from essentials_rd.util import np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity",
                                  "l_extendedprice"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = {r["c_custkey"]: r["c_nationkey"]
            for r in rd.read_parquet(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_nationkey"]).take_all()}
    import ray
    cref = ray.put(cust)

    from essentials_rd.ops import join

    def _li(t: pa.Table) -> pa.Table:
        q = np.asarray(t.column("l_quantity")).astype(np.int64)
        c = np.floor(np.asarray(t.column("l_extendedprice")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"k": t.column("l_orderkey"),
                         "q": pa.array(q, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def _nat(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        return pa.table({
            "k": t.column("o_orderkey"),
            "nat": pa.array([cm[x] for x in
                             t.column("o_custkey").to_pylist()],
                            pa.int64())})

    j = join(li.map_batches(_li, batch_format="pyarrow"),
             orders.map_batches(_nat, batch_format="pyarrow"),
             on="k", broadcast=False)
    agg = grouped_comoments(
        j, keys=["nat"], x="q", y="c",
        key_fn=lambda b: np_col(b, "nat"))
    rows = agg.take_all()
    tot = {c: 0 for c in ("n", "sum_x", "sum_y", "sum_xy")}
    signs = []
    for r in sorted(rows, key=lambda r: r["nat"]):
        num = int(r["n"]) * int(r["sum_xy"]) \
            - int(r["sum_x"]) * int(r["sum_y"])
        signs.append(1 if num > 0 else (-1 if num < 0 else 0))
        for c in tot:
            tot[c] += int(r[c])
    pooled = tot["n"] * tot["sum_xy"] - tot["sum_x"] * tot["sum_y"]
    ps = 1 if pooled > 0 else (-1 if pooled < 0 else 0)
    agree = sum(1 for s in signs if s == ps)
    disagree = sum(1 for s in signs if s == -ps and s != 0)
    return pa.table({
        "n_groups": pa.array([len(signs)], pa.int64()),
        "pooled_sign": pa.array([ps], pa.int64()),
        "n_agree": pa.array([agree], pa.int64()),
        "n_disagree": pa.array([disagree], pa.int64()),
        "full_reversal": pa.array(
            [int(disagree == len(signs) and len(signs) > 0)],
            pa.int64()),
    })


def _simpson_sql() -> str:
    return (
        "WITH jt AS (SELECT cu.c_nationkey AS nat, "
        "CAST(l.l_quantity AS BIGINT) AS q, "
        "CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS c "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer cu ON cu.c_custkey = o.o_custkey), "
        "g AS (SELECT nat, CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(q) AS HUGEINT) AS sx, CAST(sum(c) AS HUGEINT) AS sy, "
        "CAST(sum(q * c) AS HUGEINT) AS sxy FROM jt GROUP BY 1), "
        "sg AS (SELECT nat, CASE WHEN n * sxy - sx * sy > 0 THEN 1 "
        "WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS s FROM g), "
        "pool AS (SELECT CASE WHEN sum(n) * sum(sxy) "
        "- sum(sx) * sum(sy) > 0 THEN 1 WHEN sum(n) * sum(sxy) "
        "- sum(sx) * sum(sy) < 0 THEN -1 ELSE 0 END AS ps "
        "FROM (SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy, "
        "sum(sxy) AS sxy FROM g)) "
        "SELECT CAST((SELECT count(*) FROM sg) AS BIGINT) AS n_groups, "
        "CAST((SELECT ps FROM pool) AS BIGINT) AS pooled_sign, "
        "CAST((SELECT sum(CASE WHEN s = (SELECT ps FROM pool) THEN 1 "
        "ELSE 0 END) FROM sg) AS BIGINT) AS n_agree, "
        "CAST((SELECT sum(CASE WHEN s = -(SELECT ps FROM pool) "
        "AND s <> 0 THEN 1 ELSE 0 END) FROM sg) AS BIGINT) "
        "AS n_disagree, "
        "CAST(CASE WHEN (SELECT sum(CASE WHEN s = -(SELECT ps FROM "
        "pool) AND s <> 0 THEN 1 ELSE 0 END) FROM sg) = "
        "(SELECT count(*) FROM sg) AND (SELECT count(*) FROM sg) > 0 "
        "THEN 1 ELSE 0 END AS BIGINT) AS full_reversal"
    )


def _q_condorcet(sf_dir: str):
    """Condorcet pairwise-majority analysis — Borda's classical rival
    in social choice: for every ordered priority pair (a, b), the
    number of region ballots ranking a above b (ballots = the shared
    _region_prio_cells counts, count desc / priority asc per region);
    a Condorcet winner beats every rival on a strict majority of
    ballots, and the query flags whether one exists (the Condorcet
    paradox — cyclic majorities — is the no-winner case).  25 pairwise
    cells, driver-small; SQL twin ranks per region and counts
    rank-inversions per pair."""
    cells = _region_prio_cells(sf_dir)
    regions = sorted({r for (r, _p) in cells})
    prios = sorted({p for (_r, p) in cells})
    wins: dict[tuple, int] = {}
    for r in regions:
        rank = {p: i for i, p in enumerate(
            sorted(prios, key=lambda p: (-cells.get((r, p), 0), p)))}
        for a in prios:
            for b in prios:
                if a != b and rank[a] < rank[b]:
                    wins[(a, b)] = wins.get((a, b), 0) + 1
    nr = len(regions)
    winner = ""
    for a in prios:
        if all(wins.get((a, b), 0) * 2 > nr
               for b in prios if b != a):
            winner = a
            break
    rows = [(a, b, wins.get((a, b), 0))
            for a in prios for b in prios if a != b]
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.string()),
        "b": pa.array([r[1] for r in rows], pa.string()),
        "a_over_b": pa.array([r[2] for r in rows], pa.int64()),
        "condorcet_winner": pa.array([winner] * len(rows), pa.string()),
    })


def _condorcet_sql() -> str:
    return (
        "WITH cells AS (SELECT n.n_regionkey AS r, o.o_orderpriority "
        "AS prio, CAST(count(*) AS BIGINT) AS c FROM orders o "
        "JOIN customer cu ON cu.c_custkey = o.o_custkey "
        "JOIN nation n ON n.n_nationkey = cu.c_nationkey GROUP BY 1, 2), "
        "uni AS (SELECT r.r, p.prio, COALESCE(c.c, 0) AS c FROM "
        "(SELECT DISTINCT r FROM cells) r CROSS JOIN "
        "(SELECT DISTINCT prio FROM cells) p "
        "LEFT JOIN cells c ON c.r = r.r AND c.prio = p.prio), "
        "rk AS (SELECT r, prio, row_number() OVER (PARTITION BY r "
        "ORDER BY c DESC, prio) AS pos FROM uni), "
        "pw AS (SELECT a.prio AS a, b.prio AS b, "
        "CAST(sum(CASE WHEN a.pos < b.pos THEN 1 ELSE 0 END) AS BIGINT) "
        "AS a_over_b FROM rk a JOIN rk b ON b.r = a.r "
        "AND b.prio <> a.prio GROUP BY 1, 2), "
        "nr AS (SELECT count(DISTINCT r) AS n FROM cells), "
        "cw AS (SELECT COALESCE(min(a), '') AS w FROM ("
        "SELECT a FROM pw, nr GROUP BY a, nr.n "
        "HAVING min(2 * a_over_b - n) > 0)) "
        "SELECT pw.a, pw.b, pw.a_over_b, "
        "(SELECT w FROM cw) AS condorcet_winner FROM pw "
        "ORDER BY 1, 2"
    )


def _q_borda(sf_dir: str):
    """Borda count — the classic positional voting rule (social
    choice): each of the 5 regions ranks the 5 priorities by its own
    order counts (count desc, priority asc) and awards 4,3,2,1,0
    points down its ballot; priorities total their points and the
    Borda winner is (points desc, priority asc).  One shared
    _region_prio_cells distributed fold; ballots are driver-small by
    construction.  SQL twin ranks per region with a window and sums
    positional points."""
    cells = _region_prio_cells(sf_dir)
    regions = sorted({r for (r, _p) in cells})
    prios = sorted({p for (_r, p) in cells})
    P = len(prios)
    pts: dict[str, int] = {p: 0 for p in prios}
    for r in regions:
        ballot = sorted(prios,
                        key=lambda p: (-cells.get((r, p), 0), p))
        for pos, p in enumerate(ballot):
            pts[p] += (P - 1) - pos
    rows = sorted(pts.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table({
        "priority": pa.array([p for p, _ in rows], pa.string()),
        "borda_points": pa.array([v for _, v in rows], pa.int64()),
        "is_winner": pa.array([int(i == 0) for i in range(len(rows))],
                              pa.int64()),
    })


def _borda_sql() -> str:
    return (
        "WITH cells AS (SELECT n.n_regionkey AS r, o.o_orderpriority "
        "AS prio, CAST(count(*) AS BIGINT) AS c FROM orders o "
        "JOIN customer cu ON cu.c_custkey = o.o_custkey "
        "JOIN nation n ON n.n_nationkey = cu.c_nationkey GROUP BY 1, 2), "
        "uni AS (SELECT r.r, p.prio, COALESCE(c.c, 0) AS c FROM "
        "(SELECT DISTINCT r FROM cells) r CROSS JOIN "
        "(SELECT DISTINCT prio FROM cells) p "
        "LEFT JOIN cells c ON c.r = r.r AND c.prio = p.prio), "
        "np_ AS (SELECT count(DISTINCT prio) AS np FROM cells), "
        "rk AS (SELECT r, prio, row_number() OVER (PARTITION BY r "
        "ORDER BY c DESC, prio) AS pos FROM uni), "
        "pts AS (SELECT prio, CAST(sum((SELECT np FROM np_) - pos) "
        "AS BIGINT) AS borda_points FROM rk GROUP BY 1), "
        "fin AS (SELECT prio AS priority, borda_points, row_number() "
        "OVER (ORDER BY borda_points DESC, prio) AS rn FROM pts) "
        "SELECT priority, borda_points, "
        "CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_winner "
        "FROM fin ORDER BY borda_points DESC, priority"
    )


EG_K = 10


def _q_erdos_gallai(sf_dir: str):
    """Erdős–Gallai graphicality audit — the degree-sequence theorem
    as a data-quality check: for k = 1..10 over the co-purchase
    graph's DESCENDING degree sequence, lhs = Σ_{i≤k} dᵢ must satisfy
    lhs ≤ k(k−1) + Σ_{i>k} min(dᵢ, k); an actual graph always passes,
    and the SLACK per k is the hub-concentration profile (how far the
    head sits from the theoretical packing bound).  Everything
    derives from the driver-small degree HISTOGRAM (the repo's
    documented O(|V|) allowance) — top-k degrees and the capped tail
    sum need no row-level sort; SQL twin uses ranked window sums."""
    g, _ = _graph(sf_dir)
    import ray

    from essentials_rd.util import np_col

    vids = ray.get(g.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for t in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(t, "vid"))
        deg[pos] += np_col(t, "outdeg")
    d = np.sort(deg)[::-1]
    pre = np.cumsum(d)
    ks, lhs_, rhs_, slack = [], [], [], []
    for k in range(1, EG_K + 1):
        lhs = int(pre[k - 1])
        tail = d[k:]
        rhs = k * (k - 1) + int(np.minimum(tail, k).sum())
        ks.append(k)
        lhs_.append(lhs)
        rhs_.append(rhs)
        slack.append(rhs - lhs)
        assert rhs >= lhs  # the theorem: real degree sequences pass
    return pa.table({
        "k": pa.array(ks, pa.int64()),
        "lhs": pa.array(lhs_, pa.int64()),
        "rhs": pa.array(rhs_, pa.int64()),
        "slack": pa.array(slack, pa.int64()),
    })


def _erdos_gallai_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, "
        "ds AS (SELECT outdeg AS d, row_number() OVER ("
        "ORDER BY outdeg DESC, vid) AS i FROM deg), "
        f"ks AS (SELECT unnest(range(1, {EG_K + 1})) AS k) "
        "SELECT k, "
        "CAST((SELECT sum(d) FROM ds WHERE i <= k) AS BIGINT) AS lhs, "
        "CAST(k * (k - 1) + (SELECT COALESCE(sum(least(d, k)), 0) "
        "FROM ds WHERE i > k) AS BIGINT) AS rhs, "
        "CAST(k * (k - 1) + (SELECT COALESCE(sum(least(d, k)), 0) "
        "FROM ds WHERE i > k) "
        "- (SELECT sum(d) FROM ds WHERE i <= k) AS BIGINT) AS slack "
        "FROM ks ORDER BY k"
    )


def _region_prio_cells(sf_dir: str) -> dict:
    """Shared distributed fold: (region, priority) → order count via
    the orders⋈customer⋈nation partitioned join (≤25 cell partials
    leave each block).  Feeds the matching/assignment family."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nat = {r["n_nationkey"]: r["n_regionkey"]
           for r in rd.read_parquet(
               f"{sf_dir}/nation.parquet",
               columns=["n_nationkey", "n_regionkey"]).take_all()}
    co = join(
        orders.map_batches(
            lambda t: pa.table({"k": t.column("o_custkey"),
                                "prio": t.column("o_orderpriority")}),
            batch_format="pyarrow"),
        cust.map_batches(
            lambda t: pa.table({
                "k": t.column("c_custkey"),
                "r": pa.array([nat[x] for x in
                               t.column("c_nationkey").to_pylist()],
                              pa.int64())}),
            batch_format="pyarrow"),
        on="k", how="inner", broadcast=False)
    cells: dict[tuple, int] = {}
    for row in grouped_pandas_agg(
            co.map_batches(
                lambda t: pa.table({"r": t.column("r"),
                                    "prio": t.column("prio"),
                                    "one": pa.array(
                                        np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow"),
            keys=["r", "prio"], aggs={"n": ("one", "sum")},
            key_fn=lambda b: np_col(b, "r")).take_all():
        key = (int(row["r"]), row["prio"])
        cells[key] = cells.get(key, 0) + int(row["n"])
    return cells


def _hungarian_min(cost: list) -> list:
    """Kuhn–Munkres O(n³) assignment (potentials + augmenting paths,
    the classic shortest-augmenting-path formulation): returns the
    column matched to each row of the square integer cost matrix,
    minimizing total cost.  Used by assignment queries with the
    all-permutations SQL certificate."""
    n = len(cost)
    INF = float("inf")
    u = [0] * (n + 1)
    v = [0] * (n + 1)
    p = [0] * (n + 1)   # p[j] = row matched to column j (1-based)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    match = [0] * n
    for j in range(1, n + 1):
        match[p[j] - 1] = j - 1
    return match


def _q_assignment(sf_dir: str):
    """Min-cost assignment via the Hungarian algorithm (Kuhn–Munkres,
    potentials + shortest augmenting paths) with an exhaustive
    certificate: regions 0–3 each take a DISTINCT one of the 4 lowest
    priorities maximizing total captured orders (cost = rowmax −
    count, so min-cost ≡ max-coverage); the SQL twin — which cannot
    express potentials — maximizes Σcount over all 24 permutations
    with deterministic ties (total desc, perm id asc), so the hash
    match proves KM found the true optimum (the engine asserts it
    too).  Distributed piece: the orders⋈customer⋈nation cell fold."""
    cells = _region_prio_cells(sf_dir)
    prios = sorted({p for (r, p) in cells if r < 4})[:4]
    cnt = [[cells.get((r, prios[p]), 0) for p in range(4)]
           for r in range(4)]
    mx = max(max(row) for row in cnt)
    cost = [[mx - cnt[r][p] for p in range(4)] for r in range(4)]
    match = _hungarian_min(cost)
    total = sum(cnt[r][match[r]] for r in range(4))

    from itertools import permutations
    best = max((sum(cnt[r][perm[r]] for r in range(4)), pid)
               for pid, perm in enumerate(permutations(range(4))))
    # perm-id tie-break is only for the released table, totals must agree
    assert best[0] == total, (best, total)
    perms = list(permutations(range(4)))
    rel = min(pid for pid, perm in enumerate(perms)
              if sum(cnt[r][perm[r]] for r in range(4)) == total)
    relp = perms[rel]
    return pa.table({
        "region": pa.array(list(range(4)), pa.int64()),
        "assigned_prio": pa.array([prios[relp[r]] for r in range(4)],
                                  pa.string()),
        "captured": pa.array([cnt[r][relp[r]] for r in range(4)],
                             pa.int64()),
        "total": pa.array([total] * 4, pa.int64()),
    })


def _assignment_sql() -> str:
    from itertools import permutations

    perms = list(permutations(range(4)))
    vals = ", ".join(
        f"({pid}, {r}, {p})"
        for pid, perm in enumerate(perms) for r, p in enumerate(perm))
    return (
        "WITH cells AS (SELECT n.n_regionkey AS r, o.o_orderpriority "
        "AS prio, CAST(count(*) AS BIGINT) AS c FROM orders o "
        "JOIN customer cu ON cu.c_custkey = o.o_custkey "
        "JOIN nation n ON n.n_nationkey = cu.c_nationkey "
        "WHERE n.n_regionkey < 4 GROUP BY 1, 2), "
        "pr AS (SELECT prio, dense_rank() OVER (ORDER BY prio) - 1 "
        "AS pi FROM (SELECT DISTINCT prio FROM cells) QUALIFY pi < 4), "
        "cm AS (SELECT c.r, p.pi, c.c FROM cells c "
        "JOIN pr p ON p.prio = c.prio), "
        f"perm(pid, r, pi) AS (VALUES {vals}), "
        "tot AS (SELECT pm.pid, sum(COALESCE(cm.c, 0)) AS t "
        "FROM perm pm LEFT JOIN cm ON cm.r = pm.r AND cm.pi = pm.pi "
        "GROUP BY 1), "
        "best AS (SELECT pid, t FROM tot ORDER BY t DESC, pid LIMIT 1) "
        "SELECT CAST(pm.r AS BIGINT) AS region, p.prio AS assigned_prio, "
        "CAST(COALESCE(cm.c, 0) AS BIGINT) AS captured, "
        "CAST(b.t AS BIGINT) AS total "
        "FROM perm pm JOIN best b ON pm.pid = b.pid "
        "JOIN pr p ON p.pi = pm.pi "
        "LEFT JOIN cm ON cm.r = pm.r AND cm.pi = pm.pi "
        "ORDER BY region"
    )


def _q_stable_matching(sf_dir: str):
    """Gale–Shapley stable matching with an exhaustive certificate —
    the deferred-acceptance algorithm (Nobel-cited market design) on
    data-derived preferences: regions 0–3 propose to the 4
    lowest-priority classes, both sides ranking the other by the
    (region, priority) order-count matrix (count desc, index asc).
    The engine runs actual deferred acceptance; the SQL twin — which
    cannot express the proposal rounds — enumerates ALL 24 perfect
    matchings, keeps the STABLE ones (no blocking pair), and selects
    the proposer-optimal by lexicographic proposer-rank minimization
    (pointwise-minimal for every proposer, hence the lexicographic
    min — the matching GS provably returns).  A hash match certifies
    both stability and proposer-optimality of the engine's output;
    the engine asserts them too.  The distributed piece is the
    orders⋈customer⋈nation cell fold."""
    cells = _region_prio_cells(sf_dir)
    prios = sorted({p for (r, p) in cells if r < 4})[:4]
    R = 4
    cnt = [[cells.get((r, prios[p]), 0) for p in range(4)]
           for r in range(R)]
    # proposer r prefers receivers by (count desc, index asc)
    pref_r = [sorted(range(4), key=lambda p: (-cnt[r][p], p))
              for r in range(R)]
    # receiver p prefers proposers by (count desc, index asc)
    rank_p = []
    for p in range(4):
        order = sorted(range(R), key=lambda r: (-cnt[r][p], r))
        rk = [0] * R
        for pos, r in enumerate(order):
            rk[r] = pos
        rank_p.append(rk)

    # deferred acceptance (proposer-optimal)
    nxt = [0] * R
    match_p = [-1] * 4
    free = list(range(R))
    while free:
        r = free.pop(0)
        p = pref_r[r][nxt[r]]
        nxt[r] += 1
        if match_p[p] == -1:
            match_p[p] = r
        elif rank_p[p][r] < rank_p[p][match_p[p]]:
            free.append(match_p[p])
            match_p[p] = r
        else:
            free.append(r)
    match_r = [-1] * R
    for p, r in enumerate(match_p):
        match_r[r] = p

    # certificate: stability + proposer-optimality via enumeration
    from itertools import permutations

    def stable(perm):
        for r in range(R):
            for p in range(4):
                if perm[r] == p:
                    continue
                # blocking pair: r prefers p to perm[r] AND p prefers r
                if (pref_r[r].index(p) < pref_r[r].index(perm[r])
                        and rank_p[p][r] < rank_p[p][
                            next(rr for rr in range(R)
                                 if perm[rr] == p)]):
                    return True  # blocked
        return False

    best = min((tuple(pref_r[r].index(perm[r]) for r in range(R)), perm)
               for perm in permutations(range(4)) if not stable(perm))
    assert tuple(best[1]) == tuple(match_r), (best, match_r)

    return pa.table({
        "region": pa.array(list(range(R)), pa.int64()),
        "matched_prio": pa.array([prios[p] for p in match_r],
                                 pa.string()),
        "proposer_rank": pa.array(
            [pref_r[r].index(match_r[r]) for r in range(R)], pa.int64()),
    })


def _stable_matching_sql() -> str:
    from itertools import permutations

    perms = list(permutations(range(4)))
    vals = ", ".join(
        f"({pid}, {r}, {p})"
        for pid, perm in enumerate(perms) for r, p in enumerate(perm))
    return (
        "WITH cells AS (SELECT n.n_regionkey AS r, o.o_orderpriority "
        "AS prio, CAST(count(*) AS BIGINT) AS c FROM orders o "
        "JOIN customer cu ON cu.c_custkey = o.o_custkey "
        "JOIN nation n ON n.n_nationkey = cu.c_nationkey "
        "WHERE n.n_regionkey < 4 GROUP BY 1, 2), "
        "pr AS (SELECT prio, dense_rank() OVER (ORDER BY prio) - 1 "
        "AS pi FROM (SELECT DISTINCT prio FROM cells) "
        "QUALIFY pi < 4), "
        "cm AS (SELECT c.r, p.pi, c.c FROM cells c "
        "JOIN pr p ON p.prio = c.prio), "
        # proposer rank of receiver pi for region r: position in
        # (count desc, pi asc) order
        "prk AS (SELECT r, pi, row_number() OVER (PARTITION BY r "
        "ORDER BY c DESC, pi) - 1 AS rk FROM cm), "
        "rrk AS (SELECT pi, r, row_number() OVER (PARTITION BY pi "
        "ORDER BY c DESC, r) - 1 AS rk FROM cm), "
        f"perm(pid, r, pi) AS (VALUES {vals}), "
        # blocking pair: r prefers p' over its match AND p' prefers r
        "blocked AS (SELECT DISTINCT pm.pid FROM perm pm "
        "JOIN prk a ON a.r = pm.r AND a.pi = pm.pi "
        "JOIN prk b ON b.r = pm.r AND b.rk < a.rk "
        "JOIN rrk x ON x.pi = b.pi AND x.r = pm.r "
        "JOIN perm pm2 ON pm2.pid = pm.pid AND pm2.pi = b.pi "
        "JOIN rrk y ON y.pi = b.pi AND y.r = pm2.r "
        "WHERE x.rk < y.rk), "
        "stab AS (SELECT pid FROM (SELECT DISTINCT pid FROM perm) "
        "WHERE pid NOT IN (SELECT pid FROM blocked)), "
        "scored AS (SELECT pm.pid, "
        "max(CASE WHEN pm.r = 0 THEN a.rk END) AS k0, "
        "max(CASE WHEN pm.r = 1 THEN a.rk END) AS k1, "
        "max(CASE WHEN pm.r = 2 THEN a.rk END) AS k2, "
        "max(CASE WHEN pm.r = 3 THEN a.rk END) AS k3 "
        "FROM perm pm JOIN prk a ON a.r = pm.r AND a.pi = pm.pi "
        "WHERE pm.pid IN (SELECT pid FROM stab) GROUP BY 1), "
        "best AS (SELECT pid FROM scored "
        "ORDER BY k0, k1, k2, k3 LIMIT 1) "
        "SELECT CAST(pm.r AS BIGINT) AS region, p.prio AS matched_prio, "
        "CAST(a.rk AS BIGINT) AS proposer_rank "
        "FROM perm pm JOIN best ON pm.pid = best.pid "
        "JOIN pr p ON p.pi = pm.pi "
        "JOIN prk a ON a.r = pm.r AND a.pi = pm.pi "
        "ORDER BY region"
    )


def _q_bip_matching(sf_dir: str):
    """Bipartite maximum matching with an exhaustive certificate —
    the assignment primitive on the region × order-priority incidence:
    an edge (r, p) exists iff that cell's order count beats the
    uniform share (25·count > N, exact integer cross-multiply), the
    engine finds the maximum matching by augmenting paths
    (Hungarian-algorithm core), and — since SQL cannot express
    augmentation — the twin maximizes present-edge count over ALL 120
    5-permutations (any matching extends to a permutation, so the
    permutation max IS the matching number); a hash match proves the
    augmenting search found the true optimum (engine asserts it too).
    The distributed part is the orders⋈customer⋈nation cell-count
    fold (≤25 partials per block)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nat = {r["n_nationkey"]: r["n_regionkey"]
           for r in rd.read_parquet(
               f"{sf_dir}/nation.parquet",
               columns=["n_nationkey", "n_regionkey"]).take_all()}

    co = join(
        orders.map_batches(
            lambda t: pa.table({"k": t.column("o_custkey"),
                                "prio": t.column("o_orderpriority")}),
            batch_format="pyarrow"),
        cust.map_batches(
            lambda t: pa.table({
                "k": t.column("c_custkey"),
                "r": pa.array([nat[x] for x in
                               t.column("c_nationkey").to_pylist()],
                              pa.int64())}),
            batch_format="pyarrow"),
        on="k", how="inner", broadcast=False)
    cells: dict[tuple, int] = {}
    for row in grouped_pandas_agg(
            co.map_batches(
                lambda t: pa.table({"r": t.column("r"),
                                    "prio": t.column("prio"),
                                    "one": pa.array(
                                        np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow"),
            keys=["r", "prio"], aggs={"n": ("one", "sum")},
            key_fn=lambda b: np_col(b, "r")).take_all():
        key = (int(row["r"]), row["prio"])
        cells[key] = cells.get(key, 0) + int(row["n"])

    prios = sorted({p for _, p in cells})
    N = sum(cells.values())
    R, P = 5, len(prios)
    adj = [[25 * cells.get((r, prios[p]), 0) > N for p in range(P)]
           for r in range(R)]
    n_edges = sum(sum(row) for row in adj)

    # augmenting-path maximum matching
    match_p = [-1] * P

    def try_aug(r: int, seen: list) -> bool:
        for p in range(P):
            if adj[r][p] and not seen[p]:
                seen[p] = True
                if match_p[p] == -1 or try_aug(match_p[p], seen):
                    match_p[p] = r
                    return True
        return False

    m = sum(try_aug(r, [False] * P) for r in range(R))

    from itertools import permutations
    best = max(sum(adj[r][perm[r]] for r in range(R))
               for perm in permutations(range(P)))
    assert m == best, (m, best)
    return pa.table({
        "n_orders": pa.array([N], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "max_matching": pa.array([m], pa.int64()),
    })


def _bip_matching_sql() -> str:
    from itertools import permutations

    perms = list(permutations(range(5)))
    vals = ", ".join(
        f"({pid}, {r}, {p + 1})"
        for pid, perm in enumerate(perms) for r, p in enumerate(perm))
    return (
        "WITH cells AS (SELECT n.n_regionkey AS r, o.o_orderpriority "
        "AS prio, CAST(count(*) AS BIGINT) AS c FROM orders o "
        "JOIN customer cu ON cu.c_custkey = o.o_custkey "
        "JOIN nation n ON n.n_nationkey = cu.c_nationkey "
        "GROUP BY 1, 2), "
        "tot AS (SELECT sum(c) AS n FROM cells), "
        "pr AS (SELECT prio, dense_rank() OVER (ORDER BY prio) AS pi "
        "FROM (SELECT DISTINCT prio FROM cells)), "
        "edges AS (SELECT c.r, p.pi FROM cells c JOIN pr p "
        "ON p.prio = c.prio, tot WHERE 25 * c.c > tot.n), "
        f"perm(pid, r, pi) AS (VALUES {vals}), "
        "score AS (SELECT pm.pid, count(e.r) AS m FROM perm pm "
        "LEFT JOIN edges e ON e.r = pm.r AND e.pi = pm.pi "
        "GROUP BY 1) "
        "SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_orders, "
        "CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges, "
        "CAST((SELECT max(m) FROM score) AS BIGINT) AS max_matching"
    )


def _q_seq_support(sf_dir: str):
    """Sequential-pattern support census (the length-2 PrefixSpan /
    cSPADE table): for every ORDERED type pair (a, b) — including
    a = b — the number of users with an a-event strictly before some
    b-event, i.e. min ts(a) < max ts(b) per user (the gap-insensitive
    'eventually follows' relation, unlike the adjacent-only Markov
    table).  One user-bucketed min/max fold (≤ |alphabet| rows per
    user), per-user 5×5 outer compare, 25-int partials driver-summed;
    all pairs emit rows (zeros explicit)."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    types = sorted({r["event_type"] for r in ev.groupby(
        "event_type").count().take_all()})
    T = len(types)
    rank = {t: i for i, t in enumerate(types)}

    def _pairs(grp: pa.Table) -> pa.Table:
        import pandas as pd

        df = pa.table({
            "u": grp.column("user_id").cast(pa.int64()),
            "t": pa.array([rank[x] for x in
                           grp.column("event_type").to_pylist()],
                          pa.int64()),
            "ts": grp.column("ts").cast(pa.int64()),
        }).to_pandas()
        mm = df.groupby(["u", "t"])["ts"].agg(["min", "max"])
        counts = np.zeros((T, T), np.int64)
        big = np.int64(1 << 62)
        for _, g in mm.groupby(level="u"):
            mn = np.full(T, big, np.int64)
            mx = np.full(T, -big, np.int64)
            tt = g.index.get_level_values("t").to_numpy()
            mn[tt] = g["min"].to_numpy(np.int64)
            mx[tt] = g["max"].to_numpy(np.int64)
            counts += (mn[:, None] < mx[None, :]).astype(np.int64)
        i, j = np.divmod(np.arange(T * T), T)
        return pa.table({
            "i": pa.array(i.astype(np.int64)),
            "j": pa.array(j.astype(np.int64)),
            "n": pa.array(counts.ravel(), pa.int64()),
        })

    acc = np.zeros((T, T), np.int64)
    for r in hash_bucket_agg(
            ev, lambda b: np_col(b, "user_id"), _pairs).take_all():
        acc[r["i"], r["j"]] += r["n"]
    i, j = np.divmod(np.arange(T * T), T)
    return pa.table({
        "a": pa.array([types[x] for x in i], pa.string()),
        "b": pa.array([types[x] for x in j], pa.string()),
        "n_users": pa.array(acc.ravel(), pa.int64()),
    })


def _seq_support_sql() -> str:
    return (
        "WITH mm AS (SELECT user_id, event_type, "
        "min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx "
        "FROM events GROUP BY 1, 2), "
        "sup AS (SELECT a.event_type AS a, b.event_type AS b, "
        "CAST(count(*) AS BIGINT) AS n FROM mm a "
        "JOIN mm b ON b.user_id = a.user_id AND a.mn < b.mx "
        "GROUP BY 1, 2), "
        "ty AS (SELECT DISTINCT event_type AS t FROM events) "
        "SELECT ta.t AS a, tb.t AS b, "
        "CAST(COALESCE(s.n, 0) AS BIGINT) AS n_users "
        "FROM ty ta CROSS JOIN ty tb "
        "LEFT JOIN sup s ON s.a = ta.t AND s.b = tb.t "
        "ORDER BY 1, 2"
    )


FH_DIM = 8
FH_SEED = 53


def _q_feature_hash(sf_dir: str):
    """The hashing trick (feature hashing, Weinberger et al.) — the
    fixed-dimension categorical featurizer every large-scale linear
    model uses when the vocabulary is unbounded: each event's crossed
    categorical (event_type × hour-of-day) hashes to one of 8 buckets
    with a ±1 sign bit (sign hashing keeps the inner product unbiased),
    and each user's feature vector is the signed bucket count.  Type →
    rank via the tiny driver-collected alphabet (broadcast-small by
    nature); per event the 8 signed one-hot partials fold through ONE
    user-bucketed integer sum — exact int64 features, bit-identical at
    any layout."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import hash64, np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    types = sorted({r["event_type"] for r in ev.groupby(
        "event_type").count().take_all()})
    rank = {t: i + 1 for i, t in enumerate(types)}
    mix = np.uint64((FH_SEED * 0x9E3779B97F4A7C15) % (1 << 64))

    def _feat(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), object)
        tr = np.asarray([rank[x] for x in et], np.uint64)
        hour = ((np.asarray(t.column("ts").cast(pa.int64()))
                 // 3_600_000_000) % 24).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = hash64(tr * np.uint64(24) + hour + mix)
        b = (z % np.uint64(FH_DIM)).astype(np.int64)
        sign = 1 - 2 * ((z >> np.uint64(8)) & np.uint64(1)).astype(np.int64)
        cols = {"user_id": t.column("user_id").cast(pa.int64())}
        for k in range(FH_DIM):
            cols[f"f{k}"] = pa.array(
                np.where(b == k, sign, 0).astype(np.int64), pa.int64())
        return pa.table(cols)

    agg = grouped_pandas_agg(
        ev.map_batches(_feat, batch_format="pyarrow"),
        keys=["user_id"],
        aggs={f"f{k}": (f"f{k}", "sum") for k in range(FH_DIM)})
    rows = sorted(agg.take_all(), key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        **{f"f{k}": pa.array([int(r[f"f{k}"]) for r in rows], pa.int64())
           for k in range(FH_DIM)},
    })


def _feature_hash_sql() -> str:
    # Literals on purpose (twin-independence — THIS is the query the
    # round-4 FH_DIM shadowing incident silently shifted): FH_DIM and
    # the seed mix must equal the engine's; a module-constant edit now
    # breaks the oracle loudly instead of moving both sides together.
    FH_DIM = 8
    mix = (53 * 0x9E3779B97F4A7C15) % (1 << 64)  # FH_SEED=53 frozen
    chain = _sm64_ctes("fh", "user_id",
                       f"tr * 24 + h + {mix}", "feats")
    sums = ", ".join(
        f"CAST(sum(CASE WHEN z % {FH_DIM} = {k} THEN "
        "(1 - 2 * CAST((z >> 8) & 1 AS BIGINT)) ELSE 0 END) AS BIGINT) "
        f"AS f{k}"
        for k in range(FH_DIM))
    return (
        "WITH tr AS (SELECT event_type, dense_rank() OVER ("
        "ORDER BY event_type) AS tr FROM ("
        "SELECT DISTINCT event_type FROM events)), "
        "feats AS (SELECT e.user_id, t.tr, "
        "CAST((epoch_us(e.ts) // 3600000000) % 24 AS BIGINT) AS h "
        "FROM events e JOIN tr t ON t.event_type = e.event_type), "
        f"{chain} "
        f"SELECT user_id, {sums} FROM fh3 GROUP BY user_id "
        "ORDER BY user_id"
    )


MRR_SIXTHS = {1: 6, 2: 3, 3: 2}  # 1/r in units of 1/6 — exact rational MRR


def _q_mrr_eval(sf_dir: str):
    """Recommender evaluation with an EXACT metric: mean reciprocal
    rank of the item-item cosine top-3 serving table against each
    order's own basket (leave-the-query-in eval of the serving
    mechanics).  For every order with ≥ 2 distinct parts, the query
    item is its smallest part key; the first other basket item found
    in the query's top-3 list contributes 1/rank — folded as integer
    SIXTHS (lcm(1,2,3)), so MRR = sixths/(6·n) is exact where a float
    mean would drift.  The serving table (3·|items| rows, model-sized)
    broadcasts via ray.put; baskets fold in their existing
    order-bucketed exchange — rows never leave their bucket."""
    import ray

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.pipelines import copurchase_items
    from essentials_rd.util import np_col

    serving = _q_item_cosine(sf_dir)
    top: dict[int, list[int]] = {}
    for it, nbr in zip(np.asarray(serving["item"], np.int64),
                       np.asarray(serving["nbr"], np.int64)):
        top.setdefault(int(it), []).append(int(nbr))  # already rank order
    top_ref = ray.put(top)

    def _eval(grp: pa.Table) -> pa.Table:
        tt = ray.get(top_ref)
        ok = np_col(grp, "l_orderkey")
        pk = np_col(grp, "l_partkey")
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        n_eval = sixths = n_hit = 0
        for st, en in zip(starts, np.r_[starts[1:], len(ok)]):
            if en - st < 2:
                continue
            parts = pk[st:en]  # sorted; parts[0] is the query item
            others = set(int(p) for p in parts[1:])
            n_eval += 1
            for r, nbr in enumerate(tt.get(int(parts[0]), ()), start=1):
                if nbr in others:
                    sixths += MRR_SIXTHS[r]
                    n_hit += 1
                    break
        return pa.table({
            "n_eval": pa.array([n_eval], pa.int64()),
            "sixths": pa.array([sixths], pa.int64()),
            "n_hit": pa.array([n_hit], pa.int64()),
        })

    tot = [0, 0, 0]
    for r in hash_bucket_agg(
            copurchase_items(sf_dir),
            lambda b: np_col(b, "l_orderkey"), _eval).take_all():
        tot[0] += r["n_eval"]
        tot[1] += r["sixths"]
        tot[2] += r["n_hit"]
    return pa.table({
        "n_eval": pa.array([tot[0]], pa.int64()),
        "mrr_sixths": pa.array([tot[1]], pa.int64()),
        "n_hit_top3": pa.array([tot[2]], pa.int64()),
    })


def _mrr_eval_sql() -> str:
    base = _item_cosine_sql()
    # reuse the serving-table CTE body: strip the final SELECT, keep WITH
    cte_body = base[len("WITH "):base.index(" SELECT CAST(i AS BIGINT)")]
    return (
        f"WITH {cte_body}, "
        "ords AS (SELECT o, min(p) AS qp FROM items "
        "GROUP BY 1 HAVING count(*) >= 2), "
        f"hits AS (SELECT d.o, min(rk.r) AS r FROM ords d "
        f"JOIN rk ON rk.i = d.qp AND rk.r <= {ITEMCOS_K} "
        "JOIN items t ON t.o = d.o AND t.p = rk.j GROUP BY 1) "
        "SELECT CAST((SELECT count(*) FROM ords) AS BIGINT) AS n_eval, "
        "CAST(COALESCE(sum(CASE h.r WHEN 1 THEN 6 WHEN 2 THEN 3 "
        "WHEN 3 THEN 2 END), 0) AS BIGINT) AS mrr_sixths, "
        "CAST(count(*) AS BIGINT) AS n_hit_top3 FROM hits h"
    )


def _q_bitmap_and(sf_dir: str):
    """Bitmap-index conjunction probe (ops.bitmap_index_counts) — the
    warehouse storage-layer path for WHERE p1 AND p2: each predicate's
    qualifying order keys pack into 64-bit words (per-block OR-fold,
    one word-bucketed exchange, word-wise AND + popcount probe), so
    WORDS move through the shuffle, never rows — |keyspace|/64 cost at
    any selectivity.  The SQL twin is the plain conditional count the
    bitmap must reproduce exactly."""
    import ray.data as rd

    from essentials_rd.ops import bitmap_index_counts

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderstatus"])

    def _urgent(t: pa.Table) -> np.ndarray:
        return (np.asarray(t.column("o_orderpriority").to_pylist(), object)
                == "1-URGENT")

    def _fstatus(t: pa.Table) -> np.ndarray:
        return (np.asarray(t.column("o_orderstatus").to_pylist(), object)
                == "F")

    c = bitmap_index_counts(
        orders, "o_orderkey",
        [("urgent", _urgent), ("fstatus", _fstatus)])
    return pa.table({
        "n_urgent": pa.array([c["urgent"]], pa.int64()),
        "n_fstatus": pa.array([c["fstatus"]], pa.int64()),
        "n_both": pa.array([c["__and__"]], pa.int64()),
    })


def _bitmap_and_sql() -> str:
    return (
        "SELECT "
        "CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 "
        "END) AS BIGINT) AS n_urgent, "
        "CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_fstatus, "
        "CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' AND "
        "o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_both "
        "FROM orders"
    )


IVM_FRAC = 0.125
IVM_OSEED, IVM_CSEED = 41, 43


def _q_incr_join_view(sf_dir: str):
    """Incremental materialized-view maintenance for a JOIN — the
    differential-dataflow delta rule Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
    run literally: orders and customers each split base/delta by a
    value-pure splitmix rule (~12.5% deltas), the per-nation
    order-count view materializes ONCE over the base tables, and the
    maintenance step computes ONLY the three delta terms (every join
    touches at least one small delta side — the whole point: the
    base⋈base work is never redone).  The SQL twin computes base and
    FULL independently and reports full − base as the delta, so a
    hash match certifies the delta rule's algebra end to end.  All
    25 nations emit rows (zeros explicit)."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import hash64, np_col

    thresh = np.uint64(int(IVM_FRAC * float(2**64 - 1)))

    def _split(ds, keycol, seed):
        mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))

        def _flag(t: pa.Table) -> pa.Table:
            k = np.asarray(t.column(keycol)).astype(np.uint64)
            with np.errstate(over="ignore"):
                isdelta = hash64(k + mix) < thresh
            return t.append_column("__d__", pa.array(isdelta))

        flagged = ds.map_batches(_flag, batch_format="pyarrow").materialize()
        base = flagged.filter(expr="__d__ == False").drop_columns(["__d__"])
        delta = flagged.filter(expr="__d__ == True").drop_columns(["__d__"])
        return base, delta

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    ob, od = _split(orders, "o_orderkey", IVM_OSEED)
    cb, cd = _split(cust, "c_custkey", IVM_CSEED)

    def _per_cust(ds):
        return grouped_pandas_agg(
            ds.map_batches(
                lambda t: pa.table({"k": t.column("o_custkey")}),
                batch_format="pyarrow"),
            keys=["k"], aggs={"n": ("k", "count")})

    def _nation_counts(ocnt, cside) -> dict:
        ctab = cside.map_batches(
            lambda t: pa.table({"k": t.column("c_custkey"),
                                "nation": t.column("c_nationkey")}),
            batch_format="pyarrow")
        j = join(ocnt, ctab, on="k", how="inner", broadcast=False)
        out: dict[int, int] = {}
        for r in grouped_pandas_agg(
                j, keys=["nation"], aggs={"n": ("n", "sum")}).take_all():
            out[int(r["nation"])] = out.get(int(r["nation"]), 0) + int(r["n"])
        return out

    ob_cnt = _per_cust(ob).materialize()
    od_cnt = _per_cust(od).materialize()
    v0 = _nation_counts(ob_cnt, cb)          # the materialized base view
    t1 = _nation_counts(od_cnt, cb)          # ΔA ⋈ B
    t2 = _nation_counts(ob_cnt, cd)          # A ⋈ ΔB
    t3 = _nation_counts(od_cnt, cd)          # ΔA ⋈ ΔB

    nk = sorted(
        r["n_nationkey"]
        for r in rd.read_parquet(f"{sf_dir}/nation.parquet",
                                 columns=["n_nationkey"]).take_all())
    base = [v0.get(k, 0) for k in nk]
    delta = [t1.get(k, 0) + t2.get(k, 0) + t3.get(k, 0) for k in nk]
    return pa.table({
        "nation": pa.array(nk, pa.int64()),
        "n_base": pa.array(base, pa.int64()),
        "n_delta": pa.array(delta, pa.int64()),
        "n_total": pa.array([b + d for b, d in zip(base, delta)],
                            pa.int64()),
    })


def _incr_join_view_sql() -> str:
    thresh = int(IVM_FRAC * float(2**64 - 1))
    omix = (IVM_OSEED * 0x9E3779B97F4A7C15) % (1 << 64)
    cmix = (IVM_CSEED * 0x9E3779B97F4A7C15) % (1 << 64)
    ochain = _sm64_ctes("ivo", "o_orderkey, o_custkey",
                        f"o_orderkey + {omix}", "orders")
    cchain = _sm64_ctes("ivc", "c_custkey, c_nationkey",
                        f"c_custkey + {cmix}", "customer")
    return (
        f"WITH {ochain}, {cchain}, "
        "ofl AS (SELECT o_custkey, "
        f"z < CAST('{thresh}' AS UBIGINT) AS d FROM ivo3), "
        "cfl AS (SELECT c_custkey, c_nationkey, "
        f"z < CAST('{thresh}' AS UBIGINT) AS d FROM ivc3), "
        "base AS (SELECT c.c_nationkey AS nation, "
        "CAST(count(*) AS BIGINT) AS n FROM ofl o "
        "JOIN cfl c ON c.c_custkey = o.o_custkey "
        "WHERE NOT o.d AND NOT c.d GROUP BY 1), "
        "fullv AS (SELECT c.c_nationkey AS nation, "
        "CAST(count(*) AS BIGINT) AS n FROM ofl o "
        "JOIN cfl c ON c.c_custkey = o.o_custkey GROUP BY 1) "
        "SELECT n.n_nationkey AS nation, "
        "CAST(COALESCE(b.n, 0) AS BIGINT) AS n_base, "
        "CAST(COALESCE(f.n, 0) - COALESCE(b.n, 0) AS BIGINT) AS n_delta, "
        "CAST(COALESCE(f.n, 0) AS BIGINT) AS n_total "
        "FROM nation n LEFT JOIN base b ON b.nation = n.n_nationkey "
        "LEFT JOIN fullv f ON f.nation = n.n_nationkey "
        "ORDER BY 1"
    )


def _kraft_multisets(n: int) -> list:
    """All code-length multisets of full binary trees with n leaves
    (Kraft equality Σ2^−l = 1), each sorted ascending, the list sorted
    lexicographically — the exhaustive search space for optimal
    prefix codes over n symbols."""
    out = set()

    def rec(remaining: int, budget, max_len: int, cur: tuple):
        # budget is in units of 2^-max_total; use fractions of 2^-16
        if remaining == 0:
            if budget == 0:
                out.add(tuple(sorted(cur)))
            return
        min_l = cur[-1] if cur else 1
        for le in range(min_l, 16):
            w = 1 << (16 - le)
            if w * remaining < budget:
                break  # even all-at-this-length can't fill: too short
            if w <= budget:
                rec(remaining - 1, budget - w, max_len, cur + (le,))

    rec(n, 1 << 16, 16, ())
    return sorted(out)


def _q_huffman(sf_dir: str):
    """Optimal prefix-code planning (Huffman) with an exhaustive
    certificate: event-type symbol counts fold distributed
    (driver sees one row per type), the engine runs the classic
    Huffman greedy merge AND independently enumerates every
    Kraft-complete code-length multiset for the alphabet, asserting
    the greedy total equals the enumerated optimum — then releases
    the deterministic assignment (lexicographically smallest optimal
    multiset, lengths ascending onto symbols by count desc / name
    asc).  The SQL twin cannot express the greedy merge, so it prices
    ALL enumerated multisets and picks the same (total bits, multiset
    index) argmin — a hash match proves the greedy found the true
    optimum.  Total bits is the exact compressed size an entropy
    coder would pay for the column."""
    import heapq

    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import grouped_pandas_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type"])
    cnt_rows = grouped_pandas_agg(
        ev, keys=["event_type"], aggs={"n": ("event_id", "count")},
        key_fn=lambda b: np.asarray(
            _str_hash(b.column("event_type")))).take_all()
    syms = sorted(((r["event_type"], int(r["n"])) for r in cnt_rows),
                  key=lambda x: (-x[1], x[0]))
    n = len(syms)

    # greedy Huffman total bits (weights only — lengths via merge depth)
    heap = [(c, i) for i, (_, c) in enumerate(syms)]
    heapq.heapify(heap)
    total_greedy = 0
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        total_greedy += a[0] + b[0]
        heapq.heappush(heap, (a[0] + b[0], min(a[1], b[1])))

    cands = _kraft_multisets(n)
    totals = [sum(le * c for le, (_, c) in zip(ms, syms)) for ms in cands]
    best = min(range(len(cands)), key=lambda i: (totals[i], i))
    assert totals[best] == total_greedy, (totals[best], total_greedy)
    lens = cands[best]
    order = sorted(range(n), key=lambda i: syms[i][0])
    return pa.table({
        "event_type": pa.array([syms[i][0] for i in order], pa.string()),
        "cnt": pa.array([syms[i][1] for i in order], pa.int64()),
        "code_len": pa.array([lens[i] for i in order], pa.int64()),
        "total_bits": pa.array([totals[best]] * n, pa.int64()),
    })


def _huffman_sql() -> str:
    cands = _kraft_multisets(5)
    vals = ", ".join(
        f"({mi}, {r + 1}, {le})"
        for mi, ms in enumerate(cands) for r, le in enumerate(ms))
    return (
        "WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt "
        "FROM events GROUP BY 1), "
        "rk AS (SELECT event_type, cnt, row_number() OVER ("
        "ORDER BY cnt DESC, event_type) AS r FROM c), "
        f"ml(ms, r, len) AS (VALUES {vals}), "
        "tot AS (SELECT ms, sum(l.len * k.cnt) AS bits "
        "FROM ml l JOIN rk k ON k.r = l.r GROUP BY 1), "
        "best AS (SELECT ms, bits FROM tot ORDER BY bits, ms LIMIT 1) "
        "SELECT k.event_type, k.cnt, CAST(l.len AS BIGINT) AS code_len, "
        "CAST(b.bits AS BIGINT) AS total_bits "
        "FROM rk k JOIN best b ON true JOIN ml l "
        "ON l.ms = b.ms AND l.r = k.r ORDER BY 1"
    )


MEDIA_VID_N = 30


def _q_video_motion(sf_dir: str):
    """REAL video decode (multimodal.decode_rawvid): RVID containers
    (magic + u32 dims header + raw frame-major RGB — real byte
    parsing, no codec libs needed) whose pixel stream is the shared
    splitmix chain; the VideoMotionStage actor pool decodes and emits
    the exact temporal-difference motion energy Σ|frame_t −
    frame_{t−1}| every shot-boundary detector starts from, plus the
    first frame's value sum as the static audit.  The SQL twin
    replays the stream ONCE and self-joins at the frame stride
    (j − w·h·3), certifying decode → temporal diff end to end —
    completing the real-decode triple: image (Sobel), audio
    (Hadamard), video (motion)."""
    import ray.data as rd

    from essentials_rd.multimodal import synth_coded_video, video_motion

    media = rd.from_arrow(synth_coded_video(MEDIA_VID_N, seed=MEDIA_SEED))
    out = video_motion(media).take_all()
    out.sort(key=lambda r: r["media_id"])
    return pa.table({
        k: pa.array([r[k] for r in out], pa.int64())
        for k in ("media_id", "n_frames", "motion_sum", "frame0_sum")
    })


def _video_motion_sql() -> str:
    mix = (MEDIA_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "vv", "media_id, nper, nf, j",
        f"media_id * 4294967296 + j + {mix}", "pix")
    return (
        "WITH dims AS (SELECT i AS media_id, "
        "CAST((8 + (i % 4) * 2) * (6 + (i % 3) * 2) * 3 AS BIGINT) AS nper, "
        "CAST(4 + (i % 5) AS BIGINT) AS nf "
        f"FROM (SELECT unnest(range({MEDIA_VID_N})) AS i)), "
        "pix AS (SELECT media_id, nper, nf, "
        "unnest(range(nper * nf)) AS j FROM dims), "
        f"{chain}, "
        "vals AS (SELECT media_id, nper, nf, j, "
        "CAST(z % 256 AS BIGINT) AS v FROM vv3), "
        "mo AS (SELECT a.media_id, sum(abs(a.v - b.v)) AS motion "
        "FROM vals a JOIN vals b ON b.media_id = a.media_id "
        "AND b.j = a.j - a.nper GROUP BY 1), "
        "f0 AS (SELECT media_id, max(nf) AS nf, sum(v) AS s0 "
        "FROM vals WHERE j < nper GROUP BY 1) "
        "SELECT f0.media_id, CAST(f0.nf AS BIGINT) AS n_frames, "
        "CAST(COALESCE(mo.motion, 0) AS BIGINT) AS motion_sum, "
        "CAST(f0.s0 AS BIGINT) AS frame0_sum "
        "FROM f0 LEFT JOIN mo ON mo.media_id = f0.media_id "
        "ORDER BY f0.media_id"
    )


def _q_region_min_cut(sf_dir: str):
    """Max-flow / min-cut with a duality certificate: over the
    region-level trade multigraph (the shared _region_weight_matrix
    fold — the distributed part is the partitioned lineitem⋈orders
    big-big join; ≤25 partial rows leave each block), the engine runs
    EXACT integer Edmonds-Karp max-flow from region 0 to region 4 and
    emits every s-t cut's weight alongside — max-flow strong duality
    says the flow value equals the minimum cut, and the SQL twin
    (which cannot express augmenting paths) certifies exactly that:
    it enumerates all 2³ s-t cuts of the 5-vertex graph and takes the
    min, so a hash match PROVES the flow computation found the true
    optimum.  The engine also asserts duality internally."""
    w = _region_weight_matrix(sf_dir)
    R, s, t = 5, 0, 4
    cap = [[int(w[i][j]) for j in range(R)] for i in range(R)]

    # Edmonds-Karp: BFS shortest augmenting paths on the residual graph
    flow = 0
    while True:
        parent = [-1] * R
        parent[s] = s
        queue = [s]
        while queue and parent[t] == -1:
            u = queue.pop(0)
            for v in range(R):
                if parent[v] == -1 and cap[u][v] > 0:
                    parent[v] = u
                    queue.append(v)
        if parent[t] == -1:
            break
        # bottleneck along the path
        bott = None
        v = t
        while v != s:
            u = parent[v]
            bott = cap[u][v] if bott is None else min(bott, cap[u][v])
            v = u
        v = t
        while v != s:
            u = parent[v]
            cap[u][v] -= bott
            cap[v][u] += bott
            v = u
        flow += bott

    masks, weights = [], []
    for m in range(8):
        side = [True] + [bool(m >> k & 1) for k in range(3)] + [False]
        cw = sum(int(w[i][j]) for i in range(R) for j in range(i + 1, R)
                 if side[i] != side[j])
        masks.append(m)
        weights.append(cw)
    assert flow == min(weights), (flow, min(weights))
    return pa.table({
        "cut_mask": pa.array(masks, pa.int64()),
        "cut_weight": pa.array(weights, pa.int64()),
        "max_flow": pa.array([flow] * 8, pa.int64()),
    })


def _region_min_cut_sql() -> str:
    R = 5
    wname = {}
    for i in range(R):
        for jj in range(i + 1, R):
            wname[(i, jj)] = f"w{i}{jj}"
    wcols = ", ".join(
        f"sum(CASE WHEN i = {i} AND j = {jj} THEN w ELSE 0 END) AS w{i}{jj}"
        for i in range(R) for jj in range(i + 1, R))
    rows = []
    all_cuts = []
    for m in range(8):
        side = [True] + [bool(m >> k & 1) for k in range(3)] + [False]
        terms = [wname[(i, j)] for i in range(R) for j in range(i + 1, R)
                 if side[i] != side[j]]
        expr = " + ".join(terms) if terms else "0"
        rows.append(f"SELECT {m} AS cut_mask, ({expr}) AS cut_weight FROM ws")
        all_cuts.append(f"({expr})")
    least = "LEAST(" + ", ".join(all_cuts) + ")"
    union = " UNION ALL ".join(rows)
    return f"""
WITH dirw AS (
  SELECT nc.n_regionkey AS rc, ns.n_regionkey AS rs,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer cu ON cu.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = cu.c_nationkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  GROUP BY 1, 2),
und AS (
  SELECT least(rc, rs) AS i, greatest(rc, rs) AS j, sum(c) AS w
  FROM dirw WHERE rc <> rs GROUP BY 1, 2),
ws AS (SELECT {wcols} FROM und),
cuts AS ({union})
SELECT CAST(cut_mask AS BIGINT) AS cut_mask,
       CAST(cut_weight AS BIGINT) AS cut_weight,
       CAST((SELECT {least} FROM ws) AS BIGINT) AS max_flow
FROM cuts ORDER BY cut_mask"""


PCA_SCALE = 1000.0   # coarser than GRAM_SCALE: the iterates must fit HUGEINT
PCA_ITERS = 2        # x2 ≤ d²·G²·1e6 stays under 1.7e38 through sf≥1


def _q_pca_power(sf_dir: str):
    """Exact power-iteration top principal direction — PCA's first
    step run with ZERO float drift: the distributed integer-quantized
    Gram matrix (ann.gram_matrix — per-block d×d partials tree-merged,
    only 32 KB leaves each block) feeds PCA_ITERS unnormalized power
    steps x ← G·x in unbounded Python ints (the d×d driver math is the
    documented |V|-small allowance), then the direction is released as
    q_i = floor(1e6·±x_i / max|x|) with the sign fixed so the max-|x|
    entry (smallest dim on ties) is positive.  The scale/iteration
    pair is chosen so the SQL twin's HUGEINT matvec never overflows
    (bound in PCA_ITERS comment).  Convergence quality grows with
    iters; what is certified is the exact-arithmetic pipeline."""
    import ray.data as rd

    from essentials_rd.ann import gram_matrix

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["embedding"])
    g = gram_matrix(vecs, scale=PCA_SCALE)
    d = g.shape[0]
    G = [[int(v) for v in row] for row in g]
    x = [1] * d
    for _ in range(PCA_ITERS):
        x = [sum(G[i][j] * x[j] for j in range(d)) for i in range(d)]
    pi = min(range(d), key=lambda i: (-abs(x[i]), i))
    m = abs(x[pi])
    s = -1 if x[pi] < 0 else 1
    q = ([0] * d if m == 0
         else [(1_000_000 * s * x[i]) // m for i in range(d)])
    return pa.table({
        "dim": pa.array(np.arange(1, d + 1, dtype=np.int64), pa.int64()),
        "q": pa.array(q, pa.int64()),
    })


def _pca_power_sql() -> str:
    def fl(n: str, d: str) -> str:
        return (f"(({n}) - ((({n}) % ({d})) + ({d})) % ({d})) // ({d})")

    steps = [
        "pex AS MATERIALIZED (SELECT vec_id, j.j AS j, "
        "CAST(floor(CAST(embedding[j.j] AS DOUBLE) * "
        f"{PCA_SCALE}) AS BIGINT) AS q FROM embeddings, "
        "LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS j) j)",
        "pgm AS MATERIALIZED (SELECT a.j AS i, b.j AS j, "
        "CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS HUGEINT) AS g "
        "FROM pex a JOIN pex b ON a.vec_id = b.vec_id GROUP BY 1, 2)",
        "px0 AS (SELECT DISTINCT j AS i, CAST(1 AS HUGEINT) AS v "
        "FROM pex)",
    ]
    for k in range(PCA_ITERS):
        steps.append(
            f"px{k + 1} AS MATERIALIZED (SELECT g.i, sum(g.g * x.v) AS v "
            f"FROM pgm g JOIN px{k} x ON x.i = g.j GROUP BY 1)")
    last = f"px{PCA_ITERS}"
    body = ",".join(steps)
    return (
        f"WITH {body}, "
        f"ppick AS (SELECT i AS pi, v AS pv, abs(v) AS m FROM {last} "
        "ORDER BY abs(v) DESC, i LIMIT 1) "
        "SELECT CAST(x.i AS BIGINT) AS dim, "
        "CAST(COALESCE(" +
        fl("1000000 * (CASE WHEN p.pv < 0 THEN -x.v ELSE x.v END)",
           "NULLIF(p.m, 0)") +
        ", 0) AS BIGINT) AS q "
        f"FROM {last} x, ppick p ORDER BY dim"
    )


TRANK_K, TRANK_MIN = 10, 5


def _q_textrank(sf_dir: str):
    """TextRank keyword extraction (textops.textrank_tokens) — the
    Mihalcea-Tarau text→graph→PageRank composition run end to end on
    already-proven operators: bucketed bigram counts → support-≥5
    canonical-pair merge (both directions sum, no loops) → broadcast
    id map over the FILTERED vocabulary → the superstep
    weighted-PageRank engine → top-10 by 6-dp score, token
    tie-break."""
    import ray.data as rd

    from essentials_rd.textops import textrank_tokens

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return textrank_tokens(docs, k=TRANK_K, min_count=TRANK_MIN,
                           alpha=ALPHA, iters=PR_ITERS)


def _textrank_sql() -> str:
    steps = [
        "bgc AS MATERIALIZED (SELECT bg, CAST(count(*) AS BIGINT) AS co "
        "FROM (SELECT t[i.i] || ' ' || t[i.i + 1] AS bg FROM "
        "(SELECT string_split(text, ' ') AS t FROM documents) toks, "
        "LATERAL (SELECT unnest(range(1, len(t))) AS i) i) "
        f"GROUP BY bg HAVING count(*) >= {TRANK_MIN})",
        "sp AS (SELECT split_part(bg, ' ', 1) AS a, "
        "substr(bg, strpos(bg, ' ') + 1) AS b, co FROM bgc)",
        "ce AS MATERIALIZED (SELECT LEAST(a, b) AS u, "
        "GREATEST(a, b) AS v, CAST(sum(co) AS DOUBLE) AS w "
        "FROM sp WHERE a <> b GROUP BY 1, 2)",
        "tv AS MATERIALIZED (SELECT u AS tok FROM ce "
        "UNION SELECT v FROM ce)",
        "tn AS (SELECT count(*) AS n FROM tv)",
        "tsym AS MATERIALIZED (SELECT u AS src, v AS dst, w FROM ce "
        "UNION ALL SELECT v AS src, u AS dst, w FROM ce)",
        "twd AS MATERIALIZED (SELECT t.tok, "
        "COALESCE(sum(e.w), 0.0) AS wsum, count(e.src) AS outdeg "
        "FROM tv t LEFT JOIN tsym e ON e.src = t.tok GROUP BY 1)",
        "tp0 AS MATERIALIZED (SELECT tok, "
        "1.0/(SELECT n FROM tn) AS val FROM tv)",
    ]
    for k in range(PR_ITERS):
        steps.append(f"""
tagg{k} AS MATERIALIZED (
  SELECT e.dst AS tok, sum(p.val * e.w / d.wsum) AS s
  FROM tsym e JOIN tp{k} p ON p.tok = e.src JOIN twd d ON d.tok = e.src
  GROUP BY e.dst
),
tdang{k} AS MATERIALIZED (
  SELECT COALESCE(sum(p.val), 0.0) AS dm
  FROM tp{k} p JOIN twd d ON d.tok = p.tok WHERE d.outdeg = 0
),
tp{k + 1} AS MATERIALIZED (
  SELECT t.tok,
         (1.0 - {ALPHA})/(SELECT n FROM tn)
         + {ALPHA} * (COALESCE(a.s, 0.0)
                      + (SELECT dm FROM tdang{k})/(SELECT n FROM tn)) AS val
  FROM tv t LEFT JOIN tagg{k} a ON a.tok = t.tok
)""")
    body = ",".join(steps)
    return (
        f"WITH {body} "
        "SELECT tok AS token, pagerank FROM ("
        "SELECT tok, ROUND(val, 6) AS pagerank, row_number() OVER ("
        f"ORDER BY ROUND(val, 6) DESC, tok) AS rn FROM tp{PR_ITERS}) "
        f"WHERE rn <= {TRANK_K} ORDER BY pagerank DESC, token"
    )


DP_CAP = 3       # per-user contribution bound
DP_B = 20        # discrete-uniform noise half-width
DP_SEED = 29


def _q_dp_counts(sf_dir: str):
    """Differential-privacy-shaped count release — the contribution
    bounding → aggregate → noise → post-process pipeline every DP
    analytics system runs (the noise here is a DETERMINISTIC discrete
    uniform seeded by the category's alphabetical rank so the oracle
    can replay it; a deployment swaps in secure randomness — the
    certified part is the bounding/clamping arithmetic around it):
    per event type, each user's event count is capped at 3 (bounding
    the L1 sensitivity), capped counts sum, integer noise in
    [−20, 20] is added, and the release clamps at 0.  One
    user-bucketed exchange (per-user caps need the user's whole
    stream); the per-type fold is driver-small."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import _GOLDEN, hash64, np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def _partial(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        per = df.groupby(["user_id", "event_type"]).size()
        capped = per.clip(upper=DP_CAP)
        by_type = capped.groupby(level="event_type").agg(["sum", "count"])
        return pa.table({
            "event_type": pa.array(by_type.index.astype(str), pa.string()),
            "s": pa.array(by_type["sum"].to_numpy(np.int64), pa.int64()),
            "nu": pa.array(by_type["count"].to_numpy(np.int64), pa.int64()),
        })

    acc: dict[str, list[int]] = {}
    for r in hash_bucket_agg(
            ev, lambda b: np_col(b, "user_id"), _partial).take_all():
        a = acc.setdefault(r["event_type"], [0, 0])
        a[0] += r["s"]
        a[1] += r["nu"]
    keys = sorted(acc)
    ranks = np.arange(1, len(keys) + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = hash64(ranks + np.uint64((DP_SEED * 0x9E3779B97F4A7C15)
                                     % (1 << 64)))
    noise = (z % np.uint64(2 * DP_B + 1)).astype(np.int64) - DP_B
    s = np.array([acc[k][0] for k in keys], np.int64)
    return pa.table({
        "event_type": pa.array(keys, pa.string()),
        "n_users": pa.array([acc[k][1] for k in keys], pa.int64()),
        "sum_capped": pa.array(s, pa.int64()),
        "noisy_count": pa.array(np.maximum(0, s + noise), pa.int64()),
    })


def _dp_counts_sql() -> str:
    mix = (DP_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes("dpz", "event_type, s, nu", f"r + {mix}", "rk")
    return (
        "WITH per AS (SELECT user_id, event_type, count(*) AS c "
        "FROM events GROUP BY 1, 2), "
        "cap AS (SELECT event_type, "
        f"CAST(sum(LEAST(c, {DP_CAP})) AS BIGINT) AS s, "
        "CAST(count(*) AS BIGINT) AS nu FROM per GROUP BY 1), "
        "rk AS (SELECT event_type, s, nu, "
        "dense_rank() OVER (ORDER BY event_type) AS r FROM cap), "
        f"{chain} "
        "SELECT event_type, nu AS n_users, s AS sum_capped, "
        f"GREATEST(0, s + CAST(z % {2 * DP_B + 1} AS BIGINT) - {DP_B}) "
        "AS noisy_count "
        "FROM dpz3 ORDER BY 1"
    )


RMED_K = 5


def _q_rolling_median(sf_dir: str):
    """Per-user sliding 5-row LOWER MEDIAN over event value-cents —
    the holistic window aggregate no prefix-sum trick expresses
    (windows.rolling_window_median): per event the discrete median of
    its trailing window, exactly DuckDB's quantile_disc(0.5) pick at
    sorted index floor((w−1)/2), integer cents end to end.  One
    user-bucketed shuffle; per bucket a gathered (n × k) window
    matrix, one axis-1 sort and a per-row take at the window's own
    median index."""
    import pyarrow.compute as pc
    import ray.data as rd

    from essentials_rd.windows import rolling_window_median

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return t.drop_columns(["value"]).append_column("__cents__", c)

    return rolling_window_median(
        ev.map_batches(_cents, batch_format="pyarrow"), k=RMED_K)


def _rolling_median_sql() -> str:
    return (
        "SELECT event_id, "
        "CAST(quantile_disc(cents, 0.5) OVER w AS BIGINT) AS roll_median, "
        "CAST(count(*) OVER w AS BIGINT) AS roll_n "
        "FROM (SELECT event_id, user_id, ts, "
        "  CAST(floor(value * 100) AS BIGINT) AS cents FROM events) "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {RMED_K - 1} PRECEDING AND CURRENT ROW)"
    )


ALS_SEED = 11
ALS_LAMBDA = 1  # integer ridge term keeps every normal matrix nonsingular


def _q_als_step(sf_dir: str):
    """One exact ALS half-step — the alternating-least-squares
    recommender update (Koren/Hu-Koren-Volinsky shape): item factors
    are a PURE FUNCTION of the part key (two small ints from one
    splitmix64 draw, so no factor table is ever joined or shipped),
    and each order's rank-2 user factor solves the ridge normal
    equations (FᵀF + λI)x = Fᵀq EXACTLY by integer Cramer — det and
    numerators stay int64, the emitted factors are floor(1e6·n/det)
    via floor division, so the whole update is oracle-checkable with
    zero float drift.  Distribution: one order-bucketed sum combine
    (6 small int partials per row — the classic pre-aggregated
    normal-equation fold), then a stateless vectorized solve pass;
    nothing driver-side but the final table."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg
    from essentials_rd.util import _GOLDEN, hash64, np_col

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_quantity"])
    mix = np.uint64((ALS_SEED * 0x9E3779B97F4A7C15) % (1 << 64))

    def _proj(t: pa.Table) -> pa.Table:
        pk = np.asarray(t.column("l_partkey")).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = hash64(pk + mix)
        f1 = (z % np.uint64(7)).astype(np.int64) - 3
        f2 = ((z >> np.uint64(8)) % np.uint64(7)).astype(np.int64) - 3
        q = np.asarray(t.column("l_quantity")).astype(np.int64)
        return pa.table({
            "o": t.column("l_orderkey").cast(pa.int64()),
            "n1": pa.array(np.ones(len(q), np.int64)),
            "s11": pa.array(f1 * f1, pa.int64()),
            "s12": pa.array(f1 * f2, pa.int64()),
            "s22": pa.array(f2 * f2, pa.int64()),
            "b1": pa.array(q * f1, pa.int64()),
            "b2": pa.array(q * f2, pa.int64()),
        })

    agg = grouped_pandas_agg(
        li.map_batches(_proj, batch_format="pyarrow"),
        keys=["o"],
        aggs={"n_items": ("n1", "sum"), "s11": ("s11", "sum"),
              "s12": ("s12", "sum"), "s22": ("s22", "sum"),
              "b1": ("b1", "sum"), "b2": ("b2", "sum")})

    def _solve(t: pa.Table) -> pa.Table:
        a11 = np_col(t, "s11") + ALS_LAMBDA
        a22 = np_col(t, "s22") + ALS_LAMBDA
        a12 = np_col(t, "s12")
        b1 = np_col(t, "b1")
        b2 = np_col(t, "b2")
        det = a11 * a22 - a12 * a12  # > 0: A = FᵀF + λI is SPD
        q1 = (1_000_000 * (b1 * a22 - b2 * a12)) // det
        q2 = (1_000_000 * (b2 * a11 - b1 * a12)) // det
        return pa.table({
            "orderkey": t.column("o"),
            "n_items": t.column("n_items"),
            "q1": pa.array(q1, pa.int64()),
            "q2": pa.array(q2, pa.int64()),
        })

    rows = agg.map_batches(_solve, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["orderkey"])
    return pa.table({
        k: pa.array([r[k] for r in rows], pa.int64())
        for k in ("orderkey", "n_items", "q1", "q2")
    })


def _als_sql() -> str:
    mix = (ALS_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes("az", "l_orderkey, q", f"l_partkey + {mix}",
                       "(SELECT l_orderkey, l_partkey, "
                       "CAST(l_quantity AS BIGINT) AS q FROM lineitem)")
    # floor(n/d) for d > 0 with DuckDB's truncated %: subtract the
    # nonnegative remainder, then the division is exact
    def fl(n: str, d: str) -> str:
        return (f"(({n}) - ((({n}) % ({d})) + ({d})) % ({d})) // ({d})")

    lam = ALS_LAMBDA
    return (
        f"WITH {chain}, "
        "f AS (SELECT l_orderkey, q, "
        "CAST(z % 7 AS BIGINT) - 3 AS f1, "
        "CAST((z >> 8) % 7 AS BIGINT) - 3 AS f2 FROM az3), "
        "a AS (SELECT l_orderkey AS orderkey, "
        "CAST(count(*) AS BIGINT) AS n_items, "
        f"{lam} + sum(f1 * f1) AS a11, sum(f1 * f2) AS a12, "
        f"{lam} + sum(f2 * f2) AS a22, "
        "sum(q * f1) AS b1, sum(q * f2) AS b2 "
        "FROM f GROUP BY 1) "
        "SELECT orderkey, n_items, "
        f"CAST({fl('1000000 * (b1 * a22 - b2 * a12)', 'a11 * a22 - a12 * a12')} AS BIGINT) AS q1, "
        f"CAST({fl('1000000 * (b2 * a11 - b1 * a12)', 'a11 * a22 - a12 * a12')} AS BIGINT) AS q2 "
        "FROM a ORDER BY orderkey"
    )


# ---------------------------------------------- corpus growth statistics


def _q_heaps_vocab_curve(sf_dir: str):
    """Heaps'-law vocabulary-growth curve — the corpus statistic that
    sizes tokenizer vocabularies and dedup budgets: distinct tokens
    seen within the first N tokens of the global (doc_id, position)
    stream, at the 8 checkpoints N_k = ceil(k·C/8).  Distributed shape:
    per-doc token counts → ``ops.global_cumsum`` assigns each doc its
    exclusive global token offset (driver sees n_parts scalars); a
    second pass re-splits text and ships (token, global_pos) into a
    token-hash-bucketed min fold (sub-grouped by the actual token
    string, so hash collisions cannot merge words); per-block
    8-threshold partial counts of the first-occurrence positions then
    tree-sum — the vocabulary itself never reaches the driver."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import global_cumsum, hash_bucket_agg
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _count(t: pa.Table) -> pa.Table:
        s = t.column("text").to_pandas()
        n = s.str.split(" ").str.len().to_numpy(np.int64)
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "text": t.column("text"),
                         "n": pa.array(n, pa.int64())})

    with_pre = global_cumsum(
        docs.map_batches(_count, batch_format="pyarrow"),
        "doc_id", [], "n",
        lambda b: np_col(b, "doc_id").astype(np.int64),
        out_col="pre",
    ).materialize()
    total = int(with_pre.sum("n") or 0)

    def _flat(t: pa.Table) -> pa.Table:
        s = t.column("text").to_pandas()
        toks = s.str.split(" ")
        counts = toks.str.len().to_numpy(np.int64)
        flat = np.asarray([w for lst in toks for w in lst], dtype=object)
        pre = np.repeat(np_col(t, "pre"), counts)
        j = (np.arange(len(flat), dtype=np.int64)
             - np.repeat(np.cumsum(counts) - counts, counts))
        tok_arr = pa.array(flat.tolist(), pa.string())
        return pa.table({
            "khash": pa.array(_str_hash(tok_arr), pa.int64()),
            "tok": tok_arr,
            "gpos": pa.array(pre + j, pa.int64()),
        })

    def _first(grp: pa.Table) -> pa.Table:
        import pandas as pd

        code, _ = pd.factorize(grp.column("tok").combine_chunks().to_pandas())
        g = np_col(grp, "gpos")
        order = np.lexsort((g, code))
        c, gs = code[order], g[order]
        first = np.r_[True, c[1:] != c[:-1]] if len(c) else np.zeros(0, bool)
        return pa.table({"fp": pa.array(gs[first], pa.int64())})

    firsts = hash_bucket_agg(
        with_pre.map_batches(_flat, batch_format="pyarrow"),
        lambda b: np_col(b, "khash"),
        _first,
    )
    nks = np.array([(k * total + 7) // 8 for k in range(1, 9)], np.int64)

    def _partial(t: pa.Table) -> pa.Table:
        fp = np_col(t, "fp")
        v = (fp[:, None] < nks[None, :]).sum(axis=0).astype(np.int64)
        return pa.table({"k": pa.array(np.arange(1, 9), pa.int64()),
                         "v": pa.array(v, pa.int64())})

    vocab = np.zeros(8, np.int64)
    for r in firsts.map_batches(_partial, batch_format="pyarrow").take_all():
        vocab[r["k"] - 1] += r["v"]
    return pa.table({
        "k": pa.array(np.arange(1, 9), pa.int64()),
        "prefix_tokens": pa.array(nks, pa.int64()),
        "vocab": pa.array(vocab, pa.int64()),
    })


def _heaps_vocab_sql() -> str:
    return (
        "WITH c AS (SELECT doc_id, string_split(text, ' ') AS toks, "
        "len(string_split(text, ' ')) AS n FROM documents), "
        "p AS (SELECT doc_id, toks, COALESCE(SUM(n) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre "
        "FROM c), "
        "f AS (SELECT pre + generate_subscripts(toks, 1) - 1 AS gpos, "
        "unnest(toks) AS tok FROM p), "
        "firsts AS (SELECT tok, MIN(gpos) AS fp FROM f GROUP BY tok), "
        "tot AS (SELECT SUM(n) AS c FROM c), "
        "ks AS (SELECT unnest(range(1, 9)) AS k), "
        "nk AS (SELECT k, (k * (SELECT c FROM tot) + 7) // 8 AS nk FROM ks) "
        "SELECT CAST(k AS BIGINT) AS k, CAST(nk AS BIGINT) AS "
        "prefix_tokens, CAST((SELECT count(*) FROM firsts WHERE fp < "
        "nk.nk) AS BIGINT) AS vocab FROM nk ORDER BY k"
    )


def _q_token_collision_stats(sf_dir: str):
    """Per-language exact collision statistics of the token
    distribution — (Σc, distinct, Σc²) per lang: Σc² over token counts
    is the integer core of Simpson/Rényi-2 collision entropy
    (−ln Σp²), the dedup-pressure/diversity measure float entropy can
    only approximate.  One token-hash-bucketed exchange of per-batch
    pre-counted (lang, token, c) rows; in-bucket exact group-by-string
    counts; ≤ |langs| partial rows per bucket reach the driver."""
    import pandas as pd
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text", "lang"])

    def _flat(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["tok"] = df["text"].str.split(" ")
        df = df.drop(columns=["text"]).explode("tok")
        g = df.groupby(["lang", "tok"], sort=False).size().reset_index(name="c")
        tok_arr = pa.array(g["tok"].tolist(), pa.string())
        return pa.table({
            "khash": pa.array(_str_hash(tok_arr), pa.int64()),
            "lang": pa.array(g["lang"].tolist(), pa.string()),
            "tok": tok_arr,
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        })

    def _bucket(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        g = df.groupby(["lang", "tok"], sort=False)["c"].sum().reset_index()
        out = g.groupby("lang", sort=True).agg(
            n_tokens=("c", "sum"),
            n_distinct=("c", "size"),
            sum_c2=("c", lambda s: int((s.to_numpy(np.int64) ** 2).sum())),
        ).reset_index()
        return pa.table({
            "lang": pa.array(out["lang"].tolist(), pa.string()),
            "n_tokens": pa.array(out["n_tokens"].to_numpy(np.int64)),
            "n_distinct": pa.array(out["n_distinct"].to_numpy(np.int64)),
            "sum_c2": pa.array(out["sum_c2"].to_numpy(np.int64)),
        })

    parts = hash_bucket_agg(
        docs.map_batches(_flat, batch_format="pyarrow"),
        lambda b: np_col(b, "khash"),
        _bucket,
    ).take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["lang"], [0, 0, 0])
        a[0] += r["n_tokens"]
        a[1] += r["n_distinct"]
        a[2] += r["sum_c2"]
    langs = sorted(agg)
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_tokens": pa.array([agg[x][0] for x in langs], pa.int64()),
        "n_distinct": pa.array([agg[x][1] for x in langs], pa.int64()),
        "sum_c2": pa.array([agg[x][2] for x in langs], pa.int64()),
    })


def _token_collision_sql() -> str:
    return (
        "WITH f AS (SELECT lang, unnest(string_split(text, ' ')) AS tok "
        "FROM documents), "
        "c AS (SELECT lang, tok, count(*) AS c FROM f GROUP BY lang, tok) "
        "SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens, "
        "CAST(count(*) AS BIGINT) AS n_distinct, "
        "CAST(sum(c * c) AS BIGINT) AS sum_c2 "
        "FROM c GROUP BY lang ORDER BY lang"
    )


def _q_gap_log_histogram(sf_dir: str):
    """Log₂-bucketed histogram of per-user inter-event gaps (µs) — the
    HdrHistogram-style latency-distribution primitive: bucket =
    bit length of the gap (0 stays bucket 0), per bucket exact count /
    min / max / sum.  One user-bucketed exchange; gaps via in-bucket
    lexsort + diff on user runs; ≤ 64 partial rows per bucket reach
    the driver.  Bit length via ``np.frexp`` exponent — exact for any
    int64 gap (< 2⁵³ µs ≈ 285 years)."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col
    from essentials_rd.windows import _epoch_us

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def _mk(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "s": pa.array(_epoch_us(t, "ts"), pa.int64()),
            "event_id": t.column("event_id").cast(pa.int64()),
        })

    def _bucket(grp: pa.Table) -> pa.Table:
        u = np_col(grp, "user_id")
        s = np_col(grp, "s")
        e = np_col(grp, "event_id")
        order = np.lexsort((e, s, u))
        u, s = u[order], s[order]
        same = u[1:] == u[:-1] if len(u) else np.zeros(0, bool)
        gap = (s[1:] - s[:-1])[same]
        if not len(gap):
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_gaps": pa.array([], pa.int64()),
                             "min_gap": pa.array([], pa.int64()),
                             "max_gap": pa.array([], pa.int64()),
                             "sum_gap": pa.array([], pa.int64())})
        bl = np.where(gap == 0, 0, np.frexp(gap.astype(np.float64))[1])
        o2 = np.argsort(bl, kind="stable")
        blo, go = bl[o2], gap[o2]
        first = np.r_[True, blo[1:] != blo[:-1]]
        starts = np.flatnonzero(first)
        return pa.table({
            "bucket": pa.array(blo[starts], pa.int64()),
            "n_gaps": pa.array(np.diff(np.r_[starts, len(blo)]), pa.int64()),
            "min_gap": pa.array(np.minimum.reduceat(go, starts), pa.int64()),
            "max_gap": pa.array(np.maximum.reduceat(go, starts), pa.int64()),
            "sum_gap": pa.array(np.add.reduceat(go, starts), pa.int64()),
        })

    parts = hash_bucket_agg(
        ev.map_batches(_mk, batch_format="pyarrow"),
        lambda b: np_col(b, "user_id"),
        _bucket,
    ).take_all()
    agg: dict[int, list[int]] = {}
    for r in parts:
        a = agg.setdefault(int(r["bucket"]),
                           [0, 1 << 62, -(1 << 62), 0])
        a[0] += r["n_gaps"]
        a[1] = min(a[1], r["min_gap"])
        a[2] = max(a[2], r["max_gap"])
        a[3] += r["sum_gap"]
    bks = sorted(agg)
    return pa.table({
        "bucket": pa.array(bks, pa.int64()),
        "n_gaps": pa.array([agg[b][0] for b in bks], pa.int64()),
        "min_gap": pa.array([agg[b][1] for b in bks], pa.int64()),
        "max_gap": pa.array([agg[b][2] for b in bks], pa.int64()),
        "sum_gap": pa.array([agg[b][3] for b in bks], pa.int64()),
    })


def _gap_log_hist_sql() -> str:
    return (
        "WITH o AS (SELECT user_id, epoch_us(ts) AS s, event_id "
        "FROM events), "
        "l AS (SELECT user_id, s - lag(s) OVER (PARTITION BY user_id "
        "ORDER BY s, event_id) AS gap FROM o), "
        "g AS (SELECT gap FROM l WHERE gap IS NOT NULL), "
        "b AS (SELECT CASE WHEN gap = 0 THEN 0 ELSE length(bin(gap)) END "
        "AS bucket, gap FROM g) "
        "SELECT CAST(bucket AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_gaps, "
        "CAST(min(gap) AS BIGINT) AS min_gap, "
        "CAST(max(gap) AS BIGINT) AS max_gap, "
        "CAST(sum(gap) AS BIGINT) AS sum_gap "
        "FROM b GROUP BY bucket ORDER BY bucket"
    )


DV_PARTS = 8


def _q_orders_deletion_vectors(sf_dir: str):
    """Merge-on-read DELETE via deletion vectors (sinks.
    write_deletion_vectors / read_with_deletion_vectors — the
    Delta/Iceberg-v2 position-delete shape): orders land once as
    immutable hash-partitioned parquet; two delete commits then write
    only ROW-INDEX sidecars (commit 1: status 'F'; commit 2: cents
    ending in 3 — overlapping, proving commits stack and later commits
    see earlier deletes), and the scan unions the vectors per
    partition.  O(dead rows) per delete instead of a table rewrite —
    the only affordable DELETE at 100 TB.  Output: per-priority count +
    cents sum of the LIVE rows; re-running commit 2 is asserted a
    no-op (sidecar idempotence)."""
    import os as _os
    import shutil as _shutil

    import ray.data as rd

    from essentials_rd.sinks import (
        read_with_deletion_vectors, write_deletion_vectors,
        write_partitioned,
    )
    from essentials_rd.util import np_col

    base_dir = ("/tmp/essentials_rd_dv_"
                + _os.path.basename(_os.path.normpath(sf_dir)))
    _shutil.rmtree(base_dir, ignore_errors=True)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority",
                 "o_totalprice"],
    )

    def _proj(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_orderstatus": t.column("o_orderstatus"),
            "o_orderpriority": t.column("o_orderpriority"),
            "cents": pa.array(c, pa.int64()),
        })

    write_partitioned(orders.map_batches(_proj, batch_format="pyarrow"),
                      base_dir, lambda b: np_col(b, "o_orderkey"),
                      DV_PARTS)
    import pyarrow.compute as _pc

    write_deletion_vectors(
        base_dir, DV_PARTS,
        lambda t: np.asarray(
            _pc.equal(t.column("o_orderstatus"), "F").to_numpy(
                zero_copy_only=False)),
        commit=0,
    )
    r1 = write_deletion_vectors(
        base_dir, DV_PARTS,
        lambda t: np_col(t, "cents") % 10 == 3,
        commit=1,
    )
    # idempotence: replaying a committed delete touches nothing
    r2 = write_deletion_vectors(
        base_dir, DV_PARTS,
        lambda t: np_col(t, "cents") % 10 == 3,
        commit=1,
    )
    assert all(r["skipped"] for r in r2.to_pylist()) and not any(
        r["skipped"] for r in r1.to_pylist())

    live = read_with_deletion_vectors(base_dir, DV_PARTS)

    def _agg(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "cents": t.column("cents"),
        }).to_pandas()
        g = df.groupby("o_orderpriority", sort=True)["cents"].agg(
            ["size", "sum"]).reset_index()
        return pa.table({
            "o_orderpriority": pa.array(g["o_orderpriority"].tolist(),
                                        pa.string()),
            "n_live": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            "sum_cents": pa.array(g["sum"].to_numpy(np.int64), pa.int64()),
        })

    parts = live.map_batches(_agg, batch_format="pyarrow").take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["o_orderpriority"], [0, 0])
        a[0] += r["n_live"]
        a[1] += r["sum_cents"]
    ks = sorted(agg)
    return pa.table({
        "o_orderpriority": pa.array(ks, pa.string()),
        "n_live": pa.array([agg[k][0] for k in ks], pa.int64()),
        "sum_cents": pa.array([agg[k][1] for k in ks], pa.int64()),
    })


def _orders_dv_sql() -> str:
    return (
        "WITH o AS (SELECT o_orderpriority, o_orderstatus, "
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents "
        "FROM orders) "
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_live, "
        "CAST(sum(cents) AS BIGINT) AS sum_cents "
        "FROM o WHERE o_orderstatus <> 'F' AND cents % 10 <> 3 "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )


def _skyline2d(cents: np.ndarray, d: np.ndarray, keys: np.ndarray):
    """Indices of the 2-D skyline (minimize both; strict domination —
    duplicate points all survive).  Vectorized: sort by (cents, d,
    key), a point is dominated iff some strictly-smaller-cents point
    has d ≤ its d, or a same-cents point has strictly smaller d."""
    order = np.lexsort((keys, d, cents))
    c, dd = cents[order], d[order]
    # min d among STRICTLY smaller cents: running min at each cents-run
    # boundary (exclusive)
    run_start = np.r_[True, c[1:] != c[:-1]]
    run_min_d = dd[run_start]  # d is ascending within a cents run
    prev_best = np.minimum.accumulate(run_min_d)
    run_id = np.cumsum(run_start) - 1
    m1 = np.where(run_id > 0, prev_best[np.maximum(run_id - 1, 0)],
                  np.iinfo(np.int64).max)
    same_min = run_min_d[run_id]  # min d within this cents run
    keep = (m1 > dd) & (dd == same_min)
    return order[keep]


def _q_orders_skyline(sf_dir: str):
    """Skyline / Pareto-front operator (Börzsönyi 2001) over orders,
    minimizing (price cents, order date): the classic preference query
    missing from plain SQL aggregates.  Two-phase distributed shape:
    every block emits its LOCAL skyline (the global skyline is a subset
    of the union — domination is transitive), the tiny union reduces to
    the exact global front in one final task.  Strict domination;
    duplicate (cents, date) points all survive.  Oracle: window twin —
    a row lives iff no strictly-cheaper row is as-old-or-older and it
    holds its cents-group's date minimum."""
    import ray.data as rd

    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice",
                                      "o_orderdate"])

    def _proj(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        dt = t.column("o_orderdate").cast(pa.date32())
        days = np.asarray(dt.to_numpy(zero_copy_only=False),
                          "datetime64[D]").astype(np.int64)
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "cents": pa.array(c, pa.int64()),
            "days": pa.array(days, pa.int64()),
        })

    def _local(t: pa.Table) -> pa.Table:
        k = np_col(t, "o_orderkey")
        idx = _skyline2d(np_col(t, "cents"), np_col(t, "days"), k)
        return t.take(pa.array(np.sort(idx)))

    union = orders.map_batches(_proj, batch_format="pyarrow") \
                  .map_batches(_local, batch_format="pyarrow")
    rows = union.take_all()  # block skylines: tiny (O(log n) per block)
    k = np.asarray([r["o_orderkey"] for r in rows], np.int64)
    c = np.asarray([r["cents"] for r in rows], np.int64)
    d = np.asarray([r["days"] for r in rows], np.int64)
    idx = _skyline2d(c, d, k)
    o = idx[np.argsort(k[idx], kind="stable")]
    return pa.table({
        "o_orderkey": pa.array(k[o], pa.int64()),
        "cents": pa.array(c[o], pa.int64()),
        "days": pa.array(d[o], pa.int64()),
    })


def _orders_skyline_sql() -> str:
    return (
        "WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, "
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents, "
        "CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) "
        "AS days FROM orders), "
        "w AS (SELECT o_orderkey, cents, days, "
        "min(days) OVER (ORDER BY cents RANGE BETWEEN UNBOUNDED "
        "PRECEDING AND 1 PRECEDING) AS m1, "
        "min(days) OVER (PARTITION BY cents) AS same_min FROM o) "
        "SELECT o_orderkey, cents, days FROM w "
        "WHERE (m1 IS NULL OR m1 > days) AND days = same_min "
        "ORDER BY o_orderkey"
    )


BOOT_B = 200
BOOT_SEED = 11


def _q_bootstrap_median_ci(sf_dir: str):
    """Nonparametric bootstrap 95% CI for the median user spend —
    made hash-exact: the B resamples draw indices from the shared
    splitmix chain (pick_j^b = sm64(b·n + j + seed·golden) mod n over
    the user-id-ordered total array), every median is the
    quantile_disc sorted-value-at-ceil(qn)−1 rule, so engine and SQL
    replay byte-identical resamples — no RNG ambiguity, no float.
    Distributed fold to per-user totals (one bucketed exchange);
    the bootstrap itself runs over the ENTITY-level array (one row per
    user — the driver-small contract shared by the assignment/voting
    family).  Output: n_users, B, the point median and the
    (2.5%, 97.5%) bootstrap percentile bounds, all int64 cents."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import _GOLDEN, hash64, np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def _mk(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("value").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"user_id": t.column("user_id").cast(pa.int64()),
                         "cents": pa.array(c, pa.int64())})

    def _fold(grp: pa.Table) -> pa.Table:
        u = np_col(grp, "user_id")
        c = np_col(grp, "cents")
        order = np.argsort(u, kind="stable")
        u, c = u[order], c[order]
        first = np.r_[True, u[1:] != u[:-1]] if len(u) else np.zeros(0, bool)
        starts = np.flatnonzero(first)
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "total": pa.array(np.add.reduceat(c, starts), pa.int64()),
        })

    rows = hash_bucket_agg(
        ev.map_batches(_mk, batch_format="pyarrow"),
        lambda b: np_col(b, "user_id"),
        _fold,
    ).take_all()
    rows.sort(key=lambda r: r["user_id"])
    vals = np.asarray([r["total"] for r in rows], np.int64)
    n = len(vals)

    def _qd(sorted_v: np.ndarray, q: float) -> int:
        return int(sorted_v[int(np.ceil(q * len(sorted_v))) - 1])

    sv = np.sort(vals)
    point = _qd(sv, 0.5)
    with np.errstate(over="ignore"):
        keys = (np.arange(BOOT_B, dtype=np.uint64)[:, None]
                * np.uint64(n)
                + np.arange(n, dtype=np.uint64)[None, :]
                + np.uint64(BOOT_SEED) * _GOLDEN)
    picks = (hash64(keys.ravel()) % np.uint64(n)).astype(np.int64)
    res = np.sort(vals[picks].reshape(BOOT_B, n), axis=1)
    medians = res[:, int(np.ceil(0.5 * n)) - 1]
    sm = np.sort(medians)
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "n_resamples": pa.array([BOOT_B], pa.int64()),
        "median_cents": pa.array([point], pa.int64()),
        "ci_lo": pa.array([_qd(sm, 0.025)], pa.int64()),
        "ci_hi": pa.array([_qd(sm, 0.975)], pa.int64()),
    })


def _bootstrap_median_sql() -> str:
    mix = (BOOT_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    chain = _sm64_ctes(
        "bs", "b, j", f"b * (SELECT c FROM nn) + j + {mix}", "grid")
    return (
        "WITH u AS (SELECT user_id, "
        "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS total "
        "FROM events GROUP BY user_id), "
        "v AS (SELECT row_number() OVER (ORDER BY user_id) - 1 AS i, "
        "total FROM u), "
        "nn AS (SELECT count(*) AS c FROM v), "
        f"grid AS (SELECT b.b, j.j FROM (SELECT unnest(range({BOOT_B})) "
        "AS b) b, (SELECT unnest(range((SELECT c FROM nn))) AS j) j), "
        f"{chain}, "
        "r AS (SELECT bs3.b, v.total FROM bs3 JOIN v ON v.i = "
        "CAST(bs3.z % (SELECT c FROM nn) AS BIGINT)), "
        "rk AS (SELECT b, total, row_number() OVER (PARTITION BY b "
        "ORDER BY total) AS rn FROM r), "
        "med AS (SELECT b, total AS m FROM rk WHERE rn = "
        "CAST(ceil(0.5 * (SELECT c FROM nn)) AS BIGINT)), "
        "mrk AS (SELECT m, row_number() OVER (ORDER BY m) AS rn FROM med), "
        "pt AS (SELECT total AS m FROM (SELECT total, row_number() OVER "
        "(ORDER BY total) AS rn FROM v) WHERE rn = "
        "CAST(ceil(0.5 * (SELECT c FROM nn)) AS BIGINT)) "
        "SELECT CAST((SELECT c FROM nn) AS BIGINT) AS n_users, "
        f"CAST({BOOT_B} AS BIGINT) AS n_resamples, "
        "CAST((SELECT m FROM pt) AS BIGINT) AS median_cents, "
        "CAST((SELECT m FROM mrk WHERE rn = "
        f"CAST(ceil(0.025 * {BOOT_B}) AS BIGINT)) AS BIGINT) AS ci_lo, "
        "CAST((SELECT m FROM mrk WHERE rn = "
        f"CAST(ceil(0.975 * {BOOT_B}) AS BIGINT)) AS BIGINT) AS ci_hi"
    )


RANSAC_K = 64
RANSAC_T = 1000  # inlier: perpendicular distance ≤ T (dollar units)


def _q_ransac_qty_price(sf_dir: str):
    """RANSAC line fit (Fischler–Bolles 1981) over lineitem
    (quantity, floor-dollar price) — made hash-exact: trial t's two
    sample points are the rows with the SMALLEST sm64(key + t·golden)
    (min-hash sampling — fully distributed, no random access by
    index), and the inlier test is the integer perpendicular-distance
    comparison dist_num² ≤ T²·len² (cross products only, no sqrt, no
    float), so engine and SQL replay identical trials.  Best trial =
    max inliers, tie → smallest t.  Distributed shape: one pass for
    per-block top-2-per-trial partials (driver folds K×2×blocks
    rows), broadcast the 2K sample points, one stateless counting
    pass with per-block (trial, inliers) partials."""
    import ray.data as rd

    from essentials_rd.util import _GOLDEN, hash64, np_col

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_linenumber",
                                    "l_quantity", "l_extendedprice"])

    def _mk(t: pa.Table) -> pa.Table:
        x = np_col(t, "l_quantity").astype(np.int64)
        y = np.floor(np.asarray(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False),
            np.float64)).astype(np.int64)
        # (orderkey, linenumber) is NOT unique in the synthetic data —
        # fold (x, y) into the pick key so any residual key tie is
        # value-identical (either pick yields the same sample point)
        assert int(y.max(initial=0)) < (1 << 17)
        key = (((np_col(t, "l_orderkey").astype(np.int64) * 64
                 + np_col(t, "l_linenumber").astype(np.int64)) << 24)
               | (x << 17) | y)
        return pa.table({"key": pa.array(key, pa.int64()),
                         "x": pa.array(x, pa.int64()),
                         "y": pa.array(y, pa.int64())})

    pts = line.map_batches(_mk, batch_format="pyarrow").materialize()
    ts = np.arange(RANSAC_K, dtype=np.uint64)

    def _top2(t: pa.Table) -> pa.Table:
        key = np_col(t, "key").astype(np.uint64)
        out_t, out_z, out_k, out_x, out_y = [], [], [], [], []
        x = np_col(t, "x")
        y = np_col(t, "y")
        with np.errstate(over="ignore"):
            for tt in ts:
                z = hash64(key + tt * _GOLDEN)
                o = np.lexsort((key, z))[:2]
                out_t.extend([int(tt)] * len(o))
                out_z.extend(z[o].tolist())
                out_k.extend(key[o].tolist())
                out_x.extend(x[o].tolist())
                out_y.extend(y[o].tolist())
        return pa.table({
            "t": pa.array(out_t, pa.int64()),
            "z": pa.array(np.asarray(out_z, np.uint64).astype(np.int64),
                          pa.int64()),
            "key": pa.array(np.asarray(out_k, np.uint64).astype(np.int64),
                            pa.int64()),
            "x": pa.array(out_x, pa.int64()),
            "y": pa.array(out_y, pa.int64()),
        })

    part_rows = pts.map_batches(_top2, batch_format="pyarrow").take_all()
    mask64 = (1 << 64) - 1
    samples = np.zeros((RANSAC_K, 2, 3), np.int64)  # (x, y, key)
    for tt in range(RANSAC_K):
        rows = [r for r in part_rows if r["t"] == tt]
        rows.sort(key=lambda r: (r["z"] & mask64, r["key"] & mask64))
        for j in (0, 1):
            samples[tt, j] = (rows[j]["x"], rows[j]["y"], rows[j]["key"])
    import ray as _ray

    sref = _ray.put(samples)

    def _count(t: pa.Table) -> pa.Table:
        s = _ray.get(sref)
        x = np_col(t, "x").astype(np.int64)
        y = np_col(t, "y").astype(np.int64)
        cnt = np.zeros(RANSAC_K, np.int64)
        t2 = np.int64(RANSAC_T) * np.int64(RANSAC_T)
        for tt in range(RANSAC_K):
            x1, y1, _ = s[tt, 0]
            x2, y2, _ = s[tt, 1]
            dx, dy = x2 - x1, y2 - y1
            num = dx * (y1 - y) - (x1 - x) * dy
            cnt[tt] = int((num * num <= t2 * (dx * dx + dy * dy)).sum())
        return pa.table({"t": pa.array(np.arange(RANSAC_K), pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    totals = np.zeros(RANSAC_K, np.int64)
    for r in pts.map_batches(_count, batch_format="pyarrow").take_all():
        totals[r["t"]] += r["n"]
    best = int(np.lexsort((np.arange(RANSAC_K), -totals))[0])
    return pa.table({
        "trial": pa.array([best], pa.int64()),
        "inliers": pa.array([int(totals[best])], pa.int64()),
        "x1": pa.array([int(samples[best, 0, 0])], pa.int64()),
        "y1": pa.array([int(samples[best, 0, 1])], pa.int64()),
        "x2": pa.array([int(samples[best, 1, 0])], pa.int64()),
        "y2": pa.array([int(samples[best, 1, 1])], pa.int64()),
    })


def _ransac_sql() -> str:
    golden = 0x9E3779B97F4A7C15
    chain = _sm64_ctes("rs", "t, key, x, y",
                       f"key + t * {golden}", "grid")
    t2 = RANSAC_T * RANSAC_T
    return (
        "WITH p0 AS (SELECT CAST(l_quantity AS BIGINT) AS x, "
        "CAST(floor(l_extendedprice) AS BIGINT) AS y, "
        "CAST(l_orderkey AS BIGINT) AS ok, "
        "CAST(l_linenumber AS BIGINT) AS ln FROM lineitem), "
        "pts AS (SELECT (ok * 64 + ln) * 16777216 + x * 131072 + y "
        "AS key, x, y FROM p0), "
        f"trials AS (SELECT unnest(range({RANSAC_K})) AS t), "
        "grid AS (SELECT t, key, x, y FROM trials, pts), "
        f"{chain}, "
        "rk AS (SELECT t, key, x, y, row_number() OVER (PARTITION BY t "
        "ORDER BY z, CAST(key AS UBIGINT)) AS rn FROM rs3), "
        "p1 AS (SELECT t, x AS x1, y AS y1 FROM rk WHERE rn = 1), "
        "p2 AS (SELECT t, x AS x2, y AS y2 FROM rk WHERE rn = 2), "
        "ln AS (SELECT p1.t, x1, y1, x2, y2, x2 - x1 AS dx, "
        "y2 - y1 AS dy FROM p1 JOIN p2 USING (t)), "
        "cn AS (SELECT ln.t, x1, y1, x2, y2, CAST(SUM(CASE WHEN "
        "CAST(dx * (y1 - p.y) - (x1 - p.x) * dy AS HUGEINT) * "
        "CAST(dx * (y1 - p.y) - (x1 - p.x) * dy AS HUGEINT) <= "
        f"CAST({t2} AS HUGEINT) * (dx * dx + dy * dy) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS inliers "
        "FROM ln, pts p GROUP BY ln.t, x1, y1, x2, y2) "
        "SELECT CAST(t AS BIGINT) AS trial, inliers, x1, y1, x2, y2 "
        "FROM cn ORDER BY inliers DESC, t LIMIT 1"
    )


TDU_W = 7  # trailing window, days


def _q_trailing_distinct_users(sf_dir: str):
    """EXACT trailing-7-day COUNT(DISTINCT user) per active day in
    LINEAR work — the sliding-window dedup a naive per-day recount
    makes O(days·events): a user's event on day d is the window's
    first-in-window occurrence for exactly the days
    D ∈ [max(d, prev+W), d+W−1] (prev = that user's previous event
    day), so each (user, day) pair contributes one INTERVAL of days;
    summing interval starts/ends as a diff array gives every day's
    distinct count in one pass.  Distributed: user-bucketed exchange
    computes per-(user, day) prev-day lags and emits ±1 boundary rows;
    one day-bucketed sum + a global cumsum over the (small) day axis.
    The oracle is INDEPENDENT (a brute per-day range join + COUNT
    DISTINCT), not a replay of the same identity."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col
    from essentials_rd.windows import _epoch_us

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def _mk(t: pa.Table) -> pa.Table:
        d = _epoch_us(t, "ts") // 86_400_000_000
        return pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "day": pa.array(d.astype(np.int64), pa.int64()),
        })

    def _bounds(grp: pa.Table) -> pa.Table:
        u = np_col(grp, "user_id")
        d = np_col(grp, "day")
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])] \
            if len(u) else np.zeros(0, bool)
        u, d = u[keep], d[keep]
        same = np.r_[False, u[1:] == u[:-1]] if len(u) else np.zeros(0, bool)
        prev = np.where(same, np.r_[np.int64(0), d[:-1]],
                        np.int64(-(1 << 40)))
        lo = np.maximum(d, prev + TDU_W)
        hi = d + TDU_W  # exclusive
        ok = lo < hi
        days = np.concatenate([lo[ok], hi[ok]])
        delta = np.concatenate([np.ones(int(ok.sum()), np.int64),
                                -np.ones(int(ok.sum()), np.int64)])
        return pa.table({"day": pa.array(days, pa.int64()),
                         "delta": pa.array(delta, pa.int64())})

    deltas = hash_bucket_agg(
        ev.map_batches(_mk, batch_format="pyarrow"),
        lambda b: np_col(b, "user_id"),
        _bounds,
    )

    def _sum_day(grp: pa.Table) -> pa.Table:
        d = np_col(grp, "day")
        v = np_col(grp, "delta")
        order = np.argsort(d, kind="stable")
        d, v = d[order], v[order]
        first = np.r_[True, d[1:] != d[:-1]] if len(d) else np.zeros(0, bool)
        starts = np.flatnonzero(first)
        return pa.table({
            "day": pa.array(d[starts], pa.int64()),
            "delta": pa.array(np.add.reduceat(v, starts), pa.int64()),
        })

    rows = hash_bucket_agg(
        deltas, lambda b: np_col(b, "day"), _sum_day
    ).take_all()
    rows.sort(key=lambda r: r["day"])
    day = np.asarray([r["day"] for r in rows], np.int64)
    run = np.cumsum(np.asarray([r["delta"] for r in rows], np.int64))
    # piecewise-constant between boundary days; emit only days with ≥1
    # event in their window, clipped to the observed day span (the
    # window would otherwise extend W−1 days past the last event)
    if len(day):
        max_event_day = day[-1] - TDU_W  # last boundary is max(d) + W
        full = np.arange(day[0], max_event_day + 1)
        idx = np.searchsorted(day, full, side="right") - 1
        vals = run[idx]
        keep = vals > 0
        full, vals = full[keep], vals[keep]
    else:
        full = np.zeros(0, np.int64)
        vals = np.zeros(0, np.int64)
    return pa.table({"day": pa.array(full, pa.int64()),
                     "n_users": pa.array(vals, pa.int64())})


def _trailing_distinct_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, "
        "epoch_us(ts) // 86400000000 AS day FROM events), "
        "days AS (SELECT unnest(range((SELECT min(day) FROM e), "
        "(SELECT max(day) FROM e) + 1)) AS day) "
        "SELECT d.day, CAST(count(DISTINCT e.user_id) AS BIGINT) "
        "AS n_users FROM days d JOIN e ON e.day BETWEEN d.day - "
        f"{TDU_W - 1} AND d.day "
        "GROUP BY d.day ORDER BY d.day"
    )


TRIPLE_MIN_SUPPORT = 2


def _q_frequent_triples(sf_dir: str):
    """Apriori 3-itemsets (Agrawal–Srikant 1994) over order baskets:
    part triples co-purchased in ≥ ``TRIPLE_MIN_SUPPORT`` orders — the
    market-basket step past the pairwise copurchase graph.  Distributed
    shape: the distinct (order, part) rows are already orderkey-
    bucketed (``pipelines.copurchase_items``); each bucket expands its
    complete baskets into canonical p1<p2<p3 triples with a
    size-indexed combination table (one vectorized take per basket
    size, no per-order Python loop), and a triple-hash-bucketed count
    applies the support threshold.  A basket-size cap guards the
    C(n,3) blowup — an over-cap basket raises loudly (raise the cap
    consciously at scale) rather than skewing support silently."""
    import itertools

    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.pipelines import copurchase_items
    from essentials_rd.util import hash64, np_col

    items = copurchase_items(sf_dir)
    cap = 64

    combo_cache: dict[int, np.ndarray] = {}

    def _combos(s: int) -> np.ndarray:
        c = combo_cache.get(s)
        if c is None:
            c = np.asarray(list(itertools.combinations(range(s), 3)),
                           np.int64).reshape(-1, 3)
            combo_cache[s] = c
        return c

    def _expand(grp: pa.Table) -> pa.Table:
        ok = np_col(grp, "l_orderkey")
        pk = np_col(grp, "l_partkey")
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        first = np.r_[True, ok[1:] != ok[:-1]] if len(ok) else np.zeros(0, bool)
        starts = np.flatnonzero(first)
        sizes = np.diff(np.r_[starts, len(ok)])
        if len(sizes) and int(sizes.max()) > cap:
            raise ValueError(
                f"basket of {int(sizes.max())} items exceeds the C(n,3) "
                f"cap {cap}; raise it consciously")
        outs = []
        for s in np.unique(sizes):
            if s < 3:
                continue
            sel = starts[sizes == s]
            idx = (sel[:, None, None]
                   + _combos(int(s))[None, :, :]).reshape(-1, 3)
            outs.append(pk[idx])
        tri = (np.concatenate(outs) if outs
               else np.zeros((0, 3), np.int64))
        return pa.table({
            "p1": pa.array(tri[:, 0], pa.int64()),
            "p2": pa.array(tri[:, 1], pa.int64()),
            "p3": pa.array(tri[:, 2], pa.int64()),
        })

    def _tri_key(b: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            k = (np_col(b, "p1").astype(np.uint64) * np.uint64(1_000_003)
                 + np_col(b, "p2").astype(np.uint64)) * np.uint64(1_000_003) \
                + np_col(b, "p3").astype(np.uint64)
        return hash64(k).astype(np.int64)

    def _count(grp: pa.Table) -> pa.Table:
        a = np_col(grp, "p1")
        b = np_col(grp, "p2")
        c = np_col(grp, "p3")
        order = np.lexsort((c, b, a))
        a, b, c = a[order], b[order], c[order]
        first = (np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])
                       | (c[1:] != c[:-1])]
                 if len(a) else np.zeros(0, bool))
        starts = np.flatnonzero(first)
        n = np.diff(np.r_[starts, len(a)])
        keep = n >= TRIPLE_MIN_SUPPORT
        return pa.table({
            "p1": pa.array(a[starts][keep], pa.int64()),
            "p2": pa.array(b[starts][keep], pa.int64()),
            "p3": pa.array(c[starts][keep], pa.int64()),
            "support": pa.array(n[keep], pa.int64()),
        })

    triples = hash_bucket_agg(
        items, lambda b: np_col(b, "l_orderkey"), _expand
    )
    rows = hash_bucket_agg(triples, _tri_key, _count).take_all()
    rows.sort(key=lambda r: (r["p1"], r["p2"], r["p3"]))
    return pa.table({
        "p1": pa.array([r["p1"] for r in rows], pa.int64()),
        "p2": pa.array([r["p2"] for r in rows], pa.int64()),
        "p3": pa.array([r["p3"] for r in rows], pa.int64()),
        "support": pa.array([r["support"] for r in rows], pa.int64()),
    })


def _frequent_triples_sql() -> str:
    return (
        "WITH b AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS o, "
        "CAST(l_partkey AS BIGINT) AS p FROM lineitem), "
        "sz AS (SELECT o FROM b GROUP BY o "
        "HAVING count(*) BETWEEN 3 AND 64), "
        "t AS (SELECT x.p AS p1, y.p AS p2, z.p AS p3 "
        "FROM b x JOIN b y ON y.o = x.o AND y.p > x.p "
        "JOIN b z ON z.o = x.o AND z.p > y.p "
        "JOIN sz ON sz.o = x.o) "
        "SELECT p1, p2, p3, CAST(count(*) AS BIGINT) AS support "
        "FROM t GROUP BY p1, p2, p3 "
        f"HAVING count(*) >= {TRIPLE_MIN_SUPPORT} "
        "ORDER BY p1, p2, p3"
    )


def _q_bucket_skew_report(sf_dir: str):
    """Engine introspection as a query: the row-count layout the
    standard 64-bucket exchange (``ops.hash_bucket_agg``'s
    ``hash64(key) % 64``) produces for the events/user_id key, plus
    the exact Gini concentration of those counts in ppm — the skew
    diagnostic that decides when a key needs salting.  The SQL twin
    replays the splitmix bucket assignment via the shared chain, so a
    hash-match certifies the EXCHANGE LAYER itself (the primitive under
    every bucketed operator in this engine) against an independent
    implementation.  Empty buckets are emitted (skew you cannot see is
    skew you cannot fix)."""
    import ray.data as rd

    from essentials_rd.util import hash64, np_col

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    nb = 64

    def _partial(t: pa.Table) -> pa.Table:
        b = (hash64(np_col(t, "user_id").astype(np.int64))
             % np.uint64(nb)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(np.arange(nb), pa.int64()),
            "n_rows": pa.array(np.bincount(b, minlength=nb), pa.int64()),
        })

    counts = np.zeros(nb, np.int64)
    for r in ev.map_batches(_partial, batch_format="pyarrow").take_all():
        counts[r["bucket"]] += r["n_rows"]
    total = int(counts.sum())
    diff_sum = int(np.abs(counts[:, None] - counts[None, :]).sum())
    gini_ppm = (1_000_000 * diff_sum) // (2 * nb * total) if total else 0
    return pa.table({
        "bucket": pa.array(np.arange(nb), pa.int64()),
        "n_rows": pa.array(counts, pa.int64()),
        "gini_ppm": pa.array(np.full(nb, gini_ppm), pa.int64()),
    })


def _bucket_skew_sql() -> str:
    chain = _sm64_ctes("bk", "user_id", "user_id", "events")
    return (
        f"WITH {chain}, "
        "asg AS (SELECT CAST(z % 64 AS BIGINT) AS bucket FROM bk3), "
        "bs AS (SELECT b.bucket, CAST(COALESCE(c.n, 0) AS BIGINT) AS "
        "n_rows FROM (SELECT unnest(range(64)) AS bucket) b LEFT JOIN "
        "(SELECT bucket, count(*) AS n FROM asg GROUP BY bucket) c "
        "USING (bucket)), "
        "g AS (SELECT CAST(SUM(abs(a.n_rows - b.n_rows)) AS BIGINT) AS "
        "ds, (SELECT SUM(n_rows) FROM bs) AS tot FROM bs a, bs b) "
        "SELECT bs.bucket, bs.n_rows, "
        "CAST((1000000 * g.ds) // (2 * 64 * g.tot) AS BIGINT) AS "
        "gini_ppm FROM bs, g ORDER BY bs.bucket"
    )


KN_MIN_COUNT = 5


def _q_kneser_ney_counts(sf_dir: str):
    """The integer core of Kneser–Ney smoothing (Kneser & Ney 1995) —
    the count tables every interpolated-KN language model is built
    from, over the corpus's within-document bigrams: per token w with
    unigram count ≥ KN_MIN_COUNT, (c(w), N1+(·w) = distinct left
    contexts, N1+(w·) = distinct right contexts), plus the corpus
    bigram-type total every continuation probability divides by
    (carried on every row).  KN's insight is exactly that N1+(·w)/types
    replaces c(w)/total for backoff mass — these integers ARE the
    model.  One bucketed exchange of per-batch pre-counted bigrams;
    distinct-context counting in-bucket by token string."""
    import pandas as pd
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def _bigrams(t: pa.Table) -> pa.Table:
        s = t.column("text").to_pandas()
        toks = s.str.split(" ")
        lefts, rights = [], []
        for lst in toks:
            lefts.extend(lst[:-1])
            rights.extend(lst[1:])
        df = pd.DataFrame({"l": lefts, "r": rights})
        g = df.groupby(["l", "r"], sort=False).size().reset_index(name="c")
        l_arr = pa.array(g["l"].tolist(), pa.string())
        return pa.table({
            "khash": pa.array(_str_hash(l_arr), pa.int64()),
            "l": l_arr,
            "r": pa.array(g["r"].tolist(), pa.string()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
        })

    # bucket by LEFT token: a bucket owns each left token's complete
    # bigram row set → exact c(l·), N1+(l·); emit the mirrored rows
    # for the right-token stats in the same pass
    def _bucket(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        g = df.groupby(["l", "r"], sort=False)["c"].sum().reset_index()
        left = g.groupby("l", sort=False).agg(
            c_out=("c", "sum"), n_right=("r", "size")).reset_index()
        return pa.table({
            "token": pa.array(left["l"].tolist(), pa.string()),
            "c_out": pa.array(left["c_out"].to_numpy(np.int64)),
            "n_right": pa.array(left["n_right"].to_numpy(np.int64)),
        })

    lefts = hash_bucket_agg(
        docs.map_batches(_bigrams, batch_format="pyarrow"),
        lambda b: np_col(b, "khash"),
        _bucket,
    )

    # same exchange keyed by RIGHT token for c(·w), N1+(·w)
    def _rekey(t: pa.Table) -> pa.Table:
        r_arr = t.column("r")
        return pa.table({
            "khash": pa.array(_str_hash(r_arr.combine_chunks()), pa.int64()),
            "l": t.column("l"),
            "r": r_arr,
            "c": t.column("c"),
        })

    def _bucket_r(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        g = df.groupby(["l", "r"], sort=False)["c"].sum().reset_index()
        right = g.groupby("r", sort=False).agg(
            c_in=("c", "sum"), n_left=("l", "size")).reset_index()
        return pa.table({
            "token": pa.array(right["r"].tolist(), pa.string()),
            "c_in": pa.array(right["c_in"].to_numpy(np.int64)),
            "n_left": pa.array(right["n_left"].to_numpy(np.int64)),
        })

    rights = hash_bucket_agg(
        docs.map_batches(_bigrams, batch_format="pyarrow")
        .map_batches(_rekey, batch_format="pyarrow"),
        lambda b: np_col(b, "khash"),
        _bucket_r,
    )

    # one token-hash-bucketed merge of the two stat sides; the
    # ≥-threshold filter runs IN the bucket, so only surviving tokens
    # (not the vocabulary) ever reach the driver
    bigram_types = int(lefts.sum("n_right") or 0)

    def _pad(t: pa.Table, side: int) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        tok = t.column("token")
        cols = {
            "khash": pa.array(_str_hash(tok.combine_chunks()), pa.int64()),
            "token": tok,
            "c_out": t.column("c_out") if side == 0 else pa.array(z),
            "n_right": t.column("n_right") if side == 0 else pa.array(z),
            "c_in": t.column("c_in") if side == 1 else pa.array(z),
            "n_left": t.column("n_left") if side == 1 else pa.array(z),
        }
        return pa.table(cols)

    both = lefts.map_batches(
        lambda t: _pad(t, 0), batch_format="pyarrow"
    ).union(rights.map_batches(
        lambda t: _pad(t, 1), batch_format="pyarrow"))

    def _merge(grp: pa.Table) -> pa.Table:
        df = grp.drop_columns(["khash"]).to_pandas()
        g = df.groupby("token", sort=True).sum().reset_index()
        g = g[(g["c_out"] + g["c_in"]) >= 2 * KN_MIN_COUNT]
        return pa.table({
            "token": pa.array(g["token"].tolist(), pa.string()),
            "c_out": pa.array(g["c_out"].to_numpy(np.int64), pa.int64()),
            "c_in": pa.array(g["c_in"].to_numpy(np.int64), pa.int64()),
            "n_right": pa.array(g["n_right"].to_numpy(np.int64), pa.int64()),
            "n_left": pa.array(g["n_left"].to_numpy(np.int64), pa.int64()),
        })

    rows = hash_bucket_agg(
        both, lambda b: np_col(b, "khash"), _merge
    ).take_all()
    rows.sort(key=lambda r: r["token"])
    return pa.table({
        "token": pa.array([r["token"] for r in rows], pa.string()),
        "c_out": pa.array([r["c_out"] for r in rows], pa.int64()),
        "c_in": pa.array([r["c_in"] for r in rows], pa.int64()),
        "n_right": pa.array([r["n_right"] for r in rows], pa.int64()),
        "n_left": pa.array([r["n_left"] for r in rows], pa.int64()),
        "bigram_types": pa.array(
            np.full(len(rows), bigram_types, np.int64), pa.int64()),
    })


def _kneser_ney_sql() -> str:
    return (
        "WITH f AS (SELECT string_split(text, ' ') AS toks "
        "FROM documents), "
        "bg AS (SELECT toks[j] AS l, toks[j + 1] AS r, count(*) AS c "
        "FROM (SELECT toks, unnest(range(1, len(toks))) AS j FROM f) "
        "GROUP BY l, r), "
        "lf AS (SELECT l AS token, SUM(c) AS c_out, count(*) AS n_right "
        "FROM bg GROUP BY l), "
        "rf AS (SELECT r AS token, SUM(c) AS c_in, count(*) AS n_left "
        "FROM bg GROUP BY r), "
        "bt AS (SELECT count(*) AS t FROM bg), "
        "m AS (SELECT COALESCE(lf.token, rf.token) AS token, "
        "COALESCE(c_out, 0) AS c_out, COALESCE(c_in, 0) AS c_in, "
        "COALESCE(n_right, 0) AS n_right, COALESCE(n_left, 0) AS n_left "
        "FROM lf FULL OUTER JOIN rf ON lf.token = rf.token) "
        "SELECT token, CAST(c_out AS BIGINT) AS c_out, "
        "CAST(c_in AS BIGINT) AS c_in, "
        "CAST(n_right AS BIGINT) AS n_right, "
        "CAST(n_left AS BIGINT) AS n_left, "
        "CAST((SELECT t FROM bt) AS BIGINT) AS bigram_types "
        f"FROM m WHERE c_out + c_in >= {2 * KN_MIN_COUNT} "
        "ORDER BY token"
    )


BLOOM_AUDIT_BITS = 4096
BLOOM_AUDIT_K = 6
BLOOM_AUDIT_PROBES = 2000


def _q_bloom_fp_audit(sf_dir: str):
    """Bloom-filter false-positive AUDIT: build the engine's real
    Kirsch–Mitzenmacher double-hash bloom (``ops._bloom_positions`` —
    the exact bit layout ``bloom_join`` and the partition sidecars
    ship) over the distinct orderkeys, probe it with keys provably
    outside the set (max+1 … max+P), and report the exact
    false-positive count.  The SQL twin replays h1 = sm64(key),
    h2 = sm64(h1)|1, g_i = h1 + i·h2 mod m bit for bit — a hash match
    certifies the engine's bloom LAYER against an independent
    implementation (an FP-rate audit is also what a 100-TB operator
    runs before trusting a selective-join filter).  Per-block partial
    bitmaps OR-fold driver-side (m/8 bytes each); probes run
    distributed against the broadcast bitmap."""
    import ray
    import ray.data as rd

    from essentials_rd.ops import _bloom_positions
    from essentials_rd.util import np_col

    k, m = BLOOM_AUDIT_K, BLOOM_AUDIT_BITS
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    from essentials_rd.util import hash64

    def _words(t: pa.Table) -> pa.Table:
        h = hash64(np_col(t, "o_orderkey").astype(np.int64))
        pos = _bloom_positions(h, k, m).ravel()
        w = np.zeros(m // 64, np.uint64)
        np.bitwise_or.at(w, pos >> 6,
                         np.uint64(1) << (pos & 63).astype(np.uint64))
        return pa.table({"i": pa.array(np.arange(m // 64), pa.int64()),
                         "w": pa.array(w.astype(np.int64), pa.int64())})

    words = np.zeros(m // 64, np.uint64)
    for r in orders.map_batches(_words, batch_format="pyarrow").take_all():
        words[r["i"]] |= np.uint64(r["w"] & ((1 << 64) - 1))
    max_key = int(orders.max("o_orderkey") or 0)
    wref = ray.put(words)

    probes = rd.range(BLOOM_AUDIT_PROBES)

    def _probe(t: pa.Table) -> pa.Table:
        w = ray.get(wref)
        key = np_col(t, "id").astype(np.int64) + max_key + 1
        h = hash64(key)
        pos = _bloom_positions(h, k, m)
        hit = (w[pos >> 6] >> (pos & 63).astype(np.uint64)) \
            & np.uint64(1)
        fp = (hit.astype(np.int64).sum(axis=1) == k)
        return pa.table({"n_fp": pa.array([int(fp.sum())], pa.int64())})

    n_fp = int(probes.map_batches(_probe, batch_format="pyarrow")
               .sum("n_fp") or 0)
    return pa.table({
        "n_bits": pa.array([m], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "n_probes": pa.array([BLOOM_AUDIT_PROBES], pa.int64()),
        "n_set_bits": pa.array(
            [int(np.unpackbits(words.view(np.uint8)).sum())], pa.int64()),
        "n_fp": pa.array([n_fp], pa.int64()),
    })


def _bloom_fp_sql() -> str:
    k, m = BLOOM_AUDIT_K, BLOOM_AUDIT_BITS
    c1 = _sm64_ctes("h1", "o_orderkey", "o_orderkey",
                    "(SELECT DISTINCT o_orderkey FROM orders)")
    c2 = _sm64_ctes("h2", "o_orderkey, h1z", "h1z", "hh1")
    p1 = _sm64_ctes("p1", "pk", "pk", "probes")
    p2 = _sm64_ctes("p2", "pk, p1z", "p1z", "pp1")
    return (
        f"WITH {c1}, "
        "hh1 AS (SELECT o_orderkey, z AS h1z FROM h13), "
        f"{c2}, "
        "ins AS (SELECT o_orderkey, h1z AS h1, "
        "CAST(z | 1 AS UBIGINT) AS h2 FROM h23), "
        f"ks AS (SELECT unnest(range({k})) AS i), "
        "bits AS (SELECT DISTINCT CAST((CAST(h1 AS HUGEINT) + i * h2) % "
        f"{m} AS BIGINT) AS pos FROM ins, ks), "
        "probes AS (SELECT (SELECT max(o_orderkey) FROM orders) + 1 + "
        f"unnest(range({BLOOM_AUDIT_PROBES})) AS pk), "
        f"{p1}, "
        "pp1 AS (SELECT pk, z AS p1z FROM p13), "
        f"{p2}, "
        "pr AS (SELECT pk, p1z AS h1, CAST(z | 1 AS UBIGINT) AS h2 "
        "FROM p23), "
        "ppos AS (SELECT pk, i, CAST((CAST(h1 AS HUGEINT) + i * h2) % "
        f"{m} AS BIGINT) AS pos FROM pr, ks), "
        "hitc AS (SELECT pk, count(*) AS nhit FROM ppos "
        "JOIN bits USING (pos) GROUP BY pk) "
        f"SELECT CAST({m} AS BIGINT) AS n_bits, "
        f"CAST({k} AS BIGINT) AS k, "
        f"CAST({BLOOM_AUDIT_PROBES} AS BIGINT) AS n_probes, "
        "CAST((SELECT count(*) FROM bits) AS BIGINT) AS n_set_bits, "
        f"CAST((SELECT count(*) FROM hitc WHERE nhit = {k}) AS BIGINT) "
        "AS n_fp"
    )


RS_PROBES = 64
RS_SEED = 23


def _q_rank_select_audit(sf_dir: str):
    """Succinct-bitvector rank/select over the urgency bitvector
    (orders ordered by orderkey, bit = priority '1-URGENT') — the two
    primitives every FM-index / wavelet-tree / succinct structure
    reduces to: rank(p) = set bits in [0, p), select(q) = position of
    the q-th set bit.  Distributed: TWO ``ops.global_cumsum`` passes
    (positions from a cumsum of ones, rank-before from a cumsum of
    bits; driver sees n_parts scalars each), probe positions/ordinals
    drawn from the shared splitmix chain, answers read by filtering
    the cumsum output against the broadcast probe set — no driver scan
    of the vector.  The SQL twin replays both cumsums as windows."""
    import ray.data as rd

    from essentials_rd.ops import global_cumsum
    from essentials_rd.util import _GOLDEN, hash64, np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def _mk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        bit = _pc.equal(t.column("o_orderpriority"), "1-URGENT")
        return pa.table({
            "key": t.column("o_orderkey").cast(pa.int64()),
            "bit": pa.array(np.asarray(
                bit.to_numpy(zero_copy_only=False), np.int64), pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        })

    base = orders.map_batches(_mk, batch_format="pyarrow")
    kf = lambda b: np_col(b, "key")
    with_pos = global_cumsum(base, "key", [], "one", kf, out_col="pos")
    full = global_cumsum(with_pos, "key", [], "bit", kf,
                         out_col="rank_before").materialize()
    n = full.count()
    n_set = int(full.sum("bit") or 0)

    with np.errstate(over="ignore"):
        jj = np.arange(RS_PROBES, dtype=np.uint64)
        rank_p = (hash64(jj + np.uint64(RS_SEED) * _GOLDEN)
                  % np.uint64(n)).astype(np.int64)
        sel_q = (hash64(jj + np.uint64(RS_SEED + 1) * _GOLDEN)
                 % np.uint64(n_set)).astype(np.int64) + 1

    rset = np.unique(rank_p)
    sset = np.unique(sel_q)

    def _answers(t: pa.Table) -> pa.Table:
        pos = np_col(t, "pos")
        rb = np_col(t, "rank_before")
        bit = np_col(t, "bit")
        is_r = np.isin(pos, rset)
        is_s = (bit == 1) & np.isin(rb + 1, sset)
        kind = np.r_[np.zeros(int(is_r.sum()), np.int64),
                     np.ones(int(is_s.sum()), np.int64)]
        arg = np.r_[pos[is_r], rb[is_s] + 1]
        ans = np.r_[rb[is_r], pos[is_s]]
        return pa.table({"kind": pa.array(kind, pa.int64()),
                         "arg": pa.array(arg, pa.int64()),
                         "ans": pa.array(ans, pa.int64())})

    rows = full.map_batches(_answers, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["kind"], r["arg"]))
    return pa.table({
        "kind": pa.array([r["kind"] for r in rows], pa.int64()),
        "arg": pa.array([r["arg"] for r in rows], pa.int64()),
        "ans": pa.array([r["ans"] for r in rows], pa.int64()),
    })


def _rank_select_sql() -> str:
    mix1 = (RS_SEED * 0x9E3779B97F4A7C15) % (1 << 64)
    mix2 = ((RS_SEED + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
    cr = _sm64_ctes("rr", "j", f"j + {mix1}", "js")
    cs = _sm64_ctes("ss", "j", f"j + {mix2}", "js")
    return (
        "WITH v AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 "
        "AS pos, CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 "
        "END AS bit FROM orders), "
        "w AS (SELECT pos, bit, COALESCE(SUM(bit) OVER (ORDER BY pos "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rb "
        "FROM v), "
        "nn AS (SELECT count(*) AS n, SUM(bit) AS ns FROM v), "
        f"js AS (SELECT unnest(range({RS_PROBES})) AS j), "
        f"{cr}, {cs}, "
        "rp AS (SELECT DISTINCT CAST(z % (SELECT n FROM nn) AS BIGINT) "
        "AS arg FROM rr3), "
        "sq AS (SELECT DISTINCT CAST(z % (SELECT ns FROM nn) AS BIGINT) "
        "+ 1 AS arg FROM ss3), "
        "ra AS (SELECT 0 AS kind, rp.arg, w.rb AS ans FROM rp "
        "JOIN w ON w.pos = rp.arg), "
        "sa AS (SELECT 1 AS kind, sq.arg, w.pos AS ans FROM sq "
        "JOIN w ON w.bit = 1 AND w.rb + 1 = sq.arg) "
        "SELECT CAST(kind AS BIGINT) AS kind, CAST(arg AS BIGINT) AS "
        "arg, CAST(ans AS BIGINT) AS ans FROM "
        "(SELECT * FROM ra UNION ALL SELECT * FROM sa) "
        "ORDER BY kind, arg"
    )


def _q_user_running_median(sf_dir: str):
    """Streaming running MEDIAN per user — the order-statistics window
    no sum/cumsum trick reaches (the two-heaps interview classic):
    after every event, the quantile_disc median (sorted value at
    ceil(k/2)−1) of that user's spend so far.  One user-bucketed
    exchange; inside the bucket each user's sequence folds through a
    sorted insertion buffer (O(log m) per event — the same cost the
    two-heap structure pays, with exact integer output).  The SQL twin
    is DuckDB's quantile_disc window over the same (ts, event_id)
    order."""
    import bisect

    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col
    from essentials_rd.windows import _epoch_us

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def _mk(t: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(
            t.column("value").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "s": pa.array(_epoch_us(t, "ts"), pa.int64()),
            "event_id": t.column("event_id").cast(pa.int64()),
            "cents": pa.array(c, pa.int64()),
        })

    def _bucket(grp: pa.Table) -> pa.Table:
        u = np_col(grp, "user_id")
        s = np_col(grp, "s")
        e = np_col(grp, "event_id")
        c = np_col(grp, "cents")
        order = np.lexsort((e, s, u))
        u, s, e, c = u[order], s[order], e[order], c[order]
        med = np.empty(len(u), np.int64)
        buf: list[int] = []
        prev_u = None
        for i in range(len(u)):
            if u[i] != prev_u:
                buf = []
                prev_u = u[i]
            bisect.insort(buf, int(c[i]))
            med[i] = buf[(len(buf) + 1) // 2 - 1]
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "event_id": pa.array(e, pa.int64()),
            "run_median": pa.array(med, pa.int64()),
        })

    return hash_bucket_agg(
        ev.map_batches(_mk, batch_format="pyarrow"),
        lambda b: np_col(b, "user_id"),
        _bucket,
    )


def _user_running_median_sql() -> str:
    return (
        "SELECT user_id, event_id, "
        "CAST(quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT), "
        "0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS run_median FROM events"
    )


_PIVOT_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                "5-LOW"]


def _q_orders_pivot_priority(sf_dir: str):
    """PIVOT (long → wide): per customer-nation, one COLUMN per order
    priority holding (count, cents sum packed as two columns each) —
    the crosstab reshape BI layers run constantly, expressed as one
    partial-aggregate pass: every block emits a (nation × 5-priority)
    dense partial matrix (no shuffle of raw rows), partials sum
    driver-side (|nations| × 5 scalars).  The nation key reaches
    lineitem-free via the orders→customer join on the broadcast
    customer map (small side, ray.put once)."""
    import ray
    import ray.data as rd

    from essentials_rd.util import np_col

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    ctab = pa.concat_tables(ray.get(cust.to_arrow_refs()),
                            promote_options="default")
    ck = np.asarray(ctab.column("c_custkey").to_numpy(
        zero_copy_only=False), np.int64)
    cn = np.asarray(ctab.column("c_nationkey").to_numpy(
        zero_copy_only=False), np.int64)
    order_c = np.argsort(ck)
    cmap_ref = ray.put((ck[order_c], cn[order_c]))
    n_nations = int(cn.max()) + 1 if len(cn) else 0

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority",
                                      "o_totalprice"])
    prio_idx = {p: i for i, p in enumerate(_PIVOT_PRIOS)}

    def _partial(t: pa.Table) -> pa.Table:
        cks, cns = ray.get(cmap_ref)
        cust_k = np_col(t, "o_custkey").astype(np.int64)
        nat = cns[np.searchsorted(cks, cust_k)]
        pr = np.asarray(
            [prio_idx[p] for p in
             t.column("o_orderpriority").to_pylist()], np.int64)
        cents = np.floor(np.asarray(
            t.column("o_totalprice").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        cell = nat * 5 + pr
        cnt = np.bincount(cell, minlength=n_nations * 5)
        sm = np.bincount(cell, weights=cents.astype(np.float64),
                         minlength=n_nations * 5).astype(np.int64)
        return pa.table({
            "cell": pa.array(np.arange(n_nations * 5), pa.int64()),
            "n": pa.array(cnt, pa.int64()),
            "s": pa.array(sm, pa.int64()),
        })

    cnt = np.zeros(n_nations * 5, np.int64)
    sm = np.zeros(n_nations * 5, np.int64)
    for r in orders.map_batches(_partial, batch_format="pyarrow").take_all():
        cnt[r["cell"]] += r["n"]
        sm[r["cell"]] += r["s"]
    cnt = cnt.reshape(n_nations, 5)
    sm = sm.reshape(n_nations, 5)
    keep = cnt.sum(axis=1) > 0
    nk = np.flatnonzero(keep)
    cols: dict[str, pa.Array] = {"nationkey": pa.array(nk, pa.int64())}
    for i, p in enumerate(_PIVOT_PRIOS):
        tag = p.split("-")[0]
        cols[f"n_p{tag}"] = pa.array(cnt[keep, i], pa.int64())
        cols[f"cents_p{tag}"] = pa.array(sm[keep, i], pa.int64())
    return pa.table(cols)


def _orders_pivot_sql() -> str:
    parts = []
    for p in _PIVOT_PRIOS:
        tag = p.split("-")[0]
        parts.append(
            f"CAST(count(*) FILTER (WHERE o_orderpriority = '{p}') "
            f"AS BIGINT) AS n_p{tag}")
        parts.append(
            f"CAST(COALESCE(SUM(CAST(floor(o_totalprice * 100 + 0.5) "
            f"AS BIGINT)) FILTER (WHERE o_orderpriority = '{p}'), 0) "
            f"AS BIGINT) AS cents_p{tag}")
    return (
        "SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey, "
        + ", ".join(parts)
        + " FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_nationkey ORDER BY nationkey"
    )


def _q_interval_scheduling_max(sf_dir: str):
    """Weighted interval scheduling (the canonical DP): per user, the
    maximum total cents of a NON-OVERLAPPING subset of their event
    extents [ts, ts + (event_id % 45 + 1) min) — dp(i) = max(dp(i−1),
    v_i + dp(p(i))) over end-sorted intervals, p(i) the last interval
    ending ≤ start_i (half-open: touching intervals compose).  One
    user-bucketed exchange; inside the bucket p comes from one
    searchsorted per user and the dp fold is the inherent O(m)
    recurrence.  The SQL twin replays the identical recurrence as a
    DuckDB recursive CTE carrying each user's dp vector as a growing
    list (the repo's MATERIALIZED row-CTE discipline)."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import np_col
    from essentials_rd.windows import _epoch_us

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def _mk(t: pa.Table) -> pa.Table:
        us = _epoch_us(t, "ts")
        eid = np_col(t, "event_id").astype(np.int64)
        c = np.floor(np.asarray(
            t.column("value").to_numpy(zero_copy_only=False),
            np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "s": pa.array(np.asarray(us, np.int64), pa.int64()),
            "e": pa.array(np.asarray(us, np.int64)
                          + (eid % IV_MOD_MIN + 1) * 60_000_000,
                          pa.int64()),
            "v": pa.array(c, pa.int64()),
        })

    def _bucket(grp: pa.Table) -> pa.Table:
        u = np_col(grp, "user_id")
        s = np_col(grp, "s")
        e = np_col(grp, "e")
        v = np_col(grp, "v")
        order = np.lexsort((v, s, e, u))
        u, s, e, v = u[order], s[order], e[order], v[order]
        first = np.r_[True, u[1:] != u[:-1]] if len(u) else np.zeros(0, bool)
        starts = np.flatnonzero(first)
        bounds = np.r_[starts, len(u)]
        out_u, out_v = [], []
        for gi in range(len(starts)):
            lo, hi = bounds[gi], bounds[gi + 1]
            es, ss, vs = e[lo:hi], s[lo:hi], v[lo:hi]
            p = np.searchsorted(es, ss, side="right")  # 0-based count
            dp = np.zeros(len(es) + 1, np.int64)
            for i in range(len(es)):
                dp[i + 1] = max(dp[i], vs[i] + dp[p[i]])
            out_u.append(u[lo])
            out_v.append(int(dp[-1]))
        return pa.table({
            "user_id": pa.array(np.asarray(out_u, np.int64), pa.int64()),
            "max_cents": pa.array(np.asarray(out_v, np.int64), pa.int64()),
        })

    return hash_bucket_agg(
        ev.map_batches(_mk, batch_format="pyarrow"),
        lambda b: np_col(b, "user_id"),
        _bucket,
    )


def _interval_scheduling_sql() -> str:
    return (
        "WITH RECURSIVE iv AS MATERIALIZED (SELECT user_id AS u, "
        "epoch_us(ts) AS s, "
        f"epoch_us(ts) + ((event_id % {IV_MOD_MIN}) + 1) * 60000000 AS e, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
        "base AS MATERIALIZED (SELECT u, s, e, v, row_number() OVER "
        "(PARTITION BY u ORDER BY e, s, v) AS i FROM iv), "
        "pidx AS MATERIALIZED (SELECT b.u AS u, b.i AS i, "
        "COALESCE(MAX(b2.i), 0) AS p FROM base b LEFT JOIN base b2 "
        "ON b2.u = b.u AND b2.e <= b.s GROUP BY b.u, b.i), "
        "m AS (SELECT u, MAX(i) AS mi FROM base GROUP BY u), "
        "dp AS (SELECT m.u AS u, 0 AS k, [CAST(0 AS BIGINT)] AS best "
        "FROM m UNION ALL SELECT dp.u AS u, dp.k + 1 AS k, "
        "list_append(dp.best, GREATEST(dp.best[dp.k + 1], "
        "b.v + dp.best[p.p + 1])) AS best FROM dp "
        "JOIN base b ON b.u = dp.u AND b.i = dp.k + 1 "
        "JOIN pidx p ON p.u = dp.u AND p.i = dp.k + 1) "
        "SELECT dp.u AS user_id, CAST(dp.best[dp.k + 1] AS BIGINT) AS "
        "max_cents FROM dp JOIN m ON m.u = dp.u AND dp.k = m.mi "
        "ORDER BY user_id"
    )


PAR_ITERS = 2 * CC_ITERS


def _q_bipartite_components(sf_dir: str):
    """Per-component bipartiteness (odd-cycle detection) as BSP
    supersteps — a NEW VertexProgram on the shared engine (§2.7): from
    each component's root (its CC fixpoint label), propagate a 2-bit
    even/odd-distance mask with bits swapped per hop, pre-combined by
    bitwise OR; a vertex reachable at both parities certifies an odd
    closed walk, so its component is not 2-colorable (König).  Output
    per component: (label, n_vertices, odd_cycle).  The oracle unrolls
    the same monotone recurrence with DuckDB bit_or joins — exactly
    the cc_labels twin discipline."""
    import ray

    from essentials_rd.algorithms import connected_components
    from essentials_rd.algorithms.bipartite import parity_masks
    from essentials_rd.algorithms.cc import components_table

    g, _ = _graph(sf_dir)
    cc = connected_components(g, max_iters=2 * CC_ITERS,
                              checkpoint_every=0, scatter_mode="fused")
    assert cc.converged
    labels_t = components_table(cc)
    vid = np.asarray(labels_t["vid"], np.int64)
    label = np.asarray(labels_t["label"], np.int64)
    roots = np.unique(label)

    par = parity_masks(g, roots, max_iters=PAR_ITERS + 1,
                       checkpoint_every=0, scatter_mode="fused")
    assert par.converged and par.supersteps <= PAR_ITERS, (
        "parity did not converge within the oracle's unrolled count")
    seen_t = par.state_table(["seen"])
    svid = np.asarray(seen_t["vid"], np.int64)
    seen = np.asarray(seen_t["seen"], np.int64)
    # align by vid (both tables cover the same vertex set)
    order_a = np.argsort(vid)
    order_b = np.argsort(svid)
    lab = label[order_a]
    sn = seen[order_b]
    # per component: size + any seen==3
    o = np.argsort(lab, kind="stable")
    lab_s, sn_s = lab[o], sn[o]
    first = np.r_[True, lab_s[1:] != lab_s[:-1]]
    starts = np.flatnonzero(first)
    sizes = np.diff(np.r_[starts, len(lab_s)])
    odd = np.maximum.reduceat((sn_s == 3).astype(np.int64), starts)
    return pa.table({
        "label": pa.array(lab_s[starts], pa.int64()),
        "n_vertices": pa.array(sizes, pa.int64()),
        "odd_cycle": pa.array(odd, pa.int64()),
    })


def _bipartite_sql() -> str:
    cc_steps = ["l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)"]
    for k in range(CC_ITERS):
        cc_steps.append(f"""
m{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM sym e JOIN l{k} l ON l.vid = e.src GROUP BY e.dst
),
l{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM l{k} v LEFT JOIN m{k} m ON m.vid = v.vid
)""")
    par_steps = [
        f"p0 AS MATERIALIZED (SELECT vid, CASE WHEN vid = label THEN 1 "
        f"ELSE 0 END AS seen FROM l{CC_ITERS})"
    ]
    for k in range(PAR_ITERS):
        par_steps.append(f"""
q{k} AS MATERIALIZED (
  SELECT e.dst AS vid,
         bit_or(((p.seen & 1) * 2) | ((p.seen // 2) & 1)) AS om
  FROM sym e JOIN p{k} p ON p.vid = e.src AND p.seen > 0
  GROUP BY e.dst
),
p{k + 1} AS MATERIALIZED (
  SELECT v.vid, v.seen | COALESCE(q.om, 0) AS seen
  FROM p{k} v LEFT JOIN q{k} q ON q.vid = v.vid
)""")
    body = ",".join(cc_steps + par_steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT l.label, CAST(count(*) AS BIGINT) AS n_vertices, "
        f"CAST(MAX(CASE WHEN p.seen = 3 THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS odd_cycle "
        f"FROM l{CC_ITERS} l JOIN p{PAR_ITERS} p USING (vid) "
        f"GROUP BY l.label ORDER BY l.label"
    )


def _q_join_size_certificate(sf_dir: str):
    """Join-layer certificate: |orders ⋈ lineitem| computed TWO
    independent ways — (a) the closed-form Σ_k cA(k)·cB(k) over
    co-bucketed per-key counts (join size without joining, the
    estimator every planner wants exact), and (b) actually executing
    the engine's partitioned hash join and counting.  The engine
    ASSERTS (a) == (b) — any dropped/duplicated bucket or mis-hashed
    key breaks the identity — and the oracle recomputes both sides in
    SQL, so the hash match pins the engine's join row-for-row against
    DuckDB's.  Also emits matched-key and unmatched-side counts (the
    full cardinality profile)."""
    import ray.data as rd

    from essentials_rd.ops import hash_bucket_agg, join
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])
    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey"])

    def _cnt(col: str):
        def _f(grp: pa.Table) -> pa.Table:
            k = np_col(grp, col)
            u, c = np.unique(k, return_counts=True)
            return pa.table({"k": pa.array(u, pa.int64()),
                             "c": pa.array(c.astype(np.int64), pa.int64())})
        return _f

    ca = hash_bucket_agg(orders, lambda b: np_col(b, "o_orderkey"),
                         _cnt("o_orderkey"))
    cb = hash_bucket_agg(line, lambda b: np_col(b, "l_orderkey"),
                         _cnt("l_orderkey"))

    # co-bucketed product fold: same key → same bucket on both sides
    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({
                "k": t.column("k"),
                "ca": t.column("c") if side == 0 else
                pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "cb": t.column("c") if side == 1 else
                pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            })
        return _f

    both = ca.map_batches(_tag(0), batch_format="pyarrow").union(
        cb.map_batches(_tag(1), batch_format="pyarrow"))

    def _prod(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas().groupby("k", sort=False).sum().reset_index()
        a = df["ca"].to_numpy(np.int64)
        b = df["cb"].to_numpy(np.int64)
        return pa.table({
            "est": pa.array([int((a * b).sum())], pa.int64()),
            "matched": pa.array([int(((a > 0) & (b > 0)).sum())],
                                pa.int64()),
            "only_a": pa.array([int(((a > 0) & (b == 0)).sum())],
                               pa.int64()),
            "only_b": pa.array([int(((a == 0) & (b > 0)).sum())],
                               pa.int64()),
        })

    est = matched = only_a = only_b = 0
    for r in hash_bucket_agg(both, lambda b: np_col(b, "k"),
                             _prod).take_all():
        est += r["est"]
        matched += r["matched"]
        only_a += r["only_a"]
        only_b += r["only_b"]

    actual = join(
        orders, line.rename_columns({"l_orderkey": "o_orderkey"}),
        on="o_orderkey", how="inner", broadcast=False,
    ).count()
    assert actual == est, (
        f"join cardinality identity violated: executed {actual}, "
        f"closed form {est}")
    return pa.table({
        "join_rows": pa.array([actual], pa.int64()),
        "matched_keys": pa.array([matched], pa.int64()),
        "orders_only_keys": pa.array([only_a], pa.int64()),
        "lineitem_only_keys": pa.array([only_b], pa.int64()),
    })


def _join_size_certificate_sql() -> str:
    return (
        "WITH ca AS (SELECT o_orderkey AS k, count(*) AS c FROM orders "
        "GROUP BY 1), "
        "cb AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem "
        "GROUP BY 1), "
        "f AS (SELECT COALESCE(ca.k, cb.k) AS k, "
        "COALESCE(ca.c, 0) AS a, COALESCE(cb.c, 0) AS b "
        "FROM ca FULL OUTER JOIN cb ON ca.k = cb.k) "
        "SELECT CAST((SELECT count(*) FROM orders o JOIN lineitem l "
        "ON l.l_orderkey = o.o_orderkey) AS BIGINT) AS join_rows, "
        "CAST(SUM(CASE WHEN a > 0 AND b > 0 THEN 1 ELSE 0 END) AS "
        "BIGINT) AS matched_keys, "
        "CAST(SUM(CASE WHEN a > 0 AND b = 0 THEN 1 ELSE 0 END) AS "
        "BIGINT) AS orders_only_keys, "
        "CAST(SUM(CASE WHEN a = 0 AND b > 0 THEN 1 ELSE 0 END) AS "
        "BIGINT) AS lineitem_only_keys FROM f"
    )


def _q_urgent_run_stats(sf_dir: str):
    """Run-length statistics of the urgency bitvector in global
    o_orderkey order — the segmented-scan MERGE exercise: each range
    partition (disjoint ordered key ranges, ``ops.range_partition``)
    reduces its sorted slice to an ASSOCIATIVE summary (first/last
    bit, run count, longest run, edge-run lengths), and the driver
    folds the n_parts summaries IN KEY ORDER, stitching runs that
    span partition boundaries — the canonical pattern for any
    order-sensitive reduction (RLE sizing, session stitching, islands)
    at shuffle-free cost.  Output: total runs, longest urgent run,
    longest run of either value, n_rows.  Islands SQL twin."""
    import ray.data as rd

    from essentials_rd.ops import range_partition
    from essentials_rd.util import np_col

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def _mk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        bit = _pc.equal(t.column("o_orderpriority"), "1-URGENT")
        return pa.table({
            "k": t.column("o_orderkey").cast(pa.int64()),
            "bit": pa.array(np.asarray(
                bit.to_numpy(zero_copy_only=False), np.int64), pa.int64()),
        })

    routed, _ = range_partition(
        orders.map_batches(_mk, batch_format="pyarrow"), "k", 16,
        lambda b: np_col(b, "k"))

    def _summary(grp: pa.Table) -> pa.Table:
        p = int(grp.column("part_id")[0].as_py())
        k = np_col(grp, "k")
        b = np_col(grp, "bit")
        o = np.argsort(k, kind="stable")
        b = b[o]
        n = len(b)
        breaks = np.flatnonzero(b[1:] != b[:-1]) + 1
        bounds = np.r_[0, breaks, n]
        lens = np.diff(bounds)
        vals = b[bounds[:-1]]
        longest_any = int(lens.max()) if n else 0
        urg = lens[vals == 1]
        return pa.table({
            "part_id": pa.array([p], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "first_bit": pa.array([int(b[0]) if n else -1], pa.int64()),
            "last_bit": pa.array([int(b[-1]) if n else -1], pa.int64()),
            "n_runs": pa.array([len(lens)], pa.int64()),
            "head_len": pa.array([int(lens[0]) if n else 0], pa.int64()),
            "tail_len": pa.array([int(lens[-1]) if n else 0], pa.int64()),
            "longest_any": pa.array([longest_any], pa.int64()),
            "longest_urgent": pa.array(
                [int(urg.max()) if len(urg) else 0], pa.int64()),
            "single_run": pa.array([1 if len(lens) == 1 else 0],
                                   pa.int64()),
        })

    parts = (routed.groupby("part_id")
             .map_groups(_summary, batch_format="pyarrow").take_all())
    parts.sort(key=lambda r: r["part_id"])
    parts = [r for r in parts if r["n"] > 0]
    total_runs = 0
    longest_any = 0
    longest_urg = 0
    n_rows = 0
    cur_bit = -1
    cur_len = 0
    for r in parts:
        n_rows += r["n"]
        longest_any = max(longest_any, r["longest_any"])
        longest_urg = max(longest_urg, r["longest_urgent"])
        if r["first_bit"] == cur_bit:
            # stitch: the open run continues into this partition
            joined = cur_len + r["head_len"]
            longest_any = max(longest_any, joined)
            if cur_bit == 1:
                longest_urg = max(longest_urg, joined)
            total_runs += r["n_runs"] - 1
            cur_len = joined if r["single_run"] else r["tail_len"]
        else:
            total_runs += r["n_runs"]
            cur_len = r["head_len"] if r["single_run"] else r["tail_len"]
        cur_bit = r["last_bit"]
    return pa.table({
        "n_rows": pa.array([n_rows], pa.int64()),
        "n_runs": pa.array([total_runs], pa.int64()),
        "longest_urgent_run": pa.array([longest_urg], pa.int64()),
        "longest_any_run": pa.array([longest_any], pa.int64()),
    })


def _urgent_run_stats_sql() -> str:
    return (
        "WITH v AS (SELECT o_orderkey, CASE WHEN o_orderpriority = "
        "'1-URGENT' THEN 1 ELSE 0 END AS bit FROM orders), "
        "l AS (SELECT bit, CASE WHEN bit = lag(bit) OVER (ORDER BY "
        "o_orderkey) THEN 0 ELSE 1 END AS brk FROM v), "
        "g AS (SELECT bit, SUM(brk) OVER (ROWS UNBOUNDED PRECEDING) "
        "AS gid FROM (SELECT bit, COALESCE(brk, 1) AS brk FROM l)), "
        "runs AS (SELECT gid, any_value(bit) AS bit, count(*) AS len "
        "FROM g GROUP BY gid) "
        "SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_rows, "
        "CAST((SELECT count(*) FROM runs) AS BIGINT) AS n_runs, "
        "CAST(COALESCE((SELECT max(len) FROM runs WHERE bit = 1), 0) "
        "AS BIGINT) AS longest_urgent_run, "
        "CAST((SELECT max(len) FROM runs) AS BIGINT) AS longest_any_run"
    )


FHC_DIM = 1 << 12
_POLY_B = 131
_POLY_P = (1 << 31) - 1
_POLY_L = 32  # max token length the hash covers (corpus max is 8)
_POLY_POWS = []
_pw = 1
for _ in range(_POLY_L):
    _POLY_POWS.append(_pw)
    _pw = (_pw * _POLY_B) % _POLY_P


def _poly_hash_tokens(tokens) -> np.ndarray:
    """SQL-replayable string hash: h = (Σ byte_i · B^i mod p) mod p
    over the UTF-8 bytes, B=131, p=2³¹−1, powers pre-reduced — both
    sides compute the identical sum, so string-keyed assignments can
    be oracle-replayed (pandas siphash cannot).  Vectorized: padded
    byte matrix × power vector."""
    toks = [t.encode("utf-8") for t in tokens]
    if not toks:
        return np.zeros(0, np.int64)
    L = min(max(len(t) for t in toks), _POLY_L)
    m = np.zeros((len(toks), L), np.int64)
    for i, t in enumerate(toks):
        b = np.frombuffer(t[:L], np.uint8)
        m[i, : len(b)] = b
    return (m @ np.asarray(_POLY_POWS[:L], np.int64)) % _POLY_P


def _q_feature_hash_collisions(sf_dir: str):
    """Hashing-trick hygiene audit: fold the corpus vocabulary into
    FHC_DIM buckets via sm64(polyhash(token)) mod d and report exactly
    how much signal collides — distinct tokens, occupied buckets, the
    max pile-up, and how many tokens share their bucket (those
    features are irrecoverably aliased).  The token→bucket assignment
    uses the SQL-replayable polynomial byte hash (B=131 mod 2³¹−1 →
    the shared splitmix chain), so the oracle replays the exact
    assignment — not just the aggregate shape.  One token-bucketed
    distinct fold; FHC_DIM-sized partial histograms sum driver-side."""
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.ops import hash_bucket_agg
    from essentials_rd.util import hash64, np_col

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def _toks(t: pa.Table) -> pa.Table:
        s = t.column("text").to_pandas()
        flat = sorted({w for lst in s.str.split(" ") for w in lst})
        arr = pa.array(flat, pa.string())
        return pa.table({
            "khash": pa.array(_str_hash(arr), pa.int64()),
            "tok": arr,
        })

    def _bucket(grp: pa.Table) -> pa.Table:
        import pandas as pd

        toks = pd.unique(grp.column("tok").combine_chunks().to_pandas())
        ph = _poly_hash_tokens(toks.tolist())
        fb = (hash64(ph.astype(np.uint64)) % np.uint64(FHC_DIM)).astype(
            np.int64)
        u, c = np.unique(fb, return_counts=True)
        return pa.table({
            "fbucket": pa.array(u, pa.int64()),
            "n_tokens": pa.array(c.astype(np.int64), pa.int64()),
        })

    hist = np.zeros(FHC_DIM, np.int64)
    for r in hash_bucket_agg(
        docs.map_batches(_toks, batch_format="pyarrow"),
        lambda b: np_col(b, "khash"),
        _bucket,
    ).take_all():
        hist[r["fbucket"]] += r["n_tokens"]
    n_tokens = int(hist.sum())
    return pa.table({
        "dim": pa.array([FHC_DIM], pa.int64()),
        "n_tokens": pa.array([n_tokens], pa.int64()),
        "occupied_buckets": pa.array([int((hist > 0).sum())], pa.int64()),
        "max_bucket_tokens": pa.array([int(hist.max())], pa.int64()),
        "collided_tokens": pa.array([int(hist[hist >= 2].sum())],
                                    pa.int64()),
    })


def _feature_hash_collisions_sql() -> str:
    pows = ", ".join(
        f"({i + 1}, {p})" for i, p in enumerate(_POLY_POWS)
    )
    chain = _sm64_ctes("fh", "tok", "ph", "ph1")
    return (
        "WITH toks AS (SELECT DISTINCT unnest(string_split(text, ' ')) "
        "AS tok FROM documents), "
        f"pw AS (SELECT * FROM (VALUES {pows}) p(j, b)), "
        "ph1 AS (SELECT t.tok, COALESCE(SUM(CAST(ord(substr(t.tok, "
        f"pw.j, 1)) AS BIGINT) * pw.b), 0) % {_POLY_P} AS ph "
        "FROM toks t LEFT JOIN pw "
        "ON pw.j <= length(t.tok) GROUP BY t.tok), "
        f"{chain}, "
        f"asg AS (SELECT CAST(z % {FHC_DIM} AS BIGINT) AS fb FROM fh3), "
        "h AS (SELECT fb, count(*) AS c FROM asg GROUP BY fb) "
        f"SELECT CAST({FHC_DIM} AS BIGINT) AS dim, "
        "CAST((SELECT count(*) FROM toks) AS BIGINT) AS n_tokens, "
        "CAST((SELECT count(*) FROM h) AS BIGINT) AS occupied_buckets, "
        "CAST((SELECT max(c) FROM h) AS BIGINT) AS max_bucket_tokens, "
        "CAST(COALESCE((SELECT SUM(c) FROM h WHERE c >= 2), 0) "
        "AS BIGINT) AS collided_tokens"
    )


def _q_pettitt_changepoint(sf_dir: str):
    """Pettitt changepoint test (Pettitt 1979) on the dense hourly
    event-count series (zero hours included): the rank-based statistic
    U_t = Σ_{i≤t<j} sgn(x_j − x_i), K = max_t |U_t| and the split
    point t* (min t on ties) — the standard nonparametric "did the
    regime shift, and when" monitoring test, exact in integers.
    Engine computes U via the O(m²) sign matrix with 2-D prefix sums
    on the calendar-small dense grid (the fano/Lorenz driver-small
    contract); the oracle reaches the same U_t by the
    interval-contribution identity (each pair i<j adds its sign to
    every t in [i, j)) — a diff array + window cumsum, an INDEPENDENT
    formulation."""
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def _hour(t: pa.Table) -> pa.Table:
        h = (np.asarray(t.column("ts").cast(pa.int64()))
             // 3_600_000_000).astype(np.int64)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "one": pa.array(np.ones(len(h), np.int64))})

    rows = grouped_pandas_agg(
        ev.map_batches(_hour, batch_format="pyarrow"),
        keys=["h"], aggs={"n": ("one", "sum")}).take_all()
    hmin = min(r["h"] for r in rows)
    hmax = max(r["h"] for r in rows)
    m = int(hmax - hmin + 1)
    x = np.zeros(m, np.int64)
    for r in rows:
        x[r["h"] - hmin] = r["n"]

    sg = np.sign(x[None, :] - x[:, None]).astype(np.int64)
    c = np.cumsum(sg, axis=1)           # C[i, t] = Σ_{j≤t} sgn
    a = np.cumsum(c[:, m - 1])          # Σ_{i≤t} full row sums
    d = np.cumsum(c, axis=0)            # 2-D prefix over i
    ts = np.arange(m - 1)
    u = a[ts] - d[ts, ts]
    k_stat = int(np.abs(u).max()) if len(u) else 0
    t_star = int(ts[np.abs(u) == k_stat][0]) if len(u) else 0
    return pa.table({
        "grid_hours": pa.array([m], pa.int64()),
        "t_star": pa.array([t_star], pa.int64()),
        "k_stat": pa.array([k_stat], pa.int64()),
        "u_signed": pa.array([int(u[t_star]) if len(u) else 0],
                             pa.int64()),
    })


def _pettitt_sql() -> str:
    return (
        "WITH hc AS (SELECT epoch_us(ts) // 3600000000 AS h, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1), "
        "bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hc), "
        "grid AS (SELECT t, COALESCE(hc.n, 0) AS x FROM (SELECT "
        "unnest(range((SELECT hi - lo + 1 FROM bounds))) AS t) g "
        "LEFT JOIN hc ON hc.h = g.t + (SELECT lo FROM bounds)), "
        "pr AS (SELECT a.t AS i, b.t AS j, "
        "CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END "
        "AS s FROM grid a JOIN grid b ON b.t > a.t), "
        "dl AS (SELECT i AS t, s FROM pr UNION ALL "
        "SELECT j AS t, -s FROM pr), "
        "pt AS (SELECT t, SUM(s) AS ds FROM dl GROUP BY t), "
        "cum AS (SELECT g.t, CAST(SUM(COALESCE(pt.ds, 0)) OVER "
        "(ORDER BY g.t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u "
        "FROM grid g LEFT JOIN pt ON pt.t = g.t), "
        "uu AS (SELECT t, u FROM cum WHERE t < "
        "(SELECT hi - lo FROM bounds)), "
        "kk AS (SELECT max(abs(u)) AS k FROM uu), "
        "st AS (SELECT min(t) AS ts FROM uu WHERE abs(u) = "
        "(SELECT k FROM kk)) "
        "SELECT CAST((SELECT hi - lo + 1 FROM bounds) AS BIGINT) AS "
        "grid_hours, CAST((SELECT ts FROM st) AS BIGINT) AS t_star, "
        "CAST((SELECT k FROM kk) AS BIGINT) AS k_stat, "
        "CAST((SELECT u FROM uu WHERE t = (SELECT ts FROM st)) AS "
        "BIGINT) AS u_signed"
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "events_hourly": _q_events_hourly,
        "events_hopping": _q_events_hopping,
        "user_sessions": _q_user_sessions,
        "user_intervals": _q_user_intervals,
        "user_lag_moments": _q_user_lag_moments,
        "user_cusum": _q_user_cusum,
        "top_docs_per_lang": _q_top_docs_per_lang,
        "quantity_quantiles": _q_quantity_quantiles,
        "quantity_quantiles_cont": _q_quantity_quantiles_cont,
        "price_quantiles_sampled": _q_price_quantiles_sampled,
        "orders_range_parts": _q_orders_range_parts,
        "events_throttled": _q_events_throttled,
        "props_field_stats": _q_props_field_stats,
        "token_counts": _q_token_counts,
        "rolling_value_sum": _q_rolling_value,
        "user_running_total": _q_user_running_total,
        "user_range_sum": _q_user_range_sum,
        "quantity_moments": _q_quantity_moments,
        "qty_price_comoments": _q_qty_price_comoments,
        "spearman_qty_price": _q_spearman_qty_price,
        "kendall_qty_disc": _q_kendall_qty_disc,
        "chisq_type_hour": _q_chisq_type_hour,
        "qty_emd_returned": _q_qty_emd_returned,
        "hourly_acf": _q_hourly_acf,
        "phrase_hits": _q_phrase_hits,
        "weighted_sample_parts": _q_weighted_sample_parts,
        "orders_profile": _q_orders_profile,
        "last_order_asof": _q_last_order_asof,
        "parts_per_order": _q_parts_per_order,
        "lang_char_quantiles": _q_lang_char_quantiles,
        "lang_char_quantiles_cont": _q_lang_char_quantiles_cont,
        "sampled_docs": _q_sampled_docs,
        "orders_checksum": _q_orders_checksum,
        "stratified_docs": _q_stratified_docs,
        "mixed_corpus": _q_mixed_corpus,
        "top_tokens": _q_top_tokens,
        "contaminated_docs": _q_contaminated_docs,
        "pagerank_weighted_k8": _q_pagerank_weighted,
        "degree_hist": _q_degree_hist,
        "edge_jaccard": _q_edge_jaccard,
        "ktruss12": _q_ktruss,
        "neighbor_sample_k3": _q_neighbor_sample,
        "random_walks": _q_random_walks,
        "skipgram_pairs": _q_skipgram,
        "node2vec_walks": _q_node2vec,
        "event_gaps": _q_event_gaps,
        "events_in_windows": _q_events_in_windows,
        "simhash_pairs": _q_simhash_pairs,
        "greedy_cover_docs": _q_greedy_cover,
        "winnow_fp": _q_winnow_fp,
        "doc_chunks": _q_doc_chunks,
        "redacted_docs": _q_redacted_docs,
        "cohort_retention": _q_cohort_retention,
        "kmeans_buckets": _q_kmeans_buckets,
        "knn_graph_k3": _q_knn_graph,
        "graph_ann_top5": _q_graph_ann,
        "pq_codes": _q_pq_codes,
        "ivfpq_top5": _q_ivfpq,
        "revenue_by_region": _q_revenue_by_region,
        "user_top_event": _q_user_top_event,
        "cust_user_outer": _q_cust_user_outer,
        "user_event_pivot": _q_user_event_pivot,
        "doc_char_rank": _q_doc_char_rank,
        "qty_dense_rank": _q_qty_dense_rank,
        "supplier_edit1": _q_supplier_edit1,
        "supplier_entities": _q_supplier_entities,
        "event_transitions": _q_event_transitions,
        "markov_next_acc": _q_markov_next,
        "position_attribution": _q_position_attribution,
        "seasonal_naive_eval": _q_seasonal_naive,
        "event_trigrams": _q_event_trigrams,
        "ra_link_pred": _q_ra_link_pred,
        "diameter_lb": _q_diameter_lb,
        "tpch_q1_cents": _q_tpch_q1_cents,
        "hll_user_regs": _q_hll_user_regs,
        "type_user_hll": _q_type_user_hll,
        "bloom_bits_urgent": _q_bloom_bits_urgent,
        "hourly_user_hll": _q_hourly_user_hll,
        "hourly_anomalies": _q_hourly_anomalies,
        "user_drawdown": _q_user_drawdown,
        "event_disorder": _q_event_disorder,
        "value_drift": _q_value_drift,
        "value_rank_sum": _q_value_rank_sum,
        "lp_modularity": _q_lp_modularity,
        "hourly_value_bands": _q_hourly_value_bands,
        "fk_violations": _q_fk_violations,
        "dedup_summary": _q_dedup_summary,
        "cm_sketch_users": _q_cm_sketch_users,
        "cs_point_users": _q_cs_point_users,
        "cm_join_size": _q_cm_join_size,
        "join_order_plan": _q_join_order_plan,
        "heavy_hitter_users": _q_heavy_hitters,
        "item_cosine_top3": _q_item_cosine,
        "allen_interval_census": _q_allen_census,
        "orders_hive_prune": _q_hive_prune,
        "bloom_sidecar_lookup": _q_bloom_sidecar,
        "consistent_hash_moves": _q_consistent_hash,
        "parity_shard_recover": _q_parity_recover,
        "encoding_advisor": _q_encoding_advisor,
        "chao1_parts": _q_chao1_parts,
        "ams_f2_users": _q_ams_f2,
        "tpch_q3": _q_tpch_q3,
        "tpch_q4": _q_tpch_q4,
        "tpch_q5": _q_tpch_q5,
        "tpch_q6": _q_tpch_q6,
        "tpch_q10": _q_tpch_q10,
        "tpch_q12": _q_tpch_q12,
        "tpch_q14": _q_tpch_q14,
        "tpch_q18": _q_tpch_q18,
        "tpch_q7": _q_tpch_q7,
        "tpch_q13": _q_tpch_q13,
        "tpch_q15": _q_tpch_q15,
        "tpch_q17": _q_tpch_q17,
        "tpch_q22": _q_tpch_q22,
        "tpch_q2": _q_tpch_q2,
        "tpch_q8": _q_tpch_q8,
        "tpch_q9": _q_tpch_q9,
        "tpch_q11": _q_tpch_q11,
        "tpch_q16": _q_tpch_q16,
        "tpch_q19": _q_tpch_q19,
        "tpch_q20": _q_tpch_q20,
        "tpch_q21": _q_tpch_q21,
        "two_hop_sizes": _q_two_hop_sizes,
        "orders_cube": _q_orders_cube,
        "hyperball_r2": _q_hyperball_r2,
        "wl_colors_k3": _q_wl_colors,
        "copart_join_parts": _q_copart_join,
        "pareto_orders": _q_pareto_orders,
        "incr_orders_rollup": _q_incr_rollup,
        "orders_sorted_write": _q_sorted_write,
        "orders_time_travel": _q_time_travel,
        "orders_schema_drift": _q_schema_drift,
        "cdc_chunk_ledger": _q_cdc_chunks,
        "logistic_urgent_price": _q_logistic_newton,
        "welch_ttest_values": _q_welch_ttest,
        "perm_test_values": _q_perm_test,
        "zonemap_price_scan": _q_zonemap_scan,
        "zorder_box_scan": _q_zorder_box_scan,
        "lang_diversity": _q_lang_diversity,
        "user_value_frontier": _q_user_frontier,
        "price_mad": _q_price_mad,
        "event_unpivot": _q_event_unpivot,
        "price_outliers": _q_price_outliers,
        "grep_substring": _q_substring_search,
        "dict_term_census": _q_dict_term_census,
        "orders_diff": _q_orders_diff,
        "cust_status_history": _q_cust_status_history,
        "orders_merged": _q_orders_merged,
        "matching_edges": _q_matching,
        "weighted_matching": _q_weighted_matching,
        "vertex_cover": _q_vertex_cover,
        "trimmed_qty": _q_trimmed_qty,
        "benford_prices": _q_benford,
        "daily_top_spender": _q_daily_top_spender,
        "doc_packing": _q_doc_packing,
        "curated_docs": _q_curated_docs,
        "top_bigrams": _q_top_bigrams,
        "pmi_bigrams_top20": _q_pmi_bigrams,
        "user_gap_median": _q_user_gap_median,
        "doc_splits": _q_doc_splits,
        "privacy_audit": _q_privacy_audit,
        "bpe_merges": _q_bpe_merges,
        "kcenter_sel5": _q_kcenter,
        "attribution_last_click": _q_attribution,
        "leakage_splits": _q_leakage_splits,
        "dup_span_coverage": _q_dup_span_coverage,
        "doc_repetition": _q_doc_repetition,
        "decayed_activity": _q_decayed_activity,
        "weighted_docs": _q_weighted_docs,
        "vocab_coverage": _q_vocab_coverage,
        "price_histogram": _q_price_histogram,
        "qty_price_trend": _q_qty_price_trend,
        "doc_char_ntile": _q_doc_char_ntile,
        "funnel_stages": _q_funnel,
        "clustering_coeff": _q_clustering_coeff,
        "quality_score": _q_quality_score,
        "cosine_near_dup": _q_cosine_near_dup,
        "lsh_cosine_pairs": _q_lsh_cosine,
        "embedding_clusters": _q_embedding_clusters,
        "dbscan_clusters": _q_dbscan,
        "orders_per_nation": _q_orders_per_nation,
        "urgent_orders_by_priority": _q_urgent_orders_by_priority,
        "orders_rollup": _q_orders_rollup,
        "cust_no_orders": _q_cust_no_orders,
        "bloom_join_urgent": _q_bloom_join_urgent,
        "skew_join_nations": _q_skew_join_nations,
        "status_priority_intersect": _q_status_priority_intersect,
        "cust_f_not_o": _q_cust_f_not_o,
        "latest_user_event": _q_latest_user_event,
        "orders_price_rank": _q_orders_price_rank,
        "text_stats": _q_text_stats,
        "exact_dup_groups": _q_exact_dup_groups,
        "ann_cosine_top5": _q_ann,
        "mutual_nn_pairs": _q_mutual_nn,
        "mmr_diverse_top5": _q_mmr_diverse,
        "time_to_convert": _q_time_to_convert,
        "user_streaks": _q_user_streaks,
        "hourly_gapfill": _q_hourly_gapfill,
        "quantile_normalize": _q_quantile_normalize,
        "cohort_ltv": _q_cohort_ltv,
        "near_dup_pairs": _q_near_dup_pairs,
        "containment_pairs": _q_containment_pairs,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "dup_clusters": _q_dup_clusters,
        "lang_pred": _q_lang_pred,
        "corpus_sha256": _q_corpus_sha256,
        "shared_token_edges": _q_shared_token_edges,
        "copurchase_edges": _q_copurchase_edges,
        "nbr_feat_sum": _q_nbr_feat_sum,
        "gnn_two_layer": _q_gnn_two_layer,
        "degree": _q_degree,
        "degree_assortativity": _q_degree_assortativity,
        "pagerank_k8": _q_pagerank,
        "top_pagerank": _q_top_pagerank,
        "cc_labels": _q_cc,
        "incr_cc_labels": _q_incr_cc,
        "component_sizes": _q_component_sizes,
        "lp_k4": _q_lp,
        "louvain_move1": _q_louvain_move,
        "louvain_coarse_edges": _q_louvain_coarse,
        "louvain_level2": _q_louvain_level2,
        "bfs_depth": _q_bfs_depth,
        "graph_voronoi8": _q_graph_voronoi,
        "voronoi_coarsen": _q_voronoi_coarsen,
        "temporal_reach": _q_temporal_reach,
        "rmat_edges": _q_rmat_edges,
        "media_img_stats": _q_media_img_stats,
        "media_jpeg_roundtrip": _q_media_jpeg_roundtrip,
        "media_png_roundtrip": _q_media_png_roundtrip,
        "media_jpeg_quality": _q_media_jpeg_quality,
        "heaps_vocab_curve": _q_heaps_vocab_curve,
        "token_collision_stats": _q_token_collision_stats,
        "gap_log_histogram": _q_gap_log_histogram,
        "orders_deletion_vectors": _q_orders_deletion_vectors,
        "orders_skyline": _q_orders_skyline,
        "bootstrap_median_ci": _q_bootstrap_median_ci,
        "ransac_qty_price": _q_ransac_qty_price,
        "trailing_distinct_users": _q_trailing_distinct_users,
        "frequent_triples": _q_frequent_triples,
        "bucket_skew_report": _q_bucket_skew_report,
        "kneser_ney_counts": _q_kneser_ney_counts,
        "bloom_fp_audit": _q_bloom_fp_audit,
        "rank_select_audit": _q_rank_select_audit,
        "user_running_median": _q_user_running_median,
        "orders_pivot_priority": _q_orders_pivot_priority,
        "interval_scheduling_max": _q_interval_scheduling_max,
        "bipartite_components": _q_bipartite_components,
        "join_size_certificate": _q_join_size_certificate,
        "urgent_run_stats": _q_urgent_run_stats,
        "feature_hash_collisions": _q_feature_hash_collisions,
        "pettitt_changepoint": _q_pettitt_changepoint,
        "media_img_resize": _q_media_resize,
        "media_wav_features": _q_wav_features,
        "media_wav_stats": _q_media_wav_stats,
        "media_img_sobel": _q_media_sobel,
        "late_events_watermark": _q_late_events,
        "als_user_factors": _q_als_step,
        "rolling_median5": _q_rolling_median,
        "dp_noisy_counts": _q_dp_counts,
        "textrank_top10": _q_textrank,
        "pca_top_eigvec": _q_pca_power,
        "region_min_cut": _q_region_min_cut,
        "media_video_motion": _q_video_motion,
        "huffman_event_code": _q_huffman,
        "incr_join_view": _q_incr_join_view,
        "bitmap_and_count": _q_bitmap_and,
        "mrr_item_model": _q_mrr_eval,
        "feature_hash_users": _q_feature_hash,
        "seq_pair_support": _q_seq_support,
        "bip_matching_regions": _q_bip_matching,
        "stable_matching_regions": _q_stable_matching,
        "hungarian_assignment": _q_assignment,
        "erdos_gallai_audit": _q_erdos_gallai,
        "borda_priority_vote": _q_borda,
        "condorcet_priority": _q_condorcet,
        "simpson_paradox_audit": _q_simpson,
        "littles_law_audit": _q_littles_law,
        "lorenz_user_value": _q_lorenz,
        "pareto_8020_point": _q_pareto_point,
        "hot_user_ranking": _q_hot_ranking,
        "shamir_share_audit": _q_shamir,
        "hourly_fano": _q_fano,
        "chi2_tokens_top10": _q_chi2_tokens,
        "haar_hourly": _q_haar_hourly,
        "nra_topk_parts": _q_nra_topk,
        "hopping_distinct_users": _q_hopping_distinct,
        "fiedler_k8": _q_fiedler,
        "conformal_price": _q_conformal,
        "isotonic_qty_price": _q_isotonic,
        "orders_orc_roundtrip": _q_orc_roundtrip,
        "lcs_top_users": _q_lcs_users,
        "knapsack_parts": _q_knapsack,
        "part_soundex_blocks": _q_soundex_blocks,
        "shapley_order_price": _q_shapley_linear,
        "doc_bwt": _q_doc_bwt,
        "rice_postings": _q_rice_postings,
        "doc_periods": _q_doc_periods,
        "viterbi_top_user": _q_viterbi,
        "weighted_median_qty": _q_weighted_median,
        "lis_top_user": _q_lis_user,
        "spatial_radius_pairs": _q_spatial_join,
        "points_in_triangle": _q_points_in_triangle,
        "xcorr_view_purchase": _q_xcorr,
        "boost_stumps2": _q_boost_stumps,
        "activity_union_hours": _q_interval_union,
        "learned_index_eps": _q_learned_index,
        "sign_test_daily": _q_sign_test,
        "herfindahl_nations": _q_herfindahl,
        "media_wav_hadamard": _q_wav_hadamard,
        "orders_merkle": _q_orders_merkle,
        "merkle_diff": _q_merkle_diff,
        "ols_order_price": _q_ols_order_price,
        "ridge_order_price": _q_ridge_order_price,
        "price_qty_slope": _q_price_qty_slope,
        "spanning_trees_regions": _q_spanning_trees,
        "user_lifetable": _q_user_lifetable,
        "bridges": _q_bridges,
        "two_edge_components": _q_two_edge_components,
        "rand_index_lp_cc": _q_rand_index,
        "edge_betweenness": _q_edge_betweenness,
        "euler_check": _q_euler_check,
        "part_seq_reciprocity": _q_reciprocity,
        "motif_census": _q_motif_census,
        "gini_stump_price": _q_gini_stump,
        "theil_sen_qty_price": _q_theil_sen,
        "tree_depth2_orders": _q_tree_depth2,
        "densest_peel": _q_densest_peel,
        "alt_lower_bounds": _q_alt_bounds,
        "theta_sketch_overlap": _q_theta_overlap,
        "effective_resistance": _q_eff_resistance,
        "edge_cut_parts": _q_edge_cut,
        "dag_depth_k12": _q_dag_depth,
        "sssp_dist": _q_sssp_dist,
        "widest_path": _q_widest_path,
        "ppr_k8": _q_ppr,
        "ppr_sweep": _q_ppr_sweep,
        "hub_robustness": _q_hub_robustness,
        "bond_percolation": _q_bond_percolation,
        "ic_spread": _q_ic_spread,
        "influence_seeds": _q_influence_seeds,
        "squares_total": _q_squares,
        "k4_total": _q_k4,
        "butterflies_total": _q_butterflies,
        "sp_counts": _q_sp_counts,
        "sssp_parent": _q_sssp_parent,
        "top_copurchase_pairs": _q_top_pairs,
        "top_part_triples": _q_top_triples,
        "doc_hash_features": _q_hash_features,
        "pair_lift": _q_pair_lift,
        "doc_query_scores": _q_doc_query_scores,
        "bm25_top10": _q_bm25,
        "rrf_hybrid_top10": _q_rrf_fusion,
        "rich_club": _q_rich_club,
        "kcore3": _q_kcore,
        "spgemm_sample": _q_spgemm,
        "eigencentrality_k6": _q_eigencentrality,
        "coloring_w3": _q_coloring,
        "hits_k4": _q_hits,
        "scc_labels": _q_scc,
        "scc_condensed_depth": _q_scc_condensed_depth,
        "activity_gini": _q_activity_gini,
        "negative_samples_k3": _q_negative_samples,
        "linkpred_auc": _q_linkpred_auc,
        "lang_confusion": _q_lang_confusion,
        "orders_validation": _q_orders_validation,
        "lang_fertility": _q_lang_fertility,
        "price_band_pairs": _q_price_band_pairs,
        "most_repetitive_docs": _q_most_repetitive,
        "label_centroids": _q_label_centroids,
        "transitivity": _q_transitivity,
        "brand_homophily": _q_brand_homophily,
        "msf_total": _q_msf,
        "geo_infer": _q_geo,
        "bc_sampled": _q_betweenness,
        "harmonic_sampled": _q_harmonic,
        "coreness_capped": _q_coreness,
        "mis_luby": _q_mis,
        "tfidf_top1": _q_tfidf,
        "doc_fluency": _q_fluency,
        "token_postings": _q_token_postings,
        "docs_with_all_tokens": _q_docs_with_all_tokens,
        "embedding_gram": _q_embedding_gram,
        "embedding_dim_stats": _q_embedding_dim_stats,
        "user_event_seq": _q_user_event_seq,
        "conversion_paths": _q_conversion_paths,
        "triangles_total": _q_triangles_total,
        "triangles_doulion": _q_triangles_doulion,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "spmv": _q_spmv,
        "nbr_deg": _q_nbr_deg,
        "katz_k4": _q_katz,
        "fastrp_embed8": _q_fastrp,
    }


# ---------------------------------------------------------- oracle SQL

# distinct k-token shingle sets per document, exactly textops'
# semantics: split on single spaces, k consecutive tokens, docs with
# fewer than k tokens contribute ONE shingle of all their tokens
_SHINGLE_CTE = f"""
toks AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, list(DISTINCT shingle) AS s FROM (
    SELECT doc_id,
           CASE WHEN len(t) < {SHINGLE_K} THEN array_to_string(t, ' ')
                ELSE array_to_string(list_slice(t, i.i, i.i + {SHINGLE_K - 1}), ' ')
           END AS shingle
    FROM toks, LATERAL (
      SELECT unnest(range(1, greatest(len(t) - {SHINGLE_K - 1}, 1) + 1)) AS i
    ) i
  ) GROUP BY doc_id
),
jpairs AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jacc
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
),
nd AS MATERIALIZED (SELECT a, b, jacc FROM jpairs WHERE jacc >= {JACCARD_T})
"""


CONT_NUM, CONT_DEN = 4, 5


def _q_containment_pairs(sf_dir: str):
    """Asymmetric containment near-dup (textops.containment_pairs):
    ordered pairs with |S(src) ∩ S(dst)|·5 ≥ 4·|S(src)| over distinct
    token shingles — the subset-duplication detector symmetric Jaccard
    structurally misses.  Exact shingle strings end to end; one gram
    exchange + one packed-pair exchange + one size join."""
    import ray.data as rd

    from essentials_rd.textops import containment_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return containment_pairs(docs, num=CONT_NUM, den=CONT_DEN,
                             shingle_k=SHINGLE_K)


def _containment_sql() -> str:
    return (
        f"WITH {_SHINGLE_CTE} "
        "SELECT a.doc_id AS src, b.doc_id AS dst, "
        "CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter, "
        "CAST(len(a.s) AS BIGINT) AS n_src "
        "FROM sh a JOIN sh b ON a.doc_id <> b.doc_id "
        f"WHERE len(list_intersect(a.s, b.s)) * {CONT_DEN} "
        f">= {CONT_NUM} * len(a.s) ORDER BY src, dst"
    )


def _near_dup_pairs_sql() -> str:
    return (
        f"WITH {_SHINGLE_CTE} "
        f"SELECT a, b, ROUND(jacc, 6) AS jaccard FROM nd ORDER BY a, b"
    )


def _embedding_clusters_sql() -> str:
    """Unrolled hash-min CC over the exact cosine pair graph — the
    embedding twin of ``_dup_clusters_sql`` (labels are monotone, so a
    fixed unroll ≥ the engine's asserted superstep count is exact)."""
    steps = [
        f"""e AS MATERIALIZED (SELECT vec_id,
      CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
nd AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM e a, e b WHERE a.vec_id < b.vec_id AND
  round(list_cosine_similarity(a.emb, b.emb), 6) >= {COSINE_DUP_T}
),
ndsym AS (SELECT a AS src, b AS dst FROM nd
          UNION ALL SELECT b, a FROM nd),
nverts AS (SELECT DISTINCT src AS vid FROM ndsym),
x0 AS (SELECT vid, vid AS label FROM nverts)"""
    ]
    for k in range(DUP_CC_ITERS):
        steps.append(f"""
xm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM ndsym e JOIN x{k} l ON l.vid = e.src GROUP BY e.dst
),
x{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM x{k} v LEFT JOIN xm{k} m ON m.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {body} "
        f"SELECT vid AS vec_id, label AS cluster FROM x{DUP_CC_ITERS} "
        f"ORDER BY vec_id"
    )


def _dup_cc_body() -> str:
    """Unrolled hash-min CC body over the shingle pair graph ``nd`` —
    ends at ``x{DUP_CC_ITERS}(vid, label)``.  Shared by the
    dup_clusters and curated_docs oracles."""
    steps = [
        """ndsym AS (SELECT a AS src, b AS dst FROM nd
                     UNION ALL SELECT b, a FROM nd),
nverts AS (SELECT DISTINCT src AS vid FROM ndsym),
x0 AS (SELECT vid, vid AS label FROM nverts)"""
    ]
    for k in range(DUP_CC_ITERS):
        steps.append(f"""
xm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM ndsym e JOIN x{k} l ON l.vid = e.src GROUP BY e.dst
),
x{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM x{k} v LEFT JOIN xm{k} m ON m.vid = v.vid
)""")
    return ",".join(steps)


def _dup_clusters_sql() -> str:
    return (
        f"WITH {_SHINGLE_CTE}, {_dup_cc_body()} "
        f"SELECT vid AS doc_id, label AS cluster FROM x{DUP_CC_ITERS} "
        f"ORDER BY doc_id"
    )


def _price_quantiles_sampled_sql() -> str:
    """SQL twin of the sample-sketch quantiles: the shared SplitMix64
    chain picks the SAME rows (pure function of o_orderkey), then
    quantile_disc over half-up cents."""
    threshold = int(SKETCH_FRAC * float(2**64 - 1))
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes("pq", "o_orderkey, o_totalprice",
                       f"o_orderkey + {mix}", "orders")
    qs = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(quantile_disc(cents, {q}) AS BIGINT) AS value FROM s"
        for q in QUANTILES
    )
    return (
        f"WITH {chain}, "
        f"s AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) "
        f"AS cents FROM pq3 WHERE z < CAST('{threshold}' AS UBIGINT)) "
        f"{qs}"
    )


def _orders_range_parts_sql() -> str:
    """SQL twin of the range partitioner: the shared SplitMix64 chain
    picks the SAME sample rows, quantile_disc gives the same exact
    boundaries, and part_id = #(bounds <= v) mirrors searchsorted
    side='right'."""
    threshold = int(SKETCH_FRAC * float(2**64 - 1))
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes("rp", "o_orderkey, o_totalprice",
                       f"o_orderkey + {mix}", "orders")
    bsel = " UNION ALL ".join(
        f"SELECT quantile_disc(cents, {i / RANGE_PARTS}) AS bv FROM s"
        for i in range(1, RANGE_PARTS)
    )
    return (
        f"WITH {chain}, "
        f"s AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) "
        f"AS cents FROM rp3 WHERE z < CAST('{threshold}' AS UBIGINT)), "
        f"b AS ({bsel}), "
        "o AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) "
        "AS cents FROM orders) "
        "SELECT part_id, CAST(count(*) AS BIGINT) AS n, "
        "CAST(min(cents) AS BIGINT) AS min_cents, "
        "CAST(max(cents) AS BIGINT) AS max_cents "
        "FROM (SELECT cents, CAST((SELECT count(*) FROM b "
        "WHERE b.bv <= o.cents) AS BIGINT) AS part_id FROM o) "
        "GROUP BY part_id ORDER BY part_id"
    )


def _lang_ctes() -> str:
    """Shared lang-ID CTE body (tok → counts → prof → scores → best);
    used by the lang_pred and curated_docs oracles."""
    return f"""
tok AS MATERIALIZED (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
counts AS MATERIALIZED (
  SELECT lang, tok, count(*) AS n FROM tok GROUP BY 1, 2
),
prof AS MATERIALIZED (
  SELECT lang, tok, n FROM (
    SELECT *, row_number() OVER (
      PARTITION BY lang ORDER BY n DESC, tok ASC) AS rn
    FROM counts
  ) WHERE rn <= {LANG_TOPK}
),
scores AS MATERIALIZED (
  SELECT t.doc_id, p.lang AS plang, sum(p.n) AS s
  FROM tok t JOIN prof p ON p.tok = t.tok GROUP BY 1, 2
),
best AS (
  SELECT doc_id, plang FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY s DESC, plang ASC) AS rn
    FROM scores
  ) WHERE rn = 1
)
"""


def _lang_pred_sql() -> str:
    return (
        f"WITH {_lang_ctes()} "
        "SELECT d.doc_id, d.lang, COALESCE(b.plang, "
        "(SELECT min(lang) FROM documents)) AS pred_lang "
        "FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id "
        "ORDER BY d.doc_id"
    )

_GRAPH_CTES = """
items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
verts AS MATERIALIZED (SELECT DISTINCT l_partkey AS vid FROM lineitem),
pairs AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(count(*) AS DOUBLE) AS weight
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
sym AS MATERIALIZED (
  SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs
),
deg AS MATERIALIZED (
  SELECT v.vid, count(e.src) AS outdeg
  FROM verts v LEFT JOIN sym e ON e.src = v.vid GROUP BY v.vid
),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)
"""


def _pagerank_sql() -> str:
    # Literals on purpose (twin-independence, the FH_DIM lesson): these
    # must equal the engine's ALPHA / PR_ITERS.  A module-constant edit
    # now breaks the oracle LOUDLY instead of shifting both sides
    # together; update the literal consciously when semantics change.
    ALPHA = 0.85
    PR_ITERS = 8
    steps = [
        "p0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT n FROM nn) AS val FROM verts)"
    ]
    for k in range(PR_ITERS):
        steps.append(f"""
agg{k} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(p.val / d.outdeg) AS s
  FROM sym e JOIN p{k} p ON p.vid = e.src JOIN deg d ON d.vid = e.src
  GROUP BY e.dst
),
dang{k} AS MATERIALIZED (
  SELECT COALESCE(sum(p.val), 0.0) AS dm
  FROM p{k} p JOIN deg d ON d.vid = p.vid WHERE d.outdeg = 0
),
p{k + 1} AS MATERIALIZED (
  SELECT v.vid,
         (1.0 - {ALPHA})/(SELECT n FROM nn)
         + {ALPHA} * (COALESCE(a.s, 0.0) + (SELECT dm FROM dang{k})/(SELECT n FROM nn)) AS val
  FROM verts v LEFT JOIN agg{k} a ON a.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT vid, ROUND(val, 6) AS pagerank FROM p{PR_ITERS} ORDER BY vid"
    )


def _top_pagerank_sql() -> str:
    inner = _pagerank_sql().replace(" ORDER BY vid", "")
    return (
        f"SELECT vid, pagerank FROM ({inner}) "
        f"ORDER BY pagerank DESC, vid ASC LIMIT {TOP_K}"
    )


def _cc_sql() -> str:
    # literal on purpose (twin-independence) — must equal engine CC_ITERS
    CC_ITERS = 32
    steps = ["l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)"]
    for k in range(CC_ITERS):
        steps.append(f"""
m{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM sym e JOIN l{k} l ON l.vid = e.src GROUP BY e.dst
),
l{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM l{k} v LEFT JOIN m{k} m ON m.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT vid, label FROM l{CC_ITERS} ORDER BY vid"
    )


def _bfs_sql() -> str:
    big = 1 << 60
    steps = [
        f"""bsrc AS MATERIALIZED (SELECT min(vid) AS s FROM verts),
d0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = (SELECT s FROM bsrc) THEN 0
              ELSE {big} END AS depth FROM verts)"""
    ]
    for k in range(BFS_ITERS):
        steps.append(f"""
bm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.depth + 1) AS md
  FROM sym e JOIN d{k} l ON l.vid = e.src AND l.depth < {big}
  GROUP BY e.dst
),
d{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.depth, COALESCE(m.md, v.depth)) AS depth
  FROM d{k} v LEFT JOIN bm{k} m ON m.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT vid, CASE WHEN depth >= {big} THEN -1 ELSE depth END AS depth "
        f"FROM d{BFS_ITERS} ORDER BY vid"
    )


def _ppr_sql_body() -> str:
    """The unrolled personalized-PageRank CTE chain (psrc, q0..qN) —
    shared by the ppr_k8 oracle and the sweep-cut oracle."""
    pers = "CASE WHEN v.vid = (SELECT s FROM psrc) THEN 1.0 ELSE 0.0 END"
    steps = [
        """psrc AS MATERIALIZED (SELECT min(vid) AS s FROM verts),
q0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = (SELECT s FROM psrc) THEN 1.0 ELSE 0.0 END AS val
  FROM verts)"""
    ]
    for k in range(PPR_ITERS):
        steps.append(f"""
qagg{k} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(p.val / d.outdeg) AS s
  FROM sym e JOIN q{k} p ON p.vid = e.src JOIN deg d ON d.vid = e.src
  GROUP BY e.dst
),
qdang{k} AS MATERIALIZED (
  SELECT COALESCE(sum(p.val), 0.0) AS dm
  FROM q{k} p JOIN deg d ON d.vid = p.vid WHERE d.outdeg = 0
),
q{k + 1} AS MATERIALIZED (
  SELECT v.vid,
         (1.0 - {ALPHA}) * {pers}
         + {ALPHA} * (COALESCE(a.s, 0.0) + (SELECT dm FROM qdang{k}) * {pers}) AS val
  FROM verts v LEFT JOIN qagg{k} a ON a.vid = v.vid
)""")
    return ",".join(steps)


def _ppr_sql() -> str:
    """Unrolled personalized-PageRank oracle: teleport AND dangling
    mass restart at the seed (min vid); same dataflow shape as
    _pagerank_sql."""
    return (
        f"WITH {_GRAPH_CTES}, {_ppr_sql_body()} "
        f"SELECT vid, ROUND(val, 6) AS ppr FROM q{PPR_ITERS} ORDER BY vid"
    )


def _kcore_sql() -> str:
    """Unrolled simultaneous-peeling CTE: c_{{t+1}} = vertices with ≥ k
    neighbors still in c_t.  The k-core is the unique fixpoint, reached
    well within KCORE_ITERS rounds (the engine asserts its own round
    count against the same bound)."""
    steps = ["c0 AS MATERIALIZED (SELECT vid FROM verts)"]
    for t in range(KCORE_ITERS):
        steps.append(f"""
c{t + 1} AS MATERIALIZED (
  SELECT e.src AS vid FROM sym e
  JOIN c{t} s ON s.vid = e.src JOIN c{t} d ON d.vid = e.dst
  GROUP BY e.src HAVING count(*) >= {KCORE_K}
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT v.vid, CAST(CASE WHEN c.vid IS NULL THEN 0 ELSE 1 END AS BIGINT)"
        f" AS in_core "
        f"FROM verts v LEFT JOIN c{KCORE_ITERS} c ON c.vid = v.vid ORDER BY v.vid"
    )


def _eigencentrality_sql() -> str:
    """Unrolled L1-normalized power iteration: c' = (Σ_in c)/Z with
    Z = Σ_u c(u)·outdeg(u) (total message mass)."""
    steps = [
        "e0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT n FROM nn) AS val FROM verts)"
    ]
    for k in range(EC_ITERS):
        steps.append(f"""
ez{k} AS MATERIALIZED (
  SELECT COALESCE(sum(p.val * d.outdeg), 0.0) AS z
  FROM e{k} p JOIN deg d ON d.vid = p.vid
),
eagg{k} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(p.val) AS s
  FROM sym e JOIN e{k} p ON p.vid = e.src GROUP BY e.dst
),
e{k + 1} AS MATERIALIZED (
  SELECT v.vid,
         CASE WHEN (SELECT z FROM ez{k}) > 0
              THEN COALESCE(a.s, 0.0) / (SELECT z FROM ez{k})
              ELSE 0.0 END AS val
  FROM verts v LEFT JOIN eagg{k} a ON a.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT vid, ROUND(val, 6) AS centrality FROM e{EC_ITERS} ORDER BY vid"
    )


def _bc_sql() -> str:
    """Unrolled sampled-source Brandes: per source — BFS levels with
    path counts sigma (level CTEs lv/sg), then per-level dependency
    accumulation from the deepest unrolled level down (dl CTEs)."""
    parts = []
    finals = []
    for i in range(BC_SOURCES):
        parts.append(f"""
bs{i} AS MATERIALIZED (SELECT vid AS s FROM verts ORDER BY vid LIMIT 1 OFFSET {i}),
lv{i}_0 AS MATERIALIZED (SELECT s AS vid FROM bs{i}),
vis{i}_0 AS MATERIALIZED (SELECT vid FROM lv{i}_0),
sg{i}_0 AS MATERIALIZED (SELECT vid, 1.0 AS sigma FROM lv{i}_0)""")
        for r in range(1, BC_D + 1):
            parts.append(f"""
lv{i}_{r} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS vid
  FROM sym e JOIN lv{i}_{r - 1} p ON p.vid = e.src
  LEFT JOIN vis{i}_{r - 1} w ON w.vid = e.dst WHERE w.vid IS NULL
),
vis{i}_{r} AS MATERIALIZED (
  SELECT vid FROM vis{i}_{r - 1} UNION ALL SELECT vid FROM lv{i}_{r}
),
sg{i}_{r} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(p.sigma) AS sigma
  FROM sym e JOIN sg{i}_{r - 1} p ON p.vid = e.src
  JOIN lv{i}_{r} t ON t.vid = e.dst GROUP BY e.dst
)""")
        parts.append(f"""
dl{i}_{BC_D} AS MATERIALIZED (SELECT vid, 0.0 AS delta FROM lv{i}_{BC_D})""")
        for r in range(BC_D - 1, 0, -1):
            parts.append(f"""
dl{i}_{r} AS MATERIALIZED (
  SELECT p.vid, p.sigma * sum((1.0 + COALESCE(d.delta, 0.0)) / c.sigma) AS delta
  FROM sg{i}_{r} p JOIN sym e ON e.src = p.vid
  JOIN sg{i}_{r + 1} c ON c.vid = e.dst
  LEFT JOIN dl{i}_{r + 1} d ON d.vid = e.dst
  GROUP BY p.vid, p.sigma
)""")
        finals.append(" UNION ALL ".join(
            f"SELECT vid, delta FROM dl{i}_{r}" for r in range(1, BC_D + 1)
        ))
    body = ",".join(parts)
    union = " UNION ALL ".join(finals)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT v.vid, ROUND(COALESCE(b.bc, 0.0), 6) AS bc "
        f"FROM verts v LEFT JOIN "
        f"(SELECT vid, sum(delta) AS bc FROM ({union}) GROUP BY vid) b "
        f"ON b.vid = v.vid ORDER BY v.vid"
    )


def _harmonic_sql() -> str:
    """Unrolled multi-source BFS levels: per round r the per-vertex
    count of sources first arriving at r contributes count/r — exactly
    the engine's popcount(new_bits)/r accumulation."""
    parts = [f"""
hs AS MATERIALIZED (SELECT vid AS s FROM verts ORDER BY vid LIMIT {HC_SOURCES}),
hr0 AS MATERIALIZED (SELECT s, s AS vid FROM hs),
hv0 AS MATERIALIZED (SELECT s, vid FROM hr0)"""]
    for r in range(1, HC_D + 1):
        parts.append(f"""
hr{r} AS MATERIALIZED (
  SELECT p.s, e.dst AS vid
  FROM sym e JOIN hr{r - 1} p ON p.vid = e.src
  LEFT JOIN hv{r - 1} w ON w.s = p.s AND w.vid = e.dst
  WHERE w.vid IS NULL GROUP BY p.s, e.dst
),
hv{r} AS MATERIALIZED (
  SELECT s, vid FROM hv{r - 1} UNION ALL SELECT s, vid FROM hr{r}
)""")
    union = " UNION ALL ".join(
        f"SELECT vid, CAST(count(*) AS DOUBLE) / {r} AS contrib "
        f"FROM hr{r} GROUP BY vid"
        for r in range(1, HC_D + 1)
    )
    body = ",".join(parts)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT v.vid, ROUND(COALESCE(h.h, 0.0), 6) AS harmonic "
        f"FROM verts v LEFT JOIN "
        f"(SELECT vid, sum(contrib) AS h FROM ({union}) GROUP BY vid) h "
        f"ON h.vid = v.vid ORDER BY v.vid"
    )


def _geo_sql() -> str:
    """Unrolled label-once location propagation: round r locates every
    unlocated vertex with >=1 neighbor located before r at the MEAN of
    those neighbors (AVG = exact-sum/count, 6dp-rounded both sides)."""
    steps = [
        """g0 AS MATERIALIZED (
  SELECT vid, CAST(vid % 180 AS DOUBLE) AS lat, CAST(vid % 360 AS DOUBLE) AS lon
  FROM verts WHERE vid % 7 = 0)"""
    ]
    for r in range(GEO_ITERS):
        steps.append(f"""
gn{r} AS MATERIALIZED (
  SELECT e.dst AS vid, avg(l.lat) AS lat, avg(l.lon) AS lon
  FROM sym e JOIN g{r} l ON l.vid = e.src
  LEFT JOIN g{r} already ON already.vid = e.dst
  WHERE already.vid IS NULL
  GROUP BY e.dst
),
g{r + 1} AS MATERIALIZED (
  SELECT vid, lat, lon FROM g{r} UNION ALL SELECT vid, lat, lon FROM gn{r}
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT v.vid, COALESCE(ROUND(g.lat, 6), -1.0) AS lat, "
        f"COALESCE(ROUND(g.lon, 6), -1.0) AS lon "
        f"FROM verts v LEFT JOIN g{GEO_ITERS} g ON g.vid = v.vid ORDER BY v.vid"
    )


def _tfidf_sql() -> str:
    return """
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS MATERIALIZED (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
),
df AS MATERIALIZED (SELECT token, count(*) AS df FROM tf GROUP BY 1),
nd AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
sc AS MATERIALIZED (
  SELECT t.doc_id, t.token,
         t.tf * (SELECT n FROM nd) / d.df AS score
  FROM tf t JOIN df d USING (token)
),
rr AS (
  SELECT doc_id, token, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token ASC) AS rn
  FROM sc
)
SELECT doc_id, token, ROUND(score, 6) AS score FROM rr WHERE rn = 1
ORDER BY doc_id"""


def _coloring_sql() -> str:
    """Unrolled Luby-greedy coloring over the weight≥COLOR_W subgraph.
    The packed (priority, vid) key is exact HUGEINT arithmetic mirroring
    the engine's uint64 kernel: ((v + (r+1)·K)·K) % 2³¹ · 2³² + v."""
    K = 2654435761

    def packed(col: str, r: int) -> str:
        return (
            f"CAST((CAST({col} + {(r + 1) * K} AS HUGEINT) * {K}) % 2147483648"
            f" * 4294967296 + {col} AS BIGINT)"
        )

    steps = [
        f"""cw AS MATERIALIZED (SELECT src, dst FROM pairs WHERE weight >= {COLOR_W}),
symw AS MATERIALIZED (
  SELECT src, dst FROM cw UNION ALL SELECT dst AS src, src AS dst FROM cw
),
u0 AS MATERIALIZED (SELECT vid FROM verts)"""
    ]
    for r in range(COLOR_ITERS):
        steps.append(f"""
pm{r} AS MATERIALIZED (
  SELECT e.dst AS vid, max({packed('e.src', r)}) AS mx
  FROM symw e JOIN u{r} s ON s.vid = e.src GROUP BY e.dst
),
w{r} AS MATERIALIZED (
  SELECT v.vid FROM u{r} v LEFT JOIN pm{r} m ON m.vid = v.vid
  WHERE m.mx IS NULL OR m.mx < {packed('v.vid', r)}
),
u{r + 1} AS MATERIALIZED (
  SELECT v.vid FROM u{r} v LEFT JOIN w{r} w ON w.vid = v.vid
  WHERE w.vid IS NULL
)""")
    body = ",".join(steps)
    union = " UNION ALL ".join(
        f"SELECT vid, {r} AS color FROM w{r}" for r in range(COLOR_ITERS)
    )
    return f"WITH {_GRAPH_CTES}, {body} SELECT vid, color FROM ({union}) ORDER BY vid"


def _spgemm_sql() -> str:
    return f"""
WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p2 AS MATERIALIZED (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(count(*) AS DOUBLE) AS weight
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT a.src, b.dst, sum(a.weight * b.weight) AS weight
FROM p2 a JOIN p2 b ON a.dst = b.src
WHERE a.src % {SPGEMM_MOD} = 0
GROUP BY 1, 2 ORDER BY 1, 2"""


def _sssp_sql_body() -> str:
    """Bellman-Ford unrolled CTE chain (symw, wsrc, w0..wK) over the
    weighted symmetrized edge set (weight = #shared orders, from the
    ``pairs`` CTE) — shared by the sssp_dist and sssp_parent oracles.
    Same shape as ``_bfs_sql`` but relaxing ``dist + weight`` instead
    of ``depth + 1``; distances are integer-valued sums of integer
    weights, exact in float64 on both sides."""
    big = float(1 << 60)
    steps = [
        f"""symw AS MATERIALIZED (
  SELECT src, dst, weight FROM pairs
  UNION ALL SELECT dst AS src, src AS dst, weight FROM pairs
),
wsrc AS MATERIALIZED (SELECT min(vid) AS s FROM verts),
w0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = (SELECT s FROM wsrc) THEN 0.0
              ELSE {big} END AS dist FROM verts)"""
    ]
    for k in range(SSSP_ITERS):
        steps.append(f"""
wm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.dist + e.weight) AS md
  FROM symw e JOIN w{k} l ON l.vid = e.src AND l.dist < {big}
  GROUP BY e.dst
),
w{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.dist, COALESCE(m.md, v.dist)) AS dist
  FROM w{k} v LEFT JOIN wm{k} m ON m.vid = v.vid
)""")
    return ",".join(steps)


def _sssp_sql() -> str:
    big = float(1 << 60)
    return (
        f"WITH {_GRAPH_CTES}, {_sssp_sql_body()} "
        f"SELECT vid, CASE WHEN dist >= {big} THEN -1.0 ELSE dist END AS dist "
        f"FROM w{SSSP_ITERS} ORDER BY vid"
    )


def _sssp_parent_sql() -> str:
    big = float(1 << 60)
    return (
        f"WITH {_GRAPH_CTES}, {_sssp_sql_body()}, "
        f"fin AS (SELECT vid, dist FROM w{SSSP_ITERS}), "
        "par AS (SELECT e.dst AS vid, CAST(min(e.src) AS BIGINT) AS "
        "parent FROM symw e JOIN fin du ON du.vid = e.src "
        "JOIN fin dv ON dv.vid = e.dst "
        f"WHERE du.dist < {big} AND du.dist + e.weight = dv.dist "
        "GROUP BY 1) "
        "SELECT v.vid, CASE WHEN v.vid = (SELECT s FROM wsrc) THEN v.vid "
        "WHEN p.parent IS NOT NULL THEN p.parent ELSE -1 END AS parent "
        "FROM fin v LEFT JOIN par p ON p.vid = v.vid ORDER BY v.vid"
    )


def _widest_sql() -> str:
    """Max-min (bottleneck) Bellman-Ford unrolled over the same
    weighted symmetrized edge set as ``_sssp_sql_body`` — width(v) =
    max over paths of min edge weight, width(source) = BIG sentinel,
    unreachable stays 0."""
    big = float(1 << 60)
    steps = [
        f"""symw AS MATERIALIZED (
  SELECT src, dst, weight FROM pairs
  UNION ALL SELECT dst AS src, src AS dst, weight FROM pairs
),
wsrc AS MATERIALIZED (SELECT min(vid) AS s FROM verts),
x0 AS MATERIALIZED (
  SELECT vid, CASE WHEN vid = (SELECT s FROM wsrc) THEN {big}
              ELSE 0.0 END AS width FROM verts)"""
    ]
    for k in range(SSSP_ITERS):
        steps.append(f"""
xm{k} AS MATERIALIZED (
  SELECT e.dst AS vid, max(least(l.width, e.weight)) AS mw
  FROM symw e JOIN x{k} l ON l.vid = e.src AND l.width > 0
  GROUP BY e.dst
),
x{k + 1} AS MATERIALIZED (
  SELECT v.vid, greatest(v.width, COALESCE(m.mw, v.width)) AS width
  FROM x{k} v LEFT JOIN xm{k} m ON m.vid = v.vid
)""")
    body = ",".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT vid, width FROM x{SSSP_ITERS} ORDER BY vid"
    )


def _component_sizes_sql() -> str:
    inner = _cc_sql().replace(" ORDER BY vid", "")
    return (
        f"SELECT label, count(*) AS size FROM ({inner}) GROUP BY label ORDER BY label"
    )


def _lp_sql_body() -> str:
    """Unrolled synchronous-LP CTE chain (b0..bK) — shared by the
    lp_k4 oracle and the modularity oracle."""
    steps = ["b0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)"]
    for k in range(LP_ITERS):
        steps.append(f"""
c{k} AS MATERIALIZED (
  SELECT e.dst AS vid, l.label, count(*) AS c
  FROM sym e JOIN b{k} l ON l.vid = e.src GROUP BY e.dst, l.label
),
w{k} AS MATERIALIZED (
  SELECT vid, label FROM (
    SELECT vid, label,
           row_number() OVER (PARTITION BY vid ORDER BY c DESC, label ASC) AS rn
    FROM c{k}
  ) WHERE rn = 1
),
b{k + 1} AS MATERIALIZED (
  SELECT v.vid, COALESCE(w.label, v.label) AS label
  FROM b{k} v LEFT JOIN w{k} w ON w.vid = v.vid
)""")
    return ",".join(steps)


def _lp_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, {_lp_sql_body()} "
        f"SELECT vid, label FROM b{LP_ITERS} ORDER BY vid"
    )


def _lp_modularity_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, {_lp_sql_body()}, "
        f"lab AS MATERIALIZED (SELECT vid, label FROM b{LP_ITERS}), "
        "ic AS (SELECT la.label, CAST(count(*) AS BIGINT) AS e_c "
        "FROM pairs p JOIN lab la ON la.vid = p.src "
        "JOIN lab lb ON lb.vid = p.dst WHERE la.label = lb.label "
        "GROUP BY 1), "
        "dc AS (SELECT la.label, CAST(sum(d.outdeg) AS BIGINT) AS d_c "
        "FROM deg d JOIN lab la ON la.vid = d.vid GROUP BY 1) "
        "SELECT dc.label, CAST(COALESCE(ic.e_c, 0) AS BIGINT) AS e_c, "
        "dc.d_c, (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS m "
        "FROM dc LEFT JOIN ic ON ic.label = dc.label ORDER BY dc.label"
    )


_ORIENTED_CTE = """
oriented AS MATERIALIZED (
  SELECT CASE WHEN (da.outdeg < db.outdeg)
              OR (da.outdeg = db.outdeg AND p.src < p.dst)
         THEN p.src ELSE p.dst END AS u,
         CASE WHEN (da.outdeg < db.outdeg)
              OR (da.outdeg = db.outdeg AND p.src < p.dst)
         THEN p.dst ELSE p.src END AS v
  FROM pairs p JOIN deg da ON da.vid = p.src JOIN deg db ON db.vid = p.dst
),
tris AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM oriented e1
  JOIN oriented e2 ON e2.u = e1.v
  JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
)
"""


def _triangles_total_sql() -> str:
    return (
        f"WITH {_GRAPH_CTES}, {_ORIENTED_CTE} "
        f"SELECT count(*) AS triangles FROM tris"
    )


def _triangles_per_vertex_sql() -> str:
    return f"""
WITH {_GRAPH_CTES}, {_ORIENTED_CTE},
corners AS (
  SELECT a AS vid FROM tris UNION ALL
  SELECT b FROM tris UNION ALL
  SELECT c FROM tris
)
SELECT v.vid, CAST(count(c.vid) AS BIGINT) AS triangles
FROM verts v LEFT JOIN corners c ON c.vid = v.vid
GROUP BY v.vid ORDER BY v.vid
"""


def _spmv_sql() -> str:
    return f"""
WITH {_GRAPH_CTES},
yagg AS (
  SELECT dst AS vid, sum(weight * ((src % 97) / 97.0)) AS y
  FROM pairs GROUP BY dst
)
SELECT v.vid, ROUND(COALESCE(a.y, 0.0), 6) AS y
FROM verts v LEFT JOIN yagg a ON a.vid = v.vid ORDER BY v.vid
"""


def _hits_sql() -> str:
    """Unrolled HITS: a_{k+1} = in-sum of h_k, h_{k+1} = out-sum of
    a_{k+1} over the directed ``pairs`` CTE; every intermediate is an
    exact integer, so the single final normalize+round matches the
    engine bit-for-bit."""
    steps = ["h0 AS MATERIALIZED (SELECT vid, 1.0 AS v FROM verts)"]
    for k in range(HITS_K):
        steps.append(f"""a{k + 1} AS MATERIALIZED (
  SELECT v.vid, COALESCE(x.s, 0.0) AS v FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, sum(h.v) AS s
    FROM pairs e JOIN h{k} h ON h.vid = e.src GROUP BY e.dst
  ) x ON x.vid = v.vid)""")
        steps.append(f"""h{k + 1} AS MATERIALIZED (
  SELECT v.vid, COALESCE(y.s, 0.0) AS v FROM verts v LEFT JOIN (
    SELECT e.src AS vid, sum(a.v) AS s
    FROM pairs e JOIN a{k + 1} a ON a.vid = e.dst GROUP BY e.src
  ) y ON y.vid = v.vid)""")
    body = ",\n".join(steps)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT h.vid, "
        f"ROUND(h.v / (SELECT sum(v) FROM h{HITS_K}), 6) AS hub, "
        f"ROUND(a.v / (SELECT sum(v) FROM a{HITS_K}), 6) AS auth "
        f"FROM h{HITS_K} h JOIN a{HITS_K} a ON a.vid = h.vid "
        f"ORDER BY h.vid"
    )


def _scc_sql() -> str:
    """DuckDB twin of ``_q_scc``: orient the induced co-purchase edges
    by the shared SplitMix64 parity bit, compute the reachability
    closure with a recursive CTE (tractable on the driver's small
    inputs — the engine itself never materializes closure pairs), and
    label every vertex with the min vid among mutually-reachable
    vertices."""
    mix = (SAMPLE_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1)
    chain = _sm64_ctes(
        "sc", "src, dst",
        f"CAST(src AS HUGEINT) * 4294967296 + dst + {mix}",
        f"(SELECT src, dst FROM pairs "
        f"WHERE src % {SCC_MOD} = 0 AND dst % {SCC_MOD} = 0)",
    )
    return f"""WITH RECURSIVE {_scc_ctes(chain)}
SELECT vid, CAST(scc AS BIGINT) AS scc FROM labs ORDER BY vid
"""


def _scc_ctes(chain: str, sparse: int | None = None) -> str:
    """Shared SCC CTE body (dedges → reach → mutual → labs); used by
    the scc_labels and scc_condensed_depth oracles.  ``sparse`` adds
    the condensation query's (z >> 1) % m = 0 edge filter."""
    flt = f"WHERE (z >> 1) % {sparse} = 0" if sparse else ""
    return f"""{_GRAPH_CTES}, {chain},
dedges AS MATERIALIZED (
  SELECT CASE WHEN z % 2 = 0 THEN src ELSE dst END AS u,
         CASE WHEN z % 2 = 0 THEN dst ELSE src END AS v
  FROM sc3 {flt}
),
reach AS (
  SELECT u, v FROM dedges
  UNION
  SELECT r.u, d.v FROM reach r JOIN dedges d ON d.u = r.v
),
mutual AS (
  SELECT a.u AS x, a.v AS y
  FROM reach a JOIN reach b ON b.u = a.v AND b.v = a.u
),
labs AS (
  SELECT w.vid, LEAST(w.vid, COALESCE(min(m.y), w.vid)) AS scc
  FROM (SELECT vid FROM verts WHERE vid % {SCC_MOD} = 0) w
  LEFT JOIN mutual m ON m.x = w.vid
  GROUP BY w.vid
)"""


def _msf_sql() -> str:
    """MSF (n_edges, total_weight) via the threshold sweep: for every
    integer threshold t ≤ MSF_W_CAP, C(t) = #components of the subgraph
    with edge weight ≤ t (unrolled hash-min CC with a pointer-jump step
    per round — converges for diameters up to ~2^MSF_CC_ROUNDS);
    n_edges = |V| − C(W_CAP), total = Σ_t t·(C(t−1) − C(t)).  Exact for
    integer weights ≤ MSF_W_CAP (asserted engine-side in ``_q_msf``)."""
    steps = [
        "symw AS MATERIALIZED (SELECT src, dst, weight FROM pairs "
        "UNION ALL SELECT dst AS src, src AS dst, weight FROM pairs)"
    ]
    for t in range(1, MSF_W_CAP + 1):
        steps.append(
            f"e{t} AS MATERIALIZED (SELECT src, dst FROM symw "
            f"WHERE weight <= {t})"
        )
        steps.append(f"l{t}_0 AS (SELECT vid, vid AS label FROM verts)")
        cur = f"l{t}_0"
        for k in range(MSF_CC_ROUNDS):
            steps.append(f"""m{t}_{k} AS MATERIALIZED (
  SELECT e.dst AS vid, min(l.label) AS ml
  FROM e{t} e JOIN {cur} l ON l.vid = e.src GROUP BY e.dst)""")
            steps.append(f"""a{t}_{k} AS MATERIALIZED (
  SELECT v.vid, least(v.label, COALESCE(m.ml, v.label)) AS label
  FROM {cur} v LEFT JOIN m{t}_{k} m ON m.vid = v.vid)""")
            steps.append(f"""l{t}_{k + 1} AS MATERIALIZED (
  SELECT v.vid, least(v.label, l2.label) AS label
  FROM a{t}_{k} v JOIN a{t}_{k} l2 ON l2.vid = v.label)""")
            cur = f"l{t}_{k + 1}"
        steps.append(f"c{t} AS (SELECT count(DISTINCT label) AS c FROM {cur})")
    body = ",\n".join(steps)
    terms = []
    for t in range(1, MSF_W_CAP + 1):
        prev = (
            "(SELECT count(*) FROM verts)" if t == 1
            else f"(SELECT c FROM c{t - 1})"
        )
        terms.append(f"{t} * ({prev} - (SELECT c FROM c{t}))")
    total = " + ".join(terms)
    return (
        f"WITH {_GRAPH_CTES}, {body} "
        f"SELECT CAST((SELECT count(*) FROM verts) - "
        f"(SELECT c FROM c{MSF_W_CAP}) AS BIGINT) AS n_edges, "
        f"CAST({total} AS DOUBLE) AS total_weight"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "events_hourly": (
            "SELECT epoch_us(ts) // 3600000000 AS window, event_type, "
            "count(*) AS n_events, min(event_id) AS min_id, "
            "max(event_id) AS max_id "
            "FROM events GROUP BY 1, 2"
        ),
        "events_hopping": (
            f"SELECT (epoch_us(ts) // {HOP_MIN * 60 * 1000000}) - o.off "
            "AS window, event_type, count(*) AS n_events, "
            "min(event_id) AS min_id, max(event_id) AS max_id "
            "FROM events, LATERAL (SELECT unnest(range(0, "
            f"{HOP_SIZE_MIN // HOP_MIN})) AS off) o "
            "GROUP BY 1, 2"
        ),
        "top_docs_per_lang": (
            "SELECT lang, doc_id, n_chars, rank FROM ("
            "  SELECT lang, doc_id, length(text) AS n_chars, "
            "    row_number() OVER (PARTITION BY lang "
            "      ORDER BY length(text) DESC, doc_id ASC) AS rank "
            "  FROM documents"
            f") WHERE rank <= {TOPK_PER_LANG} ORDER BY lang, rank"
        ),
        "quantity_quantiles": " UNION ALL ".join(
            f"SELECT CAST({q} AS DOUBLE) AS q, "
            f"CAST(quantile_disc(l_quantity, {q}) AS BIGINT) AS value "
            "FROM lineitem"
            for q in QUANTILES
        ),
        "quantity_quantiles_cont": " UNION ALL ".join(
            f"SELECT CAST({q} AS DOUBLE) AS q, "
            f"CAST(quantile_cont(l_quantity, {q}) AS DOUBLE) AS value "
            "FROM lineitem"
            for q in [0.25, 0.5, 0.75, 0.875]
        ),
        "price_quantiles_sampled": _price_quantiles_sampled_sql(),
        "orders_range_parts": _orders_range_parts_sql(),
        "events_throttled": (
            "SELECT event_id, user_id, event_type FROM ("
            "SELECT event_id, user_id, event_type, "
            "ts - LAG(ts) OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) AS gap FROM events) "
            f"WHERE gap IS NULL OR gap > INTERVAL {THROTTLE_MIN} MINUTE "
            "ORDER BY event_id"
        ),
        "props_field_stats": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(v) AS BIGINT) AS sum_v, "
            "CAST(min(v) AS BIGINT) AS min_v, "
            "CAST(max(v) AS BIGINT) AS max_v FROM ("
            "SELECT event_type, TRY_CAST(regexp_extract(props, "
            f"'{PROPS_PATTERN}', 1) AS BIGINT) AS v FROM events) "
            "WHERE v IS NOT NULL GROUP BY 1 ORDER BY 1"
        ),
        "token_counts": (
            "SELECT doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) "
            "AS n_re_tokens FROM documents"
        ),
        "sampled_docs": _sampled_docs_sql(),
        "orders_checksum": _orders_checksum_sql(),
        "stratified_docs": _stratified_docs_sql(),
        "mixed_corpus": _mixed_corpus_sql(),
        "pagerank_weighted_k8": _pagerank_weighted_sql(),
        "degree_hist": (
            f"WITH {_GRAPH_CTES} "
            "SELECT outdeg AS degree, CAST(count(*) AS BIGINT) AS n_vertices "
            "FROM deg GROUP BY outdeg"
        ),
        "edge_jaccard": _edge_jaccard_sql(),
        "ktruss12": _ktruss_sql(),
        "contaminated_docs": _contaminated_docs_sql(),
        "neighbor_sample_k3": _neighbor_sample_sql(),
        "random_walks": _random_walks_sql(),
        "skipgram_pairs": _skipgram_sql(),
        "node2vec_walks": _node2vec_sql(),
        "top_tokens": (
            "SELECT token, CAST(count(*) AS BIGINT) AS n "
            "FROM (SELECT unnest(string_split(text, ' ')) AS token "
            "FROM documents) GROUP BY token "
            f"ORDER BY n DESC, token LIMIT {HH_K}"
        ),
        "event_gaps": (
            "SELECT event_id, user_id, "
            "COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us "
            "FROM events"
        ),
        "clustering_coeff": _clustering_coeff_sql(),
        "events_in_windows": (
            "SELECT l.event_id AS event_id, "
            "r.event_id AS window_event_id "
            "FROM events l JOIN events r ON l.user_id = r.user_id "
            "AND r.event_type = 'purchase' "
            "AND l.ts >= r.ts "
            f"AND epoch_us(l.ts) < epoch_us(r.ts) + {WINDOW_US} "
            "AND l.event_id <> r.event_id"
        ),
        "parts_per_order": (
            "SELECT l_orderkey, "
            "CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts "
            "FROM lineitem GROUP BY l_orderkey"
        ),
        "lang_char_quantiles": " UNION ALL ".join(
            f"SELECT lang, CAST({q} AS DOUBLE) AS q, "
            f"CAST(quantile_disc(n_chars, {q}) AS BIGINT) AS value "
            "FROM documents GROUP BY lang"
            for q in QUANTILES
        ),
        "lang_char_quantiles_cont": " UNION ALL ".join(
            f"SELECT lang, CAST({q} AS DOUBLE) AS q, "
            f"CAST(quantile_cont(n_chars, {q}) AS DOUBLE) AS value "
            "FROM documents GROUP BY lang"
            for q in DYADIC_QUANTILES
        ),
        "rolling_value_sum": (
            "SELECT event_id, "
            "CAST(sum(cents) OVER w AS BIGINT) AS roll_sum, "
            "CAST(count(*) OVER w AS BIGINT) AS roll_n "
            "FROM (SELECT event_id, user_id, ts, "
            "  CAST(floor(value * 100) AS BIGINT) AS cents FROM events) "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            f"ROWS BETWEEN {ROLL_K - 1} PRECEDING AND CURRENT ROW)"
        ),
        "user_running_total": (
            "SELECT event_id, "
            "CAST(sum(cents) OVER w AS BIGINT) AS run_sum, "
            "CAST(count(*) OVER w AS BIGINT) AS run_n "
            "FROM (SELECT event_id, user_id, ts, "
            "  CAST(floor(value * 100) AS BIGINT) AS cents FROM events) "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING)"
        ),
        "user_range_sum": (
            "SELECT event_id, "
            "CAST(sum(cents) OVER w AS BIGINT) AS range_sum, "
            "CAST(count(*) OVER w AS BIGINT) AS range_n "
            "FROM (SELECT event_id, user_id, ts, "
            "  CAST(floor(value * 100) AS BIGINT) AS cents FROM events) "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)"
        ),
        "quantity_moments": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(q) AS BIGINT) AS sum_v, "
            "CAST(sum(q * q) AS BIGINT) AS sumsq_v "
            "FROM (SELECT l_returnflag, "
            "CAST(ROUND(l_quantity, 0) AS BIGINT) AS q FROM lineitem) "
            "GROUP BY 1 ORDER BY 1"
        ),
        "qty_price_comoments": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(q) AS BIGINT) AS sum_x, "
            "CAST(sum(p) AS BIGINT) AS sum_y, "
            "CAST(sum(q * q) AS BIGINT) AS sum_xx, "
            "CAST(sum(p * p) AS BIGINT) AS sum_yy, "
            "CAST(sum(q * p) AS BIGINT) AS sum_xy "
            "FROM (SELECT l_returnflag, "
            "CAST(ROUND(l_quantity, 0) AS BIGINT) AS q, "
            "CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS p "
            "FROM lineitem) GROUP BY 1 ORDER BY 1"
        ),
        "spearman_qty_price": _spearman_qty_price_sql(),
        "kendall_qty_disc": _kendall_qty_disc_sql(),
        "chisq_type_hour": _chisq_type_hour_sql(),
        "qty_emd_returned": _qty_emd_returned_sql(),
        "hourly_acf": _hourly_acf_sql(),
        "phrase_hits": _phrase_hits_sql(),
        "weighted_sample_parts": _weighted_sample_parts_sql(),
        "orders_profile": " UNION ALL ".join(
            f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS n_null, CAST(min({c}) AS BIGINT) AS min_v, "
            f"CAST(max({c}) AS BIGINT) AS max_v, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS ndv FROM orders"
            for c in PROFILE_COLS
        ),
        "last_order_asof": (
            "SELECT e.event_id, "
            "(SELECT r.o_orderkey FROM orders r "
            " WHERE r.o_custkey = e.user_id AND r.o_orderdate <= e.ts "
            " ORDER BY r.o_orderdate DESC, r.o_orderkey DESC LIMIT 1) "
            "AS last_orderkey "
            "FROM events e"
        ),
        "user_intervals": _user_intervals_sql(),
        "user_lag_moments": _user_lag_moments_sql(),
        "user_cusum": _user_cusum_sql(),
        "user_sessions": (
            "WITH o AS MATERIALIZED ("
            "  SELECT user_id, epoch_us(ts) AS t, event_id, "
            "    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL "
            "      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > "
            f"      {SESSION_GAP_MIN * 60 * 1000000} "
            "    THEN 1 ELSE 0 END AS is_new "
            "  FROM events "
            "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
            "), s AS MATERIALIZED ("
            "  SELECT user_id, t, "
            "    sum(is_new) OVER (PARTITION BY user_id "
            "      ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid "
            "  FROM o"
            "), per_sess AS MATERIALIZED ("
            "  SELECT user_id, sid, count(*) AS len, max(t) - min(t) AS dur "
            "  FROM s GROUP BY user_id, sid"
            ") "
            "SELECT user_id, CAST(sum(len) AS BIGINT) AS n_events, "
            "CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(max(len) AS BIGINT) AS max_session_events, "
            "CAST(max(dur) AS BIGINT) AS max_session_dur_us "
            "FROM per_sess GROUP BY user_id"
        ),
        "quality_score": (
            "SELECT doc_id, length(text) AS n_chars, "
            "len(string_split(text, ' ')) AS n_tokens, "
            "round(CAST(length(text) - length(regexp_replace(text, "
            "'[.,;:!?]', '', 'g')) AS DOUBLE) "
            "/ greatest(length(text), 1), 6) AS punct_ratio, "
            "round(CAST(len(list_filter(string_split(text, ' '), t -> "
            "list_contains(['the','a','an','of','to','in','and','is','for'], t)"
            ")) AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6) "
            "AS stopword_ratio, "
            # sum(token lens) == n_chars - (n_tokens - 1) single-space seps
            "round(CAST(length(text) - (len(string_split(text, ' ')) - 1) "
            "AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6) "
            "AS mean_token_len "
            "FROM documents"
        ),
        "cosine_near_dup": (
            "WITH e AS MATERIALIZED (SELECT vec_id, "
            "CAST(embedding AS DOUBLE[]) AS emb FROM embeddings) "
            "SELECT a.vec_id AS a, b.vec_id AS b, "
            "round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine "
            "FROM e a, e b WHERE a.vec_id < b.vec_id AND "
            "round(list_cosine_similarity(a.emb, b.emb), 6) "
            f">= {COSINE_DUP_T}"
        ),
        # LSH banding at these parameters has recall 1.0 on this
        # fixture (deterministic planes — verified at both sf), so the
        # exact-pair oracle applies verbatim, mirroring minhash_lsh_pairs
        "lsh_cosine_pairs": (
            "WITH e AS MATERIALIZED (SELECT vec_id, "
            "CAST(embedding AS DOUBLE[]) AS emb FROM embeddings) "
            "SELECT a.vec_id AS a, b.vec_id AS b, "
            "round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine "
            "FROM e a, e b WHERE a.vec_id < b.vec_id AND "
            "round(list_cosine_similarity(a.emb, b.emb), 6) "
            f">= {COSINE_DUP_T}"
        ),
        "urgent_orders_by_priority": (
            "SELECT o_orderpriority, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(min(o_orderkey) AS BIGINT) AS min_orderkey, "
            "CAST(max(o_orderkey) AS BIGINT) AS max_orderkey "
            "FROM orders WHERE o_orderpriority = '1-URGENT' "
            "GROUP BY o_orderpriority"
        ),
        "orders_per_nation": (
            "SELECT n_name, count(o_orderkey) AS n_orders, "
            "max(o_orderkey) AS max_orderkey "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name"
        ),
        "cust_no_orders": (
            "SELECT c_custkey FROM customer "
            "WHERE NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"
        ),
        "bloom_join_urgent": (
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) "
            "AS sum_qty "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderpriority = '1-URGENT' "
            "GROUP BY 1 ORDER BY 1"
        ),
        "skew_join_nations": (
            "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_cents "
            "FROM events JOIN customer ON user_id = c_custkey "
            "GROUP BY 1 ORDER BY 1"
        ),
        "status_priority_intersect": (
            "SELECT o_orderstatus, o_orderpriority FROM orders "
            f"WHERE o_totalprice >= {PRICE_SPLIT} "
            "INTERSECT "
            "SELECT o_orderstatus, o_orderpriority FROM orders "
            f"WHERE o_totalprice < {PRICE_SPLIT}"
        ),
        "cust_f_not_o": (
            "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
            "EXCEPT "
            "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
        ),
        "latest_user_event": (
            "SELECT user_id, event_id, event_type FROM events "
            "QUALIFY row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1 "
            "ORDER BY user_id"
        ),
        "orders_price_rank": (
            "SELECT o_orderkey, "
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents, "
            "CAST(row_number() OVER (ORDER BY "
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), o_orderkey) "
            "AS BIGINT) AS price_rank FROM orders"
        ),
        "text_stats": (
            "SELECT doc_id, length(text) AS n_chars, "
            "len(string_split(text, ' ')) AS n_tokens, "
            "len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens "
            "FROM documents ORDER BY doc_id"
        ),
        "exact_dup_groups": (
            "SELECT sha256(text) AS sha256, count(*) AS n_docs, "
            "min(doc_id) AS keep_id FROM documents "
            "GROUP BY sha256(text) HAVING count(*) > 1"
        ),
        "mutual_nn_pairs": _mutual_nn_sql(),
        "mmr_diverse_top5": _mmr_sql(),
        "time_to_convert": _time_to_convert_sql(),
        "user_streaks": _user_streaks_sql(),
        "hourly_gapfill": _hourly_gapfill_sql(),
        "quantile_normalize": _quantile_normalize_sql(),
        "cohort_ltv": _cohort_ltv_sql(),
        "ann_cosine_top5": """
WITH q AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < 3
),
c AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
sims AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         ROUND(list_cosine_similarity(q.e, c.e), 6) AS cosine
  FROM q JOIN c ON c.vec_id != q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
  FROM sims
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id, cosine
FROM ranked WHERE rn <= 5 ORDER BY query_id, rank
""",
        "corpus_sha256": (
            "SELECT source AS repo, 'doc_' || CAST(doc_id AS VARCHAR) AS path, "
            "sha256(text) AS sha256 FROM documents"
        ),
        "shared_token_edges": f"""
WITH keyed AS (
  SELECT DISTINCT source AS repo, t.tok AS key
  FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS tok) t
  WHERE len(t.tok) >= 1
),
ok_keys AS (
  SELECT key FROM keyed GROUP BY key
  HAVING count(DISTINCT repo) BETWEEN 2 AND {TOKEN_CAP}
)
SELECT a.repo AS src_repo, b.repo AS dst_repo, CAST(count(*) AS DOUBLE) AS weight
FROM keyed a JOIN keyed b ON a.key = b.key AND a.repo < b.repo
JOIN ok_keys k ON k.key = a.key
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "copurchase_edges": (
            f"WITH {_GRAPH_CTES} SELECT src, dst, weight FROM pairs ORDER BY src, dst"
        ),
        "nbr_feat_sum": _nbr_feat_sum_sql(),
        "gnn_two_layer": _gnn_two_layer_sql(),
        "degree": (
            f"WITH {_GRAPH_CTES} SELECT vid, CAST(outdeg AS BIGINT) AS degree "
            f"FROM deg ORDER BY vid"
        ),
        "degree_assortativity": _degree_assortativity_sql(),
        "near_dup_pairs": _near_dup_pairs_sql(),
        "containment_pairs": _containment_sql(),
        # the LSH-banded path returns the exact-Jaccard-VERIFIED pair
        # set; banding recall 1.0 on this corpus is pinned by pytest,
        # so the brute-force pair oracle applies verbatim
        "minhash_lsh_pairs": _near_dup_pairs_sql(),
        "hits_k4": _hits_sql(),
        "scc_labels": _scc_sql(),
        "scc_condensed_depth": _scc_condensed_depth_sql(),
        "activity_gini": _activity_gini_sql(),
        "negative_samples_k3": _negative_samples_sql(),
        "linkpred_auc": _linkpred_auc_sql(),
        "label_centroids": (
            "SELECT CAST(label AS BIGINT) AS label, "
            "CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(floor(CAST(x AS DOUBLE) * "
            f"{GRAM_SCALE:.1f}) AS BIGINT)) AS BIGINT) AS sum_q "
            "FROM (SELECT label, unnest(embedding) AS x, "
            "unnest(range(len(embedding))) AS dim FROM embeddings) "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "most_repetitive_docs": (
            "SELECT doc_id, n_grams, n_distinct, ratio_ppm FROM ("
            "SELECT doc_id, n_grams, n_distinct, "
            f"n_distinct * {REPET_SCALE} // n_grams AS ratio_ppm, "
            "row_number() OVER (ORDER BY "
            f"n_distinct * {REPET_SCALE} // n_grams, doc_id) AS rn "
            "FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "CAST(count(DISTINCT g) AS BIGINT) AS n_distinct FROM ("
            "SELECT doc_id, CASE WHEN len(t) < %d THEN text "
            "ELSE array_to_string(list_slice(t, i.i, i.i + %d), ' ') "
            "END AS g FROM (SELECT doc_id, text, "
            "string_split(text, ' ') AS t FROM documents) toks, "
            "LATERAL (SELECT unnest(range(1, "
            "greatest(len(t) - %d, 1) + 1)) AS i) i) "
            "GROUP BY doc_id)) WHERE rn <= %d ORDER BY ratio_ppm, doc_id"
            % (REP_K, REP_K - 1, REP_K - 1, REPET_K)
        ),
        "price_band_pairs": (
            "WITH c AS MATERIALIZED (SELECT o_orderkey AS id, "
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v "
            "FROM orders) "
            "SELECT a.id AS a_id, b.id AS b_id, b.v - a.v AS vdiff "
            "FROM c a JOIN c b ON (a.v < b.v OR "
            "(a.v = b.v AND a.id < b.id)) "
            f"AND b.v - a.v <= {BAND_SPAN}"
        ),
        "lang_fertility": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(sum(len(string_split(text, ' '))) AS BIGINT) "
            "AS sum_ws_tokens, "
            "CAST(sum(len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) "
            "AS sum_re_tokens FROM documents GROUP BY lang ORDER BY lang"
        ),
        "orders_validation": (
            "SELECT rule, CAST(v AS BIGINT) AS n_violations, "
            "CAST(n AS BIGINT) AS n_rows FROM ("
            "SELECT 'custkey_not_null' AS rule, "
            "sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v, "
            "count(*) AS n FROM orders "
            "UNION ALL SELECT 'orderkey_positive', "
            "sum(CASE WHEN o_orderkey IS NULL OR o_orderkey < 1 "
            "THEN 1 ELSE 0 END), count(*) FROM orders "
            "UNION ALL SELECT 'price_under_300k', "
            "sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 300000 "
            "THEN 1 ELSE 0 END), count(*) FROM orders) ORDER BY rule"
        ),
        "lang_confusion": (
            f"WITH {_lang_ctes()} "
            "SELECT d.lang, COALESCE(b.plang, "
            "(SELECT min(lang) FROM documents)) AS pred_lang, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "transitivity": (
            f"WITH {_GRAPH_CTES}, "
            "tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM ("
            "SELECT 1 FROM pairs ab JOIN pairs bc "
            "ON bc.src = ab.dst JOIN pairs ac "
            "ON ac.src = ab.src AND ac.dst = bc.dst)) "
            "SELECT CAST(3 * (SELECT t FROM tri) AS BIGINT) AS tri3, "
            "CAST(sum(outdeg * (outdeg - 1) // 2) AS BIGINT) AS wedges "
            "FROM deg"
        ),
        "brand_homophily": (
            f"WITH {_GRAPH_CTES} "
            "SELECT CAST(count(*) AS BIGINT) AS n_edges, "
            "CAST(sum(CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_same_brand "
            "FROM pairs e JOIN part a ON a.p_partkey = e.src "
            "JOIN part b ON b.p_partkey = e.dst"
        ),
        "msf_total": _msf_sql(),
        "dup_clusters": _dup_clusters_sql(),
        "embedding_clusters": _embedding_clusters_sql(),
        "dbscan_clusters": _dbscan_sql(),
        "lang_pred": _lang_pred_sql(),
        "pagerank_k8": _pagerank_sql(),
        "top_pagerank": _top_pagerank_sql(),
        "cc_labels": _cc_sql(),
        "incr_cc_labels": _cc_sql(),
        "bfs_depth": _bfs_sql(),
        "graph_voronoi8": _graph_voronoi_sql(),
        "voronoi_coarsen": _voronoi_coarsen_sql(),
        "temporal_reach": _temporal_reach_sql(),
        "rmat_edges": _rmat_sql(),
        "media_img_stats": _media_img_sql(),
        "media_jpeg_roundtrip": _media_jpeg_sql(),
        "media_png_roundtrip": _media_png_sql(),
        "media_jpeg_quality": _media_jpeg_quality_sql(),
        "heaps_vocab_curve": _heaps_vocab_sql(),
        "token_collision_stats": _token_collision_sql(),
        "gap_log_histogram": _gap_log_hist_sql(),
        "orders_deletion_vectors": _orders_dv_sql(),
        "orders_skyline": _orders_skyline_sql(),
        "bootstrap_median_ci": _bootstrap_median_sql(),
        "ransac_qty_price": _ransac_sql(),
        "trailing_distinct_users": _trailing_distinct_sql(),
        "frequent_triples": _frequent_triples_sql(),
        "bucket_skew_report": _bucket_skew_sql(),
        "kneser_ney_counts": _kneser_ney_sql(),
        "bloom_fp_audit": _bloom_fp_sql(),
        "rank_select_audit": _rank_select_sql(),
        "user_running_median": _user_running_median_sql(),
        "orders_pivot_priority": _orders_pivot_sql(),
        "interval_scheduling_max": _interval_scheduling_sql(),
        "bipartite_components": _bipartite_sql(),
        "join_size_certificate": _join_size_certificate_sql(),
        "urgent_run_stats": _urgent_run_stats_sql(),
        "feature_hash_collisions": _feature_hash_collisions_sql(),
        "pettitt_changepoint": _pettitt_sql(),
        "media_img_resize": _media_resize_sql(),
        "media_wav_features": _wav_features_sql(),
        "media_wav_stats": _media_wav_sql(),
        "media_img_sobel": _media_sobel_sql(),
        "late_events_watermark": _late_events_sql(),
        "als_user_factors": _als_sql(),
        "rolling_median5": _rolling_median_sql(),
        "dp_noisy_counts": _dp_counts_sql(),
        "textrank_top10": _textrank_sql(),
        "pca_top_eigvec": _pca_power_sql(),
        "region_min_cut": _region_min_cut_sql(),
        "media_video_motion": _video_motion_sql(),
        "huffman_event_code": _huffman_sql(),
        "incr_join_view": _incr_join_view_sql(),
        "bitmap_and_count": _bitmap_and_sql(),
        "mrr_item_model": _mrr_eval_sql(),
        "feature_hash_users": _feature_hash_sql(),
        "seq_pair_support": _seq_support_sql(),
        "bip_matching_regions": _bip_matching_sql(),
        "stable_matching_regions": _stable_matching_sql(),
        "hungarian_assignment": _assignment_sql(),
        "erdos_gallai_audit": _erdos_gallai_sql(),
        "borda_priority_vote": _borda_sql(),
        "condorcet_priority": _condorcet_sql(),
        "simpson_paradox_audit": _simpson_sql(),
        "littles_law_audit": _littles_law_sql(),
        "lorenz_user_value": _lorenz_sql(),
        "pareto_8020_point": _pareto_point_sql(),
        "hot_user_ranking": _hot_ranking_sql(),
        "shamir_share_audit": _shamir_sql(),
        "hourly_fano": _fano_sql(),
        "chi2_tokens_top10": _chi2_tokens_sql(),
        "haar_hourly": _haar_hourly_sql(),
        "nra_topk_parts": _nra_topk_sql(),
        "hopping_distinct_users": _hopping_distinct_sql(),
        "fiedler_k8": _fiedler_sql(),
        "conformal_price": _conformal_sql(),
        "isotonic_qty_price": _isotonic_sql(),
        "orders_orc_roundtrip": _orc_roundtrip_sql(),
        "lcs_top_users": _lcs_users_sql(),
        "knapsack_parts": _knapsack_sql(),
        "part_soundex_blocks": _soundex_sql(),
        "shapley_order_price": _shapley_sql(),
        "doc_bwt": _doc_bwt_sql(),
        "rice_postings": _rice_postings_sql(),
        "doc_periods": _doc_periods_sql(),
        "viterbi_top_user": _viterbi_sql(),
        "weighted_median_qty": _weighted_median_sql(),
        "lis_top_user": _lis_user_sql(),
        "spatial_radius_pairs": _spatial_join_sql(),
        "points_in_triangle": _points_in_triangle_sql(),
        "xcorr_view_purchase": _xcorr_sql(),
        "boost_stumps2": _boost_stumps_sql(),
        "activity_union_hours": _interval_union_sql(),
        "learned_index_eps": _learned_index_sql(),
        "sign_test_daily": _sign_test_sql(),
        "herfindahl_nations": _herfindahl_sql(),
        "media_wav_hadamard": _wav_hadamard_sql(),
        "orders_merkle": _orders_merkle_sql(),
        "merkle_diff": _merkle_diff_sql(),
        "ols_order_price": _ols_sql(),
        "ridge_order_price": _ols_sql(ridge=RIDGE_LAMBDA),
        "price_qty_slope": _price_qty_slope_sql(),
        "spanning_trees_regions": _spanning_trees_sql(),
        "user_lifetable": _USER_LIFETABLE_SQL,
        "bridges": _bridges_sql(),
        "two_edge_components": _two_edge_components_sql(),
        "rand_index_lp_cc": _rand_index_sql(),
        "edge_betweenness": _ebc_sql(),
        "euler_check": _euler_sql(),
        "part_seq_reciprocity": _reciprocity_sql(),
        "motif_census": _motif_census_sql(),
        "gini_stump_price": _gini_stump_sql(),
        "tree_depth2_orders": _tree_depth2_sql(),
        "densest_peel": _densest_sql(),
        "alt_lower_bounds": _alt_bounds_sql(),
        "theta_sketch_overlap": _theta_overlap_sql(),
        "effective_resistance": _eff_resistance_sql(),
        "edge_cut_parts": _edge_cut_sql(),
        "dag_depth_k12": _dag_depth_sql(),
        "sssp_dist": _sssp_sql(),
        "widest_path": _widest_sql(),
        "ppr_k8": _ppr_sql(),
        "ppr_sweep": _ppr_sweep_sql(),
        "hub_robustness": _hub_robustness_sql(),
        "bond_percolation": _bond_percolation_sql(),
        "ic_spread": _ic_spread_sql(),
        "influence_seeds": _influence_seeds_sql(),
        "squares_total": _squares_sql(),
        "k4_total": _k4_sql(),
        "butterflies_total": _butterflies_sql(),
        "sp_counts": _sp_counts_sql(),
        "sssp_parent": _sssp_parent_sql(),
        "top_copurchase_pairs": _top_pairs_sql(),
        "top_part_triples": _top_triples_sql(),
        "doc_hash_features": _hash_features_sql(),
        "pair_lift": _pair_lift_sql(),
        "doc_query_scores": _doc_query_scores_sql(),
        "bm25_top10": _bm25_sql(),
        "rrf_hybrid_top10": _rrf_fusion_sql(),
        "rich_club": _rich_club_sql(),
        "kcore3": _kcore_sql(),
        "spgemm_sample": _spgemm_sql(),
        "eigencentrality_k6": _eigencentrality_sql(),
        "coloring_w3": _coloring_sql(),
        "tfidf_top1": _tfidf_sql(),
        "geo_infer": _geo_sql(),
        "bc_sampled": _bc_sql(),
        "harmonic_sampled": _harmonic_sql(),
        "coreness_capped": _coreness_sql(),
        "mis_luby": _mis_sql(),
        "simhash_pairs": _simhash_sql(),
        "greedy_cover_docs": _greedy_cover_sql(),
        "winnow_fp": _winnow_sql(),
        "doc_chunks": (
            "SELECT doc_id, CAST((i.i - 1) // "
            f"{CHUNK_TOKENS} AS BIGINT) AS chunk_id, "
            "CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(length(t[i.i])) + count(*) - 1 AS BIGINT) "
            "AS n_chars "
            "FROM (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) i "
            "GROUP BY 1, 2"
        ),
        "cohort_retention": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events), "
            "c AS (SELECT user_id, min(day) AS cohort FROM ud "
            "GROUP BY user_id) "
            "SELECT c.cohort, ud.day - c.cohort AS day_offset, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM ud JOIN c USING (user_id) GROUP BY 1, 2"
        ),
        "redacted_docs": (
            "SELECT doc_id, "
            f"CAST(len(regexp_extract_all(text, '{REDACT_RE}')) "
            "AS BIGINT) AS n_hits, "
            f"CAST(length(regexp_replace(text, '{REDACT_RE}', '#', 'g')) "
            "AS BIGINT) AS redacted_len FROM documents"
        ),
        "kmeans_buckets": _kmeans_sql(),
        "knn_graph_k3": _knn_graph_sql(),
        "graph_ann_top5": _graph_ann_sql(),
        "pq_codes": _pq_codes_sql(),
        "ivfpq_top5": _ivfpq_sql(),
        "user_event_pivot": (
            "SELECT user_id, " + ", ".join(
                f"CAST(count(*) FILTER (WHERE event_type = '{c}') "
                f"AS BIGINT) AS n_{c}" for c in EVENT_TYPES
            ) + " FROM events GROUP BY user_id"
        ),
        "funnel_stages": _funnel_sql(),
        "doc_char_rank": (
            "SELECT doc_id, lang, CAST(row_number() OVER w AS BIGINT) "
            "AS rnk, percent_rank() OVER w AS pct FROM documents "
            "WINDOW w AS (PARTITION BY lang "
            "ORDER BY n_chars DESC, doc_id ASC)"
        ),
        "ra_link_pred": _ra_link_pred_sql(),
        "diameter_lb": _diameter_lb_sql(),
        "tpch_q1_cents": _tpch_q1_sql(),
        "hll_user_regs": _hll_user_regs_sql(),
        "type_user_hll": _type_user_hll_sql(),
        "bloom_bits_urgent": _bloom_bits_urgent_sql(),
        "hourly_user_hll": _hourly_user_hll_sql(),
        "hourly_anomalies": _hourly_anomalies_sql(),
        "user_drawdown": _user_drawdown_sql(),
        "event_disorder": _event_disorder_sql(),
        "value_drift": _VALUE_DRIFT_SQL,
        "value_rank_sum": _VALUE_RANK_SUM_SQL,
        "lp_modularity": _lp_modularity_sql(),
        "hourly_value_bands": _hourly_value_bands_sql(),
        "fk_violations": _fk_violations_sql(),
        "dedup_summary": _dedup_summary_sql(),
        "cm_sketch_users": _cm_sketch_users_sql(),
        "cs_point_users": _cs_point_users_sql(),
        "cm_join_size": _cm_join_size_sql(),
        "join_order_plan": _join_order_plan_sql(),
        "heavy_hitter_users": _heavy_hitters_sql(),
        "item_cosine_top3": _item_cosine_sql(),
        "allen_interval_census": _allen_census_sql(),
        "orders_hive_prune": _hive_prune_sql(),
        "bloom_sidecar_lookup": _bloom_sidecar_sql(),
        "consistent_hash_moves": _consistent_hash_sql(),
        "parity_shard_recover": _parity_recover_sql(),
        "encoding_advisor": _encoding_advisor_sql(),
        "theil_sen_qty_price": _theil_sen_sql(),
        "chao1_parts": _chao1_parts_sql(),
        "ams_f2_users": _ams_f2_sql(),
        "tpch_q3": _tpch_q3_sql(),
        "tpch_q4": _tpch_q4_sql(),
        "tpch_q5": _tpch_q5_sql(),
        "tpch_q6": _tpch_q6_sql(),
        "tpch_q10": _tpch_q10_sql(),
        "tpch_q12": _tpch_q12_sql(),
        "tpch_q14": _tpch_q14_sql(),
        "tpch_q18": _tpch_q18_sql(),
        "tpch_q7": _tpch_q7_sql(),
        "tpch_q13": _tpch_q13_sql(),
        "tpch_q15": _tpch_q15_sql(),
        "tpch_q17": _tpch_q17_sql(),
        "tpch_q22": _tpch_q22_sql(),
        "tpch_q2": _tpch_q2_sql(),
        "tpch_q8": _tpch_q8_sql(),
        "tpch_q9": _tpch_q9_sql(),
        "tpch_q11": _tpch_q11_sql(),
        "tpch_q16": _tpch_q16_sql(),
        "tpch_q19": _tpch_q19_sql(),
        "tpch_q20": _tpch_q20_sql(),
        "tpch_q21": _tpch_q21_sql(),
        "two_hop_sizes": _two_hop_sql(),
        "hyperball_r2": _hyperball_sql(),
        "wl_colors_k3": _wl_sql(),
        "orders_cube": (
            "SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, "
            "COALESCE(o_orderstatus, 'ALL') AS o_orderstatus, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(cents) AS BIGINT) AS total_cents "
            "FROM (SELECT o_orderpriority, o_orderstatus, "
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents "
            "FROM orders) "
            "GROUP BY CUBE(o_orderpriority, o_orderstatus)"
        ),
        "copart_join_parts": _copart_join_sql(),
        "pareto_orders": _pareto_orders_sql(),
        "incr_orders_rollup": _incr_rollup_sql(),
        "orders_sorted_write": _orders_range_parts_sql(),
        "orders_time_travel": _time_travel_sql(),
        "orders_schema_drift": _schema_drift_sql(),
        "cdc_chunk_ledger": _cdc_chunks_sql(),
        "logistic_urgent_price": _logistic_newton_sql(),
        "welch_ttest_values": _welch_ttest_sql(),
        "perm_test_values": _perm_test_sql(),
        "zonemap_price_scan": _zonemap_scan_sql(),
        "zorder_box_scan": _zorder_box_sql(),
        "lang_diversity": _lang_diversity_sql(),
        "user_value_frontier": _user_frontier_sql(),
        "price_mad": _price_mad_sql(),
        "event_unpivot": _event_unpivot_sql(),
        "price_outliers": _price_outliers_sql(),
        "matching_edges": _matching_sql(),
        "weighted_matching": _weighted_matching_sql(),
        "vertex_cover": _vcover_sql(),
        "trimmed_qty": _TRIMMED_QTY_SQL,
        "benford_prices": _BENFORD_SQL,
        "curated_docs": _curated_docs_sql(),
        "doc_splits": _doc_splits_sql(),
        "privacy_audit": _privacy_audit_sql(),
        "bpe_merges": _bpe_sql(),
        "kcenter_sel5": _kcenter_sql(),
        "attribution_last_click": _ATTRIBUTION_SQL,
        "leakage_splits": _leakage_splits_sql(),
        "dup_span_coverage": _dup_span_sql(),
        "decayed_activity": _decayed_activity_sql(),
        "weighted_docs": _weighted_docs_sql(),
        "doc_repetition": (
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "CAST(count(DISTINCT g) AS BIGINT) AS n_distinct FROM ("
            "SELECT doc_id, CASE WHEN len(t) < %d THEN text "
            "ELSE array_to_string(list_slice(t, i.i, i.i + %d), ' ') "
            "END AS g FROM (SELECT doc_id, text, "
            "string_split(text, ' ') AS t FROM documents) toks, "
            "LATERAL (SELECT unnest(range(1, "
            "greatest(len(t) - %d, 1) + 1)) AS i) i) "
            "GROUP BY doc_id ORDER BY doc_id" % (REP_K, REP_K - 1, REP_K - 1)
        ),
        "user_gap_median": (
            "SELECT user_id, CAST(quantile_disc(gap_us, 0.5) AS BIGINT) "
            "AS median_gap_us FROM ("
            "SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS gap_us "
            "FROM events) WHERE gap_us IS NOT NULL "
            "GROUP BY user_id ORDER BY user_id"
        ),
        "vocab_coverage": (
            "WITH tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
            "GROUP BY tok), "
            "pf AS (SELECT c, CAST(COALESCE(sum(c) OVER ("
            "ORDER BY c DESC, tok ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS BIGINT) AS p FROM tc), "
            "tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM tc) "
            "SELECT CAST(count(*) AS BIGINT) AS n_vocab, "
            "CAST(sum(c) AS BIGINT) AS covered_mass, "
            "(SELECT t FROM tot) AS total_mass FROM pf "
            f"WHERE p < {VOCAB_COVER} * (SELECT t FROM tot)"
        ),
        "price_histogram": (
            "SELECT (c - %d) // %d AS bin, "
            "%d + ((c - %d) // %d) * %d AS bin_lo, "
            "CAST(count(*) AS BIGINT) AS n FROM ("
            "SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c "
            "FROM orders) WHERE c >= %d AND c < %d "
            "GROUP BY 1, 2 ORDER BY 1"
            % (HIST_LO, HIST_WIDTH, HIST_LO, HIST_LO, HIST_WIDTH,
               HIST_WIDTH, HIST_LO, HIST_LO + HIST_BINS * HIST_WIDTH)
        ),
        "qty_price_trend": (
            "SELECT l_returnflag, "
            "CAST(n * sxy - sx * sy AS BIGINT) AS num, "
            "CAST(n * sxx - sx * sx AS BIGINT) AS den FROM ("
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(q) AS BIGINT) AS sx, CAST(sum(p) AS BIGINT) AS sy, "
            "CAST(sum(q * q) AS BIGINT) AS sxx, "
            "CAST(sum(q * p) AS BIGINT) AS sxy FROM ("
            "SELECT l_returnflag, CAST(ROUND(l_quantity, 0) AS BIGINT) AS q, "
            "CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS p FROM lineitem) "
            "GROUP BY 1) ORDER BY 1"
        ),
        "pmi_bigrams_top20": _pmi_bigrams_sql(),
        "top_bigrams": (
            "SELECT bg, n FROM (SELECT bg, CAST(count(*) AS BIGINT) AS n, "
            "row_number() OVER (ORDER BY count(*) DESC, bg) AS rn FROM ("
            "SELECT t[i.i] || ' ' || t[i.i + 1] AS bg FROM "
            "(SELECT string_split(text, ' ') AS t FROM documents) toks, "
            "LATERAL (SELECT unnest(range(1, len(t))) AS i) i) "
            f"GROUP BY bg) WHERE rn <= {TOP_BIGRAMS_K} ORDER BY n DESC, bg"
        ),
        "doc_packing": (
            "SELECT doc_id, n_ws_tokens, tok_off, "
            f"tok_off // {PACK_SEQ_LEN} AS first_seq, "
            f"(tok_off + n_ws_tokens - 1) // {PACK_SEQ_LEN} AS last_seq, "
            f"(tok_off + n_ws_tokens - 1) // {PACK_SEQ_LEN} "
            f"- tok_off // {PACK_SEQ_LEN} + 1 AS n_seqs FROM ("
            "SELECT doc_id, n_ws_tokens, CAST(COALESCE(sum(n_ws_tokens) "
            "OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND 1 PRECEDING), 0) AS BIGINT) AS tok_off FROM ("
            "SELECT doc_id, CAST(length(text) - "
            "length(replace(text, ' ', '')) + 1 AS BIGINT) "
            "AS n_ws_tokens FROM documents) WHERE n_ws_tokens > 0) "
            "ORDER BY doc_id"
        ),
        "daily_top_spender": (
            "SELECT day, user_id, total_c FROM ("
            "SELECT day, user_id, total_c, row_number() OVER ("
            "PARTITION BY day ORDER BY total_c DESC, user_id) AS rn "
            "FROM (SELECT epoch_us(ts) // 86400000000 AS day, user_id, "
            "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) "
            "AS total_c FROM events GROUP BY 1, 2)) WHERE rn = 1"
        ),
        "cust_status_history": _CUST_STATUS_HISTORY_SQL,
        "orders_merged": _ORDERS_MERGED_SQL,
        "orders_diff": (
            "WITH va AS (SELECT o_orderkey k, "
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) v FROM orders "
            "WHERE o_orderkey % 7 <> 0), "
            "vb AS (SELECT o_orderkey k, "
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) "
            "+ CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END AS v "
            "FROM orders WHERE o_orderkey % 5 <> 0) "
            "SELECT COALESCE(va.k, vb.k) AS o_orderkey, "
            "CASE WHEN vb.k IS NULL THEN 'removed' "
            "WHEN va.k IS NULL THEN 'added' ELSE 'changed' END AS status "
            "FROM va FULL OUTER JOIN vb ON va.k = vb.k "
            "WHERE vb.k IS NULL OR va.k IS NULL OR va.v <> vb.v"
        ),
        "dict_term_census": _dict_term_census_sql(),
        "grep_substring": (
            "SELECT doc_id, CAST((length(text) - "
            f"length(replace(text, '{GREP_NEEDLE}', ''))) "
            f"// length('{GREP_NEEDLE}') AS BIGINT) AS n_matches "
            f"FROM documents WHERE contains(text, '{GREP_NEEDLE}') "
            "ORDER BY doc_id"
        ),
        "event_trigrams": (
            "SELECT v1, v2, v3, CAST(count(*) AS BIGINT) AS n_obs "
            "FROM (SELECT lag(event_type, 2) OVER w AS v1, "
            "lag(event_type, 1) OVER w AS v2, event_type AS v3 "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)) "
            "WHERE v1 IS NOT NULL AND v2 IS NOT NULL "
            "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
        ),
        "event_transitions": (
            "SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n "
            "FROM (SELECT lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev_type, event_type AS next_type "
            "FROM events) WHERE prev_type IS NOT NULL "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "markov_next_acc": _markov_next_sql(),
        "position_attribution": _position_attribution_sql(),
        "seasonal_naive_eval": _seasonal_naive_sql(),
        "supplier_entities": _supplier_entities_sql(),
        "supplier_edit1": (
            "SELECT a.s_suppkey AS a_id, b.s_suppkey AS b_id, "
            "CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist "
            "FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey "
            "WHERE levenshtein(a.s_name, b.s_name) <= 1"
        ),
        "qty_dense_rank": (
            "SELECT lid, l_returnflag, "
            "CAST(row_number() OVER (PARTITION BY l_returnflag "
            "ORDER BY qty, lid) AS BIGINT) AS rnk, "
            "CAST(dense_rank() OVER (PARTITION BY l_returnflag "
            "ORDER BY qty) AS BIGINT) AS drnk "
            "FROM (SELECT l_returnflag, "
            "CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty, "
            "l_orderkey * 10 + l_linenumber AS lid FROM lineitem)"
        ),
        "doc_char_ntile": (
            "SELECT doc_id, lang, CAST(ntile(7) OVER w AS BIGINT) "
            "AS tile FROM documents "
            "WINDOW w AS (PARTITION BY lang "
            "ORDER BY n_chars ASC, doc_id ASC)"
        ),
        "cust_user_outer": (
            "SELECT COALESCE(c.c_custkey, u.user_id) AS key, "
            "CAST(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END "
            "AS BIGINT) AS has_cust, "
            "CAST(COALESCE(u.n, 0) AS BIGINT) AS n_events "
            "FROM customer c FULL OUTER JOIN "
            "(SELECT user_id, count(*) AS n FROM events "
            "GROUP BY user_id) u ON u.user_id = c.c_custkey"
        ),
        "user_top_event": (
            "SELECT user_id, event_type, n FROM ("
            "SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY count(*) DESC, event_type ASC) AS rn "
            "FROM events GROUP BY user_id, event_type) WHERE rn = 1"
        ),
        "doc_fluency": """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
big AS (SELECT doc_id, t[i.i] || ' ' || t[i.i+1] AS bg
        FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i),
cnt AS (SELECT bg, CAST(count(*) AS BIGINT) n FROM big GROUP BY bg),
per AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) n_bigrams,
               CAST(sum(c.n) AS BIGINT) freq_sum
        FROM big b JOIN cnt c USING (bg) GROUP BY b.doc_id)
SELECT d.doc_id, CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(p.freq_sum, 0) AS BIGINT) AS freq_sum
FROM documents d LEFT JOIN per p USING (doc_id) ORDER BY doc_id
""",
        "token_postings": (
            "SELECT t.tok AS token, d.doc_id, "
            "CAST(count(*) AS BIGINT) AS tf "
            "FROM documents d, LATERAL (SELECT unnest(string_split("
            "d.text, ' ')) AS tok) t "
            "WHERE t.tok IN ('join', 'scan', 'sort') "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "docs_with_all_tokens": (
            "SELECT doc_id FROM ("
            "SELECT DISTINCT d.doc_id, t.tok "
            "FROM documents d, LATERAL (SELECT unnest(string_split("
            "d.text, ' ')) AS tok) t "
            f"WHERE t.tok IN {tuple(PROBE_TOKENS)!r}) "
            f"GROUP BY doc_id HAVING count(*) = {len(PROBE_TOKENS)} "
            "ORDER BY doc_id"
        ),
        "embedding_gram": (
            "WITH ex AS MATERIALIZED (SELECT vec_id, j.j AS j, "
            "CAST(floor(CAST(embedding[j.j] AS DOUBLE) * "
            f"{GRAM_SCALE:.1f}) AS BIGINT) AS q "
            "FROM embeddings, LATERAL "
            "(SELECT unnest(range(1, len(embedding) + 1)) AS j) j) "
            "SELECT a.j AS i, b.j AS j, CAST(sum(a.q * b.q) AS BIGINT) AS g "
            "FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.j <= b.j "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "embedding_dim_stats": (
            "SELECT CAST(dim AS BIGINT) AS dim, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(min(x) AS DOUBLE) AS min_v, "
            "CAST(max(x) AS DOUBLE) AS max_v, "
            "CAST(sum(CAST(floor(CAST(x AS DOUBLE) * "
            f"{GRAM_SCALE:.1f}) AS BIGINT)) AS BIGINT) AS sum_q "
            "FROM (SELECT unnest(embedding) AS x, "
            "unnest(range(len(embedding))) AS dim FROM embeddings) "
            "GROUP BY 1 ORDER BY 1"
        ),
        "conversion_paths": _conversion_paths_sql(),
        "user_event_seq": (
            "SELECT user_id, "
            "string_agg(event_type, '|' ORDER BY ts, event_id) AS seq, "
            "CAST(count(*) AS BIGINT) AS seq_len FROM ("
            "SELECT user_id, ts, event_id, event_type, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events) "
            f"WHERE rn <= {SEQ_LEN} GROUP BY user_id ORDER BY user_id"
        ),
        "orders_rollup": (
            "SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, "
            "COALESCE(o_orderstatus, 'ALL') AS o_orderstatus, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(cents) AS BIGINT) AS total_cents "
            "FROM (SELECT o_orderpriority, o_orderstatus, "
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents "
            "FROM orders) "
            "GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"
        ),
        "revenue_by_region": (
            "SELECT r_name, CAST(sum(CAST(ROUND(l_extendedprice * "
            "(1 - l_discount) * 1000000, 0) AS BIGINT)) AS BIGINT) "
            "AS revenue_micros, CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name"
        ),
        "component_sizes": _component_sizes_sql(),
        "lp_k4": _lp_sql(),
        "louvain_move1": _louvain_move_sql(),
        "louvain_coarse_edges": _louvain_coarse_sql(),
        "louvain_level2": _louvain_level2_sql(),
        "triangles_total": _triangles_total_sql(),
        "triangles_doulion": _doulion_sql(),
        "triangles_per_vertex": _triangles_per_vertex_sql(),
        "spmv": _spmv_sql(),
        "nbr_deg": _nbr_deg_sql(),
        "katz_k4": _katz_sql(),
        "fastrp_embed8": _fastrp_sql(),
    }
