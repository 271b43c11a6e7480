"""Per-edge neighborhood similarity (common neighbors / Jaccard).

The vertex-pair similarity metric family (gunrock's similarity apps;
the building block of link prediction and graph-based dedup): for every
canonical undirected edge (u, v),

    common(u,v) = |N(u) ∩ N(v)|        (the edge's triangle support)
    jaccard(u,v) = common / (deg(u) + deg(v) − common)

Physical plan: the same min-side expansion + packed-key membership
probe as triangle counting (``tc._membership_increments``) but over the
FULL symmetrized adjacency and crediting EDGES instead of vertices —
for each edge expand the smaller endpoint's neighbor list and test
``(other, w)`` against the sorted packed (src<<32)|dst key array with
one vectorized searchsorted per chunk.  A stateless ``map_batches``
over the canonical edge table; shards and the key array are plasma
objects fetched once per worker (``superstep._cached_shard``).  Work is
Σ_e min(deg(u), deg(v)) — the intersect-plan bound; no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..graph import GraphShards, build_graph
from ..util import csr_lookup, expand_neighbors, np_col, part_of
from .tc import _PROBE_CHUNK, _outdeg_of, _packed_edge_keys


def _common_counts(
    src: np.ndarray,
    dst: np.ndarray,
    shard_of,
    P: int,
    edge_keys: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(common, deg_src, deg_dst) per input edge, vectorized."""
    n = len(src)
    common = np.zeros(n, np.int64)
    du = _outdeg_of(src, shard_of, P)
    dv = _outdeg_of(dst, shard_of, P)
    if n == 0 or not len(edge_keys):
        return common, du, dv
    take_src = du <= dv
    expand_x = np.where(take_src, src, dst)
    other_y = np.where(take_src, dst, src)
    n_keys = len(edge_keys)
    parts = part_of(expand_x, P)
    for p in np.unique(parts):
        sel = np.flatnonzero(parts == p)
        sh = shard_of(int(p))
        rows, found = csr_lookup(sh, expand_x[sel])
        hit = np.flatnonzero(found)
        if not len(hit):
            continue
        sel = sel[hit]
        rows = rows[hit]
        ip = sh["indptr"]
        ccum = np.cumsum(ip[rows + 1] - ip[rows])
        start = 0
        while start < len(rows):
            base = int(ccum[start - 1]) if start else 0
            end = int(np.searchsorted(ccum, base + _PROBE_CHUNK, side="right"))
            end = min(max(end, start + 1), len(rows))
            rep, nbrs, _ = expand_neighbors(sh, rows[start:end])
            if len(rep):
                e_sel = sel[start:end][rep]
                key = (
                    other_y[e_sel].astype(np.uint64) << np.uint64(32)
                ) | nbrs.astype(np.uint64)
                pos = np.searchsorted(edge_keys, key)
                ok = (pos < n_keys) & (
                    edge_keys[np.minimum(pos, n_keys - 1)] == key
                )
                hits = np.flatnonzero(ok)
                if len(hits):
                    common += np.bincount(e_sel[hits], minlength=n)
            start = end
    return common, du, dv


def edge_similarity(g: GraphShards, edges: rd.Dataset) -> rd.Dataset:
    """(src, dst, common:int64, jaccard:double 6dp) per canonical edge.

    ``edges`` is the deduped canonical (src<dst) pair table; ``g`` the
    SYMMETRIZED GraphShards of the same graph (full neighborhoods).
    Vertex ids must be < 2^32 (packed probe keys; same bound as TC)."""
    from ..pipelines import round_half_up

    keys_ref = _packed_edge_keys.remote(*g.shard_refs)
    shard_refs = list(g.shard_refs)
    P = g.num_parts

    def _batch(batch: pa.Table) -> pa.Table:
        from ..superstep import _cached_shard

        src, dst = np_col(batch, "src"), np_col(batch, "dst")
        if len(src):
            mx = max(int(src.max()), int(dst.max()))
            assert mx < 2**32, "edge_similarity packs pairs into 64 bits"
        keys = _cached_shard(keys_ref)
        common, du, dv = _common_counts(
            src, dst, lambda p: _cached_shard(shard_refs[p]), P, keys
        )
        denom = (du + dv - common).astype(np.float64)
        jac = np.zeros(len(src), np.float64)
        ok = denom > 0
        jac[ok] = round_half_up(common[ok] / denom[ok], 6)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "common": pa.array(common, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return edges.map_batches(_batch, batch_format="pyarrow")


def ktruss(
    edges: rd.Dataset,
    k: int,
    num_parts: int = 8,
    max_rounds: int = 32,
    ckpt=None,
    checkpoint_every: int = 0,
    resume: bool = False,
    on_round_end=None,
) -> tuple[rd.Dataset, int, bool]:
    """k-truss subgraph: iteratively drop every edge supported by fewer
    than k−2 triangles until fixpoint (Cohen 2008; gunrock-family
    algorithm).  Each round is one no-checkpoint graph build over the
    surviving canonical edges + one ``edge_similarity`` support pass +
    a vectorized filter — all object-store exchanges, no parquet.
    Returns (truss_edges, support_rounds, converged); the last round is
    the fixpoint-confirming pass (no drops).

    Kill-resume: with a ``ckpt`` (checkpoint.CheckpointManager) and
    ``checkpoint_every > 0``, the surviving edge set is written
    atomically every N rounds (step dir + lineage + _SUCCESS, exactly
    the PR/CC superstep layout); ``resume=True`` restarts peeling from
    the last complete round — the peeling sequence is a pure function
    of the edge set, so a resumed run's fixpoint equals the
    uninterrupted run's exactly."""
    rounds = 0
    cur = None
    if ckpt is not None and resume:
        last = ckpt.latest_step()
        if last is not None:
            ds, lin = ckpt.load_step(last)
            cur = ds.materialize()
            n = lin.get("edges", cur.count())
            rounds = int(lin["round"])
            if lin.get("converged"):
                return cur, rounds, True
    if cur is None:
        cur = edges.select_columns(["src", "dst"]).materialize()
        n = cur.count()
    while rounds < max_rounds:
        g = build_graph(cur, "", num_parts, symmetrize=True, persist=False)
        sim = edge_similarity(g, cur)
        nxt = (
            sim.filter(expr=f"common >= {k - 2}")
            .select_columns(["src", "dst"])
            .materialize()
        )
        m = nxt.count()
        rounds += 1
        converged = m == n
        if ckpt is not None and checkpoint_every and (
            rounds % checkpoint_every == 0 or converged
        ):
            nxt = ckpt.write_state(rounds, nxt)
            ckpt.finalize_step(
                rounds, {"round": rounds, "edges": m, "converged": converged}
            )
        if on_round_end is not None:
            on_round_end(rounds, m)
        if converged:
            return nxt, rounds, True
        cur, n = nxt, m
    return cur, rounds, False


def degree_assortativity_moments(g: GraphShards, edges: rd.Dataset) -> pa.Table:
    """Integer-exact moment sums for the degree-assortativity
    coefficient (Newman 2002): over every DIRECTED occurrence of an
    undirected edge — each canonical (u, v) counted as (deg u, deg v)
    AND (deg v, deg u) — emit ``(n, sum_x, sum_y, sum_xx, sum_yy,
    sum_xy)``.  Pearson's r over these sums IS the assortativity
    coefficient; emitting the integer sums instead of the float r makes
    the result bit-exact at any block layout (the float divide is one
    driver-side expression).

    Scale shape: the |V|-sized degree vector is broadcast once via
    ``ray.put`` (the repo's T3 id-map convention, O(|V|) ≪ O(|E|)); one
    stateless ``map_batches`` over the canonical edge table emits ONE
    partial row per block — no shuffle.  Caller guarantees
    Σ deg² · 2|E| fits int64 (true far past the tested scales; at
    extreme scale quantize degrees first, same contract as
    ``ops.grouped_comoments``)."""
    import ray as _ray

    vids = np.sort(np.asarray(_ray.get(g.vertex_ids_ref), np.int64))
    deg = np.zeros(len(vids), np.int64)
    for t in _ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(t, "vid"))
        deg[pos] += np_col(t, "outdeg")
    ref = _ray.put((vids, deg))

    def _partial(t: pa.Table) -> pa.Table:
        v, d = _ray.get(ref)
        s = np_col(t, "src")
        e = np_col(t, "dst")
        dx = d[np.searchsorted(v, s)]
        dy = d[np.searchsorted(v, e)]
        # both directions: Σx == Σy and Σx² == Σy² by construction,
        # emitted anyway so the output is the standard comoment tuple
        x = np.concatenate([dx, dy])
        y = np.concatenate([dy, dx])
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sum_x": pa.array([int(x.sum())], pa.int64()),
                "sum_y": pa.array([int(y.sum())], pa.int64()),
                "sum_xx": pa.array([int((x * x).sum())], pa.int64()),
                "sum_yy": pa.array([int((y * y).sum())], pa.int64()),
                "sum_xy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    rows = (
        edges.select_columns(["src", "dst"])
        .map_batches(_partial, batch_format="pyarrow")
        .take_all()
    )
    cols = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    return pa.table(
        {c: pa.array([sum(r[c] for r in rows)], pa.int64()) for c in cols}
    )


RA_SCALE = 1 << 20  # integer resource-allocation weight: SCALE // deg


def ra_link_prediction(
    edges: rd.Dataset,
    k: int = 50,
    deg_cap: int = 64,
    num_buckets: int = 64,
) -> pa.Table:
    """Resource-allocation link prediction (Zhou-Lü-Zhang 2009): score
    every NON-edge pair (v, w) by Σ over common neighbors u of
    1/deg(u), using the integer weight ``RA_SCALE // deg(u)`` so the
    distributed sum is bit-exact and SQL-reproducible (float 1/deg
    sums drift with reduction order).  Centers with deg(u) > deg_cap
    are skipped — their per-pair weight is ≤ SCALE/cap while their
    wedge fan-out is deg², the classic hub cutoff that bounds total
    work to Σ_{deg≤cap} deg² ≤ cap·2|E| wedges.

    Physical plan: symmetrize the canonical edge table in-flight, ONE
    bucketed shuffle on the center vertex completes each adjacency,
    per-center ordered pair expansion stamps the integer weight; a
    second bucketed shuffle on the PAIR hash co-locates wedge scores
    with the existing-edge rows (tagged s = −1) so each bucket drops
    known edges, sums survivors, and emits only its LOCAL top-k — the
    driver merges num_buckets·k rows, never the candidate set.

    Returns the global top-k as (v, w, score, n_common, rank) under
    the (score desc, v, w) total order."""
    from ..ops import hash_bucket_agg
    from ..util import grouped_pair_expand, hash64

    def _sym(t: pa.Table) -> pa.Table:
        s = np_col(t, "src")
        d = np_col(t, "dst")
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d]), pa.int64()),
                "dst": pa.array(np.concatenate([d, s]), pa.int64()),
            }
        )

    def _wedges(grp: pa.Table) -> pa.Table:
        s = np_col(grp, "src")
        d = np_col(grp, "dst")
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        _, starts, counts = np.unique(s, return_index=True,
                                      return_counts=True)
        rc = np.repeat(counts, counts)  # per-row degree of its center
        live = rc <= deg_cap
        if not live.any():
            return pa.table(
                {"v": pa.array([], pa.int64()),
                 "w": pa.array([], pa.int64()),
                 "s": pa.array([], pa.int64())}
            )
        s2, d2, rc2 = s[live], d[live], rc[live]
        v, w, base = grouped_pair_expand(s2, d2)
        return pa.table(
            {
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "s": pa.array(RA_SCALE // rc2[base], pa.int64()),
            }
        )

    sym = edges.select_columns(["src", "dst"]).map_batches(
        _sym, batch_format="pyarrow"
    )
    wedges = hash_bucket_agg(
        sym, lambda b: np_col(b, "src"), _wedges, num_buckets=num_buckets
    )

    def _tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t.column("src").cast(pa.int64()),
                "w": t.column("dst").cast(pa.int64()),
                "s": pa.array(
                    np.full(t.num_rows, -1, np.int64), pa.int64()
                ),
            }
        )

    tagged = wedges.union(
        edges.select_columns(["src", "dst"]).map_batches(
            _tag_edges, batch_format="pyarrow"
        )
    )

    def _pair_key(t: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (
                hash64(np_col(t, "v")) * np.uint64(0x9E3779B97F4A7C15)
                ^ hash64(np_col(t, "w"))
            ).view(np.int64)

    def _score_topk(grp: pa.Table) -> pa.Table:
        v = np_col(grp, "v")
        w = np_col(grp, "w")
        s = np_col(grp, "s")
        order = np.lexsort((w, v))
        v, w, s = v[order], w[order], s[order]
        grp_starts = np.r_[0, np.flatnonzero(
            (v[1:] != v[:-1]) | (w[1:] != w[:-1])) + 1]
        counts = np.diff(np.r_[grp_starts, len(v)])
        gid = np.repeat(np.arange(len(grp_starts)), counts)
        is_edge = np.zeros(len(grp_starts), bool)
        np.logical_or.at(is_edge, gid, s < 0)
        score = np.zeros(len(grp_starts), np.int64)
        np.add.at(score, gid, np.where(s > 0, s, 0))
        keep = ~is_edge
        vv, ww = v[grp_starts][keep], w[grp_starts][keep]
        sc, nc = score[keep], counts[keep]
        # local top-k under (score desc, v, w); global merge is exact
        # because a pair lives in exactly one bucket
        top = np.lexsort((ww, vv, -sc))[:k]
        return pa.table(
            {
                "v": pa.array(vv[top], pa.int64()),
                "w": pa.array(ww[top], pa.int64()),
                "score": pa.array(sc[top], pa.int64()),
                "n_common": pa.array(nc[top], pa.int64()),
            }
        )

    rows = hash_bucket_agg(
        tagged, _pair_key, _score_topk, num_buckets=num_buckets
    ).take_all()
    import pandas as pd

    df = pd.DataFrame(rows).sort_values(
        ["score", "v", "w"], ascending=[False, True, True]
    ).head(k).reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def two_hop_counts(
    g: GraphShards,
    edges: rd.Dataset,
    num_buckets: int = 32,
) -> pa.Table:
    """Exact distinct ≤2-hop neighborhood size per vertex — the r=2
    point of the neighborhood function N(v, r) (the quantity HyperBall
    / ANF estimate with HLL registers at planet scale; computed exactly
    here because the snapshot's derived graphs are hub-capped).

    Physical plan: one partitioned self-join of the symmetrized edge
    table on the middle vertex (intermediate row count is exactly
    Σ_m deg(m)² — bounded by derive's heavy-key cap; THE term a 100-TB
    run must budget, and why the scale path switches to per-round HLL
    unions once Σdeg² outgrows the cluster), a union with the direct
    edges, then two bucketed collapses that both key on the source
    vertex: distinct-(v, w) first, count-per-v second.  Vertices whose
    2-hop ball is empty come back 0 via the driver's O(|V|) id vector
    (the repo's documented |V|≪|E| pattern)."""
    from ..ops import grouped_pandas_agg, join

    def _vm(t: pa.Table) -> pa.Table:
        s, d = np_col(t, "src"), np_col(t, "dst")
        return pa.table({"v": pa.array(np.r_[s, d], pa.int64()),
                         "mid": pa.array(np.r_[d, s], pa.int64())})

    def _mw(t: pa.Table) -> pa.Table:
        s, d = np_col(t, "src"), np_col(t, "dst")
        return pa.table({"mid": pa.array(np.r_[s, d], pa.int64()),
                         "w": pa.array(np.r_[d, s], pa.int64())})

    e = edges.select_columns(["src", "dst"])
    two = join(e.map_batches(_vm, batch_format="pyarrow"),
               e.map_batches(_mw, batch_format="pyarrow"),
               on="mid", broadcast=False, num_buckets=num_buckets)

    def _proj(t: pa.Table) -> pa.Table:
        v, w = np_col(t, "v"), np_col(t, "w")
        m = v != w
        return pa.table({"v": pa.array(v[m], pa.int64()),
                         "w": pa.array(w[m], pa.int64())})

    direct = e.map_batches(
        lambda t: pa.table({
            "v": pa.array(np.r_[np_col(t, "src"), np_col(t, "dst")],
                          pa.int64()),
            "w": pa.array(np.r_[np_col(t, "dst"), np_col(t, "src")],
                          pa.int64())}),
        batch_format="pyarrow")
    cand = two.map_batches(_proj, batch_format="pyarrow").union(direct)
    dist = grouped_pandas_agg(cand, keys=["v", "w"],
                              aggs={"n": ("w", "count")},
                              num_buckets=num_buckets)
    per_v = grouped_pandas_agg(dist, keys=["v"],
                               aggs={"n2": ("w", "count")},
                               num_buckets=num_buckets)
    vids = ray.get(g.vertex_ids_ref)
    out = np.zeros(len(vids), np.int64)
    for r in per_v.take_all():
        out[int(np.searchsorted(vids, r["v"]))] = r["n2"]
    return pa.table({"vid": pa.array(vids, pa.int64()),
                     "n2": pa.array(out, pa.int64())})
