"""Triangle counting — degree-ordered ("forward") intersection.

Semantics (SURVEY.md §2.2 A4, mirroring gunrock/essentials
``include/gunrock/algorithms/tc.hxx`` [U — snapshot absent]): on the
undirected simple graph, rank vertices by (degree, vid); orient every
edge low-rank → high-rank; a triangle {u,v,w} is counted exactly once,
at its lowest-ranked pair, as ``|N⁺(u) ∩ N⁺(v)|``.  Outputs the global
total and per-vertex triangle counts.

Two physical plans, same results:

- ``method="intersect"`` (default): an actor-pool ``map_batches`` over
  the oriented edge list; each batch's adjacency lists are expanded for
  BOTH endpoints in bulk and intersected with ONE vectorized
  lexsort-and-adjacent-equal pass (no Python loop over edges).
  Partitioning assumption: an actor may touch any shard (edges arrive
  grouped by hash(u) but v's shard is arbitrary), so worst-case
  per-NODE residency is the full oriented adjacency (~|E|/2 int64s) —
  fastest plan while N⁺ fits a node.
- ``method="wedge"``: the shuffle-only plan for when it doesn't — per
  source vertex emit its ordered neighbor pairs (wedges (v,w) keyed by
  the closing edge), then one bucketed hash join of wedges against the
  oriented edge set.  No shard residency at all; shuffle volume is
  Σ_u deg⁺(u)², which degree-ordering bounds by O(|E|^1.5)
  (arboricity argument — the classic MapReduce TC of
  Suri–Vassilvitskii).  This is the 100-TB path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..graph import GraphShards, build_graph
from ..ops import hash_bucket_agg
from ..util import csr_lookup, expand_neighbors, hash64, np_col, part_of, segment_sum


def _intersect_increments(
    src: np.ndarray,
    dst: np.ndarray,
    shard_of,
    P: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-edge sorted-adjacency intersection.

    For every edge i, elements common to N⁺(src_i) and N⁺(dst_i) are
    found in ONE lexsort over the concatenated (edge, neighbor) pairs —
    adjacency lists are unique-valued, so a (edge, value) pair occurring
    twice means "value ∈ both lists".  Returns pre-combined
    (vid, tri_increment) arrays crediting u, v and every common w.
    """
    n = len(src)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    # gather both endpoints' adjacency lists, grouped by owning shard
    eidx_parts: list[np.ndarray] = []
    nbr_parts: list[np.ndarray] = []
    for endpoint in (src, dst):
        parts = part_of(endpoint, P)
        for p in np.unique(parts):
            sel = np.flatnonzero(parts == p)
            shard = shard_of(int(p))
            rows, found = csr_lookup(shard, endpoint[sel])
            hit = np.flatnonzero(found)
            if not len(hit):
                continue
            rep, nbrs, _ = expand_neighbors(shard, rows[hit])
            eidx_parts.append(sel[hit][rep])
            nbr_parts.append(nbrs)
    if not eidx_parts:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    eidx = np.concatenate(eidx_parts)
    vals = np.concatenate(nbr_parts)
    order = np.lexsort((vals, eidx))
    se, sv = eidx[order], vals[order]
    dup = np.flatnonzero((se[1:] == se[:-1]) & (sv[1:] == sv[:-1]))
    if not len(dup):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    w_vals = sv[dup]  # each common neighbor w of edge (u, v)
    w_eidx = se[dup]
    cnt = np.bincount(w_eidx, minlength=n).astype(np.int64)
    vid_out = np.concatenate([np.repeat(src, cnt), np.repeat(dst, cnt), w_vals])
    inc_out = np.ones(len(vid_out), np.int64)
    # local pre-combine before the groupby shuffle
    uniq, sums, _ = segment_sum(vid_out, inc_out)
    return uniq, sums


class _TriangleStage:
    """Actor-pool callable: holds oriented-N⁺ CSR shards (fetched
    zero-copy from plasma, cached for the actor's lifetime) and runs the
    vectorized intersection kernel over each edge batch."""

    def __init__(self, shard_refs, num_parts):
        self.refs = shard_refs
        self.P = num_parts
        self.cache: dict[int, dict] = {}

    def _shard(self, p: int) -> dict:
        s = self.cache.get(p)
        if s is None:
            s = ray.get(self.refs[p])
            self.cache[p] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = np_col(batch, "src")
        dst = np_col(batch, "dst")
        vid, tri = _intersect_increments(src, dst, self._shard, self.P)
        return pa.table(
            {"vid": pa.array(vid, pa.int64()), "tri": pa.array(tri, pa.int64())}
        )


def _pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic int64 key for a vertex pair (for bucketed joins)."""
    with np.errstate(over="ignore"):
        return (
            hash64(a) * np.uint64(0x9E3779B97F4A7C15) ^ hash64(b)
        ).astype(np.int64)


def _wedge_increments(oriented: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """Shuffle-only TC: wedges (u; v<w from N⁺(u)) hash-joined against
    the oriented edge set on the closing pair (v, w)."""

    # 1) group oriented edges by source, expand ordered neighbor pairs
    # (vectorized triangular expansion — util.grouped_pair_expand)
    def _expand_wedges(grp: pa.Table) -> pa.Table:
        from ..util import grouped_pair_expand

        s = np_col(grp, "src")
        d = np_col(grp, "dst")
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        v, w, base = grouped_pair_expand(s, d)
        return pa.table(
            {
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "u": pa.array(s[base], pa.int64()),
            }
        )

    wedges = hash_bucket_agg(
        oriented,
        lambda b: np_col(b, "src"),
        _expand_wedges,
        num_buckets=num_buckets,
    )

    # 2) bucketed hash join on the closing pair (v, w) against the
    # oriented edge set; neighbor lists are ordered by (degree, vid)
    # rank only implicitly — the closing edge may be oriented either
    # way in rank order, but N⁺ pairs (v, w) both follow u, so exactly
    # one of (v→w) or (w→v) can exist; probe the canonical (min,max)
    # form of both sides
    def _tag_edges(t: pa.Table) -> pa.Table:
        s, d = np_col(t, "src"), np_col(t, "dst")
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table(
            {
                "v": pa.array(lo, pa.int64()),
                "w": pa.array(hi, pa.int64()),
                "u": pa.array(np.full(len(s), -1), pa.int64()),
            }
        )

    def _tag_wedges(t: pa.Table) -> pa.Table:
        v, w = np_col(t, "v"), np_col(t, "w")
        lo, hi = np.minimum(v, w), np.maximum(v, w)
        return pa.table(
            {
                "v": pa.array(lo, pa.int64()),
                "w": pa.array(hi, pa.int64()),
                "u": np_col(t, "u"),
            }
        )

    tagged = oriented.map_batches(_tag_edges, batch_format="pyarrow").union(
        wedges.map_batches(_tag_wedges, batch_format="pyarrow")
    )

    def _join_bucket(grp: pa.Table) -> pa.Table:
        v, w, u = np_col(grp, "v"), np_col(grp, "w"), np_col(grp, "u")
        is_edge = u == -1
        ek = _pair_key(v[is_edge], w[is_edge])
        ek.sort()
        wi = np.flatnonzero(~is_edge)
        wk = _pair_key(v[wi], w[wi])
        pos = np.searchsorted(ek, wk)
        ok = (pos < len(ek)) & (ek[np.minimum(pos, max(len(ek) - 1, 0))] == wk) if len(ek) else np.zeros(len(wk), bool)
        hit = wi[ok]
        vid = np.concatenate([u[hit], v[hit], w[hit]])
        uniq, sums, _ = segment_sum(vid, np.ones(len(vid), np.int64))
        return pa.table(
            {"vid": pa.array(uniq, pa.int64()), "tri": pa.array(sums, pa.int64())}
        )

    return hash_bucket_agg(
        tagged,
        lambda b: _pair_key(np_col(b, "v"), np_col(b, "w")),
        _join_bucket,
        num_buckets=num_buckets,
    )


def triangle_counts(
    edges: rd.Dataset,
    work_dir: str,
    num_parts: int,
    *,
    vertex_ids: np.ndarray | None = None,
    n_actors: int | None = None,
    method: str = "intersect",
) -> tuple[int, rd.Dataset]:
    """edges (canonical undirected src<dst, deduped, self-loop-free) →
    (total_triangles, per-vertex counts Dataset (vid, triangles) covering
    the whole vertex universe, zeros included)."""
    assert method in ("intersect", "wedge")
    if n_actors is None:
        n_actors = max(1, min(num_parts, int(ray.cluster_resources().get("CPU", 4))))

    # phase 1: degrees of the symmetrized graph
    g_sym = build_graph(
        edges.select_columns(["src", "dst"]),
        os.path.join(work_dir, "tc_sym"),
        num_parts,
        symmetrize=True,
        vertex_ids=vertex_ids,
    )
    vids = ray.get(g_sym.vertex_ids_ref)
    deg = np.zeros(len(vids), np.int64)
    for t in ray.get(list(g_sym.degree_refs)):
        pos = np.searchsorted(vids, np_col(t, "vid"))
        deg[pos] += np_col(t, "outdeg")
    # rank by (degree, vid): rank_of[i] = position of vertex i in the order
    rank_of = np.empty(len(vids), np.int64)
    rank_of[np.lexsort((vids, deg))] = np.arange(len(vids))
    lookup_ref = ray.put((vids, rank_of))

    def _orient(batch: pa.Table) -> pa.Table:
        v, r = ray.get(lookup_ref)
        s, d = np_col(batch, "src"), np_col(batch, "dst")
        keep = s != d
        s, d = s[keep], d[keep]
        rs = r[np.searchsorted(v, s)]
        rd_ = r[np.searchsorted(v, d)]
        lo = np.where(rs < rd_, s, d)
        hi = np.where(rs < rd_, d, s)
        return pa.table({"src": pa.array(lo, pa.int64()), "dst": pa.array(hi, pa.int64())})

    oriented = edges.select_columns(["src", "dst"]).map_batches(
        _orient, batch_format="pyarrow"
    )

    if method == "wedge":
        incr = _wedge_increments(oriented.materialize(), num_buckets=num_parts)
    else:
        g_fwd = build_graph(
            oriented,
            os.path.join(work_dir, "tc_fwd"),
            num_parts,
            symmetrize=False,
            vertex_ids=vids,
        )
        incr = rd.read_parquet(g_fwd.edges_dir, columns=["src", "dst"]).map_batches(
            _TriangleStage,
            fn_constructor_args=(g_fwd.shard_refs, num_parts),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
            concurrency=(1, n_actors),
            num_cpus=1,
            max_restarts=0,
        )
    from ray.data.aggregate import Sum

    counts = incr.groupby("vid").aggregate(Sum("tri")).rename_columns(
        {"sum(tri)": "triangles"}
    )
    zeros = rd.from_arrow(
        pa.table({"vid": pa.array(vids, pa.int64()),
                  "triangles": pa.array(np.zeros(len(vids), np.int64), pa.int64())})
    )
    per_vertex = (
        counts.union(zeros)
        .groupby("vid")
        .aggregate(Sum("triangles"))
        .rename_columns({"sum(triangles)": "triangles"})
    ).materialize()
    total = int((per_vertex.sum("triangles") or 0) // 3)
    return total, per_vertex
