"""Triangle counting — degree-ordered ("forward") intersection.

Semantics (SURVEY.md §2.2 A4, mirroring gunrock/essentials
``include/gunrock/algorithms/tc.hxx`` [U — snapshot absent]): on the
undirected simple graph, rank vertices by (degree, vid); orient every
edge low-rank → high-rank; a triangle {u,v,w} is counted exactly once,
at its lowest-ranked pair, as ``|N⁺(u) ∩ N⁺(v)|``.  Outputs the global
total and per-vertex triangle counts.

Not BSP — a two-phase Dataset pipeline:
  1. degree pass (symmetrized graph shards → degree table, broadcast
     rank array via ``ray.put``), orient edges in ``map_batches``;
  2. build oriented N⁺ CSR shards; an actor-pool ``map_batches`` over
     the oriented edge list intersects the (sorted) adjacency lists of
     both endpoints — actors cache shards zero-copy from plasma.
     Partitioning assumption: an actor may touch any shard (edges are
     grouped by hash(u) but v's shard is arbitrary); per-NODE residency
     is the full oriented adjacency in the worst case, which is ~|E|/2
     int64s — the documented trade-off vs a 3-way shuffle join
     (SURVEY.md §2.2 A4 wedge-join fallback).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..graph import GraphShards, build_graph
from ..util import csr_lookup, np_col, part_of


class _TriangleStage:
    """Actor: per oriented edge (u,v) emit triangle increments for u, v
    and every common neighbor w."""

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

    def _nbrs(self, v: int) -> np.ndarray:
        sh = self._shard(int(part_of(np.array([v]), self.P)[0]))
        rows, found = csr_lookup(sh, np.array([v], dtype=np.int64))
        if not found[0]:
            return np.zeros(0, np.int64)
        r = rows[0]
        return sh["indices"][sh["indptr"][r] : sh["indptr"][r + 1]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = np_col(batch, "src")
        dst = np_col(batch, "dst")
        order = np.argsort(src, kind="stable")  # group by u: load N⁺(u) once
        out_v: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        cur_u, nu = None, None
        for i in order:
            u, v = int(src[i]), int(dst[i])
            if u != cur_u:
                cur_u, nu = u, self._nbrs(u)
            nv = self._nbrs(v)
            common = np.intersect1d(nu, nv, assume_unique=True)
            c = len(common)
            if c:
                out_v.append(np.array([u, v], np.int64))
                out_c.append(np.array([c, c], np.int64))
                out_v.append(common)
                out_c.append(np.ones(c, np.int64))
        if not out_v:
            return pa.table(
                {"vid": pa.array([], pa.int64()), "tri": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "vid": pa.array(np.concatenate(out_v), pa.int64()),
                "tri": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )


def triangle_counts(
    edges: rd.Dataset,
    work_dir: str,
    num_parts: int,
    *,
    vertex_ids: np.ndarray | None = None,
    n_actors: int | None = None,
) -> tuple[int, rd.Dataset]:
    """edges (canonical undirected src<dst, deduped, self-loop-free) →
    (total_triangles, per-vertex counts Dataset (vid, triangles) covering
    the whole vertex universe, zeros included)."""
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
