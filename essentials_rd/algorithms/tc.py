"""Triangle counting — degree-ordered ("forward") intersection.

Semantics (SURVEY.md §2.2 A4, mirroring gunrock/essentials
``include/gunrock/algorithms/tc.hxx`` [U — snapshot absent]): on the
undirected simple graph, rank vertices by (degree, vid); orient every
edge low-rank → high-rank; a triangle {u,v,w} is counted exactly once,
at its lowest-ranked pair, as ``|N⁺(u) ∩ N⁺(v)|``.  Outputs the global
total and per-vertex triangle counts.

Vertices are relabelled to DENSE RANK IDS before counting (the rank
order already computed for orientation): orientation becomes a plain
``min/max``, every id fits 32 bits up to 4B vertices, and an oriented
edge packs into one uint64 ``(src << 32) | dst`` key.

Two physical plans, same results:

- ``method="intersect"`` (default): an actor-pool ``map_batches`` over
  the oriented edge list.  For each edge the SMALLER endpoint adjacency
  is expanded in bulk (Σ min(deg⁺(u), deg⁺(v)) elements — ~3× less than
  expanding both sides) and each candidate w is membership-tested
  against the packed sorted edge-key array with ONE vectorized
  ``np.searchsorted`` — no per-edge loop and no O(M log M) sort of the
  expansion.  Partitioning assumption: an actor may touch any shard
  (edges arrive grouped by hash(src) but the expand side is chosen per
  edge), so worst-case per-NODE residency is the full oriented
  adjacency + key array (~|E| uint64s each) — fastest plan while N⁺
  fits a node.
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

import functools

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..graph import build_graph
from ..ops import hash_bucket_agg
from ..util import csr_lookup, expand_neighbors, hash64, np_col, part_of, segment_sum


def _outdeg_of(x: np.ndarray, shard_of, P: int) -> np.ndarray:
    """Vectorized per-vertex out-degree lookup across CSR shards."""
    out = np.zeros(len(x), np.int64)
    parts = part_of(x, P)
    for p in np.unique(parts):
        sel = np.flatnonzero(parts == p)
        sh = shard_of(int(p))
        rows, found = csr_lookup(sh, x[sel])
        hit = np.flatnonzero(found)
        if not len(hit):
            continue
        ip = sh["indptr"]
        out[sel[hit]] = ip[rows[hit] + 1] - ip[rows[hit]]
    return out


#: Probe chunks are capped at this many candidate (edge, neighbor)
#: pairs so every temporary stays ~16 MB — small enough for the
#: allocator to recycle between chunks instead of mmap/munmap-ing
#: hundreds of MB per batch (page-fault-bound on this host: measured
#: 49-90 s cold vs 1.3 s warm for the same 48.7M-candidate expand).
_PROBE_CHUNK = 2_000_000

#: Above this vertex-universe size the per-actor dense bincount
#: accumulator (8 B × |V|) would strain worker heaps; fall back to
#: chunk-local sorted pre-combine (bounded by the chunk, not |V|).
_DENSE_ACC_LIMIT = 1 << 26


def _membership_increments(
    src: np.ndarray,
    dst: np.ndarray,
    shard_of,
    P: int,
    edge_keys: np.ndarray,
    n_ranks: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Min-side expansion + packed-key membership probe.

    For every oriented edge (u, v): expand the smaller of N⁺(u), N⁺(v)
    and test each candidate w against the sorted packed edge-key array
    (w closes the triangle iff the oriented edge (other, w) exists).
    Returns pre-combined (vid, tri_increment) arrays crediting u, v and
    every common w.  All ids are dense ranks < 2³² (asserted by the
    caller), so a pair packs losslessly into one uint64.

    The probe runs in ``_PROBE_CHUNK``-candidate chunks and pre-combines
    into a dense ``np.bincount`` accumulator of length ``n_ranks``
    (ids are dense ranks, so this is exact) — replacing the previous
    whole-batch ``segment_sum`` whose O(M log M) argsort over the
    concatenated increment stream dominated the kernel (measured 57 s
    of a 63 s warm kernel at 48.7M candidates).  When ``n_ranks``
    exceeds ``_DENSE_ACC_LIMIT`` the pre-combine is chunk-local sorted
    reduction instead, keeping per-actor memory bounded by the chunk.
    """
    n = len(src)
    zeros = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    if n == 0:
        return zeros
    du = _outdeg_of(src, shard_of, P)
    dv = _outdeg_of(dst, shard_of, P)
    take_src = du <= dv
    expand_x = np.where(take_src, src, dst)  # side whose N⁺ is expanded
    other_y = np.where(take_src, dst, src)  # side probed for membership
    dense = n_ranks <= _DENSE_ACC_LIMIT
    acc = np.zeros(n_ranks, np.int64) if dense else None
    sparse_parts: list[tuple[np.ndarray, np.ndarray]] = []
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
            if not len(rep) or not n_keys:
                start = end
                continue
            e_sel = sel[start:end][rep]
            key = (
                other_y[e_sel].astype(np.uint64) << np.uint64(32)
            ) | nbrs.astype(np.uint64)
            pos = np.searchsorted(edge_keys, key)
            ok = (pos < n_keys) & (edge_keys[np.minimum(pos, n_keys - 1)] == key)
            hits = np.flatnonzero(ok)
            start = end
            if not len(hits):
                continue
            e_hit = e_sel[hits]
            credit = np.concatenate([src[e_hit], dst[e_hit], nbrs[hits]])
            if dense:
                acc += np.bincount(credit, minlength=n_ranks)
            else:
                uniq, sums, _ = segment_sum(
                    credit, np.ones(len(credit), np.int64)
                )
                sparse_parts.append((uniq, sums))
    if dense:
        nz = np.flatnonzero(acc)
        if not len(nz):
            return zeros
        return nz, acc[nz]
    if not sparse_parts:
        return zeros
    uniq, sums, _ = segment_sum(
        np.concatenate([u for u, _ in sparse_parts]),
        np.concatenate([s for _, s in sparse_parts]),
    )
    return uniq, sums


@ray.remote
def _packed_edge_keys(*shards) -> np.ndarray:
    """Sorted packed (src<<32)|dst key array over all shards — built
    ONCE as a plasma object every probe actor maps zero-copy, instead
    of each actor re-sorting |E| keys in its own heap."""
    parts = []
    for sh in shards:
        degs = np.diff(sh["indptr"])
        srcs = np.repeat(sh["srcs"], degs)
        parts.append(
            (srcs.astype(np.uint64) << np.uint64(32))
            | sh["indices"].astype(np.uint64)
        )
    return np.sort(np.concatenate(parts)) if parts else np.zeros(0, np.uint64)


def _probe_batch(shard_refs, num_parts, keys_ref, n_ranks, batch: pa.Table) -> pa.Table:
    """Task-mode probe kernel: plain ``map_batches`` tasks on the
    long-lived worker pool, with shards and the packed key array
    fetched zero-copy from plasma ONCE per worker process via the
    engine's per-worker cache (`superstep._cached_shard`) — replacing
    the former actor-pool stage whose per-execution actor spawn cost
    more than the probe compute itself."""
    from ..superstep import _cached_shard

    keys = _cached_shard(keys_ref)
    vid, tri = _membership_increments(
        np_col(batch, "src"),
        np_col(batch, "dst"),
        lambda p: _cached_shard(shard_refs[p]),
        num_parts,
        keys,
        n_ranks,
    )
    return pa.table(
        {"vid": pa.array(vid, pa.int64()), "tri": pa.array(tri, pa.int64())}
    )


#: Above this rank-universe size the dense final combine (an 8-ary
#: tree of length-|V| int64 accumulators + one driver-built table)
#: would cost too much memory per task; fall back to the bucketed
#: shuffle combine.
_DENSE_FINAL_LIMIT = 1 << 24


@ray.remote
def _dense_block_sum(n_ranks: int, *tables) -> np.ndarray:
    acc = np.zeros(n_ranks, np.int64)
    for t in tables:
        # 0-row blocks pass through map_batches without the UDF and
        # arrive schema-less — skip them
        if t.num_rows == 0 or "vid" not in t.schema.names:
            continue
        # each probe-block output has unique vids (bincount nonzeros),
        # so fancy-index add is exact
        acc[np_col(t, "vid")] += np_col(t, "tri")
    return acc


@ray.remote
def _dense_arr_sum(*arrs) -> np.ndarray:
    acc = arrs[0].copy()
    for a in arrs[1:]:
        acc += a
    return acc


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
        # Membership test uses the EXACT packed (v << 32) | w key, not the
        # hashed _pair_key (which only routes rows to buckets): vertices
        # here are dense ranks < 2^32 (asserted in triangle_counts), so
        # the pack is lossless and a hit proves real pair equality — no
        # 64-bit birthday collisions at 1e10+ wedges.
        v, w, u = np_col(grp, "v"), np_col(grp, "w"), np_col(grp, "u")
        is_edge = u == -1
        ek = (v[is_edge].astype(np.uint64) << np.uint64(32)) | w[
            is_edge
        ].astype(np.uint64)
        ek.sort()
        wi = np.flatnonzero(~is_edge)
        wk = (v[wi].astype(np.uint64) << np.uint64(32)) | w[wi].astype(np.uint64)
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


@ray.remote
def _deg_leaf(*tables) -> pa.Table:
    parts = [
        np.concatenate([np_col(t, "src"), np_col(t, "dst")])
        for t in tables
        if t.num_rows
    ]
    if not parts:
        return pa.table({"vid": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    both = np.concatenate(parts)
    uniq, sums, _ = segment_sum(both, np.ones(len(both), np.int64))
    return pa.table(
        {"vid": pa.array(uniq, pa.int64()), "cnt": pa.array(sums, pa.int64())}
    )


@ray.remote
def _deg_merge(*tables) -> pa.Table:
    uniq, sums, _ = segment_sum(
        np.concatenate([np_col(t, "vid") for t in tables]),
        np.concatenate([np_col(t, "cnt") for t in tables]),
    )
    return pa.table(
        {"vid": pa.array(uniq, pa.int64()), "cnt": pa.array(sums, pa.int64())}
    )


def _undirected_degrees(
    edges: rd.Dataset, num_parts: int
) -> tuple[np.ndarray, np.ndarray]:
    """(vid, degree) of every vertex touched by the canonical edge
    table, via a tree of per-block pre-combine tasks (sorted (vid,cnt)
    partials, 8-ary segment-sum merges) — no shuffle, no graph build,
    no symmetrized edge materialization.  Each merge output is ≤ |V|
    rows, the same driver budget the rank array needs anyway."""
    blocks = edges.to_arrow_refs()
    refs = [
        _deg_leaf.remote(*blocks[i : i + 4])
        for i in range(0, max(len(blocks), 1), 4)
    ]
    while len(refs) > 1:
        refs = [
            _deg_merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)
        ]
    # ≤ |V| rows come back to the driver (|V| ≪ |E|, same budget as the
    # rank array itself, which is driver-side by construction)
    t = ray.get(refs[0])
    return np_col(t, "vid"), np_col(t, "cnt")


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
        # probe actors are NOT capped by num_parts: each actor fetches
        # shards zero-copy from plasma (one physical copy per node), so
        # more actors than shards costs no extra memory, only CPU
        n_actors = max(1, int(ray.cluster_resources().get("CPU", 4)))

    # phase 1: undirected degrees (one bucketed aggregate over the edge
    # table) → (degree, vid) rank order for orientation
    dvid, dcnt = _undirected_degrees(edges, num_parts)
    if vertex_ids is None:
        vids = np.sort(dvid)
    else:
        vids = np.asarray(vertex_ids, dtype=np.int64)
    deg = np.zeros(len(vids), np.int64)
    deg[np.searchsorted(vids, dvid)] = dcnt
    n_v = len(vids)
    assert n_v < 2**32, (
        "rank-packed intersect plan needs |V| < 2^32; use method='wedge'"
    )
    # rank_of[i] = dense rank of vertex vids[i]; vid_of_rank inverts it
    rank_of = np.empty(n_v, np.int64)
    order = np.lexsort((vids, deg))
    rank_of[order] = np.arange(n_v)
    vid_of_rank = vids[order]
    lookup_ref = ray.put((vids, rank_of))

    def _orient(batch: pa.Table) -> pa.Table:
        v, r = ray.get(lookup_ref)
        s, d = np_col(batch, "src"), np_col(batch, "dst")
        keep = s != d
        s, d = s[keep], d[keep]
        rs = r[np.searchsorted(v, s)]
        rd_ = r[np.searchsorted(v, d)]
        lo = np.minimum(rs, rd_)
        hi = np.maximum(rs, rd_)
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
            vertex_ids=np.arange(n_v, dtype=np.int64),
            persist=False,
        )
        # probe stream = the materialized prepped blocks (no parquet
        # round-trip); probe parallelism is block count (batch_size=None
        # → one batch per block): split past num_parts so every worker
        # stays busy
        mat = g_fwd.edges_ds
        want_blocks = max(num_parts, n_actors)
        probe = mat.select_columns(["src", "dst"])
        if mat.num_blocks() < want_blocks:
            probe = probe.repartition(want_blocks)
        keys_ref = _packed_edge_keys.remote(*g_fwd.shard_refs)
        incr = probe.map_batches(
            functools.partial(
                _probe_batch, g_fwd.shard_refs, num_parts, keys_ref, n_v
            ),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
    if method == "intersect" and n_v <= _DENSE_FINAL_LIMIT:
        # dense final combine: per-block (vid, tri) partials (ids are
        # dense ranks) tree-reduce into ONE length-|V| accumulator —
        # no shuffle, zeros included by construction; the driver-built
        # result is the same O(|V|) budget as the rank map itself
        blocks = incr.to_arrow_refs()
        refs = [
            _dense_block_sum.remote(n_v, *blocks[i : i + 8])
            for i in range(0, max(len(blocks), 1), 8)
        ]
        while len(refs) > 8:
            refs = [
                _dense_arr_sum.remote(*refs[i : i + 8])
                for i in range(0, len(refs), 8)
            ]
        acc = np.sum(ray.get(refs), axis=0) if len(refs) > 1 else ray.get(refs[0])
        per_vertex = rd.from_arrow(
            pa.table(
                {
                    "vid": pa.array(vid_of_rank, pa.int64()),
                    "triangles": pa.array(acc, pa.int64()),
                }
            )
        )
        return int(acc.sum() // 3), per_vertex

    # ONE bucketed shuffle sums the per-batch partials AND fills the
    # universe with zeros (unioned in rank space), then ranks map back
    # to real vertex ids (bijective, ≤ |V| rows touched)
    zeros = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(n_v, dtype=np.int64), pa.int64()),
                  "tri": pa.array(np.zeros(n_v, np.int64), pa.int64())})
    )

    def _sum_bucket(grp: pa.Table) -> pa.Table:
        uniq, sums, _ = segment_sum(np_col(grp, "vid"), np_col(grp, "tri"))
        return pa.table(
            {"vid": pa.array(uniq, pa.int64()), "tri": pa.array(sums, pa.int64())}
        )

    # reducer parallelism for the final combine is independent of the
    # shard count: the partial stream is ~n_v × probe-blocks rows
    summed = hash_bucket_agg(
        incr.union(zeros),
        lambda b: np_col(b, "vid"),
        _sum_bucket,
        num_buckets=max(num_parts, n_actors),
    )

    rank_map_ref = ray.put(vid_of_rank)

    def _to_vid(batch: pa.Table) -> pa.Table:
        m = ray.get(rank_map_ref)
        return pa.table(
            {
                "vid": pa.array(m[np_col(batch, "vid")], pa.int64()),
                "triangles": batch["tri"],
            }
        )

    per_vertex = summed.map_batches(_to_vid, batch_format="pyarrow").materialize()
    total = int((per_vertex.sum("triangles") or 0) // 3)
    return total, per_vertex
