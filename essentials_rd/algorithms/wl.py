"""Weisfeiler–Leman (1-WL) color refinement — the structural
fingerprint behind graph-isomorphism screening, GNN expressivity
(Morris et al., AAAI 2019; Shervashidze et al., JMLR 2011 WL kernels)
and structural-role dedup: after k rounds two vertices share a color
only if their depth-k neighborhood trees are indistinguishable.

Each round replaces a vertex's color with a deterministic function of
its current color and the MULTISET of its neighbours' colors.  The
textbook formulation hashes the sorted neighbour-color list; sorting
per vertex is needless at scale — any order-invariant combine works,
and since BOTH engines (Ray and the DuckDB oracle) evaluate the same
fixed function, correctness is exact reproducibility of that function,
not injectivity (collisions merge classes identically on both sides).
Over m(u) = splitmix64(c(u)) we fold three order-invariant integer
summaries — wrapped sum, bitwise xor, count — and rehash with the
vertex's own color:

    c'(v) = splitmix64((5·c(v) + 3·Σm + 7·⊕m + n) mod 2⁶⁴)

c₀(v) = deg(v), so colors are a pure function of graph structure:
isomorphic components produce identical color MULTISETS no matter how
their vertices are numbered (pinned in pytest).

Dataflow per round — the PageRank message discipline with a 3-lane
payload: ONE partitioned hash join ships colors onto the symmetrized
edge table, each block pre-combines its (dst, m) rows into one
(dst, s, x, n) partial per distinct dst (lexsort + wrap-sum /
xor / count reduceat), and ONE dst-bucketed exchange merges partials
TOGETHER with the color table (colors ride the same exchange as
(vid, c, 0, 0, 0) rows, so the empty-multiset case for isolated
vertices falls out of the fold and no 64-bit value ever crosses a
pandas left join, whose NaN path would round full-width integers
through float64).  Per-round cost: one join + one exchange, payload
one partial row per (block, dst) — never one per edge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..graph import GraphShards
from ..ops import hash_bucket_agg, join
from ..util import hash64, np_col


def _as_i64(a: np.ndarray) -> pa.Array:
    return pa.array(np.ascontiguousarray(a).view(np.int64), pa.int64())


def _fold(vid: np.ndarray, c: np.ndarray, s: np.ndarray,
          x: np.ndarray, n: np.ndarray):
    """Per-vid order-invariant reduce: c/s wrap-sum, x xor, n sum.
    All of c, s, x are uint64 bit patterns; each vid has exactly one
    nonzero-c row (its color) so summing the c lane recovers it."""
    order = np.argsort(vid, kind="stable")
    v = vid[order]
    starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
    with np.errstate(over="ignore"):
        cc = np.add.reduceat(c[order], starts)
        ss = np.add.reduceat(s[order], starts)
    xx = np.bitwise_xor.reduceat(x[order], starts)
    nn = np.add.reduceat(n[order], starts)
    return v[starts], cc, ss, xx, nn


def _fold_table(grp: pa.Table) -> pa.Table:
    vid = np_col(grp, "vid")
    v, cc, ss, xx, nn = _fold(
        vid,
        np_col(grp, "c").view(np.uint64),
        np_col(grp, "s").view(np.uint64),
        np_col(grp, "x").view(np.uint64),
        np_col(grp, "n").view(np.uint64),
    )
    return pa.table({"vid": pa.array(v, pa.int64()), "c": _as_i64(cc),
                     "s": _as_i64(ss), "x": _as_i64(xx),
                     "n": _as_i64(nn)})


def wl_refine(
    g: GraphShards,
    edges: rd.Dataset,
    rounds: int = 3,
    num_buckets: int = 32,
) -> pa.Table:
    """Run ``rounds`` 1-WL refinement rounds over the canonical
    (src < dst) undirected edge table; return (vid, color) sorted by
    vid, color being the final hash's two's-complement int64 bit
    pattern (what the DuckDB twin emits after its UBIGINT fold)."""
    vids = ray.get(g.vertex_ids_ref)

    def _sym(t: pa.Table) -> pa.Table:
        s, d = np_col(t, "src"), np_col(t, "dst")
        return pa.table({"vid": pa.array(np.r_[s, d], pa.int64()),
                         "nbr": pa.array(np.r_[d, s], pa.int64())})

    sym = (edges.select_columns(["src", "dst"])
           .map_batches(_sym, batch_format="pyarrow").materialize())

    # c0 = degree over sym, zero for isolated vertices: the vertex
    # table rides the degree exchange as (vid, n=0) rows.
    def _deg_partial(t: pa.Table) -> pa.Table:
        vid = np_col(t, "vid")
        v, cnt = np.unique(vid, return_counts=True)
        return pa.table({"vid": pa.array(v, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    verts = rd.from_arrow(pa.table({
        "vid": pa.array(vids, pa.int64()),
        "n": pa.array(np.zeros(len(vids), np.int64), pa.int64()),
    }))

    def _deg_merge(grp: pa.Table) -> pa.Table:
        vid, n = np_col(grp, "vid"), np_col(grp, "n")
        order = np.argsort(vid, kind="stable")
        v = vid[order]
        starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        tot = np.add.reduceat(n[order], starts)
        return pa.table({"vid": pa.array(v[starts], pa.int64()),
                         "c": pa.array(tot, pa.int64())})

    colors = hash_bucket_agg(
        sym.map_batches(_deg_partial, batch_format="pyarrow")
           .union(verts),
        lambda t: np_col(t, "vid"),
        _deg_merge, num_buckets=num_buckets).materialize()

    def _msg_partial(t: pa.Table) -> pa.Table:
        tgt = np_col(t, "nbr")
        m = hash64(np_col(t, "c"))
        ones = np.ones(len(tgt), np.uint64)
        v, _, ss, xx, nn = _fold(tgt, np.zeros(len(tgt), np.uint64),
                                 m, m, ones)
        return pa.table({"vid": pa.array(v, pa.int64()),
                         "c": _as_i64(np.zeros(len(v), np.uint64)),
                         "s": _as_i64(ss), "x": _as_i64(xx),
                         "n": _as_i64(nn)})

    def _self_rows(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        return pa.table({"vid": t.column("vid"), "c": t.column("c"),
                         "s": pa.array(z, pa.int64()),
                         "x": pa.array(z, pa.int64()),
                         "n": pa.array(z, pa.int64())})

    def _update(t: pa.Table) -> pa.Table:
        c = np_col(t, "c").view(np.uint64)
        s = np_col(t, "s").view(np.uint64)
        x = np_col(t, "x").view(np.uint64)
        n = np_col(t, "n").view(np.uint64)
        with np.errstate(over="ignore"):
            k = (np.uint64(5) * c + np.uint64(3) * s
                 + np.uint64(7) * x + n)
        return pa.table({"vid": t.column("vid"),
                         "c": _as_i64(hash64(k.view(np.int64)))})

    for _ in range(rounds):
        msgs = join(sym, colors, on="vid", how="inner",
                    broadcast=False, num_buckets=num_buckets)
        fused = (msgs.map_batches(_msg_partial, batch_format="pyarrow")
                 .union(colors.map_batches(_self_rows,
                                           batch_format="pyarrow")))
        colors = (hash_bucket_agg(fused, lambda t: np_col(t, "vid"),
                                  _fold_table, num_buckets=num_buckets)
                  .map_batches(_update, batch_format="pyarrow")
                  .materialize())

    rows = colors.take_all()
    rows.sort(key=lambda r: r["vid"])
    return pa.table({
        "vid": pa.array([r["vid"] for r in rows], pa.int64()),
        "color": pa.array([r["c"] for r in rows], pa.int64()),
    })


def wl_refine_local(src: np.ndarray, dst: np.ndarray,
                    vids: np.ndarray, rounds: int = 3) -> np.ndarray:
    """Single-process reference (tests): same function, adjacency
    lists + Python loop over vertices."""
    idx = {int(v): i for i, v in enumerate(vids)}
    adj: list[list[int]] = [[] for _ in vids]
    for a, b in zip(src, dst):
        adj[idx[int(a)]].append(idx[int(b)])
        adj[idx[int(b)]].append(idx[int(a)])
    c = np.array([len(a) for a in adj], np.uint64)
    for _ in range(rounds):
        m = hash64(c.view(np.int64))
        nxt = np.empty_like(c)
        with np.errstate(over="ignore"):
            for i, nbrs in enumerate(adj):
                mm = m[np.asarray(nbrs, np.int64)] if nbrs else \
                    np.zeros(0, np.uint64)
                s = np.uint64(mm.sum(dtype=np.uint64)) if len(mm) else \
                    np.uint64(0)
                x = np.bitwise_xor.reduce(mm) if len(mm) else np.uint64(0)
                k = (np.uint64(5) * c[i] + np.uint64(3) * s
                     + np.uint64(7) * x + np.uint64(len(mm)))
                nxt[i] = hash64(np.array([k], np.uint64))[0]
        c = nxt
    return c.view(np.int64)
