"""4-clique (K4) census — id-ordered kClist over canonical edges.

Completes the small-motif family (triangles, 4-cycles, butterflies):
every K4 {a<b<c<d} is counted exactly once as its sorted tuple — the
triangle (a, b, c) of its three smallest vertices, extended by the one
d that is a canonical out-neighbor of a with (b, d) and (c, d) edges
and d > c (the Danisch et al. kClist orientation specialized to the
vertex-id total order, which matches the canonical src < dst edge
table the engine already stores — no re-orientation pass).

Dataflow is joins, not adjacency state: oriented wedges expand per
source with the repeat/arange kernel (no Python loop), triangles close
by ONE semi join on the packed (lo<<32|hi) pair key, the extension
fans out by ONE inner join back to the out-edge table, and the two
remaining clique edges are TWO more packed-key semi joins.  Every
probe compares the exact packed pair (ids asserted < 2^32) — never a
hash of it, so there is no collision caveat (the tc.py ADVICE
finding's failure mode is designed out here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..ops import hash_bucket_agg, join
from ..util import np_col


def _pack(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return ((lo.astype(np.uint64) << np.uint64(32))
            | hi.astype(np.uint64)).view(np.int64)


def k4_total(edges: rd.Dataset, num_buckets: int = 32) -> pa.Table:
    """One-row table (triangles, k4) over canonical (src < dst) edges.
    The triangle count rides along for free (the closed wedges) and
    doubles as a cross-check against the TC engine."""

    def _assert_ids(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64)
        d = np_col(t, "dst").astype(np.int64)
        assert len(s) == 0 or max(s.max(), d.max()) < 2**32, \
            "vids must fit 32 bits for exact pair packing"
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64())})

    e = edges.select_columns(["src", "dst"]).map_batches(
        _assert_ids, batch_format="pyarrow").materialize()

    def _keys(t: pa.Table) -> pa.Table:
        return pa.table({"pk": pa.array(
            _pack(np_col(t, "src"), np_col(t, "dst")), pa.int64())})

    ek = e.map_batches(_keys, batch_format="pyarrow")

    # oriented wedges: per source a, all out-neighbor pairs b < c
    def _wedges(grp: pa.Table) -> pa.Table:
        a = np_col(grp, "src")
        n = np_col(grp, "dst")
        order = np.lexsort((n, a))
        a, n = a[order], n[order]
        m = len(a)
        if m == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "pk": pa.array([], pa.int64())})
        starts = np.r_[0, np.flatnonzero(a[1:] != a[:-1]) + 1]
        ends = np.r_[starts[1:], m]
        seg_end = np.repeat(ends, ends - starts)
        idx = np.arange(m)
        cnt = seg_end - idx - 1
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "pk": pa.array([], pa.int64())})
        i_rep = np.repeat(idx, cnt)
        j = (np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
             + np.repeat(idx + 1, cnt))
        b, c = n[i_rep], n[j]  # sorted within segment → b < c
        return pa.table({"a": pa.array(a[i_rep], pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "c": pa.array(c, pa.int64()),
                         "pk": pa.array(_pack(b, c), pa.int64())})

    wedges = hash_bucket_agg(
        e, lambda t: np_col(t, "src"), _wedges, num_buckets)

    # triangles: close the wedge with the exact (b, c) edge
    tri = join(wedges, ek, on="pk", how="semi", broadcast=False,
               num_buckets=num_buckets).materialize()
    n_tri = tri.count()
    if n_tri == 0:
        return pa.table({"triangles": pa.array([0], pa.int64()),
                         "k4": pa.array([0], pa.int64())})

    # extend by d ∈ out(a) with d > c (sorted-tuple once-counting)
    def _as_a(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column("src").cast(pa.int64()),
                         "d": t.column("dst").cast(pa.int64())})

    ext = join(
        tri.select_columns(["a", "b", "c"]),
        e.map_batches(_as_a, batch_format="pyarrow"),
        on="a", how="inner", broadcast=False, num_buckets=num_buckets,
    )

    def _probe_bd(t: pa.Table) -> pa.Table:
        b, c, d = np_col(t, "b"), np_col(t, "c"), np_col(t, "d")
        keep = d > c
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "pk2": pa.array([], pa.int64())})
        b, c, d = np_col(t, "b"), np_col(t, "c"), np_col(t, "d")
        return pa.table({"pk": pa.array(_pack(b, d), pa.int64()),
                         "pk2": pa.array(_pack(c, d), pa.int64())})

    cand = ext.map_batches(_probe_bd, batch_format="pyarrow")
    # (b, d) must be an edge...
    s1 = join(cand, ek, on="pk", how="semi", broadcast=False,
              num_buckets=num_buckets)

    def _swap(t: pa.Table) -> pa.Table:
        return pa.table({"pk": t.column("pk2").cast(pa.int64())})

    # ...and (c, d) must be an edge
    s2 = join(s1.map_batches(_swap, batch_format="pyarrow"), ek,
              on="pk", how="semi", broadcast=False,
              num_buckets=num_buckets)
    k4 = s2.count()
    return pa.table({"triangles": pa.array([n_tri], pa.int64()),
                     "k4": pa.array([int(k4)], pa.int64())})
