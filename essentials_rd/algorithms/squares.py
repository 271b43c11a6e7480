"""4-cycle (square) counting via the wedge-pair identity.

For the simple undirected graph, every unordered vertex pair (u, v)
with c = |N(u) ∩ N(v)| common neighbors is the diagonal of C(c, 2)
squares, and every square has exactly two diagonals, so

    #C4 = (1/2) · Σ_{u<v} C(cn(u, v), 2).

This is the standard wedge-aggregation motif count (the same
Σ deg² cost class as the TC wedge plan, SURVEY §2.2 A4 family): each
center emits its C(deg, 2) sorted-neighbor pairs — vectorized with the
repeat/arange expansion, no Python loop — through ONE bucketed
exchange keyed on the packed (u<<32 | v) pair, each bucket counts its
pairs and folds Σ C(c, 2) locally, and the driver sums scalars.

``max_degree`` caps wedge emission per center for 100-TB hub safety —
but a cap breaks the two-diagonal symmetry, so the exact ``squares``
column is only emitted on uncapped runs (capped runs report the capped
wedge-pair sum and how many centers were skipped — counted, never
silent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..ops import hash_bucket_agg
from ..util import hash64, np_col


def squares_total(edges: rd.Dataset, num_buckets: int = 32,
                  max_degree: int | None = None) -> pa.Table:
    """(wedge_pairs, squares[, skipped_centers]) over canonical
    (src < dst) edges."""

    def _sym(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64)
        d = np_col(t, "dst").astype(np.int64)
        assert (len(s) == 0
                or max(s.max(), d.max()) < 2**32), "vids must fit 32 bits"
        return pa.table({"c": pa.array(np.r_[s, d], pa.int64()),
                         "n": pa.array(np.r_[d, s], pa.int64())})

    sym = edges.select_columns(["src", "dst"]).map_batches(
        _sym, batch_format="pyarrow")

    def _wedges(grp: pa.Table) -> pa.Table:
        c = np_col(grp, "c")
        n = np_col(grp, "n")
        order = np.lexsort((n, c))
        c, n = c[order], n[order]
        m = len(c)
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        ends = np.r_[starts[1:], m]
        if max_degree is not None:
            deg = ends - starts
            ok = deg <= max_degree
            keep = np.repeat(ok, deg)
            c, n = c[keep], n[keep]
            m = len(c)
            starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1] \
                if m else np.zeros(0, np.int64)
            ends = np.r_[starts[1:], m] if m else np.zeros(0, np.int64)
        seg_end = np.repeat(ends, ends - starts) if m else np.zeros(0, np.int64)
        idx = np.arange(m)
        cnt = seg_end - idx - 1          # partners after i in its segment
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table({"pk": pa.array([], pa.int64())})
        a_rep = np.repeat(idx, cnt)
        j = (np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
             + np.repeat(idx + 1, cnt))
        u = n[a_rep].astype(np.uint64)
        v = n[j].astype(np.uint64)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        pk = ((lo << np.uint64(32)) | hi).view(np.int64)
        return pa.table({"pk": pa.array(pk, pa.int64())})

    wedges = hash_bucket_agg(
        sym, lambda b: np_col(b, "c"), _wedges, num_buckets)

    def _fold(grp: pa.Table) -> pa.Table:
        pk = np.sort(np_col(grp, "pk"))
        starts = np.r_[0, np.flatnonzero(pk[1:] != pk[:-1]) + 1] \
            if len(pk) else np.zeros(0, np.int64)
        cnt = np.diff(np.r_[starts, len(pk)])
        wp = int((cnt * (cnt - 1) // 2).sum())
        return pa.table({"wp": pa.array([wp], pa.int64())})

    parts = hash_bucket_agg(
        wedges, lambda b: hash64(np_col(b, "pk")).view(np.int64),
        _fold, num_buckets).take_all()
    wp = sum(r["wp"] for r in parts)
    cols = {"wedge_pairs": pa.array([wp], pa.int64())}
    if max_degree is None:
        assert wp % 2 == 0, "two-diagonal symmetry violated"
        cols["squares"] = pa.array([wp // 2], pa.int64())
    else:
        # counted, never silent: one cheap grouped pass over the same
        # bucketing reports how many centers the cap excluded
        def _skips(grp: pa.Table) -> pa.Table:
            c = np.sort(np_col(grp, "c"))
            st = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1] \
                if len(c) else np.zeros(0, np.int64)
            deg = np.diff(np.r_[st, len(c)])
            return pa.table({"ns": pa.array(
                [int((deg > max_degree).sum())], pa.int64())})

        sk = hash_bucket_agg(sym, lambda b: np_col(b, "c"), _skips,
                             num_buckets).take_all()
        cols["skipped_centers"] = pa.array(
            [sum(r["ns"] for r in sk)], pa.int64())
    return pa.table(cols)
