"""Grid-partitioned DBSCAN over integer 2-D points.

Density clustering as a composition of the repo's verified pieces
(Ester et al., KDD 1996, distributed via the standard grid-join
blocking): with cell side == eps every eps-neighbor of a point lives
in its 3×3 cell neighborhood, so ONE replicate-into-9-cells pass plus
ONE cell-hash bucketed exchange lands every point's complete
neighborhood in its home-cell bucket — neighbor counts (hence core
flags) are exact in-bucket, no all-pairs anywhere, and the per-bucket
kernel is the fully vectorized repeat/offset cross-product (no Python
loop over points or cells).  Core-core edges then feed the SAME
hash-min CC superstep engine the link graph uses, border points take
the MIN adjacent core cluster (the deterministic variant of DBSCAN's
order-dependent border assignment — a distributed oracle-checked
engine cannot ship "first scanner wins"), and everything else is
noise.

Integer coordinates make every comparison exact: callers quantize
floats once (``floor(x·Q)``) and the SQL twin reproduces the whole
path — brute-force pair predicate, core counts, unrolled min-label
CC, min-border fold — verbatim.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .ops import hash_bucket_agg, join
from .util import np_col

_OFF = np.int64(2) ** 30
_MUL = np.int64(2) ** 31


def grid_neighbor_pairs(
    points: rd.Dataset,
    eps: int,
    id_col: str = "vec_id",
    x_col: str = "px",
    y_col: str = "py",
    num_buckets: int = 64,
) -> rd.Dataset:
    """All ordered eps-neighbor pairs plus one sentinel row per point.

    Output rows: ``(src, dst, src_core_n)`` where ``dst >= 0`` rows are
    the ordered pairs (both directions present, src ≠ dst, squared
    Euclidean distance ≤ eps²) and ``dst == -1`` sentinel rows carry
    every point exactly once — including isolated points — with
    ``src_core_n`` = its exact eps-neighbor count (excluding self).
    Pair rows repeat the OWNER's count so downstream stages can filter
    on coreness without a join.

    Blocking is lossless: cell side == eps ⇒ any pair at distance
    ≤ eps differs by ≤ 1 cell per axis, so the 3×3 replication covers
    every true pair exactly once per direction (the owner's home cell
    is unique)."""
    eps = int(eps)
    eps2 = np.int64(eps) * np.int64(eps)

    def _replicate(batch: pa.Table) -> pa.Table:
        ids = np_col(batch, id_col).astype(np.int64)
        px = np_col(batch, x_col).astype(np.int64)
        py = np_col(batch, y_col).astype(np.int64)
        cx = px // eps
        cy = py // eps
        assert np.abs(cx).max(initial=0) < _OFF - 1, "cell coord overflow"
        assert np.abs(cy).max(initial=0) < _OFF - 1, "cell coord overflow"
        n = len(ids)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                key = (cx + dx + _OFF) * _MUL + (cy + dy + _OFF)
                outs.append(pa.table({
                    "__cell__": pa.array(key, pa.int64()),
                    id_col: pa.array(ids, pa.int64()),
                    x_col: pa.array(px, pa.int64()),
                    y_col: pa.array(py, pa.int64()),
                    "__home__": pa.array(
                        np.full(n, dx == 0 and dy == 0), pa.bool_()),
                }))
        return pa.concat_tables(outs)

    def _pairs(grp: pa.Table) -> pa.Table:
        empty = pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "src_core_n": pa.array([], pa.int64()),
        })
        if grp.num_rows == 0:
            return empty
        cell = np_col(grp, "__cell__")
        ids = np_col(grp, id_col)
        px = np_col(grp, x_col)
        py = np_col(grp, y_col)
        home = np_col(grp, "__home__")
        order = np.argsort(cell, kind="stable")
        cell, ids, px, py, home = (a[order] for a in (cell, ids, px, py, home))
        new_cell = np.r_[True, cell[1:] != cell[:-1]]
        seg_of = np.cumsum(new_cell) - 1
        seg_start = np.flatnonzero(new_cell).astype(np.int64)
        seg_len = np.diff(np.r_[seg_start, len(cell)]).astype(np.int64)
        owners = np.flatnonzero(home)
        if len(owners) == 0:
            return empty
        c_per = seg_len[seg_of[owners]]
        starts = seg_start[seg_of[owners]]
        off = np.r_[np.int64(0), np.cumsum(c_per)]
        total = int(off[-1])
        o_rep = np.repeat(owners, c_per)
        within = np.arange(total, dtype=np.int64) - np.repeat(off[:-1], c_per)
        c_idx = np.repeat(starts, c_per) + within
        dx = px[o_rep] - px[c_idx]
        dy = py[o_rep] - py[c_idx]
        keep = (dx * dx + dy * dy <= eps2) & (ids[o_rep] != ids[c_idx])
        cs = np.r_[np.int64(0), np.cumsum(keep)]
        n_nbrs = cs[off[1:]] - cs[off[:-1]]
        return pa.table({
            "src": pa.array(
                np.r_[ids[o_rep][keep], ids[owners]], pa.int64()),
            "dst": pa.array(
                np.r_[ids[c_idx][keep], np.full(len(owners), -1, np.int64)],
                pa.int64()),
            "src_core_n": pa.array(
                np.r_[np.repeat(n_nbrs, c_per)[keep], n_nbrs], pa.int64()),
        })

    replicated = points.map_batches(_replicate, batch_format="pyarrow")
    return hash_bucket_agg(
        replicated,
        lambda b: np_col(b, "__cell__"),
        _pairs,
        num_buckets=num_buckets,
    )


def grid_dbscan(
    points: rd.Dataset,
    work_dir: str,
    eps: int,
    min_pts: int,
    id_col: str = "vec_id",
    num_parts: int = 8,
    num_buckets: int = 64,
) -> tuple[rd.Dataset, int]:
    """DBSCAN labels: ``(id, label, role)`` for EVERY input point —
    role 2 = core (label = min core id of its density-connected
    component, from the hash-min CC engine; an isolated core is its
    own singleton cluster), role 1 = border (label = MIN adjacent core
    cluster — deterministic), role 0 = noise (label = -1).  A point is
    core iff its eps-ball including itself holds ≥ min_pts points.

    Returns (labels dataset, CC superstep count) so callers can assert
    convergence under an unrolled oracle's round bound.  Every stage is
    a bucketed exchange or partitioned join; nothing materializes the
    point set driver-side."""
    from .algorithms import connected_components
    from .algorithms.cc import components_table
    from .graph import build_graph

    stamped = grid_neighbor_pairs(
        points, eps, id_col=id_col, num_buckets=num_buckets
    ).materialize()
    thr = np.int64(min_pts - 1)  # neighbor count excluding self

    def _pair_rows(t: pa.Table) -> pa.Table:
        keep = np_col(t, "dst") >= 0
        return t.filter(pa.array(keep))

    def _point_rows(t: pa.Table) -> pa.Table:
        m = np_col(t, "dst") == -1
        return pa.table({
            id_col: t.column("src").filter(pa.array(m)),
            "is_core": pa.array(np_col(t, "src_core_n")[m] >= thr,
                                pa.bool_()),
        })

    pairs = stamped.map_batches(_pair_rows, batch_format="pyarrow")
    pclass = stamped.map_batches(_point_rows, batch_format="pyarrow")

    # core-core edges WITHOUT a join: each unordered pair appears once
    # per direction, each stamped with its owner's count — group by the
    # canonical pair and keep it iff BOTH stamps are core
    def _canon(t: pa.Table) -> pa.Table:
        s, d = np_col(t, "src"), np_col(t, "dst")
        return pa.table({
            "a": pa.array(np.minimum(s, d), pa.int64()),
            "b": pa.array(np.maximum(s, d), pa.int64()),
            "core": pa.array(np_col(t, "src_core_n") >= thr, pa.bool_()),
        })

    def _both_core(grp: pa.Table) -> pa.Table:
        a, b = np_col(grp, "a"), np_col(grp, "b")
        core = np_col(grp, "core")
        order = np.lexsort((b, a))
        a, b, core = a[order], b[order], core[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(new)
        cs = np.r_[np.int64(0), np.cumsum(core.astype(np.int64))]
        ends = np.r_[starts[1:], len(a)]
        ok = (cs[ends] - cs[starts]) == (ends - starts)
        return pa.table({
            "src": pa.array(a[starts][ok], pa.int64()),
            "dst": pa.array(b[starts][ok], pa.int64()),
        })

    edges = hash_bucket_agg(
        pairs.map_batches(_canon, batch_format="pyarrow"),
        lambda t: np_col(t, "a") * np.int64(1_000_003) + np_col(t, "b"),
        _both_core,
        num_buckets=num_buckets,
    ).materialize()

    supersteps = 0
    if edges.count() > 0:
        g = build_graph(edges, work_dir, num_parts, symmetrize=True,
                        persist=False)
        res = connected_components(g, checkpoint_every=0)
        assert res.converged
        t = components_table(res)
        labels = rd.from_arrow(pa.table({
            id_col: t["vid"], "label": t["label"],
        }))
        supersteps = res.supersteps
    else:
        labels = rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
        }))

    def _mask(col_true: bool):
        def _f(t: pa.Table) -> pa.Table:
            m = np_col(t, "is_core")
            return t.filter(pa.array(m if col_true else ~m))
        return _f

    cores = pclass.map_batches(_mask(True), batch_format="pyarrow")
    noncores = pclass.map_batches(_mask(False), batch_format="pyarrow")

    # isolated cores (no core-core edge) are their own singleton cluster
    iso = join(cores, labels, on=id_col, how="anti",
               num_buckets=num_buckets)

    def _self_label(t: pa.Table) -> pa.Table:
        ids = np_col(t, id_col)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "label": pa.array(ids, pa.int64())})

    core_full = labels.union(
        iso.map_batches(_self_label, batch_format="pyarrow")
    ).materialize()

    def _stamp_role(role: int):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: t.column(id_col).cast(pa.int64()),
                "label": t.column("label").cast(pa.int64()),
                "role": pa.array(
                    np.full(t.num_rows, role, np.int64), pa.int64()),
            })
        return _f

    # border: non-core src with ≥1 core neighbor takes the MIN adjacent
    # core cluster — pairs already carry the owner's coreness, the core
    # side's label arrives by ONE partitioned join on dst
    def _noncore_pairs(t: pa.Table) -> pa.Table:
        m = (np_col(t, "src_core_n") < thr) & (np_col(t, "dst") >= 0)
        return pa.table({
            "src": t.column("src").filter(pa.array(m)),
            "dst": t.column("dst").filter(pa.array(m)),
        })

    def _as_dst(t: pa.Table) -> pa.Table:
        return pa.table({"dst": t.column(id_col).cast(pa.int64()),
                         "label": t.column("label").cast(pa.int64())})

    def _min_label(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        s = np_col(grp, "src")
        lb = np_col(grp, "label")
        order = np.lexsort((lb, s))
        s, lb = s[order], lb[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        return pa.table({
            id_col: pa.array(s[starts], pa.int64()),
            "label": pa.array(lb[starts], pa.int64()),
        })

    def _empty_lab() -> rd.Dataset:
        # zero-row materialized pipelines lose their schema; joins and
        # unions downstream need an explicit one
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
        }))

    if core_full.count() == 0:
        core_full = _empty_lab()
        border = _empty_lab()
    else:
        ncp = stamped.map_batches(_noncore_pairs, batch_format="pyarrow")
        with_lab = join(
            ncp, core_full.map_batches(_as_dst, batch_format="pyarrow"),
            on="dst", how="inner", broadcast=False,
            num_buckets=num_buckets,
        )
        border = hash_bucket_agg(
            with_lab, lambda t: np_col(t, "src"), _min_label,
            num_buckets=num_buckets,
        ).materialize()
        if border.count() == 0:
            border = _empty_lab()

    noise = join(
        noncores.select_columns([id_col]), border, on=id_col, how="anti",
        num_buckets=num_buckets,
    )

    def _noise_label(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            "label": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
        })

    out = (
        core_full.map_batches(_stamp_role(2), batch_format="pyarrow")
        .union(border.map_batches(_stamp_role(1), batch_format="pyarrow"))
        .union(noise.map_batches(_noise_label, batch_format="pyarrow")
               .map_batches(_stamp_role(0), batch_format="pyarrow"))
    )
    return out, supersteps
