"""Vector-payload neighbor aggregation (GNN feature preparation).

``neighbor_feature_sum`` is SpMV with a VECTOR payload: per vertex the
exact sum of its neighbors' integer-quantized feature vectors — the
one-hop aggregation step every GraphSAGE/GCN-style pipeline runs
before training, and the shape that distinguishes it from the scalar
SpMV the superstep engine already ships.

Scale shape: features reach the edges by ONE partitioned hash join on
the feature key (the feature table is a big side — never broadcast),
then each block PRE-COMBINES its (dst, vec) rows with a lexsort +
per-dim reduceat before the single dst-bucketed exchange — the same
partial-combine discipline as the PageRank message path, so what
moves is one partial vector per (block, dst), not one per edge.
Integer quantization (floor(x·scale)) makes every sum exact and the
result bit-identical at any layout — and SQL-reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .ops import hash_bucket_agg, join
from .util import np_col


def _list_matrix(col: pa.ChunkedArray | pa.Array, n: int) -> np.ndarray:
    """Fixed-width list<int64> column → (n, d) int64 matrix, zero-copy
    when the layout allows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    return flat.reshape(n, -1)


def neighbor_feature_sum(
    edges: rd.Dataset,
    features: rd.Dataset,
    feat_mod: int,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-vertex exact sum of neighbor feature vectors:
    ``out[v] = Σ_{(u,v) ∈ E_sym} q(feature[u mod feat_mod])`` with
    ``q = floor(x·scale)`` int64 per dimension.  ``edges`` holds
    canonical undirected (src, dst) rows — both directions are derived
    here so every endpoint aggregates its full neighborhood.  Returns
    (vid, feat list<int64>) rows.

    The ``mod`` mapping is the deterministic vertex→feature-row
    binding for a feature table smaller than the vertex universe
    (synthetic-benchmark convention); production would join on the
    natural key — the dataflow is identical."""

    def _both_dirs(t: pa.Table) -> pa.Table:
        s = np_col(t, "src")
        d = np_col(t, "dst")
        return pa.table({
            "fid": pa.array(np.r_[s, d] % np.int64(feat_mod), pa.int64()),
            "vid": pa.array(np.r_[d, s], pa.int64()),
        })

    def _quant(t: pa.Table) -> pa.Table:
        col = t.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        q = np.floor(flat * float(scale)).astype(np.int64)
        m = q.reshape(t.num_rows, -1)
        return pa.table({
            "fid": t.column(id_col).cast(pa.int64()),
            "feat": pa.array(list(m), pa.list_(pa.int64())),
        })

    e2 = edges.select_columns(["src", "dst"]).map_batches(
        _both_dirs, batch_format="pyarrow")
    f = features.map_batches(_quant, batch_format="pyarrow")
    joined = join(e2, f, on="fid", how="inner", broadcast=False,
                  num_buckets=num_buckets)

    # per-block pre-combine (one partial per (block, dst))...
    partial = joined.select_columns(["vid", "feat"]).map_batches(
        _combine_vid_feat, batch_format="pyarrow")
    # ...then ONE dst-bucketed exchange merges the partials
    return hash_bucket_agg(
        partial, lambda t: np_col(t, "vid"), _combine_vid_feat,
        num_buckets=num_buckets,
    )


def _combine_vid_feat(t: pa.Table) -> pa.Table:
    """Sum (vid, feat list<int64>) rows per vid — lexsort + per-dim
    reduceat; the vector-payload partial-combine kernel."""
    if t.num_rows == 0:
        return pa.table({
            "vid": pa.array([], pa.int64()),
            "feat": pa.array([], pa.list_(pa.int64())),
        })
    vid = np_col(t, "vid")
    m = _list_matrix(t.column("feat"), t.num_rows)
    order = np.argsort(vid, kind="stable")
    vid, m = vid[order], m[order]
    starts = np.flatnonzero(np.r_[True, vid[1:] != vid[:-1]])
    sums = np.add.reduceat(m, starts, axis=0)
    return pa.table({
        "vid": pa.array(vid[starts], pa.int64()),
        "feat": pa.array(list(sums), pa.list_(pa.int64())),
    })


def neighbor_vec_sum(
    edges: rd.Dataset,
    vecs: rd.Dataset,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Aggregate an EXISTING per-vertex integer vector table over the
    neighborhood: ``out[v] = Σ_{(u,v) ∈ E_sym} vecs[u]`` with ``vecs``
    rows (vid, feat list<int64>) keyed by exact vertex id — the
    layer-2+ step of a GCN stack (layer 1 binds raw features via
    ``neighbor_feature_sum``; every later layer is this function, so
    a k-layer message-passing stack is k chained calls).  Same scale
    shape: one partitioned join to ship vectors to edges, per-block
    pre-combine, ONE dst-bucketed exchange."""

    def _both_dirs(t: pa.Table) -> pa.Table:
        s = np_col(t, "src")
        d = np_col(t, "dst")
        return pa.table({
            "fid": pa.array(np.r_[s, d], pa.int64()),
            "vid": pa.array(np.r_[d, s], pa.int64()),
        })

    def _as_fid(t: pa.Table) -> pa.Table:
        return pa.table({"fid": t.column("vid").cast(pa.int64()),
                         "feat": t.column("feat")})

    e2 = edges.select_columns(["src", "dst"]).map_batches(
        _both_dirs, batch_format="pyarrow")
    f = vecs.map_batches(_as_fid, batch_format="pyarrow")
    joined = join(e2, f, on="fid", how="inner", broadcast=False,
                  num_buckets=num_buckets)
    partial = joined.select_columns(["vid", "feat"]).map_batches(
        _combine_vid_feat, batch_format="pyarrow")
    return hash_bucket_agg(
        partial, lambda t: np_col(t, "vid"), _combine_vid_feat,
        num_buckets=num_buckets,
    )
