"""Deterministic hashing + vectorized CSR kernels shared by the engine.

Everything here is pure NumPy / PyArrow, seed-free and
process-independent: the partitioning hash must produce identical
partitions in every worker of every process (resume, oracle runs and
the two-parallelism-level bench all depend on it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over int64/uint64 vertex ids.

    Deterministic across processes (unlike Python's salted ``hash``).
    """
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64, copy=True) + _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * _C1
        z = (z ^ (z >> np.uint64(27))) * _C2
        return z ^ (z >> np.uint64(31))


def part_of(vids: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition id = splitmix64(vid) mod P, as int32."""
    return (hash64(np.asarray(vids)) % np.uint64(num_parts)).astype(np.int32)


def csr_from_edges(
    src: np.ndarray, dst: np.ndarray, weight: np.ndarray | None = None
) -> dict:
    """Build a compressed-sparse-row shard from (src, dst[, weight]) arrays.

    Because a shard only holds edges whose ``hash(src) % P`` equals its
    partition id, the row index is compressed: ``srcs`` is the sorted
    array of distinct source vids present in the shard and ``indptr`` has
    ``len(srcs) + 1`` entries (NOT ``|V| + 1`` — at 10^12-file scale a
    dense per-shard indptr over the global vid space would not fit).

    Mirrors the role of the reference's ``csr_t`` device arrays
    (gunrock/essentials ``include/gunrock/formats/csr.hxx`` [U —
    reference snapshot absent, see SURVEY.md §0]).
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    srcs, counts = np.unique(src, return_counts=True)
    indptr = np.zeros(len(srcs) + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    # indices (the |E|-sized dst array, the shard's dominant payload)
    # compress to int32 when every dst fits — halves the scatter-side
    # gather bandwidth of every superstep, and the packed-message cast
    # to the int32 wire becomes a no-op.  At 10^12-file scale vids
    # exceed int32 and the shard stays int64 (same rule as _i32_dst).
    if len(dst) and int(dst.min()) >= 0 and int(dst.max()) < 2**31:
        dst = dst.astype(np.int32)
    shard = {"srcs": srcs, "indptr": indptr, "indices": dst}
    if weight is not None:
        shard["weights"] = np.asarray(weight, dtype=np.float64)[order]
    return shard


def csr_lookup(shard: dict, vids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (row_index_into_shard, found_mask) for the given vids."""
    srcs = shard["srcs"]
    idx = np.searchsorted(srcs, vids)
    idx_clipped = np.minimum(idx, len(srcs) - 1) if len(srcs) else np.zeros_like(idx)
    found = (len(srcs) > 0) & (idx < len(srcs))
    if len(srcs):
        found = found & (srcs[idx_clipped] == vids)
    return idx_clipped, found


def expand_neighbors(
    shard: dict, rows: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized frontier expansion: for shard-row indices ``rows`` return

    ``(rep, nbrs, eidx)`` where ``rep[i]`` is the position in ``rows`` that
    produced neighbor ``nbrs[i]`` and ``eidx[i]`` is the flat edge index
    (for weight lookup).  This is the engine's ``advance`` kernel
    (gunrock/essentials ``framework/operators/advance/*.hxx`` [U]) —
    no Python loop over vertices or edges.
    """
    indptr = shard["indptr"]
    starts = indptr[rows]
    counts = indptr[rows + 1] - starts
    total = int(counts.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    rep = np.repeat(np.arange(len(rows), dtype=np.int64), counts)
    # flat edge index: starts[rep] + (arange - cumstart[rep])
    cum = np.zeros(len(rows), dtype=np.int64)
    np.cumsum(counts[:-1], out=cum[1:])
    eidx = starts[rep] + (np.arange(total, dtype=np.int64) - cum[rep])
    return rep, shard["indices"][eidx], eidx


def segment_sum(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sum ``vals`` grouped by ``keys`` (unsorted). Returns (unique_keys,
    sums, counts). Deterministic: sorts by key, then ``np.add.reduceat``
    in sorted order, so float summation order is reproducible.
    """
    if len(keys) == 0:
        return (
            np.zeros(0, dtype=keys.dtype if keys.dtype != np.dtype(object) else np.int64),
            np.zeros(0, dtype=vals.dtype),
            np.zeros(0, dtype=np.int64),
        )
    order = np.argsort(keys, kind="stable")
    sk, sv = keys[order], vals[order]
    uniq, starts, counts = np.unique(sk, return_index=True, return_counts=True)
    sums = np.add.reduceat(sv, starts)
    return uniq, sums, counts


def segment_min(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Min of ``vals`` grouped by ``keys``. Returns (unique_keys, mins, counts)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=vals.dtype), np.zeros(0, dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    sk, sv = keys[order], vals[order]
    uniq, starts, counts = np.unique(sk, return_index=True, return_counts=True)
    mins = np.minimum.reduceat(sv, starts)
    return uniq, mins, counts


def segment_or(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bitwise OR of ``vals`` grouped by ``keys`` — the idempotent
    combine for bitmask frontiers (multi-source BFS).  Returns
    (unique_keys, ors, counts)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=vals.dtype), np.zeros(0, dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    sk, sv = keys[order], vals[order]
    uniq, starts, counts = np.unique(sk, return_index=True, return_counts=True)
    ors = np.bitwise_or.reduceat(sv, starts)
    return uniq, ors, counts


_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int64)


def popcount64(a: np.ndarray) -> np.ndarray:
    """Per-element set-bit count of an int64/uint64 array (NumPy 1.x
    has no bit_count ufunc — byte LUT over the raw view)."""
    if len(a) == 0:
        return np.zeros(0, np.int64)
    b = np.ascontiguousarray(a).view(np.uint8).reshape(len(a), 8)
    return _POP8[b].sum(axis=1)


def segment_max(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Max of ``vals`` grouped by ``keys``. Returns (unique_keys, maxs, counts)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=vals.dtype), np.zeros(0, dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    sk, sv = keys[order], vals[order]
    uniq, starts, counts = np.unique(sk, return_index=True, return_counts=True)
    maxs = np.maximum.reduceat(sv, starts)
    return uniq, maxs, counts


def grouped_pair_expand(
    group_key: np.ndarray, values: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All ordered pairs (a, b), a before b in value order, within each
    group — fully vectorized (no Python loop over groups).

    Returns (a, b, group_row) where ``group_row`` indexes the first row
    of the pair's group in the (group, value)-sorted order (useful to
    recover per-group side data).  A group of size c emits c·(c-1)/2
    pairs; callers cap group sizes upstream (heavy-key guard) — this is
    the k² expansion primitive under shared-key edge derivation,
    co-purchase edges and TC wedges.
    """
    order = np.lexsort((values, group_key))
    g, v = group_key[order], values[order]
    uniq, starts, counts = np.unique(g, return_index=True, return_counts=True)
    npairs = (counts * (counts - 1)) // 2
    total = int(npairs.sum())
    z = np.zeros(0, dtype=values.dtype)
    if total == 0:
        return z, z, np.zeros(0, np.int64)
    grp_rep = np.repeat(np.arange(len(uniq)), npairs)
    off = np.zeros(len(uniq), np.int64)
    np.cumsum(npairs[:-1], out=off[1:])
    t = np.arange(total, dtype=np.int64) - off[grp_rep]
    c = counts[grp_rep]
    # triangular-number inversion: flat pair index t -> (i, j), i < j
    i = (
        c - 2
        - np.floor(np.sqrt(-8.0 * t + 4.0 * c * (c - 1) - 7.0) / 2.0 - 0.5)
    ).astype(np.int64)
    j = t + i + 1 - (c * (c - 1)) // 2 + ((c - i) * ((c - i) - 1)) // 2
    base = starts[grp_rep]
    return v[base + i], v[base + j], base


def np_col(tbl: pa.Table, name: str) -> np.ndarray:
    """Column → numpy, zero-copy when the type allows and no nulls."""
    col = tbl.column(name)
    try:
        return col.combine_chunks().to_numpy(zero_copy_only=True)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return col.to_numpy(zero_copy_only=False)
