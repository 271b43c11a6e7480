"""Deterministic graph sampling — the GNN-training-data operators.

Two samplers over the engine's CSR shards (GraphShards), both pure
functions of (vertex ids, seed) so results are identical across runs,
block layouts and cluster sizes, and both reproducible by a DuckDB
oracle through the SplitMix64 SQL chain (``__ray_entry__._sm64_ctes``):

- ``sample_neighbors``: GraphSAGE-style fanout sampling — for every
  vertex keep the ``k`` out-neighbors with the smallest
  ``splitmix64(src·2³² + dst + seed·golden)`` (tie-break dst).  One
  vectorized task per CSR shard, no shuffle at all: the shard already
  holds each vertex's full neighbor list.
- ``random_walks``: one ``steps``-step walk per vertex (DeepWalk /
  node2vec p=q=1 sampling): at step t the walk at v moves to the
  ``(h mod deg(v))``-th neighbor in dst-sorted order, with
  ``h = splitmix64(wid·2³² + v·2654435761 + t + seed·golden)`` — the
  hash mixes the walk id so concurrent walks at the same vertex
  diverge.  Walks at out-degree-0 vertices emit −1 and stay dead.
  Execution is the engine's standard per-part exchange: per step, one
  task per partition advances all walks currently at that partition's
  vertices and splits its output by the next position's partition —
  the same object-store task exchange as the no-checkpoint graph build
  (``graph._split_block``), no parquet or driver round-trip.

Both rely on the CSR invariant that ``indices`` are dst-sorted within
each source row (``util.csr_from_edges`` lexsorts by (src, dst)), which
is what makes "the r-th neighbor" SQL-expressible via ROW_NUMBER.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .graph import GraphShards
from .util import csr_lookup, hash64, np_col, part_of

_GOLDEN = 0x9E3779B97F4A7C15
_CUR_MUL = np.uint64(2654435761)
_WID_MUL = np.uint64(1 << 32)


def _seed_mix(seed: int) -> np.uint64:
    return np.uint64((seed * _GOLDEN) & (2**63 - 1))


def _sample_shard(k: int, mix: np.uint64, shard: dict) -> pa.Table:
    srcs = shard["srcs"]
    indptr = shard["indptr"]
    dst = shard["indices"]
    if len(dst) == 0:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    assert srcs[-1] < 2**32 and dst.max() < 2**32, (
        "sample_neighbors packs (src, dst) into 64 bits: vertex ids "
        "must be < 2^32"
    )
    counts = np.diff(indptr)
    rep = np.repeat(np.arange(len(srcs), dtype=np.int64), counts)
    src_e = srcs[rep]
    with np.errstate(over="ignore"):
        key = src_e.astype(np.uint64) * _WID_MUL + dst.astype(np.uint64) + mix
    h = hash64(key)
    order = np.lexsort((dst, h, rep))
    rank = np.arange(len(dst), dtype=np.int64) - np.repeat(indptr[:-1], counts)
    keep = order[rank < k]
    return pa.table(
        {
            "src": pa.array(src_e[keep], pa.int64()),
            "dst": pa.array(dst[keep], pa.int64()),
        }
    )


def sample_neighbors(g: GraphShards, k: int, seed: int = 42) -> rd.Dataset:
    """Per-vertex deterministic fanout sample: ≤ ``k`` out-edges per
    vertex, chosen by smallest splitmix64 hash (then dst).  Isolated
    vertices emit nothing.  Result: Dataset[src, dst]."""
    task = ray.remote(_sample_shard)
    mix = _seed_mix(seed)
    refs = [task.remote(k, mix, ref) for ref in g.shard_refs]
    return rd.from_arrow_refs(refs)


def _walk_step(
    t: int, mix: np.uint64, num_parts: int, shard: dict, *tabs
) -> tuple:
    """Advance every walk currently in this partition by one step.

    Returns ``(full, split_0, ..., split_{P-1})``: the (wid, step,
    node) rows for the result stream plus the new positions split by
    the next vertex's partition."""
    tabs = [x for x in tabs if x.num_rows]
    empty_pos = pa.table({"wid": pa.array([], pa.int64()),
                          "cur": pa.array([], pa.int64())})
    if not tabs:
        full = pa.table({"wid": pa.array([], pa.int64()),
                         "step": pa.array([], pa.int64()),
                         "node": pa.array([], pa.int64())})
        return (full, *([empty_pos] * num_parts))
    tbl = pa.concat_tables(tabs)
    wid = np.asarray(tbl["wid"], dtype=np.int64)
    cur = np.asarray(tbl["cur"], dtype=np.int64)
    nxt = np.full(len(cur), -1, np.int64)
    alive = cur >= 0
    if alive.any():
        rows, found = csr_lookup(shard, cur[alive])
        indptr = shard["indptr"]
        deg = np.where(found, indptr[rows + 1] - indptr[rows], 0)
        with np.errstate(over="ignore"):
            key = (
                wid[alive].astype(np.uint64) * _WID_MUL
                + cur[alive].astype(np.uint64) * _CUR_MUL
                + np.uint64(t)
                + mix
            )
        h = hash64(key)
        ok = deg > 0
        pick = np.zeros(len(h), np.int64)
        pick[ok] = (h[ok] % deg[ok].astype(np.uint64)).astype(np.int64)
        stepped = np.full(len(h), -1, np.int64)
        stepped[ok] = shard["indices"][indptr[rows[ok]] + pick[ok]]
        nxt[alive] = stepped
    full = pa.table(
        {
            "wid": pa.array(wid, pa.int64()),
            "step": pa.array(np.full(len(wid), t, np.int64), pa.int64()),
            "node": pa.array(nxt, pa.int64()),
        }
    )
    # split the new positions by next partition (dead walks -> part 0)
    part = np.where(nxt >= 0, part_of(nxt, num_parts), 0)
    order = np.argsort(part, kind="stable")
    sp = part[order]
    pos = pa.table({"wid": pa.array(wid[order], pa.int64()),
                    "cur": pa.array(nxt[order], pa.int64())})
    bounds = np.searchsorted(sp, np.arange(num_parts + 1))
    splits = [
        pos.slice(bounds[p], bounds[p + 1] - bounds[p]).combine_chunks()
        for p in range(num_parts)
    ]
    return (full, *splits)


def _n2v_step(
    t: int,
    mix: np.uint64,
    num_parts: int,
    w_back: float,
    w_out: float,
    shard: dict,
    edge_keys: np.ndarray,
    *tabs,
) -> tuple:
    """Advance every node2vec walk in this partition by one biased step.

    Candidate weights per neighbor c of cur (prev = the walk's last
    node): 1/p when c == prev, 1 when (prev, c) is an edge, 1/q
    otherwise; first step (prev < 0) is uniform.  The pick is the
    inverse-CDF index: smallest candidate rank (dst order) whose
    cumulative weight exceeds ``(h/2⁶⁴)·total`` — cumulative sums run
    in dst order on exact dyadic weights, so the DuckDB oracle's
    window-sum reproduces every double bit-for-bit.  Membership of
    (prev, c) probes the shared sorted packed edge-key plasma object
    (TC's ``_packed_edge_keys`` — built once, mapped zero-copy)."""
    tabs = [x for x in tabs if x.num_rows]
    empty_pos = pa.table({"wid": pa.array([], pa.int64()),
                          "cur": pa.array([], pa.int64()),
                          "prev": pa.array([], pa.int64())})
    if not tabs:
        full = pa.table({"wid": pa.array([], pa.int64()),
                         "step": pa.array([], pa.int64()),
                         "node": pa.array([], pa.int64())})
        return (full, *([empty_pos] * num_parts))
    tbl = pa.concat_tables(tabs)
    wid = np.asarray(tbl["wid"], dtype=np.int64)
    cur = np.asarray(tbl["cur"], dtype=np.int64)
    prev = np.asarray(tbl["prev"], dtype=np.int64)
    nxt = np.full(len(cur), -1, np.int64)
    alive = cur >= 0
    if alive.any():
        a_idx = np.flatnonzero(alive)
        rows, found = csr_lookup(shard, cur[a_idx])
        ok = np.flatnonzero(found)
        if len(ok):
            a_idx, rows = a_idx[ok], rows[ok]
            indptr = shard["indptr"]
            deg = indptr[rows + 1] - indptr[rows]
            has = deg > 0
            a_idx, rows, deg = a_idx[has], rows[has], deg[has]
        else:
            deg = np.zeros(0, np.int64)
        if len(a_idx):
            rep = np.repeat(np.arange(len(a_idx), dtype=np.int64), deg)
            eidx = np.repeat(indptr[rows], deg) + (
                np.arange(int(deg.sum()), dtype=np.int64)
                - np.repeat(np.concatenate([[0], np.cumsum(deg)[:-1]]), deg)
            )
            cand = shard["indices"][eidx]
            pr = prev[a_idx]
            with np.errstate(over="ignore"):
                pk = pr[rep].astype(np.uint64) * _WID_MUL \
                    + cand.astype(np.uint64)
            pos = np.searchsorted(edge_keys, pk)
            member = (pos < len(edge_keys)) & (
                edge_keys[np.minimum(pos, len(edge_keys) - 1)] == pk
            )
            wt = np.where(
                pr[rep] < 0, 1.0,
                np.where(cand == pr[rep], w_back,
                         np.where(member, 1.0, w_out)),
            )
            cum = np.cumsum(wt)
            starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
            base = np.where(starts > 0, cum[starts - 1], 0.0)
            total = cum[np.cumsum(deg) - 1] - base
            with np.errstate(over="ignore"):
                key = (
                    wid[a_idx].astype(np.uint64) * _WID_MUL
                    + cur[a_idx].astype(np.uint64) * _CUR_MUL
                    + np.uint64(t)
                    + mix
                )
            r = hash64(key).astype(np.float64) / float(2**64)
            thr = r * total
            qual = (cum - base[rep]) > thr[rep]
            n_true = np.add.reduceat(qual.astype(np.int64), starts)
            pick = np.minimum(deg - n_true, deg - 1)
            nxt[a_idx] = shard["indices"][indptr[rows] + pick]
    full = pa.table(
        {
            "wid": pa.array(wid, pa.int64()),
            "step": pa.array(np.full(len(wid), t, np.int64), pa.int64()),
            "node": pa.array(nxt, pa.int64()),
        }
    )
    part = np.where(nxt >= 0, part_of(nxt, num_parts), 0)
    order = np.argsort(part, kind="stable")
    sp = part[order]
    pos_t = pa.table({"wid": pa.array(wid[order], pa.int64()),
                      "cur": pa.array(nxt[order], pa.int64()),
                      "prev": pa.array(cur[order], pa.int64())})
    bounds = np.searchsorted(sp, np.arange(num_parts + 1))
    splits = [
        pos_t.slice(bounds[p], bounds[p + 1] - bounds[p]).combine_chunks()
        for p in range(num_parts)
    ]
    return (full, *splits)


def node2vec_walks(
    g: GraphShards,
    steps: int,
    p: float = 2.0,
    q: float = 0.5,
    seed: int = 42,
) -> rd.Dataset:
    """One deterministic node2vec-biased walk per vertex (Grover &
    Leskovec 2016 second-order sampling: return weight 1/p, in-neighbor
    weight 1, outward weight 1/q; first hop uniform).  Result:
    Dataset[wid, step, node], −1 once dead.  Same per-step object-store
    task exchange as :func:`random_walks`; the extra state is the
    walk's prev node plus ONE shared sorted packed edge-key object for
    the (prev, candidate) membership probe — at extreme scale replace
    that single object with a bucketed probe exchange (documented
    trade, same as TC's).  Pick weights 1/p, 1/q should be exact
    binary fractions so the SQL oracle's window sums match bit-for-bit
    (the defaults are)."""
    from .algorithms.tc import _packed_edge_keys

    task = ray.remote(_n2v_step)
    mix = _seed_mix(seed)
    P = g.num_parts
    vids = ray.get(g.vertex_ids_ref)
    assert len(vids) == 0 or vids[-1] < 2**32, (
        "node2vec_walks packs (wid|prev, node) hash keys: ids < 2^32"
    )
    keys_ref = _packed_edge_keys.remote(*g.shard_refs)
    part = part_of(vids, P)
    order = np.argsort(part, kind="stable")
    sv, sp = vids[order], part[order]
    bounds = np.searchsorted(sp, np.arange(P + 1))
    positions = [
        [
            ray.put(
                pa.table(
                    {
                        "wid": pa.array(sv[bounds[pp]: bounds[pp + 1]], pa.int64()),
                        "cur": pa.array(sv[bounds[pp]: bounds[pp + 1]], pa.int64()),
                        "prev": pa.array(
                            np.full(bounds[pp + 1] - bounds[pp], -1, np.int64),
                            pa.int64()),
                    }
                )
            )
        ]
        for pp in range(P)
    ]
    w_back, w_out = 1.0 / p, 1.0 / q
    step_outputs = []
    for t in range(1, steps + 1):
        outs = [
            task.options(num_returns=1 + P).remote(
                t, mix, P, w_back, w_out, g.shard_refs[pp], keys_ref,
                *positions[pp]
            )
            for pp in range(P)
        ]
        step_outputs.extend(o[0] for o in outs)
        positions = [[outs[qq][1 + pp] for qq in range(P)] for pp in range(P)]
    return rd.from_arrow_refs(step_outputs)


def random_walks(g: GraphShards, steps: int, seed: int = 42) -> rd.Dataset:
    """One deterministic ``steps``-step walk per vertex.  Result:
    Dataset[wid, step, node] with ``steps`` rows per walk (node = −1
    once the walk hits an out-degree-0 vertex).  Vertex ids must be
    < 2^32 (packed hash keys); asserted in the shard tasks via
    ``_sample_shard``'s invariant — here walk ids are vertex ids, so
    the same bound applies."""
    task = ray.remote(_walk_step)
    mix = _seed_mix(seed)
    P = g.num_parts
    vids = ray.get(g.vertex_ids_ref)
    assert len(vids) == 0 or vids[-1] < 2**32, (
        "random_walks packs (wid, cur) hash keys: vertex ids must be < 2^32"
    )
    # initial positions, split by partition
    part = part_of(vids, P)
    order = np.argsort(part, kind="stable")
    sv, sp = vids[order], part[order]
    bounds = np.searchsorted(sp, np.arange(P + 1))
    positions = [
        [
            ray.put(
                pa.table(
                    {
                        "wid": pa.array(sv[bounds[p]: bounds[p + 1]], pa.int64()),
                        "cur": pa.array(sv[bounds[p]: bounds[p + 1]], pa.int64()),
                    }
                )
            )
        ]
        for p in range(P)
    ]
    step_outputs = []
    for t in range(1, steps + 1):
        outs = [
            task.options(num_returns=1 + P).remote(
                t, mix, P, g.shard_refs[p], *positions[p]
            )
            for p in range(P)
        ]
        step_outputs.extend(o[0] for o in outs)
        positions = [[outs[q][1 + p] for q in range(P)] for p in range(P)]
    return rd.from_arrow_refs(step_outputs)


def _neg_shard(
    k: int, tries: int, mix: np.uint64, universe: np.ndarray,
    edge_keys: np.ndarray, shard: dict,
) -> pa.Table:
    """Negative proposals for one shard's vertices, vectorized per try:
    candidate i for vertex u is ``universe[splitmix64(u·C + i + mix)
    mod |V|]``; rejected if self or an actual (symmetrized) edge; each
    vertex keeps its first k accepted proposals in try order."""
    srcs = shard["srcs"].astype(np.int64)
    if not len(srcs):
        return pa.table({"src": pa.array([], pa.int64()),
                         "neg": pa.array([], pa.int64()),
                         "try_i": pa.array([], pa.int64())})
    n_u = np.uint64(len(universe))
    taken = np.zeros(len(srcs), np.int64)
    out_s, out_c, out_i = [], [], []
    u64 = srcs.astype(np.uint64)
    for i in range(tries):
        with np.errstate(over="ignore"):
            z = hash64(u64 * np.uint64(_GOLDEN & (2**63 - 1))
                       + np.uint64(i) + mix)
        cand = universe[(z % n_u).astype(np.int64)]
        pk = (u64 << np.uint64(32)) | cand.astype(np.uint64)
        pos = np.searchsorted(edge_keys, pk)
        member = (pos < len(edge_keys)) & (
            edge_keys[np.minimum(pos, max(len(edge_keys) - 1, 0))] == pk
        ) if len(edge_keys) else np.zeros(len(pk), bool)
        ok = (cand != srcs) & ~member & (taken < k)
        taken += ok
        sel = np.flatnonzero(ok)
        out_s.append(srcs[sel])
        out_c.append(cand[sel])
        out_i.append(np.full(len(sel), i, np.int64))
    s = np.concatenate(out_s)
    c = np.concatenate(out_c)
    ii = np.concatenate(out_i)
    order = np.lexsort((ii, s))
    return pa.table({"src": pa.array(s[order], pa.int64()),
                     "neg": pa.array(c[order], pa.int64()),
                     "try_i": pa.array(ii[order], pa.int64())})


def negative_samples(
    g: GraphShards, k: int, tries: int | None = None, seed: int = 42
) -> rd.Dataset:
    """Deterministic NEGATIVE sampling for link-prediction / GNN
    training: per (non-isolated) vertex, up to ``k`` vertices it is
    NOT adjacent to, chosen as the first accepted of ``tries`` hash
    proposals over the sorted vertex universe — a pure function of
    (graph, seed), identical at any cluster size, and reproducible by
    a SQL twin (proposal index + ROW_NUMBER).  One vectorized task per
    CSR shard; the adjacency test probes TC's shared sorted packed
    edge-key plasma object (symmetrized, so one direction suffices).
    Vertices whose k negatives aren't found within ``tries`` (dense
    neighborhoods) return fewer — deterministic, never silently
    resampled.  Result: Dataset[src, neg, try_i]."""
    from .algorithms.tc import _packed_edge_keys

    vids = np.sort(np.asarray(ray.get(g.vertex_ids_ref), np.int64))
    assert len(vids) == 0 or vids[-1] < 2**32, (
        "negative_samples packs (src, cand) probe keys: ids < 2^32"
    )
    tries = tries if tries is not None else 4 * k
    keys_ref = _packed_edge_keys.remote(*g.shard_refs)
    uref = ray.put(vids)
    task = ray.remote(_neg_shard)
    mix = _seed_mix(seed)
    refs = [task.remote(k, tries, mix, uref, keys_ref, ref)
            for ref in g.shard_refs]
    return rd.from_arrow_refs(refs)


def weighted_priority_sample(
    ds: rd.Dataset,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
) -> pa.Table:
    """Priority sampling / Sequential Poisson sampling (Duffield-Lund-
    Thorup 2007; Ohlsson 1998): a weight-proportional without-
    replacement sample of k rows, deterministic and layout-invariant.
    Each row gets priority q = splitmix64(key + seed·golden) // w
    (u/w with a 2⁶⁴-uniform u, all integer — no float anywhere); the k
    SMALLEST q win (ties by key).  The (k+1)-st priority tau yields
    the DLT weight estimator w_est = max(w, 2⁶⁴ // tau) per sampled
    row (integer-division variant, documented bias ≤ 1 unit), whose
    sum estimates the population total weight from the sample alone.

    Scale shape: priorities are a stateless per-block map, each block
    ships only its (k+1) smallest rows (per-block partial top-k), the
    driver merges blocks·(k+1) rows and re-slices — the bottom-k
    mergeable-summary discipline, zero shuffles.  ``weight_col`` must
    be positive int64; tau must exceed 2²⁰ (asserted) so the
    estimator's 2⁶⁴ // tau stays inside int64 for any w ≤ 2⁴³."""
    assert k >= 1
    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))

    def _partial(t: pa.Table) -> pa.Table:
        kk = np_col(t, key_col).astype(np.int64)
        w = np_col(t, weight_col).astype(np.int64)
        assert (w > 0).all(), "weights must be positive"
        with np.errstate(over="ignore"):
            q = (hash64(kk + mix) // w.astype(np.uint64)).astype(np.uint64)
        assert (q < np.uint64(1 << 62)).all(), "q int64 guard (w >= 4)"
        qi = q.astype(np.int64)
        order = np.lexsort((kk, qi))[: k + 1]
        return pa.table({
            key_col: pa.array(kk[order], pa.int64()),
            weight_col: pa.array(w[order], pa.int64()),
            "q": pa.array(qi[order], pa.int64()),
        })

    rows = ds.select_columns(
        [key_col, weight_col]
    ).map_batches(_partial, batch_format="pyarrow").take_all()
    if not rows:
        return pa.table({
            key_col: pa.array([], pa.int64()),
            weight_col: pa.array([], pa.int64()),
            "q": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "w_est": pa.array([], pa.int64()),
        })
    kk = np.array([r[key_col] for r in rows], np.int64)
    w = np.array([r[weight_col] for r in rows], np.int64)
    q = np.array([r["q"] for r in rows], np.int64)
    order = np.lexsort((kk, q))
    kk, w, q = kk[order], w[order], q[order]
    take = min(k, len(kk))
    if len(kk) > k:
        tau = int(q[k])
        assert tau > (1 << 20), "tau guard: estimator overflow"
        t_est = (1 << 64) // tau
        w_est = np.maximum(w[:take], np.int64(t_est))
    else:
        # whole population sampled: the estimator is exact
        w_est = w[:take]
    return pa.table({
        key_col: pa.array(kk[:take], pa.int64()),
        weight_col: pa.array(w[:take], pa.int64()),
        "q": pa.array(q[:take], pa.int64()),
        "rank": pa.array(np.arange(1, take + 1, dtype=np.int64),
                         pa.int64()),
        "w_est": pa.array(w_est, pa.int64()),
    })


def walk_skipgram_pairs(
    walks: rd.Dataset,
    window: int = 2,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Skip-gram co-occurrence counts over walk corpora — the
    DeepWalk / node2vec TRAINING-DATA step: for every walk, every
    ordered pair (node at step s, node at step s+d) with 1 ≤ d ≤
    window and both nodes alive (≥ 0) counts once; the (a, b, n)
    table is exactly the positive-pair multiset a skip-gram embedding
    trains on.  Input is the Dataset[wid, step, node] the walk
    engines emit.

    Scale shape: one wid-bucketed exchange (a walk's rows co-locate),
    per-bucket lexsort + window-shift alignment (walks have a fixed
    row count per wid, so step-d pairs are an index shift — no per-row
    Python), per-bucket packed-key pre-combine, then ONE tiny combine
    over the ≤|V|·window-bounded distinct-pair table.  Node ids must
    be < 2³² (packed pair key, asserted)."""
    from .ops import hash_bucket_agg, manual_bucket_agg

    def _pairs(grp: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "__n__": pa.array([], pa.int64())})
        if grp.num_rows < 2:
            return empty
        w = np_col(grp, "wid")
        s = np_col(grp, "step")
        v = np_col(grp, "node")
        order = np.lexsort((s, w))
        w, s, v = w[order], s[order], v[order]
        assert int(v.max(initial=0)) < 2**32, "packed pair key: ids < 2^32"
        keys = []
        for d in range(1, window + 1):
            if d >= len(w):
                break
            ok = (w[d:] == w[:-d]) & (s[d:] == s[:-d] + d) \
                & (v[:-d] >= 0) & (v[d:] >= 0)
            keys.append((v[:-d][ok] << np.int64(32)) | v[d:][ok])
        if not keys:
            return empty
        uk, cnt = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({
            "a": pa.array(uk >> np.int64(32), pa.int64()),
            "b": pa.array(uk & np.int64(0xFFFFFFFF), pa.int64()),
            "__n__": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    partial = hash_bucket_agg(
        walks,
        lambda b: np_col(b, "wid").astype(np.int64),
        _pairs,
        num_buckets=num_buckets,
    )
    def _fold(t: pa.Table) -> pa.Table:
        a, b = np_col(t, "a"), np_col(t, "b")
        k = (a << np.int64(32)) | b
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, np_col(t, "__n__"))
        return pa.table({
            "a": pa.array(uk >> np.int64(32), pa.int64()),
            "b": pa.array(uk & np.int64(0xFFFFFFFF), pa.int64()),
            "n": pa.array(s, pa.int64()),
        })

    # manual exchange for the tiny distinct-pair combine: its explicit
    # empty_result keeps the (a, b, n) schema stable even when an
    # all-dead / empty walk corpus yields zero pair rows.
    return manual_bucket_agg(
        partial,
        lambda t: (np_col(t, "a") << np.int64(32)) | np_col(t, "b"),
        _fold,
        empty_result=pa.table({"a": pa.array([], pa.int64()),
                               "b": pa.array([], pa.int64()),
                               "n": pa.array([], pa.int64())}),
        num_buckets=max(num_buckets // 8, 1),
    )
