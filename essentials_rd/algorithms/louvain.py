"""Synchronized Louvain move round — one modularity-greedy label
refinement pass (Blondel et al. 2008, "Fast unfolding of communities
in large networks"; the synchronous variant of its phase-1 local
moves, public papers): every vertex simultaneously evaluates moving
to each NEIGHBORING community (or staying put) and takes the
modularity-gain argmax against the current partition.

Gain comparisons are kept INTEGER-exact: for vertex v with degree k_v
and candidate community c, the move gains rank identically to

    S(v, c) = 2m·e_{v,c} − k_v·d'_c ,   d'_c = d_c − k_v·[c = a(v)]

(e_{v,c} = edges from v into c, d_c = total degree of c, a(v) = v's
current community — the k_v²/2m² constant shared by all candidates
drops out), so the argmax — ties broken by smallest community label —
is reproducible in SQL with no float modularity anywhere.  The
synchronous round is a deterministic, layout-independent refinement
step (classic sequential Louvain is inherently order-dependent, which
is exactly what a distributed oracle-checked engine cannot ship).

Physical plan: labels/degrees/per-community degree sums broadcast
once (O(|V|) driver arrays — the repo's documented |V| ≪ |E| tier
pattern), ONE scan of the canonical edges emits per-block
(v, community) partial counts, ONE bucketed exchange keyed on v
lands each vertex's complete candidate row set, and the per-bucket
kernel scores + argmaxes vectorized.  Isolated vertices keep their
label via the id-vector zero-fill."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..util import np_col


def modularity_move_round(
    g,
    edges: rd.Dataset,
    vids: np.ndarray,
    lab: np.ndarray,
    num_buckets: int = 32,
) -> pa.Table:
    """One synchronized modularity-greedy move round over the current
    partition ``(vids, lab)``; returns the new (vid, label) table."""
    from ..ops import hash_bucket_agg

    vids = np.asarray(vids, np.int64)
    lab = np.asarray(lab, np.int64)
    deg = np.zeros(len(vids), np.int64)
    for dt in ray.get(list(g.degree_refs)):
        pos = np.searchsorted(vids, np_col(dt, "vid"))
        deg[pos] += np_col(dt, "outdeg")
    m = int(edges.count())
    ulab = np.unique(lab)
    d_c = np.zeros(len(ulab), np.int64)
    np.add.at(d_c, np.searchsorted(ulab, lab), deg)
    # integer-exactness guard: every score term must stay below 2^62
    assert 2 * m * max(int(deg.max(initial=0)), 1) < (1 << 62)
    bref = ray.put((vids, lab, deg, ulab, d_c))

    assert int(vids.max(initial=0)) * (len(ulab) + 1) < (1 << 63)

    def _scan(b: pa.Table) -> pa.Table:
        vv, ll, _, uu, _ = ray.get(bref)
        s = np_col(b, "src").astype(np.int64)
        d = np_col(b, "dst").astype(np.int64)
        x = np.r_[s, d]
        c = ll[np.searchsorted(vv, np.r_[d, s])]
        ci = np.searchsorted(uu, c)
        key = x * np.int64(len(uu) + 1) + ci
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "v": pa.array(uk // np.int64(len(uu) + 1), pa.int64()),
            "c": pa.array(uu[uk % np.int64(len(uu) + 1)], pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def _pick(grp: pa.Table) -> pa.Table:
        vv, ll, kk, uu, dd = ray.get(bref)
        v = np_col(grp, "v")
        c = np_col(grp, "c")
        n = np_col(grp, "n")
        # add the zero-count "stay" candidate for every vertex present
        uniq_v = np.unique(v)
        v = np.r_[v, uniq_v]
        own = ll[np.searchsorted(vv, uniq_v)]
        c = np.r_[c, own]
        n = np.r_[n, np.zeros(len(uniq_v), np.int64)]
        # merge duplicates (real own-community count + the zero row)
        ci = np.searchsorted(uu, c)
        key = v * np.int64(len(uu) + 1) + ci
        order = np.argsort(key, kind="stable")
        key_s, v_s, ci_s, n_s = key[order], v[order], ci[order], n[order]
        first = np.r_[True, key_s[1:] != key_s[:-1]]
        seg = np.cumsum(first) - 1
        ns = np.zeros(seg[-1] + 1, np.int64)
        np.add.at(ns, seg, n_s)
        vm, cim = v_s[first], ci_s[first]
        kv = kk[np.searchsorted(vv, vm)]
        own_m = ll[np.searchsorted(vv, vm)] == uu[cim]
        score = 2 * m * ns - kv * (dd[cim] - kv * own_m)
        cand = uu[cim]
        pick = np.lexsort((cand, -score, vm))
        fv = np.r_[True, vm[pick][1:] != vm[pick][:-1]]
        sel = pick[fv]
        return pa.table({"vid": pa.array(vm[sel], pa.int64()),
                         "label": pa.array(cand[sel], pa.int64())})

    moved = hash_bucket_agg(
        edges.select_columns(["src", "dst"]).map_batches(
            _scan, batch_format="pyarrow"),
        lambda t: np_col(t, "v"), _pick, num_buckets=num_buckets,
    ).take_all()
    out = lab.copy()  # isolated vertices keep their label
    for r in moved:
        out[int(np.searchsorted(vids, r["vid"]))] = r["label"]
    return pa.table({"vid": pa.array(vids, pa.int64()),
                     "label": pa.array(out, pa.int64())})


def contract_graph(
    edges: rd.Dataset,
    vids: np.ndarray,
    lab: np.ndarray,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Louvain aggregation phase / multilevel graph coarsening: map
    each canonical edge's endpoints to their community labels and
    collapse parallel edges into weights — the coarse graph
    (src, dst, weight) the NEXT level's move rounds run on, with
    intra-community edges kept as self-loops (their weight is the
    community's internal edge count, which Louvain's next level
    needs).  One relabel scan with per-block lexsort+reduceat
    pre-combine, then one bucketed exchange on the coarse pair —
    the moved volume is the number of DISTINCT coarse edges per
    block, not |E|."""
    from ..ops import grouped_pandas_agg

    bref = ray.put((np.asarray(vids, np.int64), np.asarray(lab, np.int64)))

    def _relabel(t: pa.Table) -> pa.Table:
        vv, ll = ray.get(bref)
        la = ll[np.searchsorted(vv, np_col(t, "src").astype(np.int64))]
        lb = ll[np.searchsorted(vv, np_col(t, "dst").astype(np.int64))]
        lo = np.minimum(la, lb)
        hi = np.maximum(la, lb)
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        first = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        idx = np.flatnonzero(first)
        w = np.add.reduceat(np.ones(len(lo), np.int64), idx) \
            if len(lo) else np.zeros(0, np.int64)
        return pa.table({"src": pa.array(lo[first], pa.int64()),
                         "dst": pa.array(hi[first], pa.int64()),
                         "weight": pa.array(w, pa.int64())})

    return grouped_pandas_agg(
        edges.select_columns(["src", "dst"]).map_batches(
            _relabel, batch_format="pyarrow"),
        keys=["src", "dst"], aggs={"weight": ("weight", "sum")},
        num_buckets=num_buckets)


def modularity_move_round_weighted(
    edges: rd.Dataset,
    num_buckets: int = 32,
) -> pa.Table:
    """Singleton-seeded synchronized move round over a WEIGHTED graph —
    the level-2 step that runs on :func:`contract_graph`'s coarse
    output, completing the multilevel Louvain pipeline: gains rank by
    the integer score S = 2W·e^w_{v,c} − k^w_v·d'^w_c with W the total
    edge weight, k^w the weighted degree (self-loops count TWICE — the
    standard A_ii = 2w convention, so Σk = 2W holds), and e^w the
    weight from v into community c.  Self-loop weights travel with v
    into any community — they add the same constant to every
    candidate's e^w and drop out of the argmax, so the candidate scan
    skips them while the degree fold keeps them.

    Seeded from the singleton partition (label = own id), so
    d_c = k_c and the whole round is one non-self edge scan with
    per-block partials + one v-keyed exchange; the weighted-degree
    vector is the O(|V_coarse|) driver array (tier pattern)."""
    from ..ops import grouped_pandas_agg, hash_bucket_agg

    def _deg_rows(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64)
        d = np_col(t, "dst").astype(np.int64)
        w = np_col(t, "weight").astype(np.int64)
        self_m = s == d
        return pa.table({
            "vid": pa.array(np.r_[s, d[~self_m]], pa.int64()),
            "w": pa.array(np.r_[np.where(self_m, 2 * w, w), w[~self_m]],
                          pa.int64()),
        })

    deg_rows = grouped_pandas_agg(
        edges.map_batches(_deg_rows, batch_format="pyarrow"),
        keys=["vid"], aggs={"w": ("w", "sum")},
        num_buckets=num_buckets).take_all()
    vids = np.array(sorted(int(r["vid"]) for r in deg_rows), np.int64)
    kw = np.zeros(len(vids), np.int64)
    for r in deg_rows:
        kw[int(np.searchsorted(vids, r["vid"]))] = r["w"]
    W = int(kw.sum()) // 2
    assert 2 * W * max(int(kw.max(initial=0)), 1) < (1 << 62)
    bref = ray.put((vids, kw))

    def _scan(t: pa.Table) -> pa.Table:
        s = np_col(t, "src").astype(np.int64)
        d = np_col(t, "dst").astype(np.int64)
        w = np_col(t, "weight").astype(np.int64)
        m = s != d  # self-loops drop out of the argmax
        return pa.table({
            "v": pa.array(np.r_[s[m], d[m]], pa.int64()),
            "c": pa.array(np.r_[d[m], s[m]], pa.int64()),
            "n": pa.array(np.r_[w[m], w[m]], pa.int64()),
        })

    def _pick(grp: pa.Table) -> pa.Table:
        vv, kk = ray.get(bref)
        v = np_col(grp, "v")
        c = np_col(grp, "c")
        n = np_col(grp, "n")
        uniq_v = np.unique(v)
        v = np.r_[v, uniq_v]        # zero-weight "stay" candidates
        c = np.r_[c, uniq_v]
        n = np.r_[n, np.zeros(len(uniq_v), np.int64)]
        ci = np.searchsorted(vv, c)
        key = np.searchsorted(vv, v).astype(np.int64) \
            * np.int64(len(vv) + 1) + ci
        order = np.argsort(key, kind="stable")
        key_s, v_s, ci_s, n_s = key[order], v[order], ci[order], n[order]
        first = np.r_[True, key_s[1:] != key_s[:-1]]
        seg = np.cumsum(first) - 1
        ns = np.zeros(seg[-1] + 1, np.int64)
        np.add.at(ns, seg, n_s)
        vm, cim = v_s[first], ci_s[first]
        kv = kk[np.searchsorted(vv, vm)]
        own = vm == vv[cim]          # singleton seed: own community = own id
        score = 2 * W * ns - kv * (kk[cim] - kv * own)
        cand = vv[cim]
        pick = np.lexsort((cand, -score, vm))
        fv = np.r_[True, vm[pick][1:] != vm[pick][:-1]]
        sel = pick[fv]
        return pa.table({"vid": pa.array(vm[sel], pa.int64()),
                         "label": pa.array(cand[sel], pa.int64())})

    moved = hash_bucket_agg(
        edges.map_batches(_scan, batch_format="pyarrow"),
        lambda t: np_col(t, "v"), _pick, num_buckets=num_buckets,
    ).take_all()
    out = vids.copy()  # isolated / self-loop-only vertices stay put
    for r in moved:
        out[int(np.searchsorted(vids, r["vid"]))] = r["label"]
    return pa.table({"vid": pa.array(vids, pa.int64()),
                     "label": pa.array(out, pa.int64())})
