"""Pure-NumPy CPU reference validators.

Mirrors the reference's pattern of shipping a CPU validator next to each
GPU algorithm (gunrock/essentials ``examples/algorithms/pr/pr.cu``
computes host PageRank and reports mismatches; ``examples/algorithms/
sssp/sssp_cpu.hxx`` is the CPU Dijkstra [U — snapshot absent, SURVEY.md
§0]).  These are the oracles the BASELINE.json north_star calls
"essentials' own algorithm correctness checks (pr/cc/spmv test
harnesses)": the Ray engine must match them allclose 1e-6 (PageRank) /
exactly (CC, LP, TC).

All functions take an edge list as (src, dst) int64 arrays over an
explicit vertex id array (ids need not be dense) and are deterministic.
"""

from __future__ import annotations

import numpy as np


def _to_dense(vids: np.ndarray, src: np.ndarray, dst: np.ndarray):
    """Map arbitrary int64 vertex ids to dense [0, n) indices."""
    vids = np.unique(np.asarray(vids, dtype=np.int64))
    s = np.searchsorted(vids, src)
    d = np.searchsorted(vids, dst)
    return vids, s, d


def pagerank_weighted_ref(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    alpha: float = 0.85,
    max_iters: int = 100,
    tol: float = 1.0e-6,
) -> np.ndarray:
    """Edge-weighted PageRank reference: mass splits proportionally to
    out-edge weights (W+(u) = sum of out-weights); dangling = outdeg 0,
    redistributed uniformly; same start / stop rule as pagerank_ref."""
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    w = np.asarray(weight, dtype=np.float64)
    wsum = np.bincount(s, weights=w, minlength=n)
    outdeg = np.bincount(s, minlength=n)
    dangling = outdeg == 0
    p = np.full(n, 1.0 / n)
    for _ in range(max_iters):
        per_src = np.where(dangling, 0.0, p / np.maximum(wsum, 1e-300))
        agg = np.bincount(d, weights=per_src[s] * w, minlength=n)
        dmass = p[dangling].sum()
        p_new = (1.0 - alpha) / n + alpha * (agg + dmass / n)
        err = np.abs(p_new - p).sum()
        p = p_new
        if err < n * tol:
            break
    return p


def pagerank_ref(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    alpha: float = 0.85,
    max_iters: int = 100,
    tol: float = 1.0e-6,
) -> np.ndarray:
    """Power-iteration PageRank over a DIRECTED edge list.

    Semantics pinned (SURVEY.md §2.2 A1): ``p' = (1-a)/n + a*(sum_in
    p(u)/outdeg(u) + dangling_mass/n)``; dangling mass redistributed
    uniformly (networkx-compatible); start uniform 1/n; stop when the L1
    error ``sum|p'-p| < n*tol`` (networkx's criterion) or after
    ``max_iters``.  Returns p aligned with sorted unique ``vids``.
    """
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    p = np.full(n, 1.0 / n)
    dangling = outdeg == 0
    for _ in range(max_iters):
        contrib = np.where(dangling, 0.0, p / np.maximum(outdeg, 1.0))
        agg = np.bincount(d, weights=contrib[s], minlength=n)
        dmass = p[dangling].sum()
        p_new = (1.0 - alpha) / n + alpha * (agg + dmass / n)
        err = np.abs(p_new - p).sum()
        p = p_new
        if err < n * tol:
            break
    return p


def pagerank_fixed_ref(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray, k: int, alpha: float = 0.85
) -> np.ndarray:
    """Exactly-k-iteration PageRank (no convergence test) — the oracle for
    the fixed-iteration driver queries where DuckDB unrolls k steps."""
    return pagerank_ref(vids, src, dst, alpha=alpha, max_iters=k, tol=0.0)


def cc_ref(vids: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Connected components of the UNDIRECTED graph; label = min vid in the
    component (the hash-min fixpoint).  Union-find, path-halving."""
    vids, s, d = _to_dense(vids, src, dst)
    parent = np.arange(len(vids), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(s.tolist(), d.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(len(vids))], dtype=np.int64)
    # min vid per component == vid of min dense index per component,
    # because vids is sorted ascending.
    comp_min = np.full(len(vids), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(comp_min, roots, vids)
    return comp_min[roots]


def lp_sync_ref(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray, max_iters: int = 10
) -> np.ndarray:
    """Synchronous label propagation, deterministic.

    Init label(v)=vid.  Each superstep every vertex takes the most
    frequent label among its (distinct-edge) neighbors in the symmetrized
    simple graph; ties broken by MIN label; isolated vertices keep their
    label.  Stops when no label changes or after ``max_iters``.  This
    exact semantics is mirrored by the engine and the DuckDB oracle
    (SURVEY.md §2.2 A3 — deterministic, value-based tie-break).
    """
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    # symmetrize + dedup + drop self-loops
    a = np.concatenate([s, d])
    b = np.concatenate([d, s])
    keep = a != b
    a, b = a[keep], b[keep]
    pair = a * np.int64(n) + b
    pair = np.unique(pair)
    a, b = pair // n, pair % n
    labels = vids.copy()
    for _ in range(max_iters):
        # votes: neighbor labels for each dst a<-b means a receives label[b]
        recv, lab = a, labels[b]
        # count per (recv, label); argmax count then min label
        order = np.lexsort((lab, recv))
        r_s, l_s = recv[order], lab[order]
        grp = np.flatnonzero(np.r_[True, (r_s[1:] != r_s[:-1]) | (l_s[1:] != l_s[:-1])])
        cnt = np.diff(np.r_[grp, len(r_s)])
        g_r, g_l = r_s[grp], l_s[grp]
        # per recv: pick max cnt, tie -> min label. Sort by (recv, -cnt, label).
        sel = np.lexsort((g_l, -cnt, g_r))
        first = np.flatnonzero(np.r_[True, g_r[sel][1:] != g_r[sel][:-1]])
        win_r = g_r[sel][first]
        win_l = g_l[sel][first]
        new_labels = labels.copy()
        new_labels[win_r] = win_l
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return labels


def lp_sync_fixed_ref(vids, src, dst, k: int) -> np.ndarray:
    """Exactly-k-superstep sync LP (oracle for the unrolled SQL query).

    Note: unlike :func:`lp_sync_ref` this does NOT stop early on
    stabilization... it does, actually — a stabilized state is a fixpoint
    of the update, so running further steps is a no-op and early-stop is
    equivalent.  Kept as an alias for intent.
    """
    return lp_sync_ref(vids, src, dst, max_iters=k)


def triangles_ref(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray
) -> tuple[int, np.ndarray]:
    """Exact triangle count of the undirected simple graph.

    Returns (total, per_vertex_counts aligned with sorted unique vids).
    Forward/degree-ordering algorithm (SURVEY.md §2.2 A4): orient each
    undirected edge from lower (degree, vid) rank to higher; a triangle
    (u,v,w) is counted once at its lowest-ranked corner pair.
    """
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    a = np.concatenate([s, d])
    b = np.concatenate([d, s])
    keep = a != b
    a, b = a[keep], b[keep]
    pair = np.unique(a * np.int64(n) + b)
    a, b = pair // n, pair % n
    deg = np.bincount(a, minlength=n)
    rank = np.lexsort((np.arange(n), deg))  # not a rank yet
    rank_of = np.empty(n, dtype=np.int64)
    rank_of[rank] = np.arange(n)
    fwd = rank_of[a] < rank_of[b]
    oa, ob = a[fwd], b[fwd]
    # adjacency (oriented), neighbor lists sorted by rank? sort by (oa, ob)
    order = np.lexsort((ob, oa))
    oa, ob = oa[order], ob[order]
    starts = np.searchsorted(oa, np.arange(n))
    ends = np.searchsorted(oa, np.arange(n) + 1)
    per_vertex = np.zeros(n, dtype=np.int64)
    total = 0
    nbr = [ob[starts[i] : ends[i]] for i in range(n)]
    for u, v in zip(oa.tolist(), ob.tolist()):
        common = np.intersect1d(nbr[u], nbr[v], assume_unique=True)
        c = len(common)
        if c:
            total += c
            per_vertex[u] += c
            per_vertex[v] += c
            np.add.at(per_vertex, common, 1)
    return total, per_vertex


def spmv_ref(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    x: np.ndarray,
) -> np.ndarray:
    """y = A @ x where A[dst, src] = weight (message flows src→dst), x
    aligned with sorted unique vids.  Oracle for the SpMV harness
    (gunrock/essentials ``algorithms/spmv.hxx`` [U])."""
    vids, s, d = _to_dense(vids, src, dst)
    y = np.zeros(len(vids), dtype=np.float64)
    np.add.at(y, d, np.asarray(weight, dtype=np.float64) * x[s])
    return y


def bfs_ref(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray, source: int
) -> np.ndarray:
    """BFS hop depths from ``source`` along src→dst edges; -1 where
    unreachable.  CPU validator mirroring the reference's per-example
    host checks (``algorithms/bfs.hxx`` [U])."""
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    depth = np.full(n, -1, np.int64)
    si = np.searchsorted(vids, source)
    if si >= n or vids[si] != source:
        return depth
    order = np.argsort(s, kind="stable")
    s, d = s[order], d[order]
    starts = np.searchsorted(s, np.arange(n))
    ends = np.searchsorted(s, np.arange(n) + 1)
    depth[si] = 0
    frontier = [int(si)]
    k = 0
    while frontier:
        k += 1
        nxt = []
        for u in frontier:
            for v in d[starts[u]: ends[u]]:
                if depth[v] == -1:
                    depth[v] = k
                    nxt.append(int(v))
        frontier = nxt
    return depth


def sssp_ref(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray,
    source: int,
) -> np.ndarray:
    """Bellman-Ford shortest distances from ``source`` (non-negative
    weights); +inf where unreachable.  Mirrors the reference's
    ``sssp_cpu.hxx`` CPU validator [U]."""
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    dist = np.full(n, np.inf)
    si = np.searchsorted(vids, source)
    if si >= n or vids[si] != source:
        return dist
    dist[si] = 0.0
    w = np.asarray(weight, dtype=np.float64)
    for _ in range(n):
        new = dist.copy()
        np.minimum.at(new, d, dist[s] + w)
        if np.all((new == dist) | (np.isinf(new) & np.isinf(dist))):
            break
        dist = new
    return dist


def ppr_ref(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    source: int,
    alpha: float = 0.85,
    max_iters: int = 100,
    tol: float = 1.0e-6,
) -> np.ndarray:
    """Personalized PageRank over a DIRECTED edge list (SURVEY.md §2.2
    A7 family; upstream ``algorithms/ppr.hxx`` [U]): teleport AND
    dangling mass restart at the seed; start p = e_seed; ``tol=0`` →
    exactly ``max_iters`` power steps."""
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    pers = np.zeros(n)
    pers[np.searchsorted(vids, source)] = 1.0
    p = pers.copy()
    dangling = outdeg == 0
    for _ in range(max_iters):
        contrib = np.where(dangling, 0.0, p / np.maximum(outdeg, 1.0))
        agg = np.bincount(d, weights=contrib[s], minlength=n)
        dmass = p[dangling].sum()
        p_new = (1.0 - alpha) * pers + alpha * (agg + dmass * pers)
        err = np.abs(p_new - p).sum()
        p = p_new
        if tol > 0 and err < tol:
            break
    return p


def kcore_ref(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray, k: int
) -> np.ndarray:
    """k-core membership (0/1) over a SYMMETRIZED edge list by direct
    peeling (SURVEY.md §2.2 A7 family; upstream ``algorithms/kcore.hxx``
    [U]): repeatedly drop vertices with < k remaining neighbors."""
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    alive = np.ones(n, bool)
    while True:
        deg = np.bincount(s[alive[s] & alive[d]], minlength=n)
        newly = alive & (deg < k)
        if not newly.any():
            return alive.astype(np.int64)
        alive &= ~newly


def eigencentrality_ref(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    max_iters: int = 100,
    tol: float = 1.0e-9,
) -> np.ndarray:
    """L1-normalized power iteration over a DIRECTED edge list
    (SURVEY.md §2.2 A7 family; symmetric-case HITS, upstream
    ``algorithms/hits.hxx`` [U]): c' = (Σ_in c) / (Σ_u c(u)·outdeg(u));
    start uniform; ``tol=0`` → exactly ``max_iters`` steps."""
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    c = np.full(n, 1.0 / n)
    for _ in range(max_iters):
        z = float((c * outdeg).sum())
        agg = np.bincount(d, weights=c[s], minlength=n)
        c_new = agg / z if z > 0 else np.zeros(n)
        err = np.abs(c_new - c).sum()
        c = c_new
        if tol > 0 and err < tol:
            break
    return c


def color_ref(vids: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Deterministic Luby-style greedy coloring over a SYMMETRIZED edge
    list (SURVEY.md §2.2 A7 family; upstream ``algorithms/color.hxx``
    [U]), same per-round priority as the engine: round r colors every
    uncolored vertex whose (priority, vid) beats all uncolored
    neighbors'."""
    K = np.uint64(2654435761)
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    col = np.full(n, -1, np.int64)
    r = 0
    while (col < 0).any():
        v64 = vids.astype(np.uint64)
        p = ((v64 + np.uint64(r + 1) * K) * K) % np.uint64(1 << 31)
        packed = (p * np.uint64(1 << 32) + v64).astype(np.int64)
        unc = col < 0
        inc = np.full(n, np.iinfo(np.int64).min, np.int64)
        live = unc[s]  # messages flow only from uncolored sources
        np.maximum.at(inc, d[live], packed[s[live]])
        wins = unc & (packed > inc)
        col[wins] = r
        r += 1
    return col


def msf_ref(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray, w: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Kruskal minimum spanning forest over canonical undirected edges
    (SURVEY.md §2.2 A7 family; upstream ``algorithms/mst.hxx`` [U]),
    ties broken by (weight, src, dst) — the same total order Borůvka
    uses, so the forest is unique and comparable edge-for-edge.
    Returns (src, dst, w) of the forest sorted by (src, dst)."""
    vids = np.sort(np.unique(vids))
    order = np.lexsort((dst, src, w))
    parent = np.arange(len(vids), dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ms, md, mw = [], [], []
    ps = np.searchsorted(vids, src)
    pd_ = np.searchsorted(vids, dst)
    for i in order:
        ra, rb = find(ps[i]), find(pd_[i])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            ms.append(src[i]); md.append(dst[i]); mw.append(w[i])
    s = np.array(ms, np.int64); d = np.array(md, np.int64)
    ww = np.array(mw, np.float64)
    o = np.lexsort((d, s))
    return s[o], d[o], ww[o]


def geo_ref(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    seed_vids: np.ndarray,
    seed_lat: np.ndarray,
    seed_lon: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Label-once location propagation over a SYMMETRIZED edge list
    (SURVEY.md §2.2 A7 family; upstream ``algorithms/geo.hxx`` [U],
    semantics pinned label-once/mean — see algorithms/geo.py): round r
    locates every unlocated vertex with ≥1 neighbor located before r,
    at the mean of those neighbors.  Unlocated stays (-1, -1)."""
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    lat = np.full(n, -1.0)
    lon = np.full(n, -1.0)
    located = np.zeros(n, bool)
    pos = np.searchsorted(vids, seed_vids)
    lat[pos], lon[pos] = seed_lat, seed_lon
    located[pos] = True
    while True:
        live = located[s]
        cnt = np.bincount(d[live], minlength=n)
        newly = (~located) & (cnt > 0)
        if not newly.any():
            return lat, lon
        sl = np.bincount(d[live], weights=lat[s[live]], minlength=n)
        so = np.bincount(d[live], weights=lon[s[live]], minlength=n)
        lat[newly] = sl[newly] / cnt[newly]
        lon[newly] = so[newly] / cnt[newly]
        located |= newly


def betweenness_ref(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray, sources: np.ndarray
) -> np.ndarray:
    """Sampled-source Brandes over a SYMMETRIZED edge list (SURVEY.md
    §2.2 A7 family; upstream ``algorithms/bc.hxx`` [U]): bc(v) =
    Σ_{s∈sources} δ_s(v), unnormalized, δ_s(s) excluded."""
    vids, s_, d_ = _to_dense(vids, src, dst)
    n = len(vids)
    bc = np.zeros(n)
    for src_v in np.searchsorted(vids, sources):
        depth = np.full(n, -1, np.int64)
        sigma = np.zeros(n)
        depth[src_v] = 0
        sigma[src_v] = 1.0
        lev = 0
        while True:
            on = depth[s_] == lev
            tgt_new = (depth[d_] == -1) & on
            if not tgt_new.any():
                break
            np.add.at(sigma, d_[tgt_new], sigma[s_[tgt_new]])
            depth[d_[tgt_new]] = lev + 1
            lev += 1
        delta = np.zeros(n)
        for l in range(lev, 1, -1):
            child = depth[s_] == l
            par = depth[d_] == l - 1
            e = child & par
            contrib = (1.0 + delta[s_[e]]) / sigma[s_[e]]
            add = np.zeros(n)
            np.add.at(add, d_[e], contrib)
            delta += sigma * add
        delta[src_v] = 0.0
        bc += delta
    return bc


def harmonic_ref(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray,
    sources: np.ndarray, max_depth: int,
) -> np.ndarray:
    """Sampled harmonic centrality over a SYMMETRIZED edge list:
    h(v) = Σ_{s∈sources, s≠v} 1/d(s,v), hops capped at ``max_depth``
    (depth-truncated variant — matches the engine's max_iters cap)."""
    vids, s_, d_ = _to_dense(vids, src, dst)
    n = len(vids)
    h = np.zeros(n)
    for sv in np.searchsorted(vids, sources):
        depth = np.full(n, -1, np.int64)
        depth[sv] = 0
        lev = 0
        while lev < max_depth:
            on = depth[s_] == lev
            new = (depth[d_] == -1) & on
            if not new.any():
                break
            depth[d_[new]] = lev + 1
            lev += 1
        reach = depth > 0
        h[reach] += 1.0 / depth[reach]
    return h


def hits_ref(
    vids: np.ndarray, src: np.ndarray, dst: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """CPU HITS validator (dense, directed): k unnormalized
    (authority, hub) rounds from h0=1, one final L1 normalization —
    mirrors gunrock/essentials' hub/authority pair
    (``algorithms/hits.hxx`` [U — snapshot absent])."""
    n = len(vids)
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(k):
        a = np.bincount(di, weights=h[si], minlength=n)
        h = np.bincount(si, weights=a[di], minlength=n)
    hs, as_ = h.sum(), a.sum()
    return (h / hs if hs > 0 else h), (a / as_ if as_ > 0 else a)


def mis_ref(vids: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Deterministic Luby MIS over a SYMMETRIZED edge list, mirroring
    the engine's round schedule exactly (same packed priorities, kills
    processed before contests).  Returns 0/1 membership."""
    from .algorithms.color import _packed_priority

    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    status = np.full(n, -1, np.int64)
    fresh = np.zeros(n, bool)
    kill = np.iinfo(np.int64).max
    rnd = 0
    while (status < 0).any():
        pri = _packed_priority(vids, rnd)
        und = status < 0
        inc = np.full(n, np.iinfo(np.int64).min, np.int64)
        m = und[s]
        np.maximum.at(inc, d[m], pri[s[m]])
        inc[d[fresh[s]]] = kill
        killed = und & (inc == kill)
        wins = und & ~killed & (pri > inc)
        status[killed] = 0
        status[wins] = 1
        fresh = wins
        rnd += 1
        assert rnd <= 2 * n + 2, "MIS reference failed to terminate"
    return status


def scc_ref(vids: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Iterative Tarjan SCC over a DIRECTED edge list; returns per
    vertex the MIN vertex id of its strongly connected component (the
    engine's canonical labeling, ``algorithms/scc.py``)."""
    vids, s, d = _to_dense(vids, src, dst)
    n = len(vids)
    # CSR adjacency
    order = np.argsort(s, kind="stable")
    s_sorted, d_sorted = s[order], d[order]
    starts = np.searchsorted(s_sorted, np.arange(n + 1))
    index = np.full(n, -1, np.int64)
    low = np.zeros(n, np.int64)
    on_stack = np.zeros(n, bool)
    stack: list[int] = []
    label = np.full(n, -1, np.int64)
    counter = 0
    for root in range(n):
        if index[root] >= 0:
            continue
        # explicit DFS stack of (vertex, next-edge-offset)
        work = [(root, int(starts[root]))]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, ei = work[-1]
            if ei < starts[v + 1]:
                work[-1] = (v, ei + 1)
                w = int(d_sorted[ei])
                if index[w] < 0:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, int(starts[w])))
                elif on_stack[w]:
                    low[v] = min(low[v], index[w])
            else:
                work.pop()
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        comp.append(w)
                        if w == v:
                            break
                    cid = vids[comp].min()
                    label[comp] = cid
    return label
