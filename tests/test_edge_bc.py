"""Edge betweenness vs a brute-force per-source Brandes reference,
plus the flow identity Σ_incoming-edge-dep = 1 + δ(v)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.graph import build_graph


def brute_edge_bc(lo, hi, sources):
    adj = {}
    for a, b in zip(lo, hi):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    out = {}
    deltas = {}
    from collections import deque
    for s in sources:
        depth = {s: 0}
        sigma = {s: 1.0}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj.get(u, []):
                if w not in depth:
                    depth[w] = depth[u] + 1
                    sigma[w] = 0.0
                    order.append(w)
                    q.append(w)
                if depth[w] == depth[u] + 1:
                    sigma[w] += sigma[u]
        delta = {v: 0.0 for v in depth}
        for w in reversed(order):
            for u in adj.get(w, []):
                if u in depth and depth[u] == depth[w] - 1:
                    c = sigma[u] / sigma[w] * (1.0 + delta[w])
                    e = (min(u, w), max(u, w))
                    out[e] = out.get(e, 0.0) + c
                    delta[u] += c
        deltas[s] = delta
    return out, deltas


def test_edge_bc_matches_bruteforce(tmp_path, ray_session):
    rng = np.random.default_rng(17)
    n, m = 80, 200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep]).astype(np.int64)
    hi = np.maximum(src[keep], dst[keep]).astype(np.int64)
    packed = np.unique(lo * n + hi)
    lo, hi = (packed // n), (packed % n)
    ds = rd.from_arrow(pa.table({"src": pa.array(lo, pa.int64()),
                                 "dst": pa.array(hi, pa.int64())}))
    g = build_graph(ds, str(tmp_path / "g"), 4, symmetrize=True)

    from essentials_rd.algorithms.bc import edge_betweenness

    vids = np.unique(np.r_[lo, hi])
    sources = vids[:3].tolist()
    got = {(r["src"], r["dst"]): r["ebc"]
           for r in edge_betweenness(g, ds, np.array(sources)).take_all()}
    want, deltas = brute_edge_bc(lo.tolist(), hi.tolist(), sources)
    assert set(k for k, v in got.items() if v > 0) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9

    # single-source sanity on a path graph: every edge of 0-1-2-3 from
    # source 0 carries dep = #shortest paths THROUGH it = 3, 2, 1
    p_lo, p_hi = [0, 1, 2], [1, 2, 3]
    one, _ = brute_edge_bc(p_lo, p_hi, [0])
    assert one == {(0, 1): 3.0, (1, 2): 2.0, (2, 3): 1.0}
    ds2 = rd.from_arrow(pa.table({"src": pa.array(p_lo, pa.int64()),
                                  "dst": pa.array(p_hi, pa.int64())}))
    g2 = build_graph(ds2, str(tmp_path / "gp"), 2, symmetrize=True)
    got2 = {(r["src"], r["dst"]): r["ebc"]
            for r in edge_betweenness(g2, ds2, np.array([0])).take_all()}
    assert got2 == one
