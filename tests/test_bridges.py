"""XOR-sketch bridge finding vs an iterative-Tarjan reference."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.graph import build_graph


def tarjan_bridges(src, dst):
    adj = {}
    for a, b in zip(src, dst):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    disc, low, out = {}, {}, []
    t = [0]
    for s0 in sorted(adj):
        if s0 in disc:
            continue
        stack = [(s0, -1, iter(adj[s0]))]
        disc[s0] = low[s0] = t[0]
        t[0] += 1
        while stack:
            v, p, it = stack[-1]
            advanced = False
            for w in it:
                if w not in disc:
                    disc[w] = low[w] = t[0]
                    t[0] += 1
                    stack.append((w, v, iter(adj[w])))
                    advanced = True
                    break
                elif w != p:
                    low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    pv = stack[-1][0]
                    low[pv] = min(low[pv], low[v])
                    if low[v] > disc[pv]:
                        out.append((min(pv, v), max(pv, v)))
    return sorted(out)


def _run(src, dst, tmp_path, shards=4, tag=""):
    from essentials_rd.algorithms import find_bridges

    ds = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    }))
    g = build_graph(ds, str(tmp_path / f"g{tag}{shards}"), shards,
                    symmetrize=True)
    t, info = find_bridges(g, ds, checkpoint_every=0)
    return (sorted(zip(np.asarray(t["src"]).tolist(),
                       np.asarray(t["dst"]).tolist())), info)


def test_hand_cases(tmp_path, ray_session):
    # path 0-1-2-3: every edge a bridge
    got, _ = _run([0, 1, 2], [1, 2, 3], tmp_path, tag="p")
    assert got == [(0, 1), (1, 2), (2, 3)]
    # 4-cycle: none
    got, _ = _run([0, 1, 2, 3], [1, 2, 3, 0], tmp_path, tag="c")
    assert got == []
    # cycle + pendant: only the pendant edge
    got, _ = _run([0, 1, 2, 2], [1, 2, 0, 9], tmp_path, tag="cp")
    assert got == [(2, 9)]


def test_random_sparse_matches_tarjan(tmp_path, ray_session):
    rng = np.random.default_rng(21)
    n, m = 300, 330  # avg degree ~2.2: many bridges AND many cycles
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep]).astype(np.int64)
    hi = np.maximum(src[keep], dst[keep]).astype(np.int64)
    packed = np.unique(lo * n + hi)
    lo, hi = (packed // n), (packed % n)
    want = tarjan_bridges(lo.tolist(), hi.tolist())
    assert len(want) > 20  # the fixture is non-trivial
    got, info = _run(lo, hi, tmp_path, tag="r")
    assert got == want
    # multi-component forest: several roots
    assert (info["parent"] == info["vids"]).sum() > 1


def test_two_edge_components_reference(tmp_path, ray_session):
    # bridges split 2ECCs: remove Tarjan bridges, component-label the
    # rest, compare against find_bridges + CC composition
    rng = np.random.default_rng(55)
    n, m = 200, 230
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep]).astype(np.int64)
    hi = np.maximum(src[keep], dst[keep]).astype(np.int64)
    packed = np.unique(lo * n + hi)
    lo, hi = (packed // n), (packed % n)

    from essentials_rd.algorithms import connected_components, find_bridges
    from essentials_rd.algorithms.cc import components_table

    ds = rd.from_arrow(pa.table({"src": pa.array(lo, pa.int64()),
                                 "dst": pa.array(hi, pa.int64())}))
    g = build_graph(ds, str(tmp_path / "g2e"), 4, symmetrize=True)
    br, _ = find_bridges(g, ds, checkpoint_every=0)
    bset = set(zip(np.asarray(br["src"]).tolist(),
                   np.asarray(br["dst"]).tolist()))
    assert sorted(bset) == tarjan_bridges(lo.tolist(), hi.tolist())

    m2 = np.array([(a, b) not in bset for a, b in zip(lo, hi)])
    ds2 = rd.from_arrow(pa.table({"src": pa.array(lo[m2], pa.int64()),
                                  "dst": pa.array(hi[m2], pa.int64())}))
    g2 = build_graph(ds2, str(tmp_path / "g2f"), 4, symmetrize=True,
                     vertex_ids=np.unique(np.r_[lo, hi]))
    cc = connected_components(g2, checkpoint_every=0)
    t = components_table(cc)
    got = dict(zip(np.asarray(t["vid"]).tolist(),
                   np.asarray(t["label"]).tolist()))

    # brute-force 2ECC labels: union-find over non-bridge edges
    parent = {int(v): int(v) for v in np.r_[lo, hi]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(lo.tolist(), hi.tolist()):
        if (a, b) not in bset:
            parent[find(a)] = find(b)
    want = {}
    for v in parent:
        r = find(v)
        want.setdefault(r, []).append(v)
    ref = {}
    for members in want.values():
        mn = min(members)
        for v in members:
            ref[v] = mn
    assert got == ref
    # every bridge endpoint pair sits in DIFFERENT 2ECCs
    for a, b in bset:
        assert got[a] != got[b]


def test_partition_invariance(tmp_path, ray_session):
    rng = np.random.default_rng(33)
    n, m = 120, 140
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep]).astype(np.int64)
    hi = np.maximum(src[keep], dst[keep]).astype(np.int64)
    packed = np.unique(lo * n + hi)
    lo, hi = (packed // n), (packed % n)
    a, _ = _run(lo, hi, tmp_path, shards=2, tag="i")
    b, _ = _run(lo, hi, tmp_path, shards=7, tag="i")
    assert a == b == tarjan_bridges(lo.tolist(), hi.tolist())
