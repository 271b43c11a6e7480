"""graph_voronoi (algorithms/voronoi.py) vs a Python multi-source BFS
brute force: nearest-seed assignment with (dist, seed-rank) ties,
unreachable marking, seed-rank (not seed-vid) tie order, partition
invariance."""

import numpy as np
import pytest

from essentials_rd.algorithms.voronoi import graph_voronoi, voronoi_table

from .conftest import small_graph


def _brute(src, dst, n, seeds):
    from collections import deque
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
    best = {}  # vid -> (dist, rank)
    q = deque()
    for r, s in enumerate(seeds):
        if (0, r) < best.get(s, (1 << 60, 0)):
            best[s] = (0, r)
    # BFS by levels with lexicographic (dist, rank) relaxation:
    # Dijkstra over the key works since all edges cost one level
    import heapq
    heap = [(0, r, s) for r, s in enumerate(seeds)]
    best = {}
    while heap:
        d, r, v = heapq.heappop(heap)
        if v in best and best[v] <= (d, r):
            continue
        best[v] = (d, r)
        for w in adj.get(v, []):
            if w not in best or best[w] > (d + 1, r):
                heapq.heappush(heap, (d + 1, r, w))
    out = {}
    for v in range(n):
        if v in best:
            d, r = best[v]
            out[v] = (d, seeds[r])
        else:
            out[v] = (-1, -1)
    return out


def _got(tmp_path, src, dst, seeds, P=2):
    g = small_graph(tmp_path, src, dst, P=P)
    res = graph_voronoi(g, seeds, checkpoint_every=0)
    assert res.converged
    t = voronoi_table(res, seeds)
    return {v: (d, s) for v, d, s in
            zip(t.column("vid").to_pylist(),
                t.column("dist").to_pylist(),
                t.column("seed_vid").to_pylist())}


def test_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 120).astype(np.int64)
    dst = rng.integers(0, 40, 120).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    seeds = [3, 17, 29]
    got = _got(tmp_path, src, dst, seeds)
    want = _brute(src, dst, 40, seeds)
    want = {v: want[v] for v in got}  # engine covers touched vertices
    assert got == want


def test_tie_goes_to_smaller_rank_not_vid(tmp_path):
    # path 10-1-20: vertex 1 equidistant from both seeds; seed order
    # [20, 10] makes rank(20)=0 win despite larger vid
    got = _got(tmp_path, [10, 1], [1, 20], seeds=[20, 10])
    assert got[1] == (1, 20)
    got2 = _got(tmp_path, [10, 1], [1, 20], seeds=[10, 20])
    assert got2[1] == (1, 10)


def test_unreachable_and_partitions(tmp_path):
    # two components; seed only in the first
    a = tmp_path / "a"; a.mkdir()
    b = tmp_path / "b"; b.mkdir()
    src = [0, 1, 5, 6]
    dst = [1, 2, 6, 7]
    g1 = _got(a, src, dst, seeds=[0], P=1)
    g4 = _got(b, src, dst, seeds=[0], P=4)
    assert g1 == g4
    assert g1[2] == (2, 0) and g1[5] == (-1, -1) and g1[7] == (-1, -1)


def test_coarsen_quotient_bruteforce(tmp_path, monkeypatch):
    # quotient counts: contract assignments, count edges per region
    # pair including diagonals
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import grouped_pandas_agg, join
    from essentials_rd.util import np_col

    rng = np.random.default_rng(11)
    src = rng.integers(0, 30, 80).astype(np.int64)
    dst = rng.integers(0, 30, 80).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    pairs = np.unique(lo * np.int64(1 << 20) + hi)
    src, dst = pairs // (1 << 20), pairs % (1 << 20)
    seeds = [2, 9, 21]
    asg = _got(tmp_path, src, dst, seeds, P=2)

    want = {}
    for s, d in zip(src, dst):
        ra, rb = asg[s][1], asg[d][1]
        key = (min(ra, rb), max(ra, rb))
        want[key] = want.get(key, 0) + 1

    g = small_graph(tmp_path / "g2", src, dst, P=2)
    # engine-side quotient over the same assignment
    t = pa.table({"vid": pa.array(sorted(asg), pa.int64()),
                  "seed_vid": pa.array(
                      [asg[v][1] for v in sorted(asg)], pa.int64())})
    assign = rd.from_arrow(t)
    ed = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))
    asg_s = assign.map_batches(
        lambda b: pa.table({"src": b.column("vid"),
                            "ra": b.column("seed_vid")}),
        batch_format="pyarrow")
    asg_d = assign.map_batches(
        lambda b: pa.table({"dst": b.column("vid"),
                            "rb": b.column("seed_vid")}),
        batch_format="pyarrow")
    tagged = join(join(ed, asg_s, on="src", broadcast=False),
                  asg_d, on="dst", broadcast=False)

    def _pairs(b):
        ra, rb = np_col(b, "ra"), np_col(b, "rb")
        return pa.table({
            "sa": pa.array(np.minimum(ra, rb), pa.int64()),
            "sb": pa.array(np.maximum(ra, rb), pa.int64()),
            "one": pa.array(np.ones(len(ra), np.int64))})

    agg = grouped_pandas_agg(
        tagged.map_batches(_pairs, batch_format="pyarrow"),
        keys=["sa", "sb"], aggs={"n": ("one", "sum")},
        key_fn=lambda b: np_col(b, "sa") * np.int64(97) + np_col(b, "sb"))
    got = {(r["sa"], r["sb"]): int(r["n"]) for r in agg.take_all()}
    assert got == want
