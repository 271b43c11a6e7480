"""Independent-cascade influence spread (algorithms.icm.ic_spread).

Brute-force reference: rebuild each deterministic live-edge sample
with the same splitmix rule and run a plain numpy BFS per (sample,
seed).  Plus: p=1 reduces to plain k-hop reach, p→0 leaves only the
seeds, and block layout cannot change anything.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.algorithms.icm import ic_spread
from essentials_rd.util import hash64


def _edges_table(n_v: int, m: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_v, m * 2)
    dst = rng.integers(0, n_v, m * 2)
    keep = src < dst
    src, dst = src[keep][:m], dst[keep][:m]
    pairs = np.unique(src.astype(np.int64) * n_v + dst.astype(np.int64))
    return pa.table({"src": pa.array(pairs // n_v, pa.int64()),
                     "dst": pa.array(pairs % n_v, pa.int64())})


def _brute(tbl, seeds, R, p_num, p_den, hops, seed):
    s = np.asarray(tbl["src"], np.int64)
    d = np.asarray(tbl["dst"], np.int64)
    u = np.concatenate([s, d]).view(np.uint64)
    v = np.concatenate([d, s]).view(np.uint64)
    thr = np.uint64((p_num << 64) // p_den - 1)
    out = {}
    for r in range(R):
        mix = np.uint64(((seed + r) * 0x9E3779B97F4A7C15) % (1 << 64))
        with np.errstate(over="ignore"):
            key = (u << np.uint64(32)) + v + mix
        keep = hash64(key.view(np.int64)).view(np.uint64) < thr
        lu, lv = u[keep].astype(np.int64), v[keep].astype(np.int64)
        for si, sv in enumerate(seeds):
            reached = {int(sv)}
            frontier = {int(sv)}
            for _ in range(hops):
                nxt = {int(b) for a, b in zip(lu, lv)
                       if int(a) in frontier and int(b) not in reached}
                reached |= nxt
                frontier = nxt
            out[(r, int(sv))] = len(reached)
    return out


def test_matches_bruteforce(ray_session):
    tbl = _edges_table(40, 120, 1)
    seeds = np.array([3, 7, 11], np.int64)
    got = ic_spread(rd.from_arrow(tbl).repartition(5), seeds,
                    n_samples=4, p_num=1, p_den=3, hops=3, seed=2)
    ref = _brute(tbl, seeds, 4, 1, 3, 3, 2)
    rows = got.to_pylist()
    assert len(rows) == 12
    for r in rows:
        assert ref[(r["sample"], r["seed"])] == r["n_reached"]


def test_p_one_is_khop_reach_and_p_tiny_is_seeds_only(ray_session):
    # path graph 0-1-2-3-4-5: p=1 → seed 0 reaches 0..3 in 3 hops
    tbl = pa.table({"src": pa.array([0, 1, 2, 3, 4], pa.int64()),
                    "dst": pa.array([1, 2, 3, 4, 5], pa.int64())})
    got = ic_spread(rd.from_arrow(tbl), np.array([0], np.int64),
                    n_samples=2, p_num=1, p_den=1, hops=3, seed=5)
    assert all(r["n_reached"] == 4 for r in got.to_pylist())
    tiny = ic_spread(rd.from_arrow(tbl), np.array([0, 5], np.int64),
                     n_samples=2, p_num=1, p_den=1 << 40, hops=3, seed=5)
    assert all(r["n_reached"] == 1 for r in tiny.to_pylist())


def _brute_greedy(tbl, cands, k, R, p_num, p_den, hops, seed):
    """Reference greedy: materialize per-(sample, candidate) reach SETS
    and run the marginal-coverage argmax directly."""
    s = np.asarray(tbl["src"], np.int64)
    d = np.asarray(tbl["dst"], np.int64)
    u = np.concatenate([s, d]).view(np.uint64)
    v = np.concatenate([d, s]).view(np.uint64)
    thr = np.uint64((p_num << 64) // p_den - 1)
    cover = {}
    for r in range(R):
        mix = np.uint64(((seed + r) * 0x9E3779B97F4A7C15) % (1 << 64))
        with np.errstate(over="ignore"):
            key = (u << np.uint64(32)) + v + mix
        keep = hash64(key.view(np.int64)).view(np.uint64) < thr
        lu, lv = u[keep].astype(np.int64), v[keep].astype(np.int64)
        for ci, cv in enumerate(cands):
            reached = {int(cv)}
            frontier = {int(cv)}
            for _ in range(hops):
                nxt = {int(b) for a, b in zip(lu, lv)
                       if int(a) in frontier and int(b) not in reached}
                reached |= nxt
                frontier = nxt
            cover[(r, ci)] = {(r, x) for x in reached}
    picks, covered, pool = [], set(), list(range(len(cands)))
    for rank in range(1, k + 1):
        gains = [(len(set.union(*(cover[(r, ci)] for r in range(R)))
                      - covered), -cands[ci], ci) for ci in pool]
        gains.sort(reverse=True)
        g, _, ci = gains[0]
        picks.append((rank, int(cands[ci]), g))
        covered |= set.union(*(cover[(r, ci)] for r in range(R)))
        pool.remove(ci)
    return picks


def test_greedy_matches_bruteforce(ray_session):
    from essentials_rd.algorithms.icm import influence_seeds

    tbl = _edges_table(40, 150, 2)
    cands = np.array([1, 4, 9, 16, 25], np.int64)
    got = influence_seeds(rd.from_arrow(tbl).repartition(4), cands, k=3,
                          n_samples=3, p_num=1, p_den=2, hops=2, seed=6)
    ref = _brute_greedy(tbl, cands, 3, 3, 1, 2, 2, 6)
    assert [(r["rank"], r["seed"], r["gain"])
            for r in got.to_pylist()] == ref


def test_greedy_no_duplicate_picks_when_gains_zero(ray_session):
    # two isolated vertices as candidates: every gain after rank 1 is
    # that candidate's own (sample, self) coverage; with p≈0 each
    # candidate covers exactly itself — picks must still be distinct
    tbl = pa.table({"src": pa.array([0], pa.int64()),
                    "dst": pa.array([1], pa.int64())})
    from essentials_rd.algorithms.icm import influence_seeds

    got = influence_seeds(rd.from_arrow(tbl), np.array([0, 1], np.int64),
                          k=2, n_samples=2, p_num=1, p_den=1 << 40,
                          hops=2, seed=3).to_pylist()
    assert [r["seed"] for r in got] == [0, 1]
    assert [r["gain"] for r in got] == [2, 2]  # 2 samples × self


def test_layout_invariance(ray_session):
    tbl = _edges_table(30, 80, 9)
    seeds = np.array([1, 2], np.int64)
    a = ic_spread(rd.from_arrow(tbl), seeds, n_samples=3, hops=2,
                  seed=4).to_pylist()
    b = ic_spread(rd.from_arrow(tbl).repartition(7), seeds, n_samples=3,
                  hops=2, seed=4, num_buckets=3).to_pylist()
    key = lambda r: (r["sample"], r["seed"])
    assert sorted(a, key=key) == sorted(b, key=key)
