"""HyperBall (algorithms/hyperball.py) vs a dense NumPy reference:
register-exact equality per round (the sketch is deterministic given
the input — splitmix64 ranks, max-merge), partition invariance, and
estimate accuracy against the exact ≤r-hop ball size."""

import numpy as np
import pyarrow as pa

from essentials_rd.algorithms.hyperball import hyperball, hyperball_estimates
from essentials_rd.ops import _hll_rank
from essentials_rd.util import hash64

from .conftest import edges_ds, small_graph


def _random_edges(n=40, m=110, seed=11):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(src[keep] * np.int64(n) + dst[keep])
    return pairs // n, pairs % n


def _dense_reference(vids, src, dst, p, rounds):
    """Exact ball membership by BFS over the symmetrized graph, then
    the register table each ball implies: reg[v][i] = max splitmix
    rank over ball members hashing to register i."""
    n = len(vids)
    pos = {int(v): i for i, v in enumerate(vids)}
    adj = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        adj[pos[int(s)]].add(pos[int(d)])
        adj[pos[int(d)]].add(pos[int(s)])
    balls = [{i} for i in range(n)]
    for _ in range(rounds):
        balls = [set().union(b, *(balls[j] for j in adj[i])) if adj[i] else set(b)
                 for i, b in enumerate(balls)]
    idx, rank = _hll_rank(hash64(np.asarray(vids, np.int64)), p)
    out = {}
    for i in range(n):
        regs = {}
        for j in balls[i]:
            r = int(rank[j]) if regs.get(int(idx[j]), 0) < int(rank[j]) else regs.get(int(idx[j]), 0)
            regs[int(idx[j])] = max(regs.get(int(idx[j]), 0), int(rank[j]))
        out[int(vids[i])] = regs
    return out, {int(vids[i]): len(balls[i]) for i in range(n)}


def _sparse_to_dict(t: pa.Table):
    vid = np.asarray(t["vid"])
    reg = np.asarray(t["reg"])
    rho = np.asarray(t["rho"])
    out = {}
    for v, r, q in zip(vid, reg, rho):
        out.setdefault(int(v), {})[int(r)] = int(q)
    return out


def test_hyperball_registers_match_dense_reference(tmp_path):
    src, dst = _random_edges()
    g = small_graph(tmp_path / "hb", src, dst, P=3, symmetrize=False)
    t = hyperball(g, edges_ds(src, dst), p=4, rounds=2, num_buckets=8)
    got = _sparse_to_dict(t)
    vids = np.unique(np.r_[src, dst])
    ref, _ = _dense_reference(vids, src, dst, p=4, rounds=2)
    assert got == ref


def test_hyperball_partition_invariance(tmp_path):
    src, dst = _random_edges(seed=12)
    a = hyperball(small_graph(tmp_path / "a", src, dst, P=2, symmetrize=False),
                  edges_ds(src, dst).repartition(1), p=4, rounds=2,
                  num_buckets=4)
    b = hyperball(small_graph(tmp_path / "b", src, dst, P=5, symmetrize=False),
                  edges_ds(src, dst).repartition(7), p=4, rounds=2,
                  num_buckets=16)
    assert a.equals(b)


def test_hyperball_estimates_track_exact_ball(tmp_path):
    src, dst = _random_edges(n=60, m=150, seed=13)
    g = small_graph(tmp_path / "est", src, dst, P=3, symmetrize=False)
    t = hyperball(g, edges_ds(src, dst), p=6, rounds=2, num_buckets=8)
    est = hyperball_estimates(t, p=6)
    vids = np.unique(np.r_[src, dst])
    _, exact = _dense_reference(vids, src, dst, p=6, rounds=2)
    ev = np.asarray(est["vid"])
    ee = np.asarray(est["ball_est"])
    rel = np.array([abs(ee[i] - exact[int(v)]) / max(exact[int(v)], 1)
                    for i, v in enumerate(ev)])
    # p=6 linear-counting regime on small balls: tight on average,
    # bounded worst-case.
    assert rel.mean() < 0.15 and rel.max() < 0.5
