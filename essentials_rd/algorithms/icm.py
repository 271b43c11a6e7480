"""Independent-cascade influence spread (Kempe, Kleinberg & Tardos,
KDD 2003) via deterministic live-edge Monte Carlo.

The IC model: each DIRECTED edge (u, v) is "live" with probability p,
independently; a seed set influences exactly the vertices reachable
from it through live edges.  The classic estimator materializes R
live-edge samples and averages reach sizes.  Here each sample is a
pure edge function — edge (u, v) is live in sample r iff
``splitmix64(u·2³² + v + (seed + r)·golden) < p·2⁶⁴`` — so sampling is
a stateless zero-shuffle filter, identical at any block layout or
cluster size, and the whole computation replays bit-for-bit in SQL
(the correctness oracle) with no RNG state anywhere.

Reach is computed for ALL candidate seeds and ALL samples at once: one
bitmask per (sample, vertex) with bit i set iff seed i reaches the
vertex — so R samples × S seeds cost the same exchanges as a single
BFS.  Each hop is the repo's standard two-exchange round (the
wl_colors / superstep message discipline):

1. scatter: live edges union'd with the (r, vid, mask) frontier state,
   bucketed on the vertex carrying the mask; per bucket a searchsorted
   lookup emits (r, dst, mask) messages — no Python loop over rows;
2. gather: messages union'd with the old state, bucketed on the
   receiving vertex; ``bitwise_or.reduceat`` folds per (vid, r).

State holds only reached vertices (mask ≠ 0), so early rounds move
frontier-sized tables, not |V|·R rows.  ``hops`` bounds the unroll —
the estimator the SQL twin can replay exactly; at 100 TB run it to
fixpoint instead (rounds until the state stops changing, the CC-engine
stopping rule) — the round body is identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..ops import DEFAULT_BUCKETS, hash_bucket_agg
from ..util import hash64, np_col

_EMPTY = pa.table({
    "r": pa.array([], pa.int64()),
    "a": pa.array([], pa.int64()),
    "b": pa.array([], pa.int64()),
    "m": pa.array([], pa.int64()),
})


def ic_reach_masks(
    edges: rd.Dataset,
    seeds: np.ndarray,
    n_samples: int = 6,
    p_num: int = 1,
    p_den: int = 4,
    hops: int = 3,
    seed: int = 11,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """The shared cascade state: rows ``(r, a, m)`` with bit i of ``m``
    set iff candidate seed i reaches vertex ``a`` within ``hops`` live
    hops of sample ``r`` (rows exist only where m ≠ 0).

    ``edges``: canonical undirected pairs (src < dst); the cascade runs
    on both directions, each filtered independently (the IC contract).
    ``seeds``: candidate seed vertex ids (≤ 62 so masks stay int64).
    """
    S, R = len(seeds), int(n_samples)
    assert 0 < S <= 62 and 0 < R <= 16
    seeds = np.asarray(seeds, dtype=np.int64)
    thr = np.uint64((p_num << 64) // p_den - 1)
    rmix = np.array(
        [((seed + r) * 0x9E3779B97F4A7C15) % (1 << 64) for r in range(R)],
        np.uint64,
    )

    def _live(t: pa.Table) -> pa.Table:
        s0 = np_col(t, "src").astype(np.int64).view(np.uint64)
        d0 = np_col(t, "dst").astype(np.int64).view(np.uint64)
        assert len(s0) == 0 or max(s0.max(), d0.max()) < 1 << 32
        u = np.concatenate([s0, d0])
        v = np.concatenate([d0, s0])
        outs = []
        for r in range(R):
            with np.errstate(over="ignore"):
                key = (u << np.uint64(32)) + v + rmix[r]
            keep = hash64(key.view(np.int64)).view(np.uint64) < thr
            outs.append((r, u[keep], v[keep]))
        rr = np.concatenate(
            [np.full(len(a), r, np.int64) for r, a, _ in outs])
        aa = np.concatenate([a for _, a, _ in outs])
        bb = np.concatenate([b for _, _, b in outs])
        return pa.table({
            "r": pa.array(rr, pa.int64()),
            "a": pa.array(aa.view(np.int64), pa.int64()),
            "b": pa.array(bb.view(np.int64), pa.int64()),
            "m": pa.array(np.zeros(len(rr), np.int64), pa.int64()),
        })

    live = edges.select_columns(["src", "dst"]).map_batches(
        _live, batch_format="pyarrow").materialize()

    state = rd.from_arrow(pa.table({
        "r": pa.array(np.repeat(np.arange(R, dtype=np.int64), S), pa.int64()),
        "a": pa.array(np.tile(seeds, R), pa.int64()),
        "b": pa.array(np.full(R * S, -1, np.int64), pa.int64()),
        "m": pa.array(np.tile(1 << np.arange(S, dtype=np.int64), R),
                      pa.int64()),
    }))

    def _scatter(grp: pa.Table) -> pa.Table:
        r = np_col(grp, "r")
        a = np_col(grp, "a")
        b = np_col(grp, "b")
        m = np_col(grp, "m")
        is_state = b == -1
        sk = a[is_state] * 16 + r[is_state]
        order = np.argsort(sk, kind="stable")
        sk, sm = sk[order], m[is_state][order]
        ei = np.flatnonzero(~is_state)
        ek = a[ei] * 16 + r[ei]
        pos = np.searchsorted(sk, ek)
        ok = (pos < len(sk)) & (sk[np.minimum(pos, max(len(sk) - 1, 0))]
                                == ek) if len(sk) else np.zeros(len(ek), bool)
        hit = ei[ok]
        return pa.table({
            "r": pa.array(r[hit], pa.int64()),
            "a": pa.array(b[hit], pa.int64()),
            "b": pa.array(np.full(len(hit), -1, np.int64), pa.int64()),
            "m": pa.array(sm[pos[ok]], pa.int64()),
        })

    def _gather(grp: pa.Table) -> pa.Table:
        r = np_col(grp, "r")
        a = np_col(grp, "a")
        m = np_col(grp, "m")
        k = a * 16 + r
        order = np.argsort(k, kind="stable")
        k, r, a, m = k[order], r[order], a[order], m[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]]) \
            if len(k) else np.zeros(0, np.int64)
        mm = np.bitwise_or.reduceat(m, starts) if len(m) else m
        return pa.table({
            "r": pa.array(r[starts], pa.int64()),
            "a": pa.array(a[starts], pa.int64()),
            "b": pa.array(np.full(len(starts), -1, np.int64), pa.int64()),
            "m": pa.array(mm, pa.int64()),
        })

    key = lambda t: np_col(t, "a")
    for _ in range(hops):
        msgs = hash_bucket_agg(live.union(state), key, _scatter,
                               num_buckets=num_buckets)
        state = hash_bucket_agg(msgs.union(state), key, _gather,
                                num_buckets=num_buckets).materialize()
    return state


def ic_spread(
    edges: rd.Dataset,
    seeds: np.ndarray,
    n_samples: int = 6,
    p_num: int = 1,
    p_den: int = 4,
    hops: int = 3,
    seed: int = 11,
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """(sample, seed, n_reached) — exact reach counts of each candidate
    seed in each deterministic live-edge sample, ``hops`` rounds."""
    S, R = len(seeds), int(n_samples)
    seeds = np.asarray(seeds, dtype=np.int64)
    state = ic_reach_masks(edges, seeds, n_samples=n_samples, p_num=p_num,
                           p_den=p_den, hops=hops, seed=seed,
                           num_buckets=num_buckets)

    def _counts(t: pa.Table) -> pa.Table:
        r = np_col(t, "r")
        m = np_col(t, "m")
        cnt = np.zeros(R * S, np.int64)
        for i in range(S):
            hitr = r[(m >> i) & 1 == 1]
            cnt += np.bincount(hitr * S + i, minlength=R * S)
        return pa.table({
            "k": pa.array(np.arange(R * S, dtype=np.int64), pa.int64()),
            "c": pa.array(cnt, pa.int64()),
        })

    tot = np.zeros(R * S, np.int64)
    for row in state.map_batches(_counts, batch_format="pyarrow").take_all():
        tot[row["k"]] += row["c"]
    kk = np.arange(R * S, dtype=np.int64)
    return pa.table({
        "sample": pa.array(kk // S, pa.int64()),
        "seed": pa.array(seeds[kk % S], pa.int64()),
        "n_reached": pa.array(tot, pa.int64()),
    })


def influence_seeds(
    edges: rd.Dataset,
    candidates: np.ndarray,
    k: int,
    n_samples: int = 4,
    p_num: int = 1,
    p_den: int = 3,
    hops: int = 2,
    seed: int = 11,
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """Greedy influence maximization (the Kempe–Kleinberg–Tardos
    (1 − 1/e)-approximation for submodular spread): pick ``k`` seeds
    from ``candidates``, each round taking the candidate with the
    largest MARGINAL coverage — (sample, vertex) pairs it reaches that
    no already-picked seed reaches — summed over all live-edge samples
    (∝ the estimated expected spread).  Ties break (gain desc,
    candidate vid asc); picked candidates leave the pool.

    The whole greedy runs off ONE distributed artifact: the 2^|C|-bin
    histogram of reach-mask values (the cascade state pooled over
    samples), pre-combined per block — so after the cascade's two
    exchanges per hop, seed selection costs a 64-int driver fold and
    zero further passes over the data, ``k`` notwithstanding.

    Returns ``(rank, seed, gain)``, rank 1-based.
    """
    C = len(candidates)
    assert 0 < C <= 16 and 0 < k <= C
    candidates = np.asarray(candidates, dtype=np.int64)
    state = ic_reach_masks(edges, candidates, n_samples=n_samples,
                           p_num=p_num, p_den=p_den, hops=hops, seed=seed,
                           num_buckets=num_buckets)
    nbins = 1 << C

    def _hist(t: pa.Table) -> pa.Table:
        cnt = np.bincount(np_col(t, "m"), minlength=nbins).astype(np.int64)
        return pa.table({
            "m": pa.array(np.arange(nbins, dtype=np.int64), pa.int64()),
            "c": pa.array(cnt, pa.int64()),
        })

    hist = np.zeros(nbins, np.int64)
    for row in state.map_batches(_hist, batch_format="pyarrow").take_all():
        hist[row["m"]] += row["c"]
    masks = np.arange(nbins, dtype=np.int64)
    chosen = 0
    pool = list(range(C))
    out_rank, out_seed, out_gain = [], [], []
    for rank in range(1, k + 1):
        gains = np.array([
            int(hist[((masks >> b) & 1 == 1) & (masks & chosen == 0)].sum())
            for b in pool
        ])
        vids = candidates[pool]
        best = np.lexsort((vids, -gains))[0]
        b = pool[best]
        out_rank.append(rank)
        out_seed.append(int(candidates[b]))
        out_gain.append(int(gains[best]))
        chosen |= 1 << b
        pool.remove(b)
    return pa.table({
        "rank": pa.array(out_rank, pa.int64()),
        "seed": pa.array(out_seed, pa.int64()),
        "gain": pa.array(out_gain, pa.int64()),
    })
