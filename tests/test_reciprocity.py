"""adjacent_rank_pairs + directed_reciprocity vs brute-force
references, tie handling, and bucket-count invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import directed_reciprocity
from essentials_rd.windows import adjacent_rank_pairs


def _table(keys, ranks, vals):
    return rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "r": pa.array(ranks, pa.int64()),
        "p": pa.array(vals, pa.int64()),
    }))


def _brute_pairs(keys, ranks, vals):
    rows = list(zip(keys, ranks, vals))
    out = []
    for (k1, r1, v1) in rows:
        for (k2, r2, v2) in rows:
            if k1 == k2 and r2 == r1 + 1 and v1 != v2:
                out.append((v1, v2))
    return sorted(out)


def _got_pairs(ds):
    t = ds.take_all()
    return sorted((r["u"], r["v"]) for r in t)


def test_pairs_match_bruteforce_with_ties():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 12, 300).tolist()
    ranks = rng.integers(1, 5, 300).tolist()  # heavy rank ties
    vals = rng.integers(0, 25, 300).tolist()
    got = _got_pairs(adjacent_rank_pairs(
        _table(keys, ranks, vals), "k", "r", "p", num_buckets=8))
    assert got == _brute_pairs(keys, ranks, vals)


def test_pairs_bucket_invariance():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 9, 200).tolist()
    ranks = rng.integers(1, 7, 200).tolist()
    vals = rng.integers(0, 15, 200).tolist()
    a = _got_pairs(adjacent_rank_pairs(
        _table(keys, ranks, vals), "k", "r", "p", num_buckets=2))
    b = _got_pairs(adjacent_rank_pairs(
        _table(keys, ranks, vals), "k", "r", "p", num_buckets=16))
    assert a == b


def _edges(us, vs):
    return rd.from_arrow(pa.table({
        "u": pa.array(us, pa.int64()),
        "v": pa.array(vs, pa.int64()),
    }))


def _brute_recip(us, vs):
    e = set(zip(us, vs))
    n_recip = sum((v, u) in e for (u, v) in e)
    return len(e), n_recip


def test_reciprocity_matches_bruteforce():
    rng = np.random.default_rng(7)
    us = rng.integers(0, 30, 500).tolist()
    vs = rng.integers(0, 30, 500).tolist()
    keep = [(u, v) for u, v in zip(us, vs) if u != v]
    us, vs = [p[0] for p in keep], [p[1] for p in keep]
    t = directed_reciprocity(_edges(us, vs), num_buckets=8)
    n_edges, n_recip = _brute_recip(us, vs)
    d = t.to_pydict()
    assert d["n_edges"] == [n_edges]
    assert d["n_recip"] == [n_recip]
    assert d["n_mutual_pairs"] == [n_recip // 2]
    assert abs(d["reciprocity"][0] - n_recip / n_edges) == 0.0


def test_reciprocity_hand_cases():
    # fully mutual 2-cycle
    d = directed_reciprocity(_edges([1, 2], [2, 1])).to_pydict()
    assert (d["n_edges"], d["n_recip"], d["reciprocity"]) == \
        ([2], [2], [1.0])
    # pure DAG: no reciprocation
    d = directed_reciprocity(_edges([1, 2, 3], [2, 3, 4])).to_pydict()
    assert (d["n_edges"], d["n_recip"], d["reciprocity"]) == \
        ([3], [0], [0.0])
    # duplicate edges collapse before counting
    d = directed_reciprocity(
        _edges([1, 1, 2, 2], [2, 2, 1, 1])).to_pydict()
    assert (d["n_edges"], d["n_recip"]) == ([2], [2])
