"""modularity_move_round (algorithms/louvain.py) vs a brute-force
reference of the synchronized integer-exact gain argmax; planted
two-clique sanity; partition invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.algorithms.louvain import modularity_move_round

from .conftest import edges_ds, small_graph


def _ref(vids, src, dst, lab):
    n = len(vids)
    pos = {int(v): i for i, v in enumerate(vids)}
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[pos[int(a)]].append(pos[int(b)])
        adj[pos[int(b)]].append(pos[int(a)])
    deg = np.array([len(a) for a in adj], np.int64)
    m = len(src)
    ulab = np.unique(lab)
    d_c = {int(c): 0 for c in ulab}
    for i in range(n):
        d_c[int(lab[i])] += int(deg[i])
    out = lab.copy()
    for i in range(n):
        if not adj[i]:
            continue
        evc = {int(lab[i]): 0}
        for j in adj[i]:
            evc[int(lab[j])] = evc.get(int(lab[j]), 0) + 1
        best = None
        for c, e in sorted(evc.items()):
            dd = d_c[c] - (int(deg[i]) if c == int(lab[i]) else 0)
            s = 2 * m * e - int(deg[i]) * dd
            if best is None or s > best[0]:
                best = (s, c)
        out[i] = best[1]
    return out


def _random(n=50, m=130, seed=29):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(src[keep] * np.int64(n) + dst[keep])
    return pairs // n, pairs % n


def test_move_round_matches_reference(tmp_path):
    src, dst = _random()
    g = small_graph(tmp_path, src, dst, P=3, symmetrize=True)
    vids = np.unique(np.r_[src, dst])
    rng = np.random.default_rng(5)
    lab = vids[rng.integers(0, len(vids), len(vids))]  # random partition
    t = modularity_move_round(g, edges_ds(src, dst), vids, lab,
                              num_buckets=4)
    assert np.array_equal(np.asarray(t["label"]), _ref(vids, src, dst, lab))
    assert np.array_equal(np.asarray(t["vid"]), vids)


def test_move_round_heals_split_cliques(tmp_path):
    # two 5-cliques joined by one bridge; partition splits each clique
    # in half — one move round reunites every clique member
    import itertools

    e = []
    for base in (0, 5):
        e += [(base + a, base + b)
              for a, b in itertools.combinations(range(5), 2)]
    e.append((4, 5))
    src = np.array([a for a, _ in e], np.int64)
    dst = np.array([b for _, b in e], np.int64)
    g = small_graph(tmp_path, src, dst, P=2, symmetrize=True)
    vids = np.arange(10, dtype=np.int64)
    lab = np.array([0, 0, 0, 1, 1, 5, 5, 5, 6, 6], np.int64)
    t = modularity_move_round(g, edges_ds(src, dst), vids, lab,
                              num_buckets=2)
    got = np.asarray(t["label"])
    # the minority halves join the majorities: clique 1 reunites under
    # label 0; in clique 2 the bridge vertex's inflated community
    # degree keeps the round from full reunion (a real property of
    # synchronized moves) — the reference pins the exact outcome
    assert len(set(got[:5].tolist())) == 1
    assert np.array_equal(got, _ref(vids, src, dst, lab))


def test_move_round_bucket_invariance(tmp_path):
    src, dst = _random(seed=31)
    vids = np.unique(np.r_[src, dst])
    lab = vids.copy()  # singleton partition (Louvain's usual start)
    a = modularity_move_round(
        small_graph(tmp_path / "a", src, dst, P=1, symmetrize=True),
        edges_ds(src, dst).repartition(1), vids, lab, num_buckets=2)
    b = modularity_move_round(
        small_graph(tmp_path / "b", src, dst, P=6, symmetrize=True),
        edges_ds(src, dst).repartition(9), vids, lab, num_buckets=16)
    assert a.equals(b)
    assert np.array_equal(np.asarray(a["label"]), _ref(vids, src, dst, lab))


def _ref_weighted(vids, src, dst, w):
    """Singleton-seeded weighted move round, brute force."""
    pos = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    kw = np.zeros(n, np.int64)
    for a, b, x in zip(src, dst, w):
        if a == b:
            kw[pos[int(a)]] += 2 * x
        else:
            kw[pos[int(a)]] += x
            kw[pos[int(b)]] += x
    W = int(kw.sum()) // 2
    out = vids.copy()
    for i, v in enumerate(vids):
        evc = {int(v): 0}
        for a, b, x in zip(src, dst, w):
            if a == b:
                continue
            if int(a) == int(v):
                evc[int(b)] = evc.get(int(b), 0) + int(x)
            elif int(b) == int(v):
                evc[int(a)] = evc.get(int(a), 0) + int(x)
        if len(evc) == 1:
            continue
        best = None
        for c, e in sorted(evc.items()):
            dd = int(kw[pos[c]]) - (int(kw[i]) if c == int(v) else 0)
            s = 2 * W * e - int(kw[i]) * dd
            if best is None or s > best[0]:
                best = (s, c)
        out[i] = best[1]
    return out


def _wedges(src, dst, w):
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64()),
        "weight": pa.array(np.asarray(w, np.int64), pa.int64()),
    }))


def test_weighted_move_round_matches_reference():
    from essentials_rd.algorithms.louvain import (
        modularity_move_round_weighted)

    rng = np.random.default_rng(33)
    n = 30
    src, dst = _random(n=n, m=80, seed=33)
    w = rng.integers(1, 9, len(src)).astype(np.int64)
    # add self-loops (coarse graphs always have them)
    sl = np.array([0, 3, 7], np.int64)
    src = np.r_[src, sl]
    dst = np.r_[dst, sl]
    w = np.r_[w, np.array([5, 2, 9], np.int64)]
    t = modularity_move_round_weighted(_wedges(src, dst, w), num_buckets=4)
    vids = np.unique(np.r_[src, dst])
    assert np.array_equal(np.asarray(t["vid"]), vids)
    assert np.array_equal(np.asarray(t["label"]),
                          _ref_weighted(vids, src, dst, w))


def test_weighted_round_reduces_to_unweighted_on_unit_weights(tmp_path):
    from essentials_rd.algorithms.louvain import (
        modularity_move_round_weighted)

    src, dst = _random(seed=34)
    vids = np.unique(np.r_[src, dst])
    uw = modularity_move_round(
        small_graph(tmp_path, src, dst, P=3, symmetrize=True),
        edges_ds(src, dst), vids, vids.copy(), num_buckets=4)
    ww = modularity_move_round_weighted(
        _wedges(src, dst, np.ones(len(src), np.int64)), num_buckets=8)
    assert uw.equals(ww)
