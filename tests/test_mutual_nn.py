"""mutual_nn_pairs (ann.py) vs a numpy brute force: mutual 1-NN
detection, asymmetric NN excluded, planted twin pairs found, layout
invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ann import mutual_nn_pairs


def _ds(vecs, parts=1):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _brute(vecs):
    from essentials_rd.pipelines import round_half_up
    m = np.array(vecs, np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = m @ m.T
    nn = {}
    for i in range(len(m)):
        row = round_half_up(s[i].copy(), 6)
        row[i] = -2
        order = np.lexsort((np.arange(len(m)), -row))
        nn[i] = int(order[0])
    return sorted((i, j) for i, j in nn.items()
                  if i < j and nn[j] == i)


def _got(vecs, parts=1):
    t = mutual_nn_pairs(_ds(vecs, parts))
    return list(zip(t.column("a").to_pylist(),
                    t.column("b").to_pylist()))


def test_planted_twins_and_bruteforce():
    rng = np.random.default_rng(3)
    vecs = [v / np.linalg.norm(v) for v in rng.normal(0, 1, (30, 8))]
    # plant two twin pairs: 30~0 and 31~5
    vecs.append(vecs[0] + rng.normal(0, 1e-3, 8))
    vecs.append(vecs[5] + rng.normal(0, 1e-3, 8))
    got = _got(vecs)
    assert (0, 30) in got and (5, 31) in got
    assert got == _brute(vecs)


def test_chain_is_not_mutual():
    # a->b->c chain where only (b,c) is mutual
    vecs = [[1.0, 0.0], [0.9, 0.4359], [0.8, 0.6]]
    got = _got(vecs)
    assert got == _brute(vecs)


def test_layout_invariant():
    rng = np.random.default_rng(9)
    vecs = rng.normal(0, 1, (40, 6))
    assert _got(vecs, 1) == _got(vecs, 7) == _brute(list(vecs))
