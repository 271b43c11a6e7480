"""gini_split_table vs a brute-force per-threshold Gini computed the
textbook way (probability form), plus block-layout invariance and a
perfect-split hand case."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.mlfit import gini_split_table


def _ds(bands, labels, parallelism=1):
    t = pa.table({"b": pa.array(bands, pa.int64()),
                  "y": pa.array(labels, pa.int64())})
    d = rd.from_arrow(t)
    if parallelism > 1:
        d = d.repartition(parallelism)
    return d


def _run(bands, labels, parallelism=1):
    return gini_split_table(
        _ds(bands, labels, parallelism),
        lambda t: t.column("b").to_numpy(zero_copy_only=False),
        lambda t: t.column("y").to_numpy(zero_copy_only=False),
    )


def _brute(bands, labels):
    bands = np.asarray(bands)
    labels = np.asarray(labels)
    out = []
    for t in sorted(set(bands))[:-1]:
        lm = bands <= t
        nl, nr = int(lm.sum()), int((~lm).sum())
        pl, pr = int(labels[lm].sum()), int(labels[~lm].sum())

        def gini(n, p):
            if n == 0:
                return 0.0
            fp, fq = p / n, (n - p) / n
            return 1.0 - fp * fp - fq * fq

        g = (nl * gini(nl, pl) + nr * gini(nr, pr)) / len(bands)
        out.append((t, nl, pl, nr, pr, g))
    return out


def test_matches_bruteforce():
    rng = np.random.default_rng(29)
    bands = rng.integers(0, 10, 400)
    # make low bands mostly positive so the split is informative
    labels = (rng.random(400) < np.where(bands < 4, 0.8, 0.2)) \
        .astype(np.int64)
    got = _run(bands.tolist(), labels.tolist()).to_pydict()
    want = _brute(bands, labels)
    assert got["thr"] == [w[0] for w in want]
    assert got["n_left"] == [w[1] for w in want]
    assert got["pos_left"] == [w[2] for w in want]
    assert got["n_right"] == [w[3] for w in want]
    assert got["pos_right"] == [w[4] for w in want]
    for g, w in zip(got["gini"], want):
        assert abs(g - w[5]) < 1e-12
    # the best split must sit at the planted boundary
    best = got["thr"][int(np.argmin(got["gini"]))]
    assert best == 3


def test_block_layout_invariance():
    rng = np.random.default_rng(31)
    bands = rng.integers(0, 8, 300).tolist()
    labels = rng.integers(0, 2, 300).tolist()
    a = _run(bands, labels, parallelism=1).to_pydict()
    b = _run(bands, labels, parallelism=7).to_pydict()
    assert a == b


def test_perfect_split_gini_zero():
    bands = [0] * 50 + [1] * 50
    labels = [1] * 50 + [0] * 50
    got = _run(bands, labels).to_pydict()
    assert got["thr"] == [0]
    assert got["gini"] == [0.0]
