"""pmi_bigrams (textops.py) vs a Python brute force: exact quantized
PMI ranking, planted collocation wins over frequent-but-independent
pairs, support threshold, layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.textops import pmi_bigrams

K, MIN = 10, 3


def _ds(texts, parts=1):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(list(texts), pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _brute(texts):
    from collections import Counter
    uni, bg = Counter(), Counter()
    for t in texts:
        toks = t.split(" ")
        uni.update(toks)
        bg.update(a + " " + b for a, b in zip(toks, toks[1:]))
    nu, nb = sum(uni.values()), sum(bg.values())
    rows = []
    for g, co in bg.items():
        if co < MIN:
            continue
        w1, w2 = g.split(" ", 1)
        q = co * nu * nu * 1_000_000 // (nb * uni[w1] * uni[w2])
        rows.append((g, co, uni[w1], uni[w2], q))
    rows.sort(key=lambda r: (-r[4], r[0]))
    return rows[:K]


def _got(texts, parts=1):
    t = pmi_bigrams(_ds(texts, parts), k=K, min_count=MIN)
    return list(zip(*[t.column(c).to_pylist()
                      for c in ("bg", "co", "ca", "cb", "q")]))


def test_matches_bruteforce():
    rng = np.random.default_rng(5)
    vocab = ["data", "ray", "graph", "the", "of", "york", "new"]
    texts = []
    for _ in range(40):
        toks = [vocab[i] for i in rng.integers(0, len(vocab), 30)]
        texts.append(" ".join(toks))
    assert _got(texts) == _brute(texts)


def test_planted_collocation_beats_frequent_pair():
    # 'qx zv' always co-occur (perfect collocation, rare);
    # 'the of' co-occurs often but both words are everywhere
    rng = np.random.default_rng(2)
    texts = []
    for i in range(30):
        filler = ["the", "of"] * 10
        rng.shuffle(filler)
        toks = filler + ["qx", "zv"]
        texts.append(" ".join(toks))
    got = _got(texts)
    assert got == _brute(texts)
    assert got[0][0] == "qx zv"  # top PMI is the planted collocation
    ranks = {g: i for i, (g, *_ ) in enumerate(got)}
    assert ranks["qx zv"] < ranks.get("the of", K)


def test_support_threshold_and_layout():
    texts = ["a b c", "a b d", "a b e", "x y"]  # 'x y' support 1 < MIN
    got = _got(texts)
    assert all(g != "x y" for g, *_ in got)
    assert ("a b", 3, 3, 3, None)[:2] == (got[0][0], got[0][1])
    assert _got(texts, parts=1) == _got(texts, parts=5)
