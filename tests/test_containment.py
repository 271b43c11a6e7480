"""Asymmetric containment pairs (textops.containment_pairs) vs a
brute-force set reference: a short doc fully quoted inside a long one
is caught src→dst but NOT dst→src (the asymmetry Jaccard misses),
short-doc whole-text fallback, and layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.textops import containment_pairs


def _ds(texts, blocks=1):
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _shingle_set(text, k=3):
    toks = text.split(" ")
    if len(toks) < k:
        return {text}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _reference(texts, num, den, k=3):
    sets = [_shingle_set(t, k) for t in texts]
    out = set()
    for i in range(len(texts)):
        for j in range(len(texts)):
            if i == j:
                continue
            inter = len(sets[i] & sets[j])
            if inter * den >= num * len(sets[i]):
                out.add((i, j, inter, len(sets[i])))
    return out


def _got(texts, num=4, den=5, blocks=1):
    t = containment_pairs(_ds(texts, blocks), num=num, den=den,
                          num_buckets=4).to_pandas()
    return set(map(tuple, t[["src", "dst", "inter",
                             "n_src"]].to_numpy()))


def test_containment_asymmetry_and_reference():
    quote = "the quick brown fox jumps over the lazy dog"
    texts = [
        quote,                                            # 0: short
        "someone wrote " + quote + " and much more text follows "
        "here with many extra tokens to dilute the jaccard value",
        "completely unrelated content about graph engines",  # 2
        "tiny",                                           # 3: fallback
        "tiny",                                           # 4: dup of 3
    ]
    got = _got(texts)
    want = _reference(texts, 4, 5)
    assert got == want
    pairs = {(s, d) for s, d, _, _ in got}
    assert (0, 1) in pairs and (1, 0) not in pairs   # asymmetry
    assert (3, 4) in pairs and (4, 3) in pairs       # whole-text dup


def test_containment_layout_invariance():
    rng = np.random.default_rng(12)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(2, 25)))
             for _ in range(40)]
    assert _got(texts, 1, 5, blocks=1) == _got(texts, 1, 5, blocks=7)
    r = _reference(texts, 1, 5)
    assert r and _got(texts, 1, 5) == r
