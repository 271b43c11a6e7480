"""greedy_cover (textops.py) vs a brute-force greedy reference on the
same SQL-reproducible token keys; ties; k exceeding useful picks;
layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.textops import _flat_token_keys_oracle, greedy_cover


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64),
                           pa.int64()),
        "text": pa.array(list(texts), pa.string()),
    }))


def _ref(texts, k):
    sets = []
    for t in texts:
        rep, keys = _flat_token_keys_oracle(pd.Series([t]))
        sets.append(set(keys.view(np.int64).tolist()))
    covered, sel, out = set(), set(), []
    for r in range(k):
        best = None
        for i, s in enumerate(sets):
            if i in sel:
                continue
            g = len(s - covered)
            if best is None or g > best[0] or (g == best[0] and i < best[1]):
                best = (g, i)
        if best is None:
            break
        out.append((r + 1, best[1], best[0]))
        covered |= sets[best[1]]
        sel.add(best[1])
    return out


def _got(t):
    return list(zip(t["round"].to_pylist(), t["doc_id"].to_pylist(),
                    t["gain"].to_pylist()))


def test_greedy_cover_matches_reference():
    texts = [
        "a b c d e", "a b c", "f g", "f g h i", "j",
        "a b c d e", "k l m n o p", "", "k l", "q r s",
    ]
    assert _got(greedy_cover(_docs(texts), k=5)) == _ref(texts, 5)


def test_greedy_cover_exhaustion_and_layout():
    texts = ["x y", "x", "y", "z"]
    ref = _ref(texts, 8)
    a = greedy_cover(_docs(texts), k=8)
    b = greedy_cover(_docs(texts).repartition(3), k=8)
    assert _got(a) == ref
    assert _got(b) == ref
    # once every doc is selected the loop stops (gain -1 sentinel)
    assert len(ref) == 4


def test_greedy_cover_random_vs_reference():
    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 12)).tolist())
             for _ in range(30)]
    assert _got(greedy_cover(_docs(texts), k=6)) == _ref(texts, 6)
