"""textrank_tokens vs a numpy weighted-PageRank brute force on the
same bigram graph, plus the keyword property: a token co-occurring
with MANY distinct tokens outranks one repeated inside a single
frequent pair."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.textops import textrank_tokens


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


def _brute_pr(texts, min_count=5, alpha=0.85, iters=8):
    from collections import Counter

    bg = Counter()
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks[:-1], toks[1:]):
            bg[(a, b)] += 1
    ce = Counter()
    for (a, b), c in bg.items():
        if c >= min_count and a != b:
            ce[(min(a, b), max(a, b))] += c
    verts = sorted({t for e in ce for t in e})
    idx = {t: i for i, t in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for (u, v), w in ce.items():
        W[idx[u], idx[v]] += w
        W[idx[v], idx[u]] += w
    wsum = W.sum(axis=1)
    p = np.full(n, 1.0 / n)
    for _ in range(iters):
        out = np.zeros(n)
        for i in range(n):
            if wsum[i] > 0:
                out += p[i] * W[i] / wsum[i]
        dang = p[wsum == 0].sum()
        p = (1 - alpha) / n + alpha * (out + dang / n)
    return verts, p


def test_textrank_matches_numpy_reference():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(5, 25)))
             for _ in range(120)]
    out = textrank_tokens(_docs(texts), k=10, min_count=5).to_pydict()
    verts, p = _brute_pr(texts)
    want = sorted(range(len(verts)),
                  key=lambda i: (-round(p[i], 6), verts[i]))[:10]
    assert out["token"] == [verts[i] for i in want]
    for tok, score in zip(out["token"], out["pagerank"]):
        assert abs(score - p[verts.index(tok)]) < 2e-6


def test_hub_token_beats_frequent_pair():
    # 'hub' adjacent to 12 distinct partners (6 occurrences each);
    # 'loner' only inside one massively repeated pair
    texts = []
    for i in range(12):
        texts += [f"hub p{i}"] * 6
    texts += ["loner mate"] * 72  # same total occurrences as hub
    out = textrank_tokens(_docs(texts), k=30, min_count=5).to_pydict()
    r = {t: i for i, t in enumerate(out["token"])}
    assert r["hub"] < r["loner"]


def test_support_filter_drops_rare_edges():
    texts = ["a b"] * 10 + ["rare pair"] * 2  # 'rare pair' below support
    out = textrank_tokens(_docs(texts), k=10, min_count=5).to_pydict()
    assert set(out["token"]) == {"a", "b"}
