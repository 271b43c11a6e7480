"""BPE merge training (textops.bpe_train_rounds) vs a straight-line
Python reference sharing the semantics contract: whitespace words,
overlapping pair COUNTS, non-overlapping leftmost APPLY, winner by
(count desc, pair asc), placeholder chr(0xE000+r).  Plus a planted
corpus with a known merge chain and block-layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.textops import bpe_train_rounds


def _docs_ds(texts, n_blocks=1):
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _reference(texts, rounds):
    words = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    # keep as a LIST of (word, cnt) rows — two words may collapse to
    # the same string after a merge and must keep separate rows, like
    # the engine and the SQL twin do
    rows = list(words.items())
    merges = []
    for r in range(rounds):
        counts = {}
        for w, c in rows:
            for i in range(len(w) - 1):
                counts[w[i:i + 2]] = counts.get(w[i:i + 2], 0) + c
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((r, pair, counts[pair]))
        ph = chr(0xE000 + r)
        rows = [(w.replace(pair, ph), c) for w, c in rows]
    return merges


def test_bpe_matches_reference_and_layout_invariant():
    rng = np.random.default_rng(4)
    vocab = ["the", "then", "there", "banana", "bandana", "aaa",
             "abab", "xyz", "hello", "help", "shell"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(60)]
    want = _reference(texts, 5)
    got1 = bpe_train_rounds(_docs_ds(texts, 1), rounds=5,
                            num_buckets=4).to_pylist()
    got9 = bpe_train_rounds(_docs_ds(texts, 9), rounds=5,
                            num_buckets=7).to_pylist()
    as_tuples = [(r["round"], r["pair"], r["cnt"]) for r in got1]
    assert as_tuples == want
    assert got1 == got9


def test_bpe_planted_chain_and_overlap_count():
    # 'aaaa' has three overlapping 'aa' positions ×5 docs = 15; after
    # the merge (non-overlapping apply) each word is ph*2, so round 1
    # merges (ph, ph)
    texts = ["aaaa"] * 5 + ["bc bc"]
    got = bpe_train_rounds(_docs_ds(texts), rounds=2,
                           num_buckets=3).to_pylist()
    assert got[0]["pair"] == "aa" and got[0]["cnt"] == 15
    ph = chr(0xE000)
    assert got[1]["pair"] == ph + ph and got[1]["cnt"] == 5


def test_bpe_empty_and_short_words():
    texts = ["a b c", "", "  x  "]   # len-1 words only -> no pairs
    got = bpe_train_rounds(_docs_ds(texts), rounds=3, num_buckets=2)
    assert got.num_rows == 0
