"""dict_term_stats (textops.py) vs a pure-Python str.count brute
force: non-overlapping occurrence semantics ('aaa' holds ONE 'aa'),
multi-word phrases, absent terms emit zero rows, layout invariance,
empty corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.textops import dict_term_stats

TERMS = ["aa", "cat dog", "xyz", "a"]


def _docs(texts):
    return pa.table({"text": pa.array(texts, pa.string())})


def _ref(texts, terms):
    rows = []
    for t in terms:
        occ = sum(s.count(t) for s in texts)
        nd = sum(1 for s in texts if t in s)
        rows.append((t, occ, nd))
    return pd.DataFrame(rows, columns=["term", "n_occurrences", "n_docs"])


def _run(texts, terms, parts=1):
    ds = rd.from_arrow(_docs(texts))
    if parts > 1:
        ds = ds.repartition(parts)
    return dict_term_stats(ds, terms).to_pandas()


def test_dict_terms_matches_bruteforce():
    texts = ["aaa cat dog aa", "cat dog cat dog", "bare a a a", ""]
    got = _run(texts, TERMS)
    pd.testing.assert_frame_equal(got, _ref(texts, TERMS))
    # the 'aaa...aa' doc: 'aa' occurs 1+1 = 2 non-overlapping times
    assert int(got.loc[got.term == "aa", "n_occurrences"].iloc[0]) == 2


def test_dict_terms_absent_term_zero_row():
    got = _run(["hello world"], ["absent"])
    assert len(got) == 1
    assert int(got.n_occurrences.iloc[0]) == 0
    assert int(got.n_docs.iloc[0]) == 0


def test_dict_terms_layout_invariance():
    rng = np.random.default_rng(31)
    words = np.array(["cat", "dog", "aa", "fish", "a"])
    texts = [" ".join(rng.choice(words, rng.integers(0, 12)))
             for _ in range(300)]
    one = _run(texts, TERMS, parts=1)
    many = _run(texts, TERMS, parts=11)
    pd.testing.assert_frame_equal(one, many)


def test_dict_terms_empty_corpus():
    got = _run([], TERMS)
    assert list(got.term) == TERMS
    assert (got.n_occurrences == 0).all() and (got.n_docs == 0).all()
