"""Positional index + phrase_query (textops.py) vs a brute-force
token-window scan: exact consecutive-phrase semantics, repeated-token
phrases, 3-token phrases, absent phrases, layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.textops import build_positional_index, phrase_query

TEXTS = [
    "a b a b c",          # "a b" twice, "a b c" once
    "b b b",              # "b b" twice (overlapping)
    "a",                  # too short for any 2-phrase
    "",                   # empty doc
    "c a b",              # "a b" once at the end
    "x y z a",            # no hits for probed phrases
]


def _brute(phrase):
    out = {}
    for i, s in enumerate(TEXTS):
        toks = s.split(" ")
        n = sum(
            1 for j in range(len(toks) - len(phrase) + 1)
            if toks[j:j + len(phrase)] == phrase
        )
        if n:
            out[i] = n
    return out


def _got(t):
    return dict(zip(np.asarray(t.column("doc_id"), np.int64).tolist(),
                    np.asarray(t.column("n_hits"), np.int64).tolist()))


def _build(tmp_path, parts=8, repartition=3):
    t = pa.table({"doc_id": pa.array(np.arange(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS)})
    out = str(tmp_path / "pidx")
    build_positional_index(
        rd.from_arrow(t).repartition(repartition), out, parts)
    return out


def test_phrase_two_token_and_overlaps(tmp_path):
    out = _build(tmp_path)
    assert _got(phrase_query(out, 8, ["a", "b"])) == _brute(["a", "b"])
    # repeated-token phrase: overlapping occurrences each count
    assert _got(phrase_query(out, 8, ["b", "b"])) == _brute(["b", "b"])


def test_phrase_three_token_and_absent(tmp_path):
    out = _build(tmp_path)
    assert _got(phrase_query(out, 8, ["a", "b", "c"])) == \
        _brute(["a", "b", "c"])
    assert _got(phrase_query(out, 8, ["z", "q"])) == {}
    # single-token phrase degenerates to term frequency
    assert _got(phrase_query(out, 8, ["b"])) == _brute(["b"])


def test_phrase_layout_invariance(tmp_path):
    o1 = _build(tmp_path / "x", parts=4, repartition=1)
    o2 = _build(tmp_path / "y", parts=16, repartition=5)
    a = phrase_query(o1, 4, ["a", "b"])
    b = phrase_query(o2, 16, ["a", "b"])
    assert a.equals(b)
