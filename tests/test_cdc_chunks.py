"""gear_chunks / cdc_dedup_stats (textops.py): the vectorized
sliding-window gear state equals the scalar recurrence mod 2^64,
chunk boundaries are content-defined (an insertion re-chunks only the
neighborhood), dedup ledger matches a Python brute force, layout
invariance, empty docs."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.textops import _gear_table, cdc_dedup_stats, gear_chunks

K = 6


def _brute_chunks(text):
    gear = _gear_table()
    h = np.uint64(0)
    chunks, start = [], 0
    cps = [ord(c) % 256 for c in text]
    with np.errstate(over="ignore"):
        for i, c in enumerate(cps):
            h = h * np.uint64(2) + gear[c]  # wraps mod 2^64
            if int(h) % (1 << K) == 0:
                chunks.append(text[start:i + 1])
                start = i + 1
    if start < len(text):
        chunks.append(text[start:])
    return chunks


def _ds(texts, parts=1):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(list(texts), pa.string()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _engine_chunks(texts, parts=1):
    rows = gear_chunks(_ds(texts, parts), "text", "doc_id",
                       k=K).take_all()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(
            (r["start"], r["clen"], r["md5"]))
    return {d: sorted(v) for d, v in out.items()}


def test_vectorized_equals_scalar_recurrence():
    rng = np.random.default_rng(3)
    texts = ["".join(chr(rng.integers(97, 123)) for _ in range(n))
             for n in (1, 63, 64, 65, 200, 517)]
    got = _engine_chunks(texts)
    for d, text in enumerate(texts):
        ref = _brute_chunks(text)
        want, pos = [], 1
        for c in ref:
            want.append((pos, len(c),
                         hashlib.md5(c.encode()).hexdigest()))
            pos += len(c)
        assert got[d] == sorted(want), f"doc {d}"


def test_insertion_is_local():
    rng = np.random.default_rng(9)
    base = "".join(chr(rng.integers(97, 123)) for _ in range(2000))
    edited = base[:1000] + "XYZ" + base[1000:]
    a = {m for _, _, m in _engine_chunks([base])[0]}
    b = {m for _, _, m in _engine_chunks([edited])[0]}
    # content-defined: far-away chunks identical, only the edit
    # neighborhood differs
    assert len(a & b) >= len(a) - 4
    assert a != b


def test_dedup_ledger_matches_bruteforce():
    rng = np.random.default_rng(5)
    para = "".join(chr(rng.integers(97, 123)) for _ in range(300))
    texts = [para + "tailone", "head" + para, para, "unique" * 40]
    stats = cdc_dedup_stats(gear_chunks(_ds(texts, 3), k=K)).to_pylist()[0]
    all_chunks = [c for t in texts for c in _brute_chunks(t)]
    distinct = {}
    for c in all_chunks:
        distinct.setdefault(hashlib.md5(c.encode()).hexdigest(), len(c))
    assert stats["n_chunks"] == len(all_chunks)
    assert stats["total_chars"] == sum(len(c) for c in all_chunks)
    assert stats["n_distinct"] == len(distinct)
    assert stats["unique_chars"] == sum(distinct.values())
    assert stats["unique_chars"] < stats["total_chars"]  # dups found


def test_layout_invariant_and_empty_docs():
    rng = np.random.default_rng(1)
    texts = ["".join(chr(rng.integers(97, 123))
                     for _ in range(int(n)))
             for n in rng.integers(0, 400, 40)]
    a = _engine_chunks(texts, parts=1)
    b = _engine_chunks(texts, parts=11)
    assert a == b
    for d, t in enumerate(texts):
        if len(t) == 0:
            assert d not in a  # empty docs emit no chunks
