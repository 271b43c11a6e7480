"""quantile_normalize (__ray_entry__): brute force on synthetic
sources, single-source identity (norm == raw), shifted-source
alignment (two sources with shifted distributions normalize to
near-identical sums)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_chars": pa.array([r[1] for r in rows], pa.int64()),
    }), f"{tmp}/documents.parquet")
    return str(tmp)


def _brute(rows):
    pooled = sorted((r[1], i) for i, r in enumerate(rows))
    pooled_vals = [v for v, _ in pooled]
    n = len(rows)
    out = {}
    by_src = {}
    for i, (s, v) in enumerate(rows):
        by_src.setdefault(s, []).append((v, i))
    for s, items in by_src.items():
        items.sort()
        ns = len(items)
        raw = sum(v for v, _ in items)
        norm = 0
        for r, (v, _) in enumerate(items, 1):
            idx = (r * n + ns - 1) // ns
            norm += pooled_vals[idx - 1]
        out[s] = (ns, raw, norm)
    return out


def _run(sf):
    from __ray_entry__ import _q_quantile_normalize
    return {r["source"]: (r["n_docs"], r["sum_raw"], r["sum_norm"])
            for r in _q_quantile_normalize(sf).to_pylist()}


def test_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(3)
    rows = [(f"s{int(i)}", int(v)) for i, v in
            zip(rng.integers(0, 4, 300), rng.integers(10, 5000, 300))]
    assert _run(_write(tmp_path, rows)) == _brute(rows)


def test_single_source_identity(tmp_path):
    rows = [("only", int(v)) for v in
            np.random.default_rng(1).integers(5, 500, 50)]
    got = _run(_write(tmp_path, rows))
    assert got["only"][1] == got["only"][2]  # norm == raw


def test_shifted_sources_align(tmp_path):
    rng = np.random.default_rng(9)
    base = rng.integers(100, 1000, 80)
    rows = ([("a", int(v)) for v in base]
            + [("b", int(v) + 5000) for v in base])  # b shifted up
    got = _run(_write(tmp_path, rows))
    assert got == _brute(rows)
    # raw sums differ wildly; normalized sums are close (same shape)
    assert abs(got["a"][1] - got["b"][1]) > 100_000
    assert (abs(got["a"][2] - got["b"][2])
            < abs(got["a"][1] - got["b"][1]) // 10)
