"""exact_heavy_hitters (ops.py): exact HAVING-count result on skewed
and uniform streams, screen soundness under adversarial layouts (the
heavy key's rows concentrated vs scattered), real tail pruning on a
Zipf stream (candidates ≪ distinct keys), value -1 non-collision,
empty input."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import exact_heavy_hitters

PHI = 50  # heavy = count >= ceil(N/50)


def _run(vals, parts=1):
    ds = rd.from_arrow(pa.table({"v": pa.array(
        np.asarray(vals, np.int64), pa.int64())}))
    if parts > 1:
        ds = ds.repartition(parts)
    out, info = exact_heavy_hitters(ds, "v", phi_den=PHI)
    rows = sorted((r["value"], r["count"]) for r in out.take_all())
    return rows, info


def _brute(vals):
    vals = np.asarray(vals, np.int64)
    theta = (len(vals) + PHI - 1) // PHI
    uniq, cnt = np.unique(vals, return_counts=True)
    return sorted((int(u), int(c)) for u, c in zip(uniq, cnt)
                  if c >= theta)


def test_zipf_stream_matches_and_prunes():
    rng = np.random.default_rng(7)
    vals = rng.zipf(1.3, 20000).astype(np.int64) % 5000
    rows, info = _run(vals, parts=8)
    assert rows == _brute(vals)
    n_distinct = len(np.unique(vals))
    assert info["n_candidates"] < n_distinct // 4  # screen really prunes


def test_layout_cannot_change_answer():
    # heavy key 42 (5% of stream): scattered uniformly vs concentrated
    # in one region — the answer must be identical
    rng = np.random.default_rng(3)
    tail = rng.integers(1000, 9000, 1900).astype(np.int64)
    heavy = np.full(100, 42, np.int64)
    scattered = np.empty(2000, np.int64)
    scattered[::20] = heavy
    mask = np.ones(2000, bool); mask[::20] = False
    scattered[mask] = tail
    concentrated = np.concatenate([heavy, tail])
    for arrangement in (scattered, concentrated):
        for parts in (1, 7, 16):
            rows, _ = _run(arrangement, parts)
            assert rows == _brute(arrangement)


def test_uniform_stream_screen_passes_everything():
    vals = np.repeat(np.arange(30, dtype=np.int64), 10)  # all heavy
    rows, info = _run(vals, parts=4)
    assert rows == _brute(vals)
    assert len(rows) == 30


def test_negative_values_no_sentinel_collision():
    vals = np.concatenate([np.full(50, -1, np.int64),
                           np.arange(10, dtype=np.int64)])
    rows, _ = _run(vals)
    assert rows == _brute(vals)
    assert rows[0][0] == -1


def test_empty_input():
    rows, info = _run(np.zeros(0, np.int64))
    assert rows == [] and info["n"] == 0
