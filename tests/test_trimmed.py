"""trimmed_sum (ops) vs a sort-based reference: exact middle-rank sum
per group with string and integer keys, tie-heavy domains, groups
smaller than the trim (everything dropped), and layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import trimmed_sum


def _ds(keys, vals, blocks=1):
    t = pa.table({"g": pa.array(keys),
                  "v": pa.array(np.asarray(vals, np.int64), pa.int64())})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _reference(keys, vals, num=1, den=10):
    out = {}
    keys = np.asarray(keys)
    vals = np.asarray(vals, np.int64)
    for g in np.unique(keys):
        v = np.sort(vals[keys == g])
        n = len(v)
        k = n * num // den
        out[g] = (n, k, int(v[k:n - k].sum()) if n - 2 * k > 0 else 0)
    return out


def _check(keys, vals, blocks, buckets, num=1, den=10):
    got = trimmed_sum(_ds(keys, vals, blocks), "g", "v",
                      trim_num=num, trim_den=den,
                      num_buckets=buckets).take_all()
    want = _reference(keys, vals, num, den)
    assert len(got) == len(want)
    for r in got:
        assert (r["n"], r["k_trim"], r["t_sum"]) == want[r["g"]]


def test_trimmed_string_keys_and_layout():
    rng = np.random.default_rng(6)
    keys = rng.choice(["A", "B", "CC"], 500).tolist()
    vals = rng.integers(-40, 40, 500)
    _check(keys, vals, 1, 4)
    _check(keys, vals, 11, 8)


def test_trimmed_int_keys_heavy_ties_and_small_groups():
    rng = np.random.default_rng(8)
    keys = rng.integers(0, 6, 300).astype(np.int64)
    vals = rng.integers(0, 4, 300)          # heavy ties
    _check(keys.tolist(), vals, 5, 4)
    # group of 1 with 50% trim: k = 0 -> the single value survives
    _check([7] * 1 + [8] * 4, [9, 1, 2, 3, 4], 2, 3, num=1, den=2)
