"""perm_test_values (__ray_entry__) on synthetic events: brute-force
replicate agreement, power on a real effect (no relabeled diff
reaches it), null behavior (most replicates as extreme as a near-zero
observed diff), layout-independence via the deterministic hash."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp, vals_a, vals_b, seed=None):
    n = len(vals_a) + len(vals_b)
    et = ["purchase"] * len(vals_a) + ["view"] * len(vals_b)
    eid = np.arange(n, dtype=np.int64)
    vals = np.asarray(list(vals_a) + list(vals_b), np.float64)
    if seed is not None:
        p = np.random.default_rng(seed).permutation(n)
        et = [et[i] for i in p]
        eid, vals = eid[p], vals[p]
    pq.write_table(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(vals, pa.float64()),
    }), f"{tmp}/events.parquet")
    return str(tmp)


def _brute(vals_a, vals_b):
    import sys
    sys.path.insert(0, ".")
    from essentials_rd.util import hash64
    from __ray_entry__ import PERM_B, PERM_SEED
    mix = np.int64((PERM_SEED * 0x9E3779B97F4A7C15) & (2**63 - 1))
    c = np.floor(np.asarray(list(vals_a) + list(vals_b)) * 100
                 + 0.5).astype(np.int64)
    eid = np.arange(len(c), dtype=np.int64)
    with np.errstate(over="ignore"):
        h = hash64(eid + mix)
    na, nb = len(vals_a), len(vals_b)
    obs = c[:na].mean() - c[na:].mean()
    nt, st = len(c), int(c.sum())
    k = 0
    for b in range(PERM_B):
        bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(bool)
        m = int(bit.sum())
        if m == 0 or m == nt:
            continue
        d = c[bit].sum() / m - (st - c[bit].sum()) / (nt - m)
        if abs(d) >= abs(obs):
            k += 1
    return obs, k


def _run(sf):
    from __ray_entry__ import _q_perm_test
    return _q_perm_test(sf).to_pylist()[0]


def test_matches_bruteforce_and_row_order(tmp_path):
    rng = np.random.default_rng(8)
    a = rng.normal(100, 20, 200).clip(1).round(2)
    b = rng.normal(95, 20, 300).clip(1).round(2)
    obs, k = _brute(a, b)
    d1 = tmp_path / "x"; d1.mkdir()
    d2 = tmp_path / "y"; d2.mkdir()
    r1 = _run(_write(d1, a, b))
    r2 = _run(_write(d2, a, b, seed=4))  # shuffled file order
    assert r1 == r2
    assert r1["n_extreme"] == k
    assert abs(r1["obs_diff"] - obs) < 1e-5


def test_real_effect_never_matched(tmp_path):
    rng = np.random.default_rng(1)
    a = (rng.normal(500, 5, 300)).clip(1).round(2)
    b = (rng.normal(100, 5, 300)).clip(1).round(2)
    r = _run(_write(tmp_path, a, b))
    assert r["n_extreme"] == 0  # p < 1/32


def test_null_mostly_extreme(tmp_path):
    rng = np.random.default_rng(2)
    v = rng.normal(100, 30, 600).clip(1).round(2)
    r = _run(_write(tmp_path, v[:300], v[300:]))
    # identical-distribution halves: relabeled diffs routinely beat
    # the small observed diff
    assert r["n_extreme"] >= 8
