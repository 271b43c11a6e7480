"""consistent_hash_moves (__ray_entry__): ring-property brute force —
every move targets the new node, moved fraction ≈ 1/(N+1), per-node
counts match a Python reference, wraparound key handled."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp, keys):
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.asarray(keys, np.int64), pa.int64())}),
        f"{tmp}/orders.parquet")
    return str(tmp)


def _brute(keys):
    from essentials_rd.util import hash64
    from __ray_entry__ import CH_NODES, _ch_ring
    pos_a, node_a = _ch_ring(CH_NODES)
    pos_b, node_b = _ch_ring(CH_NODES + 1)
    h = hash64(np.asarray(keys, np.int64))

    def _assign(pos, node):
        i = np.searchsorted(pos, h, side="left")
        i[i == len(pos)] = 0
        return node[i]

    a, b = _assign(pos_a, node_a), _assign(pos_b, node_b)
    out = {}
    for n in range(CH_NODES):
        m = a == n
        out[n] = (int((m & (a == b)).sum()), int((m & (a != b)).sum()))
    return out, a, b


def test_matches_bruteforce_and_ring_property(tmp_path):
    rng = np.random.default_rng(6)
    keys = rng.integers(0, 10**9, 5000)
    from __ray_entry__ import CH_NODES, _q_consistent_hash
    t = _q_consistent_hash(_write(tmp_path, keys))
    got = {r["node"]: (r["n_stayed"], r["n_moved"])
           for r in t.to_pylist()}
    want, a, b = _brute(keys)
    assert got == want
    # every move targets the NEW node
    assert set(b[a != b]) <= {CH_NODES}
    # moved fraction ~ 1/(N+1) within generous tolerance
    frac = (a != b).mean()
    assert 0.05 < frac < 0.30


def test_wraparound_key(tmp_path):
    # find a key hashing above the max ring position: it must wrap to
    # the ring's minimum vnode owner, consistently in both rings
    from essentials_rd.util import hash64
    from __ray_entry__ import CH_NODES, _ch_ring, _q_consistent_hash
    pos_b, node_b = _ch_ring(CH_NODES + 1)
    top = pos_b.max()
    k = 0
    while hash64(np.array([k], np.int64))[0] <= top:
        k += 1
        if k > 5_000_000:
            import pytest
            pytest.skip("no wrapping key found in range")
    t = _q_consistent_hash(_write(tmp_path, [k]))
    total = sum(r["n_stayed"] + r["n_moved"] for r in t.to_pylist())
    assert total == 1  # the wrapping key was assigned, not dropped
