"""Golden-value pins for the shared splitmix64 hash that nearly every
deterministic-sampling / bucketing oracle replays through
``_sm64_ctes``.

The FH_DIM incident (round 4) showed the twin-oracle blind spot: a
shared generator (constant or code path) that shifts the ENGINE AND
its SQL twin together keeps every oracle green while semantics change.
``util.hash64`` and the ``_sm64_ctes`` SQL chain generator are the two
largest such shared paths — these tests anchor both to HARD-CODED
literals (the published splitmix64 test vectors: hash64(0) is
splitmix64's first output for seed 0, E220A8397B1DCDAF), so any drift
in either implementation fails loudly even though engine and twin
would still agree with each other.
"""

import duckdb
import numpy as np

from essentials_rd.util import hash64

# splitmix64(x + GOLDEN) finalizer outputs — literals on purpose, do
# NOT re-derive these from hash64 itself
GOLDENS = {
    0: 0xE220A8397B1DCDAF,
    1: 0x910A2DEC89025CC1,
    2: 0x975835DE1C9756CE,
    42: 0xBDD732262FEB6E95,
    123456789: 0x223C74D93DEB7679,
    2**31 - 1: 0x61FA36A6261A4BE7,
    2**63 - 1: 0x2A67D7552E039EA7,
    -1: 0xE4D971771B652C20,
    -42: 0x2785535A58AE2BAE,
}


def test_hash64_matches_published_splitmix64_vectors():
    xs = np.array(list(GOLDENS), np.int64)
    got = hash64(xs)
    want = np.array(list(GOLDENS.values()), np.uint64)
    assert got.tolist() == want.tolist()


def test_sm64_ctes_sql_chain_matches_same_literals():
    import __ray_entry__ as e

    chain = e._sm64_ctes("g", "x", "x", "inp")
    xs = ", ".join(f"({x})" for x in GOLDENS)
    sql = (f"WITH inp(x) AS (VALUES {xs}), {chain} "
           "SELECT x, z FROM g3 ORDER BY x")
    con = duckdb.connect()
    out = {int(r[0]): int(r[1]) for r in con.sql(sql).fetchall()}
    assert out == {k: v for k, v in GOLDENS.items()}
