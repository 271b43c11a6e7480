"""item_cosine_top3 (__ray_entry__) vs a Python brute force over a
synthetic order-item incidence: exact cosine-quantized ranking with
deterministic ties, both directions present, row-order invariance."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp, pairs, seed=None):
    ok = np.asarray([p[0] for p in pairs], np.int64)
    pk = np.asarray([p[1] for p in pairs], np.int64)
    if seed is not None:
        p = np.random.default_rng(seed).permutation(len(ok))
        ok, pk = ok[p], pk[p]
    pq.write_table(pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                             "l_partkey": pa.array(pk, pa.int64())}),
                   f"{tmp}/lineitem.parquet")
    return str(tmp)


def _brute(pairs, k=3):
    from collections import defaultdict
    orders = defaultdict(set)
    for o, p in pairs:
        orders[o].add(p)
    co = defaultdict(int)
    deg = defaultdict(int)
    seen = {(o, p) for o, p in pairs}
    for o, p in seen:
        deg[p] += 1
    for o, ps in orders.items():
        ps = sorted(ps)
        for a in range(len(ps)):
            for b in range(a + 1, len(ps)):
                co[(ps[a], ps[b])] += 1
    rows = []
    sym = {}
    for (i, j), c in co.items():
        sym.setdefault(i, []).append((j, c))
        sym.setdefault(j, []).append((i, c))
    for i, nbrs in sym.items():
        scored = sorted(
            (((c * c * 1_000_000) // (deg[i] * deg[j]), j, c)
             for j, c in nbrs),
            key=lambda t: (-t[0], t[1]))
        for r, (q, j, c) in enumerate(scored[:k], 1):
            rows.append((i, r, j, c, q))
    return sorted(rows)


def _run(sf):
    from __ray_entry__ import _q_item_cosine
    t = _q_item_cosine(sf)
    return sorted(zip(*[t.column(c).to_pylist() for c in
                        ("item", "rank", "nbr", "co", "qscore")]))


def test_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(4)
    pairs = [(int(o), int(p)) for o, p in
             zip(rng.integers(0, 60, 400), rng.integers(0, 25, 400))]
    assert _run(_write(tmp_path, pairs)) == _brute(pairs)


def test_tie_break_and_directions(tmp_path):
    # two orders: {1,2,3} and {1,2} — co(1,2)=2, co(1,3)=co(2,3)=1,
    # deg: 1→2, 2→2, 3→1
    pairs = [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2)]
    got = _run(_write(tmp_path, pairs))
    assert got == _brute(pairs)
    by_item = {}
    for item, rank, nbr, co, q in got:
        by_item.setdefault(item, []).append((rank, nbr))
    # item 3's both neighbors tie on qscore (1e6/2) → nbr ascending
    assert by_item[3] == [(1, 1), (2, 2)]
    # symmetric presence: 1→3 and 3→1 both exist
    assert any(n == 3 for _, n in by_item[1])


def test_row_order_invariant(tmp_path):
    rng = np.random.default_rng(8)
    pairs = [(int(o), int(p)) for o, p in
             zip(rng.integers(0, 40, 300), rng.integers(0, 15, 300))]
    a = tmp_path / "a"; a.mkdir()
    b = tmp_path / "b"; b.mkdir()
    assert _run(_write(a, pairs)) == _run(_write(b, pairs, seed=5))
