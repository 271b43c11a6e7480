"""allen_census (windows.py): hand-built intervals hitting all 13
relations, ladder precedence on degenerate point intervals, brute
force on random data, layout invariance, zero rows present."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.windows import _ALLEN_RELS, allen_census


def _ds(rows, parts=1):
    # rows: (user, type, ts_us)
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _classify(s1, e1, s2, e2):
    if s1 == s2 and e1 == e2:
        return "equals"
    if e1 < s2:
        return "precedes"
    if e2 < s1:
        return "preceded_by"
    if e1 == s2:
        return "meets"
    if e2 == s1:
        return "met_by"
    if s1 == s2 and e1 < e2:
        return "starts"
    if s1 == s2 and e2 < e1:
        return "started_by"
    if e1 == e2 and s1 > s2:
        return "finishes"
    if e1 == e2 and s2 > s1:
        return "finished_by"
    if s1 > s2 and e1 < e2:
        return "during"
    if s1 < s2 and e2 < e1:
        return "contains"
    if s1 < s2 and s2 < e1 and e1 < e2:
        return "overlaps"
    return "overlapped_by"


def _brute(rows):
    iv = {}
    for u, t, ts in rows:
        k = (u, t)
        s, e = iv.get(k, (ts, ts))
        iv[k] = (min(s, ts), max(e, ts))
    counts = {r: 0 for r in _ALLEN_RELS}
    users = {}
    for (u, t), se in iv.items():
        users.setdefault(u, []).append((t, se))
    for u, items in users.items():
        items.sort()
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (s1, e1), (s2, e2) = items[i][1], items[j][1]
                counts[_classify(s1, e1, s2, e2)] += 1
    return counts


def _got(rows, parts=1):
    t = allen_census(_ds(rows, parts))
    return dict(zip(t.column("rel").to_pylist(),
                    t.column("n_pairs").to_pylist()))


def _interval(u, t, s, e):
    return [(u, t, s), (u, t, e)]


def test_all_thirteen_relations():
    rows = []
    cases = [
        ("equals", (10, 20), (10, 20)),
        ("precedes", (0, 5), (8, 12)),
        ("preceded_by", (8, 12), (0, 5)),
        ("meets", (0, 5), (5, 9)),
        ("met_by", (5, 9), (0, 5)),
        ("starts", (3, 6), (3, 9)),
        ("started_by", (3, 9), (3, 6)),
        ("finishes", (6, 9), (2, 9)),
        ("finished_by", (2, 9), (6, 9)),
        ("during", (4, 6), (2, 9)),
        ("contains", (2, 9), (4, 6)),
        ("overlaps", (1, 5), (3, 8)),
        ("overlapped_by", (3, 8), (1, 5)),
    ]
    for u, (rel, (s1, e1), (s2, e2)) in enumerate(cases):
        rows += _interval(u, "a", s1, e1) + _interval(u, "b", s2, e2)
    got = _got(rows)
    want = {r: 0 for r in _ALLEN_RELS}
    for rel, _, _ in cases:
        want[rel] += 1
    assert got == want


def test_point_interval_ladder_precedence():
    # A = [5,5] point, B = [5,9]: both 'meets' and 'starts' conditions
    # hold; the ladder puts meets first
    rows = _interval(0, "a", 5, 5)[:1] + _interval(0, "b", 5, 9)
    got = _got(rows)
    assert got["meets"] == 1 and got["starts"] == 0


def test_bruteforce_and_layout():
    rng = np.random.default_rng(6)
    rows = [(int(u), "t" + str(int(t)), int(ts)) for u, t, ts in
            zip(rng.integers(0, 25, 600), rng.integers(0, 5, 600),
                rng.integers(0, 1000, 600))]
    want = _brute(rows)
    assert _got(rows, parts=1) == want
    assert _got(rows, parts=9) == want
    assert set(_got(rows)) == set(_ALLEN_RELS)  # zero rows present
