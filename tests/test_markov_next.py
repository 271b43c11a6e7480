"""markov_next_acc (__ray_entry__) vs a Python brute force on a
synthetic events table: argmax predictor with deterministic ties,
hit counting, sequence order under (ts, event_id)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp, rows):
    # rows: (user, ts_us, event_id, type)
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }), f"{tmp}/events.parquet")
    return str(tmp)


def _brute(rows):
    from collections import Counter, defaultdict
    seqs = defaultdict(list)
    for u, ts, eid, t in rows:
        seqs[u].append((ts, eid, t))
    trans = Counter()
    for u, es in seqs.items():
        es.sort()
        for a, b in zip(es, es[1:]):
            trans[(a[2], b[2])] += 1
    pred = {}
    for (p, n), c in trans.items():
        best = pred.get(p)
        if best is None or c > best[1] or (c == best[1] and n < best[0]):
            pred[p] = (n, c)
    out = {}
    for (p, n), c in trans.items():
        d = out.setdefault(p, [pred[p][0], 0, 0])
        d[1] += c
        if n == pred[p][0]:
            d[2] += c
    return {p: tuple(v) for p, v in out.items()}


def _run(sf):
    from __ray_entry__ import _q_markov_next
    t = _q_markov_next(sf)
    return {r["prev_val"]: (r["predicted"], r["n_total"], r["n_hits"])
            for r in t.to_pylist()}


def test_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(3)
    rows = [(int(u), int(ts), i, "abcd"[int(t)]) for i, (u, ts, t) in
            enumerate(zip(rng.integers(0, 20, 500),
                          rng.integers(0, 10**6, 500),
                          rng.integers(0, 4, 500)))]
    assert _run(_write(tmp_path, rows)) == _brute(rows)


def test_tie_breaks_to_lexical_min(tmp_path):
    # after 'a': b and c equally often → predict 'b'
    rows = [(1, 10, 0, "a"), (1, 20, 1, "b"),
            (1, 30, 2, "a"), (1, 40, 3, "c")]
    got = _run(_write(tmp_path, rows))
    assert got["a"] == ("b", 2, 1)


def test_order_is_ts_then_event_id(tmp_path):
    # identical ts: event_id breaks the tie, so sequence is a->b->c
    rows = [(1, 10, 0, "a"), (1, 10, 1, "b"), (1, 10, 2, "c")]
    got = _run(_write(tmp_path, rows))
    assert got == {"a": ("b", 1, 1), "b": ("c", 1, 1)}
