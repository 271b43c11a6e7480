"""time_to_convert (__ray_entry__): brute force over synthetic
events — first-view→first-purchase deltas, purchase-before-view users
excluded, exact quantile_disc semantics."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp, rows):
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    }), f"{tmp}/events.parquet")
    return str(tmp)


def _brute(rows):
    import math
    fv, fp = {}, {}
    for u, t, ts in rows:
        if t == "view":
            fv[u] = min(fv.get(u, ts), ts)
        elif t == "purchase":
            fp[u] = min(fp.get(u, ts), ts)
    deltas = sorted(fp[u] - fv[u] for u in fv
                    if u in fp and fp[u] >= fv[u])
    if not deltas:
        return 0, 0, 0
    q = lambda p: deltas[math.ceil(p * len(deltas)) - 1]  # noqa: E731
    return len(deltas), q(0.5), q(0.9)


def _run(sf):
    from __ray_entry__ import _q_time_to_convert
    r = _q_time_to_convert(sf).to_pylist()[0]
    return r["n_converts"], r["p50_us"], r["p90_us"]


def test_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(6)
    rows = []
    for u in range(40):
        for _ in range(int(rng.integers(1, 8))):
            t = ["view", "purchase", "click"][int(rng.integers(0, 3))]
            rows.append((u, t, int(rng.integers(0, 10**7))))
    assert _run(_write(tmp_path, rows)) == _brute(rows)


def test_purchase_before_view_excluded(tmp_path):
    rows = [(1, "purchase", 100), (1, "view", 200),   # excluded
            (2, "view", 100), (2, "purchase", 400)]   # delta 300
    assert _run(_write(tmp_path, rows)) == (1, 300, 300)
