"""position_attribution (windows.py): hand-built paths for every k
regime, the sum-to-scale audit invariant, remainder-to-earliest-middle
pinning, brute force on random data, layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.windows import position_attribution


def _ds(rows, parts=1):
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _got(rows, parts=1):
    t = position_attribution(_ds(rows, parts))
    return dict(zip(t.column("touch_type").to_pylist(),
                    t.column("credit_micros").to_pylist()))


def test_k_regimes_and_remainder():
    rows = [
        # user 0: no touches -> <none> gets 1e6
        (0, "purchase", 100),
        # user 1: single view -> view gets 1e6
        (1, "view", 10), (1, "purchase", 20),
        # user 2: view, click -> 500k each
        (2, "view", 10), (2, "click", 20), (2, "purchase", 30),
        # user 3: v c v c v (k=5): first v 400k, last v 400k,
        # middles c,v,c get 200000//3=66666 each, remainder 2 to the
        # EARLIEST middle (the click at ts=20)
        (3, "view", 10), (3, "click", 20), (3, "view", 30),
        (3, "click", 40), (3, "view", 50), (3, "purchase", 60),
    ]
    got = _got(rows)
    assert got["<none>"] == 1_000_000
    # user1 view 1e6 + user2 view 500k + user3: first 400k + last 400k
    # + middle v 66666
    assert got["view"] == 1_000_000 + 500_000 + 866_666
    # user2 click 500k + user3 middles: 66666 + 66666 + remainder 2
    assert got["click"] == 500_000 + 133_334
    assert sum(got.values()) == 4 * 1_000_000  # audit invariant


def _brute(rows):
    from collections import defaultdict
    seqs = defaultdict(list)
    for i, (u, ty, ts) in enumerate(rows):
        seqs[u].append((ts, i, ty))
    credits = defaultdict(int)
    for u, es in seqs.items():
        es.sort()
        touches = []
        for ts, i, ty in es:
            if ty == "purchase":
                k = len(touches)
                if k == 0:
                    credits["<none>"] += 1_000_000
                elif k == 1:
                    credits[touches[0]] += 1_000_000
                elif k == 2:
                    credits[touches[0]] += 500_000
                    credits[touches[1]] += 500_000
                else:
                    credits[touches[0]] += 400_000
                    credits[touches[-1]] += 400_000
                    m = 200_000 // (k - 2)
                    for t in touches[1:-1]:
                        credits[t] += m
                    credits[touches[1]] += 200_000 - m * (k - 2)
            else:
                touches.append(ty)
    return dict(credits)


def test_bruteforce_and_layout():
    rng = np.random.default_rng(4)
    types = np.array(["view", "click", "purchase"], object)
    rows = [(int(u), str(types[int(t)]), int(ts)) for u, t, ts in
            zip(rng.integers(0, 30, 800),
                rng.choice([0, 0, 1, 2], 800),
                rng.integers(0, 10**6, 800))]
    want = _brute(rows)
    assert _got(rows, parts=1) == want
    assert _got(rows, parts=9) == want
    n_purch = sum(1 for r in rows if r[1] == "purchase")
    assert sum(want.values()) == n_purch * 1_000_000
