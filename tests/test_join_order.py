"""join_order_plan (__ray_entry__) vs a Python brute force on a
synthetic events table: estimates are per-pair join-size upper
bounds, the chosen pair is the (est, name)-argmin, triple_total is
the exact 3-way co-occurrence count regardless of plan, and the
whole row set is invariant to the parquet's row order."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp, users_by_type, order_seed=None):
    uid, et = [], []
    for t, us in users_by_type.items():
        uid.extend(us)
        et.extend([t] * len(us))
    uid = np.asarray(uid, np.int64)
    et = np.asarray(et, object)
    if order_seed is not None:
        p = np.random.default_rng(order_seed).permutation(len(uid))
        uid, et = uid[p], et[p]
    pq.write_table(
        pa.table({"user_id": pa.array(uid, pa.int64()),
                  "event_type": pa.array(et, pa.string())}),
        f"{tmp}/events.parquet")
    return str(tmp)


def _brute(users_by_type):
    from collections import Counter
    cnt = {t: Counter(us) for t, us in users_by_type.items()}
    pair_exact = {}
    for a, b in (("click", "purchase"), ("click", "view"),
                 ("purchase", "view")):
        pair_exact[f"{a}*{b}"] = sum(
            c * cnt[b][u] for u, c in cnt[a].items())
    triple = sum(c * cnt["click"][u] * cnt["purchase"][u]
                 for u, c in cnt["view"].items())
    return pair_exact, triple


def _run(sf_dir):
    from __ray_entry__ import _q_join_order_plan
    t = _q_join_order_plan(sf_dir)
    rows = {r["pair"]: r for r in t.to_pylist()}
    return rows


def test_plan_picks_min_and_counts_exact(tmp_path):
    rng = np.random.default_rng(5)
    users = {
        "view": rng.integers(0, 50, 400).tolist(),       # big
        "click": rng.integers(0, 50, 120).tolist(),      # medium
        "purchase": rng.integers(0, 12, 25).tolist(),    # small, skewed
    }
    sf = _write_events(tmp_path, users)
    rows = _brute(users)
    pair_exact, triple = rows
    got = _run(sf)
    assert set(got) == set(pair_exact)
    for p, r in got.items():
        assert r["est"] >= pair_exact[p]          # CM dot: upper bound
        assert r["triple_total"] == triple
    chosen = [p for p, r in got.items() if r["chosen"] == 1]
    assert chosen == [min(got, key=lambda p: (got[p]["est"], p))]
    assert sum(r["chosen"] for r in got.values()) == 1


def test_plan_row_order_invariant(tmp_path):
    rng = np.random.default_rng(9)
    users = {
        "view": rng.integers(0, 30, 200).tolist(),
        "click": rng.integers(0, 30, 150).tolist(),
        "purchase": rng.integers(0, 30, 100).tolist(),
    }
    a = tmp_path / "a"; a.mkdir()
    b = tmp_path / "b"; b.mkdir()
    ga = _run(_write_events(a, users))
    gb = _run(_write_events(b, users, order_seed=3))
    assert ga == gb


def test_plan_empty_relation(tmp_path):
    # one relation empty: its pairs estimate 0, get chosen first,
    # and the triple count is 0
    users = {"view": [1, 2, 3], "click": [1, 2], "purchase": []}
    got = _run(_write_events(tmp_path, users))
    assert got["click*purchase"]["est"] == 0
    assert got["purchase*view"]["est"] == 0
    assert all(r["triple_total"] == 0 for r in got.values())
    assert got["click*purchase"]["chosen"] == 1   # tie → lexical min
