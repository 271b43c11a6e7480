"""dp_noisy_counts: contribution bounding (a heavy user moves the
release by at most the cap), noise bounds, zero clamp, layout
invariance."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as e


def _write(tmp_path, u, et, rgs=None):
    t = pa.table({
        "user_id": pa.array(u, pa.int64()),
        "event_type": pa.array(et, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    kw = {"row_group_size": rgs} if rgs else {}
    pq.write_table(t, d / "events.parquet", **kw)
    return str(d)


def test_cap_bounds_single_user_influence(tmp_path):
    # 40 users with 1 'a' event each; user 999 with 500 'a' events
    u = list(range(40)) + [999] * 500
    et = ["a"] * 540
    d = _write(tmp_path, u, et)
    out = e._q_dp_counts(d).to_pydict()
    assert out["event_type"] == ["a"]
    assert out["n_users"] == [41]
    # capped sum: 40*1 + cap(500)=3 → 43, not 540
    assert out["sum_capped"] == [40 + e.DP_CAP]
    # noise bounded: release within B of the capped sum
    assert abs(out["noisy_count"][0] - out["sum_capped"][0]) <= e.DP_B


def test_zero_clamp_and_noise_determinism(tmp_path):
    # tiny category: capped sum may go negative after noise → clamp 0
    u = [1]
    et = ["solo"]
    d = _write(tmp_path, u, et)
    out1 = e._q_dp_counts(d).to_pydict()
    out2 = e._q_dp_counts(d).to_pydict()
    assert out1 == out2  # deterministic release
    assert out1["noisy_count"][0] >= 0
    assert out1["sum_capped"] == [1]


def test_layout_invariance(tmp_path):
    rng = np.random.default_rng(7)
    n = 2000
    u = rng.integers(0, 80, n)
    et = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)]
    a = e._q_dp_counts(_write(tmp_path, u, et)).to_pydict()
    b = e._q_dp_counts(_write(tmp_path, u, et, rgs=37)).to_pydict()
    assert a == b
    # per-type noise differs across ranks (not a constant offset)
    deltas = {t: a["noisy_count"][i] - a["sum_capped"][i]
              for i, t in enumerate(a["event_type"])}
    assert len(set(deltas.values())) > 1


def test_huffman_greedy_equals_enumeration_and_entropy_bound():
    """_kraft_multisets enumeration == heapq Huffman total on random
    count vectors, and the optimum respects the entropy bound."""
    import heapq
    import math

    from __ray_entry__ import _kraft_multisets

    rng = np.random.default_rng(13)
    for n in range(2, 7):
        cands = _kraft_multisets(n)
        # every candidate satisfies Kraft equality
        for ms in cands:
            assert sum(2.0 ** -l for l in ms) == 1.0
        for _ in range(30):
            counts = sorted(rng.integers(1, 1000, n).tolist(), reverse=True)
            heap = list(counts)
            heapq.heapify(heap)
            greedy = 0
            while len(heap) > 1:
                a, b = heapq.heappop(heap), heapq.heappop(heap)
                greedy += a + b
                heapq.heappush(heap, a + b)
            best = min(sum(l * c for l, c in zip(ms, counts))
                       for ms in cands)
            assert best == greedy
            total = sum(counts)
            ent = sum(c * math.log2(total / c) for c in counts)
            assert ent <= greedy < ent + total  # Shannon bounds


def test_incr_join_view_delta_rule(tmp_path):
    """Engine's three-term delta maintenance == brute-force
    full-minus-base on synthetic orders/customers."""
    import pandas as pd

    rng = np.random.default_rng(21)
    n_c, n_o = 120, 900
    ck = np.arange(1, n_c + 1, dtype=np.int64)
    cn = rng.integers(0, 25, n_c).astype(np.int64)
    ok = np.arange(1, n_o + 1, dtype=np.int64)
    oc = rng.choice(ck, n_o)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"o_orderkey": ok, "o_custkey": oc}),
                   d / "orders.parquet")
    pq.write_table(pa.table({"c_custkey": ck, "c_nationkey": cn}),
                   d / "customer.parquet")
    pq.write_table(pa.table({"n_nationkey": pa.array(
        np.arange(25, dtype=np.int64))}), d / "nation.parquet")
    out = e._q_incr_join_view(str(d)).to_pydict()

    from essentials_rd.util import hash64
    thresh = np.uint64(int(e.IVM_FRAC * float(2**64 - 1)))

    def isdelta(keys, seed):
        mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
        with np.errstate(over="ignore"):
            return hash64(keys.astype(np.uint64) + mix) < thresh

    od = isdelta(ok, e.IVM_OSEED)
    cd = isdelta(ck, e.IVM_CSEED)
    nat = pd.Series(cn, index=ck)
    df = pd.DataFrame({"nation": nat.loc[oc].to_numpy(),
                       "ob": ~od, "cb": (~cd)[oc - 1]})
    full = df.groupby("nation").size()
    base = df[df.ob & df.cb].groupby("nation").size()
    for i, k in enumerate(out["nation"]):
        f = int(full.get(k, 0))
        b = int(base.get(k, 0))
        assert out["n_base"][i] == b
        assert out["n_delta"][i] == f - b
        assert out["n_total"][i] == f
    # invariants: totals add up and the delta side is genuinely small
    assert sum(out["n_total"]) == n_o
    assert 0 < sum(out["n_delta"]) < n_o // 2


def test_mrr_eval_hand_case(tmp_path):
    """Tiny basket fixture where every rank bucket is exercised and the
    exact-sixths MRR can be checked by hand."""
    d = tmp_path / "sf"
    d.mkdir()
    # baskets: {1,2} x4  {1,3} x2  {2,3} x3  {4,5}  {6} (too small)
    rows = ([(o, p) for o in range(4) for p in (1, 2)]
            + [(o, p) for o in range(4, 6) for p in (1, 3)]
            + [(o, p) for o in range(6, 9) for p in (2, 3)]
            + [(9, 4), (9, 5), (10, 6)])
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    }), d / "lineitem.parquet")
    out = e._q_mrr_eval(str(d)).to_pydict()
    # brute force from the serving table itself
    serving = e._q_item_cosine(str(d)).to_pydict()
    top = {}
    for it, nbr in zip(serving["item"], serving["nbr"]):
        top.setdefault(it, []).append(nbr)
    import collections
    baskets = collections.defaultdict(set)
    for o, p in rows:
        baskets[o].add(p)
    n_eval = sixths = hits = 0
    for o, ps in baskets.items():
        if len(ps) < 2:
            continue
        n_eval += 1
        qp = min(ps)
        for r, nbr in enumerate(top.get(qp, []), start=1):
            if nbr in ps - {qp}:
                sixths += {1: 6, 2: 3, 3: 2}[r]
                hits += 1
                break
    assert out == {"n_eval": [n_eval], "mrr_sixths": [sixths],
                   "n_hit_top3": [hits]}
    assert n_eval == 10 and hits > 0
    # rank-1 dominance: every basket's partner is its query's 1-NN or
    # 2-NN here, so MRR is high — sanity that sixths <= 6*n_eval
    assert 0 < sixths <= 6 * n_eval


def test_feature_hash_brute_force(tmp_path):
    from essentials_rd.util import hash64

    rng = np.random.default_rng(41)
    n = 800
    u = rng.integers(0, 30, n).astype(np.int64)
    types = np.array(["a", "b", "c", "d", "e"])
    et = types[rng.integers(0, 5, n)]
    ts = rng.integers(0, 10**12, n).astype(np.int64)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "user_id": pa.array(u), "event_type": pa.array(et),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), d / "events.parquet", row_group_size=97)
    out = e._q_feature_hash(str(d)).to_pydict()
    rank = {t: i + 1 for i, t in enumerate(sorted(set(et)))}
    mix = np.uint64((e.FH_SEED * 0x9E3779B97F4A7C15) % (1 << 64))
    F = {}
    for i in range(n):
        h = int(ts[i] // 3_600_000_000) % 24
        with np.errstate(over="ignore"):
            z = int(hash64(np.array(
                [rank[et[i]] * 24 + h], np.uint64) + mix)[0])
        b = z % e.FH_DIM
        s = 1 - 2 * ((z >> 8) & 1)
        F.setdefault(int(u[i]), [0] * e.FH_DIM)[b] += s
    for i, uid in enumerate(out["user_id"]):
        assert [out[f"f{k}"][i] for k in range(e.FH_DIM)] == F[uid]
    # mass conservation: sum |f_k| <= user's event count
    cnts = {int(k): int(v) for k, v in
            zip(*np.unique(u, return_counts=True))}
    for i, uid in enumerate(out["user_id"]):
        assert sum(abs(out[f"f{k}"][i]) for k in range(e.FH_DIM)) \
            <= cnts[uid]


def test_seq_pair_support_brute_force(tmp_path):
    rng = np.random.default_rng(55)
    n = 600
    u = rng.integers(0, 40, n).astype(np.int64)
    types = np.array(["p", "q", "r"])
    et = types[rng.integers(0, 3, n)]
    ts = rng.integers(0, 10**9, n).astype(np.int64)
    ts[:10] = 500  # ties: strict < must exclude equal-time pairs
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "user_id": pa.array(u), "event_type": pa.array(et),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), d / "events.parquet", row_group_size=71)
    out = e._q_seq_support(str(d)).to_pydict()
    got = {(a, b): c for a, b, c in
           zip(out["a"], out["b"], out["n_users"])}
    import collections
    per = collections.defaultdict(lambda: collections.defaultdict(list))
    for i in range(n):
        per[int(u[i])][et[i]].append(int(ts[i]))
    want = collections.Counter()
    for _, d2 in per.items():
        for a in types:
            for b in types:
                if a in d2 and b in d2 and min(d2[a]) < max(d2[b]):
                    want[(a, b)] += 1
    for a in types:
        for b in types:
            assert got[(a, b)] == want[(a, b)], (a, b)
    # a-before-a counts exactly the users with >=2 distinct ts of a
    for a in types:
        m = sum(1 for _, d2 in per.items()
                if a in d2 and min(d2[a]) < max(d2[a]))
        assert got[(a, a)] == m


def test_bip_matching_augmenting_equals_enumeration():
    """The augmenting-path matcher (as used by bip_matching_regions)
    equals the exhaustive permutation max on random 5x5 graphs,
    including structured cases where greedy-without-augmenting fails."""
    from itertools import permutations

    rng = np.random.default_rng(19)

    def max_match(adj):
        P = 5
        match_p = [-1] * P

        def try_aug(r, seen):
            for p in range(P):
                if adj[r][p] and not seen[p]:
                    seen[p] = True
                    if match_p[p] == -1 or try_aug(match_p[p], seen):
                        match_p[p] = r
                        return True
            return False

        return sum(try_aug(r, [False] * P) for r in range(5))

    # structured: greedy row-order would trap without augmentation
    adj = [[True, True, False, False, False],
           [True, False, False, False, False],
           [False, False, False, False, False],
           [False, False, False, False, False],
           [False, False, False, False, False]]
    assert max_match(adj) == 2
    for _ in range(200):
        adj = (rng.random((5, 5)) < 0.3).tolist()
        best = max(sum(adj[r][perm[r]] for r in range(5))
                   for perm in permutations(range(5)))
        assert max_match(adj) == best


def test_conformal_coverage_and_brute_force(tmp_path):
    from essentials_rd.util import hash64

    rng = np.random.default_rng(71)
    n = 4000
    q = rng.integers(1, 51, n).astype(np.int64)
    cents = (q * 10_000 + rng.normal(0, 20_000, n)).astype(np.int64)
    cents = np.maximum(cents, 1)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "l_linenumber": pa.array(np.ones(n, np.int32), pa.int32()),
        "l_quantity": pa.array(q.astype(float), pa.float64()),
        "l_extendedprice": pa.array(cents / 100.0, pa.float64()),
    }), d / "lineitem.parquet", row_group_size=257)
    out = e._q_conformal(str(d)).to_pydict()
    cov = out["n_covered"][0] / out["n_test"][0]
    # split-conformal marginal-coverage guarantee at q=0.9
    assert 0.86 < cov < 0.94, cov

    # brute-force replay of the whole pipeline
    mix = np.uint64((e.CONF_SEED * 0x9E3779B97F4A7C15) % (1 << 64))
    with np.errstate(over="ignore"):
        z = hash64(np.arange(n, dtype=np.uint64) * np.uint64(8)
                   + np.uint64(1) + mix)
    cal = z < np.uint64(1 << 63)
    cc = np.floor((cents / 100.0) * 100.0 + 0.5).astype(np.int64)
    qc, ccal = q[cal], cc[cal]
    S = dict(n=len(qc), sx=int(qc.sum()), sy=int(ccal.sum()),
             sxx=int((qc * qc).sum()), sxy=int((qc * ccal).sum()))
    den = S["n"] * S["sxx"] - S["sx"] ** 2
    b = S["n"] * S["sxy"] - S["sx"] * S["sy"]
    a = S["sxx"] * S["sy"] - S["sx"] * S["sxy"]
    r = np.array([abs(1000 * int(cc[i])
                      - (1000 * (a + b * int(q[i]))) // den)
                  for i in range(n)], np.int64)
    rc = np.sort(r[cal])
    qhat = int(rc[int(np.ceil(0.9 * len(rc))) - 1])  # quantile_disc rule
    assert out["qhat"] == [qhat]
    assert out["n_cal"] == [int(cal.sum())]
    assert out["n_covered"] == [int((r[~cal] <= qhat).sum())]


def test_isotonic_pava_properties(tmp_path):
    """PAVA fit is monotone, preserves weighted mass, is the L2
    projection (checked vs scipy-free quadratic-program property:
    no adjacent-block merge or split lowers the loss), and the query
    asserts the minimax certificate internally."""
    rng = np.random.default_rng(83)
    n = 3000
    q = rng.integers(1, 21, n).astype(np.int64)
    # decreasing-in-places signal so PAVA must pool
    cents = ((21 - q) * 1000 + rng.normal(0, 3000, n)).astype(np.int64)
    cents = np.maximum(cents, 1)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "l_quantity": pa.array(q.astype(float), pa.float64()),
        "l_extendedprice": pa.array(cents / 100.0, pa.float64()),
    }), d / "lineitem.parquet", row_group_size=301)
    out = e._q_isotonic(str(d)).to_pydict()
    fit = out["fit_q"]
    ns = out["n"]
    mean = out["mean_q"]
    # monotone non-decreasing
    assert all(fit[i] <= fit[i + 1] for i in range(len(fit) - 1))
    # anti-monotone data pools into few blocks; raw means are NOT monotone
    assert any(mean[i] > mean[i + 1] for i in range(len(mean) - 1))
    # weighted mass approximately preserved (quantization only)
    tot_fit = sum(f * w for f, w in zip(fit, ns))
    tot_raw = sum(m * w for m, w in zip(mean, ns))
    assert abs(tot_fit - tot_raw) <= sum(ns)  # ≤1 ulp of 1e-6 per row

    # L2 optimality vs any monotone candidate on the level means:
    # projecting onto blocks of equal value, perturbing any block
    # value respects monotonicity locally → loss non-decreasing
    import itertools
    vals = sorted(set(fit))
    for eps in (-1, 1):
        for v in vals:
            cand = [f + (eps if f == v else 0) for f in fit]
            if all(cand[i] <= cand[i + 1] for i in range(len(cand) - 1)):
                loss0 = sum(w * (m - f) ** 2
                            for w, m, f in zip(ns, mean, fit))
                loss1 = sum(w * (m - c) ** 2
                            for w, m, c in zip(ns, mean, cand))
                assert loss1 >= loss0 - sum(ns) * 2  # quantization slack


def test_lcs_query_matches_brute_force(tmp_path):
    rng = np.random.default_rng(97)
    # two dominant users with known sequences + noise users
    types = ["view", "click", "purchase", "signup", "error"]
    rows = []
    eid = 0
    seq_a = ["view", "click", "view", "purchase", "click", "view",
             "signup", "error", "view", "click"]  # >8: capped to 8
    seq_b = ["click", "view", "purchase", "view", "signup", "click",
             "view", "error", "purchase"]
    for i, t in enumerate(seq_a):
        rows.append((eid, 1000 + i, 7, t)); eid += 1
    for i, t in enumerate(seq_b):
        rows.append((eid, 2000 + i, 9, t)); eid += 1
    for i in range(30):  # noise users with fewer events
        rows.append((eid, 10 + i, 100 + i % 5, types[i % 5])); eid += 1
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }), d / "events.parquet")
    out = e._q_lcs_users(str(d)).to_pydict()
    assert out["user_a"] == [7] and out["user_b"] == [9]
    assert out["len_a"] == [8] and out["len_b"] == [8]
    # brute-force LCS over all subsequences of the capped strings
    enc = {"view": "v", "click": "c", "purchase": "p", "signup": "s",
           "error": "e"}
    sa = "".join(enc[t] for t in seq_a[:8])
    sb = "".join(enc[t] for t in seq_b[:8])
    import itertools
    best = 0
    for k in range(len(sa), 0, -1):
        for comb in itertools.combinations(sa, k):
            sub = "".join(comb)
            it = iter(sb)
            if all(ch in it for ch in sub):
                best = k
                break
        if best:
            break
    assert out["lcs_len"] == [best]


def test_knapsack_dp_equals_enumeration_random():
    """The DP (as used by knapsack_parts) equals brute-force subset
    enumeration on random instances, including degenerate caps."""
    rng = np.random.default_rng(29)
    for trial in range(40):
        n = int(rng.integers(1, 13))
        w = rng.integers(1, 30, n).tolist()
        v = rng.integers(0, 1000, n).tolist()
        cap = int(rng.integers(0, sum(w) + 5))
        dp = [0] * (cap + 1)
        for i in range(n):
            for c in range(cap, w[i] - 1, -1):
                dp[c] = max(dp[c], dp[c - w[i]] + v[i])
        best = 0
        for m in range(1 << n):
            tw = sum(w[i] for i in range(n) if m >> i & 1)
            tv = sum(v[i] for i in range(n) if m >> i & 1)
            if tw <= cap:
                best = max(best, tv)
        assert dp[cap] == best


def test_shapley_efficiency_identity(tmp_path):
    """For linear models Shapley satisfies efficiency exactly:
    sum(phi) + E[y_hat] == y_hat(x) (within float rounding)."""
    rng = np.random.default_rng(37)
    n_orders = 200
    rows = []
    for o in range(1, n_orders + 1):
        k = int(rng.integers(1, 8))
        for _ in range(k):
            rows.append((o, float(rng.integers(1, 51))))
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
    }), d / "lineitem.parquet")
    # y strongly linear in (count, qty) + noise
    import collections
    agg = collections.defaultdict(lambda: [0, 0])
    for o, q in rows:
        agg[o][0] += 1
        agg[o][1] += q
    ok = sorted(agg)
    price = [(agg[o][0] * 500 + agg[o][1] * 90
              + rng.normal(0, 30)) / 100.0 for o in ok]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_totalprice": pa.array(price, pa.float64()),
    }), d / "orders.parquet")
    out = e._q_shapley_linear(str(d)).to_pydict()
    vals = dict(zip(out["term"], out["value"]))
    # replay beta + prediction on the explained point
    x1, x2 = agg[min(ok)]
    ybar = vals["base_rate"]
    # recompute OLS via numpy on exact features for the identity check
    X = np.array([[1, agg[o][0], agg[o][1]] for o in ok], float)
    y = np.array([np.floor(p * 100 + 0.5) for p in price])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    pred = beta @ np.array([1.0, x1, x2])
    lhs = vals["phi_linecount"] + vals["phi_qtysum"] + ybar
    assert abs(lhs - pred) < 1e-3
    # phi signs follow the centered features (strong positive betas)
    mean1 = X[:, 1].mean()
    assert (vals["phi_linecount"] > 0) == (x1 > mean1)


def test_viterbi_brute_force_all_paths(tmp_path):
    """The forward (score, path) carry equals brute-force max over all
    2^n state paths, with the documented tie rule."""
    # one dominant user with a crafted sequence hitting every type
    seq = ["view", "click", "purchase", "error", "signup", "view",
           "error", "purchase"]
    rows = [(i, 100 + i, 5, t) for i, t in enumerate(seq)]
    rows += [(100 + i, 10 + i, 50 + i, "view") for i in range(6)]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }), d / "events.parquet")
    out = e._q_viterbi(str(d)).to_pydict()
    assert out["user_id"] == [5] and out["n_obs"] == [8]
    obs = [e.SEQ_TYPE_MAP[t] for t in seq]
    import itertools
    best = None
    for states in itertools.product((0, 1), repeat=8):
        sc = e.VIT_E[states[0]][obs[0]]
        for i in range(1, 8):
            sc += e.VIT_T[states[i - 1]][states[i]]
            sc += e.VIT_E[states[i]][obs[i]]
        p = "".join("AI"[s] for s in states)
        # tie rule: higher score wins; then lexicographically smaller
        # path (A < I) — the per-step earlier-state preference
        key = (sc, tuple(-s for s in states))
        if best is None or key > best[0]:
            best = (key, sc, p)
    assert out["score"] == [best[1]]
    assert out["path"] == [best[2]]


def test_weighted_median_brute_force(tmp_path):
    rng = np.random.default_rng(63)
    n = 2000
    q = rng.integers(1, 30, n).astype(np.int64)
    c = rng.integers(100, 10**6, n).astype(np.int64)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "l_quantity": pa.array(q.astype(float), pa.float64()),
        "l_extendedprice": pa.array(c / 100.0, pa.float64()),
    }), d / "lineitem.parquet", row_group_size=173)
    out = e._q_weighted_median(str(d)).to_pydict()
    # brute force: expand each level by weight and take lower median
    import collections
    wsum = collections.Counter()
    for qi, ci in zip(q, c):
        wsum[int(qi)] += int(ci)
    total = sum(wsum.values())
    cum = 0
    for lvl in sorted(wsum):
        cum += wsum[lvl]
        if 2 * cum >= total:
            want = lvl
            break
    assert out["w_median_qty"] == [want]
    assert out["total_weight"] == [total]
    # L1 optimality: the weighted median minimizes sum w|q - m|
    def loss(m):
        return sum(w * abs(lvl - m) for lvl, w in wsum.items())
    assert loss(want) <= min(loss(want - 1), loss(want + 1))


def test_lis_patience_equals_dp_random():
    """The patience algorithm (engine) equals the quadratic DP (oracle
    shape) on random sequences including ties (strict increase)."""
    import bisect

    rng = np.random.default_rng(85)
    for _ in range(300):
        n = int(rng.integers(1, 9))
        vals = rng.integers(0, 6, n).tolist()  # small range → many ties
        piles = []
        for v in vals:
            i = bisect.bisect_left(piles, v)
            if i == len(piles):
                piles.append(v)
            else:
                piles[i] = v
        f = [1] * n
        for i in range(n):
            for j in range(i):
                if vals[j] < vals[i]:
                    f[i] = max(f[i], f[j] + 1)
        assert len(piles) == max(f)


def test_boost_hist_brute_force_and_improvement():
    """_boost_from_hist vs an exhaustive row-level reference, and the
    boosted vote never scores below the first stump on a separable-ish
    histogram."""
    rng = np.random.default_rng(47)
    for _ in range(25):
        bands = sorted(rng.choice(40, size=8, replace=False).tolist())
        hist = {int(b): (int(rng.integers(0, 30)),
                         int(rng.integers(0, 30))) for b in bands}
        if sum(p + q for p, q in hist.values()) == 0:
            continue
        res = e._boost_from_hist(hist)
        n = res["n"]
        # brute-force stump-1 search at row level
        cands = bands + [bands[-1] + 1]
        best = None
        for t in cands:
            for d in (0, 1):
                err = 0
                for b, (p, q) in hist.items():
                    s = (1 if b >= t else 0) if d == 0 else \
                        (1 if b < t else 0)
                    err += q if s == 1 else p
                key = (err, t, d)
                if best is None or key < best:
                    best = key
        assert (res["e1"], res["t1"], res["d1"]) == best
        # final combined training accuracy >= stump-1 accuracy is NOT
        # guaranteed in general, but correctness bounds always hold:
        assert 0 <= res["final_correct"] <= n
        assert res["e2w"] <= sum(
            p * res["k"] + q * res["k"]
            for p, q in hist.values())  # trivial upper bound


def test_learned_index_eps_brute_force(tmp_path):
    """Exact OLS rank fit + max residual vs numpy lstsq reference, and
    the epsilon actually bounds every lookup error."""
    rng = np.random.default_rng(99)
    # keys with non-uniform gaps so the fit has real error
    keys = np.unique(np.cumsum(rng.integers(1, 100, 500))).astype(np.int64)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"o_orderkey": pa.array(
        rng.permutation(keys))}), d / "orders.parquet",
        row_group_size=47)
    out = e._q_learned_index(str(d)).to_pydict()
    n = len(keys)
    assert out["n_keys"] == [n]
    r = np.arange(1, n + 1, dtype=np.int64)
    S = dict(n=n, sk=int(keys.sum()), sr=int(r.sum()),
             skk=int((keys.astype(object) ** 2).sum()),
             skr=int((keys.astype(object) * r.astype(object)).sum()))
    den = S["n"] * S["skk"] - S["sk"] ** 2
    b = S["n"] * S["skr"] - S["sk"] * S["sr"]
    a = S["skk"] * S["sr"] - S["sk"] * S["skr"]
    mx = max(abs(den * int(r[i]) - (a + b * int(keys[i])))
             for i in range(n))
    assert out["max_res_scaled"] == [str(mx)]
    assert out["eps_ranks"] == [mx // den]
    # epsilon bounds every error of the float least-squares line too
    # (same line up to rounding): check against numpy predictions
    bb = np.polyfit(keys.astype(float), r.astype(float), 1)
    pred = np.polyval(bb, keys.astype(float))
    assert np.abs(pred - r).max() <= out["eps_ranks"][0] + 1.5


def test_sign_test_exact_binomial(tmp_path):
    """Engine tail vs scipy-free exact binomial on planted win/loss
    patterns, including the all-wins and balanced cases."""
    from math import comb

    def build(days_pw, days_vw):
        # one purchase-win day = purchase 200, view 100; loss reversed
        rows_ty, rows_ts, rows_v = [], [], []
        day = 0
        for _ in range(days_pw):
            rows_ty += ["purchase", "view"]
            rows_ts += [day * 86_400_000_000 + 1000,
                        day * 86_400_000_000 + 2000]
            rows_v += [2.0, 1.0]
            day += 1
        for _ in range(days_vw):
            rows_ty += ["purchase", "view"]
            rows_ts += [day * 86_400_000_000 + 1000,
                        day * 86_400_000_000 + 2000]
            rows_v += [1.0, 2.0]
            day += 1
        return rows_ty, rows_ts, rows_v

    for w, l in [(10, 0), (7, 3), (5, 5), (0, 8), (1, 1)]:
        ty, ts, v = build(w, l)
        d = tmp_path / f"sf_{w}_{l}"
        d.mkdir()
        pq.write_table(pa.table({
            "event_type": pa.array(ty, pa.string()),
            "ts": pa.array(np.array(ts, np.int64), pa.timestamp("us")),
            "value": pa.array(v, pa.float64()),
        }), d / "events.parquet")
        out = e._q_sign_test(str(d)).to_pydict()
        n = w + l
        m = min(w, l)
        tail = sum(comb(n, i) for i in range(n + 1)
                   if i <= m or i >= n - m)
        tail = min(tail, 1 << n)
        assert out == {"n_days": [n], "n_purchase_wins": [w],
                       "p_two_sided_q6": [(1_000_000 * tail) >> n]}
    # balanced case has p = 1 (q6 = 1e6); extreme case tiny
    ty, ts, v = build(10, 0)


def test_herfindahl_bounds_and_brute_force(tmp_path):
    rng = np.random.default_rng(53)
    n_c, n_o, n_l = 40, 120, 600
    ck = np.arange(1, n_c + 1, dtype=np.int64)
    cn = rng.integers(0, 5, n_c).astype(np.int64)
    ok = np.arange(1, n_o + 1, dtype=np.int64)
    oc = rng.choice(ck, n_o)
    lk = rng.choice(ok, n_l)
    price = rng.integers(100, 10**6, n_l).astype(np.int64)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({"l_orderkey": pa.array(lk),
                             "l_extendedprice": pa.array(price / 100.0)}),
                   d / "lineitem.parquet")
    pq.write_table(pa.table({"o_orderkey": pa.array(ok),
                             "o_custkey": pa.array(oc)}),
                   d / "orders.parquet")
    pq.write_table(pa.table({"c_custkey": pa.array(ck),
                             "c_nationkey": pa.array(cn)}),
                   d / "customer.parquet")
    out = e._q_herfindahl(str(d)).to_pydict()
    import collections
    rev = collections.Counter()
    o2n = dict(zip(ok, cn[oc - 1]))
    for k, p in zip(lk, price):
        # floor(p/100*100+0.5) round trip == p for integer cents
        rev[o2n[int(k)]] += int(p)
    tot = sum(rev.values())
    want = (1_000_000 * sum(v * v for v in rev.values())) // (tot * tot)
    assert out["hhi_q6"] == [want]
    assert out["total_cents"] == [tot]
    k = out["n_nations"][0]
    assert 1_000_000 // k <= want <= 1_000_000  # HHI bounds


def test_gale_shapley_certificate_random():
    """Deferred acceptance equals the enumeration-based
    proposer-optimal stable matching on random 4x4 preference
    matrices (the certificate the oracle twin relies on)."""
    from itertools import permutations

    rng = np.random.default_rng(57)
    for _ in range(60):
        cnt = rng.integers(0, 100, (4, 4)).tolist()
        pref_r = [sorted(range(4), key=lambda p: (-cnt[r][p], p))
                  for r in range(4)]
        rank_p = []
        for p in range(4):
            order = sorted(range(4), key=lambda r: (-cnt[r][p], r))
            rk = [0] * 4
            for pos, r in enumerate(order):
                rk[r] = pos
            rank_p.append(rk)
        nxt = [0] * 4
        match_p = [-1] * 4
        free = [0, 1, 2, 3]
        while free:
            r = free.pop(0)
            p = pref_r[r][nxt[r]]
            nxt[r] += 1
            if match_p[p] == -1:
                match_p[p] = r
            elif rank_p[p][r] < rank_p[p][match_p[p]]:
                free.append(match_p[p])
                match_p[p] = r
            else:
                free.append(r)
        match_r = [0] * 4
        for p, r in enumerate(match_p):
            match_r[r] = p

        def blocked(perm):
            inv = {perm[r]: r for r in range(4)}
            for r in range(4):
                for p in range(4):
                    if perm[r] != p and \
                       pref_r[r].index(p) < pref_r[r].index(perm[r]) \
                       and rank_p[p][r] < rank_p[p][inv[p]]:
                        return True
            return False

        stable_set = [perm for perm in permutations(range(4))
                      if not blocked(perm)]
        assert tuple(match_r) in [tuple(s) for s in stable_set]
        best = min((tuple(pref_r[r].index(perm[r]) for r in range(4)),
                    perm) for perm in stable_set)
        assert tuple(best[1]) == tuple(match_r)


def test_hungarian_equals_enumeration_random():
    from itertools import permutations

    rng = np.random.default_rng(67)
    for n in (2, 3, 4, 5):
        for _ in range(40):
            cost = rng.integers(0, 50, (n, n)).tolist()
            m = e._hungarian_min(cost)
            assert sorted(m) == list(range(n))  # a permutation
            got = sum(cost[i][m[i]] for i in range(n))
            best = min(sum(cost[i][perm[i]] for i in range(n))
                       for perm in permutations(range(n)))
            assert got == best


def test_erdos_gallai_on_synthetic_sequences():
    """The per-k inequality evaluation matches a direct implementation
    and correctly FAILS for a non-graphical sequence."""
    def eg(d, k):
        d = sorted(d, reverse=True)
        lhs = sum(d[:k])
        rhs = k * (k - 1) + sum(min(x, k) for x in d[k:])
        return lhs, rhs

    # star graph K_{1,5}: degrees [5,1,1,1,1,1] — graphical
    d = [5, 1, 1, 1, 1, 1]
    for k in range(1, 6):
        lhs, rhs = eg(d, k)
        assert lhs <= rhs
    # non-graphical: [6,1,1,1,1,1] (sum odd AND head too big)
    bad = [6, 1, 1, 1, 1, 1]
    assert any(eg(bad, k)[0] > eg(bad, k)[1] for k in range(1, 6))
    # random graphical sequences (built from actual random graphs)
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = 30
        deg = np.zeros(n, np.int64)
        for _e in range(100):
            i, j = rng.choice(n, 2, replace=False)
            deg[i] += 1
            deg[j] += 1
        for k in range(1, 11):
            lhs, rhs = eg(deg.tolist(), k)
            assert lhs <= rhs


def test_condorcet_winner_and_paradox():
    """The pairwise logic (as in condorcet_priority) finds the winner
    when one exists and reports none on the classic rock-paper-
    scissors cycle."""
    def run(ballots, cands):
        wins = {}
        for ballot in ballots:
            rank = {p: i for i, p in enumerate(ballot)}
            for a in cands:
                for b in cands:
                    if a != b and rank[a] < rank[b]:
                        wins[(a, b)] = wins.get((a, b), 0) + 1
        nr = len(ballots)
        for a in sorted(cands):
            if all(wins.get((a, b), 0) * 2 > nr
                   for b in cands if b != a):
                return a
        return ""

    # clear winner: 'x' tops 2 of 3 ballots and beats all pairwise
    assert run([["x", "y", "z"], ["x", "z", "y"], ["y", "x", "z"]],
               ["x", "y", "z"]) == "x"
    # Condorcet paradox: cyclic majorities → no winner
    assert run([["a", "b", "c"], ["b", "c", "a"], ["c", "a", "b"]],
               ["a", "b", "c"]) == ""


def test_simpson_paradox_planted_reversal(tmp_path):
    """A textbook Simpson construction: within every group the slope
    is negative, pooled it is positive — the audit must flag the full
    reversal."""
    rows_lk, rows_q, rows_p = [], [], []
    ok, oc = [], []
    ck, cn = [], []
    # group 0 (nation 0): x in [1,5], y = 100 - x  (negative slope)
    # group 1 (nation 1): x in [20,24], y = 300 - x (negative slope)
    # pooled: group 1 has much larger x AND y → positive pooled slope
    order = 1
    cust_id = 1
    for nat, (x0, ybase) in enumerate([(1, 100), (20, 3000)]):
        ck.append(cust_id)
        cn.append(nat)
        for i in range(5):
            ok.append(order)
            oc.append(cust_id)
            for _ in range(3):
                rows_lk.append(order)
                rows_q.append(float(x0 + i))
                rows_p.append((ybase - (x0 + i)) / 100.0)
            order += 1
        cust_id += 1
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rows_lk, pa.int64()),
        "l_quantity": pa.array(rows_q, pa.float64()),
        "l_extendedprice": pa.array(rows_p, pa.float64()),
    }), d / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_custkey": pa.array(oc, pa.int64()),
    }), d / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array(ck, pa.int64()),
        "c_nationkey": pa.array(cn, pa.int64()),
    }), d / "customer.parquet")
    out = e._q_simpson(str(d)).to_pydict()
    assert out["n_groups"] == [2]
    assert out["pooled_sign"] == [1]
    assert out["n_disagree"] == [2]
    assert out["full_reversal"] == [1]


def test_pareto_point_and_fano(tmp_path):
    # pareto: 1 whale + 9 minnows; whale alone holds >= 80%
    u = [0] * 10 + [i for i in range(1, 10)]
    v = [100.0] * 10 + [1.0] * 9
    d = tmp_path / "sf"
    d.mkdir()
    ts = np.arange(len(u), dtype=np.int64) * 3_600_000_000
    pq.write_table(pa.table({
        "user_id": pa.array(u, pa.int64()),
        "value": pa.array(v, pa.float64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), d / "events.parquet")
    out = e._q_pareto_point(str(d)).to_pydict()
    assert out["k_top"] == [1]
    assert out["top_share_q6"][0] >= 800_000

    # fano: constant hourly counts → variance 0 → fano 0;
    # the same events all in ONE hour → strongly overdispersed
    out2 = e._q_fano(str(d)).to_pydict()
    assert out2["grid_hours"] == [len(u)]
    assert out2["fano_q6"] == [0]  # exactly one event per hour
    pq.write_table(pa.table({
        "ts": pa.array(np.zeros(50, np.int64) + 123,
                       pa.timestamp("us")),
    }), d / "events.parquet")
    out3 = e._q_fano(str(d)).to_pydict()
    # single-hour burst: m=1, fano = 1e6*(S2 - S^2)/S = ... m*s2-s*s = 0
    assert out3["fano_q6"] == [0]  # degenerate single-cell grid
    # two-hour grid, all mass in one hour: maximal burstiness
    tsb = np.array([0] * 49 + [3_600_000_000], np.int64)
    pq.write_table(pa.table({"ts": pa.array(tsb, pa.timestamp("us"))}),
                   d / "events.parquet")
    out4 = e._q_fano(str(d)).to_pydict()
    m, S = 2, 50
    S2 = 49 * 49 + 1
    assert out4["fano_q6"] == [(1_000_000 * (m * S2 - S * S)) // (m * S)]
    assert out4["fano_q6"][0] > 1_000_000  # overdispersed


def test_hot_ranking_decay(tmp_path):
    """A recent moderate spender outranks an ancient big spender once
    the shift decay bites; scores match a per-event replay."""
    rows = []
    now = 10_000 * 3_600_000_000
    # user 1: 1000.00 spent ~3 half-lives ago → decayed by >>3
    for i in range(4):
        rows.append((1, now - (3 * 168 + 1) * 3_600_000_000, 250.0))
    # user 2: 200.00 spent now → undecayed
    rows.append((2, now, 200.0))
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64),
                       pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }), d / "events.parquet")
    out = e._q_hot_ranking(str(d)).to_pydict()
    got = dict(zip(out["user_id"], out["hot_score"]))
    # replay: user1 events at age 505h → shift 3 → 25000 >> 3 = 3125 ×4
    assert got[1] == (25000 >> 3) * 4
    assert got[2] == 20000
    assert out["user_id"][0] == 2  # recency wins despite smaller spend


def test_shamir_every_3_subset_reconstructs_2_does_not():
    """Threshold property: all C(5,3) subsets reconstruct the secret;
    any 2 shares are consistent with EVERY possible secret."""
    from itertools import combinations

    p = e.SHAMIR_P
    rng = np.random.default_rng(11)
    for _ in range(10):
        secret, a1, a2 = (int(rng.integers(0, p)) for _ in range(3))
        shares = {x: (secret + a1 * x + a2 * x * x) % p
                  for x in range(1, 6)}

        def lagrange0(pts):
            out = 0
            for i, xi in enumerate(pts):
                num = den = 1
                for j, xj in enumerate(pts):
                    if j != i:
                        num = num * (-xj) % p
                        den = den * (xi - xj) % p
                w = num * pow(den, p - 2, p) % p
                out = (out + w * shares[xi]) % p
            return out

        for pts in combinations(range(1, 6), 3):
            assert lagrange0(list(pts)) == secret
        # 2 shares: for ANY candidate secret s', a valid degree-2
        # polynomial through the two shares and (0, s') exists →
        # information-theoretic secrecy (verify for a few s')
        x1, x2 = 1, 2
        for sp in (0, 12345, p - 1):
            # solve a1', a2' from the 2x2 system mod p
            # s' + a1 x1 + a2 x1² = sh1 ; s' + a1 x2 + a2 x2² = sh2
            d = (x1 * x2 * x2 - x2 * x1 * x1) % p
            r1 = (shares[x1] - sp) % p
            r2 = (shares[x2] - sp) % p
            a2p = (r2 * x1 - r1 * x2) % p * pow(d, p - 2, p) % p
            a1p = (r1 - a2p * x1 * x1) % p * pow(x1, p - 2, p) % p
            assert (sp + a1p * x1 + a2p * x1 * x1) % p == shares[x1]
            assert (sp + a1p * x2 + a2p * x2 * x2) % p == shares[x2]
    # the query's fixed weights match freshly derived ones
    def lam(pts, i):
        num = den = 1
        for j, xj in enumerate(pts):
            if j != i:
                num = num * (-xj) % p
                den = den * (pts[i] - xj) % p
        return num * pow(den, p - 2, p) % p
    for i, x in enumerate((1, 3, 5)):
        assert e.SHAMIR_W[x] == lam([1, 3, 5], i)
