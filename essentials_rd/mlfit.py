"""Distributed closed-form model fitting over exact integer sums.

``ols_fit_exact`` fits ordinary least squares y ~ X·b where every
feature and target is integer-valued: the normal equations' Gram
matrix XᵀX and moment vector Xᵀy are plain SUMS of per-row integer
products, so they accumulate as one pre-combined partial row per block
(zero shuffle, the ``table_checksum`` scale shape) and the driver
folds partials with unbounded Python ints — no precision loss at any
row count.  The solve is Cramer's rule over exact integer
determinants (fraction-free Bareiss elimination), so the ONLY floating
point in the whole fit is the final ``float(det_i) / float(det)`` —
which an SQL twin reproduces bit-for-bit as
``CAST(det_i AS DOUBLE) / CAST(det AS DOUBLE)`` from HUGEINT sums.

This is the pattern for closed-form distributed training at 100 TB:
the data pass is embarrassingly parallel and touches each row once;
the model (p², p ≤ dozens) is driver-sized.  Iterative GD adds
nothing for linear least squares.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray.data as rd


def int_det(m: list[list[int]]) -> int:
    """Exact determinant of an integer matrix via fraction-free
    (Bareiss) elimination in unbounded Python ints."""
    a = [[int(x) for x in row] for row in m]
    n = len(a)
    if n == 0:
        return 1  # det of the empty matrix (all-minors convention)
    sign = 1
    prev = 1
    for k in range(n - 1):
        if a[k][k] == 0:
            swap = next((i for i in range(k + 1, n) if a[i][k] != 0), None)
            if swap is None:
                return 0
            a[k], a[swap] = a[swap], a[k]
            sign = -sign
        for i in range(k + 1, n):
            for j in range(k + 1, n):
                a[i][j] = (a[i][j] * a[k][k] - a[i][k] * a[k][j]) // prev
            a[i][k] = 0
        prev = a[k][k]
    return sign * a[n - 1][n - 1]


def gram_sums(
    ds: rd.Dataset,
    xy_fn: Callable[[pa.Table], tuple[np.ndarray, np.ndarray]],
    p: int,
) -> tuple[list[list[int]], list[int], int, int]:
    """One distributed pass: ``xy_fn(batch) -> (X[n,p] int64, y[n]
    int64)``; returns (XᵀX as Python-int rows, Xᵀy, n, yᵀy).

    Per-block partials stay in int64 (callers keep per-row products
    under ~1e12 so million-row blocks can't overflow); the cross-block
    fold is unbounded Python ints.
    """
    iu = np.triu_indices(p)

    def _partial(batch: pa.Table) -> pa.Table:
        X, y = xy_fn(batch)
        X = X.astype(np.int64)
        y = y.astype(np.int64)
        g = X.T @ X                    # p×p int64
        c = X.T @ y                    # p int64
        vals = np.r_[g[iu], c, [len(y), int(y @ y)]]
        return pa.table({
            "i": pa.array(np.arange(len(vals), dtype=np.int64)),
            "v": pa.array(vals, pa.int64()),
        })

    rows = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    n_tri = len(iu[0])
    acc = [0] * (n_tri + p + 2)
    for r in rows:
        acc[r["i"]] += int(r["v"])
    gram = [[0] * p for _ in range(p)]
    for t, (i, j) in enumerate(zip(*iu)):
        gram[i][j] = gram[j][i] = acc[t]
    xty = acc[n_tri:n_tri + p]
    n, yty = acc[n_tri + p], acc[n_tri + p + 1]
    return gram, xty, n, yty


def ols_fit_exact(
    ds: rd.Dataset,
    xy_fn: Callable[[pa.Table], tuple[np.ndarray, np.ndarray]],
    p: int,
    ridge: int = 0,
) -> tuple[list[float], dict]:
    """OLS coefficients b = (XᵀX)⁻¹ Xᵀy via exact integer Cramer:
    b_i = float(det(A with col i ← Xᵀy)) / float(det(A)).  Integer
    ``ridge`` adds λ to every non-intercept diagonal entry (Tikhonov
    with an unpenalized intercept) — still exact, since λ is an int.
    Returns (coefs, info) with info carrying the exact integer sums."""
    gram, xty, n, yty = gram_sums(ds, xy_fn, p)
    a = [row[:] for row in gram]
    for i in range(1, p):
        a[i][i] += int(ridge)
    det = int_det(a)
    if det == 0:
        raise ValueError("singular design matrix (collinear features)")
    coefs = []
    for i in range(p):
        a_i = [row[:i] + [xty[r]] + row[i + 1:]
               for r, row in enumerate(a)]
        coefs.append(float(int_det(a_i)) / float(det))
    return coefs, {"gram": gram, "xty": xty, "n": n, "yty": yty,
                   "det": det}


def grouped_simple_ols(
    ds: rd.Dataset,
    kxy_fn: Callable[[pa.Table], tuple[np.ndarray, np.ndarray, np.ndarray]],
    num_buckets: int = 8,
) -> pa.Table:
    """Per-group simple regression y ~ a + b·x with integer keys and
    values: per-block partial rows (key, n, Σx, Σy, Σxy, Σx²) — a
    lexsort + reduceat, no Python per group — then ONE small bucketed
    fold, and the 2×2 Cramer solve per group:
    b = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²̄), a = (Σy − b·Σx)/n with the
    numerators/denominators exact int64.  Returns (key, n, slope,
    intercept) sorted by key; groups with zero x-variance report
    NULL slope/intercept (SQL twin: the same CASE).

    Scale shape: the exchange moves ≤ #distinct-keys × blocks partial
    rows of five ints — never the data."""
    from .ops import grouped_pandas_agg

    def _partial(batch: pa.Table) -> pa.Table:
        k, x, y = kxy_fn(batch)
        k = k.astype(np.int64)
        x = x.astype(np.int64)
        y = y.astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, x, y = k[order], x[order], y[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]]) \
            if len(k) else np.zeros(0, np.int64)
        n = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        out = {"key": k[starts], "n": n}
        for name, v in (("sx", x), ("sy", y), ("sxy", x * y),
                        ("sxx", x * x)):
            out[name] = np.add.reduceat(v, starts) if len(v) else v
        return pa.table({c: pa.array(a, pa.int64())
                         for c, a in out.items()})

    folded = grouped_pandas_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        keys=["key"],
        aggs={c: (c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx")},
        num_buckets=num_buckets,
    ).take_all()
    folded.sort(key=lambda r: r["key"])
    keys, ns, slopes, intercepts = [], [], [], []
    for r in folded:
        n, sx, sy, sxy, sxx = (int(r[c]) for c in
                               ("n", "sx", "sy", "sxy", "sxx"))
        den = n * sxx - sx * sx
        if den == 0:
            b = a = None
        else:
            b = float(n * sxy - sx * sy) / float(den)
            a = (float(sy) - b * float(sx)) / float(n)
        keys.append(r["key"])
        ns.append(n)
        slopes.append(b)
        intercepts.append(a)
    return pa.table({
        "key": pa.array(keys, pa.int64()),
        "n": pa.array(ns, pa.int64()),
        "slope": pa.array(slopes, pa.float64()),
        "intercept": pa.array(intercepts, pa.float64()),
    })


def gini_split_table(
    ds: rd.Dataset,
    band_fn: Callable[[pa.Table], np.ndarray],
    label_fn: Callable[[pa.Table], np.ndarray],
) -> pa.Table:
    """Decision-stump split evaluation with exact integer counts:
    for every candidate threshold t (each distinct feature band
    except the last), the left/right class counts of the split
    ``band <= t`` and the weighted Gini impurity — the sufficient
    statistic CART computes per node, as one streaming pass.

    ``band_fn(batch) -> int64`` is the (already-quantized) feature;
    ``label_fn(batch) -> {0,1} int64`` the class.  Scale shape: each
    block emits one (band, n, n_pos) partial histogram — bands are
    bounded by construction (quantization IS the candidate pruning,
    as in histogram-based GBDT a la LightGBM) — the driver folds a
    band-sized table, prefix-sums it, and the ONLY floats are the
    final per-candidate impurity reads
    (nl² − pl² − ql²)/nl + (nr² − pr² − qr²)/nr, all over N, each
    division a single IEEE op an SQL twin reproduces bit-for-bit."""

    def _partial(t: pa.Table) -> pa.Table:
        b = np.asarray(band_fn(t), np.int64)
        y = np.asarray(label_fn(t), np.int64)
        ub, inv = np.unique(b, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        p = np.bincount(inv, weights=y).astype(np.int64)
        return pa.table({"band": pa.array(ub, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "p": pa.array(p, pa.int64())})

    agg: dict[int, list[int]] = {}
    for r in ds.map_batches(_partial, batch_format="pyarrow").take_all():
        e = agg.setdefault(int(r["band"]), [0, 0])
        e[0] += int(r["n"])
        e[1] += int(r["p"])
    bands = sorted(agg)
    N = sum(agg[b][0] for b in bands)
    P = sum(agg[b][1] for b in bands)
    thr, nls, pls, nrs, prs, ginis = [], [], [], [], [], []
    nl = pl = 0
    for b in bands[:-1]:
        nl += agg[b][0]
        pl += agg[b][1]
        nr, pr = N - nl, P - pl
        ql, qr = nl - pl, nr - pr
        g = (float(nl * nl - pl * pl - ql * ql) / float(nl)
             + float(nr * nr - pr * pr - qr * qr) / float(nr)) / float(N)
        thr.append(b)
        nls.append(nl)
        pls.append(pl)
        nrs.append(nr)
        prs.append(pr)
        ginis.append(g)
    return pa.table({
        "thr": pa.array(thr, pa.int64()),
        "n_left": pa.array(nls, pa.int64()),
        "pos_left": pa.array(pls, pa.int64()),
        "n_right": pa.array(nrs, pa.int64()),
        "pos_right": pa.array(prs, pa.int64()),
        "gini": pa.array(ginis, pa.float64()),
    })


def spearman_exact(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    *,
    n_parts: int = 16,
    num_buckets: int = 64,
) -> pa.Table:
    """Exact Spearman rank correlation with average-tie ranks, over two
    int64 columns — rho = Pearson over the rank transforms, the robust
    monotone-association statistic.  Doubled average ranks stay
    integer (2·avgrank(v) = 2·cnt_below(v) + cnt(v) + 1), so with
    centered ranks c = 2r − (n+1) the three sums Σcx², Σcy², Σcx·cy
    are EXACT int64 and rho = Σcxcy / √(Σcx²·Σcy²) has exactly one
    float expression, reproducible bit-for-bit in SQL (emitted half-up
    6dp).

    Distributed plan — no row-level sort anywhere: per-column value
    histogram (per-block unique + one bucketed combine), then
    ``global_cumsum`` over the DISTINCT-VALUE table turns counts into
    rank lookups (|distinct| rows move, never the data), two hash
    joins ship each row its doubled ranks, and one streaming pass
    folds per-block int64 moment partials driver-side in unbounded
    Python ints.  Guard: n < 2,000,000 keeps per-block Σc² partials
    inside int64 (|c| < n); HUGEINT/float128 per-block partials are
    the 100-TB path."""
    from .ops import global_cumsum, hash_bucket_agg, join, segment_sum_sorted
    from .util import np_col

    ds = ds.materialize()  # two hist passes + the join pass share blocks

    def _hist(col: str) -> rd.Dataset:
        def _partial(b: pa.Table) -> pa.Table:
            u, c = np.unique(np_col(b, col), return_counts=True)
            return pa.table({col: pa.array(u, pa.int64()),
                             "cnt": pa.array(c.astype(np.int64), pa.int64())})

        def _combine(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({col: pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            k = np_col(g, col)
            v = np_col(g, "cnt")
            order = np.argsort(k, kind="stable")
            u, s, _ = segment_sum_sorted(k[order], v[order])
            return pa.table({col: pa.array(u, pa.int64()),
                             "cnt": pa.array(s, pa.int64())})

        return hash_bucket_agg(
            ds.select_columns([col]).map_batches(
                _partial, batch_format="pyarrow"),
            lambda b: np_col(b, col), _combine, num_buckets=num_buckets)

    def _ranks(col: str, rcol: str) -> tuple[rd.Dataset, int]:
        hist = _hist(col).materialize()
        n = int(hist.sum("cnt") or 0)
        cum = global_cumsum(
            hist, col, [], "cnt",
            lambda b: np_col(b, col), n_parts=n_parts)

        def _r2(t: pa.Table) -> pa.Table:
            pf = np_col(t, "prefix")
            c = np_col(t, "cnt")
            return pa.table({col: t.column(col).cast(pa.int64()),
                             rcol: pa.array(2 * pf + c + 1, pa.int64())})

        return cum.map_batches(_r2, batch_format="pyarrow"), n

    rx_tbl, n = _ranks(x_col, "rx2")
    ry_tbl, n_y = _ranks(y_col, "ry2")
    assert n == n_y
    assert n < 2_000_000, "per-block int64 moment partials need n < 2e6"
    if n == 0:
        return pa.table({
            "n": pa.array([0], pa.int64()),
            "sxx": pa.array([0], pa.int64()),
            "syy": pa.array([0], pa.int64()),
            "sxy": pa.array([0], pa.int64()),
            "rho": pa.array([0.0], pa.float64()),
        })

    ranked = join(join(ds, rx_tbl, on=x_col), ry_tbl, on=y_col)

    def _moments(t: pa.Table) -> pa.Table:
        cx = np_col(t, "rx2") - np.int64(n + 1)
        cy = np_col(t, "ry2") - np.int64(n + 1)
        return pa.table({
            "sxx": pa.array([int(cx @ cx)], pa.int64()),
            "syy": pa.array([int(cy @ cy)], pa.int64()),
            "sxy": pa.array([int(cx @ cy)], pa.int64()),
        })

    sxx = syy = sxy = 0
    for r in ranked.map_batches(
            _moments, batch_format="pyarrow").take_all():
        sxx += int(r["sxx"])
        syy += int(r["syy"])
        sxy += int(r["sxy"])
    if sxx == 0 or syy == 0:
        rho = 0.0
    else:
        import math
        # float(sxx) * float(syy), NOT float(sxx*syy): the SQL twin
        # multiplies DOUBLEs (the exact product overflows BIGINT)
        rho = math.floor(
            float(sxy) / math.sqrt(float(sxx) * float(syy)) * 1e6
            + 0.5) / 1e6
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "sxx": pa.array([sxx], pa.int64()),
        "syy": pa.array([syy], pa.int64()),
        "sxy": pa.array([sxy], pa.int64()),
        "rho": pa.array([rho], pa.float64()),
    })


def kendall_tau_b(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    *,
    max_cells: int = 4_000_000,
) -> pa.Table:
    """Exact Kendall tau-b rank correlation over two BOUNDED-cardinality
    int64 columns, by the contingency-table identity — the
    concordance-based companion to ``spearman_exact`` that prices every
    PAIR of rows instead of every rank: with cell counts n_ab,

        conc = Σ_ab n_ab · Σ_{a'>a, b'>b} n_a'b'   (each concordant
               pair counted once, from its lower-left cell)
        disc = Σ_ab n_ab · Σ_{a'>a, b'<b} n_a'b'
        n0 = n(n−1)/2,  ties_x = Σ_a t_a(t_a−1)/2,  ties_y likewise
        tau_b = (conc − disc) / √((n0−ties_x)·(n0−ties_y))

    Every statistic is an exact integer (Python-int fold, int64 guard
    n < 2³¹ so per-cell products stay under 2⁶²); tau is ONE float
    expression — ``float(conc−disc) / sqrt(float(n0−tx)·float(n0−ty))``
    half-up 6dp — the SQL twin reproduces with DOUBLE-cast factors
    (the exact tie products overflow BIGINT).  NULL tau on a constant
    column (n0 == ties).

    Scale shape: one streaming pass with per-block bounded (x, y, n)
    partials — ZERO shuffles, the contingency table is the operator's
    contract — then suffix-cumsum matrix math over the cells-sized
    driver table.  O(|X|·|Y|) driver work, data rows never move."""
    import pandas as pd

    from .util import np_col

    sel = ds.select_columns([x_col, y_col])

    def _partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "x": np_col(t, x_col).astype(np.int64),
            "y": np_col(t, y_col).astype(np.int64),
        })
        g = df.groupby(["x", "y"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = sel.map_batches(_partial, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table({
            "n": pa.array([0], pa.int64()),
            "conc": pa.array([0], pa.int64()),
            "disc": pa.array([0], pa.int64()),
            "ties_x": pa.array([0], pa.int64()),
            "ties_y": pa.array([0], pa.int64()),
            "tau": pa.array([None], pa.float64()),
        })
    cells = pd.DataFrame(parts).groupby(["x", "y"], as_index=False)["n"].sum()
    n = int(cells.n.sum())
    assert n < (1 << 31), "n < 2^31 keeps per-cell products inside int64"
    xs = np.sort(cells.x.unique())
    ys = np.sort(cells.y.unique())
    assert len(xs) * len(ys) <= max_cells, "bounded-cardinality contract"
    M = np.zeros((len(xs), len(ys)), np.int64)
    M[np.searchsorted(xs, cells.x.to_numpy(np.int64)),
      np.searchsorted(ys, cells.y.to_numpy(np.int64))] = \
        cells.n.to_numpy(np.int64)
    # rows strictly below (x' > x), per column
    rows_gt = np.zeros_like(M)
    rows_gt[:-1] = np.cumsum(M[::-1], axis=0)[::-1][1:]
    # strictly-greater / strictly-smaller column prefixes of rows_gt
    gt = np.zeros_like(M)
    gt[:, :-1] = np.cumsum(rows_gt[:, ::-1], axis=1)[:, ::-1][:, 1:]
    lt = np.zeros_like(M)
    lt[:, 1:] = np.cumsum(rows_gt, axis=1)[:, :-1]
    conc = int((M * gt).sum())
    disc = int((M * lt).sum())
    tx = cells.groupby("x")["n"].sum().to_numpy(np.int64)
    ty = cells.groupby("y")["n"].sum().to_numpy(np.int64)
    ties_x = int(sum(int(t) * (int(t) - 1) // 2 for t in tx))
    ties_y = int(sum(int(t) * (int(t) - 1) // 2 for t in ty))
    n0 = n * (n - 1) // 2
    if n0 == ties_x or n0 == ties_y:
        tau = None
    else:
        import math
        tau = math.floor(
            float(conc - disc)
            / math.sqrt(float(n0 - ties_x) * float(n0 - ties_y))
            * 1e6 + 0.5) / 1e6
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "conc": pa.array([conc], pa.int64()),
        "disc": pa.array([disc], pa.int64()),
        "ties_x": pa.array([ties_x], pa.int64()),
        "ties_y": pa.array([ties_y], pa.int64()),
        "tau": pa.array([tau], pa.float64()),
    })


_TREE_SCALE_BITS = 40  # split-score fixed-point scale (SQL-parity contract)


def _best_split(items: list[tuple[int, int, int]]):
    """Greedy CART split over a sorted (band, n, n_pos) histogram with
    the EXACT integer criterion: minimize the fixed-point-scaled
    rational ``((num << 40) // den, thr)`` where
    num = nl·(nr²−pr²−qr²) + nr·(nl²−pl²−ql²) and den = nl·nr — the
    weighted-Gini numerator/denominator with the common 1/N dropped.
    Unbounded Python ints, so engine and SQL (HUGEINT) order
    candidates identically; the float Gini is report-only.  Returns
    (thr, num, den) or None when fewer than 2 bands."""
    if len(items) < 2:
        return None
    n_tot = sum(n for _, n, _ in items)
    p_tot = sum(p for _, _, p in items)
    best = None
    nl = pl = 0
    for band, n, p in items[:-1]:
        nl += n
        pl += p
        nr, pr = n_tot - nl, p_tot - pl
        ql, qr = nl - pl, nr - pr
        num = (nl * (nr * nr - pr * pr - qr * qr)
               + nr * (nl * nl - pl * pl - ql * ql))
        den = nl * nr
        key = ((num << _TREE_SCALE_BITS) // den, band)
        if best is None or key < best[0]:
            best = (key, band, num, den)
    return best[1], best[2], best[3]


def _node_row(node, pick, n, p):
    import math

    if pick is None:
        return node, None, n, p, None
    thr, num, den = pick
    gini = math.floor(
        float(num) / (float(den) * float(n)) * 1e6 + 0.5) / 1e6
    return node, thr, n, p, gini


def tree_depth2(
    ds: rd.Dataset,
    f1_fn: Callable[[pa.Table], np.ndarray],
    f2_fn: Callable[[pa.Table], np.ndarray],
    label_fn: Callable[[pa.Table], np.ndarray],
) -> pa.Table:
    """Depth-2 histogram decision tree — the greedy CART/LightGBM
    recursion one level past ``gini_split_table``: the root picks the
    best threshold on quantized feature 1, then each side
    independently picks the best threshold on quantized feature 2,
    every pick by the exact-integer scaled-rational criterion of
    ``_best_split`` (tie-break on smallest threshold), so the CHOSEN
    STRUCTURE — not just the candidate table — is deterministic and
    SQL-reproducible.  A pure or single-band side emits a NULL-thr
    leaf row.  Output: 3 rows (root/left/right) of
    (node, thr, n, n_pos, gini) with gini = num/(den·n_node) half-up
    6dp, the node's weighted impurity after its split.

    Scale shape: ONE streaming pass folds per-block JOINT (b1, b2, n,
    n_pos) histograms — bounded cells by the quantization contract,
    ZERO shuffles — and every split decision is driver math over the
    cells-sized table; a depth-k tree is the same pass + 2^k−1
    driver-side picks (deeper trees re-use the SAME joint histogram,
    no extra data passes until features rotate)."""
    import pandas as pd

    def _partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "b1": np.asarray(f1_fn(t), np.int64),
            "b2": np.asarray(f2_fn(t), np.int64),
            "y": np.asarray(label_fn(t), np.int64),
        })
        g = df.groupby(["b1", "b2"], sort=False).agg(
            n=("y", "size"), p=("y", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg: dict[tuple[int, int], list[int]] = {}
    for r in ds.map_batches(_partial, batch_format="pyarrow").take_all():
        e = agg.setdefault((int(r["b1"]), int(r["b2"])), [0, 0])
        e[0] += int(r["n"])
        e[1] += int(r["p"])

    def _marginal(cells, key_idx):
        m: dict[int, list[int]] = {}
        for k, (n, p) in cells:
            e = m.setdefault(k[key_idx], [0, 0])
            e[0] += n
            e[1] += p
        return [(b, m[b][0], m[b][1]) for b in sorted(m)]

    cells = list(agg.items())
    m1 = _marginal(cells, 0)
    n_tot = sum(n for _, n, _ in m1)
    p_tot = sum(p for _, _, p in m1)
    root = _best_split(m1)
    rows = [_node_row("root", root, n_tot, p_tot)]
    if root is not None:
        thr = root[0]
        for name, side in (("left", [c for c in cells if c[0][0] <= thr]),
                           ("right", [c for c in cells if c[0][0] > thr])):
            ms = _marginal(side, 1)
            ns = sum(n for _, n, _ in ms)
            ps = sum(p for _, _, p in ms)
            rows.append(_node_row(name, _best_split(ms), ns, ps))
    return pa.table({
        "node": pa.array([r[0] for r in rows], pa.string()),
        "thr": pa.array([r[1] for r in rows], pa.int64()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
        "n_pos": pa.array([r[3] for r in rows], pa.int64()),
        "gini": pa.array([r[4] for r in rows], pa.float64()),
    })


def theil_sen_slope(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    key_fn: Callable[[pa.Table], np.ndarray],
    m: int = 512,
    seed: int = 11,
    scale: int = 1_000_000,
) -> pa.Table:
    """Theil–Sen robust slope — the median of pairwise slopes, the
    estimator that shrugs off 29% arbitrary outliers where OLS is
    wrecked by one — over a fixed-size hash coreset so the pair count
    never grows with N: the m rows with the SMALLEST splitmix64 row
    hashes are selected by a distributed bottom-k (per-block partials,
    driver merges ≤ m·blocks rows; layout/cluster invariant because
    the hash is a pure row function), then all m·(m−1)/2 pairs with
    distinct x are formed driver-side (O(m²) INDEPENDENT of N — the
    coreset, not the data, bounds the quadratic).  Each slope is
    quantized to an exact integer ``floor(scale·Δy / Δx)`` with Δx>0
    by pair orientation (floor of the same rational either way, and
    Δx>0 lets the SQL twin floor via the %-wrap identity since DuckDB
    ``//`` truncates while numpy floors); the reported slope is the
    exact lower median — element (k−1)//2 of the sorted quantized
    slopes.  Output: one row (m_rows, n_pairs, slope_q) where slope_q
    ≈ scale · dy/dx."""
    from .ops import top_k
    from .util import hash64, np_col

    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))

    def _project(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = hash64(key_fn(t).astype(np.int64) + mix)
        # order-preserving uint64 -> int64 so top_k's int64 compare
        # ranks exactly like the SQL twin's UBIGINT z
        hs = (h ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table({
            "x": pa.array(np_col(t, x_col).astype(np.int64), pa.int64()),
            "y": pa.array(np_col(t, y_col).astype(np.int64), pa.int64()),
            "rk": pa.array(key_fn(t).astype(np.int64), pa.int64()),
            "hs": pa.array(hs, pa.int64()),
        })

    # tie-break through the full payload: key_fn need NOT be unique
    # (the sf lineitem has duplicate (orderkey, linenumber) rows), and
    # a boundary tie between same-key rows with different payloads
    # would otherwise pick either one
    samp = top_k(ds.map_batches(_project, batch_format="pyarrow"),
                 "hs", m, descending=False, tie_cols=["rk", "x", "y"])
    x = np.asarray(samp["x"], np.int64)
    y = np.asarray(samp["y"], np.int64)
    # orient every pair so dx > 0 (equal-x pairs carry no slope)
    o = np.argsort(x, kind="stable")
    x, y = x[o], y[o]
    i, j = np.triu_indices(len(x), k=1)
    dx = x[j] - x[i]
    keep = dx > 0
    dy = y[j][keep] - y[i][keep]
    dx = dx[keep]
    slopes = (dy * np.int64(scale)) // dx  # numpy // floors, like Python
    n_pairs = len(slopes)
    med = int(np.sort(slopes)[(n_pairs - 1) // 2]) if n_pairs else 0
    return pa.table({
        "m_rows": pa.array([len(x)], pa.int64()),
        "n_pairs": pa.array([n_pairs], pa.int64()),
        "slope_q": pa.array([med], pa.int64()),
    })


def logistic_newton1(
    ds: rd.Dataset,
    xy_fn: Callable[[pa.Table], tuple[np.ndarray, np.ndarray]],
    p: int,
) -> pa.Table:
    """One exact Newton–Raphson step of logistic regression from
    β = 0 — the classification GLM's closed-form first iterate, and
    (because σ(0)=½ makes the weight matrix W = ¼·I exactly) the ONLY
    logistic iterate that is a pure rational of integer data sums:
    β₁ = H⁻¹g = 4·(XᵀX)⁻¹·Xᵀ(y−½) = 2·(XᵀX)⁻¹·(2Xᵀy − Xᵀ1).
    Later iterates need σ(·) per row — float, order-fragile; the first
    step is where exactness lives, and it is already the standard
    one-pass approximation (a single IRLS round on the null model).

    Distribution shape = ols_fit_exact: ONE streaming pass folds the
    integer Gram/moment partials (zero shuffles), the solve is
    driver-side Cramer over unbounded ints.  Output: one row per
    coefficient (j, num, den) with β_j = num/den exactly — num =
    2·det(A with col j ← 2Xᵀy−Xᵀ1), den = det(XᵀX) — so an SQL twin
    reproduces the integers verbatim in HUGEINT."""
    gram, xty, n, _ = gram_sums(ds, xy_fn, p)
    # Xᵀ1 is gram's first column when x₀ ≡ 1 (intercept contract)
    xt1 = [gram[j][0] for j in range(p)]
    b = [2 * xty[j] - xt1[j] for j in range(p)]
    det = int_det(gram)
    if det == 0:
        raise ValueError("singular design matrix (collinear features)")
    nums = []
    for j in range(p):
        a_j = [row[:j] + [b[r]] + row[j + 1:]
               for r, row in enumerate(gram)]
        nums.append(2 * int_det(a_j))
    return pa.table({
        "j": pa.array(range(p), pa.int64()),
        "num": pa.array(nums, pa.int64()),
        "den": pa.array([det] * p, pa.int64()),
        "n": pa.array([n] * p, pa.int64()),
    })
