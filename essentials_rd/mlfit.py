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
