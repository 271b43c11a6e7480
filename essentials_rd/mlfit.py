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
) -> tuple[list[float], dict]:
    """OLS coefficients b = (XᵀX)⁻¹ Xᵀy via exact integer Cramer:
    b_i = float(det(A with col i ← Xᵀy)) / float(det(A)).  Returns
    (coefs, info) with info carrying the exact integer sums."""
    gram, xty, n, yty = gram_sums(ds, xy_fn, p)
    det = int_det(gram)
    if det == 0:
        raise ValueError("singular design matrix (collinear features)")
    coefs = []
    for i in range(p):
        a_i = [row[:i] + [xty[r]] + row[i + 1:]
               for r, row in enumerate(gram)]
        coefs.append(float(int_det(a_i)) / float(det))
    return coefs, {"gram": gram, "xty": xty, "n": n, "yty": yty,
                   "det": det}
