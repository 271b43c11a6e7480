"""als_user_factors' exact Cramer solve vs an independent Fraction
reference and float least squares: the quantized factors are the true
ridge minimizer, bit-exact under any layout."""

from fractions import Fraction

import numpy as np
import pyarrow as pa


def _solve_ref(F: np.ndarray, q: np.ndarray, lam: int = 1):
    """Exact rational ridge solve via Fractions (independent of the
    engine's Cramer arithmetic)."""
    A = [[Fraction(0)] * 2 for _ in range(2)]
    b = [Fraction(0), Fraction(0)]
    for i in range(len(q)):
        for r in range(2):
            b[r] += Fraction(int(q[i]) * int(F[i, r]))
            for c in range(2):
                A[r][c] += Fraction(int(F[i, r]) * int(F[i, c]))
    A[0][0] += lam
    A[1][1] += lam
    det = A[0][0] * A[1][1] - A[0][1] * A[1][0]
    x1 = (b[0] * A[1][1] - b[1] * A[0][1]) / det
    x2 = (b[1] * A[0][0] - b[0] * A[1][0]) / det
    return x1, x2


def _cramer_quantized(F, q, lam=1):
    # mirror of the query's vectorized solve
    s11 = int((F[:, 0] * F[:, 0]).sum()) + lam
    s22 = int((F[:, 1] * F[:, 1]).sum()) + lam
    s12 = int((F[:, 0] * F[:, 1]).sum())
    b1 = int((q * F[:, 0]).sum())
    b2 = int((q * F[:, 1]).sum())
    det = s11 * s22 - s12 * s12
    return ((1_000_000 * (b1 * s22 - b2 * s12)) // det,
            (1_000_000 * (b2 * s11 - b1 * s12)) // det)


def test_cramer_matches_fraction_reference():
    rng = np.random.default_rng(5)
    for _ in range(50):
        n = rng.integers(1, 9)
        F = rng.integers(-3, 4, (n, 2)).astype(np.int64)
        q = rng.integers(1, 51, n).astype(np.int64)
        q1, q2 = _cramer_quantized(F, q)
        x1, x2 = _solve_ref(F, q)
        # floor(1e6 * exact rational) — Fraction floor is exact
        assert q1 == (Fraction(10**6) * x1).__floor__()
        assert q2 == (Fraction(10**6) * x2).__floor__()


def test_solution_minimizes_ridge_loss():
    rng = np.random.default_rng(9)
    for _ in range(20):
        n = rng.integers(1, 9)
        F = rng.integers(-3, 4, (n, 2)).astype(np.float64)
        q = rng.integers(1, 51, n).astype(np.float64)
        x1, x2 = _solve_ref(F.astype(np.int64), q.astype(np.int64))
        x = np.array([float(x1), float(x2)])

        def loss(v):
            r = q - F @ v
            return float(r @ r + v @ v)

        base = loss(x)
        for d in ([1e-3, 0], [-1e-3, 0], [0, 1e-3], [0, -1e-3]):
            assert loss(x + np.array(d)) >= base - 1e-9


def test_query_layout_invariance_on_synthetic_lineitem(tmp_path):
    import ray.data as rd

    import __ray_entry__ as e

    rng = np.random.default_rng(3)
    n = 400
    t = pa.table({
        "l_orderkey": pa.array(rng.integers(0, 60, n), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, 200, n), pa.int64()),
        "l_quantity": pa.array(rng.integers(1, 51, n).astype(float),
                               pa.float64()),
    })
    import pyarrow.parquet as pq
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "lineitem.parquet")
    a = e._q_als_step(str(d)).to_pydict()
    # rewrite as many small row groups → different block layout
    pq.write_table(t, d / "lineitem.parquet", row_group_size=13)
    b = e._q_als_step(str(d)).to_pydict()
    assert a == b
    assert len(a["orderkey"]) == 60
