"""Sparse matrix–matrix multiply (SpGEMM) over COO edge tables.

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials
``algorithms/spgemm.hxx`` [U — snapshot absent]): C = A·B for sparse
A, B given as (src, dst, weight) Datasets —
``C[i,j] = Σ_k A[i,k]·B[k,j]``.

Dataflow (the classic distributed SpGEMM): ONE partitioned hash join
on the contraction index k (A.dst = B.src) materializes the products,
then ONE bucketed grouped sum on the output cell (i, j) — both
exchanges hash-bucketed on int64 keys, no driver materialization.
Output size is the two-hop path count; callers bound it (row filter /
sampling) when A·B is denser than the inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..ops import grouped_pandas_agg, join
from ..util import np_col


def spgemm(
    a: rd.Dataset,
    b: rd.Dataset,
    *,
    num_buckets: int = 64,
) -> rd.Dataset:
    """C = A·B; inputs and output are (src:int64, dst:int64,
    weight:float64) Datasets."""

    def _left(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "i": t.column("src"),
                "k": t.column("dst"),
                "wa": t.column("weight"),
            }
        )

    def _right(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t.column("src"),
                "j": t.column("dst"),
                "wb": t.column("weight"),
            }
        )

    prod = join(
        a.map_batches(_left, batch_format="pyarrow"),
        b.map_batches(_right, batch_format="pyarrow"),
        on="k",
        how="inner",
        broadcast=False,
        num_buckets=num_buckets,
    )

    def _mul(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column("i"),
                "dst": t.column("j"),
                "weight": pa.array(
                    np_col(t, "wa") * np_col(t, "wb"), pa.float64()
                ),
            }
        )

    cells = prod.map_batches(_mul, batch_format="pyarrow")
    return grouped_pandas_agg(
        cells,
        ["src", "dst"],
        {"weight": ("weight", "sum")},
        key_fn=lambda t: np_col(t, "src") * np.int64(0x9E3779B1)
        + np_col(t, "dst"),
        num_buckets=num_buckets,
    )
