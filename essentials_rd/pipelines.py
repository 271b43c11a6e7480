"""Driver-table pipelines: the graph engine applied to the sandbox's
TPC-H-ish tables (TESTDATA.md) so every operator has a DuckDB-checkable
query (`__ray_entry__.queries()` / `oracle_sql()`).

The edge table here is the part co-purchase graph: two parts are linked
iff they appear in the same order (weight = number of shared orders) —
the same shape as the corpus-derived repo graph (shared key → pair
expansion → dedup with weight merge), derived from `lineitem` instead
of `repo_files` so DuckDB can reproduce it from the registered views.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .graph import GraphShards, build_graph
from .util import np_col

DEFAULT_PARTS = 8


def _work_dir(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"essentials_rd_{tag}_")


def copurchase_items(sf_dir: str) -> rd.Dataset:
    """Distinct (l_orderkey, l_partkey) — the keyed rows.  Bucketed on
    hash(l_orderkey) so the downstream pair expansion reuses the same
    partitioning key (SURVEY.md §4.3: pick ONE key and keep it)."""
    from .ops import hash_bucket_agg

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def _distinct(grp: pa.Table) -> pa.Table:
        ok = np_col(grp, "l_orderkey")
        pk = np_col(grp, "l_partkey")
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.r_[True, (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
        return pa.table(
            {
                "l_orderkey": pa.array(ok[keep], pa.int64()),
                "l_partkey": pa.array(pk[keep], pa.int64()),
            }
        )

    return hash_bucket_agg(ds, lambda b: np_col(b, "l_orderkey"), _distinct)


def copurchase_edges(sf_dir: str) -> rd.Dataset:
    """Canonical undirected edges (src<dst, weight = #shared orders).

    One bucketed shuffle on hash(l_orderkey) brings every order's items
    together; the k² pair expansion inside each bucket is ONE vectorized
    triangular expansion over all of the bucket's orders (no Python
    callback per order — at scale that would be one call per order key;
    orders hold ≤ ~7 items, so the expansion itself is bounded — the
    corpus derivation's heavy-key cap exists for the unbounded version).
    Dedup+weight merge is a second bucketed aggregate on the pair
    (SURVEY.md §2.4 R5)."""
    from .ops import grouped_pandas_agg, hash_bucket_agg
    from .util import grouped_pair_expand

    def _expand(grp: pa.Table) -> pa.Table:
        ok = np_col(grp, "l_orderkey")
        pk = np_col(grp, "l_partkey")
        a, b, _ = grouped_pair_expand(ok, pk)
        return pa.table(
            {
                "src": pa.array(a, pa.int64()),
                "dst": pa.array(b, pa.int64()),
                "weight": pa.array(np.ones(len(a)), pa.float64()),
            }
        )

    pairs = hash_bucket_agg(
        copurchase_items(sf_dir),
        lambda b: np_col(b, "l_orderkey"),
        _expand,
    )
    return grouped_pandas_agg(
        pairs,
        ["src", "dst"],
        {"weight": ("weight", "sum")},
        key_fn=lambda b: np_col(b, "src") * np.int64(0x9E3779B1) + np_col(b, "dst"),
    )


def part_universe(sf_dir: str) -> np.ndarray:
    """All distinct part keys in lineitem (isolated vertices included)."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    return np.array(sorted(ds.unique("l_partkey")), dtype=np.int64)


def copurchase_graph(
    sf_dir: str,
    *,
    num_parts: int = DEFAULT_PARTS,
    symmetrize: bool = True,
    weighted: bool = False,
) -> tuple[GraphShards, rd.Dataset]:
    edges = copurchase_edges(sf_dir).materialize()
    vids = part_universe(sf_dir)
    # oracle/bench path never resumes: build shards straight from the
    # materialized blocks (persist=False — no parquet round-trip)
    g = build_graph(
        edges,
        _work_dir("copurchase"),
        num_parts,
        symmetrize=symmetrize,
        weighted=weighted,
        vertex_ids=vids,
        persist=False,
    )
    return g, edges


def round_half_up(arr: np.ndarray, digits: int = 6) -> np.ndarray:
    """Match DuckDB's ROUND (half away from zero; values here are >= 0),
    unlike numpy's banker's rounding."""
    scale = 10.0 ** digits
    return np.floor(arr * scale + 0.5) / scale
