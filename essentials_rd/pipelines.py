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
    """Distinct (l_orderkey, l_partkey) — the keyed rows."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return ds.groupby(["l_orderkey", "l_partkey"]).count().drop_columns(["count()"])


def copurchase_edges(sf_dir: str) -> rd.Dataset:
    """Canonical undirected edges (src<dst, weight = #shared orders).

    Pair expansion runs per order group (orders hold ≤ ~7 items, so the
    k² expansion is bounded — the corpus derivation's heavy-key cap
    exists for exactly the unbounded version of this); dedup+weight
    merge is a groupby aggregate on the pair (SURVEY.md §2.4 R5)."""

    def _pairs(grp: pa.Table) -> pa.Table:
        parts = np.sort(np_col(grp, "l_partkey"))
        k = len(parts)
        if k < 2:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        iu, iv = np.triu_indices(k, 1)
        return pa.table(
            {"src": pa.array(parts[iu], pa.int64()), "dst": pa.array(parts[iv], pa.int64())}
        )

    pairs = copurchase_items(sf_dir).groupby("l_orderkey").map_groups(
        _pairs, batch_format="pyarrow"
    )
    from ray.data.aggregate import Count

    return (
        pairs.groupby(["src", "dst"])
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("src"),
                    "dst": t.column("dst"),
                    "weight": pc.cast(t.column("count()"), pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
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
    g = build_graph(
        edges,
        _work_dir("copurchase"),
        num_parts,
        symmetrize=symmetrize,
        weighted=weighted,
        vertex_ids=vids,
    )
    return g, edges


def round_half_up(arr: np.ndarray, digits: int = 6) -> np.ndarray:
    """Match DuckDB's ROUND (half away from zero; values here are >= 0),
    unlike numpy's banker's rounding."""
    scale = 10.0 ** digits
    return np.floor(arr * scale + 0.5) / scale
