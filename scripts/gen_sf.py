"""Deterministic scale-up of the driver testdata by integer tiling.

Builds an sfN directory (default 10x sf0.1 == sf1.0) from an existing
sf dir WITHOUT touching /root/testdata: each fact table is tiled T
times with per-tile key offsets so every join relationship
(orders->customer, lineitem->orders/part/supplier, events->user) stays
intact and every per-tile value distribution is EXACTLY the source's —
the honest way to measure data-scaling of the bench queries (per-query
selectivity is preserved, result sizes grow ~linearly).

Two per-tile decorrelations keep the near-dup workloads honest
(naive tiling would plant cross-tile EXACT duplicates, exploding
candidate pairs ~T^2-fold and destroying the linear-scaling
comparison):

- documents: tile t > 0 suffixes EVERY token with "_t<t>" — an
  injective token map, so every within-tile shingle relationship (the
  planted near-dups) is preserved EXACTLY while cross-tile shingle
  sets are fully disjoint.  (A first cut only prefixed the text with
  one tile token; that perturbs just k-1 shingles, so every doc stayed
  a ~0.95-Jaccard near-dup of its 9 copies and sf1 exploded to 250k
  candidate pairs — the 20x super-linear near_dup_pairs reading in the
  first BENCH_sf1 attempt.)
- embeddings: tile t rotates every vector by a deterministic random
  orthogonal matrix R_t (QR of a seeded Gaussian).  Within-tile
  cosines are preserved (up to float32 round-off), cross-tile cosines
  concentrate around 0 with std ~1/sqrt(d) REGARDLESS of embedding
  structure.  (The first cut used +-1 sign patterns; clustered
  low-effective-rank embeddings still produced chance cross-tile
  cosine hits — 120x pair growth.)

region/nation stay fixed (dimension tables).

Usage: python scripts/gen_sf.py [--src /root/testdata/sf0.1]
                                [--out /tmp/sfgen/sf1] [--tiles 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> offset stride source table (max key + 1, rounded up to
# a power of 10 so tiled keys are human-readable)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE_OF = {  # which table/column defines each key family's stride
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
COPY = ["region", "nation"]


def _stride(src: str, cache: dict, fam: tuple[str, str]) -> int:
    if fam not in cache:
        tbl, col = fam
        mx = pc.max(pq.read_table(
            os.path.join(src, f"{tbl}.parquet"), columns=[col]
        ).column(col)).as_py()
        s = 10
        while s <= mx:
            s *= 10
        cache[fam] = s
    return cache[fam]


def _rotation(t: int, d: int) -> np.ndarray:
    """Deterministic random orthogonal d x d matrix per tile (QR of a
    seeded Gaussian, sign-fixed so the decomposition is unique)."""
    rng = np.random.default_rng(1_000_003 * t + 7)
    q, r = np.linalg.qr(rng.standard_normal((d, d)))
    return (q * np.sign(np.diag(r))).astype(np.float32)


def tile_table(name: str, src: str, tiles: int, stride_cache: dict) -> pa.Table:
    base = pq.read_table(os.path.join(src, f"{name}.parquet"))
    outs = []
    for t in range(tiles):
        tbl = base
        for col in KEYED.get(name, []):
            s = _stride(src, stride_cache, STRIDE_OF[col])
            arr = tbl.column(col)
            shifted = pc.add(arr, pa.scalar(t * s, arr.type))
            tbl = tbl.set_column(
                tbl.schema.get_field_index(col), col, shifted)
        if name == "documents" and t > 0:
            sfx = f"_t{t}"
            txt = pc.binary_join_element_wise(
                pc.replace_substring(tbl.column("text").cast(pa.string()),
                                     " ", f"{sfx} "),
                pa.array([sfx] * tbl.num_rows, pa.string()), "")
            i = tbl.schema.get_field_index("text")
            tbl = tbl.set_column(i, "text", txt)
            j = tbl.schema.get_field_index("n_chars")
            tbl = tbl.set_column(
                j, "n_chars", pc.utf8_length(txt).cast(pa.int64()))
        if name == "embeddings" and t > 0:
            vec = tbl.column("embedding").combine_chunks()
            vals = np.asarray(vec.flatten().to_numpy(zero_copy_only=False),
                              np.float32)
            lens = np.asarray(pc.list_value_length(vec), np.int64)
            d = int(lens[0]) if len(lens) else 0
            rot = _rotation(t, d)
            rotated = (vals.reshape(-1, d) @ rot.T).reshape(-1)
            new = pa.ListArray.from_arrays(
                np.r_[0, np.cumsum(lens)].astype(np.int32),
                pa.array(rotated, pa.float32()))
            i = tbl.schema.get_field_index("embedding")
            tbl = tbl.set_column(i, "embedding", new.cast(tbl.schema.field("embedding").type))
        outs.append(tbl)
    return pa.concat_tables(outs, promote_options="none")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfgen/sf1")
    ap.add_argument("--tiles", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    stride_cache: dict = {}
    for name in COPY:
        pq.write_table(
            pq.read_table(os.path.join(args.src, f"{name}.parquet")),
            os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: copied")
    for name in KEYED:
        t = tile_table(name, args.src, args.tiles, stride_cache)
        pq.write_table(t, os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows ({args.tiles} tiles)")


if __name__ == "__main__":
    main()
