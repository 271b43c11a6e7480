"""Edge derivation: source-code corpus → repo→repo edge table.

Pipeline (SURVEY.md §3.2 step 2-3; BASELINE.json north_star: "an edge
table derived from the source-code corpus (repo→repo edges via shared
paths and import references, with content sha256 preserved per row)"):

    repo_files ──map_batches──▶ +sha256
        ├─▶ (repo, key=path, sha256) ──groupby(key)──▶ shared-path pairs
        │        (heavy keys with > cap distinct repos are DROPPED and
        │         counted — the k² blowup guard, SURVEY.md §4.3)
        ├─▶ regex import extraction ──▶ (src_repo, dst_repo, sha256)
        └─▶ union ─▶ canonical u<v ─▶ groupby(src,dst) dedup,
              weight = multiplicity, sha256 = min (deterministic rep)

Vertex ids: dense int64 by sorted repo name, broadcast via ``ray.put``
(SURVEY.md §2.5 T3 — the id map is |V|-sized ≪ |E|, so a broadcast
binary-search lookup beats a shuffle join).

The reference has no relational layer — its only ingest is a Matrix
Market reader (gunrock/essentials ``include/gunrock/io/matrix_market.
hxx`` [U — snapshot absent, SURVEY.md §0]); this module plays that
"triple list → COO" role for the corpus-derived graph.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .util import np_col

IMPORT_RE = re.compile(r"^\s*import\s+([A-Za-z_][\w.]*)", re.M)


# ---------------------------------------------------------------- ingest


def read_corpus(path_or_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read the repo_files parquet (file or directory of chunks)."""
    return rd.read_parquet(path_or_dir, columns=columns)


def add_sha256(ds: rd.Dataset) -> rd.Dataset:
    """Append ``sha256 = sha256(content)`` — the per-row invariant vs the
    reference input (BASELINE.json input_hint)."""

    def _sha(batch: pa.Table) -> pa.Table:
        col = batch.column("content")
        out = [hashlib.sha256(v.as_py().encode("utf-8")).hexdigest() for v in col]
        return batch.append_column("sha256", pa.array(out, pa.string()))

    return ds.map_batches(_sha, batch_format="pyarrow")


def corpus_from_documents(sf_dir: str) -> rd.Dataset:
    """Map the driver's ``documents`` table onto the repo_files shape
    (FIXTURES.md F4): source→repo, doc_id→path, text→content."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])

    def _map(batch: pa.Table) -> pa.Table:
        path = pc.binary_join_element_wise(
            "doc_", pc.cast(batch.column("doc_id"), pa.string()), ""
        )
        return pa.table(
            {
                "repo": batch.column("source"),
                "path": path,
                "commit": pa.array(["0" * 40] * batch.num_rows, pa.string()),
                "lang": batch.column("lang"),
                "content": batch.column("text"),
            }
        )

    return ds.map_batches(_map, batch_format="pyarrow")


# ------------------------------------------------------- vertex id map


def build_vertices(files: rd.Dataset) -> tuple[np.ndarray, rd.Dataset]:
    """Distinct repos → dense ids by sorted name (deterministic).

    Returns (sorted numpy array of repo names, vertices Dataset with
    columns vid:int64, repo:string).  The name array is what gets
    broadcast (``ray.put``) for lookups inside map_batches.
    """
    uniq = files.select_columns(["repo"]).unique("repo")
    arr = np.array(sorted(uniq), dtype=object)
    vertices = rd.from_arrow(
        pa.table({"vid": np.arange(len(arr), dtype=np.int64),
                  "repo": pa.array(arr.tolist(), pa.string())})
    )
    return arr, vertices


def repo_lookup(names_ref, col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized repo-name → vid lookup against the broadcast sorted
    name array.  Unknown names map to -1."""
    names = ray.get(names_ref) if isinstance(names_ref, ray.ObjectRef) else names_ref
    vals = np.asarray(col.to_pylist(), dtype=object)
    idx = np.searchsorted(names, vals)
    idx_c = np.minimum(idx, len(names) - 1)
    found = names[idx_c] == vals
    return np.where(found, idx_c, -1).astype(np.int64)


# ------------------------------------------------- shared-key expansion


def file_keys(files: rd.Dataset) -> rd.Dataset:
    """Distinct (repo, key=path, sha256) rows for shared-path grouping."""
    return files.select_columns(["repo", "path", "sha256"]).rename_columns(
        {"path": "key"}
    )


def shared_key_edges(
    keys: rd.Dataset,
    cap: int = 50,
    reason: str = "shared_path",
) -> tuple[rd.Dataset, int]:
    """Repo pairs sharing a key, with the heavy-key cap.

    Keys shared by more than ``cap`` distinct repos are dropped (their
    count is returned — never silently): a path shared by k repos emits
    k² pairs, so one pathological key (a README in every repo) would
    dominate the whole shuffle (SURVEY.md §4.3 "cap + log").

    Implementation: ``groupby(key).map_groups`` — each group is one
    key's rows; pair expansion is vectorized (np.triu indices) inside.
    Output: (src_repo, dst_repo, weight=1.0, reason, sha256=min of the
    pair's two file hashes), canonical src_repo < dst_repo.
    """

    def _pairs(grp: pa.Table) -> pa.Table:
        repos = np.asarray(grp.column("repo").to_pylist(), dtype=object)
        shas = np.asarray(grp.column("sha256").to_pylist(), dtype=object)
        # sort by (repo, sha) so the representative sha per repo is the
        # MIN sha — deterministic regardless of arrival order
        order = np.lexsort((shas, repos))
        repos, shas = repos[order], shas[order]
        uniq, first = np.unique(repos, return_index=True)
        k = len(uniq)
        if k < 2 or k > cap:
            return _empty_pairs()
        usha = shas[first]  # first sha per repo in sorted order (deterministic)
        iu, iv = np.triu_indices(k, 1)
        return pa.table(
            {
                "src_repo": pa.array(uniq[iu].tolist(), pa.string()),
                "dst_repo": pa.array(uniq[iv].tolist(), pa.string()),
                "weight": pa.array(np.ones(len(iu))),
                "reason": pa.array([reason] * len(iu), pa.string()),
                "sha256": pa.array(
                    np.minimum(usha[iu], usha[iv]).tolist(), pa.string()
                ),
            }
        )

    pairs = keys.groupby("key").map_groups(_pairs, batch_format="pyarrow")
    # heavy-key audit: count the dropped keys (small aggregate, not silent).
    # Counts DISTINCT repos per key (a key listed twice by one repo is not heavy).
    distinct = keys.groupby(["key", "repo"]).count()
    counts = distinct.groupby("key").count()
    heavy = counts.map_batches(
        lambda t: pa.table(
            {"heavy": [pc.sum(pc.greater(t.column("count()"), cap)).as_py() or 0]}
        ),
        batch_format="pyarrow",
    ).sum("heavy")
    return pairs, int(heavy or 0)


def _empty_pairs() -> pa.Table:
    return pa.table(
        {
            "src_repo": pa.array([], pa.string()),
            "dst_repo": pa.array([], pa.string()),
            "weight": pa.array([], pa.float64()),
            "reason": pa.array([], pa.string()),
            "sha256": pa.array([], pa.string()),
        }
    )


def token_keys(files: rd.Dataset, min_len: int = 1) -> rd.Dataset:
    """Distinct (repo, key=token, sha256=min) rows from whitespace-split
    content tokens — the shared-KEY derivation generalized from paths to
    arbitrary keys (used by the driver-checked shared-token query).

    The per-batch pandas explode pre-distincts (repo, token) so the
    shuffle moves one row per (repo, token) per batch, not per token
    occurrence."""

    def _tok(batch: pa.Table) -> pa.Table:
        df = batch.select(["repo", "content", "sha256"]).to_pandas()
        df["key"] = df["content"].str.split(" ")
        df = df.drop(columns=["content"]).explode("key")
        df = df[df["key"].str.len() >= min_len]
        g = (
            df.groupby(["repo", "key"], sort=True)["sha256"].min().reset_index()
        )
        return pa.Table.from_pandas(g[["repo", "key", "sha256"]], preserve_index=False)

    toks = files.map_batches(_tok, batch_format="pyarrow")
    # global distinct across batches (a repo's tokens can span batches)
    return (
        toks.groupby(["repo", "key"])
        .min("sha256")
        .rename_columns({"min(sha256)": "sha256"})
    )


# ---------------------------------------------------- import references


def import_edges(files: rd.Dataset, names_ref) -> rd.Dataset:
    """(src_repo, dst_repo) for each ``import X`` line whose target X is a
    known repo name; sha256 = hash of the importing file's content.
    Canonicalized to src_repo < dst_repo (undirected edge table)."""

    def _extract(batch: pa.Table) -> pa.Table:
        s = batch.column("content").to_pandas()
        matches = s.str.findall(IMPORT_RE)
        counts = matches.str.len().to_numpy(dtype=np.int64)
        if counts.sum() == 0:
            return _empty_pairs()
        rep = np.repeat(np.arange(len(s)), counts)
        targets = np.array(
            [t for lst in matches for t in lst], dtype=object
        )
        src = np.asarray(batch.column("repo").to_pylist(), dtype=object)[rep]
        sha = np.asarray(batch.column("sha256").to_pylist(), dtype=object)[rep]
        tvid = repo_lookup(names_ref, pa.array(targets.tolist(), pa.string()))
        keep = (tvid >= 0) & (src != targets)
        src, dstr, sha = src[keep], targets[keep], sha[keep]
        lo = np.minimum(src, dstr)
        hi = np.maximum(src, dstr)
        return pa.table(
            {
                "src_repo": pa.array(lo.tolist(), pa.string()),
                "dst_repo": pa.array(hi.tolist(), pa.string()),
                "weight": pa.array(np.ones(len(lo))),
                "reason": pa.array(["import_ref"] * len(lo), pa.string()),
                "sha256": pa.array(sha.tolist(), pa.string()),
            }
        )

    return files.map_batches(_extract, batch_format="pyarrow")


# ------------------------------------------------------------- dedup


def dedup_edges(pairs: rd.Dataset) -> rd.Dataset:
    """Merge duplicate (src_repo, dst_repo) pairs: weight=Σ, sha256=min,
    reason=min (deterministic representatives).  Pre-combines inside
    map_batches before the groupby so the shuffle moves partials, not
    every raw pair (SURVEY.md §2.4 R5)."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["src_repo", "dst_repo"], sort=True)
            .agg(weight=("weight", "sum"), reason=("reason", "min"), sha256=("sha256", "min"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partial = pairs.map_batches(_partial, batch_format="pyarrow")
    final = partial.groupby(["src_repo", "dst_repo"]).map_groups(
        _merge_group, batch_format="pyarrow"
    )
    return final


def _merge_group(grp: pa.Table) -> pa.Table:
    return pa.table(
        {
            "src_repo": grp.column("src_repo").slice(0, 1),
            "dst_repo": grp.column("dst_repo").slice(0, 1),
            "weight": pa.array([pc.sum(grp.column("weight")).as_py()]),
            "reason": pa.array([pc.min(grp.column("reason")).as_py()], pa.string()),
            "sha256": pa.array([pc.min(grp.column("sha256")).as_py()], pa.string()),
        }
    )


# ----------------------------------------------------------- full flow


def derive_edges(
    files: rd.Dataset, cap: int = 50
) -> tuple[rd.Dataset, rd.Dataset, np.ndarray, int]:
    """Corpus(+sha256) → (edges_vid, vertices, repo_names, heavy_dropped).

    ``edges_vid``: src:int64, dst:int64 (canonical src<dst), weight:
    double, reason:string, sha256:string.
    """
    names, vertices = build_vertices(files)
    names_ref = ray.put(names)
    keys = file_keys(files)
    shared, n_heavy = shared_key_edges(keys, cap=cap)
    imports = import_edges(files, names_ref)
    edges_repo = dedup_edges(shared.union(imports))

    def _to_vid(batch: pa.Table) -> pa.Table:
        s = repo_lookup(names_ref, batch.column("src_repo"))
        d = repo_lookup(names_ref, batch.column("dst_repo"))
        return pa.table(
            {
                "src": pa.array(s, pa.int64()),
                "dst": pa.array(d, pa.int64()),
                "weight": batch.column("weight"),
                "reason": batch.column("reason"),
                "sha256": batch.column("sha256"),
            }
        )

    edges = edges_repo.map_batches(_to_vid, batch_format="pyarrow")
    return edges, vertices, names, n_heavy
