"""Deterministic synthetic source-code corpus generators (FIXTURES.md F1).

Emits the authoritative input shape (BASELINE.json input_hint):
``repo:string, path:string, commit:string, lang:string, content:string``
plus planted ground truth under ``expected/`` so e2e tests can assert
exact edges / components / triangle counts.

Planted structure:
- repos are grouped into disjoint clusters: one STAR cluster (a hub repo
  sharing a path with each leaf — the high-in-degree vertex that
  exercises hub salting) and a cycle of clique/tree clusters;
- every intra-cluster repo pair shares a dedicated path (shared_path
  edges); members of clusters of size >= 3 also import their successor
  (import_ref edges);
- a heavy global path ("README.md", shared by half the repos) is planted
  ABOVE the derivation's heavy-key cap: the derivation must drop it
  (logged), which keeps the planted components disjoint and exercises
  the k²-blowup guard (SURVEY.md §4.3).

Everything is seeded; no wall clock, no ambient RNG.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .reference_impl import cc_ref, triangles_ref

_LANGS = ["py", "js", "rs", "md"]
_WORDS = (
    "graph vertex edge frontier advance filter reduce scatter gather "
    "superstep partition shard arrow parquet stream block actor pool "
    "pagerank component label triangle sparse dense kernel batch"
).split()


def _lang_of(path: str) -> str:
    return _LANGS[int(hashlib.sha256(path.encode()).hexdigest()[:4], 16) % len(_LANGS)]


def _commit_of(repo: str, path: str, seed: int) -> str:
    return hashlib.sha256(f"{repo}/{path}@{seed}".encode()).hexdigest()[:40]


def _filler(rng: np.random.Generator, n: int) -> str:
    return " ".join(rng.choice(_WORDS, size=n).tolist())


def _cluster_sizes(n_repos: int, hub_size: int) -> list[int]:
    sizes = [hub_size]
    cycle = [1, 2, 3, 4, 5, 6, 9, 13]
    i = 0
    left = n_repos - hub_size
    while left > 0:
        s = min(cycle[i % len(cycle)], left)
        sizes.append(s)
        left -= s
        i += 1
    return sizes


def generate_corpus(
    out_dir: str,
    n_repos: int = 200,
    seed: int = 42,
    hub_frac: float = 0.1,
    heavy_key_cap: int = 50,
    filler_words: int = 20,
    compute_expected: bool = True,
) -> dict:
    """Generate ``repo_files.parquet`` (+ ``expected/``) under out_dir.

    Returns metadata: n_repos, planted edge count, heavy path name, etc.
    ``heavy_key_cap`` records the cap the derivation is expected to use;
    the heavy README path is shared by ``n_repos // 2`` repos which must
    exceed it for the planted components to stay disjoint.
    """
    assert n_repos // 2 > heavy_key_cap, "heavy path must exceed the cap"
    rng = np.random.default_rng(seed)
    repos = [f"repo{i:05d}" for i in range(n_repos)]
    hub_size = max(3, int(hub_frac * n_repos))
    sizes = _cluster_sizes(n_repos, hub_size)

    rows: list[tuple[str, str, str]] = []  # (repo, path, content)
    planted: set[tuple[int, int]] = set()  # canonical (u<v) repo-index pairs

    def plant(u: int, v: int) -> None:
        if u != v:
            planted.add((min(u, v), max(u, v)))

    # per-repo unique file, with import lines appended later
    imports: dict[int, list[int]] = {i: [] for i in range(n_repos)}

    base = 0
    for c, s in enumerate(sizes):
        members = list(range(base, base + s))
        base += s
        if c == 0:
            # star: hub = members[0]; each (hub, leaf) shares a path
            hub = members[0]
            for leaf in members[1:]:
                p = f"shared/star/{leaf:05d}.py"
                cont = f"# star spoke {leaf} " + _filler(rng, filler_words)
                rows.append((repos[hub], p, cont))
                rows.append((repos[leaf], p, cont))
                plant(hub, leaf)
        elif s >= 2:
            # clique via pairwise shared paths
            for ai in range(s):
                for bi in range(ai + 1, s):
                    u, v = members[ai], members[bi]
                    p = f"shared/c{c}/p{u:05d}_{v:05d}.py"
                    cont = f"# shared {u}-{v} " + _filler(rng, filler_words)
                    rows.append((repos[u], p, cont))
                    rows.append((repos[v], p, cont))
                    plant(u, v)
        if s >= 3:
            # import cycle within the cluster
            for ai in range(s):
                u, v = members[ai], members[(ai + 1) % s]
                imports[u].append(v)
                plant(u, v)

    # unique per-repo main file carrying the import lines
    for i, r in enumerate(repos):
        imp = "".join(f"import {repos[j]}\n" for j in imports[i])
        cont = f"# {r} main\n{imp}" + _filler(rng, filler_words)
        rows.append((r, f"src/main_{r}.py", cont))

    # heavy global path, shared by every even-indexed repo — above cap
    heavy_members = list(range(0, n_repos, 2))
    for i in heavy_members:
        rows.append((repos[i], "README.md", f"# readme\n" + _filler(rng, 5)))

    tbl = pa.table(
        {
            "repo": pa.array([r for r, _, _ in rows], pa.string()),
            "path": pa.array([p for _, p, _ in rows], pa.string()),
            "commit": pa.array(
                [_commit_of(r, p, seed) for r, p, _ in rows], pa.string()
            ),
            "lang": pa.array([_lang_of(p) for _, p, _ in rows], pa.string()),
            "content": pa.array([c for _, _, c in rows], pa.string()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "repo_files.parquet"))

    meta = {
        "n_repos": n_repos,
        "n_rows": tbl.num_rows,
        "n_planted_edges": len(planted),
        "hub_repo_index": 0,
        "hub_size": hub_size,
        "heavy_path": "README.md",
        "heavy_path_repos": len(heavy_members),
        "heavy_key_cap": heavy_key_cap,
        "seed": seed,
    }

    if compute_expected:
        exp_dir = os.path.join(out_dir, "expected")
        os.makedirs(exp_dir, exist_ok=True)
        e = np.array(sorted(planted), dtype=np.int64).reshape(-1, 2)
        vids = np.arange(n_repos, dtype=np.int64)
        pq.write_table(
            pa.table({"src": e[:, 0], "dst": e[:, 1]}),
            os.path.join(exp_dir, "expected_edges.parquet"),
        )
        comp = cc_ref(vids, e[:, 0], e[:, 1])
        pq.write_table(
            pa.table({"vid": vids, "comp": comp}),
            os.path.join(exp_dir, "expected_components.parquet"),
        )
        total, per_v = triangles_ref(vids, e[:, 0], e[:, 1])
        pq.write_table(
            pa.table({"vid": vids, "triangles": per_v}),
            os.path.join(exp_dir, "expected_triangles.parquet"),
        )
        meta["expected_triangles_total"] = int(total)
    return meta


def generate_bench_corpus(
    out_dir: str,
    n_vertices: int = 1_000_000,
    n_edges: int = 10_000_000,
    seed: int = 42,
    hub_count: int = 32,
    hub_edge_frac: float = 0.05,
    skew: float = 2.0,
    rows_per_chunk: int = 250_000,
) -> dict:
    """Vectorized large corpus: one file row per planted import edge.

    ``hub_edge_frac`` of all edges point at one of ``hub_count`` hub
    repos, and the remaining destinations follow a power-law-ish
    distribution (``u**skew`` over ranks) — the in-degree skew that
    salting / pre-combine must tame, and that keeps PageRank from
    trivially converging on a uniform graph.  Content is a
    single import line, so edge derivation (regex extract + sha256 per
    row) still runs per row but corpus generation stays fast.  Chunked
    into multiple parquet files so downstream reads parallelize.
    Idempotent for a given parameter set: writes into a param-keyed
    subdir and skips generation when the _SUCCESS marker exists.
    """
    key = f"v{n_vertices}_e{n_edges}_s{seed}_h{hub_count}_{hub_edge_frac}_k{skew}"
    d = os.path.join(out_dir, key)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return {"dir": d, "n_vertices": n_vertices, "n_edges": n_edges, "cached": True}
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    written = 0
    chunk_id = 0
    while written < n_edges:
        m = min(rows_per_chunk, n_edges - written)
        src = rng.integers(0, n_vertices, size=m, dtype=np.int64)
        dst = (rng.random(m) ** skew * n_vertices).astype(np.int64)
        dst = np.minimum(dst, n_vertices - 1)
        nhub = int(m * hub_edge_frac)
        if nhub and hub_count:
            dst[:nhub] = rng.integers(0, hub_count, size=nhub, dtype=np.int64)
        # vectorized string building
        repo = np.char.add("repo", np.char.zfill(src.astype("U10"), 8))
        target = np.char.add("repo", np.char.zfill(dst.astype("U10"), 8))
        idx = np.arange(written, written + m).astype("U10")
        path = np.char.add(np.char.add("f/", idx), ".py")
        content = np.char.add(np.char.add("import ", target), "\n")
        tbl = pa.table(
            {
                "repo": pa.array(repo),
                "path": pa.array(path),
                "commit": pa.array(np.char.zfill(idx, 40)),
                "lang": pa.array(np.full(m, "py")),
                "content": pa.array(content),
            }
        )
        pq.write_table(tbl, os.path.join(d, f"part-{chunk_id:05d}.parquet"))
        written += m
        chunk_id += 1
    with open(marker, "w") as f:
        f.write(key)
    return {"dir": d, "n_vertices": n_vertices, "n_edges": n_edges, "cached": False}
