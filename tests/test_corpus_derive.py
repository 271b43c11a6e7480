"""Corpus generation + edge derivation e2e (SURVEY.md §5.2 items 2-3,5):
planted edges recovered exactly, heavy key dropped (not silently),
sha256 invariant preserved per row, DuckDB SQL oracle agreement."""

import hashlib
import os

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from essentials_rd.algorithms import connected_components, triangle_counts
from essentials_rd.algorithms.cc import components_table
from essentials_rd.corpus import generate_corpus
from essentials_rd.derive import add_sha256, derive_edges, read_corpus
from essentials_rd.graph import build_graph
from essentials_rd.util import np_col


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    meta = generate_corpus(d, n_repos=120, seed=42, heavy_key_cap=50)
    return d, meta


@pytest.fixture(scope="module")
def derived(corpus):
    d, meta = corpus
    files = add_sha256(read_corpus(os.path.join(d, "repo_files.parquet")))
    edges, vertices, names_ref, n_heavy = derive_edges(files, cap=meta["heavy_key_cap"])
    import ray
    names = ray.get(names_ref)
    edges = edges.materialize()
    return d, meta, edges, vertices, names, n_heavy


def test_corpus_deterministic(tmp_path):
    m1 = generate_corpus(str(tmp_path / "a"), n_repos=110, seed=7)
    m2 = generate_corpus(str(tmp_path / "b"), n_repos=110, seed=7)
    t1 = pq.read_table(tmp_path / "a" / "repo_files.parquet")
    t2 = pq.read_table(tmp_path / "b" / "repo_files.parquet")
    assert t1.equals(t2)
    assert m1["n_planted_edges"] == m2["n_planted_edges"]


def test_planted_edges_recovered_exactly(derived):
    d, meta, edges, vertices, names, n_heavy = derived
    exp = pq.read_table(os.path.join(d, "expected", "expected_edges.parquet"))
    got = edges.select_columns(["src", "dst"]).take_all()
    got_pairs = sorted((r["src"], r["dst"]) for r in got)
    exp_pairs = sorted(zip(np_col(exp, "src").tolist(), np_col(exp, "dst").tolist()))
    assert got_pairs == exp_pairs


def test_heavy_key_dropped_and_counted(derived):
    _, meta, _, _, _, n_heavy = derived
    assert n_heavy == 1  # README.md shared by 60 repos > cap 50


def test_sha256_invariant_per_row(derived, corpus):
    """Every edge row carries a sha256 that equals hashlib.sha256 of an
    actual contributing file's content (BASELINE.json input_hint)."""
    d, meta = corpus
    _, _, edges, _, names, _ = derived
    corpus_tbl = pq.read_table(os.path.join(d, "repo_files.parquet"))
    valid = {
        hashlib.sha256(c.encode()).hexdigest()
        for c in corpus_tbl.column("content").to_pylist()
    }
    for r in edges.take_all():
        assert r["sha256"] in valid


def test_vertex_ids_dense_and_sorted(derived):
    _, _, _, vertices, names, _ = derived
    rows = sorted(vertices.take_all(), key=lambda r: r["vid"])
    assert [r["vid"] for r in rows] == list(range(len(rows)))
    assert [r["repo"] for r in rows] == sorted(names.tolist())


def test_duckdb_oracle_shared_path_edges(derived, corpus):
    """Independent SQL derivation of the shared-path pairs (with the
    same heavy-key cap) must produce the identical edge set."""
    d, meta = corpus
    _, _, edges, _, _, _ = derived
    cap = meta["heavy_key_cap"]
    con = duckdb.connect()
    sql = f"""
    WITH files AS (
      SELECT repo, path, content FROM '{d}/repo_files.parquet'
    ),
    keyed AS (SELECT DISTINCT repo, path FROM files),
    ok_keys AS (
      SELECT path FROM keyed GROUP BY path
      HAVING count(DISTINCT repo) BETWEEN 2 AND {cap}
    ),
    shared AS (
      SELECT a.repo AS r1, b.repo AS r2
      FROM keyed a JOIN keyed b USING (path)
      JOIN ok_keys USING (path)
      WHERE a.repo < b.repo
    ),
    imports AS (
      SELECT f.repo AS r1, m.target AS r2 FROM files f,
        LATERAL (SELECT unnest(regexp_extract_all(f.content,
                 '(?m)^\\s*import\\s+([A-Za-z_][\\w.]*)', 1)) AS target) m
      WHERE m.target IN (SELECT DISTINCT repo FROM files)
        AND m.target != f.repo
    ),
    canon AS (
      SELECT least(r1, r2) AS r1, greatest(r1, r2) AS r2 FROM shared
      UNION ALL
      SELECT least(r1, r2), greatest(r1, r2) FROM imports
    )
    SELECT DISTINCT r1, r2 FROM canon ORDER BY r1, r2
    """
    oracle = con.sql(sql).fetchall()
    vert = {r["vid"]: r["repo"] for r in derived[3].take_all()}
    got = sorted(
        (vert[r["src"]], vert[r["dst"]]) for r in edges.take_all()
    )
    assert got == sorted(oracle)


def test_e2e_components_and_triangles_match_planted(derived, corpus):
    d, meta = corpus
    _, _, edges, _, _, _ = derived
    n = meta["n_repos"]
    vids = np.arange(n, dtype=np.int64)

    g = build_graph(
        edges.select_columns(["src", "dst"]),
        os.path.join(d, "work_cc"), 3, symmetrize=True, vertex_ids=vids,
    )
    res = connected_components(g, checkpoint_every=0, scatter_mode="fused")
    t = components_table(res)
    exp = pq.read_table(os.path.join(d, "expected", "expected_components.parquet"))
    assert np_col(t, "label").tolist() == np_col(exp, "comp").tolist()

    total, _ = triangle_counts(
        edges.select_columns(["src", "dst"]),
        os.path.join(d, "work_tc"), 3, vertex_ids=vids,
    )
    assert total == meta["expected_triangles_total"]


def test_weight_counts_multiplicity(derived):
    _, _, edges, _, _, _ = derived
    rows = edges.take_all()
    # clique pairs that are also in an import cycle have weight >= 2
    assert any(r["weight"] >= 2 for r in rows)
    assert all(r["weight"] >= 1 for r in rows)
    assert all(r["src"] < r["dst"] for r in rows)
