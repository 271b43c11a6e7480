"""Matrix Market reader (SURVEY.md §2.3 S1) + Shiloach-Vishkin
pointer-jumping CC option (§2.2 A2): shortcut accelerates long chains
and never changes the result."""

import numpy as np
import pytest

from essentials_rd.algorithms import connected_components
from essentials_rd.algorithms.cc import components_table
from essentials_rd.reference_impl import cc_ref
from essentials_rd.sources import read_mtx
from essentials_rd.util import np_col

from .conftest import small_graph

MTX = """%%MatrixMarket matrix coordinate real symmetric
% comment line
5 5 4
2 1 1.5
3 2 2.0
5 4 0.5
5 5 9.0
"""

MTX_PATTERN_GENERAL = """%%MatrixMarket matrix coordinate pattern general
3 3 3
1 2
2 3
3 1
"""


def test_read_mtx_symmetric(tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(MTX)
    edges, meta = read_mtx(str(p))
    rows = sorted(edges.take_all(), key=lambda r: (r["src"], r["dst"]))
    # self-loop (5,5) dropped; 1-based → 0-based; canonical src<dst
    assert [(r["src"], r["dst"], r["weight"]) for r in rows] == [
        (0, 1, 1.5), (1, 2, 2.0), (3, 4, 0.5)
    ]
    assert meta["n_rows"] == 5 and meta["symmetry"] == "symmetric"


def test_read_mtx_pattern(tmp_path):
    p = tmp_path / "p.mtx"
    p.write_text(MTX_PATTERN_GENERAL)
    edges, meta = read_mtx(str(p))
    assert edges.count() == 3
    assert all(r["weight"] == 1.0 for r in edges.take_all())
    assert meta["field"] == "pattern"


@pytest.mark.parametrize("mode", ["tasks", "fused"])
def test_pointer_jump_same_result_fewer_steps(tmp_path, mode):
    # path graph 0-1-...-15: hash-min needs ~n supersteps; with pointer
    # jumping the label chain collapses exponentially (a jump superstep
    # costs an extra bucketed join, so the test keeps the path short)
    n = 16
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    vids = np.arange(n, dtype=np.int64)
    g1 = small_graph(tmp_path / "a", src, dst, P=3, vertex_ids=vids)
    plain = connected_components(g1, checkpoint_every=0, scatter_mode=mode)
    g2 = small_graph(tmp_path / "b", src, dst, P=3, vertex_ids=vids)
    jumped = connected_components(
        g2, checkpoint_every=0, scatter_mode=mode, pointer_jump_every=2
    )
    t1, t2 = components_table(plain), components_table(jumped)
    expected = cc_ref(vids, src, dst)
    assert np_col(t1, "label").tolist() == expected.tolist()
    assert np_col(t2, "label").tolist() == expected.tolist()
    assert jumped.supersteps < plain.supersteps


def test_pointer_jump_random_graph(tmp_path):
    rng = np.random.default_rng(21)
    src = rng.integers(0, 60, 80).astype(np.int64)
    dst = rng.integers(0, 60, 80).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    vids = np.arange(60, dtype=np.int64)
    g = small_graph(tmp_path, src, dst, P=4, vertex_ids=vids)
    res = connected_components(
        g, checkpoint_every=0, scatter_mode="fused", pointer_jump_every=2
    )
    t = components_table(res)
    assert np_col(t, "label").tolist() == cc_ref(vids, src, dst).tolist()


def test_read_corpus_any_csv_jsonl_match_parquet(tmp_path):
    import pyarrow as pa
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    from essentials_rd.sources import read_corpus_any

    t = pa.table({
        "repo": pa.array([f"r{i%3}" for i in range(20)], pa.string()),
        "path": pa.array([f"src/f{i}.py" for i in range(20)], pa.string()),
        "commit": pa.array(["c"] * 20, pa.string()),
        "lang": pa.array(["py"] * 20, pa.string()),
        "content": pa.array([f"print({i})" for i in range(20)], pa.string()),
    })
    pq.write_table(t, tmp_path / "c.parquet")
    pacsv.write_csv(t, tmp_path / "c.csv")
    with open(tmp_path / "c.jsonl", "w") as f:
        for r in t.to_pylist():
            import json

            f.write(json.dumps(r) + "\n")
    want = read_corpus_any(str(tmp_path / "c.parquet")).to_pandas()
    for ext in ("csv", "jsonl"):
        got = read_corpus_any(str(tmp_path / f"c.{ext}")).to_pandas()
        assert got.sort_values("path").reset_index(drop=True).equals(
            want.sort_values("path").reset_index(drop=True)
        ), ext
    # full-column read and the unsupported-format guard
    full = read_corpus_any(str(tmp_path / "c.csv"), columns=None)
    assert set(full.schema().names) == set(t.schema.names)
    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        read_corpus_any(str(tmp_path / "c.xml"))
