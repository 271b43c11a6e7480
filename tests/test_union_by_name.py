"""read_union_by_name (sources.py): column alignment by name across
drifted schemas, null fill for absent fields, int32→int64 promotion,
column pruning (including prune-to-disjoint files), unknown-column
error, single-schema passthrough."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from essentials_rd.sources import read_union_by_name


def _write(tmp, name, **cols):
    p = str(tmp / name)
    pq.write_table(pa.table(cols), p)
    return p


def _sorted_rows(ds):
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_aligns_and_null_fills(tmp_path):
    p1 = _write(tmp_path, "a.parquet",
                k=pa.array([1, 2], pa.int64()),
                v=pa.array([10, 20], pa.int64()))
    p2 = _write(tmp_path, "b.parquet",
                k=pa.array([3], pa.int64()),
                w=pa.array(["x"], pa.string()))
    df = _sorted_rows(read_union_by_name([p1, p2]))
    assert list(df.columns) == ["k", "v", "w"]
    assert df["k"].tolist() == [1, 2, 3]
    assert df["v"].tolist()[:2] == [10, 20] and np.isnan(df["v"][2])
    assert df["w"].tolist()[:2] == [None, None] and df["w"][2] == "x"


def test_int32_promotes_to_int64(tmp_path):
    p1 = _write(tmp_path, "a.parquet", k=pa.array([1], pa.int64()),
                v=pa.array([7], pa.int32()))
    p2 = _write(tmp_path, "b.parquet", k=pa.array([2], pa.int64()),
                v=pa.array([2**40], pa.int64()))
    ds = read_union_by_name([p1, p2])
    t = pa.Table.from_pandas(ds.to_pandas())
    assert t.schema.field("v").type == pa.int64()
    assert sorted(t.column("v").to_pylist()) == [7, 2**40]


def test_column_pruning_and_disjoint_file(tmp_path):
    p1 = _write(tmp_path, "a.parquet", k=pa.array([1, 2], pa.int64()),
                v=pa.array([10, 20], pa.int64()))
    p2 = _write(tmp_path, "b.parquet", w=pa.array(["x", "y", "z"]))
    # request only v: file b shares no column but still contributes
    # its three all-null rows
    df = read_union_by_name([p1, p2], columns=["v"]).to_pandas()
    vals = sorted(df["v"].dropna().tolist())
    assert vals == [10, 20] and len(df) == 5


def test_unknown_column_raises(tmp_path):
    p1 = _write(tmp_path, "a.parquet", k=pa.array([1], pa.int64()))
    with pytest.raises(ValueError, match="nope"):
        read_union_by_name([p1], columns=["nope"])


def test_single_schema_passthrough(tmp_path):
    p1 = _write(tmp_path, "a.parquet", k=pa.array([1, 2], pa.int64()))
    p2 = _write(tmp_path, "b.parquet", k=pa.array([3], pa.int64()))
    df = _sorted_rows(read_union_by_name([p1, p2]))
    assert df["k"].tolist() == [1, 2, 3]
