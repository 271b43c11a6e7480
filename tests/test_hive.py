"""write_hive / read_hive (sinks.py): round trip by value, pruned
reads never open non-matching partitions (corruption-proof), value
sanitization with exact-value manifests, missing-value raise, read-all
default, receipt row counts."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.sinks import read_hive, write_hive


def _ds(vals, parts=1):
    t = pa.table({
        "k": pa.array(np.arange(len(vals), dtype=np.int64)),
        "cat": pa.array(list(vals), pa.string()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def test_round_trip_and_receipt(tmp_path):
    d = str(tmp_path / "h")
    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    receipt = write_hive(_ds(vals, parts=4), d, "cat")
    assert receipt.column("value").to_pylist() == ["a", "b", "c"]
    assert receipt.column("rows").to_pylist() == [5, 3, 2]
    got = read_hive(d, "cat").to_pandas()
    assert sorted(got["cat"].tolist()) == sorted(vals)


def test_pruned_read_never_opens_others(tmp_path):
    d = str(tmp_path / "h")
    write_hive(_ds(["a"] * 4 + ["b"] * 4 + ["c"] * 4), d, "cat")
    # corrupt every partition except 'b' — a pruned read must succeed
    for sub in os.listdir(d):
        if sub != "cat=b":
            with open(os.path.join(d, sub, "data.parquet"), "w") as f:
                f.write("garbage")
    got = read_hive(d, "cat", values=["b"]).to_pandas()
    assert got["cat"].tolist() == ["b"] * 4


def test_weird_values_sanitized_but_exact(tmp_path):
    d = str(tmp_path / "h")
    vals = ["x/y", "x y", "x_y"]  # all sanitize differently-or-same
    write_hive(_ds(vals), d, "cat")
    for v in vals:
        got = read_hive(d, "cat", values=[v]).to_pandas()
        assert got["cat"].tolist() == [v]


def test_sanitization_collision_gets_distinct_dirs(tmp_path):
    # 'x/y', 'x y' and 'x_y' sanitize to the same token — the digest
    # suffix must keep them in three distinct directories
    d = str(tmp_path / "h")
    write_hive(_ds(["x/y", "x y", "x_y"]), d, "cat")
    assert len(os.listdir(d)) == 3
    for v in ("x/y", "x y", "x_y"):
        got = read_hive(d, "cat", values=[v]).to_pandas()
        assert got["cat"].tolist() == [v]


def test_missing_value_raises(tmp_path):
    d = str(tmp_path / "h")
    write_hive(_ds(["a", "b"]), d, "cat")
    with pytest.raises(ValueError, match="nope"):
        read_hive(d, "cat", values=["nope"])


def test_columnar_partitioned_orc_and_feather_round_trip(tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.sinks import (read_columnar_partitioned,
                                     write_columnar_partitioned)
    from essentials_rd.util import np_col

    rng = np.random.default_rng(5)
    n = 2000
    t = pa.table({
        "k": pa.array(rng.integers(0, 10**6, n), pa.int64()),
        "v": pa.array(rng.normal(size=n), pa.float64()),
        "s": pa.array([f"s{i % 17}" for i in range(n)], pa.string()),
    })
    for fmt in ("orc", "feather"):
        out = str(tmp_path / fmt)
        rec = write_columnar_partitioned(
            rd.from_arrow(t).repartition(7), out,
            lambda b: np_col(b, "k"), 8, fmt=fmt)
        assert sum(r["rows"] for r in rec.to_pylist()) == n
        back = read_columnar_partitioned(out, 8, fmt=fmt)
        got = back.take_all()
        assert len(got) == n
        # exact value round trip (floats bit-preserved by both formats)
        orig = sorted(zip(t["k"].to_pylist(), t["v"].to_pylist(),
                          t["s"].to_pylist()))
        came = sorted((r["k"], r["v"], r["s"]) for r in got)
        assert orig == came

    # unfinished partition refuses to read
    import os
    os.remove(str(tmp_path / "orc" / "p00003" / "_SUCCESS"))
    import pytest
    with pytest.raises(ValueError):
        read_columnar_partitioned(str(tmp_path / "orc"), 8, fmt="orc")
