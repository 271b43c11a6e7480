"""Resumable partitioned Parquet sink: atomic per-partition commit,
skip-finished resume, _SUCCESS-gated readback."""

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.sinks import (
    finished_partitions,
    read_partitioned,
    write_partitioned,
)
from essentials_rd.util import np_col


def _data(n=5000):
    rng = np.random.default_rng(5)
    return pa.table({
        "k": pa.array(rng.integers(0, 1000, n), pa.int64()),
        "v": pa.array(rng.integers(0, 10**9, n), pa.int64()),
    })


def test_write_read_roundtrip_and_skip_finished(tmp_path):
    out = str(tmp_path / "out")
    t = _data()
    ds = rd.from_arrow(t).repartition(6)
    P = 8
    rec = write_partitioned(ds, out, lambda b: np_col(b, "k"), P)
    assert len(finished_partitions(out, P)) == P
    assert not rec.column("skipped").to_pylist().count(True)
    assert sum(r for r in rec.column("rows").to_pylist()) == t.num_rows

    back = read_partitioned(out, P).to_pandas().sort_values(["k", "v"])
    orig = t.to_pandas().sort_values(["k", "v"])
    assert back.reset_index(drop=True).equals(orig.reset_index(drop=True))

    # simulate a failed run: partition 3 lost its marker (crash before
    # commit); everything else must be SKIPPED, 3 rewritten
    os.remove(os.path.join(out, "p00003", "_SUCCESS"))
    mtimes = {
        p: os.path.getmtime(os.path.join(out, f"p{p:05d}", "data.parquet"))
        for p in range(P)
    }
    rec2 = write_partitioned(ds, out, lambda b: np_col(b, "k"), P)
    by_part = {
        p: s for p, s in zip(rec2.column("part").to_pylist(),
                             rec2.column("skipped").to_pylist())
    }
    assert by_part[3] is False
    assert all(by_part[p] for p in range(P) if p != 3)
    for p in range(P):
        m = os.path.getmtime(os.path.join(out, f"p{p:05d}", "data.parquet"))
        if p == 3:
            assert m > mtimes[p]
        else:
            assert m == mtimes[p], p

    back2 = read_partitioned(out, P).to_pandas().sort_values(["k", "v"])
    assert back2.reset_index(drop=True).equals(orig.reset_index(drop=True))


def test_crash_litter_is_invisible(tmp_path):
    out = str(tmp_path / "out")
    t = _data(500)
    P = 4
    write_partitioned(rd.from_arrow(t), out, lambda b: np_col(b, "k"), P)
    # a crashed writer's temp file must not pollute readback
    with open(os.path.join(out, "p00001", ".tmp-deadbeef"), "w") as f:
        f.write("garbage")
    back = read_partitioned(out, P)
    assert back.count() == t.num_rows


def test_copartitioned_join_equals_general_join(tmp_path, ray_session):
    """copartitioned_join over two same-routed sink dirs equals
    ops.join for inner/semi/anti, including keys whose right
    partition is entirely absent."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ops import join
    from essentials_rd.sinks import copartitioned_join, write_partitioned
    from essentials_rd.util import np_col

    rng = np.random.default_rng(29)
    left = pa.table({"k": pa.array(rng.integers(0, 300, 2_000),
                                   pa.int64()),
                     "a": pa.array(rng.integers(0, 9, 2_000), pa.int64())})
    # right covers only a key sliver so some partitions end up absent
    right = pa.table({"k": pa.array(rng.integers(0, 40, 150), pa.int64()),
                      "b": pa.array(rng.integers(0, 9, 150), pa.int64())})
    kf = lambda t: np_col(t, "k")  # noqa: E731
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_partitioned(rd.from_arrow(left).repartition(5), da, kf, 8)
    write_partitioned(rd.from_arrow(right).repartition(3), db, kf, 8)

    def _norm(df, cols):
        return (df[cols].sort_values(cols).reset_index(drop=True)
                .astype("int64"))

    for how in ("inner", "semi", "anti"):
        got = copartitioned_join(da, db, 8, on="k", how=how).to_pandas()
        want = join(rd.from_arrow(left), rd.from_arrow(right),
                    on="k", how=how).to_pandas()
        cols = sorted(want.columns)
        pd.testing.assert_frame_equal(_norm(got, cols), _norm(want, cols))


def test_write_sorted_global_order_and_content(tmp_path, ray_session):
    """Reading write_sorted partitions in id order yields the fully
    sorted table with exactly the input's multiset of rows; bounds are
    layout-invariant."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from essentials_rd.sinks import _part_dir, write_sorted
    from essentials_rd.util import np_col

    rng = np.random.default_rng(43)
    n = 20_000
    v = rng.integers(0, 10_000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"id": pa.array(ids), "v": pa.array(v)})
    out = str(tmp_path / "sorted")
    receipts, bounds = write_sorted(
        rd.from_arrow(tbl).repartition(7), out, "v",
        key_fn=lambda b: np_col(b, "id"), num_partitions=6,
        tie_cols=["id"])
    got = []
    for p in range(6):
        f = os.path.join(_part_dir(out, p), "data.parquet")
        if os.path.exists(f):
            t = pq.read_table(f)
            pv = np_col(t, "v")
            assert (np.diff(pv) >= 0).all()          # sorted inside
            if got:
                assert pv[0] >= got[-1][1][-1]       # sorted across
            got.append((np_col(t, "id"), pv))
    allv = np.concatenate([g[1] for g in got])
    assert (np.sort(v) == allv).all()
    assert sorted(np.concatenate([g[0] for g in got]).tolist()) == \
        ids.tolist()
    # same bounds from a different block layout
    out2 = str(tmp_path / "sorted2")
    _, bounds2 = write_sorted(
        rd.from_arrow(tbl).repartition(2), out2, "v",
        key_fn=lambda b: np_col(b, "id"), num_partitions=6,
        tie_cols=["id"])
    assert (bounds == bounds2).all()


def test_zordered_layout_prunes_box_queries(tmp_path, ray_session):
    """A selective 2-D box over the z-ordered layout opens strictly
    fewer files than the hash layout (whose per-file bounding boxes
    span the plane), and both return exactly the brute-force rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.sinks import (read_box_zonemap, write_partitioned,
                                     write_zordered)
    from essentials_rd.util import np_col

    rng = np.random.default_rng(73)
    n = 40_000
    x = rng.integers(0, 1_000, n).astype(np.int64)
    y = rng.integers(0, 1_000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"id": pa.array(ids), "x": pa.array(x),
                    "y": pa.array(y)})
    P = 16
    dz = str(tmp_path / "zord")
    dh = str(tmp_path / "hash")
    write_zordered(rd.from_arrow(tbl).repartition(6), dz, "x", "y",
                   key_fn=lambda b: np_col(b, "id"), num_partitions=P)
    write_partitioned(rd.from_arrow(tbl).repartition(6), dh,
                      lambda b: np_col(b, "id"), P)
    box = (100, 200, 300, 400)
    want = set(ids[(x >= box[0]) & (x <= box[1])
                   & (y >= box[2]) & (y <= box[3])].tolist())
    dsz, nz = read_box_zonemap(dz, P, "x", "y", *box)
    dsh, nh = read_box_zonemap(dh, P, "x", "y", *box)
    got_z = set(dsz.to_pandas()["id"].tolist()) if dsz is not None else set()
    got_h = set(dsh.to_pandas()["id"].tolist()) if dsh is not None else set()
    assert got_z == want and got_h == want
    assert nz < nh, (nz, nh)       # z-order actually prunes
    assert nz <= P // 2            # selective box opens few files


def test_compact_small_files_order_sizes_and_resume(tmp_path):
    import os
    import time

    import pyarrow.parquet as pq_

    from essentials_rd.sinks import compact_small_files

    # 17 tiny files with varied sizes — the write_parquet litter shape
    rng = np.random.default_rng(3)
    src = tmp_path / "small"
    src.mkdir()
    all_rows = []
    k = 0
    for i in range(17):
        n = int(rng.integers(1, 40))
        vals = np.arange(k, k + n, dtype=np.int64)
        k += n
        pq_.write_table(pa.table({"v": pa.array(vals, pa.int64())}),
                        str(src / f"part-{i:04d}.parquet"))
        all_rows.extend(vals.tolist())
    out = tmp_path / "compact"
    receipt = compact_small_files(str(src), str(out), target_rows=50)
    # exact global order preserved, shard sizes exact
    got = []
    shards = sorted(os.listdir(out))
    data_files = [f for f in shards if f.endswith(".parquet")]
    for f in data_files:
        t = pq_.read_table(str(out / f))
        got.extend(t.column("v").to_pylist())
        assert t.num_rows <= 50
    assert got == all_rows
    n_full = len(all_rows) // 50
    sizes = [pq_.read_metadata(str(out / f)).num_rows for f in data_files]
    assert sizes[:n_full] == [50] * n_full
    assert receipt.num_rows == len(data_files)
    assert not any(receipt.column("skipped").to_pylist())
    # resume: delete one shard, rerun — only that shard rewritten
    victim = data_files[1]
    os.remove(str(out / victim))
    os.remove(str(out / (victim + "._SUCCESS")))
    mtimes = {f: os.path.getmtime(str(out / f))
              for f in data_files if f != victim}
    time.sleep(0.05)
    receipt2 = compact_small_files(str(src), str(out), target_rows=50)
    rows2 = {r["shard"]: r for r in receipt2.to_pylist()}
    assert sum(1 for r in rows2.values() if not r["skipped"]) == 1
    assert not rows2[1]["skipped"] and rows2[0]["skipped"]
    for f, m in mtimes.items():
        assert os.path.getmtime(str(out / f)) == m
    t = pq_.read_table(str(out / victim))
    assert t.column("v").to_pylist() == all_rows[50:100]
