"""Grid-partitioned DBSCAN: lossless blocking, exact core counts,
CC-engine clusters, deterministic border rule, noise."""
import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.dbscan import grid_dbscan, grid_neighbor_pairs
from essentials_rd.util import np_col


def _brute_dbscan(ids, p, eps, min_pts):
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    nbr = d2 <= eps * eps
    np.fill_diagonal(nbr, False)
    core = nbr.sum(1) + 1 >= min_pts
    lab = np.where(core, ids, np.int64(1) << 60)
    A = nbr & core[:, None] & core[None, :]
    for _ in range(500):
        new = np.minimum(np.where(A, lab[None, :], 1 << 60).min(1), lab)
        if (new == lab).all():
            break
        lab = new
    ref = {}
    for i in range(len(ids)):
        if core[i]:
            ref[int(ids[i])] = (int(lab[i]), 2)
        else:
            cn = [int(lab[j]) for j in np.flatnonzero(nbr[i]) if core[j]]
            ref[int(ids[i])] = (min(cn), 1) if cn else (-1, 0)
    return ref, core


def _pts_ds(ids, p, parts=4):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "px": pa.array(p[:, 0], pa.int64()),
        "py": pa.array(p[:, 1], pa.int64()),
    })).repartition(parts)


def test_grid_pairs_match_bruteforce_counts():
    rng = np.random.default_rng(4)
    p = rng.integers(-500, 500, size=(300, 2)).astype(np.int64)
    ids = np.arange(300, dtype=np.int64)
    eps = 60
    t = grid_neighbor_pairs(_pts_ds(ids, p), eps, num_buckets=16)
    rows = t.to_pandas()
    pair_rows = rows[rows.dst >= 0]
    sent = rows[rows.dst == -1]
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    nbr = d2 <= eps * eps
    np.fill_diagonal(nbr, False)
    # every point gets exactly one sentinel carrying its exact count
    assert len(sent) == 300
    got_n = dict(zip(sent.src, sent.src_core_n))
    for i in range(300):
        assert got_n[i] == nbr[i].sum()
    # ordered pairs are exactly the eps-neighbor relation
    want = {(i, j) for i in range(300) for j in np.flatnonzero(nbr[i])}
    got = set(zip(pair_rows.src, pair_rows.dst))
    assert got == want


def test_dbscan_matches_bruteforce_and_layout_invariant(tmp_path):
    rng = np.random.default_rng(7)
    # three planted blobs + scattered noise + one isolated dense pair
    blobs = [rng.normal(c, 15, size=(60, 2))
             for c in ((0, 0), (400, 400), (-400, 300))]
    noise = rng.uniform(-800, 800, size=(40, 2))
    p = np.floor(np.vstack(blobs + [noise])).astype(np.int64)
    ids = np.arange(len(p), dtype=np.int64)
    eps, min_pts = 40, 5
    ref, core = _brute_dbscan(ids, p, eps, min_pts)
    assert 2 <= len({v[0] for v in ref.values() if v[1] == 2})
    assert any(v == (-1, 0) for v in ref.values())  # real noise exists
    outs = []
    for i, parts in enumerate((2, 9)):
        out, steps = grid_dbscan(
            _pts_ds(ids, p, parts), str(tmp_path / f"w{i}"), eps, min_pts,
            num_parts=4, num_buckets=16)
        got = {int(r["vec_id"]): (int(r["label"]), int(r["role"]))
               for r in out.take_all()}
        outs.append(got)
    assert outs[0] == ref
    assert outs[0] == outs[1]


def test_dbscan_no_cores_all_noise(tmp_path):
    # every point isolated: no cores, no borders, all noise
    p = (np.arange(20, dtype=np.int64)[:, None] * 10_000) * np.array([1, 1])
    ids = np.arange(20, dtype=np.int64)
    out, steps = grid_dbscan(_pts_ds(ids, p, 3), str(tmp_path / "w"),
                             50, 3, num_buckets=8)
    got = {int(r["vec_id"]): (int(r["label"]), int(r["role"]))
           for r in out.take_all()}
    assert steps == 0
    assert got == {int(i): (-1, 0) for i in ids}


def test_dbscan_isolated_core_is_singleton_cluster(tmp_path):
    # a tight clique of 4 (all within eps): all core, one cluster —
    # and the clique's CC component survives even with no other points
    p = np.array([[0, 0], [1, 0], [0, 1], [1, 1],
                  [9_000, 9_000]], np.int64)
    ids = np.array([10, 11, 12, 13, 99], np.int64)
    out, _ = grid_dbscan(_pts_ds(ids, p, 2), str(tmp_path / "w"),
                         5, 4, num_buckets=4)
    got = {int(r["vec_id"]): (int(r["label"]), int(r["role"]))
           for r in out.take_all()}
    assert got == {10: (10, 2), 11: (10, 2), 12: (10, 2), 13: (10, 2),
                   99: (-1, 0)}
