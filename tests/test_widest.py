"""Widest-path (max-min semiring) VertexProgram vs a brute-force
Bellman-Ford reference, plus a hand-checked bottleneck case."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from essentials_rd.graph import build_graph


def _edge_ds(src, dst, weight):
    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "weight": pa.array(weight, pa.float64()),
    }))


def widest_ref(vids, src, dst, w, source, big):
    """O(V·E) max-min Bellman-Ford over directed edges."""
    vids = np.asarray(vids, np.int64)
    pos = {int(v): i for i, v in enumerate(vids)}
    width = np.zeros(len(vids))
    width[pos[source]] = big
    s = np.array([pos[int(x)] for x in src])
    d = np.array([pos[int(x)] for x in dst])
    for _ in range(len(vids)):
        cand = np.minimum(width[s], w)
        new = width.copy()
        np.maximum.at(new, d, cand)
        if np.array_equal(new, width):
            break
        width = new
    return width


def test_widest_matches_reference(tmp_path):
    rng = np.random.default_rng(11)
    n, m = 60, 240
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 9, len(src)).astype(np.float64)
    g = build_graph(
        _edge_ds(src, dst, w), str(tmp_path / "g"), 4,
        symmetrize=False, weighted=True,
    )
    from essentials_rd.algorithms import widest_path
    from essentials_rd.algorithms.widest import BIG, widths_table

    vids = ray.get(g.vertex_ids_ref)
    source = int(vids[0])
    res = widest_path(g, source, checkpoint_every=0)
    assert res.converged
    t = widths_table(res)
    ref = widest_ref(vids, src, dst, w, source, BIG)
    assert np.array_equal(np.asarray(t["width"]), ref)


def test_widest_bottleneck_hand_case(tmp_path):
    # 0 -5-> 1 -2-> 3   and   0 -3-> 2 -4-> 3 : widest(3) = min(3,4)=3
    # beats min(5,2)=2; vertex 4 unreachable -> 0.
    src = [0, 1, 0, 2, 4]
    dst = [1, 3, 2, 3, 0]
    w = [5.0, 2.0, 3.0, 4.0, 9.0]
    g = build_graph(
        _edge_ds(src, dst, w), str(tmp_path / "g"), 2,
        symmetrize=False, weighted=True,
    )
    from essentials_rd.algorithms import widest_path
    from essentials_rd.algorithms.widest import BIG, widths_table

    res = widest_path(g, 0, checkpoint_every=0)
    assert res.converged
    t = widths_table(res)
    got = dict(zip(np.asarray(t["vid"]).tolist(),
                   np.asarray(t["width"]).tolist()))
    assert got == {0: BIG, 1: 5.0, 2: 3.0, 3: 3.0, 4: 0.0}


def test_widest_partition_invariance(tmp_path):
    rng = np.random.default_rng(7)
    n, m = 40, 160
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 6, len(src)).astype(np.float64)
    from essentials_rd.algorithms import widest_path
    from essentials_rd.algorithms.widest import widths_table

    outs = []
    for shards in (2, 5):
        g = build_graph(
            _edge_ds(src, dst, w), str(tmp_path / f"g{shards}"), shards,
            symmetrize=True, weighted=True,
        )
        res = widest_path(g, int(src[0]), checkpoint_every=0)
        assert res.converged
        outs.append(widths_table(res))
    assert outs[0].equals(outs[1])
