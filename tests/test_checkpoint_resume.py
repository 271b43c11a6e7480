"""Checkpoint / resume (SURVEY.md §5.2 item 6; BASELINE.json: "a killed
run resumes mid-iteration"): resume-from-any-k equals an uninterrupted
run EXACTLY, partial step dirs are discarded, lineage metrics complete."""

import json
import os

import numpy as np
import pytest

from essentials_rd.algorithms import connected_components, pagerank
from essentials_rd.algorithms.pagerank import pagerank_table
from essentials_rd.algorithms.cc import components_table
from essentials_rd.checkpoint import CheckpointManager
from essentials_rd.graph import build_graph, reload_graph

from .conftest import edges_ds, small_graph


class _Kill(Exception):
    pass


def _graph(tmp_path, sub, seed=31, n=40, m=120, P=3):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    return small_graph(
        tmp_path / sub, src[keep], dst[keep], P=P,
        vertex_ids=np.arange(n, dtype=np.int64),
    )


@pytest.mark.parametrize("mode", ["tasks", "fused"])
def test_resume_equals_uninterrupted(tmp_path, mode):
    g = _graph(tmp_path, "g")
    # uninterrupted
    ck_a = CheckpointManager(str(tmp_path / "ck_a"))
    res_a = pagerank(g, tol=0.0, max_iters=6, ckpt=ck_a, scatter_mode=mode)
    # killed after superstep 3 (exception AFTER step 3 finalized)
    ck_b = CheckpointManager(str(tmp_path / "ck_b"))

    def killer(k, lin):
        if k == 3:
            raise _Kill()

    with pytest.raises(_Kill):
        pagerank(g, tol=0.0, max_iters=6, ckpt=ck_b, scatter_mode=mode,
                 on_step_end=killer)
    assert ck_b.latest_step() == 3
    # resume — reload graph from the immutable edge checkpoint, like a
    # fresh process would
    g2 = reload_graph(g.edges_dir, g.num_parts)
    res_b = pagerank(g2, tol=0.0, max_iters=6, ckpt=ck_b, resume=True,
                     scatter_mode=mode)
    ta = pagerank_table(res_a)
    tb = pagerank_table(res_b)
    assert np.asarray(ta["pagerank"]).tolist() == np.asarray(tb["pagerank"]).tolist()


def test_partial_step_dir_discarded(tmp_path):
    g = _graph(tmp_path, "g")
    ck = CheckpointManager(str(tmp_path / "ck"))
    pagerank(g, tol=0.0, max_iters=2, ckpt=ck)
    # simulate a crash mid-write of step 3: state dir exists, no _SUCCESS
    os.makedirs(ck.step_dir(3))
    with open(os.path.join(ck.step_dir(3), "garbage.parquet"), "w") as f:
        f.write("junk")
    os.makedirs(os.path.join(str(tmp_path / "ck"), "_tmp_step_00004"))
    res = pagerank(g, tol=0.0, max_iters=4, ckpt=ck, resume=True)
    assert res.supersteps == 4
    assert not os.path.exists(os.path.join(str(tmp_path / "ck"), "_tmp_step_00004"))


def test_resume_of_converged_run_is_noop(tmp_path):
    g = _graph(tmp_path, "g")
    ck = CheckpointManager(str(tmp_path / "ck"))
    res1 = connected_components(g, ckpt=ck, scatter_mode="fused")
    assert res1.converged
    res2 = connected_components(g, ckpt=ck, resume=True, scatter_mode="fused")
    assert res2.converged
    t1, t2 = components_table(res1), components_table(res2)
    assert np.asarray(t1["label"]).tolist() == np.asarray(t2["label"]).tolist()


def test_lineage_contents(tmp_path):
    g = _graph(tmp_path, "g")
    ck = CheckpointManager(str(tmp_path / "ck"))
    res = connected_components(g, ckpt=ck, scatter_mode="fused")
    k = res.supersteps
    with open(ck.step_dir(1) + ".lineage.json") as f:
        lin = json.load(f)
    assert lin["superstep"] == 1
    assert lin["rows"] == 40  # every vertex has a state row
    assert lin["msg_count"] > 0
    assert len(lin["partitions"]) == g.num_parts
    for p in lin["partitions"]:
        assert set(p) >= {"part", "rows", "msg_count", "changed", "sum_delta"}
    # final superstep: no changes
    with open(ck.step_dir(k) + ".lineage.json") as f:
        lin_last = json.load(f)
    assert lin_last["changed"] == 0


def test_checkpoint_every_n(tmp_path):
    g = _graph(tmp_path, "g")
    ck = CheckpointManager(str(tmp_path / "ck"))
    pagerank(g, tol=0.0, max_iters=6, ckpt=ck, checkpoint_every=3)
    steps = sorted(
        int(f.split("_")[1].split(".")[0])
        for f in os.listdir(str(tmp_path / "ck"))
        if f.endswith("._SUCCESS")
    )
    assert steps == [0, 3, 6]
