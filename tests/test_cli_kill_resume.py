"""Kill-resume through the real CLI in subprocesses (BASELINE.json: "a
killed `ray job submit` run resumes mid-iteration"): SIGKILL a running
PageRank job mid-loop, resume in a fresh process, require the final
state to equal an uninterrupted run exactly."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow.parquet as pq
import pytest

from essentials_rd.corpus import generate_corpus

TIMEOUT = 240


def _run_cli(args, **kw):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    return subprocess.run(
        [sys.executable, "-m", "essentials_rd.cli", *args],
        capture_output=True, text=True, timeout=TIMEOUT, env=env, **kw
    )


@pytest.mark.slow
def test_cli_kill_resume_pagerank(tmp_path):
    corpus = tmp_path / "corpus"
    generate_corpus(str(corpus), n_repos=150, seed=11, compute_expected=False)
    inp = str(corpus / "repo_files.parquet")
    common = ["--input", inp, "--algo", "pr", "--num-parts", "4",
              "--num-cpus", "4", "--tol", "0", "--max-iters", "6",
              "--cap", "50"]

    # uninterrupted run
    out_a = tmp_path / "out_a"
    r = _run_cli([*common, "--ckpt-dir", str(tmp_path / "ck_a"), "--out", str(out_a)])
    assert r.returncode == 0, r.stderr[-2000:]

    # killed run: SIGKILL once superstep 2 is checkpointed
    ck_b = tmp_path / "ck_b"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "essentials_rd.cli", *common,
         "--ckpt-dir", str(ck_b)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    deadline = time.time() + TIMEOUT
    killed = False
    while time.time() < deadline:
        if (ck_b / "step_00002._SUCCESS").exists():
            proc.kill()
            killed = True
            break
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    assert killed, "job finished before it could be killed — enlarge the corpus"
    proc.wait(timeout=30)

    # resume in a fresh process
    out_b = tmp_path / "out_b"
    r2 = _run_cli([*common, "--ckpt-dir", str(ck_b), "--out", str(out_b),
                   "--resume"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    done = [json.loads(l) for l in r2.stdout.splitlines()
            if l.startswith("{")][-1]
    assert done["supersteps"] == 6

    ta = pq.read_table(out_a).sort_by("vid")
    tb = pq.read_table(out_b).sort_by("vid")
    assert np.asarray(ta["vid"]).tolist() == np.asarray(tb["vid"]).tolist()
    assert np.asarray(ta["value"]).tolist() == np.asarray(tb["value"]).tolist()


@pytest.mark.slow
def test_cli_round3_algos_smoke(tmp_path):
    """Every round-3 CLI algo (eigen/color/hits/bc/msf/wpr/ktruss/esim/
    nsample/walks) runs end-to-end through the real entry point and
    writes a result parquet."""
    corpus = tmp_path / "corpus"
    generate_corpus(str(corpus), n_repos=150, seed=13, compute_expected=False)
    inp = str(corpus / "repo_files.parquet")
    expect_rows_col = {
        "eigen": "value", "color": "color", "hits": "hub",
        "bc": "bc", "msf": "weight", "wpr": "value",
        "ktruss": "src", "esim": "jaccard", "nsample": "dst",
        "walks": "node", "n2v": "node", "harmonic": "h",
        "scc": "scc", "lpath": "depth", "match": "src",
        "katz": "value", "fastrp": "x0",
    }
    for algo, col in expect_rows_col.items():
        out = tmp_path / f"out_{algo}"
        r = _run_cli([
            "--input", inp, "--algo", algo, "--num-parts", "4",
            "--num-cpus", "4", "--max-iters", "40", "--k", "2",
            "--cap", "50", "--ckpt-dir", str(tmp_path / f"ck_{algo}"),
            "--out", str(out),
        ])
        assert r.returncode == 0, (algo, r.stderr[-2000:])
        done = json.loads(r.stdout.strip().splitlines()[-1])
        assert done["event"] == "done" and done["algo"] == algo
        t = pq.read_table(str(out))
        assert t.num_rows > 0 and col in t.column_names, (algo, t.column_names)


def test_run_query_cli_smoke(tmp_path):
    """The query-runner entry point lists pipelines and executes one
    end-to-end in a subprocess (its own Ray session)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "essentials_rd.run_query", "--list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 0
    names = r.stdout.split()
    assert "degree" in names and len(names) >= 140
    out = tmp_path / "q_out"
    r = subprocess.run(
        [sys.executable, "-m", "essentials_rd.run_query", "orders_checksum",
         "--sf-dir", "/root/testdata/sf0.001", "--out", str(out),
         "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "orders_checksum: 1 rows" in r.stdout
    import pyarrow.parquet as pq_

    assert pq_.read_table(str(out)).num_rows == 1


def _write_truss_corpus(path):
    """Corpus whose derived graph is an anchored path-power P^3 on 300
    repos (+K6 anchor): 5-truss peeling takes 3 rounds and leaves the
    anchor — every planted edge is one shared path between two repos."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 300
    es = {(i, j) for i in range(n) for j in range(i + 1, min(i + 4, n))}
    for i in range(6):
        for j in range(i + 1, 6):
            es.add((i, j))
    repos, paths, contents = [], [], []
    for a, b in sorted(es):
        p = f"shared/e{a:05d}_{b:05d}.py"
        c = f"# edge {a} {b} filler words only"
        for r in (a, b):
            repos.append(f"r{r:05d}")
            paths.append(p)
            contents.append(c)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table({"repo": pa.array(repos), "path": pa.array(paths),
                  "content": pa.array(contents)}),
        path,
    )


@pytest.mark.slow
def test_cli_kill_resume_ktruss(tmp_path):
    """SIGKILL a k-truss peel after round 1's checkpoint lands; resume
    must reach the identical fixpoint and total round count as an
    uninterrupted run (the iterative-pipeline generalization of the
    PR kill-resume test)."""
    inp = str(tmp_path / "corpus" / "repo_files.parquet")
    _write_truss_corpus(inp)
    common = ["--input", inp, "--algo", "ktruss", "--k", "5",
              "--num-parts", "4", "--num-cpus", "4", "--cap", "50",
              "--checkpoint-every", "1"]

    out_a = tmp_path / "out_a"
    r = _run_cli([*common, "--ckpt-dir", str(tmp_path / "ck_a"),
                  "--out", str(out_a)])
    assert r.returncode == 0, r.stderr[-2000:]
    done_a = [json.loads(l) for l in r.stdout.splitlines()
              if l.startswith("{")][-1]
    assert done_a["converged"] and done_a["rounds"] >= 3
    assert done_a["edges"] == 15  # the K6 anchor survives

    ck_b = tmp_path / "ck_b"
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "essentials_rd.cli", *common,
         "--ckpt-dir", str(ck_b)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    deadline = time.time() + TIMEOUT
    killed = False
    while time.time() < deadline:
        if (ck_b / "step_00001._SUCCESS").exists():
            proc.kill()
            killed = True
            break
        if proc.poll() is not None:
            break
        time.sleep(0.1)
    assert killed, "job finished before it could be killed — enlarge the corpus"
    proc.wait(timeout=30)

    out_b = tmp_path / "out_b"
    r2 = _run_cli([*common, "--ckpt-dir", str(ck_b), "--out", str(out_b),
                   "--resume"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    done_b = [json.loads(l) for l in r2.stdout.splitlines()
              if l.startswith("{")][-1]
    assert done_b["converged"]
    assert done_b["rounds"] == done_a["rounds"]

    ta = pq.read_table(out_a).sort_by([("src", "ascending"), ("dst", "ascending")])
    tb = pq.read_table(out_b).sort_by([("src", "ascending"), ("dst", "ascending")])
    assert ta.column("src").to_pylist() == tb.column("src").to_pylist()
    assert ta.column("dst").to_pylist() == tb.column("dst").to_pylist()
