"""Product quantization: codebook training, encoding, ADC search.

Pins the distributed PQ path (ann.pq_codebooks / pq_encode /
pq_adc_topk) against a local NumPy re-derivation of the same spherical
Lloyd contract, asserts block-layout invariance of the codes, and pins
ADC search recall against exact brute-force cosine top-k on a planted
clustered fixture.
"""
import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ann import (
    brute_force_topk,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)
from essentials_rd.util import hash64, np_col


def _vec_ds(m: np.ndarray) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(m)), pa.int64()),
        "embedding": pa.array([r.tolist() for r in m.astype(np.float32)],
                              pa.list_(pa.float32())),
    }))


def _norm(x):
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


def _ref_pq(m: np.ndarray, ids: np.ndarray, n_sub: int, k: int,
            iters: int, seed: int):
    """Local single-process re-derivation of pq_codebooks+pq_encode:
    hash-smallest k*4 rows seed (same rows per subspace, sorted
    rng.choice ranks), spherical Lloyd with empty-cluster keep, final
    first-max argmax assignment."""
    full = m.astype(np.float32).astype(np.float64)
    d = full.shape[1]
    sub = d // n_sub
    h = (hash64(ids.astype(np.int64)) >> np.uint64(1)).astype(np.int64)
    seed_rows = np.argsort(h, kind="stable")[: k * 4]
    rng = np.random.default_rng(seed)
    sel = np.sort(rng.choice(len(seed_rows), size=k, replace=False))
    books, codes = [], []
    for s in range(n_sub):
        x = _norm(full[:, s * sub:(s + 1) * sub])
        c = x[seed_rows][sel].copy()
        for _ in range(iters):
            b = np.argmax(x @ c.T, axis=1)
            for j in range(k):
                pts = x[b == j]
                if len(pts):
                    c[j] = _norm(pts.mean(axis=0)[None, :])[0]
        books.append(c)
        codes.append(np.argmax(x @ c.T, axis=1))
    return books, np.stack(codes, axis=1)


def test_pq_matches_local_reference():
    rng = np.random.default_rng(11)
    m = rng.normal(size=(180, 16))
    ids = np.arange(180)
    ds = _vec_ds(m).repartition(5)
    books = pq_codebooks(ds, m=4, k=8, iters=3, seed=7, dim=16)
    ref_books, ref_codes = _ref_pq(m, ids, n_sub=4, k=8, iters=3, seed=7)
    for got, want in zip(books, ref_books):
        assert np.allclose(got, want, atol=1e-9)
    enc = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    got_codes = enc[[f"code_{s}" for s in range(4)]].to_numpy()
    assert np.array_equal(got_codes, ref_codes)


def test_pq_codes_block_layout_invariant():
    rng = np.random.default_rng(3)
    m = rng.normal(size=(150, 16))
    outs = []
    for parts in (1, 7):
        ds = _vec_ds(m).repartition(parts)
        books = pq_codebooks(ds, m=2, k=4, iters=2, seed=42, dim=16)
        enc = pq_encode(ds, books).to_pandas().sort_values("vec_id")
        outs.append(enc.reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_pq_adc_recall_on_clustered_data():
    # planted clusters: PQ with k codewords per subspace reconstructs
    # cluster geometry well, so ADC top-k should mostly agree with
    # exact cosine top-k
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(12, 16)) * 4.0
    labels = rng.integers(0, 12, size=240)
    pts = centers[labels] + rng.normal(size=(240, 16)) * 0.3
    ds = _vec_ds(pts).repartition(4)
    books = pq_codebooks(ds, m=4, k=16, iters=4, seed=1, dim=16)
    codes = pq_encode(ds, books)
    q = pts[0].astype(np.float64)
    adc = pq_adc_topk(codes, books, q, k=10)
    got = np_col(adc, "vec_id")
    # within a cluster, code tuples coincide and ADC scores tie — so
    # exact-top-k overlap is id-order luck; the honest recall claim is
    # that ADC retrieves the query's planted CLUSTER
    assert (labels[got] == labels[0]).mean() >= 0.9
    # ...and exact search agrees the cluster is the right answer
    exact = brute_force_topk(ds, pts[:1].astype(np.float32), np.arange(1), k=10)
    want = np_col(exact, "vec_id")
    assert (labels[want] == labels[0]).mean() >= 0.9
    # integer scores, deterministic ranking
    sc = np_col(adc, "score_q")
    assert sc.dtype == np.int64
    assert (np.diff(sc) <= 0).all()


def test_ivfpq_full_probe_equals_adc_over_all():
    """With nprobe = num_centroids, IVF pruning is a no-op: the
    composed search must return exactly the global ADC top-k."""
    from essentials_rd.ann import ivfpq_topk, pq_codebooks, pq_encode

    rng = np.random.default_rng(21)
    m = rng.normal(size=(160, 16))
    ds = _vec_ds(m).repartition(4)
    q = m[5].astype(np.float32).astype(np.float64)
    got = ivfpq_topk(ds, q, num_centroids=4, nprobe=4, m=4, codewords=8,
                     iters=2, k=8, seed=3)
    books = pq_codebooks(ds, m=4, k=8, iters=2, seed=3, dim=16)
    want = pq_adc_topk(pq_encode(ds, books), books, q, k=8)
    assert np_col(got, "vec_id").tolist() == np_col(want, "vec_id").tolist()
    assert np_col(got, "score_q").tolist() == np_col(want, "score_q").tolist()
    assert np_col(got, "rank").tolist() == list(range(1, 9))


def test_ivfpq_pruned_results_subset_and_layout_invariant():
    from essentials_rd.ann import ivfpq_topk

    rng = np.random.default_rng(8)
    centers = rng.normal(size=(6, 16)) * 4.0
    labels = rng.integers(0, 6, size=200)
    pts = centers[labels] + rng.normal(size=(200, 16)) * 0.3
    q = pts[3]
    outs = []
    for parts in (2, 9):
        ds = _vec_ds(pts).repartition(parts)
        t = ivfpq_topk(ds, q, num_centroids=6, nprobe=2, m=4,
                       codewords=8, iters=3, k=10, seed=5)
        outs.append((np_col(t, "vec_id").tolist(),
                     np_col(t, "score_q").tolist(),
                     np_col(t, "bucket").tolist()))
    assert outs[0] == outs[1]
    got = np.array(outs[0][0])
    # pruned search still finds the query's planted cluster
    assert (labels[got] == labels[3]).mean() >= 0.9
    # results only come from probed buckets (<= nprobe distinct)
    assert len(set(outs[0][2])) <= 2
