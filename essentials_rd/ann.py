"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast via
``ray.put`` once, every batch does one float64 matmul against it and
keeps a per-batch partial top-k; partials merge driver-side (k × blocks
rows).  Scale path: ``ivf_topk`` clusters vectors into buckets (seeded
k-means-ish assignment by nearest of C sampled centroids) and probes
only the closest ``nprobe`` buckets per query — same per-batch kernel,
probed buckets selected by a bucket column filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .util import hash64, np_col


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    lists = batch.column(col)
    flat = np.asarray(lists.combine_chunks().flatten(), dtype=np.float64)
    n = batch.num_rows
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return m / nrm


def _seed_matrix(
    vectors: rd.Dataset, n_rows: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic, BLOCK-ORDER-INVARIANT seed sample: the ``n_rows``
    vectors whose hashed id is smallest — a pure function of row
    identity (ops.deterministic_sample's property), unlike
    ``Dataset.take`` which returns whatever rows the first blocks hold
    and therefore biases centroids toward the leading file shards."""
    from .ops import top_k
    from .util import hash64

    def _stamp(batch: pa.Table) -> pa.Table:
        h = hash64(np_col(batch, id_col).astype(np.int64))
        return pa.table(
            {
                vec_col: batch.column(vec_col),
                "__h__": pa.array((h >> np.uint64(1)).astype(np.int64), pa.int64()),
            }
        )

    t = top_k(
        vectors.select_columns([id_col, vec_col]).map_batches(
            _stamp, batch_format="pyarrow"
        ),
        "__h__",
        n_rows,
        descending=False,
    )
    return _normalize(_batch_matrix(t.combine_chunks(), vec_col))


def brute_force_topk(
    vectors: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    round_digits: int = 6,
) -> pa.Table:
    """(query_id, rank, vec_id, cosine) — exact top-k by cosine.

    Determinism: similarities are computed in float64, rounded half-up
    to ``round_digits``, ranked by (-cos, vec_id) — the exact order the
    DuckDB oracle reproduces with list_cosine_similarity on DOUBLE[].
    """
    from .pipelines import round_half_up

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((qm, np.asarray(query_ids, dtype=np.int64)))

    def _partial(batch: pa.Table) -> pa.Table:
        qmat, qids = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = np_col(batch, id_col)
        sims = m @ qmat.T  # (n, q)
        out_q, out_id, out_s = [], [], []
        for qi in range(qmat.shape[0]):
            s = round_half_up(sims[:, qi], round_digits)
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qids[qi]
            cand = np.flatnonzero(mask)
            if len(cand) > k:
                order = np.lexsort((ids[cand], -s[cand]))[:k]
                cand = cand[order]
            out_q.append(np.full(len(cand), qids[qi]))
            out_id.append(ids[cand])
            out_s.append(s[cand])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    parts = vectors.map_batches(_partial, batch_format="pyarrow").take_all()
    t = pa.Table.from_pylist(parts)
    qs = np_col(t, "query_id")
    vs = np_col(t, "vec_id")
    ss = np_col(t, "cosine")
    out = {"query_id": [], "rank": [], "vec_id": [], "cosine": []}
    for q in np.unique(qs):
        m = qs == q
        order = np.lexsort((vs[m], -ss[m]))[:k]
        out["query_id"].extend([int(q)] * len(order))
        out["rank"].extend(range(1, len(order) + 1))
        out["vec_id"].extend(vs[m][order].tolist())
        out["cosine"].extend(ss[m][order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "cosine": pa.array(out["cosine"], pa.float64()),
        }
    )


def cosine_near_dup_pairs(
    vectors: rd.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    broadcast_limit: int = 100_000,
    num_centroids: int = 32,
    assign_probes: int = 2,
    kmeans_iters: int = 2,
) -> rd.Dataset:
    """Embedding-cosine near-duplicate PAIRS: all (a, b), a < b, with
    round(cosine, 6) ≥ threshold.

    Two physical plans, picked by table size:

    - **broadcast** (``n ≤ broadcast_limit``): the normalized full
      matrix is ``ray.put`` once and every row-block does ONE float64
      matmul against it — exact, distributed over the row blocks,
      bounded by N×d doubles of object-store memory.
    - **IVF-bucketed** (larger tables — the 100-TB shape): k-means
      centroids from a deterministic seed sample, every vector
      multi-assigned to its ``assign_probes`` nearest buckets, the
      same exact kernel run WITHIN each bucket group (no full-matrix
      residency anywhere), duplicate discoveries deduped by one small
      post-threshold shuffle.  Recall < 1 only for pairs sharing no
      probe bucket — near-dup-grade thresholds make that rare (pinned
      by the planted-dup pytest); per-worker memory is bounded by the
      largest bucket, not N.
    """
    from .pipelines import round_half_up

    vectors = vectors.materialize()
    if vectors.count() <= broadcast_limit:
        tabs = ray.get(vectors.select_columns([id_col, vec_col]).to_arrow_refs())
        full = pa.concat_tables(tabs, promote_options="default").combine_chunks()
        fm = _normalize(_batch_matrix(full, vec_col))
        fids = np_col(full, id_col).astype(np.int64)
        ref = ray.put((fm, fids))

        def _pairs(batch: pa.Table) -> pa.Table:
            fmat, ids_all = ray.get(ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            ids = np_col(batch, id_col).astype(np.int64)
            s = round_half_up(m @ fmat.T, round_digits)
            keep = (s >= threshold) & (ids[:, None] < ids_all[None, :])
            r, c = np.nonzero(keep)
            return pa.table(
                {
                    "a": pa.array(ids[r], pa.int64()),
                    "b": pa.array(ids_all[c], pa.int64()),
                    "cosine": pa.array(s[r, c], pa.float64()),
                }
            )

        return vectors.map_batches(_pairs, batch_format="pyarrow")

    # ---- IVF-bucketed exact-within-bucket plan
    from .ops import hash_bucket_agg

    centroids = kmeans_centroids(
        vectors, num_centroids, iters=kmeans_iters, vec_col=vec_col,
        id_col=id_col,
    )
    c_ref = ray.put(centroids)
    p = min(assign_probes, len(centroids))

    def _multi_assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ c.T
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p] if p < c.shape[0] \
            else np.tile(np.arange(c.shape[0]), (len(m), 1))
        n = batch.num_rows
        rep = np.repeat(np.arange(n), p)
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(rep)),
                vec_col: batch.column(vec_col).take(pa.array(rep)),
                "bucket": pa.array(top.ravel().astype(np.int64), pa.int64()),
            }
        )

    assigned = vectors.map_batches(_multi_assign, batch_format="pyarrow")

    def _bucket_pairs(grp: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(grp, vec_col))
        ids = np_col(grp, id_col).astype(np.int64)
        s = round_half_up(m @ m.T, round_digits)
        r, c = np.nonzero((s >= threshold) & (ids[:, None] < ids[None, :]))
        return pa.table(
            {
                "a": pa.array(ids[r], pa.int64()),
                "b": pa.array(ids[c], pa.int64()),
                "cosine": pa.array(s[r, c], pa.float64()),
            }
        )

    found = hash_bucket_agg(
        assigned, lambda b: np_col(b, "bucket"), _bucket_pairs,
        num_buckets=max(num_centroids, 16),
    )

    # a pair co-resident in several probe buckets is found up to
    # ``assign_probes`` times — dedup the (post-threshold, small)
    # result with one bucketed distinct
    def _dedup(grp: pa.Table) -> pa.Table:
        a, b = np_col(grp, "a"), np_col(grp, "b")
        cos = np_col(grp, "cosine")
        order = np.lexsort((b, a))
        a, b, cos = a[order], b[order], cos[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    return hash_bucket_agg(
        found,
        lambda t: np_col(t, "a") * np.int64(0x9E3779B1) + np_col(t, "b"),
        _dedup,
    )


def assign_ivf_buckets(
    vectors: rd.Dataset,
    num_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[rd.Dataset, np.ndarray]:
    """Seeded IVF: centroids = a deterministic sample of the vectors
    (ids ≡ 0 mod ⌈n/C⌉ after sort — no RNG on data), every vector
    assigned to its nearest centroid inside map_batches.  Returns the
    bucketed dataset (+bucket col) and the centroid matrix."""
    mat = _seed_matrix(vectors, num_centroids * 4, id_col, vec_col)
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(mat), size=min(num_centroids, len(mat)), replace=False)
    centroids = mat[np.sort(sel)]
    c_ref = ray.put(centroids)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        b = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    return vectors.map_batches(_assign, batch_format="pyarrow"), centroids


def ivf_topk(
    bucketed: rd.Dataset,
    centroids: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    **kw,
) -> pa.Table:
    """Approximate top-k: probe only the ``nprobe`` closest buckets per
    query.  Recall measured against brute force in the tests."""
    import pyarrow.compute as pc

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    buckets = np.unique(probe)
    flt = bucketed.map_batches(
        lambda t: t.filter(
            pc.is_in(t.column("bucket"), value_set=pa.array(buckets, pa.int32()))
        ),
        batch_format="pyarrow",
    )
    return brute_force_topk(flt, queries, query_ids, k=k, **kw)


def kmeans_centroids(
    vectors: rd.Dataset,
    num_centroids: int = 16,
    iters: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Distributed Lloyd iterations: per batch, assign to the nearest
    centroid and emit per-centroid (count, vector-sum) PARTIALS — a
    C×num_blocks-row result the driver folds into new centroids (the
    classic pre-aggregated combine: no per-vector shuffle).  Seeded,
    deterministic; empty clusters keep their previous centroid."""
    mat = _seed_matrix(vectors, num_centroids * 4, id_col, vec_col)
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(mat), size=min(num_centroids, len(mat)), replace=False)
    centroids = mat[np.sort(sel)]
    C, dim = centroids.shape
    for _ in range(iters):
        c_ref = ray.put(centroids)

        def _partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            b = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((C, dim))
            np.add.at(sums, b, m)
            counts = np.bincount(b, minlength=C).astype(np.int64)
            return pa.table(
                {
                    "bucket": pa.array(np.arange(C, dtype=np.int32), pa.int32()),
                    "count": pa.array(counts, pa.int64()),
                    "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                }
            )

        parts = vectors.map_batches(_partial, batch_format="pyarrow").take_all()
        counts = np.zeros(C, np.int64)
        sums = np.zeros((C, dim))
        for r in parts:
            counts[r["bucket"]] += r["count"]
            sums[r["bucket"]] += np.asarray(r["vsum"])
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = _normalize(sums[nonempty] / counts[nonempty, None])
    return centroids


def build_ivf_index(
    vectors: rd.Dataset,
    index_dir: str,
    num_centroids: int = 16,
    iters: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Persist a bucket-PARTITIONED IVF index: k-means centroids + the
    vectors written as Parquet partitioned by ``bucket`` (one directory
    per bucket).  At scale a probe then reads ONLY the probed buckets'
    files — storage-level pruning, not a full scan — and the partitioned
    layout doubles as the resumable-output shape (a failed build can
    skip finished buckets).  Returns the centroid matrix (also saved)."""
    import os

    centroids = kmeans_centroids(vectors, num_centroids, iters, seed, vec_col, id_col)
    c_ref = ray.put(centroids)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        b = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    os.makedirs(index_dir, exist_ok=True)
    vectors.map_batches(_assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "vectors"), partition_cols=["bucket"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    return centroids


def ivf_search(
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    **kw,
) -> pa.Table:
    """Probe a persisted IVF index: read ONLY the ``nprobe`` nearest
    buckets' parquet directories per query set, then exact top-k within
    them.  Recall vs brute force is pinned by pytest."""
    import glob
    import os

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    buckets = np.unique(probe)
    dirs = [
        f
        for b in buckets
        for f in glob.glob(
            os.path.join(index_dir, "vectors", f"bucket={b}", "*.parquet")
        )
    ]
    if not dirs:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    subset = rd.read_parquet(dirs)
    return brute_force_topk(subset, queries, query_ids, k=k, **kw)


def _rademacher_planes(dim: int, nbits: int, seed: int) -> np.ndarray:
    """Deterministic ±1 hyperplane matrix (dim × nbits): each sign is
    the low bit of ``hash64(plane·dim + axis + seed·golden)`` — data-
    independent, identical on every worker, no RNG state to ship."""
    idx = np.arange(dim * nbits, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = hash64(idx + np.uint64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1)))
    return np.where((h & np.uint64(1)).astype(bool), 1.0, -1.0).reshape(
        dim, nbits
    )


def lsh_near_dup_pairs(
    vectors: rd.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    nbits: int = 32,
    bands: int = 8,
    seed: int = 42,
    round_digits: int = 6,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Random-hyperplane (sign-random-projection) LSH variant of
    :func:`cosine_near_dup_pairs` — the brief's "LSH-bucketed" ANN
    scale path, sitting beside the IVF plan:

    - each vector gets an ``nbits`` signature ``sign(v · H)`` with H a
      deterministic Rademacher matrix (:func:`_rademacher_planes`);
    - the signature splits into ``bands`` bands of ``nbits//bands``
      bits; vectors sharing any band value land in one bucket
      (OR-of-ANDs: per-plane collision prob is 1 − θ/π, so a band of r
      bits matches with p^r and recall is 1 − (1−p^r)^bands — exact
      duplicates always collide in every band, recall 1.0 by
      construction);
    - the EXACT float64 cosine kernel runs within each bucket, so
      precision is 1.0 — LSH only gates which pairs are compared; the
      candidate set is never trusted;
    - duplicate discoveries across bands are deduped by one small
      post-threshold shuffle (same as the IVF plan).

    Per-worker memory is bounded by the largest band bucket, never N.
    Compared to IVF: no training pass (no k-means), data-independent
    routing (skew follows signature collisions, not cluster sizes)."""
    from .ops import hash_bucket_agg
    from .pipelines import round_half_up

    assert nbits % bands == 0, "nbits must divide into equal bands"
    r = nbits // bands
    assert r < 63, "band width must fit an int64 key"

    def _signatures(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        H = _rademacher_planes(m.shape[1], nbits, seed)
        bits = (m @ H) > 0.0  # (n, nbits)
        n = batch.num_rows
        keys = np.zeros((n, bands), np.int64)
        w = (np.int64(1) << np.arange(r, dtype=np.int64))
        for bi in range(bands):
            chunk = bits[:, bi * r:(bi + 1) * r].astype(np.int64)
            keys[:, bi] = (chunk @ w) + (np.int64(bi) << np.int64(r))
        rep = np.repeat(np.arange(n), bands)
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(rep)),
                vec_col: batch.column(vec_col).take(pa.array(rep)),
                "bucket": pa.array(keys.ravel(), pa.int64()),
            }
        )

    assigned = vectors.select_columns([id_col, vec_col]).map_batches(
        _signatures, batch_format="pyarrow"
    )

    def _bucket_pairs(grp: pa.Table) -> pa.Table:
        # sub-group by the actual band key (hash buckets only route)
        out_a, out_b, out_s = [], [], []
        bk = np_col(grp, "bucket")
        order = np.argsort(bk, kind="stable")
        bk_s = bk[order]
        bounds = np.r_[0, np.flatnonzero(bk_s[1:] != bk_s[:-1]) + 1, len(bk_s)]
        for i in range(len(bounds) - 1):
            sel = order[bounds[i]:bounds[i + 1]]
            if len(sel) < 2:
                continue
            sub = grp.take(pa.array(sel))
            m = _normalize(_batch_matrix(sub, vec_col))
            ids = np_col(sub, id_col).astype(np.int64)
            s = round_half_up(m @ m.T, round_digits)
            rr, cc = np.nonzero((s >= threshold) & (ids[:, None] < ids[None, :]))
            out_a.append(ids[rr])
            out_b.append(ids[cc])
            out_s.append(s[rr, cc])
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    found = hash_bucket_agg(
        assigned, lambda b: np_col(b, "bucket"), _bucket_pairs,
        num_buckets=num_buckets,
    )

    def _dedup(grp: pa.Table) -> pa.Table:
        a, b = np_col(grp, "a"), np_col(grp, "b")
        cos = np_col(grp, "cosine")
        order = np.lexsort((b, a))
        a, b, cos = a[order], b[order], cos[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
            }
        )

    return hash_bucket_agg(
        found,
        lambda t: np_col(t, "a") * np.int64(0x9E3779B1) + np_col(t, "b"),
        _dedup,
    )


def cosine_dup_clusters(
    vectors: rd.Dataset,
    work_dir: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_parts: int = 8,
    **pair_kwargs,
) -> tuple[pa.Table, int]:
    """Embedding near-duplicate CLUSTERS: the exact cosine pair graph
    (:func:`cosine_near_dup_pairs` — broadcast or IVF plan by size)
    feeds the SAME hash-min CC superstep engine the link graph uses
    (textops.near_dup_clusters is the text twin).  Returns ((vec_id,
    cluster) for every vector in ≥1 pair, cluster = min vec_id of its
    component, plus the CC superstep count so callers can assert it
    against an unrolled oracle's round bound)."""
    from .algorithms import connected_components
    from .algorithms.cc import components_table
    from .graph import build_graph

    pairs = cosine_near_dup_pairs(
        vectors, threshold, id_col=id_col, vec_col=vec_col, **pair_kwargs
    )
    edges = pairs.map_batches(
        lambda t: pa.table({"src": t.column("a"), "dst": t.column("b")}),
        batch_format="pyarrow",
    ).materialize()
    if edges.count() == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())}), 0
    g = build_graph(edges, work_dir, num_parts, symmetrize=True,
                    persist=False)
    res = connected_components(g, checkpoint_every=0)
    assert res.converged
    t = components_table(res)
    return pa.table({id_col: t["vid"], "cluster": t["label"]}), res.supersteps


@ray.remote
def _gram_block(col: str, scale: float, *tables) -> np.ndarray:
    """Partial integer Gram matrix over blocks: Qᵀ·Q with
    q = floor(e·scale) per component — exact int64, order-independent."""
    acc = None
    for t in tables:
        if t.num_rows == 0:
            continue
        m = _batch_matrix(t, col)
        q = np.floor(m.astype(np.float64) * scale).astype(np.int64)
        g = q.T @ q
        acc = g if acc is None else acc + g
    return acc if acc is not None else np.zeros((0, 0), np.int64)


def gram_matrix(
    vectors: rd.Dataset, col: str = "embedding", scale: float = 1e6
) -> np.ndarray:
    """EXACT distributed Gram matrix G = Σ_v q(v)·q(v)ᵀ over integer-
    quantized embeddings q = floor(e·scale) — the building block for
    covariance / PCA-whitening stats over a 100-TB embedding table:
    each block contributes one d×d int64 partial inside a Ray task
    (32 KB at d=64 — the OUTPUT of the scan, not the vectors, is what
    moves), partials tree-merge by addition, and integer arithmetic
    makes the result independent of block layout and summation order —
    bit-identical at any cluster size, unlike a float Gram whose
    reduction order changes the ulps.  Caller bounds overflow:
    n_rows · (max|e|·scale)² must fit int64 (at |e|≤1, scale=1e6 that
    is 9.2×10⁶ — use scale=1e3 for larger tables, still exact)."""
    blocks = vectors.to_arrow_refs()
    refs = [
        _gram_block.remote(col, scale, *blocks[i : i + 4])
        for i in range(0, max(len(blocks), 1), 4)
    ] or [_gram_block.remote(col, scale)]
    while len(refs) > 1:
        refs = [_gram_sum.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    return ray.get(refs[0])


@ray.remote
def _gram_sum(*mats: np.ndarray) -> np.ndarray:
    mats = [m for m in mats if m.size]
    out = mats[0].copy()
    for m in mats[1:]:
        out += m
    return out


def dim_stats(
    vectors: rd.Dataset, col: str = "embedding", scale: float = 1e6
) -> pa.Table:
    """Per-DIMENSION statistics of an embedding list column — the
    unnest/posexplode projection done without ever exploding: for each
    component index d, ``(dim, n, min_v, max_v, sum_q)`` where
    ``sum_q = Σ floor(e_d · scale)`` over all rows (integer-exact, so
    the result is block-layout independent; the float mean derives as
    sum_q/(n·scale) driver-side).  min/max are raw float values — pure
    comparisons, no arithmetic, hence bit-exact too.

    Scale shape: one (d,)-sized partial per block inside
    ``map_batches`` (d·#blocks tiny rows leave the scan, never the
    n×d matrix), folded driver-side.  A row-wise unnest would multiply
    the table d× before a d-group aggregate — this is the reason the
    operator exists."""

    def _partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, col)
        if m.size == 0:
            return pa.table(
                {"dim": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "min_v": pa.array([], pa.float64()),
                 "max_v": pa.array([], pa.float64()),
                 "sum_q": pa.array([], pa.int64())}
            )
        d = m.shape[1]
        q = np.floor(m * scale).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "n": pa.array(np.full(d, m.shape[0], np.int64)),
                "min_v": pa.array(m.min(axis=0), pa.float64()),
                "max_v": pa.array(m.max(axis=0), pa.float64()),
                "sum_q": pa.array(q.sum(axis=0), pa.int64()),
            }
        )

    parts = vectors.map_batches(_partial, batch_format="pyarrow").take_all()
    import pandas as pd

    df = pd.DataFrame(parts)
    g = df.groupby("dim", as_index=False).agg(
        n=("n", "sum"), min_v=("min_v", "min"), max_v=("max_v", "max"),
        sum_q=("sum_q", "sum"),
    )
    g = g.sort_values("dim").reset_index(drop=True)
    return pa.table(
        {
            "dim": pa.array(g["dim"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "min_v": pa.array(g["min_v"].to_numpy(np.float64)),
            "max_v": pa.array(g["max_v"].to_numpy(np.float64)),
            "sum_q": pa.array(g["sum_q"].to_numpy(np.int64)),
        }
    )


def knn_graph(
    vectors: rd.Dataset,
    centroids: np.ndarray,
    k: int,
    *,
    scale: float = 1e3,
    query_mod: int | None = None,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Bucketed k-nearest-neighbor GRAPH over an embedding table — the
    corpus-vs-corpus companion of ``ann_cosine_topk`` and the building
    block of embedding-cluster pipelines: every (query) vector gets its
    top-k most-similar neighbors WITHIN ITS IVF BUCKET by maximum
    inner product over integer-quantized components
    ``q = floor(e·scale)``.

    Integer dots make the ranking bit-exact and block-layout /
    summation-order independent (a float cosine rank can flip
    near-ties between engines); the (dot desc, nbr_id asc) total order
    pins remaining ties.  Bucketing via nearest centroid (cosine
    argmax, same rule as ``kmeans_centroids`` assignment) bounds
    per-worker cost to O(|bucket|²·d): at scale, centroid count — not
    table size — sets the memory/compute envelope, and buckets process
    in parallel after ONE groupby shuffle.  ``query_mod`` restricts
    query rows to ``id % query_mod == 0`` (neighbors still come from
    the full bucket) — the scout/sample shape.

    Returns (id, nbr_id, dot_q, rank) with rank 1..k; vectors alone in
    their bucket emit nothing."""
    c_ref = ray.put(np.asarray(centroids, np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, col))
        b = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return batch.append_column("__bucket__", pa.array(b, pa.int64()))

    def _bucket_knn(grp: pa.Table) -> pa.Table:
        ids = np_col(grp, id_col)
        m = _batch_matrix(grp, col)
        q = np.floor(m * scale).astype(np.int64)
        # columns ordered by id asc so a STABLE sort on -dot yields the
        # (dot desc, id asc) total order without a composite key
        order = np.argsort(ids, kind="stable")
        ids_s, q_s = ids[order], q[order]
        qmask = (
            (ids_s % query_mod) == 0
            if query_mod
            else np.ones(len(ids_s), bool)
        )
        nq = int(qmask.sum())
        if nq == 0 or len(ids_s) < 2:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "nbr_id": pa.array([], pa.int64()),
                 "dot_q": pa.array([], pa.int64()),
                 "rank": pa.array([], pa.int64())}
            )
        d = q_s[qmask] @ q_s.T  # exact int64 inner products
        # self-exclusion: sink the query's own column (−max, NOT int64
        # min — the stable sort below negates d and −min overflows back
        # to min, which would float the self column to rank 1)
        qpos = np.flatnonzero(qmask)
        d[np.arange(nq), qpos] = -np.iinfo(np.int64).max
        kk = min(k, len(ids_s) - 1)
        nbr = np.argsort(-d, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(ids_s[qpos], kk)
        return pa.table(
            {
                id_col: pa.array(rows, pa.int64()),
                "nbr_id": pa.array(ids_s[nbr.ravel()], pa.int64()),
                "dot_q": pa.array(
                    np.take_along_axis(d, nbr, axis=1).ravel(), pa.int64()
                ),
                "rank": pa.array(
                    np.tile(np.arange(1, kk + 1, dtype=np.int64), nq),
                    pa.int64(),
                ),
            }
        )

    return (
        vectors.map_batches(_assign, batch_format="pyarrow")
        .groupby("__bucket__")
        .map_groups(
            lambda g: _bucket_knn(g.drop_columns(["__bucket__"])),
            batch_format="pyarrow",
        )
    )


def label_centroid_sums(
    vectors: rd.Dataset,
    label_col: str = "label",
    col: str = "embedding",
    scale: float = 1e6,
) -> rd.Dataset:
    """Per-label embedding centroid sums, integer-exact: for every
    (label, dim) the count and Σ floor(e·scale) — the class-centroid /
    prototype table (nearest-class-mean classifiers, drift monitoring)
    whose float mean derives as sum_q/(n·scale).  Per-block partials
    are (labels-in-block × d) rows — the n×d matrix never moves — and
    one small bucketed combine finishes.  Same overflow contract as
    gram_matrix."""
    from .ops import grouped_pandas_agg
    from .util import np_col

    def _partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, col)
        lab = np_col(batch, label_col).astype(np.int64)
        if m.size == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "__n__": pa.array([], pa.int64()),
                             "__s__": pa.array([], pa.int64())})
        d = m.shape[1]
        q = np.floor(m * scale).astype(np.int64)
        uq, inv = np.unique(lab, return_inverse=True)
        n_per = np.bincount(inv, minlength=len(uq)).astype(np.int64)
        sums = np.zeros((len(uq), d), np.int64)
        np.add.at(sums, inv, q)
        return pa.table(
            {
                "label": pa.array(np.repeat(uq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        len(uq)), pa.int64()),
                "__n__": pa.array(np.repeat(n_per, d), pa.int64()),
                "__s__": pa.array(sums.ravel(), pa.int64()),
            }
        )

    return grouped_pandas_agg(
        vectors.map_batches(_partial, batch_format="pyarrow"),
        keys=["label", "dim"],
        aggs={"n": ("__n__", "sum"), "sum_q": ("__s__", "sum")},
        key_fn=lambda b: np_col(b, "label") * np.int64(131)
        + np_col(b, "dim"),
        num_buckets=16,
    )


def build_ann_index(
    vectors: rd.Dataset,
    adjacency: rd.Dataset,
    out_dir: str,
    num_partitions: int = 64,
    *,
    id_col: str = "vec_id",
) -> tuple[pa.Table, pa.Table]:
    """Persist the two artifacts a graph-ANN SERVING path probes —
    the neighbor graph (:func:`knn_graph` output, hash-partitioned on
    the source id) and the vector table (hash-partitioned on the id) —
    through the resumable ``_SUCCESS``-gated sink.  A search for one
    query then opens O(hops × beam) partition FILES instead of
    scanning either table: the DiskANN/HNSW-shaped layout where the
    index lives on shared storage and lookups stay I/O-pruned.
    Returns both sink receipts; a crashed build resumes skipping
    finished partitions."""
    import os

    from .sinks import write_partitioned

    r_adj = write_partitioned(
        adjacency, os.path.join(out_dir, "adj"),
        lambda t: np_col(t, id_col).astype(np.int64), num_partitions)
    r_vec = write_partitioned(
        vectors, os.path.join(out_dir, "vec"),
        lambda t: np_col(t, id_col).astype(np.int64), num_partitions)
    return r_adj, r_vec


def _probe_parts(base: str, num_partitions: int, ids: np.ndarray,
                 columns: list[str], id_col: str) -> pa.Table:
    """Read ONLY the partitions ``ids`` hash into, filtered to the
    exact ids — the partition-pruned point lookup (same shape as
    textops.probe_inverted_index)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    from .sinks import _part_dir

    h = hash64(ids.astype(np.int64)) % np.uint64(num_partitions)
    tabs = []
    idset = pa.array(np.unique(ids).astype(np.int64))
    for p in sorted(set(int(x) for x in h)):
        f = os.path.join(_part_dir(base, p), "data.parquet")
        if not os.path.exists(f):
            continue
        t = pq_.read_table(f, columns=columns)
        tabs.append(t.filter(pc.is_in(t.column(id_col), value_set=idset)))
    if tabs:
        return pa.concat_tables(tabs)
    return pa.table({c: pa.array([], pa.int64()) for c in columns})


def graph_ann_search(
    index_dir: str,
    num_partitions: int,
    query: np.ndarray,
    entry_ids: np.ndarray,
    *,
    beam: int = 8,
    hops: int = 3,
    k: int = 5,
    scale: float = 1e3,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> pa.Table:
    """Greedy BEAM search over a persisted neighbor graph (the
    NSW / HNSW / DiskANN serving shape, public algorithms — Malkov &
    Yashunin 2016, Subramanya et al. 2019): start from deterministic
    ``entry_ids``, repeatedly expand the current beam's out-neighbors
    (ONE partition-pruned adjacency probe per hop), score candidates
    by the exact integer-quantized inner product
    ``Σ floor(x·scale)·floor(query·scale)`` (one vector probe per hop,
    ids never re-fetched), keep the top-``beam`` by (dot desc, id
    asc), and after ``hops`` rounds return the beam's top-``k`` as
    (vec_id, dot_q, rank).

    Fixed-hop beam semantics — beam_{h+1} = top-B of beam_h ∪
    N⁺(beam_h) — rather than best-first-with-visited-set, because it
    is layout-deterministic AND SQL-unrollable (one join + one window
    per hop), so the whole search path is oracle-checkable.  Driver
    state is O(beam × k) ids per hop; I/O is O(hops × beam) partition
    files, never a scan of either table."""
    import os

    qv = np.floor(np.asarray(query, np.float64) * scale).astype(np.int64)
    scores: dict[int, int] = {}

    def _score(ids: np.ndarray) -> None:
        new = np.array([i for i in np.unique(ids) if i not in scores],
                       np.int64)
        if not len(new):
            return
        t = _probe_parts(os.path.join(index_dir, "vec"), num_partitions,
                         new, [id_col, col], id_col)
        if not t.num_rows:
            return
        m = np.floor(_batch_matrix(t, col) * scale).astype(np.int64)
        dots = m @ qv
        for i, d in zip(np_col(t, id_col), dots):
            scores[int(i)] = int(d)

    def _top(ids: np.ndarray, n: int) -> np.ndarray:
        ids = np.unique(ids)
        ids = ids[np.isin(ids, np.array(list(scores), np.int64))] \
            if len(scores) < len(ids) else ids
        d = np.array([scores[int(i)] for i in ids], np.int64)
        order = np.lexsort((ids, -d))
        return ids[order[:n]]

    beam_ids = np.asarray(entry_ids, np.int64)
    _score(beam_ids)
    beam_ids = _top(beam_ids, beam)
    for _ in range(hops):
        nbr = _probe_parts(os.path.join(index_dir, "adj"), num_partitions,
                           beam_ids, [id_col, "nbr_id"], id_col)
        cand = np.r_[beam_ids, np_col(nbr, "nbr_id").astype(np.int64)]
        _score(cand)
        beam_ids = _top(cand, beam)
    out = _top(beam_ids, k)
    return pa.table({
        id_col: pa.array(out, pa.int64()),
        "dot_q": pa.array([scores[int(i)] for i in out], pa.int64()),
        "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int64),
                         pa.int64()),
    })


# ------------------------------------------------ product quantization


def _subspace_dataset(
    vectors: rd.Dataset, lo: int, hi: int, id_col: str, vec_col: str
) -> rd.Dataset:
    """Project the ``[lo, hi)`` dimension slice of the vector column —
    one vectorized matrix slice per batch, no shuffle."""

    def _slice(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)[:, lo:hi]
        return pa.table({
            id_col: batch.column(id_col),
            vec_col: pa.array(list(m), pa.list_(pa.float64())),
        })

    return vectors.map_batches(_slice, batch_format="pyarrow")


def pq_codebooks(
    vectors: rd.Dataset,
    m: int = 2,
    k: int = 4,
    iters: int = 2,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> list[np.ndarray]:
    """Product-quantization codebook training (Jégou et al., TPAMI
    2011 — the memory-scale path for 100-TB embedding tables: d floats
    → m small codes): split the vector into ``m`` contiguous
    subspaces and train an independent ``k``-codeword spherical Lloyd
    codebook per subspace with :func:`kmeans_centroids` (per-block
    partial (count, sum) combine — no per-vector shuffle; seeding is
    the hash-smallest row sample, block-order invariant, and because the seed
    rows are picked by vec_id the SAME rows seed every subspace).
    Returns m arrays of shape (k, d/m), unit-normalized."""
    if dim is None:
        first = vectors.take(1)[0][vec_col]
        dim = len(first)
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    books = []
    for s in range(m):
        ds_s = _subspace_dataset(vectors, s * sub, (s + 1) * sub,
                                 id_col, vec_col)
        books.append(kmeans_centroids(ds_s, k, iters=iters, seed=seed,
                                      vec_col=vec_col, id_col=id_col))
    return books


def pq_encode(
    vectors: rd.Dataset,
    codebooks: list[np.ndarray],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Assign every vector its m-tuple of codeword ids: per subspace
    the argmax dot of the NORMALIZED subvector against the codebook
    (first-max tie-break — exactly kmeans_centroids' assignment rule,
    so the codes are the subspace Lloyd partitions).  Codebooks ride
    ONE ray.put broadcast; one stateless vectorized pass, no shuffle.
    Output: (vec_id, code_0 … code_{m-1}) int64."""
    books_ref = ray.put([np.asarray(b, np.float64) for b in codebooks])
    subs = [b.shape[1] for b in codebooks]
    offs = np.r_[0, np.cumsum(subs)].astype(int)

    def _enc(batch: pa.Table) -> pa.Table:
        books = ray.get(books_ref)
        full = _batch_matrix(batch, vec_col)
        cols = {id_col: batch.column(id_col)}
        for s, b in enumerate(books):
            ms = _normalize(full[:, offs[s]:offs[s + 1]])
            code = np.argmax(ms @ b.T, axis=1).astype(np.int64)
            cols[f"code_{s}"] = pa.array(code, pa.int64())
        return pa.table(cols)

    return vectors.map_batches(_enc, batch_format="pyarrow")


def pq_adc_topk(
    codes: rd.Dataset,
    codebooks: list[np.ndarray],
    query: np.ndarray,
    k: int = 10,
    scale: float = 1e6,
    id_col: str = "vec_id",
) -> pa.Table:
    """Asymmetric-distance (ADC) search over PQ codes: the query
    builds one tiny (m × k) lookup table of integer-quantized
    codeword dots — ``lut[s][c] = floor(scale · ⟨q_s, book_s[c]⟩)`` —
    and every vector's approximate score is the SUM of its m looked-up
    entries: a per-batch fancy-index + add, never a matmul against the
    vector table (whose floats need not even be stored).  Integer
    scores make the (score desc, id asc) top-k ranking bit-exact at
    any layout; recall vs brute force is pinned by the tests."""
    from .ops import top_k

    lut_ref = ray.put(_adc_lut(codebooks, query, scale))
    m = len(codebooks)

    def _score(batch: pa.Table) -> pa.Table:
        tabs = ray.get(lut_ref)
        sc = np.zeros(batch.num_rows, np.int64)
        for s in range(m):
            sc += tabs[s][np_col(batch, f"code_{s}")]
        return pa.table({
            id_col: batch.column(id_col),
            "score_q": pa.array(sc, pa.int64()),
        })

    scored = codes.map_batches(_score, batch_format="pyarrow")
    return top_k(scored, "score_q", k, descending=True, tie_cols=[id_col])

def _adc_lut(
    codebooks: list[np.ndarray], query: np.ndarray, scale: float
) -> list[np.ndarray]:
    """The (m × k) integer ADC lookup tables for one query:
    ``lut[s][c] = floor(scale · ⟨q_s/‖q_s‖, book_s[c]⟩)``.  The full-q
    normalization cancels under per-subspace renormalization, so the
    tables depend only on the raw query — the SQL twin derives the
    same values from the subspace-normalized unnest."""
    qs = np.asarray(query, np.float64)
    qs = qs / (np.linalg.norm(qs) or 1.0)
    offs = np.r_[0, np.cumsum([b.shape[1] for b in codebooks])].astype(int)
    return [
        np.floor(scale * (qs[offs[s]:offs[s + 1]]
                          / (np.linalg.norm(qs[offs[s]:offs[s + 1]]) or 1.0)
                          ) @ b.T).astype(np.int64)
        for s, b in enumerate(codebooks)
    ]


def ivfpq_topk(
    vectors: rd.Dataset,
    query: np.ndarray,
    num_centroids: int = 8,
    nprobe: int = 3,
    m: int = 2,
    codewords: int = 4,
    iters: int = 2,
    k: int = 5,
    seed: int = 42,
    scale: float = 1e6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """IVF-PQ composed search (Jégou et al., TPAMI 2011 — the standard
    billion-scale ANN layout): a coarse IVF quantizer prunes the
    candidate set to ``nprobe`` buckets and PQ codes score the
    survivors from memory-resident small ints — at 100 TB the probe
    reads only the probed buckets' partitions (build_ivf_index's
    layout) and the float vectors never need to be resident at all.

    Every ranking here is over INTEGERS so the result is bit-exact at
    any block layout and SQL-reproducible: bucket probe by
    ``floor(scale·⟨q̂, centroid⟩)`` with (score desc, cid asc)
    tie-break, candidate ADC score by the summed :func:`_adc_lut`
    entries with (score desc, id asc).  One encode pass assigns bucket
    AND codes (no join); the bucket filter is a stateless mask — zero
    shuffles end to end.  PQ encodes the raw normalized vectors (IVF
    is pruning only, not residual coding) — the IVF-Flat-with-codes
    variant, documented so the oracle can reproduce it."""
    from .ops import top_k

    cent = kmeans_centroids(vectors, num_centroids, iters=iters, seed=seed,
                            vec_col=vec_col, id_col=id_col)
    books = pq_codebooks(vectors, m=m, k=codewords, iters=iters, seed=seed,
                         vec_col=vec_col, id_col=id_col,
                         dim=cent.shape[1])
    qs = np.asarray(query, np.float64)
    qn = qs / (np.linalg.norm(qs) or 1.0)
    pdots = np.floor(scale * (qn @ cent.T)).astype(np.int64)
    order = np.lexsort((np.arange(len(pdots)), -pdots))
    probed = np.sort(order[:nprobe])
    lut = _adc_lut(books, qs, scale)

    cent_ref = ray.put(cent)
    books_ref = ray.put([np.asarray(b, np.float64) for b in books])
    lut_ref = ray.put(lut)
    subs = [b.shape[1] for b in books]
    offs = np.r_[0, np.cumsum(subs)].astype(int)
    probed_set = probed  # sorted small array, rides the closure

    def _probe(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        bks = ray.get(books_ref)
        tabs = ray.get(lut_ref)
        full = _batch_matrix(batch, vec_col)
        bucket = np.argmax(_normalize(full) @ c.T, axis=1)
        keep = np.isin(bucket, probed_set)
        if not keep.any():
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "score_q": pa.array([], pa.int64()),
            })
        ids = np_col(batch, id_col)[keep]
        full = full[keep]
        sc = np.zeros(len(ids), np.int64)
        for s, b in enumerate(bks):
            ms = _normalize(full[:, offs[s]:offs[s + 1]])
            code = np.argmax(ms @ b.T, axis=1)
            sc += tabs[s][code]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "bucket": pa.array(bucket[keep].astype(np.int64), pa.int64()),
            "score_q": pa.array(sc, pa.int64()),
        })

    scored = vectors.map_batches(_probe, batch_format="pyarrow")
    out = top_k(scored, "score_q", k, descending=True, tie_cols=[id_col])
    out = out.sort_by([("score_q", "descending"), (id_col, "ascending")])
    return out.append_column(
        "rank", pa.array(np.arange(1, out.num_rows + 1, dtype=np.int64),
                         pa.int64()))


# --------------------------------------------------- k-center coreset


def kcenter_select(
    vectors: rd.Dataset,
    k: int = 5,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Gonzalez farthest-point k-center selection (Gonzalez, TCS 1985;
    the 2-approximation) — the diversity / coreset-selection step a
    curation pipeline runs to pick k maximally-spread exemplars from
    an embedding table.  Distances are EXACT int64 squared L2 over
    floor(x·scale) quantized components, so the selected set and every
    reported distance are bit-identical at any block layout and in the
    SQL twin (no float argmax anywhere).

    Seed = smallest ``id_col``; each of the k−1 subsequent rounds is
    ONE fully-parallel scan with the selected matrix broadcast
    (≤ k·d ints), per-block (d² DESC, id ASC) top-1 partials over
    points not yet selected, driver picking among n_blocks candidate
    rows — the greedy_cover control shape.  Returns (sel_round,
    vec_id, d2) where d2 is the winner's exact squared distance to
    the set selected BEFORE it (0 for the seed)."""

    def _qmat(t: pa.Table):
        ids = np_col(t, id_col)
        col = t.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        q = np.floor(flat * float(scale)).astype(np.int64)
        return ids, q.reshape(t.num_rows, -1)

    def _seed_partial(t: pa.Table) -> pa.Table:
        ids, m = _qmat(t)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.int64()))})
        i = int(np.argmin(ids))
        return pa.table({id_col: pa.array([ids[i]], pa.int64()),
                         "vec": pa.array([m[i]], pa.list_(pa.int64()))})

    seeds = vectors.map_batches(
        _seed_partial, batch_format="pyarrow").take_all()
    assert seeds, "k-center over an empty vector table"
    seeds.sort(key=lambda r: r[id_col])
    sel_ids = [int(seeds[0][id_col])]
    sel_vecs = [np.asarray(seeds[0]["vec"], np.int64)]
    rows = [(0, sel_ids[0], 0)]

    for r in range(1, k):
        ref = ray.put((np.asarray(sel_ids, np.int64),
                       np.stack(sel_vecs)))

        def _far_partial(t: pa.Table) -> pa.Table:
            sids, smat = ray.get(ref)
            ids, m = _qmat(t)
            keep = ~np.isin(ids, sids)
            ids, m = ids[keep], m[keep]
            if len(ids) == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "d2": pa.array([], pa.int64()),
                                 "vec": pa.array([],
                                                 pa.list_(pa.int64()))})
            d2 = np.full(len(ids), np.iinfo(np.int64).max, np.int64)
            for s in smat:
                diff = m - s[None, :]
                d2 = np.minimum(d2, np.einsum("ij,ij->i", diff, diff))
            best = int(np.lexsort((ids, -d2))[0])
            return pa.table({id_col: pa.array([ids[best]], pa.int64()),
                             "d2": pa.array([int(d2[best])], pa.int64()),
                             "vec": pa.array([m[best]],
                                             pa.list_(pa.int64()))})

        cands = vectors.map_batches(
            _far_partial, batch_format="pyarrow").take_all()
        if not cands:
            break
        cands.sort(key=lambda row: (-row["d2"], row[id_col]))
        w = cands[0]
        sel_ids.append(int(w[id_col]))
        sel_vecs.append(np.asarray(w["vec"], np.int64))
        rows.append((r, int(w[id_col]), int(w["d2"])))

    return pa.table({
        "sel_round": pa.array([x[0] for x in rows], pa.int64()),
        "vec_id": pa.array([x[1] for x in rows], pa.int64()),
        "d2": pa.array([x[2] for x in rows], pa.int64()),
    })


def mutual_nn_pairs(
    vectors: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> pa.Table:
    """Reciprocal-nearest-neighbor pairs — one round of the RNN
    agglomerative-clustering merge rule (pairs that are each other's
    1-NN merge; iterating this builds the whole dendrogram): for every
    vector its cosine 1-NN under the (−cos6dp, vec_id) order, then the
    pairs where the relation is MUTUAL, emitted once as (a < b,
    cosine).  The all-vs-all pass streams: every block multiplies
    against the broadcast normalized matrix (one ray.put) and emits
    one 1-NN row per vector — k·N rows reach the driver, never the
    similarity matrix.  At 100-TB embedding scale the same mutual
    filter runs over the IVF-bucketed exact kernel
    (`cosine_near_dup_pairs`' scale path) instead of the broadcast."""
    import ray as _ray

    mat_rows = vectors.select_columns([id_col, vec_col]).take_all()
    ids_all = np.array([r[id_col] for r in mat_rows], np.int64)
    order = np.argsort(ids_all)
    ids_all = ids_all[order]
    m_all = _normalize(np.array(
        [mat_rows[i][vec_col] for i in order], np.float64))
    ref = _ray.put((ids_all, m_all))

    from .pipelines import round_half_up

    def _nn(batch: pa.Table) -> pa.Table:
        aid, amat = _ray.get(ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = np_col(batch, id_col)
        sims = m @ amat.T
        out_i, out_j, out_c = [], [], []
        for r in range(len(ids)):
            s = round_half_up(sims[r], 6)
            s[aid == ids[r]] = -2.0  # exclude self
            best = np.lexsort((aid, -s))[0]
            out_i.append(int(ids[r]))
            out_j.append(int(aid[best]))
            out_c.append(float(s[best]))
        return pa.table({
            "i": pa.array(out_i, pa.int64()),
            "j": pa.array(out_j, pa.int64()),
            "c": pa.array(out_c, pa.float64()),
        })

    rows = vectors.map_batches(_nn, batch_format="pyarrow").take_all()
    nn = {int(r["i"]): (int(r["j"]), float(r["c"])) for r in rows}
    out = []
    for i, (j, c) in nn.items():
        if i < j and nn.get(j, (None,))[0] == i:
            out.append((i, j, c))
    out.sort()
    return pa.table({
        "a": pa.array([o[0] for o in out], pa.int64()),
        "b": pa.array([o[1] for o in out], pa.int64()),
        "cosine": pa.array([o[2] for o in out], pa.float64()),
    })
