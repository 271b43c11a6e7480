"""Training-data pipeline operators: dedup family, similarity search,
text analysis — with NumPy/planted oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from essentials_rd.ann import assign_ivf_buckets, brute_force_topk, ivf_topk
from essentials_rd.textops import (
    build_lang_profiles,
    dedup_exact,
    exact_dup_groups,
    fingerprints,
    lang_id,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    text_stats,
    verify_jaccard,
)
from essentials_rd.util import np_col

_WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _docs(n=60, seed=5, dup_pairs=5, near_pairs=5):
    """Synthetic docs with planted exact dups (i, i+1000) and near dups
    (j, j+2000: one token changed)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        toks = rng.choice(_WORDS, size=30).tolist()
        rows.append({"doc_id": i, "text": " ".join(toks), "lang": "xx"})
    for i in range(dup_pairs):
        rows.append({"doc_id": 1000 + i, "text": rows[i]["text"], "lang": "xx"})
    for j in range(near_pairs):
        toks = rows[10 + j]["text"].split(" ")
        toks[3] = "CHANGED"
        rows.append({"doc_id": 2000 + j, "text": " ".join(toks), "lang": "xx"})
    return rd.from_items(rows), rows


def test_text_stats():
    ds, rows = _docs(n=10, dup_pairs=0, near_pairs=0)
    out = {r["doc_id"]: r for r in text_stats(ds).take_all()}
    for r in rows:
        toks = r["text"].split(" ")
        assert out[r["doc_id"]]["n_tokens"] == len(toks)
        assert out[r["doc_id"]]["n_uniq_tokens"] == len(set(toks))
        assert out[r["doc_id"]]["n_chars"] == len(r["text"])


def test_exact_dedup():
    ds, rows = _docs(n=40, dup_pairs=4, near_pairs=0)
    groups = exact_dup_groups(ds).take_all()
    assert len(groups) == 4
    for g in groups:
        assert g["n_docs"] == 2 and g["keep_id"] < 1000
    kept = dedup_exact(ds).take_all()
    texts = [r["text"] for r in kept]
    assert len(texts) == len(set(texts)) == 40
    # representative is the MIN doc_id of each group
    ids = {r["doc_id"] for r in kept}
    assert all(i < 1000 for i in ids)


def test_minhash_lsh_finds_planted_near_dups():
    ds, rows = _docs(n=50, dup_pairs=0, near_pairs=5)
    sigs = minhash_signatures(ds, num_hashes=64, shingle_k=3)
    pairs = lsh_candidate_pairs(sigs, num_bands=16)
    verified = verify_jaccard(ds, pairs, threshold=0.5)
    got = set(zip(np_col(verified, "a").tolist(), np_col(verified, "b").tolist()))
    # exactly the planted near-dups, nothing else (random 10-word-vocab
    # docs have expected shingle-jaccard ≈ 0.01, far below threshold)
    assert got == {(10 + j, 2000 + j) for j in range(5)}


def test_minhash_deterministic():
    ds, _ = _docs(n=10, dup_pairs=0, near_pairs=0)
    s1 = sorted(minhash_signatures(ds).take_all(), key=lambda r: r["doc_id"])
    s2 = sorted(minhash_signatures(ds).take_all(), key=lambda r: r["doc_id"])
    assert all(a["sig"] == b["sig"] for a, b in zip(s1, s2))


def test_simhash_close_for_near_dups():
    ds, rows = _docs(n=20, dup_pairs=2, near_pairs=2)
    out = {r["doc_id"]: r["simhash"] for r in simhash(ds).take_all()}
    # exact dups → identical simhash
    for i in range(2):
        assert out[i] == out[1000 + i]
    # near dups → small hamming distance
    for j in range(2):
        x = np.uint64(out[10 + j]) ^ np.uint64(out[2000 + j])
        assert bin(int(x)).count("1") <= 16


def test_fingerprints_overlap_for_copies():
    ds, rows = _docs(n=20, dup_pairs=2, near_pairs=0)
    fp = fingerprints(ds).take_all()
    by_id = {}
    for r in fp:
        by_id.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_id[0] == by_id[1000]
    assert by_id[0] != by_id[1]


def test_lang_id_recovers_labels():
    # two artificial languages with disjoint vocabularies
    rng = np.random.default_rng(7)
    rows = []
    vocab = {"aa": ["foo", "bar", "baz", "qux"], "bb": ["uno", "dos", "tres", "cuatro"]}
    for i in range(80):
        lang = "aa" if i % 2 == 0 else "bb"
        rows.append({
            "doc_id": i, "lang": lang,
            "text": " ".join(rng.choice(vocab[lang], size=20).tolist()),
        })
    ds = rd.from_items(rows)
    prof = build_lang_profiles(ds)
    ref = ray.put(prof)
    preds = lang_id(ds, ref).take_all()
    acc = np.mean([r["pred_lang"] == r["lang"] for r in preds])
    assert acc == 1.0


def _embeddings(n=200, d=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([row.tolist() for row in m.astype(np.float32)],
                              pa.list_(pa.float32())),
    })), m


def test_brute_force_topk_matches_numpy():
    ds, m = _embeddings()
    md = m.astype(np.float64)
    md = md / np.linalg.norm(md, axis=1, keepdims=True)
    queries = md[:3]
    t = brute_force_topk(ds.repartition(4), m[:3].astype(np.float32), np.arange(3), k=5)
    sims = md @ md[:3].T
    for q in range(3):
        s = sims[:, q].copy()
        s[q] = -np.inf  # exclude self
        expect = np.argsort(-np.round(s * 1e6 + 0.5 * 0) , kind="stable")[:5]
        got = [r["vec_id"] for r in t.to_pylist() if r["query_id"] == q]
        # compare as sets of (almost) top-5 — exact order asserted via cosine values
        got_cos = [r["cosine"] for r in t.to_pylist() if r["query_id"] == q]
        ref_top = sorted(s, reverse=True)[:5]
        assert np.allclose(sorted(got_cos, reverse=True), np.round(np.array(ref_top) * 1e6) / 1e6, atol=2e-6)
        assert len(got) == 5 and q not in got


def test_ivf_recall_vs_brute_force():
    ds, m = _embeddings(n=300, d=16)
    qf = m[:5].astype(np.float32)
    exact = brute_force_topk(ds.repartition(4), qf, np.arange(5), k=5)
    bucketed, centroids = assign_ivf_buckets(ds, num_centroids=8)
    approx = ivf_topk(bucketed.materialize(), centroids, qf, np.arange(5), k=5, nprobe=4)
    def tops(t):
        d = {}
        for r in t.to_pylist():
            d.setdefault(r["query_id"], set()).add(r["vec_id"])
        return d
    te, ta = tops(exact), tops(approx)
    recalls = [len(te[q] & ta.get(q, set())) / 5 for q in te]
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 buckets


def test_cosine_near_dup_bucketed_matches_broadcast():
    """The IVF-bucketed exact-within-bucket plan (forced via a tiny
    broadcast_limit) finds the same pair set as the broadcast plan on
    planted near-identical vectors, with bounded per-bucket memory."""
    from essentials_rd.ann import cosine_near_dup_pairs

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, 12)) * 4.0
    base = np.concatenate(
        [c + rng.normal(scale=0.5, size=(40, 12)) for c in centers]
    )
    dups = base[:20] + rng.normal(scale=1e-3, size=(20, 12))
    vecs = np.concatenate([base, dups])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })).repartition(5)
    t = 0.999
    bc = cosine_near_dup_pairs(ds, t).take_all()
    bucketed = cosine_near_dup_pairs(
        ds, t, broadcast_limit=10, num_centroids=6, assign_probes=2
    ).take_all()

    def keyed(rows):
        return {(r["a"], r["b"], r["cosine"]) for r in rows}

    assert keyed(bucketed) == keyed(bc)
    planted = {(i, len(base) + i) for i in range(20)}
    assert {(r["a"], r["b"]) for r in bc} >= planted


def test_centroid_seeding_block_order_invariant():
    """kmeans seeding is a pure function of row identity (smallest
    hashed ids), so centroids do not depend on the block layout."""
    from essentials_rd.ann import kmeans_centroids

    ds, _ = _embeddings(n=120)
    c1 = kmeans_centroids(ds, num_centroids=8, iters=1)
    c2 = kmeans_centroids(ds.repartition(7), num_centroids=8, iters=1)
    assert np.allclose(c1, c2)


def test_build_lang_profiles_matches_local_reference():
    """The distributed per-lang partial top-k collects the same model
    as a local pandas computation over the whole corpus."""
    import pandas as pd

    rng = np.random.default_rng(13)
    vocab = {"aa": ["foo", "bar", "baz", "qux", "quux"],
             "bb": ["uno", "dos", "tres", "cuatro", "cinco"]}
    rows = []
    for i in range(90):
        lang = "aa" if i % 2 == 0 else "bb"
        rows.append({
            "doc_id": i, "lang": lang,
            "text": " ".join(rng.choice(vocab[lang], size=25).tolist()),
        })
    ds = rd.from_items(rows).repartition(6)
    k = 3
    prof = build_lang_profiles(ds, top_k=k)

    df = pd.DataFrame(rows)
    df["tok"] = df["text"].str.split(" ")
    df = df.explode("tok")
    counts = df.groupby(["lang", "tok"]).size().reset_index(name="n")
    expect = {}
    for lang, g in counts.groupby("lang"):
        g = g.sort_values(["n", "tok"], ascending=[False, True]).head(k)
        expect[lang] = dict(zip(g["tok"], g["n"].astype(int)))
    assert prof == expect


def test_ivf_index_build_and_search(tmp_path):
    import numpy as np
    from essentials_rd.ann import build_ivf_index, ivf_search

    rng = np.random.default_rng(9)
    # 4 well-separated clusters in 8-d
    centers = rng.normal(size=(4, 8)) * 5
    vecs = np.concatenate([c + rng.normal(scale=0.2, size=(50, 8)) for c in centers])
    ids = np.arange(len(vecs))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    }))
    idx = str(tmp_path / "ivf")
    cents = build_ivf_index(ds, idx, num_centroids=4, iters=3)
    assert cents.shape == (4, 8)
    qids = np.array([0, 50, 100], dtype=np.int64)
    q = vecs[qids]
    got = ivf_search(idx, q, qids, k=5, nprobe=1)
    ref = brute_force_topk(ds, q, qids, k=5)
    # well-separated clusters + converged kmeans: nprobe=1 recall is 100%
    got_ids = {(r["query_id"], r["vec_id"]) for r in got.to_pylist()}
    ref_ids = {(r["query_id"], r["vec_id"]) for r in ref.to_pylist()}
    assert len(got_ids & ref_ids) / len(ref_ids) >= 0.9


def test_heavy_hitters_exact_and_fallback():
    from essentials_rd.textops import heavy_hitters_tokens

    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(400)], dtype=object)
    # Zipf-ish: token i appears with prob ~ 1/(i+1)
    probs = 1.0 / np.arange(1, 401)
    probs /= probs.sum()
    docs = [
        " ".join(rng.choice(vocab, size=40, p=probs)) for _ in range(300)
    ]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())})).repartition(7)
    flat = pd.Series(" ".join(docs).split(" "))
    vc = flat.value_counts()
    toks = vc.index.to_numpy(object)
    order = np.lexsort((toks, -vc.to_numpy()))[:10]
    want_tokens = toks[order].tolist()
    want_counts = vc.to_numpy()[order].tolist()

    got = heavy_hitters_tokens(ds, k=10, m=512).to_pandas()
    assert got["token"].tolist() == want_tokens
    assert got["n"].tolist() == want_counts

    # m=2 breaks the certificate -> exact fallback must still be right,
    # and must go through the distributed top_k (driver sees at most
    # k·num_blocks partial rows), never a full-vocabulary to_pandas()
    orig_to_pandas = rd.Dataset.to_pandas

    def _no_collect(self, *a, **kw):
        raise AssertionError(
            "heavy-hitter fallback must not collect the vocabulary")

    try:
        rd.Dataset.to_pandas = _no_collect
        got_fb = heavy_hitters_tokens(ds, k=10, m=2)
    finally:
        rd.Dataset.to_pandas = orig_to_pandas
    got_fb = got_fb.to_pandas()
    assert got_fb["token"].tolist() == want_tokens
    assert got_fb["n"].tolist() == want_counts


def test_contamination_planted_grams():
    from essentials_rd.textops import contamination

    bench_docs = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
    ]
    corpus = [
        "xx alpha beta gamma delta yy",          # shares 1 distinct 4-gram
        "one two three four five something",      # shares 2 (overlapping)
        "totally different words here now",       # clean
        "alpha beta gamma delta epsilon qq four five six",  # shares 2
        "a b c",                                  # shorter than k -> clean
    ]
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(bench_docs, pa.string()),
    }))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(corpus, pa.string()),
    })).repartition(3)
    out = (
        contamination(docs, bench, gram_k=4)
        .to_pandas().set_index("doc_id")["n_shared"].to_dict()
    )
    assert out == {0: 1, 1: 2, 3: 2}


def test_simhash_near_pairs_banding_is_lossless():
    from essentials_rd.textops import simhash_near_pairs
    from essentials_rd.util import popcount64

    ds, _ = _docs(n=40, dup_pairs=3, near_pairs=3)
    sh = {r["doc_id"]: r["simhash"] for r in simhash(ds).take_all()}
    ids = sorted(sh)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = int(popcount64(np.array([sh[a] ^ sh[b]], np.int64))[0])
            if h <= 3:
                want.add((a, b, h))
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_near_pairs(ds, max_hamming=3).take_all()
    }
    # pigeonhole banding must find EVERY pair brute force finds
    assert got == want
    assert len(want) >= 3  # the exact dups at least


def test_simhash_token_key_matches_scalar_recompute():
    """The vectorized U8-view code-point key equals a per-token scalar
    recompute (the SQL oracle's formula)."""
    import pandas as pd

    from essentials_rd.textops import _flat_token_keys_oracle
    from essentials_rd.util import hash64

    texts = pd.Series(["hello world", "héllo wörld✓", "", "a  b",
                       "x" * 100 + " yz"])
    rep, h = _flat_token_keys_oracle(texts)
    flat = [t for s in texts for t in s.split(" ")]
    keys = []
    for t in flat:
        k = sum(ord(c) * 31 ** i for i, c in enumerate(t[:8]))
        k += min(len(t), 64) * 31 ** 8
        keys.append(k)
    want = hash64(np.array(keys, np.int64))
    assert np.array_equal(h, want)
    assert len(rep) == len(flat)


def test_chunk_documents_partition_and_reconstruction():
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.textops import chunk_documents

    texts = ["a bb ccc " * 50, "x", "", "one two three four five"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array([s.strip() if s else s for s in texts],
                         pa.string()),
    })
    got = chunk_documents(rd.from_arrow(t), 4).to_pandas()
    for i, s in enumerate(t["text"].to_pylist()):
        toks = s.split(" ")
        mine = got[got["doc_id"] == i].sort_values("chunk_id")
        # chunk token counts re-assemble the doc exactly
        assert mine["n_tokens"].sum() == len(toks)
        assert (mine["n_tokens"].iloc[:-1] == 4).all()  # full chunks
        assert mine["chunk_id"].tolist() == list(range(len(mine)))
        # chars = rejoined chunk lengths
        off = 0
        for _, row in mine.iterrows():
            chunk = toks[off: off + row["n_tokens"]]
            assert row["n_chars"] == len(" ".join(chunk))
            off += row["n_tokens"]


def test_redact_pattern_planted_counts():
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.textops import redact_pattern

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["call 555 or 1234", "no digits here", "007"],
                         pa.string()),
    })
    got = {r["doc_id"]: (r["n_hits"], r["redacted_len"])
           for r in redact_pattern(rd.from_arrow(t), "[0-9]+").take_all()}
    assert got == {0: (2, len("call # or #")),
                   1: (0, len("no digits here")),
                   2: (1, 1)}


def test_bigram_fluency_matches_duckdb_and_block_invariant():
    """bigram_fluency vs an exact DuckDB twin on edge cases (empty doc,
    1-token doc, repeated bigrams), at two block layouts."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.textops import bigram_fluency

    texts = ["the cat sat", "the cat ran", "one", "",
             "the cat sat the cat sat", "a b a b a", "zz yy", "the the the"]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    exp = duckdb.sql("""
WITH tok AS (SELECT doc_id, string_split(text,' ') AS t FROM t),
big AS (SELECT doc_id, t[i.i] || ' ' || t[i.i+1] AS bg
        FROM tok, LATERAL (SELECT unnest(range(1, len(t))) AS i) i),
cnt AS (SELECT bg, CAST(count(*) AS BIGINT) n FROM big GROUP BY bg),
per AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) n_bigrams,
               CAST(sum(c.n) AS BIGINT) freq_sum
        FROM big b JOIN cnt c USING (bg) GROUP BY b.doc_id)
SELECT d.doc_id, CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(p.freq_sum, 0) AS BIGINT) AS freq_sum
FROM t d LEFT JOIN per p USING (doc_id) ORDER BY doc_id
""").df().astype({"n_bigrams": "int64", "freq_sum": "int64"})
    for parts in (1, 3):
        got = (bigram_fluency(rd.from_arrow(t).repartition(parts))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got[["doc_id", "n_bigrams", "freq_sum"]].equals(exp), parts


def test_lsh_near_dup_precision_recall_and_invariance():
    """Random-hyperplane LSH: every returned pair is exact-verified
    (subset of the broadcast plan), exact duplicates always collide
    (recall 1.0 by construction), planted noisy near-dups recovered,
    result invariant to block layout."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ann import cosine_near_dup_pairs, lsh_near_dup_pairs

    rng = np.random.default_rng(9)
    n, d = 400, 32
    base = rng.normal(size=(n, d))
    vecs = base.copy()
    for i in range(30):
        vecs[n - 60 + i] = base[i]                        # exact dups
    for i in range(30):
        vecs[n - 30 + i] = base[30 + i] + 0.05 * rng.normal(size=d)
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    })
    TH = 0.95
    exact = cosine_near_dup_pairs(rd.from_arrow(t).repartition(5), TH).to_pandas()
    lsh = lsh_near_dup_pairs(rd.from_arrow(t).repartition(5), TH).to_pandas()
    ek = set(zip(exact["a"], exact["b"]))
    lk = set(zip(lsh["a"], lsh["b"]))
    assert lk <= ek                                   # precision 1.0
    assert {(i, n - 60 + i) for i in range(30)} <= lk  # exact dups found
    assert len(lk & ek) / max(len(ek), 1) >= 0.9       # planted recall
    lsh2 = lsh_near_dup_pairs(rd.from_arrow(t).repartition(2), TH).to_pandas()
    assert set(zip(lsh2["a"], lsh2["b"])) == lk        # layout-invariant


def test_cosine_dup_clusters_planted(tmp_path):
    """Two planted groups of near-identical vectors must come out as
    two clusters labeled by their min vec_id; background noise vectors
    join no cluster."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ann import cosine_dup_clusters

    rng = np.random.default_rng(4)
    d = 16
    g1 = rng.normal(size=d)
    g2 = rng.normal(size=d)
    vecs = [g1 + 0.01 * rng.normal(size=d) for _ in range(4)]
    vecs += [g2 + 0.01 * rng.normal(size=d) for _ in range(3)]
    vecs += [rng.normal(size=d) for _ in range(20)]
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    })
    tbl, steps = cosine_dup_clusters(
        rd.from_arrow(t).repartition(3), str(tmp_path / "cc"), 0.98)
    got = dict(zip(np.asarray(tbl["vec_id"]).tolist(),
                   np.asarray(tbl["cluster"]).tolist()))
    assert {k: v for k, v in got.items() if k < 7} == \
        {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4}
    assert all(k < 7 for k in got), "noise vectors must not cluster"


def test_inverted_index_roundtrip_and_partition_pruning(tmp_path):
    """Inverted index: probe returns exactly the per-doc tf postings,
    and reads only the probed tokens' partitions (pruning)."""
    import collections
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.derive import _str_hash
    from essentials_rd.sinks import _part_dir
    from essentials_rd.textops import build_inverted_index, probe_inverted_index
    from essentials_rd.util import hash64

    texts = ["a b a c", "b b d", "a", "", "c c c c", "e f g"]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = str(tmp_path / "idx")
    P = 8
    rec = build_inverted_index(rd.from_arrow(t).repartition(3), out, P)
    assert all(not s for s in rec.column("skipped").to_pylist())

    probe = ["a", "c", "zzz-absent"]  # absent token: empty, no crash
    got = probe_inverted_index(out, P, probe).to_pandas()
    want = collections.defaultdict(dict)
    for i, s in enumerate(texts):
        for tok, n in collections.Counter(s.split(" ")).items():
            want[tok][i] = n
    expect = sorted(
        (tok, d, want[tok][d]) for tok in probe for d in want.get(tok, {})
    )
    assert list(map(tuple, got[["token", "doc_id", "tf"]].to_records(index=False))) == expect

    # pruning: the probe must touch no partition outside the tokens' own
    h = hash64(np.asarray(_str_hash(pa.chunked_array([pa.array(probe)])))) \
        % np.uint64(P)
    allowed = {int(x) for x in h}
    # every returned row's token must hash into an allowed partition
    got_h = hash64(np.asarray(_str_hash(pa.chunked_array(
        [pa.array(got["token"].tolist())])))) % np.uint64(P)
    assert {int(x) for x in got_h} <= allowed


def test_gram_matrix_exact_and_block_invariant():
    """Integer Gram: equals the single-machine quantized reference and
    is bit-identical across block layouts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.ann import gram_matrix

    rng = np.random.default_rng(2)
    n, d = 300, 16
    m = rng.normal(0, 0.2, (n, d)).astype(np.float32)
    t = pa.table({"embedding": pa.array(list(m), pa.list_(pa.float32()))})
    q = np.floor(m.astype(np.float64) * 1e6).astype(np.int64)
    want = q.T @ q
    for parts in (1, 7):
        got = gram_matrix(rd.from_arrow(t).repartition(parts), scale=1e6)
        assert got.dtype == np.int64 and (got == want).all(), f"parts={parts}"


def test_extract_int_field_typed_and_null_on_no_match():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from essentials_rd.textops import extract_int_field

    t = pa.table({
        "id": pa.array(np.arange(5), pa.int64()),
        "props": pa.array(['{"k": 87}', '{"k": -3}', 'garbage',
                           '{"k": 0}', '{"j": 9}']),
    })
    got = extract_int_field(rd.from_arrow(t).repartition(2), "props",
                            r'"k": (?P<v>-?\d+)', out_col="v",
                            keep_cols=["id"]).to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    assert got["v"].tolist()[:2] == [87, -3]
    assert got["v"].iloc[3] == 0
    assert got["v"].isna().iloc[2] and got["v"].isna().iloc[4]


def test_dim_stats_matches_numpy_and_block_invariant():
    from essentials_rd.ann import dim_stats

    rng = np.random.default_rng(31)
    n, d = 400, 16
    m = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table({
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
    })
    m64 = m.astype(np.float64)
    want_q = np.floor(m64 * 1e6).astype(np.int64).sum(axis=0)
    for parts in (1, 7):
        got = dim_stats(rd.from_arrow(t).repartition(parts))
        assert np.asarray(got["dim"]).tolist() == list(range(d))
        assert (np.asarray(got["n"]) == n).all()
        assert np.array_equal(np.asarray(got["min_v"]), m64.min(axis=0))
        assert np.array_equal(np.asarray(got["max_v"]), m64.max(axis=0))
        assert np.array_equal(np.asarray(got["sum_q"]), want_q), f"p={parts}"


def test_knn_graph_matches_bruteforce_in_bucket():
    from essentials_rd.ann import _batch_matrix, _normalize, knn_graph

    rng = np.random.default_rng(37)
    n, d, C, k = 300, 8, 3, 4
    m = rng.normal(size=(n, d)).astype(np.float32)
    cent = _normalize(rng.normal(size=(C, d)))
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
    })

    # brute-force reference with the same quantized-dot semantics
    m64 = m.astype(np.float64)
    buckets = np.argmax(_normalize(m64) @ cent.T, axis=1)
    q = np.floor(m64 * 1e3).astype(np.int64)
    want = {}
    for i in range(n):
        same = np.flatnonzero(buckets == buckets[i])
        same = same[same != i]
        dots = q[same] @ q[i]
        order = same[np.lexsort((same, -dots))][:k]
        want[i] = [(int(v), int(q[v] @ q[i])) for v in order]

    for parts in (1, 6):
        got = (knn_graph(rd.from_arrow(t).repartition(parts), cent, k,
                         scale=1e3)
               .to_pandas().sort_values(["vec_id", "rank"]))
        by_id = {
            i: list(zip(g.nbr_id.astype(int), g.dot_q.astype(int)))
            for i, g in got.groupby("vec_id")
        }
        assert by_id == want, f"parts={parts}"

    # query_mod restricts query rows only
    got = knn_graph(rd.from_arrow(t), cent, k, scale=1e3,
                    query_mod=7).to_pandas()
    assert set(got.vec_id) == {i for i in range(n) if i % 7 == 0}


def test_edit1_pairs_matches_bruteforce_levenshtein():
    import duckdb

    from essentials_rd.textops import edit1_pairs

    rng = np.random.default_rng(43)
    # planted neighborhood: numeric-suffix names (substitutions), a few
    # insert/delete variants, exact dups, and random noise
    base = [f"Widget#{i:04d}" for i in range(60)]
    extra = ["Widget#001", "Widget#00011", "Widget#0001x",
             "Widget#0001", "completely-different", "Wodget#0001",
             "xWidget#0001", "Widget0001", ""]
    strs = base + extra + ["".join(rng.choice(list("abcd"), 8))
                           for _ in range(40)]
    ids = np.arange(len(strs), dtype=np.int64)
    t = pa.table({"sid": pa.array(ids), "name": pa.array(strs, pa.string())})

    con = duckdb.connect()
    con.register("s", t)
    want = con.execute(
        "SELECT a.sid AS a_id, b.sid AS b_id, "
        "CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist "
        "FROM s a JOIN s b ON a.sid < b.sid "
        "WHERE levenshtein(a.name, b.name) <= 1 ORDER BY 1, 2"
    ).df()
    assert len(want) > 50  # the fixture really stresses it

    for parts in (1, 5):
        got = (edit1_pairs(rd.from_arrow(t).repartition(parts), "sid",
                           "name", num_buckets=8)
               .to_pandas().sort_values(["a_id", "b_id"])
               .reset_index(drop=True))
        assert got.equals(want), f"parts={parts}"


def test_edit1_pairs_guards():
    import pytest as _pytest

    from essentials_rd.textops import edit1_pairs

    t = pa.table({"sid": pa.array([1, 2], pa.int64()),
                  "name": pa.array(["x" * 80, "y"], pa.string())})
    with _pytest.raises(Exception):
        edit1_pairs(rd.from_arrow(t), "sid", "name",
                    max_len=64).take_all()


def test_substring_search_matches_bruteforce(tmp_path):
    from essentials_rd.textops import build_trigram_index, substring_search

    rng = np.random.default_rng(59)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, rng.integers(3, 30)))
             for _ in range(300)]
    texts += ["xx alpha beta yy", "", "ab"]  # edge cases incl. short doc
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "text": pa.array(texts, pa.string())})
    idx = str(tmp_path / "tri")
    build_trigram_index(rd.from_arrow(t).repartition(4), idx,
                        num_partitions=8)
    for needle in ["alpha beta", "gamma delta eps", "zeta zeta",
                   "nothere"]:
        got = substring_search(idx, 8, rd.from_arrow(t), needle)
        want = [(int(i), s.count(needle)) for i, s in zip(ids, texts)
                if needle in s]
        assert [(r["doc_id"], r["n_matches"])
                for r in got.to_pylist()] == want, needle


def test_repetition_stats_matches_bruteforce():
    from essentials_rd.textops import repetition_stats

    rng = np.random.default_rng(79)
    words = list("abcdef")
    texts = [" ".join(rng.choice(words, rng.integers(1, 40)))
             for _ in range(200)]
    texts += ["a b a b a b a b a b", "x", "q w e r t"]
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "text": pa.array(texts, pa.string())})
    k = 3
    got = (repetition_stats(rd.from_arrow(t).repartition(4), k=k)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, s in enumerate(texts):
        toks = s.split(" ")
        if len(toks) < k:
            grams = [s]
        else:
            grams = [" ".join(toks[j:j + k])
                     for j in range(len(toks) - k + 1)]
        assert got.n_grams[i] == len(grams), (i, s)
        assert got.n_distinct[i] == len(set(grams)), (i, s)


def test_bm25_matches_local_reference_and_invariance():
    from essentials_rd.textops import bm25_topk

    docs = [
        (0, "data engine fast data data"),
        (1, "engine room"),
        (2, "data processing pipeline processing"),
        (3, "totally unrelated words here"),
        (4, "data data data data data data"),
        (5, "processing engine data"),
    ]
    query = "data processing"
    # local float-free reference: same integer formula
    N = len(docs)
    T = sum(len(t.split(" ")) for _, t in docs)
    qt = set(query.split(" "))
    df = {t: sum(1 for _, x in docs if t in x.split(" ")) for t in qt}
    ref = {}
    for i, t in docs:
        toks = t.split(" ")
        s = 0
        for w in qt:
            tf = toks.count(w)
            if tf:
                s += (1_000_000 * 22 * N * tf * T) // (
                    df[w] * (10 * tf * T + 3 * T + 9 * len(toks) * N))
        if s:
            ref[i] = s
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })
    for parts in (1, 3):
        got = bm25_topk(rd.from_arrow(t).repartition(parts), query, k=4)
        pairs = list(zip(np_col(got, "doc_id").tolist(),
                         np_col(got, "score").tolist()))
        assert pairs == want
    # doc 3 (no query token) is not a candidate
    assert 3 not in {d for d, _ in want}


def test_bm25_no_candidates_returns_empty():
    from essentials_rd.textops import bm25_topk

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["aaa bbb", "ccc ddd"], pa.string()),
    })
    got = bm25_topk(rd.from_arrow(t), "zzz qqq", k=5)
    assert got.num_rows == 0


def test_leakage_safe_split_keeps_near_dups_together(tmp_path):
    """Split keyed on the dup cluster: planted near-dup pairs must
    never straddle a split boundary (the failure mode of per-doc
    splitting)."""
    from essentials_rd.ops import join, split_assign
    from essentials_rd.textops import near_dup_clusters

    ds, rows = _docs(n=80, dup_pairs=8, near_pairs=8)
    ds = ds.materialize()
    t = near_dup_clusters(ds, str(tmp_path / "cc"), threshold=0.7)
    labels = rd.from_arrow(t.select(["doc_id", "cluster"]))
    joined = join(
        ds.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"),
        labels, on="doc_id", how="left", broadcast=False, num_buckets=8)

    def _coalesce(b):
        ids = np_col(b, "doc_id")
        c = np.asarray(b.column("cluster").to_numpy(zero_copy_only=False),
                       np.float64)
        cl = np.where(np.isnan(c), ids, c).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "cluster": pa.array(cl, pa.int64())})

    out = split_assign(
        joined.map_batches(_coalesce, batch_format="pyarrow"),
        [0.6, 0.2, 0.2], ["train", "val", "test"],
        key_fn=lambda b: np_col(b, "cluster"), seed=11,
    ).to_pandas()
    split_of = dict(zip(out.doc_id, out.split))
    cluster_of = dict(zip(out.doc_id, out.cluster))
    # exact dups (i, 1000+i) and near dups (10+j, 2000+j) share clusters
    # hence splits
    for i in range(8):
        assert cluster_of[i] == cluster_of[1000 + i]
        assert split_of[i] == split_of[1000 + i]
        assert cluster_of[10 + i] == cluster_of[2000 + i]
        assert split_of[10 + i] == split_of[2000 + i]
    # all three splits populated and every doc assigned exactly once
    assert set(out.split) == {"train", "val", "test"}
    assert len(out) == len(rows) and out.doc_id.is_unique


def test_dup_span_coverage_planted_spans():
    from essentials_rd.textops import dup_span_coverage

    shared = "x1 x2 x3 x4 x5 x6 x7 x8"  # 8 tokens → 3 shared 6-grams
    rows = [
        {"doc_id": 0, "text": "a b c " + shared + " d e f"},
        {"doc_id": 1, "text": "p q " + shared + " r"},
        {"doc_id": 2, "text": "entirely unique words nothing shared "
                              "in this one at all"},
        {"doc_id": 3, "text": "too short"},
    ]
    # local brute force
    def grams(t, w=6):
        tk = t.split(" ")
        return [" ".join(tk[i:i + w]) for i in range(len(tk) - w + 1)]
    allg = {}
    for r in rows:
        for g in set(grams(r["text"])):
            allg[g] = allg.get(g, 0) + 1
    want = {}
    for r in rows:
        gs = grams(r["text"])
        want[r["doc_id"]] = (len(gs),
                             sum(1 for g in gs if allg[g] >= 2))
    outs = []
    for parts in (1, 3):
        got = dup_span_coverage(
            rd.from_items(rows).repartition(parts), width=6, num_buckets=8
        ).to_pandas()
        outs.append({int(r.doc_id): (int(r.n_pos), int(r.n_dup_pos))
                     for r in got.itertuples()})
    assert outs[0] == want
    assert outs[0] == outs[1]
    # the planted span really is detected and the unique doc is clean
    assert outs[0][0][1] == 3 and outs[0][1][1] == 3
    assert outs[0][2][1] == 0
    assert outs[0][3] == (0, 0)  # shorter than the gram width


def test_verify_jaccard_broadcast_and_partitioned_paths_agree():
    """The size-checked broadcast fast path and the partitioned
    two-join path must produce bit-identical (a, b, jaccard) rows
    (same inter/union divide on both); broadcast_bytes=0 forces the
    100-TB join shape."""
    from essentials_rd.textops import jaccard_similarity_pairs

    ds, rows = _docs(n=60, dup_pairs=4, near_pairs=6)
    bc = jaccard_similarity_pairs(ds, threshold=0.5, shingle_k=3)
    pt = jaccard_similarity_pairs(ds, threshold=0.5, shingle_k=3,
                                  broadcast_bytes=0)
    assert bc.num_rows == pt.num_rows > 0
    assert np_col(bc, "a").tolist() == np_col(pt, "a").tolist()
    assert np_col(bc, "b").tolist() == np_col(pt, "b").tolist()
    assert np_col(bc, "jaccard").tolist() == np_col(pt, "jaccard").tolist()


def test_flat_token_hashes_matches_naive_split_hash():
    """The Arrow split+dictionary-encode hot path must produce the
    exact hash VALUES of the naive pandas split + elementwise siphash
    (minhash signatures, shingles and df bucketing all key on them)."""
    import pandas as pd

    from essentials_rd.textops import _flat_token_hashes

    texts = ["alpha beta gamma", "", "x", "a  b", "alpha alpha beta",
             "trailing space ", " leading"]
    s = pd.Series(texts)
    naive_toks = s.str.split(" ")
    counts = naive_toks.str.len().to_numpy(np.int64)
    naive_rep = np.repeat(np.arange(len(s), dtype=np.int64), counts)
    flat = np.asarray([t for lst in naive_toks for t in lst], object)
    naive_h = pd.util.hash_array(flat, categorize=False).astype(np.uint64)

    for inp in (s, pa.array(texts, pa.string()),
                pa.chunked_array([texts[:3], texts[3:]], pa.string())):
        rep, h = _flat_token_hashes(inp)
        assert rep.tolist() == naive_rep.tolist()
        assert h.tolist() == naive_h.tolist()


def test_verify_jaccard_foreign_candidate_ids():
    """A candidate pair whose id is absent from docs (pairs fed from an
    external candidate source) must behave as an empty shingle set on
    the broadcast fast path — not IndexError (id > max id) and not a
    silent Jaccard against a neighboring doc's shingles — matching the
    partitioned join path, which drops the unmatched side."""
    import ray.data as rd

    from essentials_rd.textops import verify_jaccard

    docs = rd.from_items([
        {"doc_id": 10, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 20, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 30, "text": "one two three four five six seven"},
    ])
    pairs = rd.from_items([
        {"a": 10, "b": 20},    # real near-dup
        {"a": 10, "b": 999},   # b > max id: off_w[ib+1] would be OOB
        {"a": 5, "b": 20},     # a absent, between/below existing ids
        {"a": 777, "b": 888},  # both absent
    ])
    for kw in ({}, {"broadcast_bytes": 0}):
        got = verify_jaccard(docs, pairs, threshold=0.5, shingle_k=3, **kw)
        keys = list(zip(np_col(got, "a").tolist(), np_col(got, "b").tolist()))
        assert keys == [(10, 20)], kw
        assert np_col(got, "jaccard")[0] == 1.0
