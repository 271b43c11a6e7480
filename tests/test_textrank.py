"""textrank_tokens vs a numpy weighted-PageRank brute force on the
same bigram graph, plus the keyword property: a token co-occurring
with MANY distinct tokens outranks one repeated inside a single
frequent pair."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.textops import textrank_tokens


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


def _brute_pr(texts, min_count=5, alpha=0.85, iters=8):
    from collections import Counter

    bg = Counter()
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks[:-1], toks[1:]):
            bg[(a, b)] += 1
    ce = Counter()
    for (a, b), c in bg.items():
        if c >= min_count and a != b:
            ce[(min(a, b), max(a, b))] += c
    verts = sorted({t for e in ce for t in e})
    idx = {t: i for i, t in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for (u, v), w in ce.items():
        W[idx[u], idx[v]] += w
        W[idx[v], idx[u]] += w
    wsum = W.sum(axis=1)
    p = np.full(n, 1.0 / n)
    for _ in range(iters):
        out = np.zeros(n)
        for i in range(n):
            if wsum[i] > 0:
                out += p[i] * W[i] / wsum[i]
        dang = p[wsum == 0].sum()
        p = (1 - alpha) / n + alpha * (out + dang / n)
    return verts, p


def test_textrank_matches_numpy_reference():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(5, 25)))
             for _ in range(120)]
    out = textrank_tokens(_docs(texts), k=10, min_count=5).to_pydict()
    verts, p = _brute_pr(texts)
    want = sorted(range(len(verts)),
                  key=lambda i: (-round(p[i], 6), verts[i]))[:10]
    assert out["token"] == [verts[i] for i in want]
    for tok, score in zip(out["token"], out["pagerank"]):
        assert abs(score - p[verts.index(tok)]) < 2e-6


def test_hub_token_beats_frequent_pair():
    # 'hub' adjacent to 12 distinct partners (6 occurrences each);
    # 'loner' only inside one massively repeated pair
    texts = []
    for i in range(12):
        texts += [f"hub p{i}"] * 6
    texts += ["loner mate"] * 72  # same total occurrences as hub
    out = textrank_tokens(_docs(texts), k=30, min_count=5).to_pydict()
    r = {t: i for i, t in enumerate(out["token"])}
    assert r["hub"] < r["loner"]


def test_support_filter_drops_rare_edges():
    texts = ["a b"] * 10 + ["rare pair"] * 2  # 'rare pair' below support
    out = textrank_tokens(_docs(texts), k=10, min_count=5).to_pydict()
    assert set(out["token"]) == {"a", "b"}


def test_pca_power_converges_to_top_eigvec(tmp_path):
    """On a synthetic table with a planted dominant direction the
    quantized release must align with numpy's top eigenvector."""
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    rng = np.random.default_rng(2)
    d, n = 16, 300
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    # strong rank-1 signal + small noise
    V = np.outer(rng.normal(size=n) * 5.0, u) + rng.normal(size=(n, d)) * 0.05
    V = np.clip(V, -1, 1).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in V],
                              pa.list_(pa.float32())),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "embeddings.parquet")
    out = e._q_pca_power(str(sf)).to_pydict()
    q = np.array(out["q"], dtype=np.float64)
    q /= np.linalg.norm(q)
    # numpy eigendecomposition of the float covariance
    w, vecs = np.linalg.eigh(V.astype(np.float64).T @ V)
    top = vecs[:, -1]
    assert abs(abs(q @ top)) > 0.99
    # layout invariance: different row groups, identical release
    pq.write_table(t, sf / "embeddings.parquet", row_group_size=17)
    assert e._q_pca_power(str(sf)).to_pydict() == out


def test_edmonds_karp_duality_on_random_graphs():
    """The engine's Edmonds-Karp (as used by region_min_cut) must equal
    the enumerated min cut on random 5-vertex capacitated graphs."""
    from itertools import product

    import __ray_entry__ as e

    rng = np.random.default_rng(4)
    for trial in range(30):
        R = 5
        w = np.zeros((R, R), np.int64)
        for i in range(R):
            for j in range(i + 1, R):
                if rng.random() < 0.7:
                    w[i, j] = w[j, i] = rng.integers(0, 50)
        # monkeypatch the weight-matrix fold with the random graph
        orig = e._region_weight_matrix
        e._region_weight_matrix = lambda _sf: w.tolist()
        try:
            out = e._q_region_min_cut("unused").to_pydict()
        finally:
            e._region_weight_matrix = orig
        # brute force: all 8 s-t cuts
        best = min(
            sum(int(w[i][j]) for i in range(R) for j in range(i + 1, R)
                if ([True, *bits, False][i]) != ([True, *bits, False][j]))
            for bits in product([False, True], repeat=3))
        assert out["max_flow"][0] == best
        assert min(out["cut_weight"]) == best


def test_chi2_tokens_finds_planted_discriminator(tmp_path):
    """A token exclusive to the target language must outrank a token
    spread evenly across classes; scores match a scipy-free brute
    force on the 2x2 tables."""
    from essentials_rd.textops import chi2_tokens

    rng = np.random.default_rng(3)
    texts, langs = [], []
    common = ["the", "and", "of"]
    for i in range(60):
        lang = "en" if i % 2 == 0 else "de"
        toks = list(rng.choice(common, 4))
        if lang == "en":
            toks.append("onlyen")  # perfect discriminator
        if rng.random() < 0.5:
            toks.append("noise")  # appears in both classes
        texts.append(" ".join(toks))
        langs.append(lang)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }))
    out = chi2_tokens(docs, "en", k=5).to_pydict()
    assert out["tok"][0] == "onlyen"
    # brute-force score check for every returned token
    N, Nt = 60, 30
    for tok, a, ab, q in zip(out["tok"], out["a"], out["ab"], out["q"]):
        present = [tok in t.split(" ") for t in texts]
        aa = sum(1 for p, l in zip(present, langs) if p and l == "en")
        abab = sum(present)
        assert (aa, abab) == (a, ab)
        b = abab - aa
        c = Nt - aa
        d = (N - Nt) - b
        num = N * (aa * d - b * c) ** 2 * 1_000_000
        den = abab * (N - abab) * Nt * (N - Nt)
        assert q == num // den
    # 'the' (present in every doc) must be excluded as zero-variance
    assert all(t != "the" for t in out["tok"]) or \
        any(tok == "the" and ab < 60 for tok, ab in
            zip(out["tok"], out["ab"]))


def test_fiedler_separates_planted_communities():
    """On a two-block planted partition the Fiedler signs recover the
    communities, and the engine run equals a numpy replay of the same
    recurrence."""
    from essentials_rd.algorithms.fiedler import fiedler
    from essentials_rd.graph import build_graph
    from essentials_rd.util import hash64

    rng = np.random.default_rng(7)
    nA, nB = 20, 20
    n = nA + nB
    edges = set()
    for i in range(n):
        for j in range(i + 1, n):
            same = (i < nA) == (j < nA)
            p = 0.5 if same else 0.03
            if rng.random() < p:
                edges.add((i, j))
    src = np.array([e[0] for e in sorted(edges)], np.int64)
    dst = np.array([e[1] for e in sorted(edges)], np.int64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src),
                                 "dst": pa.array(dst)}))
    import tempfile
    g = build_graph(ds, tempfile.mkdtemp(), 4, symmetrize=True,
                    persist=False,
                    vertex_ids=np.arange(n, dtype=np.int64))
    iters = 40
    res = fiedler(g, max_iters=iters, checkpoint_every=0)
    t = res.state_table(["value"])
    vids = np.asarray(t["vid"], np.int64)
    vals = np.asarray(t["value"], np.float64)[np.argsort(vids)]

    # numpy replay of the exact recurrence
    A = np.zeros((n, n))
    for i, j in edges:
        A[i, j] = A[j, i] = 1.0
    deg = A.sum(axis=1)
    c = 2.0 * max(deg.max(), 1)
    x = (hash64(np.arange(n, dtype=np.uint64)) % np.uint64(1001)
         ).astype(np.float64) - 500.0
    for _ in range(iters):
        y = A @ x + (c - deg) * x
        x = (y - c * x.sum() / n) / c
    assert np.allclose(vals, x, atol=1e-9)

    # spectral property: signs split the planted blocks
    sA = np.sign(vals[:nA])
    sB = np.sign(vals[nA:])
    assert abs(sA.sum()) == nA  # all one sign
    assert abs(sB.sum()) == nB
    assert sA[0] != sB[0]


def test_soundex_classic_vectors_and_blocking():
    from essentials_rd.textops import soundex, soundex_blocks

    classic = {
        "robert": "R163", "rupert": "R163", "ashcraft": "A261",
        "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
        "honeyman": "H555", "jackson": "J250", "wheeler": "W460",
        "hwang": "H520", "gutierrez": "G362",
    }
    for w, want in classic.items():
        assert soundex(w) == want, (w, soundex(w), want)
    assert soundex("Robert") == soundex("ROBERT") == "R163"
    assert soundex("") == ""
    assert soundex("a-b_c") == soundex("abc")

    # blocking groups homophones; distinct words tracked per block
    names = (["robert smith"] * 5 + ["rupert jones"] * 3
             + ["ashcraft x"] * 2 + ["ashcroft y"] * 2)
    t = pa.table({"p_name": pa.array(names, pa.string())})
    out = soundex_blocks(rd.from_arrow(t).repartition(3),
                         "p_name", k=5).to_pydict()
    got = dict(zip(out["code"],
                   zip(out["n_rows"], out["n_words"])))
    assert got["R163"] == (8, 2)   # robert + rupert collapse
    assert got["A261"] == (4, 2)   # ashcraft + ashcroft collapse


def test_bwt_invertible_and_clusters(tmp_path):
    """BWT inverts exactly (the LF-mapping reconstruction) and a
    repetitive input clusters equal characters better than raw."""
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    texts = ["banana " * 8, "the quick brown fox jumps over it all",
             "aaaabbbbccccdddd" * 3] + [f"filler doc {i}" for i in range(7)]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), d / "documents.parquet")
    out = e._q_doc_bwt(str(d)).to_pydict()
    assert out["doc_id"] == list(range(10))

    def invert(bwt):
        # standard BWT inversion: sort pairs (char, idx), follow LF
        n = len(bwt)
        order = sorted(range(n), key=lambda i: (bwt[i], i))
        res = []
        i = order[bwt.index("\x01")] if False else None
        # simpler: repeated stable-sort reconstruction
        table = [""] * n
        for _ in range(n):
            table = sorted(bwt[i] + table[i] for i in range(n))
        row = next(r for r in table if r.endswith("\x01"))
        return row[:-1]

    for i, txt in enumerate(texts):
        want = txt[:e.BWT_LEN]
        got = invert(out["bwt"][i])
        assert got == want, (i, got, want)
    # clustering property: runs in BWT of 'banana'*k >> runs in raw
    raw = texts[0][:e.BWT_LEN] + "\x01"
    bwt = out["bwt"][0]
    runs = lambda s: sum(1 for a, b in zip(s, s[1:]) if a != b) + 1
    assert runs(bwt) < runs(raw)


def test_rice_parameter_brute_force(tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    rng = np.random.default_rng(51)
    # 'dense' in nearly every doc (tiny gaps → small k);
    # 'sparse' in every ~40th doc (large gaps → larger k)
    n_docs = 400
    texts = []
    for i in range(n_docs):
        toks = ["filler"]
        if rng.random() < 0.95:
            toks.append("dense")
        if i % 40 == 3:
            toks.append("sparse")
        toks.append(f"unique{i}")
        texts.append(" ".join(toks))
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), d / "documents.parquet", row_group_size=37)
    out = e._q_rice_postings(str(d)).to_pydict()
    got = {t: (k, b) for t, k, b in
           zip(out["tok"], out["best_k"], out["total_bits"])}
    # brute force per token
    for tok in got:
        ids = sorted(i for i in range(n_docs)
                     if tok in texts[i].split(" "))
        gaps = np.diff(np.r_[np.int64(-1),
                             np.array(ids, np.int64)])
        costs = [(int(((gaps - 1) >> k).sum()) + len(gaps) * (k + 1), k)
                 for k in range(e.RICE_KMAX)]
        bb, bk = min(costs)
        assert got[tok] == (bk, bb), tok
    assert got["dense"][0] < got["sparse"][0]  # sparser → bigger k


def test_kmp_period_vs_naive(tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    texts = ["abcabcabcabcabcabcabcabcabcabcab",   # period 3
             "aaaaaaaa",                            # period 1
             "abcdefgh",                            # aperiodic: p = n
             "abab" * 8,                            # period 2
             "xyxyxyxz" + "q" * 24] + [f"doc {i}" for i in range(5)]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), d / "documents.parquet")
    out = e._q_doc_periods(str(d)).to_pydict()
    for i, txt in enumerate(texts):
        s = txt[:e.PERIOD_LEN]
        n = len(s)
        naive = min(p for p in range(1, n + 1)
                    if s[:n - p] == s[p:])
        j = out["doc_id"].index(i)
        assert out["period"][j] == naive, (i, out["period"][j], naive)
    assert out["period"][out["doc_id"].index(0)] == 3
    assert out["period"][out["doc_id"].index(1)] == 1
    assert out["period"][out["doc_id"].index(2)] == 8  # n = 8, aperiodic
