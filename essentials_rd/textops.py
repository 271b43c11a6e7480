"""Text-analysis + deduplication operators for large-scale training-data
pipelines — beyond the reference's graph surface but first-class here:
exact dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard, token
stats, language-ID, document fingerprints.

All stages are vectorized ``map_batches`` over Arrow/pandas; dedup
candidate generation is groupby shuffles keyed on int64 hashes; the
near-dup candidate graph feeds the SAME hash-min CC engine used for the
link graph (connected near-dup clusters).  Everything is seeded and
deterministic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .util import hash64, np_col

_MERSENNE = np.uint64((1 << 61) - 1)


# ----------------------------------------------------------- token stats


def text_stats(docs: rd.Dataset, text_col: str = "text",
               id_col: str = "doc_id") -> rd.Dataset:
    """Per-document token statistics (split on single spaces so the
    DuckDB oracle ``string_split(text, ' ')`` matches exactly)."""

    def _stats(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        toks = s.str.split(" ")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_chars": pa.array(s.str.len().to_numpy(np.int64), pa.int64()),
                "n_tokens": pa.array(toks.str.len().to_numpy(np.int64), pa.int64()),
                "n_uniq_tokens": pa.array(
                    toks.map(lambda t: len(set(t))).to_numpy(np.int64), pa.int64()
                ),
            }
        )

    return docs.map_batches(_stats, batch_format="pyarrow")


# ----------------------------------------------------------- exact dedup


def exact_dup_groups(docs: rd.Dataset, text_col: str = "text",
                     id_col: str = "doc_id") -> rd.Dataset:
    """Exact duplicate groups by sha256(text): (sha256, n_docs,
    keep_id=min id).  Hash computed per batch; the shuffle keys on an
    int64 prefix of the digest (the full digest disambiguates inside the
    bucket — same collision-safe bucketing as the edge derivation)."""
    from .ops import grouped_pandas_agg

    def _hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        digests = [hashlib.sha256(v.as_py().encode()).hexdigest() for v in texts]
        pref = np.array(
            [int(d[:15], 16) for d in digests], dtype=np.int64
        )
        return pa.table(
            {
                "sha256": pa.array(digests, pa.string()),
                "hkey": pa.array(pref, pa.int64()),
                id_col: batch.column(id_col),
            }
        )

    hashed = docs.map_batches(_hash, batch_format="pyarrow")
    grouped = grouped_pandas_agg(
        hashed,
        ["sha256"],
        {"n_docs": (id_col, "count"), "keep_id": (id_col, "min")},
        key_fn=lambda b: np_col(b, "hkey"),
    )
    return grouped.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_docs"), 1)),
        batch_format="pyarrow",
    )


def dedup_exact(docs: rd.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> rd.Dataset:
    """Keep one representative (min id) per distinct text."""
    from .ops import grouped_pandas_agg

    def _hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        pref = np.array(
            [int(hashlib.sha256(v.as_py().encode()).hexdigest()[:15], 16)
             for v in texts],
            dtype=np.int64,
        )
        return batch.append_column("hkey", pa.array(pref, pa.int64()))

    hashed = docs.map_batches(_hash, batch_format="pyarrow")

    def _first(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        keep = df.sort_values(id_col).drop_duplicates(subset=[text_col])
        return pa.Table.from_pandas(
            keep.drop(columns=["hkey"]), preserve_index=False
        ).replace_schema_metadata()

    from .ops import hash_bucket_agg

    return hash_bucket_agg(hashed, lambda b: np_col(b, "hkey"), _first)


# ------------------------------------------------------- minhash + LSH


def _token_shingles(s: pd.Series, k: int) -> pd.Series:
    toks = s.str.split(" ")
    return toks.map(
        lambda t: {" ".join(t[i : i + k]) for i in range(max(1, len(t) - k + 1))}
    )


def _minhash_sig(shingles: set, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_hashes minima over universal-hashed shingle values."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.int64).max, dtype=np.uint64)
    h = np.array(
        [int(hashlib.blake2b(x.encode(), digest_size=8).hexdigest(), 16)
         for x in sorted(shingles)],
        dtype=np.uint64,
    )
    with np.errstate(over="ignore"):
        m = (h[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return m.min(axis=1)


def minhash_signatures(
    docs: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> rd.Dataset:
    """(id, sig: list<uint64 as int64>) MinHash signatures — stateless
    map_batches; the hash coefficients are derived from the seed in
    every task (cheap, no broadcast needed)."""

    def _sig(batch: pa.Table) -> pa.Table:
        rng = np.random.default_rng(seed)
        a = rng.integers(1, int(_MERSENNE), num_hashes, dtype=np.uint64)
        b = rng.integers(0, int(_MERSENNE), num_hashes, dtype=np.uint64)
        s = batch.column(text_col).to_pandas()
        sigs = [
            _minhash_sig(sh, a, b).astype(np.int64)
            for sh in _token_shingles(s, shingle_k)
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "sig": pa.array([x.tolist() for x in sigs],
                                pa.list_(pa.int64())),
            }
        )

    return docs.map_batches(_sig, batch_format="pyarrow")


def lsh_candidate_pairs(
    sigs: rd.Dataset,
    id_col: str = "doc_id",
    num_bands: int = 16,
) -> rd.Dataset:
    """Band the signatures, bucket by (band, band-hash), emit candidate
    pairs per bucket (groupby on int64 bucket hash — the same shared-key
    pair expansion shape as the edge derivation)."""

    def _bands(batch: pa.Table) -> pa.Table:
        ids = np_col(batch, id_col)
        sigs_np = [np.asarray(x, dtype=np.uint64) for x in
                   batch.column("sig").to_pylist()]
        rows_id, rows_bh = [], []
        for i, sig in enumerate(sigs_np):
            r = len(sig) // num_bands
            bands = sig[: r * num_bands].reshape(num_bands, r)
            with np.errstate(over="ignore"):
                bh = np.array(
                    [int(hash64(band.view(np.int64)).sum() % np.uint64(2**57))
                     * num_bands + bi
                     for bi, band in enumerate(bands)],
                    dtype=np.int64,
                )
            rows_id.append(np.full(num_bands, ids[i]))
            rows_bh.append(bh)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(rows_id), pa.int64()),
                "bucket": pa.array(np.concatenate(rows_bh), pa.int64()),
            }
        )

    banded = sigs.map_batches(_bands, batch_format="pyarrow")

    def _pairs(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        out_a, out_b = [], []
        for _, sub in df.groupby("bucket", sort=True):
            ids = np.unique(sub[id_col].to_numpy())
            if len(ids) < 2 or len(ids) > 1000:  # bucket blow-up guard
                continue
            iu, iv = np.triu_indices(len(ids), 1)
            out_a.append(ids[iu])
            out_b.append(ids[iv])
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    from .ops import hash_bucket_agg

    pairs = hash_bucket_agg(banded, lambda b: np_col(b, "bucket"), _pairs)
    # distinct pairs (a pair can collide in several bands)
    from .ops import grouped_pandas_agg

    return grouped_pandas_agg(
        pairs, ["a", "b"], {"n_bands": ("b", "count")},
        key_fn=lambda t: np_col(t, "a") * np.int64(0x9E3779B1) + np_col(t, "b"),
    )


def verify_jaccard(
    docs: rd.Dataset,
    pairs: rd.Dataset,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> pa.Table:
    """Exact shingle-Jaccard on the candidate pairs.  The candidate set
    is assumed driver-small relative to the corpus (that is LSH's job);
    texts for the touched ids are fetched via a broadcast id-filter scan.
    Returns (a, b, jaccard) for pairs ≥ threshold, sorted."""
    import ray

    cand = pairs.select_columns(["a", "b"]).take_all()
    if not cand:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    ids_needed = sorted({r["a"] for r in cand} | {r["b"] for r in cand})
    ids_ref = ray.put(np.array(ids_needed, dtype=np.int64))

    def _pick(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        ids = np_col(batch, id_col)
        idx = np.searchsorted(want, ids)
        ok = (idx < len(want)) & (want[np.minimum(idx, len(want) - 1)] == ids)
        return batch.take(pa.array(np.flatnonzero(ok)))

    texts = docs.map_batches(_pick, batch_format="pyarrow").select_columns(
        [id_col, text_col]
    ).take_all()
    sh = {
        r[id_col]: set(
            " ".join(r[text_col].split(" ")[i : i + shingle_k])
            for i in range(max(1, len(r[text_col].split(" ")) - shingle_k + 1))
        )
        for r in texts
    }
    out_a, out_b, out_j = [], [], []
    for r in sorted(cand, key=lambda r: (r["a"], r["b"])):
        sa, sb = sh.get(r["a"], set()), sh.get(r["b"], set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(r["a"])
            out_b.append(r["b"])
            out_j.append(j)
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


# ------------------------------------------------------------- simhash


def simhash(docs: rd.Dataset, text_col: str = "text",
            id_col: str = "doc_id") -> rd.Dataset:
    """64-bit SimHash over tokens (stateless map_batches)."""

    def _sim(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        out = np.zeros(len(s), dtype=np.int64)
        for i, toks in enumerate(s.str.split(" ")):
            if not toks:
                continue
            hs = np.array(
                [int(hashlib.blake2b(t.encode(), digest_size=8).hexdigest(), 16)
                 for t in toks],
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            out[i] = np.int64(
                np.uint64(((vote > 0).astype(np.uint64)
                           << np.arange(64, dtype=np.uint64)).sum())
            )
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(out, pa.int64())})

    return docs.map_batches(_sim, batch_format="pyarrow")


# ------------------------------------------------------- language id


def build_lang_profiles(docs: rd.Dataset, text_col: str = "text",
                        lang_col: str = "lang", top_k: int = 40) -> dict:
    """Top-k tokens per language from labeled docs (driver-small model,
    broadcast to the scoring stage)."""
    from .ops import grouped_pandas_agg

    def _explode(batch: pa.Table) -> pa.Table:
        df = batch.select([lang_col, text_col]).to_pandas()
        df["tok"] = df[text_col].str.split(" ")
        df = df.drop(columns=[text_col]).explode("tok")
        g = df.groupby([lang_col, "tok"], sort=True).size().reset_index(name="n")
        return pa.table(
            {
                "lang": pa.array(g[lang_col].tolist(), pa.string()),
                "tok": pa.array(g["tok"].tolist(), pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    counts = docs.map_batches(_explode, batch_format="pyarrow")
    from .derive import _str_hash

    agg = grouped_pandas_agg(
        counts, ["lang", "tok"], {"n": ("n", "sum")},
        key_fn=lambda b: _str_hash(b.column("tok")),
    ).take_all()
    prof: dict[str, dict] = {}
    by_lang: dict[str, list] = {}
    for r in agg:
        by_lang.setdefault(r["lang"], []).append((r["n"], r["tok"]))
    for lang, items in by_lang.items():
        items.sort(key=lambda x: (-x[0], x[1]))
        total = sum(n for n, _ in items)
        prof[lang] = {t: n / total for n, t in items[:top_k]}
    return prof


class LangIdStage:
    """Actor-pool language classifier: profiles loaded once per actor
    from a broadcast ref (``__init__``), scoring per batch (``__call__``)
    — the actor-pool pattern for stateful stages (SURVEY.md §2.5)."""

    def __init__(self, profiles_ref):
        import ray

        self.profiles = ray.get(profiles_ref)
        self.langs = sorted(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas()
        preds = []
        for toks in s.str.split(" "):
            scores = {
                l: sum(self.profiles[l].get(t, 0.0) for t in toks)
                for l in self.langs
            }
            # deterministic: max score, tie → lexicographically first lang
            preds.append(max(self.langs, key=lambda l: (scores[l], ), default=""))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "pred_lang": pa.array(preds, pa.string()),
            }
        )


def lang_id(docs: rd.Dataset, profiles_ref, concurrency: int = 4) -> rd.Dataset:
    return docs.map_batches(
        LangIdStage,
        fn_constructor_args=(profiles_ref,),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        num_cpus=1,
    )


# --------------------------------------------------- doc fingerprints


def fingerprints(docs: rd.Dataset, text_col: str = "text",
                 id_col: str = "doc_id", window: int = 8) -> rd.Dataset:
    """Winnowing-style fingerprint: min rolling token-hash per window →
    set of (id, fingerprint) rows (for copy-detection joins)."""

    def _fp(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        ids = np_col(batch, id_col)
        out_id, out_fp = [], []
        for i, toks in enumerate(s.str.split(" ")):
            hs = np.array(
                [int(hashlib.blake2b(t.encode(), digest_size=8).hexdigest(), 16)
                 for t in toks],
                dtype=np.uint64,
            )
            if len(hs) == 0:
                continue
            n_w = max(1, len(hs) - window + 1)
            mins = np.unique(
                np.array([hs[j : j + window].min() for j in range(n_w)])
            ).astype(np.int64)
            out_id.append(np.full(len(mins), ids[i]))
            out_fp.append(mins)
        if not out_id:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "fp": pa.array([], pa.int64())})
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "fp": pa.array(np.concatenate(out_fp), pa.int64()),
            }
        )

    return docs.map_batches(_fp, batch_format="pyarrow")
