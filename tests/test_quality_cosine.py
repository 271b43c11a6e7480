"""quality_score + cosine_near_dup_pairs unit checks."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ann import cosine_near_dup_pairs
from essentials_rd.textops import quality_score


def test_quality_score_hand_values():
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": ["the cat. sat!", "word"]})
    )
    df = quality_score(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 0: 13 chars, 3 tokens ("the","cat.","sat!"), 2 punct, 1 stopword,
    # token lens 3+4+4=11
    assert df.loc[0, "n_chars"] == 13
    assert df.loc[0, "n_tokens"] == 3
    assert abs(df.loc[0, "punct_ratio"] - round(2 / 13, 6)) < 1e-9
    assert abs(df.loc[0, "stopword_ratio"] - round(1 / 3, 6)) < 1e-9
    assert abs(df.loc[0, "mean_token_len"] - round(11 / 3, 6)) < 1e-9
    # doc 1: no punct, no stopwords, mean len 4
    assert df.loc[1, "punct_ratio"] == 0.0
    assert df.loc[1, "stopword_ratio"] == 0.0
    assert df.loc[1, "mean_token_len"] == 4.0


def test_cosine_near_dup_matches_numpy():
    rng = np.random.default_rng(3)
    n, d = 80, 16
    m = rng.normal(size=(n, d))
    # plant two near-dup pairs
    m[10] = m[3] + 0.01 * rng.normal(size=d)
    m[50] = m[20] + 0.01 * rng.normal(size=d)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(m), pa.list_(pa.float64()))})
    ).repartition(4)
    got = cosine_near_dup_pairs(ds, 0.95).to_pandas()
    nm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.floor(nm @ nm.T * 1e6 + 0.5) / 1e6
    iu, ju = np.triu_indices(n, k=1)
    keep = sims[iu, ju] >= 0.95
    want = set(zip(iu[keep].tolist(), ju[keep].tolist()))
    assert {(3, 10), (20, 50)} <= want
    assert set(zip(got["a"], got["b"])) == want
