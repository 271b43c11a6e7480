"""mmr_diverse_top5 (__ray_entry__) on a synthetic corpus: the
diversity property (a near-duplicate of the top pick is demoted in
favor of a diverse lower-relevance doc), marginal arithmetic audit,
first pick equals pure relevance argmax."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp, texts, embs):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(list(texts), pa.string()),
    }), f"{tmp}/documents.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(embs)), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in embs],
                              pa.list_(pa.float32())),
    }), f"{tmp}/embeddings.parquet")
    return str(tmp)


def test_diversity_demotes_near_duplicates(tmp_path):
    from __ray_entry__ import QUERY_TEXT, _q_mmr_diverse

    q = QUERY_TEXT.split(" ")
    texts, embs = [], []
    rng = np.random.default_rng(5)
    # docs 0,1: near-identical high-relevance twins; doc 2: slightly
    # less relevant but orthogonal embedding; rest: filler
    for i in range(10):
        if i in (0, 1):
            texts.append(" ".join(q * 8 + ["filler"] * 5))
            embs.append([1.0, 0.001 * i, 0.0])
        elif i == 2:
            texts.append(" ".join(q * 6 + ["filler"] * 10))
            embs.append([0.0, 0.0, 1.0])
        else:
            texts.append(" ".join(["filler"] * 20 + q))
            embs.append(list(rng.normal(0, 1, 3)))
    t = _q_mmr_diverse(_write(tmp_path, texts, embs))
    rows = t.to_pylist()
    picks = [r["doc_id"] for r in rows]
    # first pick is the pure-relevance argmax (doc 0 or 1)
    assert picks[0] in (0, 1)
    # the twin of the first pick must NOT be second: diversity demotes
    # it below the orthogonal doc 2
    assert picks[1] == 2
    # arithmetic: marginal = rel - penalty; first penalty is 0
    assert rows[0]["penalty"] == 0
    for r in rows:
        assert r["marginal"] == r["rel"] - r["penalty"]
    # ranks 1..5 in order
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
