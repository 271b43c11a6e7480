"""rrf_hybrid_top10 (__ray_entry__) on a synthetic corpus: fusion
arithmetic vs brute force, a doc ranked mid-list in BOTH stacks beats
docs top-ranked in only one (the RRF property), absent-list zero
ranks."""

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


def test_rrf_prefers_consensus(tmp_path):
    from __ray_entry__ import QUERY_TEXT, _q_rrf_fusion

    # doc 1: strong lexical match only; doc 2: strong dense match
    # only; doc 3: decent in BOTH -> RRF should put 3 first among them
    qtoks = QUERY_TEXT.split(" ")
    n = 12
    rng = np.random.default_rng(4)
    texts = []
    for i in range(n):
        base = ["filler"] * 30
        if i == 1:
            base = (qtoks * 10) + base          # lexical champion
        elif i == 3:
            base = (qtoks * 3) + base           # lexical decent
        elif i == 5:
            base = qtoks + base                 # weak lexical
        texts.append(" ".join(base))
    q = np.array([1.0, 0.0, 0.0])
    embs = []
    for i in range(n):
        if i == 2:
            embs.append([0.99, 0.1, 0.0])       # dense champion
        elif i == 3:
            embs.append([0.8, 0.5, 0.0])        # dense decent
        else:
            v = rng.normal(0, 1, 3)
            v[0] = -abs(v[0])                   # away from the query
            embs.append(v / np.linalg.norm(v))
    embs[0] = list(q)  # vec 0 IS the query anchor
    t = _q_rrf_fusion(_write(tmp_path, texts, embs))
    rows = t.to_pylist()
    by_doc = {r["doc_id"]: r for r in rows}
    assert 3 in by_doc
    # consensus doc 3 outranks the single-stack champions
    r3 = by_doc[3]["rrf"]
    assert all(by_doc[d]["rrf"] < r3 for d in (1, 2) if d in by_doc)
    assert by_doc[3]["bm_rank"] > 0 and by_doc[3]["cos_rank"] > 0
    # single-stack docs carry a 0 for the missing list
    if 1 in by_doc:
        assert by_doc[1]["cos_rank"] >= 0
    # fusion arithmetic: rrf == sum of floor terms
    from __ray_entry__ import RRF_C, RRF_SCALE
    for r in rows:
        want = 0
        if r["bm_rank"]:
            want += RRF_SCALE // (RRF_C + r["bm_rank"])
        if r["cos_rank"]:
            want += RRF_SCALE // (RRF_C + r["cos_rank"])
        assert r["rrf"] == want
