"""Similarity search: exact cosine baseline vs LSH and IVF scale paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jaccard_ml_spark.operators.similarity import (
    ann_topk,
    cosine_dup_pairs,
    cosine_topk,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def exact(emb):
    return cosine_topk(emb, emb, k=5).persist()


def test_exact_topk_shape(exact, emb):
    n = emb.count()
    rows = exact.collect()
    assert len(rows) == n * 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)


def _recall_at_1(approx_rows, exact_rows):
    ex1 = {r.query_id: r.neighbor_id for r in exact_rows if r.rank == 1}
    ap = {}
    for r in approx_rows:
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for q, n1 in ex1.items() if n1 in ap.get(q, set()))
    return hits / len(ex1)


def test_ann_topk_recall(emb, exact):
    approx = ann_topk(emb, dim=64, k=5).collect()
    rec = _recall_at_1(approx, exact.collect())
    # sign-LSH with 4 tables x 12 planes on near-random 64-d vectors
    assert rec >= 0.5, rec


def test_ivf_topk_recall_and_determinism(emb, exact):
    a = ivf_topk(emb, dim=64, k=5)
    rows1 = a.collect()
    rec = _recall_at_1(rows1, exact.collect())
    assert rec >= 0.5, rec
    rows2 = ivf_topk(emb.repartition(7), dim=64, k=5).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))


def test_cosine_dup_pairs_exactness(emb, spark):
    got = {(r.id_a, r.id_b): r.cosine
           for r in cosine_dup_pairs(emb, threshold=0.4).collect()}
    # brute-force in numpy
    import numpy as np
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    m = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    expected = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            c = float(np.floor(sims[i, j] * 1e6 + 0.5) / 1e6)
            if c >= 0.4:
                a, b = sorted([ids[i], ids[j]])
                expected[(a, b)] = c
    assert set(got) == set(expected)
    for k_, v in expected.items():
        assert got[k_] == pytest.approx(v, abs=2e-6)
