"""Product-quantization ANN (operators/pq.py): codebook determinism,
encode shape/round-trip sanity, and ADC recall vs exact L2 top-k."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.operators.pq import (pq_encode, pq_topk,
                                             pq_topk_refined, pq_train)

pytestmark = pytest.mark.usefixtures("spark")


def _exact_l2_topk(em_rows, queries, k=10):
    ids = np.array([r["vec_id"] for r in em_rows])
    x = np.array([list(map(float, r["embedding"])) for r in em_rows])
    truth = {}
    for q in queries:
        qv = x[ids == q][0]
        d2 = ((x - qv) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        top = [int(ids[i]) for i in order if ids[i] != q][:k]
        truth[q] = set(top)
    return truth


def test_pq_train_deterministic_and_shaped(spark, sf_dir):
    em = load(spark, sf_dir, "embeddings")
    b1 = pq_train(em, "vec_id", "embedding", m=8, ksub=16)
    b2 = pq_train(em, "vec_id", "embedding", m=8, ksub=16)
    assert b1 == b2                       # sample + init + iters fixed
    assert len(b1) == 8
    assert all(len(book) <= 16 and len(book[0]) == 8 for book in b1)


def test_pq_encode_codes_in_range(spark, sf_dir):
    em = load(spark, sf_dir, "embeddings")
    books = pq_train(em, "vec_id", "embedding", m=8, ksub=16)
    codes = pq_encode(em, "embedding", books)
    rows = codes.select("pq_code").collect()
    assert len(rows) == em.count()
    for r in rows:
        c = r["pq_code"]
        assert len(c) == 8
        assert all(0 <= ci < 16 for ci in c)


def test_pq_adc_recall_floor_and_determinism(spark, sf_dir):
    """Pure ADC (no rerank): lossy 8x16 codes on near-random 64-dim
    data — the floor is modest by construction; the numpy replication
    of the exact same train/encode/score pipeline produces identical
    recalls, so this asserts the floor plus determinism."""
    em = load(spark, sf_dir, "embeddings")
    books = pq_train(em, "vec_id", "embedding", m=8, ksub=16)
    codes = pq_encode(em.select("vec_id", "embedding"),
                      "embedding", books).select("vec_id", "pq_code")
    queries = em.filter(F.col("vec_id") < 5)

    def run():
        return pq_topk(queries, "vec_id", "embedding", codes,
                       "vec_id", k=10, codebooks=books) \
            .toDF("qid", "cid", "adc_dist", "rank")

    a = sorted(tuple(r) for r in run().collect())
    b = sorted(tuple(r) for r in run().collect())
    assert a == b and len(a) == 50        # deterministic, 5 x top-10

    truth = _exact_l2_topk(em.select("vec_id", "embedding").collect(),
                           [0, 1, 2, 3, 4], k=10)
    got = {}
    for qid, cid, _, _ in a:
        got.setdefault(qid, set()).add(cid)
    recalls = [len(truth[q] & got[q]) / 10 for q in truth]
    assert sum(recalls) / len(recalls) >= 0.15


def test_pq_refined_recall_high(spark, sf_dir):
    """ADC shortlist-100 + exact rerank (the registered ann_pq_knn
    path): recall@10 must be near-exact."""
    em = load(spark, sf_dir, "embeddings")
    books = pq_train(em, "vec_id", "embedding", m=16, ksub=16)
    codes = pq_encode(em.select("vec_id", "embedding"),
                      "embedding", books).select("vec_id", "pq_code")
    out = pq_topk_refined(
        em.filter(F.col("vec_id") < 5), "vec_id", "embedding",
        codes, em, "vec_id", "embedding",
        k=10, shortlist=100, codebooks=books) \
        .toDF("qid", "cid", "l2_dist", "rank")
    rows = out.collect()
    assert len(rows) == 50
    truth = _exact_l2_topk(em.select("vec_id", "embedding").collect(),
                           [0, 1, 2, 3, 4], k=10)
    got = {}
    for r in rows:
        got.setdefault(r["qid"], set()).add(r["cid"])
    recalls = [len(truth[q] & got[q]) / 10 for q in truth]
    assert sum(recalls) / len(recalls) >= 0.8


def test_pq_train_rejects_bad_shapes(spark, sf_dir):
    em = load(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(em, "vec_id", "embedding", m=7)
    with pytest.raises(ValueError, match="no vectors"):
        pq_train(em.filter(F.col("vec_id") < 0), "vec_id", "embedding")
