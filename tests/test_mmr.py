"""MMR re-rank: greedy correctness vs a pure-Python replay, plus
diversity/determinism properties."""

import math

from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.operators import knn as K


def _python_mmr(rows, lam=0.7, k=10):
    """Reference replay: rows = [(cid, relevance, vec)], pre-sorted
    by (relevance desc, cid asc)."""
    def cos(a, b):
        da = math.sqrt(sum(x * x for x in a)) or 1.0
        db = math.sqrt(sum(x * x for x in b)) or 1.0
        return sum(x * y for x, y in zip(a, b)) / (da * db)

    rows = sorted(rows, key=lambda r: (-r[1], r[0]))
    chosen, avail = [], list(range(len(rows)))
    while avail and len(chosen) < k:
        if not chosen:
            best = avail[0]
        else:
            scores = [lam * rows[i][1] - (1 - lam) * max(
                cos(rows[i][2], rows[j][2]) for j in chosen)
                for i in avail]
            best = avail[scores.index(max(scores))]
        chosen.append(best)
        avail.remove(best)
    return [rows[i][0] for i in chosen]


def _shortlist(spark, sf_dir, k=30):
    em = load(spark, sf_dir, "embeddings")
    top = K.brute_force_topk(
        queries=em.filter(F.col("vec_id") < 3), candidates=em,
        query_id="vec_id", cand_id="vec_id",
        query_vec="embedding", cand_vec="embedding", k=k) \
        .toDF("_qid", "_cid", "relevance", "_rank")
    vecs = em.select(F.col("vec_id").alias("_cid"),
                     F.col("embedding").alias("_cv"))
    return top.join(vecs, "_cid").select(
        "_qid", "_cid", "relevance", "_cv")


def test_mmr_matches_python_replay(spark, sf_dir):
    scored = _shortlist(spark, sf_dir)
    got = {
        (r["_qid"], r["mmr_rank"]): r["_cid"]
        for r in K.mmr_rerank(scored, lam=0.7, k=10).collect()}
    by_q = {}
    for r in scored.collect():
        by_q.setdefault(r["_qid"], []).append(
            (r["_cid"], r["relevance"], list(r["_cv"])))
    for qid, rows in by_q.items():
        want = _python_mmr(rows, lam=0.7, k=10)
        assert [got[(qid, rk)] for rk in range(1, len(want) + 1)] == want


def test_mmr_rank1_is_top_relevance_and_stable(spark, sf_dir):
    scored = _shortlist(spark, sf_dir)
    out1 = sorted(K.mmr_rerank(scored, lam=0.7, k=10).collect())
    out2 = sorted(K.mmr_rerank(scored, lam=0.7, k=10).collect())
    assert out1 == out2  # deterministic across runs
    first_seen = {}
    for r in scored.orderBy(F.col("relevance").desc(),
                            F.col("_cid").asc()).collect():
        first_seen.setdefault(r["_qid"], r["_cid"])
    rank1 = {r["_qid"]: r["_cid"]
             for r in K.mmr_rerank(scored, k=10).collect()
             if r["mmr_rank"] == 1}
    assert rank1 == first_seen


def test_mmr_lambda1_equals_relevance_order(spark, sf_dir):
    """lam=1.0 disables the diversity term -> pure relevance ranking."""
    scored = _shortlist(spark, sf_dir)
    out = K.mmr_rerank(scored, lam=1.0, k=5).collect()
    by_q = {}
    for r in sorted(out, key=lambda r: (r["_qid"], r["mmr_rank"])):
        by_q.setdefault(r["_qid"], []).append(r["_cid"])
    for qid, cids in by_q.items():
        want = [r["_cid"] for r in scored.filter(F.col("_qid") == qid)
                .orderBy(F.col("relevance").desc(),
                         F.col("_cid").asc()).limit(5).collect()]
        assert cids == want
