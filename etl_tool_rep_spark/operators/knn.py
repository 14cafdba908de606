"""Similarity search over embedding columns (array<float>).

Everything stays in JVM higher-order array functions (zip_with +
aggregate in DOUBLE) — no Python in the hot path, deterministic
left-to-right accumulation (hash-stable vs a serial oracle).

* brute force: broadcast the (small) query set against all
  candidates; per-candidate cost is O(dim), the top-k is a bounded
  window. This is the exact baseline — at 100 TB of vectors it's one
  full scan per query batch, embarrassingly parallel, no shuffle
  until the (tiny) top-k reduction.
* IVF: coarse quantize into nlist cells (deterministic centroid
  subset here; swap in k-means centroids without changing the plan),
  probe the nprobe nearest cells only — the scan shrinks to
  nprobe/nlist of the data. The cell assignment is itself a broadcast
  argmax, so building the index is one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(queries: DataFrame, candidates: DataFrame,
                     query_id: str, cand_id: str,
                     query_vec: str, cand_vec: str,
                     k: int = 10, metric: str = "cosine",
                     exclude_self: bool = True) -> DataFrame:
    """Exact top-k per query (broadcast queries x scan candidates).
    Deterministic ranking: (rounded score desc, candidate id asc)."""
    q = queries.select(F.col(query_id).alias("_qid"),
                       F.col(query_vec).alias("_qv"))
    c = candidates.select(F.col(cand_id).alias("_cid"),
                          F.col(cand_vec).alias("_cv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("_qid") != F.col("_cid"))
    score = cosine(F.col("_qv"), F.col("_cv")) if metric == "cosine" \
        else dot(F.col("_qv"), F.col("_cv"))
    w = (Window.partitionBy("_qid")
         .orderBy(F.col("score").desc(), F.col("_cid").asc()))
    return (joined
            .withColumn("score", F.round(score, 7))
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select(F.col("_qid").alias(query_id),
                    F.col("_cid").alias(cand_id), "score", "rank"))


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               vec_id: str, vec_col: str,
               centroid_id: str = "centroid_id",
               centroid_vec: str = "centroid_vec") -> DataFrame:
    """Assign every vector to its nearest (cosine) centroid — one
    broadcast pass, argmax via window."""
    c = centroids.select(F.col(centroid_id), F.col(centroid_vec))
    joined = vectors.crossJoin(F.broadcast(c))
    sim = cosine(F.col(vec_col), F.col(centroid_vec))
    w = (Window.partitionBy(vec_id)
         .orderBy(F.col("_sim").desc(), F.col(centroid_id).asc()))
    return (joined.withColumn("_sim", sim)
                  .withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1)
                  .drop("_rn", "_sim", centroid_vec))


def ivf_topk(queries: DataFrame, assigned: DataFrame,
             centroids: DataFrame,
             query_id: str, query_vec: str,
             cand_id: str, cand_vec: str,
             k: int = 10, nprobe: int = 3,
             centroid_id: str = "centroid_id",
             centroid_vec: str = "centroid_vec") -> DataFrame:
    """ANN search: probe the nprobe nearest cells per query, exact
    top-k within them. Recall grows with nprobe (== brute force at
    nprobe = nlist)."""
    q = queries.select(F.col(query_id).alias("_qid"),
                       F.col(query_vec).alias("_qv"))
    probe = q.crossJoin(F.broadcast(centroids))
    w = (Window.partitionBy("_qid")
         .orderBy(F.col("_csim").desc(), F.col(centroid_id).asc()))
    probed = (probe
              .withColumn("_csim", cosine(F.col("_qv"),
                                          F.col(centroid_vec)))
              .withColumn("_crn", F.row_number().over(w))
              .filter(F.col("_crn") <= nprobe)
              .select("_qid", "_qv", centroid_id))
    cands = probed.join(assigned, centroid_id) \
                  .filter(F.col("_qid") != F.col(cand_id))
    wk = (Window.partitionBy("_qid")
          .orderBy(F.col("score").desc(), F.col(cand_id).asc()))
    return (cands
            .withColumn("score",
                        F.round(cosine(F.col("_qv"), F.col(cand_vec)), 7))
            .withColumn("rank", F.row_number().over(wk).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select(F.col("_qid").alias(query_id),
                    F.col(cand_id), "score", "rank"))
