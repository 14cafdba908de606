"""Tier-6 queries: corpus-hygiene operators for LLM training data
(passage-level dedup, per-domain caps, semantic dedup) plus relational
surface extensions (regression aggregates, error-safe ``try_``
functions, LATERAL correlated joins, a linear quality classifier).

The reference (/root/reference/main.py:130-176) has no corpus or
statistical surface at all; these extend the engine per the
BASELINE.json LLM-data-pipeline mandate.

Scale notes inline per query; the common thread is that every operator
here is one scan + at most one shuffle, with the quadratic candidate
generation (semantic dedup) blocked by a cluster key so the all-pairs
cost is bounded per block, never corpus-global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exprs import let_bind
from .registry import query


# ---------------------------------------------------------------------------
# passage-level exact dedup (CCNet/Dolma-style paragraph dedup adapted
# to this corpus: fixed 10-word passages stand in for paragraphs)
# ---------------------------------------------------------------------------

@query(
    "passage_dedup",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    p AS (SELECT doc_id, i AS pos,
                 array_to_string(ws[i*10+1 : i*10+10], ' ') AS passage
          FROM w, UNNEST(range(CAST(ceil(len(ws)/10.0) AS INT)))
               AS u(i)),
    k AS (SELECT doc_id, pos, passage,
                 row_number() OVER (PARTITION BY passage
                                    ORDER BY doc_id, pos) AS rn
          FROM p)
    SELECT doc_id,
           COALESCE(string_agg(passage, ' ' ORDER BY pos)
                      FILTER (WHERE rn = 1), '') AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept
    FROM k GROUP BY doc_id
    """,
)
def passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide passage-level exact dedup: split each document into
    fixed 10-word passages, keep only the FIRST occurrence of each
    passage across the whole corpus (ordered by doc_id, position),
    and reassemble the surviving passages in document order.

    This is the paragraph-dedup stage of CCNet/Dolma-style pipelines
    (boilerplate headers/footers repeat across pages; dropping repeat
    paragraphs dedups at sub-document granularity where MinHash on
    whole docs cannot).

    Scale: one shuffle on the passage hash (the row_number window);
    first-occurrence choice is a deterministic (doc_id, pos) min, so
    partial map-side combines apply. Reassembly shuffles on doc_id —
    the same key the corpus is naturally bucketed by, so at 100 TB
    with bucketed storage both exchanges collapse to local sorts.
    """
    d = load(spark, sf_dir, "documents")
    # let-bound so the split evaluates once per row, not once per
    # passage slice (CollapseProject would inline it into the lambda)
    passages = let_bind(F.split(F.col("text"), " "), lambda ws: F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(ws) / F.lit(10.0)).cast("int") - 1),
        lambda i: F.array_join(F.slice(ws, i * F.lit(10) + 1, F.lit(10)),
                               " ")))
    p = d.select("doc_id", F.posexplode(passages).alias("pos", "passage"))
    w = Window.partitionBy("passage").orderBy("doc_id", "pos")
    k = p.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(F.col("rn") == 1, F.struct("pos", "passage"))
    return (k.groupBy("doc_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["passage"]), " ").alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum((F.col("rn") == 1).cast("int")).cast("bigint")
         .alias("n_kept")))


# ---------------------------------------------------------------------------
# per-domain document cap (RefinedWeb-style source balancing)
# ---------------------------------------------------------------------------

@query(
    "domain_cap",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n_source
      FROM documents)
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk,
           CAST(n_source AS BIGINT) AS n_source
    FROM ranked WHERE rk <= 20
    """,
)
def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most 20 documents per source,
    preferring longer documents (n_chars DESC, doc_id ASC tiebreak),
    reporting each kept doc's rank and its domain's total count.

    Web-crawl corpora are dominated by a few mega-domains; capping
    per-registered-domain (RefinedWeb, Gopher rules) is the standard
    counter. ``source`` stands in for the registered domain.

    Scale: a single hash shuffle on source; Spark rewrites the
    rank-filter into WindowGroupLimit, so each map task keeps only
    its local top-20 per domain before the exchange — the shuffle
    carries O(domains x 20), not the corpus.
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    return (d.select(
        "doc_id", "source",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source"))
         .cast("bigint").alias("n_source"))
        .filter(F.col("rk") <= 20))


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup: cluster-blocked cosine, greedy keep-by-id)
# ---------------------------------------------------------------------------

@query(
    "semantic_dedup",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
                      sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[])))
                        AS nrm
               FROM embeddings),
    dup AS (
      SELECT a.vec_id AS vid
      FROM e a JOIN e b
        ON a.label = b.label AND b.vec_id < a.vec_id
      WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9)
              >= 0.4
      GROUP BY a.vec_id)
    SELECT e.vec_id, CAST(e.label AS INT) AS label,
           (dup.vid IS NOT NULL) AS is_dup
    FROM e LEFT JOIN dup ON e.vec_id = dup.vid
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each embedding
    cluster (the precomputed ``label`` — in production the k-means
    assignment from ``kmeans_topics``), mark a vector as a duplicate
    if any LOWER-id vector in the same cluster has cosine >= 0.4.
    Greedy keep-lowest-id inside an epsilon-ball, per Abbas et al.,
    "SemDeDup" (arXiv:2303.09540).

    Scale: this is the whole point of the cluster blocking — the
    quadratic pair work runs per-label, so cost is sum over clusters
    of |c|^2 instead of N^2, and each label block is independent
    (perfectly parallel — one shuffle on label total). Within a block
    the pairwise cosines are ONE BLAS matmul over an Arrow batch
    (applyInPandas), not |c|^2 interpreted dot-product expressions:
    measured ~5x faster at sf0.1, and the gap widens with |c|. For
    clusters too large for an O(|c|^2) similarity tile, chunk the
    matmul row-block by row-block (the tile never needs to be fully
    resident); SemDeDup's k ~ sqrt(N) keeps |c| bounded by design.

    A pure-JVM declarative form (self-join + zip_with dot) is kept in
    git history; it mirrors the oracle SQL exactly but evaluates the
    higher-order dot interpreted per pair.
    """
    import numpy as np
    import pandas as pd

    em = load(spark, sf_dir, "embeddings")

    def _block(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        x = np.array([np.asarray(v, dtype=np.float64)
                      for v in pdf["embedding"]])
        nrm = np.sqrt(np.einsum("ij,ij->i", x, x))
        # row-chunked matmul: the full |c| x |c| similarity tile is
        # never resident (an oversized cluster would otherwise OOM
        # this one task — the sf10 rehearsal's fixed-label blocks hit
        # 50k rows); work is still sum |c|^2 but memory is
        # chunk x |c|. The dot/(|a||b|) float path and the round-
        # before-compare are kept EXACTLY as before (and as the
        # oracle computes them), so chunking cannot flip a cosine a
        # few ulp either side of 0.4.
        chunk = 2048
        is_dup = np.zeros(len(x), dtype=bool)
        for lo in range(0, len(x), chunk):
            hi = min(lo + chunk, len(x))
            sim = np.round((x[lo:hi] @ x.T)
                           / np.outer(nrm[lo:hi], nrm), 9)
            # strictly-lower triangle: does any LOWER-id vector sit
            # in this vector's epsilon-ball?
            mask = (np.arange(len(x))[None, :]
                    < np.arange(lo, hi)[:, None])
            is_dup[lo:hi] = ((sim >= 0.4) & mask).any(axis=1)
        return pd.DataFrame({"vec_id": pdf["vec_id"],
                             "label": pdf["label"].astype("int32"),
                             "is_dup": is_dup})

    return em.groupBy("label").applyInPandas(
        _block, "vec_id long, label int, is_dup boolean")


# ---------------------------------------------------------------------------
# regression aggregates (single-pass least squares via moment sums)
# ---------------------------------------------------------------------------

@query(
    "regression_agg",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS rflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sy,
             CAST(SUM(CAST(l_quantity * l_extendedprice
                           AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity * l_quantity
                           AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice
                           AS DECIMAL(30,6))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT rflag, CAST(n AS BIGINT) AS n_rows,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression (extendedprice ~ quantity):
    slope, intercept, and R^2 from single-pass moment sums — the
    textbook decomposition behind SQL's ``regr_slope``/``regr_r2``
    (verified against Spark's native regr_* in tests).

    Sums route through DECIMAL so Spark's parallel and the oracle's
    serial accumulation agree exactly; the closed-form arithmetic then
    runs in identically-ordered double ops on both engines.

    Scale: moment sums are algebraic aggregates — partial-aggregate
    (map-side combine) reduces each scan partition to 6 moment rows
    per group before a trivial exchange. One lineitem pass, ~3 groups.
    """
    li = load(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy(F.col("l_returnflag").alias("rflag")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q.cast("decimal(18,4)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(18,4)")).cast("double").alias("sy"),
        F.sum((q * p).cast("decimal(30,6)")).cast("double").alias("sxy"),
        F.sum((q * q).cast("decimal(30,6)")).cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(30,6)")).cast("double").alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "rflag", n.cast("bigint").alias("n_rows"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         .alias("r2"))


# ---------------------------------------------------------------------------
# error-safe try_* functions
# ---------------------------------------------------------------------------

@query(
    "try_funcs",
    oracle="""
    SELECT o_orderkey AS okey,
           round(o_totalprice / NULLIF(o_custkey % 5 - 2, 0), 6)
             AS safe_ratio,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS pr_num,
           TRY_CAST(o_orderstatus AS INT) AS bad_num,
           (string_split(o_orderpriority, '-'))[3] AS part3
    FROM orders
    """,
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: ``try_divide`` (NULL on /0),
    ``try_cast`` (NULL on malformed input instead of an ANSI error),
    ``try_element_at`` (NULL past the end of an array).

    The reference's engine silently skips whole failing rules
    (main.py:173-174); cell-level NULL-on-error is the distributed
    analogue — one bad row must not kill a 100 TB job, and the error
    path stays inside codegen (no exception-handling slow path).
    """
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("okey"),
        F.round(F.try_divide(F.col("o_totalprice"),
                             F.col("o_custkey") % 5 - 2), 6)
         .alias("safe_ratio"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
         .alias("pr_num"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("bad_num"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3))
         .alias("part3"))


# ---------------------------------------------------------------------------
# LATERAL correlated join
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT n.n_name AS nation, t.c_name AS cname, t.c_acctbal AS acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name ASC LIMIT 2) t
"""


@query("lateral_join", oracle=_LATERAL_SQL)
def lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: for each nation, its top-2
    customers by account balance — the per-row-subquery surface
    (identical SQL text runs on both engines).

    Scale: Catalyst decorrelates the lateral into a join +
    per-partition limit (WindowGroupLimit shape) rather than
    re-executing the inner query per outer row — the naive
    nested-loop would be O(|nation| x |customer|).
    """
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# linear quality classifier (fastText-style log-linear scorer)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@query(
    "quality_classifier",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS wc,
             len(list_filter(string_split(text, ' '),
                 w -> w IN {str(tuple(_STOPWORDS))})) * 1.0
               / len(string_split(text, ' ')) AS stop_ratio,
             length(replace(text, ' ', '')) * 1.0
               / len(string_split(text, ' ')) AS avg_wlen
      FROM documents)
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(-2.0 + 3.0 * stop_ratio
                                    + 0.8 * ln(avg_wlen)
                                    + 0.3 * ln(wc)))), 6) AS prob,
           (1.0 / (1.0 + exp(-(-2.0 + 3.0 * stop_ratio
                               + 0.8 * ln(avg_wlen)
                               + 0.3 * ln(wc)))) >= 0.5) AS keep
    FROM f
    """,
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastText-style log-linear document quality classifier: fixed
    weights over cheap lexical features (stopword ratio, mean word
    length, log word count) through a sigmoid, thresholded at 0.5 —
    the shape of the CCNet/GPT-3 quality-filter stage with a
    deterministic stand-in model.

    Scale: pure per-row codegen'd expressions — no shuffle, no
    Python; a real model swaps the fixed weights for a broadcast
    coefficient vector without changing the plan. Weights chosen so
    the corpus splits non-trivially (both classes populated).
    """
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    wc = F.size(words)
    stop_ratio = (F.size(F.filter(
        words, lambda w: w.isin(*_STOPWORDS))) * F.lit(1.0) / wc)
    avg_wlen = (F.length(F.regexp_replace("text", " ", ""))
                * F.lit(1.0) / wc)
    logit = (F.lit(-2.0) + 3.0 * stop_ratio + 0.8 * F.log(avg_wlen)
             + 0.3 * F.log(wc))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return d.select("doc_id", F.round(prob, 6).alias("prob"),
                    (prob >= 0.5).alias("keep"))
