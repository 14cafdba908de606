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

#: max vectors a single similarity task may own.  A label block over
#: the cap is split into m = ceil(n/cap) hash sub-groups and the
#: all-pairs work runs as the m(m+1)/2 triangle tiles over those
#: sub-groups — each task holds at most 2*cap rows, so a hot cluster
#: bounds the WORST TASK at cap^2-ish work instead of |c|^2.
_SD_CAP = 8192
_SD_CHUNK = 2048  # matmul row-chunk: tile memory is chunk x 2*cap


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

    Scale: cluster blocking makes the pair work sum|c|^2, not N^2 —
    but a HOT cluster (one label holding a large share of the corpus)
    would still pin one task at |c|^2.  So blocks over ``_SD_CAP``
    are re-split: vectors hash into m = ceil(|c|/cap) sub-groups and
    each unordered sub-group pair (i, j) becomes its own task holding
    groups i and j (the standard triangle-tiled all-pairs partition,
    Ullman MMDS ch.3 block scheme).  Every pair lands in EXACTLY one
    tile — (i, i) tiles own within-group pairs, (i, j) tiles own
    cross-group pairs — so the result is exact, no epsilon pruning.
    Replication is m copies per row (|c|^2/cap total tile input), the
    unavoidable price of exact all-pairs with a bounded worst task;
    a per-vector ``bool_or`` merges the tile verdicts.  The common
    case (|c| <= cap, m = 1) degenerates to one tile per label.

    Within a tile the pairwise cosines are chunked BLAS matmuls over
    an Arrow batch (applyInPandas), not interpreted per-pair dots:
    the per-element formula round(dot/(|a||b|), 9) >= 0.4 is exactly
    the oracle's; chunking and tiling keep that formula per element,
    while ulp-level BLAS accumulation-order differences remain
    covered by the existing round-before-compare mitigation.
    """
    import numpy as np
    import pandas as pd

    em = load(spark, sf_dir, "embeddings")
    # per-label sub-group counts: label is the k-means cluster
    # dimension (k ~ sqrt(N) — a bounded-cardinality aggregate), so
    # an explicit broadcast is safe at any corpus size.
    cnt = em.groupBy("label").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(_SD_CAP)).cast("int")
         .alias("_m"))
    g = F.pmod(F.xxhash64("vec_id"), F.col("_m")).cast("int")
    tiles = F.transform(
        F.sequence(F.lit(0), F.col("_m") - 1),
        lambda o: F.struct(F.least(g, o).alias("ti"),
                           F.greatest(g, o).alias("tj")))
    ex = (em.join(F.broadcast(cnt), "label")
          .select("vec_id", "label", "embedding", g.alias("_g"),
                  F.explode(tiles).alias("_t"))
          .select("vec_id", "label", "embedding", "_g",
                  F.col("_t.ti").alias("_ti"),
                  F.col("_t.tj").alias("_tj")))

    def _tile(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        x = np.array([np.asarray(v, dtype=np.float64)
                      for v in pdf["embedding"]])
        nrm = np.sqrt(np.einsum("ij,ij->i", x, x))
        ids = pdf["vec_id"].to_numpy()
        ti, tj = int(pdf["_ti"].iat[0]), int(pdf["_tj"].iat[0])
        is_dup = np.zeros(len(x), dtype=bool)
        if ti == tj:
            # diagonal tile: within-sub-group pairs, strictly-lower
            # id direction, row-chunked so the full tile is never
            # resident.
            for lo in range(0, len(x), _SD_CHUNK):
                hi = min(lo + _SD_CHUNK, len(x))
                sim = np.round((x[lo:hi] @ x.T)
                               / np.outer(nrm[lo:hi], nrm), 9)
                mask = ids[None, :] < ids[lo:hi, None]
                is_dup[lo:hi] = ((sim >= 0.4) & mask).any(axis=1)
        else:
            # off-diagonal tile: ONLY cross-group pairs (each
            # within-group pair belongs to its diagonal tile), both
            # id directions since either side may hold the lower id.
            ia = (pdf["_g"].to_numpy() == ti)
            xa, xb = x[ia], x[~ia]
            na, nb = nrm[ia], nrm[~ia]
            ida, idb = ids[ia], ids[~ia]
            dupa = np.zeros(len(xa), dtype=bool)
            dupb = np.zeros(len(xb), dtype=bool)
            for lo in range(0, len(xa), _SD_CHUNK):
                hi = min(lo + _SD_CHUNK, len(xa))
                sim = np.round((xa[lo:hi] @ xb.T)
                               / np.outer(na[lo:hi], nb), 9)
                hit = sim >= 0.4
                dupa[lo:hi] = (hit & (idb[None, :]
                                      < ida[lo:hi, None])).any(axis=1)
                dupb |= (hit & (ida[lo:hi, None]
                                < idb[None, :])).any(axis=0)
            is_dup[ia], is_dup[~ia] = dupa, dupb
        return pd.DataFrame({"vec_id": pdf["vec_id"],
                             "label": pdf["label"].astype("int32"),
                             "is_dup": is_dup})

    part = ex.groupBy("label", "_ti", "_tj").applyInPandas(
        _tile, "vec_id long, label int, is_dup boolean")
    # merge tile verdicts: a vector is a dup if ANY tile saw a
    # lower-id epsilon-ball neighbour (diagonal or cross).
    return (part.groupBy("vec_id", "label")
            .agg(F.bool_or("is_dup").alias("is_dup"))
            .select("vec_id", "label", "is_dup"))


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
