"""LLM-training-pipeline extensions, batch 3: benchmark-contamination
checks, intra-document repetition signals, corpus mixture balancing,
and retrieve-then-rerank diversity (MMR).

These mirror the data-quality stages of public pretraining pipelines
(Gopher/MassiveText rep filters — Rae et al. 2021; The Pile / RefinedWeb
decontamination via n-gram overlap; mixture reweighting as in
DoReMi-style source balancing), expressed as declarative Spark plans:

* n-grams are generated JVM-side with ``transform(sequence, slice)``
  higher-order functions — no Python in the hot path;
* contamination is a distinct-gram LEFT JOIN against the benchmark
  gram set (at scale: broadcast the benchmark grams — benchmarks are
  tiny next to the corpus — so the check is a map-side probe);
* repetition ratios are single-pass aggregates over exploded grams;
* MMR reranks a distributed top-k shortlist with a per-query numpy
  kernel (the only sequential part, O(k^2) on <=30 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import knn as K
from .registry import query

# word 5-grams / 3-grams as JVM higher-order expressions; the CASE
# guards short docs (sequence(1, 0) would produce a DESCENDING range)
_W = "split(text, '\\\\s+')"


def _grams_expr(n: int) -> str:
    # the token array is let-bound as lambda var `w` (see
    # functions/exprs.let_bind): referencing the split expression
    # directly would re-run the regex split per gram via
    # CollapseProject inlining
    body = (f"CASE WHEN size(w) >= {n} THEN "
            f"transform(sequence(1, size(w) - {n - 1}), "
            f"i -> array_join(slice(w, i, {n}), ' ')) "
            f"ELSE array() END")
    return f"element_at(transform(array({_W}), w -> {body}), 1)"


# DuckDB twin: list ranges are 1-based inclusive, range() end-exclusive
def _grams_sql(n: int) -> str:
    return (f"SELECT doc_id, array_to_string(w[i:i+{n - 1}], ' ') AS g "
            f"FROM tok, UNNEST(range(1, greatest(len(w) - {n - 2}, 1))) "
            f"AS t(i)")


@query(
    "contamination_check",
    oracle=f"""
    WITH tok AS (SELECT doc_id, str_split_regex(text, '\\s+') AS w
                 FROM documents),
    grams AS ({_grams_sql(5)}),
    cgrams AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 20 <> 0),
    bgrams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0)
    SELECT c.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(b.g) AS BIGINT) AS n_matched,
           round(CAST(COUNT(b.g) AS DOUBLE) / COUNT(*), 6) AS contam_ratio,
           CAST(COUNT(b.g) AS DOUBLE) / COUNT(*) >= 0.5 AS flagged
    FROM cgrams c LEFT JOIN bgrams b ON c.g = b.g
    GROUP BY c.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-document share of distinct word
    5-grams that also appear in a held-out benchmark set (here the
    deterministic ``doc_id % 20 == 0`` slice stands in for the
    benchmark corpus).

    Scale: the benchmark gram set is broadcast — real benchmarks are
    MBs against a 100 TB corpus — so the overlap probe is map-side
    with zero shuffle of the corpus grams; only the per-doc counting
    agg shuffles, keyed by doc_id (already near-unique).
    """
    docs = load(spark, sf_dir, "documents")
    grams = (docs.select("doc_id",
                         F.explode(F.expr(_grams_expr(5))).alias("g"))
                 .distinct())
    cand = grams.filter(F.col("doc_id") % 20 != 0)
    bench = (grams.filter(F.col("doc_id") % 20 == 0)
                  .select(F.col("g").alias("bg")).distinct())
    hit = F.count("bg")
    ratio = hit.cast("double") / F.count(F.lit(1))
    return (cand.join(F.broadcast(bench), cand.g == F.col("bg"), "left")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_grams"),
                     hit.alias("n_matched"),
                     F.round(ratio, 6).alias("contam_ratio"),
                     (ratio >= 0.5).alias("flagged")))


@query(
    "repetition_score",
    oracle=f"""
    WITH tok AS (SELECT doc_id, str_split_regex(text, '\\s+') AS w
                 FROM documents),
    words AS (SELECT doc_id, UNNEST(w) AS wd FROM tok),
    wstat AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_unique,
             CAST(MAX(cnt) AS BIGINT) AS top_freq
      FROM (SELECT doc_id, wd, COUNT(*) AS cnt
            FROM words GROUP BY doc_id, wd) wc
      GROUP BY doc_id),
    grams AS ({_grams_sql(3)}),
    gstat AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                     CAST(COUNT(DISTINCT g) AS BIGINT) AS n_unique_grams
              FROM grams GROUP BY doc_id)
    SELECT w.doc_id AS doc_id, w.n_words AS n_words,
           round(1.0 - CAST(w.n_unique AS DOUBLE) / w.n_words, 6)
             AS dup_word_ratio,
           round(CAST(w.top_freq AS DOUBLE) / w.n_words, 6)
             AS top_word_share,
           round(1.0 - CAST(g.n_unique_grams AS DOUBLE) / g.n_grams, 6)
             AS dup_trigram_ratio
    FROM wstat w JOIN gstat g ON w.doc_id = g.doc_id
    """,
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    ratio, most-frequent-word share, duplicate-trigram ratio — the
    standard filters for boilerplate / degenerate text.

    Scale: both aggregates key on doc_id, so word-level and
    gram-level stats shuffle once each on the same key and join
    co-partitioned; counts are map-side-combined ints.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("wd"))
    wstat = (words.groupBy("doc_id", "wd").count()
                  .groupBy("doc_id")
                  .agg(F.sum("count").alias("n_words"),
                       F.count(F.lit(1)).alias("n_unique"),
                       F.max("count").alias("top_freq")))
    grams = docs.select(
        "doc_id", F.explode(F.expr(_grams_expr(3))).alias("g"))
    gstat = (grams.groupBy("doc_id")
                  .agg(F.count(F.lit(1)).alias("n_grams"),
                       F.countDistinct("g").alias("n_unique_grams")))
    return (wstat.join(gstat, "doc_id")
            .select("doc_id", "n_words",
                    F.round(1.0 - F.col("n_unique").cast("double")
                            / F.col("n_words"), 6)
                     .alias("dup_word_ratio"),
                    F.round(F.col("top_freq").cast("double")
                            / F.col("n_words"), 6)
                     .alias("top_word_share"),
                    F.round(1.0 - F.col("n_unique_grams").cast("double")
                            / F.col("n_grams"), 6)
                     .alias("dup_trigram_ratio")))


@query(
    "mixture_weights",
    oracle="""
    WITH per AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY source, lang),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS nstrata FROM per)
    SELECT p.source AS source, p.lang AS lang, p.n_docs AS n_docs,
           round(CAST(p.n_docs AS DOUBLE) / t.total, 6) AS share,
           CAST(CEIL(CAST(t.total AS DOUBLE) / t.nstrata) AS BIGINT)
             AS n_target,
           round(CAST(t.total AS DOUBLE) / t.nstrata / p.n_docs, 6)
             AS weight
    FROM per p, tot t
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture balancing: per-(source, lang) stratum share and
    the up/down-sampling weight that equalizes strata (DoReMi-style
    reweighting with a uniform target mixture).

    Scale: one groupBy over the corpus (map-side combined counts),
    then the 1-row total attaches via broadcast cross join — the
    weights table is catalog-sized, never corpus-sized.
    """
    docs = load(spark, sf_dir, "documents")
    per = (docs.groupBy("source", "lang")
               .agg(F.count(F.lit(1)).alias("n_docs")))
    tot = per.agg(F.sum("n_docs").alias("total"),
                  F.count(F.lit(1)).alias("nstrata"))
    target = F.col("total").cast("double") / F.col("nstrata")
    return (per.crossJoin(F.broadcast(tot))
               .select("source", "lang", "n_docs",
                       F.round(F.col("n_docs").cast("double")
                               / F.col("total"), 6).alias("share"),
                       F.ceil(target).cast("bigint").alias("n_target"),
                       F.round(target / F.col("n_docs"), 6)
                        .alias("weight")))


@query("mmr_rerank")  # rows-only: greedy trace not SQL-expressible
def mmr_rerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: distributed brute-force top-30 shortlist,
    then per-query MMR (lambda=0.7) diversity re-rank to 10 via a
    grouped numpy kernel. Determinism (pre-sorted groups, first-max
    tie-break) is asserted in tests against a pure-Python replay.
    """
    em = load(spark, sf_dir, "embeddings")
    shortlist = K.brute_force_topk(
        queries=em.filter(F.col("vec_id") < 5), candidates=em,
        query_id="vec_id", cand_id="vec_id",
        query_vec="embedding", cand_vec="embedding", k=30)
    short = shortlist.toDF("_qid", "_cid", "relevance", "_rank")
    vecs = em.select(F.col("vec_id").alias("_cid"),
                     F.col("embedding").alias("_cv"))
    scored = short.join(vecs, "_cid").select(
        "_qid", "_cid", "relevance", "_cv")
    return (K.mmr_rerank(scored, lam=0.7, k=10)
             .toDF("query_id", "vec_id", "relevance", "mmr_rank"))
