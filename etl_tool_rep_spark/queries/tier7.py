"""Tier-7 queries: analytic extensions — Pareto/skyline frontier,
deterministic weighted sampling, robust (MAD) outlier detection.

No counterpart in the reference (/root/reference/main.py has only the
three rule operators); these extend the analytics surface per the
BASELINE.json capability mandate. Each is one-or-two-shuffle shapes
chosen to survive 100x data growth — notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.rank import grouped_prefix_sum
from .registry import query


# ---------------------------------------------------------------------------
# 2-D skyline / Pareto frontier via sort + running max (no O(n^2))
# ---------------------------------------------------------------------------

def pareto_frontier(s: DataFrame) -> DataFrame:
    """Sort-based 2-D skyline of (okey, odate, price) — keep a row
    iff its price strictly exceeds the running max over all rows that
    precede it in (odate ASC, price DESC, okey ASC) order. The okey
    tiebreak makes exact (date, price) duplicates deterministic: the
    lowest okey survives, in every engine.

    The running max is the bucketed two-phase prefix max from
    `operators.rank.grouped_prefix_sum` (exclusive frame): literal
    percentile boundaries on the date give every row a deterministic
    bucket, local running maxes run per bucket in parallel, and
    earlier-bucket maxima arrive via a broadcast triangular join. No
    single-partition stage — and no `spark_partition_id()` (whose
    pid-vs-offsets consistency across re-evaluated range exchanges
    is not guaranteed; see operators/rank.py). Any skyline size.
    """
    order = [F.asc("odate"), F.desc("price"), F.asc("okey")]
    r = grouped_prefix_sum(s, [], order,
                           lead=F.unix_micros(
                               F.col("odate").cast("timestamp")),
                           sums={"cummax": ("price", "max")},
                           inclusive=False)
    return (r.filter(F.col("cummax").isNull()
                     | (F.col("price") > F.col("cummax")))
             .select("okey", "odate", "price"))


@query(
    "skyline_pareto",
    oracle="""
    WITH s AS (
      SELECT o_orderkey AS okey, o_orderdate AS odate,
             o_totalprice AS price,
             max(o_totalprice) OVER (
               ORDER BY o_orderdate ASC, o_totalprice DESC,
                        o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS cummax
      FROM orders)
    SELECT okey, odate, price
    FROM s WHERE cummax IS NULL OR price > cummax
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) of orders: the set of orders not
    dominated by any other on (earlier-or-equal date, higher-or-equal
    price, one strict). Classic multi-criteria query (Borzsony/
    Kossmann/Stocker, ICDE 2001). Sort-based skyline, not the naive
    O(n^2) NOT-EXISTS self-join; see `pareto_frontier` for the
    parallel two-level running-max plan and the determinism contract.
    """
    o = load(spark, sf_dir, "orders")
    s = o.select(F.col("o_orderkey").alias("okey"),
                 F.col("o_orderdate").alias("odate"),
                 F.col("o_totalprice").alias("price"))
    return pareto_frontier(s)


# ---------------------------------------------------------------------------
# deterministic weighted sampling (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------

@query(
    "weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             power(((doc_id * 2654435761) % 4294967296 + 1)
                   / 4294967297.0,
                   1.0 / n_chars) AS es_key
      FROM documents)
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           round(es_key, 9) AS es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id ASC
    LIMIT 100
    """,
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample without replacement, k=100:
    Efraimidis-Spirakis A-ES — each row draws u in (0,1) and scores
    u^(1/w); the top-k scores are a weighted sample. Weight here is
    document length (longer docs proportionally more likely — the
    token-budget-aware corpus subsampling move).

    The uniform u is a deterministic Knuth multiplicative hash of the
    id (so the oracle reproduces it exactly); swap in ``rand(seed)``
    for production randomness without changing the plan.

    Scale: A-ES is THE distributed weighted-sampling algorithm — the
    score needs no global state, so each partition keeps a local
    top-k heap (Spark's TakeOrderedAndProject) and only k rows per
    partition reach the driver-side merge. One pass, no shuffle.
    """
    d = load(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
         + 1) / F.lit(4294967297.0)
    es = F.pow(u, F.lit(1.0) / F.col("n_chars"))
    return (d.select("doc_id", "source",
                     F.col("n_chars").cast("bigint").alias("n_chars"),
                     F.round(es, 9).alias("es_key"))
             .orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
             .limit(100))


# ---------------------------------------------------------------------------
# robust outliers: median absolute deviation (Iglewicz-Hoaglin)
# ---------------------------------------------------------------------------

@query(
    "mad_outliers",
    oracle="""
    WITH med AS (
      SELECT lang, quantile_cont(n_chars, 0.5) AS med
      FROM documents GROUP BY lang),
    mad AS (
      SELECT d.lang, med.med,
             quantile_cont(abs(d.n_chars - med.med), 0.5) AS mad
      FROM documents d JOIN med ON d.lang = med.lang
      GROUP BY d.lang, med.med)
    SELECT d.doc_id, d.lang,
           floor(0.6745 * (d.n_chars - mad.med) / NULLIF(mad.mad, 0)
                 * 1e6 + 0.5) / 1e6
             AS robust_z,
           COALESCE(abs(0.6745 * (d.n_chars - mad.med)
                        / NULLIF(mad.mad, 0)) > 3.5, FALSE) AS is_outlier
    FROM documents d JOIN mad ON d.lang = mad.lang
    """,
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language outlier detection on document length:
    modified z-score 0.6745*(x - median)/MAD with the 3.5 cutoff
    (Iglewicz & Hoaglin, "How to Detect and Handle Outliers", 1993).
    Median/MAD resist the heavy tails that break mean/stddev z-scores
    on web-scale length distributions.

    Scale: two grouped exact medians (per-group sort, bounded by the
    largest language partition) + broadcast of the tiny per-language
    stats back onto the scan — the doc table itself is never
    shuffled. At 100 TB swap exact medians for ``approx_percentile``
    partials (see approx_quantiles) without changing the shape.
    """
    d = load(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("med"))
    mad = (d.join(F.broadcast(med), "lang")
             .groupBy("lang", "med")
             .agg(F.percentile(F.abs(F.col("n_chars") - F.col("med")),
                               F.lit(0.5)).alias("mad")))
    z = (F.lit(0.6745) * (F.col("n_chars") - F.col("med"))
         / F.nullif(F.col("mad"), F.lit(0)))
    # floor(x*1e6 + 0.5)/1e6 in BOTH engines: decimal-string
    # round() ties (x.xxxxxx5) broke between Spark's HALF_UP and
    # DuckDB's binary rounding at sf0.1; identical IEEE arithmetic
    # cannot diverge
    z6 = F.floor(z * 1e6 + F.lit(0.5)) / 1e6
    return (d.join(F.broadcast(mad), "lang")
             .select("doc_id", "lang",
                     z6.alias("robust_z"),
                     F.coalesce(F.abs(z) > 3.5, F.lit(False))
                      .alias("is_outlier")))
