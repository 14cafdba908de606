"""Tier-12 queries: sequential-state analytics and corpus curation —
EWMA smoothing and CUSUM alarms (grouped-map recurrences, checked
against recursive-CTE oracles), URL canonicalization, an explainable
Gopher-style filter chain, and temperature-weighted source resampling.

No counterpart in the reference (/root/reference/main.py implements
only Direct Map / Conditional / Lookup). EWMA/CUSUM demonstrate the
pattern for NON-LINEAR per-key recurrences that window functions
cannot express: applyInPandas per key (each key's scan is sequential,
keys are perfectly parallel) — the batch twin of the
applyInPandasWithState streaming operator in streaming/stateful.py.
Float parity with the DuckDB recursive-CTE oracle is exact because
both engines execute the identical IEEE-double op sequence per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (priority, day) revenue in exact integer cents."""
    o = load(spark, sf_dir, "orders")
    # one year of history: recursion depth in the DuckDB oracle is
    # the series length, so the fixture bounds it (the operators
    # themselves stream arbitrary lengths)
    return (o.filter(F.year("o_orderdate") == 1995)
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("bigint").alias("x")))


_DAILY_SQL = """
      SELECT o_orderpriority AS prio,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS x
      FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# exponentially weighted moving average (grouped-map recurrence)
# ---------------------------------------------------------------------------

@query(
    "ewma_smooth",
    oracle=f"""
    WITH RECURSIVE daily AS ({_DAILY_SQL}),
    seq AS (
      SELECT prio, day, x,
             ROW_NUMBER() OVER (PARTITION BY prio ORDER BY day ASC) AS rn
      FROM daily),
    ew AS (
      SELECT prio, day, x, rn, CAST(x AS DOUBLE) AS y
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.prio, s.day, s.x, s.rn,
             0.2e0 * CAST(s.x AS DOUBLE) + 0.8e0 * e.y
      FROM seq s JOIN ew e ON s.prio = e.prio AND s.rn = e.rn + 1)
    SELECT prio, day, x / 100.0e0 AS rev, y / 100.0e0 AS ewma
    FROM ew
    """,
)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily revenue per priority class: y_t = 0.2 x_t
    + 0.8 y_{t-1}, y_1 = x_1 — the standard telemetry smoother whose
    recurrence no window frame can express (each output feeds the
    next). Executed as applyInPandas per key: one sequential numpy
    pass per priority, all priorities in parallel.

    Determinism contract: x is exact integer cents; each step is the
    same two-multiply-one-add double sequence the recursive-CTE
    oracle executes (0.2e0/0.8e0 are DOUBLE literals — DuckDB parses
    bare 0.2 as DECIMAL), so y is bit-identical with NO rounding.
    Scale: per-key state is O(1); a 100 TB series store EWMAs by
    segment: each partition resumes from the previous segment's
    carry-out — the same state hand-off applyInPandasWithState does
    for streams.
    """
    import pandas as pd

    def _ewma(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day").reset_index(drop=True)
        y = 0.0
        out = []
        for i, x in enumerate(pdf["x"]):
            xf = float(x)
            y = xf if i == 0 else 0.2 * xf + 0.8 * y
            out.append(y)
        return pd.DataFrame({"prio": pdf["prio"], "day": pdf["day"],
                             "rev": [float(x) / 100.0 for x in pdf["x"]],
                             "ewma": [v / 100.0 for v in out]})

    return (_daily_cents(spark, sf_dir)
            .groupBy("prio").applyInPandas(
                _ewma, "prio string, day date, rev double, ewma double"))


# ---------------------------------------------------------------------------
# CUSUM drift alarm (grouped-map recurrence with data-derived threshold)
# ---------------------------------------------------------------------------

@query(
    "cusum_alarm",
    oracle=f"""
    WITH RECURSIVE daily AS ({_DAILY_SQL}),
    stats AS (
      SELECT prio,
             CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
             sqrt(GREATEST(
               CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE)
               - (CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                 * (CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)),
               0e0)) AS sigma
      FROM daily GROUP BY prio),
    seq AS (
      SELECT d.prio, d.day, d.x, t.mu, t.sigma,
             ROW_NUMBER() OVER (PARTITION BY d.prio
                                ORDER BY d.day ASC) AS rn
      FROM daily d JOIN stats t ON t.prio = d.prio),
    cs AS (
      SELECT prio, day, x, mu, sigma, rn,
             GREATEST(0e0, CAST(x AS DOUBLE) - mu) AS s
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT q.prio, q.day, q.x, q.mu, q.sigma, q.rn,
             GREATEST(0e0, c.s + (CAST(q.x AS DOUBLE) - q.mu))
      FROM seq q JOIN cs c ON q.prio = c.prio AND q.rn = c.rn + 1)
    SELECT prio, day, x / 100.0e0 AS rev, s / 100.0e0 AS cusum,
           s > 4e0 * sigma AS alarm
    FROM cs
    """,
)
def cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector per priority class: S_t =
    max(0, S_{t-1} + (x_t - mu)), alarm when S_t exceeds 4 sigma —
    catches slow upward drifts that per-day z-scores
    (`seasonal_baseline`) never flag because no single day is
    extreme. mu/sigma are the key's own history (moments from exact
    integer sums, so both engines derive identical doubles).

    Same execution shape as `ewma_smooth`: the max() makes the
    recurrence non-linear, so it runs as a per-key sequential scan
    under applyInPandas, verified bit-exact against a recursive CTE.
    """
    import math

    import pandas as pd

    def _cusum(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day").reset_index(drop=True)
        xs = [int(v) for v in pdf["x"]]
        n = len(xs)
        mu = float(sum(xs)) / float(n)
        var = float(sum(v * v for v in xs)) / float(n) - mu * mu
        sigma = math.sqrt(max(var, 0.0))
        s = 0.0
        out, alarms = [], []
        for i, x in enumerate(xs):
            step = float(x) - mu
            s = max(0.0, step) if i == 0 else max(0.0, s + step)
            out.append(s)
            alarms.append(s > 4.0 * sigma)
        return pd.DataFrame({"prio": pdf["prio"], "day": pdf["day"],
                             "rev": [float(x) / 100.0 for x in xs],
                             "cusum": [v / 100.0 for v in out],
                             "alarm": alarms})

    return (_daily_cents(spark, sf_dir)
            .groupBy("prio").applyInPandas(
                _cusum,
                "prio string, day date, rev double, cusum double, "
                "alarm boolean"))


# ---------------------------------------------------------------------------
# URL canonicalization (web-dedup preprocessing)
# ---------------------------------------------------------------------------

@query(
    "url_canonicalize",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id,
             concat('HTTPS://', upper(source), '.Example.ORG/Docs/',
                    CAST(doc_id AS VARCHAR), '/?utm_source=feed&lang=',
                    lang, '&b=2&utm_medium=rss&a=1#frag-',
                    CAST(doc_id AS VARCHAR)) AS url
      FROM documents),
    parts AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
             lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1))
               AS host,
             regexp_replace(
               regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
               '/+$', '') AS path,
             regexp_extract(url, '\?([^#]*)', 1) AS q
      FROM raw),
    canon AS (
      SELECT doc_id, scheme, host, path,
             array_to_string(list_sort(list_filter(
               str_split(q, '&'),
               p -> len(p) > 0 AND NOT starts_with(p, 'utm_'))), '&')
               AS qs
      FROM parts)
    SELECT doc_id,
           concat(scheme, '://', host, path,
                  CASE WHEN len(qs) > 0 THEN concat('?', qs)
                       ELSE '' END) AS url_canon
    FROM canon
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for web-scale dedup: lowercase scheme and
    host (case-insensitive per RFC 3986) but NOT the path, strip the
    fragment, drop utm_* tracking params, sort the surviving query
    params, trim trailing slashes. Inputs are deterministically
    synthesized messy URLs (mixed case, tracking params, fragment) so
    the oracle sees the same strings. Near-identical pages differ
    only by tracking cruft — canonical-URL dedup removes most crawl
    duplication before any content hashing runs.

    Scale: pure per-row string expressions (regexp + array lambdas),
    no shuffle, fully codegen'd scan->project.
    """
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://"), F.upper("source"), F.lit(".Example.ORG/Docs/"),
        F.col("doc_id").cast("string"), F.lit("/?utm_source=feed&lang="),
        F.col("lang"), F.lit("&b=2&utm_medium=rss&a=1#frag-"),
        F.col("doc_id").cast("string"))
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1))
    path = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        r"/+$", "")
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    qs = F.array_join(F.array_sort(F.filter(
        F.split(q, "&"),
        lambda p: (F.length(p) > 0)
        & ~p.startswith("utm_"))), "&")
    return d.select(
        "doc_id",
        F.concat(scheme, F.lit("://"), host, path,
                 F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs))
                  .otherwise(F.lit(""))).alias("url_canon"))


# ---------------------------------------------------------------------------
# explainable quality-filter chain (Gopher-rule style)
# ---------------------------------------------------------------------------

@query(
    "filter_reasons",
    oracle=r"""
    WITH feats AS (
      SELECT doc_id, n_chars,
             len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
             len(regexp_extract_all(text, '\S+')) AS n_words
      FROM documents),
    flags AS (
      SELECT doc_id,
             n_chars < 120 AS too_short,
             n_chars > 500 AS too_long,
             n_alpha < CAST(0.6e0 * n_chars AS DOUBLE) AS low_alpha,
             n_words > 0 AND (
               n_chars / CAST(n_words AS DOUBLE) < 3e0
               OR n_chars / CAST(n_words AS DOUBLE) > 12e0)
               AS bad_word_len
      FROM feats)
    SELECT doc_id, too_short, too_long, low_alpha, bad_word_len,
           NOT (too_short OR too_long OR low_alpha OR bad_word_len)
             AS keep,
           CASE WHEN too_short THEN 'too_short'
                WHEN too_long THEN 'too_long'
                WHEN low_alpha THEN 'low_alpha'
                WHEN bad_word_len THEN 'bad_word_len'
                ELSE NULL END AS reason
    FROM flags
    """,
)
def filter_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explainable document-filter chain (the Gopher-rules pattern):
    every rule emits its own boolean column, `keep` is their
    conjunction, `reason` names the FIRST failing rule — so corpus
    loss is attributable per rule (the difference between 'we
    dropped 40%' and 'rule low_alpha alone dropped 38%'). Rules:
    length bounds, alphabetic-character ratio, mean word length.

    Scale: one scan, all rules computed side-by-side in a single
    codegen'd projection — never one pass per rule; downstream loss
    accounting is a groupBy over the boolean columns.
    """
    d = load(spark, sf_dir, "documents")
    n_alpha = F.size(F.regexp_extract_all(
        F.col("text"), F.lit("[A-Za-z]"), F.lit(0)))
    n_words = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(r"\S+"), F.lit(0)))
    feats = d.select("doc_id", "n_chars", n_alpha.alias("n_alpha"),
                     n_words.alias("n_words"))
    wlen = F.col("n_chars") / F.col("n_words").cast("double")
    flags = feats.select(
        "doc_id",
        (F.col("n_chars") < 120).alias("too_short"),
        (F.col("n_chars") > 500).alias("too_long"),
        (F.col("n_alpha") < (F.lit(0.6) * F.col("n_chars"))
         .cast("double")).alias("low_alpha"),
        ((F.col("n_words") > 0)
         & ((wlen < 3.0) | (wlen > 12.0))).alias("bad_word_len"))
    keep = ~(F.col("too_short") | F.col("too_long")
             | F.col("low_alpha") | F.col("bad_word_len"))
    reason = (F.when(F.col("too_short"), "too_short")
              .when(F.col("too_long"), "too_long")
              .when(F.col("low_alpha"), "low_alpha")
              .when(F.col("bad_word_len"), "bad_word_len"))
    return flags.select("doc_id", "too_short", "too_long", "low_alpha",
                        "bad_word_len", keep.alias("keep"),
                        reason.alias("reason"))


# ---------------------------------------------------------------------------
# temperature-weighted source resampling
# ---------------------------------------------------------------------------

@query(
    "temperature_resample",
    oracle="""
    WITH cnt AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    q AS (
      SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS qw FROM cnt),
    tot AS (
      SELECT SUM(n) AS big_n, SUM(qw) AS sum_q FROM q),
    tgt AS (
      SELECT q.source, q.n,
             CAST(FLOOR(0.5e0 * t.big_n * q.qw / t.sum_q + 0.5e0)
                  AS BIGINT) AS target_n
      FROM q, tot t),
    ranked AS (
      SELECT d.doc_id, d.source,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC,
                        d.doc_id ASC) AS rk
      FROM documents d)
    SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk,
           g.target_n, r.rk <= g.target_n AS kept
    FROM ranked r JOIN tgt g ON g.source = r.source
    """,
)
def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source rebalancing (T=2): sampling weight
    proportional to n^(1/T) = sqrt(n) flattens the source
    distribution (multilingual-LM recipe — mT5/XLM-R style), with a
    50%-of-corpus budget; each source keeps its target count of
    documents chosen by md5 rank (content-addressed, so the kept set
    is stable as the corpus grows — same property as
    `dataset_split`). Complements `mixture_weights`, which computes
    weights only; this executes the selection.

    Scale: per-source counts are dimension-sized (broadcast back),
    the md5 rank is one hash shuffle on source; no global sort.
    """
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    qd = cnt.select("source", "n",
                    F.sqrt(F.col("n").cast("double")).alias("qw"))
    tot = qd.agg(F.sum("n").alias("big_n"), F.sum("qw").alias("sum_q"))
    tgt = (qd.crossJoin(F.broadcast(tot))
           .select("source",
                   F.floor(F.lit(0.5) * F.col("big_n") * F.col("qw")
                           / F.col("sum_q") + 0.5).cast("bigint")
                    .alias("target_n")))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc())
    ranked = d.select("doc_id", "source",
                      F.row_number().over(w).cast("bigint").alias("rk"))
    return (ranked.join(F.broadcast(tgt), "source")
            .select("doc_id", "source", "rk", "target_n",
                    (F.col("rk") <= F.col("target_n")).alias("kept")))
