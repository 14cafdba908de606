"""Tier-9 queries: corpus statistics and runtime-filter joins —
character-level entropy, bigram PMI collocations, a hand-rolled
bloom-filter prefilter join, and a count-min frequency sketch.

No counterpart in the reference (/root/reference/main.py implements
only Direct Map / Conditional / Lookup); these extend the text-analysis
and join surfaces per the BASELINE.json capability mandate. Entropy and
PMI are standard corpus-quality/collocation signals in LLM data
pipelines (low-entropy docs are boilerplate; high-PMI bigrams drive
tokenizer vocab choices); the bloom prefilter is the classic runtime
filter that makes 100 TB semi joins cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.sketches import cms_build, cms_estimate
from .registry import query


# ---------------------------------------------------------------------------
# per-document character entropy (boilerplate / gibberish signal)
# ---------------------------------------------------------------------------

@query(
    "char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id,
             UNNEST(regexp_extract_all(
               lower(substr(text, 1, 200)), '[a-z]')) AS ch
      FROM documents),
    freq AS (
      SELECT doc_id, ch, COUNT(*) AS c
      FROM chars GROUP BY doc_id, ch),
    contrib AS (
      SELECT doc_id, c,
             SUM(c) OVER (PARTITION BY doc_id) AS tot
      FROM freq)
    SELECT doc_id, CAST(MAX(tot) AS BIGINT) AS n_used,
           ROUND(CAST(SUM(CAST(
             -(c * 1.0 / tot) * LN(c * 1.0 / tot)
             AS DECIMAL(20,10))) AS DOUBLE), 6) AS entropy
    FROM contrib GROUP BY doc_id
    """,
)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the letter distribution in each document's
    first 200 characters: H = -sum_c p_c ln p_c. A cheap, robust
    gibberish/boilerplate detector — English prose sits near 2.9
    nats; repeated padding or single-char spam collapses toward 0
    (CCNet/Gopher-style quality filtering uses exactly this family
    of signals).

    Per-char contributions are doubles but the <=26-term per-doc
    reduction runs in DECIMAL(20,10), so Spark's partial aggregation
    order cannot perturb the hash.

    Scale: explode(200) fans each doc to at most 200 rows, then two
    map-side-combinable aggregations keyed by doc — no wide shuffle,
    partition-local until the final (doc_id, ch) combine. At 100 TB
    compute the frequency map per-doc inside one pass with
    aggregate() over the char array instead of explode to cut the
    fan-out 200x.
    """
    d = load(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(
            F.lower(F.substring("text", 1, 200)),
            F.lit("[a-z]"), F.lit(0))).alias("ch"))
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c") * 1.0 / F.col("tot")
    contrib = (-p * F.log(p)).cast("decimal(20,10)")
    return (freq.withColumn("tot", tot)
            .groupBy("doc_id")
            .agg(F.max("tot").cast("bigint").alias("n_used"),
                 F.round(F.sum(contrib).cast("double"), 6)
                  .alias("entropy")))


# ---------------------------------------------------------------------------
# bigram collocations by pointwise mutual information
# ---------------------------------------------------------------------------

@query(
    "bigram_pmi",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             regexp_extract_all(lower(text), '[a-z]+') AS ws
      FROM documents),
    words AS (
      SELECT doc_id, lang,
             UNNEST(ws) AS w,
             UNNEST(range(len(ws))) AS pos
      FROM toks),
    bi AS (
      SELECT lang, w AS a,
             LEAD(w) OVER (PARTITION BY doc_id
                           ORDER BY pos ASC) AS b
      FROM words),
    c_ab AS (
      SELECT lang, a, b, COUNT(*) AS n_ab
      FROM bi WHERE b IS NOT NULL GROUP BY lang, a, b),
    c_w AS (
      SELECT lang, w, COUNT(*) AS n_w FROM words GROUP BY lang, w),
    tot AS (
      SELECT lang, COUNT(*) AS n FROM words GROUP BY lang),
    scored AS (
      SELECT c.lang, c.a, c.b, c.n_ab,
             ROUND(LN(CAST(c.n_ab AS DOUBLE) * t.n
                      / (ca.n_w * CAST(cb.n_w AS DOUBLE))), 6) AS pmi,
             ROW_NUMBER() OVER (PARTITION BY c.lang
                                ORDER BY c.n_ab DESC, c.a ASC, c.b ASC)
               AS rk
      FROM c_ab c
      JOIN c_w ca ON c.lang = ca.lang AND c.a = ca.w
      JOIN c_w cb ON c.lang = cb.lang AND c.b = cb.w
      JOIN tot t ON c.lang = t.lang)
    SELECT lang, a, b, n_ab, pmi FROM scored WHERE rk <= 20
    """,
)
def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigrams per language ranked by frequency, scored with
    pointwise mutual information: PMI(a,b) = ln(P(ab) / (P(a)P(b)))
    = ln(n_ab * N / (n_a * n_b)). The standard collocation statistic
    (Church & Hanks 1990) — high-PMI pairs ("san francisco") behave
    as single tokens, a core tokenizer/vocab-design diagnostic.

    All inputs to the PMI log are exact integers, so the score is
    bit-deterministic without decimal routing.

    Scale: posexplode fans docs to words (the corpus itself);
    bigrams come from LEAD over (doc, pos) — a partition-local window
    after one hash shuffle on doc_id. Counts are map-side-combinable
    groupBys; unigram and total tables are vocab-sized, so the final
    joins broadcast. Top-k per lang is a WindowGroupLimit (rank
    pushed into the shuffle), not a global sort.
    """
    # r14: REVERTED to the r12 LEAD-window form. The r13 restructure
    # (tokenize once into a pinned array frame, bigrams from adjacent
    # array elements) measured 0.84x in interleaved A/B, and the
    # unpinned array variant 0.76x: materializing/rebuilding the
    # token-ARRAY corpus (wide array rows through transform/explode)
    # costs more than the per-doc window sort it removed. The window
    # shuffle on doc_id is partition-local and cheap at every scale;
    # the array forms lose twice (array build + bigger explode input).
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "lang",
        F.posexplode(F.regexp_extract_all(
            F.lower("text"), F.lit("[a-z]+"), F.lit(0)))
        .alias("pos", "w"))
    wd = Window.partitionBy("doc_id").orderBy(F.col("pos").asc())
    bi = (words.select("lang", F.col("w").alias("a"),
                       F.lead("w").over(wd).alias("b"))
          .filter(F.col("b").isNotNull()))
    c_ab = bi.groupBy("lang", "a", "b").agg(
        F.count(F.lit(1)).alias("n_ab"))
    c_w = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("n_w"))
    tot = words.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    ca = c_w.select("lang", F.col("w").alias("a"),
                    F.col("n_w").alias("n_a"))
    cb = c_w.select("lang", F.col("w").alias("b"),
                    F.col("n_w").alias("n_b"))
    pmi = F.round(F.log(F.col("n_ab").cast("double") * F.col("n")
                        / (F.col("n_a") * F.col("n_b").cast("double"))),
                  6)
    wr = Window.partitionBy("lang").orderBy(
        F.col("n_ab").desc(), F.col("a").asc(), F.col("b").asc())
    return (c_ab.join(F.broadcast(ca), ["lang", "a"])
            .join(F.broadcast(cb), ["lang", "b"])
            .join(F.broadcast(tot), "lang")
            .withColumn("pmi", pmi)
            .withColumn("rk", F.row_number().over(wr))
            .filter(F.col("rk") <= 20)
            .select("lang", "a", "b", "n_ab", "pmi"))


# ---------------------------------------------------------------------------
# bloom-filter prefilter semi join (runtime filter, hand-rolled)
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1 << 16          # 65536 bits = 1024 longs = 8 KB
_BLOOM_WORDS = _BLOOM_BITS >> 6
_BLOOM_SEEDS = (0, 1, 2)


@query(
    "bloom_prefilter_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 495000)
    """,
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding at least one order above 495k — executed as
    a runtime-bloom-filtered semi join: build an 8 KB bloom filter
    (65536 bits, 3 hashes) over the filtered build-side keys, test
    it against every probe row with pure JVM bit arithmetic, and only
    then run the exact semi join on the survivors. False positives
    are removed by the exact join, so the result is identical to the
    plain semi join the oracle runs.

    This is the pattern behind Spark's own
    spark.sql.optimizer.runtime.bloomFilter (and the classic
    distributed semi-join reducer): at 100 TB the build side's keys
    may be too large to broadcast as a hash set, but the FIXED-SIZE
    bloom always broadcasts, pruning the probe scan to ~selectivity
    before any shuffle. Here the whole filter is an array<long>
    literal evaluated inside whole-stage codegen — no Python, no
    extra join for the membership test.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    keys = (o.filter(F.col("o_totalprice") > 495000)
             .select(F.col("o_custkey").alias("k")).distinct())

    def positions(col):
        return [F.pmod(F.xxhash64(col, F.lit(s)), F.lit(_BLOOM_BITS))
                 .cast("int") for s in _BLOOM_SEEDS]

    # build: explode bit positions, OR per 64-bit word, collect 8 KB
    bits = (keys.select(F.explode(F.array(*positions(F.col("k"))))
                        .alias("pos"))
                .select((F.col("pos") / 64).cast("int").alias("word"),
                        F.expr("shiftleft(1L, pos % 64)").alias("mask"))
                .groupBy("word").agg(F.bit_or("mask").alias("bits")))
    word_map = {r["word"]: r["bits"] for r in bits.collect()}
    # one parsed SQL literal, not _BLOOM_WORDS F.lit Columns — the
    # same py4j-storm fix as operators/knn.ivf_assign (building 1024
    # Column objects costs ~2s of driver time per call). 1024 words
    # is ~20 KB of SQL text, far under the ~1 MB literal-plan ceiling
    # (knn._LITERAL_PLAN_CEILING_CHARS); a filter-sized bloom (MBs)
    # must ship as a broadcast table instead, like ivf_assign's
    # fallback — SCALE.md §literal-plans.
    bloom = F.expr("array(" + ",".join(
        f"{word_map.get(i, 0)}L" for i in range(_BLOOM_WORDS)) + ")")

    # probe: all 3 bits set -> candidate; exact semi join after
    probe = c.withColumn("bf", bloom)
    for i, p in enumerate(positions(F.col("c_custkey"))):
        probe = probe.withColumn(f"p{i}", p)
    pred = " AND ".join(
        f"((shiftrightunsigned(element_at(bf, cast(p{i}/64 as int) + 1),"
        f" p{i} % 64) & 1) = 1)"
        for i in range(len(_BLOOM_SEEDS)))
    return (probe.filter(F.expr(pred))
             .join(F.broadcast(keys),
                   F.col("c_custkey") == F.col("k"), "left_semi")
             .select("c_custkey", "c_name"))


# ---------------------------------------------------------------------------
# count-min sketch frequency estimates (rows-only: hash-defined)
# ---------------------------------------------------------------------------

@query("cms_freq")  # rows-only: estimates depend on xxhash64 layout
def cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for every part key in
    lineitem, compared to exact counts. depth=4 x width=2048 counters
    (64 KB) regardless of key cardinality; estimates are biased high
    by construction (est >= exact always; est <= exact + eps*N w.h.p.)
    — tests/test_sketches assert both properties plus mergeability.

    Scale: the sketch replaces a full groupBy over an unbounded key
    space with a fixed 8192-cell aggregation; per-day sketches merge
    by cell-wise sum (cms_merge), the streaming/incremental path.
    """
    li = load(spark, sf_dir, "lineitem")
    sketch = cms_build(li, "l_partkey")
    exact = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(sketch, exact.select("l_partkey"), "l_partkey")
    return (exact.join(est, "l_partkey")
            .select("l_partkey", "exact_cnt", "cms_est",
                    (F.col("cms_est") >= F.col("exact_cnt"))
                    .alias("never_under")))
