"""Tier 23 — content-defined chunking (CDC) dedup behind the exact
oracle gate.

Document-level dedup (exact_dedup, minhash) misses duplication BELOW
the document: boilerplate paragraphs, quoted passages, shared
templates. The storage/dedup literature answer (LBFS, rsync,
restic/borg) is content-defined chunking: cut each text where a
ROLLING WINDOW hash satisfies a modular condition, so chunk
boundaries realign after insertions/deletions (a fixed-width grid
would shift every downstream chunk; CDC boundaries depend only on
local content). Identical passages then produce identical chunks
wherever they appear, and duplicated content is a GROUP BY over
chunk fingerprints.

Exactness: the window hash and the chunk fingerprint are both
Karp-Rabin Horner folds over codepoints mod 1e9+7 — the portable
integer kernel certified by `rolling_fingerprint` and tier 21 — so
DuckDB reproduces boundary decisions and fingerprints bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

_P = 1_000_000_007
_B = 31
_W = 8          # rolling window width (chars)
_MASK = 64      # boundary when window-hash % 64 == 0 (~64-char chunks)


# window hash at position i (chars i-W+1..i), as a SQL fold over j
def _wh_sql(cs: str, i: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range({i} - {_W} + 1, {i} + 1),"
            f" j -> {cs}[j])), (acc, c) -> (acc * {_B} + c) % {_P})")


def _wh_spark(cs: str, i: str) -> str:
    return (f"aggregate(transform(sequence({i} - {_W} + 1, {i}),"
            f" j -> element_at({cs}, j)), cast(0 as bigint),"
            f" (acc, c) -> pmod(acc * {_B} + c, {_P}))")


_CDC_ORACLE = f"""
    WITH chars AS (
      SELECT doc_id,
             list_transform(range(1, length(text) + 1),
               i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS cs
      FROM documents
      WHERE text IS NOT NULL AND length(text) >= 1
    ), bnd AS (
      SELECT doc_id, cs,
             flatten([[CAST(0 AS BIGINT)],
               list_filter(list_transform(range(1, len(cs) + 1),
                 i -> CASE WHEN i >= {_W} AND i < len(cs)
                            AND {_wh_sql('cs', 'i')} % {_MASK} = 0
                       THEN CAST(i AS BIGINT) END),
                 x -> x IS NOT NULL),
               [CAST(len(cs) AS BIGINT)]]) AS bs
      FROM chars
    ), ch AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(bs)), k -> {{
               'fp': list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(bs[k] + 1, bs[k + 1] + 1),
                                      m -> cs[m])),
                     (acc2, c2) -> (acc2 * {_B} + c2) % {_P}),
               'ln': bs[k + 1] - bs[k]}})) AS c
      FROM bnd
    )
    SELECT c.fp AS fp, c.ln AS chunk_len,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM ch
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """


@query("cdc_chunk_dedup", oracle=_CDC_ORACLE)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: cut every document where the
    8-char rolling Karp-Rabin hash is divisible by 64 (expected
    ~64-char chunks, boundaries realign across insertions), then
    fingerprint each chunk and report every (fingerprint, length)
    occurring more than once with its document spread — duplicated
    PASSAGES, not just duplicated documents. All integer arithmetic;
    DuckDB recomputes the identical boundaries and fingerprints.

    The boundary scan and chunk fold are JVM higher-order functions
    over the codepoint array — one narrow map per document, no
    Python, no shuffle until the final fingerprint GROUP BY (one
    shuffle, map-side combined). O(W * n) work per document.

    Scale: this is how 100-TB corpora dedup boilerplate — chunk
    fingerprints are tiny relative to text, the group-by key space
    is bounded by distinct content, and skew equals true duplication
    (a hot boilerplate chunk's count aggregates map-side; nothing
    materializes the duplicate text itself). Production would add
    min/max chunk-size clamps (documented out of scope here: the
    bare modular rule keeps the oracle 1:1)."""
    docs = (load(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull() & (F.length("text") >= 1))
            .select("doc_id", F.expr(
                "transform(sequence(1, length(text)),"
                " i -> cast(ascii(substring(text, i, 1)) as bigint))")
                .alias("cs")))
    bs = F.expr(
        "concat(array(cast(0 as bigint)),"
        " filter(transform(sequence(1, size(cs)),"
        f"  i -> case when i >= {_W} and i < size(cs)"
        f"        and pmod({_wh_spark('cs', 'i')}, {_MASK}) = 0"
        "        then cast(i as bigint) end),"
        "  x -> x is not null),"
        " array(cast(size(cs) as bigint)))")
    chunks = F.expr(
        "transform(sequence(1, size(bs) - 1), k -> struct("
        "  aggregate(transform(sequence(element_at(bs, k) + 1,"
        "                               element_at(bs, k + 1)),"
        "            m -> element_at(cs, cast(m as int))),"
        "            cast(0 as bigint),"
        f"           (acc2, c2) -> pmod(acc2 * {_B} + c2, {_P}))"
        "    as fp,"
        "  element_at(bs, k + 1) - element_at(bs, k) as ln))")
    ch = (docs.withColumn("bs", bs)
              .select("doc_id", F.explode(chunks).alias("c")))
    return (ch.groupBy(F.col("c.fp").alias("fp"),
                       F.col("c.ln").alias("chunk_len"))
              .agg(F.countDistinct("doc_id").cast("bigint")
                    .alias("n_docs"),
                   F.count(F.lit(1)).cast("bigint").alias("n_occ"))
              .filter(F.col("n_occ") >= 2))
