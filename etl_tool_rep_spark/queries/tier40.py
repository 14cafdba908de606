"""Tier 40 — incremental corpus dedup: the continuous-ingest shape.

Round-7 verdict item #5: every dedup key so far dedups a corpus
against ITSELF; a 100 TB training-data pipeline dedups each NEW batch
against the standing index. `incremental_minhash_dedup` persists the
MinHash band buckets of the standing corpus as a transactional
`LakeTable` (sinks/lakehouse.py), APPENDs the new batch's buckets
(with an idempotent replay, proving the ingest loop can crash-retry),
probes the UPDATED on-disk index for candidates, verifies them with
the exact shingle intersection, and emits per-source keep/drop
tallies. The DuckDB oracle recomputes the same verdicts from scratch
on the union — the incremental-equals-recompute contract
`ivm_delta_agg` certifies for aggregates, extended to the dedup +
lakehouse stacks.

No counterpart in the reference (/root/reference/main.py implements
only Direct Map / Conditional / Lookup rules over pandas frames).

Exactness: the minhash/banding arithmetic is the integer pipeline
`minhash_lsh_exact` (tier 21) already certifies cross-engine; all
outputs here are integer counts / id-sums on top of it.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..sinks.lakehouse import LakeTable
from .registry import query
from .tier21 import (_BANDS, _MH_LIST_SQL, _PERMS, _ROWS, _SH_CTES,
                     _WORD_BASE, _P, _band_key_sql, _with_shingles)

_INCR_ORACLE = f"""
    WITH {_SH_CTES}, mh AS (
      SELECT doc_id, [{_MH_LIST_SQL}] AS mh FROM sh
    ), bands AS (
      SELECT doc_id, t.b AS band,
             {_band_key_sql('mh', 't.b')} AS bkey
      FROM mh, (SELECT unnest(range({_BANDS})) AS b) t
    ), newb AS (
      SELECT doc_id, band, bkey FROM bands WHERE doc_id % 5 = 0
    ), cand AS (
      SELECT DISTINCT n.doc_id AS d, o.doc_id AS e
      FROM newb n JOIN bands o
        ON o.band = n.band AND o.bkey = n.bkey
       AND o.doc_id <> n.doc_id
    ), ver AS (
      SELECT c.d,
             (2 * len(list_intersect(sa.sh, sb.sh))
                >= len(sa.sh) + len(sb.sh)
                   - len(list_intersect(sa.sh, sb.sh)))
             AND (c.e % 5 <> 0 OR c.e < c.d) AS dup
      FROM cand c JOIN sh sa ON sa.doc_id = c.d
                  JOIN sh sb ON sb.doc_id = c.e
    ), perdoc AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n_cand,
             CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup
      FROM ver GROUP BY d
    ), newdocs AS (
      SELECT doc_id AS d, source FROM sh WHERE doc_id % 5 = 0
    )
    SELECT nd.source,
           CAST(COUNT(*) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN COALESCE(p.n_dup, 0) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           CAST(SUM(COALESCE(p.n_cand, 0)) AS BIGINT) AS sum_cand,
           CAST(SUM(CASE WHEN COALESCE(p.n_dup, 0) > 0
                         THEN nd.d ELSE 0 END) AS BIGINT) AS dup_id_sum,
           CAST(2 AS BIGINT) AS n_versions
    FROM newdocs nd LEFT JOIN perdoc p ON p.d = nd.d
    GROUP BY nd.source
"""


@query("incremental_minhash_dedup", oracle=_INCR_ORACLE)
def incremental_minhash_dedup(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Dedup a NEW batch (every 5th doc) against the standing corpus
    through a PERSISTED band-bucket index:

    1. standing docs' (doc_id, band, bkey) rows become a `LakeTable`
       (one atomic manifest commit);
    2. the new batch's bucket rows are APPENDed — replayed once with
       the same batch_id to prove idempotent crash-retry (version
       must stay 2);
    3. candidates come from probing the UPDATED index read BACK FROM
       DISK via the manifest (new-vs-standing and new-vs-new alike);
    4. each candidate is verified with the exact distinct-shingle
       intersection; a new doc drops when it duplicates an EARLIER
       doc (any standing doc, or a smaller-id doc in its own batch —
       the keep-first rule);
    5. per-source tallies + a dup-id checksum certify every verdict.

    The oracle recomputes the verdicts from scratch over the union —
    if the lakehouse index dropped, duplicated or corrupted a single
    bucket row, candidates (and the hash) change.

    Scale: the index table is the band-bucket inventory (4 rows per
    doc) — the probe is an equi-join on (band, bkey) against only
    the NEW batch, so ingest cost is |batch| x bucket-collision
    bounded, never a recompute over the standing corpus; verify
    joins are candidate-bounded (the LSH contract). The final
    per-source frame is dimension-sized (<= |sources| rows), the
    only driver materialization."""
    docs = load(spark, sf_dir, "documents")
    sh = _with_shingles(docs).localCheckpoint(eager=True)

    def _perm_min(a: int, b: int):
        return F.array_min(F.transform(
            F.col("_sh"),
            lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P))))

    mh = F.array(*[_perm_min(a, b) for a, b in _PERMS])
    bkeys = []
    for b in range(_BANDS):
        acc = F.element_at("_mh", _ROWS * b + 1)
        for i in range(2, _ROWS + 1):
            acc = F.pmod(acc * F.lit(_WORD_BASE)
                         + F.element_at("_mh", _ROWS * b + i),
                         F.lit(_P))
        bkeys.append(acc)
    banded = (sh.withColumn("_mh", mh)
                .select("doc_id",
                        F.posexplode(F.array(*bkeys))
                         .alias("band", "bkey")))
    is_new = F.col("doc_id") % 5 == 0
    new_b = banded.filter(is_new)

    root = tempfile.mkdtemp(prefix="etl_incr_dedup_")
    try:
        t = LakeTable.create(spark, root, banded.filter(~is_new),
                             batch_id="index-base")
        t.append(new_b, batch_id="batch-1")
        t.append(new_b, batch_id="batch-1")   # crash-retry: no-op
        idx = t.snapshot()

        cand = (new_b.select(F.col("doc_id").alias("d"),
                             "band", "bkey")
                .join(idx, ["band", "bkey"])
                .filter(F.col("doc_id") != F.col("d"))
                .select("d", F.col("doc_id").alias("e"))
                .distinct())
        sa = sh.select(F.col("doc_id").alias("d"),
                       F.col("source").alias("src"),
                       F.col("_sh").alias("_sa"))
        sb = sh.select(F.col("doc_id").alias("e"),
                       F.col("_sh").alias("_sb"))
        inter = F.size(F.array_intersect("_sa", "_sb"))
        dup = ((2 * inter >= F.size("_sa") + F.size("_sb") - inter)
               & ((F.col("e") % 5 != 0) | (F.col("e") < F.col("d"))))
        perdoc = (cand.join(sb, "e").join(sa.drop("src"), "d")
                  .groupBy("d")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"),
                       F.sum(F.when(dup, 1).otherwise(0))
                        .cast("bigint").alias("n_dup")))
        per = (sh.filter(is_new)
               .select(F.col("doc_id").alias("d"),
                       F.col("source").alias("source"))
               .join(perdoc, "d", "left")
               .fillna(0, ["n_cand", "n_dup"]))
        agg = (per.groupBy("source")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"),
                    F.sum(F.when(F.col("n_dup") > 0, 1).otherwise(0))
                     .cast("bigint").alias("n_dup_docs"),
                    F.sum("n_cand").cast("bigint").alias("sum_cand"),
                    F.sum(F.when(F.col("n_dup") > 0, F.col("d"))
                          .otherwise(0)).cast("bigint")
                     .alias("dup_id_sum"))
               .withColumn("n_versions",
                           F.lit(t.version()).cast("bigint")))
        # bounded driver materialization (<= |sources| rows) so the
        # on-disk index can be cleaned up before returning
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
