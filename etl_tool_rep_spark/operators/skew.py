"""Skew-handling join utilities for hot-key workloads.

AQE's skew-join splitting (on by default in the session factory)
handles sort-merge skew transparently. This module adds the explicit
salting pattern for the cases AQE can't fix:

* aggregation skew (one giant group) — two-phase salted aggregate;
* skewed join where the build side must replicate per salt.

Salting trades a small fan-out of the dimension side (salt_factor
copies) for an even distribution of the fact side's hot keys across
salt_factor * shuffle_partitions reducers. At 100 TB a single hot key
(null keys, default tenants, bot users) otherwise pins one executor
for hours — this is the standard fix, wired as a reusable operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt_factor: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join fact⋈dim on ``key`` with the fact side salted and the
    dim side replicated ``salt_factor`` times.

    The fact side gets a deterministic salt from a stable hash of its
    whole row identity via xxhash64(key, monotonically spread col) —
    here pmod(xxhash64(<all fact cols>), salt) would break key
    grouping, so the salt is random-like but derived from a second
    hash of the key's row position: we use pmod on a per-row hash of
    all columns, which distributes a hot key's rows uniformly."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): the "
            "dim side is replicated per salt, so right/full outer "
            "would emit unmatched dim rows salt_factor times")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                  F.lit(salt_factor)).cast("int")
    f = fact.withColumn("_salt", salt)
    d = (dim.withColumn("_salt",
                        F.explode(F.array(*[F.lit(i)
                                            for i in range(salt_factor)]))))
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")


def blocked_copair_count(edges: DataFrame, key: str, member: str,
                         block_size: int = 1024,
                         out_1: str = "m1", out_2: str = "m2",
                         out_n: str = "shared") -> DataFrame:
    """Count co-occurring member pairs through a shared key —
    `SELECT a.m, b.m, COUNT(*) FROM e a JOIN e b ON a.key = b.key
    AND a.m < b.m GROUP BY 1,2` — with HUB KEYS expanded in blocks.

    The naive self-join hashes all of a key's rows to one task, so a
    hub key with degree d serializes its C(d, 2) output pairs on one
    core; AQE cannot split it because skew detection sees the join
    INPUT (d rows), not the quadratic output (BENCH_skew.md §3: a
    Zipf-1.2 hub part left a 1.6x single-task residual). Here each
    key's members are hashed into ceil(d / block_size) blocks and
    every (block_i <= block_j) combination becomes a DISTINCT join
    key, so the hub's pair output spreads over nblk(nblk+1)/2 tasks:

    * left side emits its row under (key, own_blk, j) for j >= blk;
      right side under (key, i, own_blk) for i <= blk — a cross-
      block pair (u < v) matches exactly once (min-block row on the
      left), a same-block pair matches on the diagonal key where the
      residual `a.m < b.m` dedups it;
    * per-row fan-out is ~nblk/2 + 1 INPUT rows (nblk = 1 for every
      non-hub key, making the plan identical to the naive join
      there), a vanishing cost against the unavoidable C(d, 2)
      OUTPUT rows;
    * pair orientation is normalized afterwards with least/greatest
      (block ids don't respect member order), so the aggregate is
      exactly the naive join's.

    ``edges`` must be distinct on (key, member). Output columns:
    ``out_1 < out_2`` member pair and the BIGINT co-occurrence count.

    Both expanded sides are explicitly repartitioned on the full
    (key, block_i, block_j) join key with a PINNED partition count:
    AQE's partition coalescing sizes tasks from shuffle INPUT bytes
    (the expanded edges — tiny), so left alone it re-fuses the hub's
    block keys into a handful of tasks and reintroduces the exact
    serialization the blocks exist to break (observed: a 1.7 B-pair
    stage coalesced to 10 tasks). A user-specified repartition count
    is exempt from coalescing, and the join reuses the exchanges.
    """
    npart = max(edges.sparkSession.sparkContext.defaultParallelism * 4,
                int(edges.sparkSession.conf.get(
                    "spark.sql.shuffle.partitions", "32")))
    w = Window.partitionBy(key)
    e2 = (edges.withColumn(
        "_nb", F.ceil(F.count(F.lit(1)).over(w)
                      / F.lit(block_size)).cast("int"))
        .withColumn("_blk", F.pmod(F.xxhash64(F.col(member)),
                                   F.col("_nb")).cast("int")))
    left = e2.select(
        F.col(key).alias("_k"), F.col(member).alias("_ma"),
        F.col("_blk").alias("_bi"),
        F.explode(F.sequence(F.col("_blk"), F.col("_nb") - 1))
        .alias("_bj"))
    right = e2.select(
        F.col(key).alias("_k"), F.col(member).alias("_mb"),
        F.explode(F.sequence(F.lit(0).cast("int"), F.col("_blk")))
        .alias("_bi"),
        F.col("_blk").alias("_bj"))
    left = left.repartition(npart, "_k", "_bi", "_bj")
    right = right.repartition(npart, "_k", "_bi", "_bj")
    pairs = (left.join(right, ["_k", "_bi", "_bj"])
             .filter((F.col("_bi") < F.col("_bj"))
                     | (F.col("_ma") < F.col("_mb"))))
    return (pairs.groupBy(
        F.least("_ma", "_mb").alias(out_1),
        F.greatest("_ma", "_mb").alias(out_2))
        .agg(F.count(F.lit(1)).cast("bigint").alias(out_n)))


def salted_agg_count(df: DataFrame, key: str,
                     salt_factor: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial count per
    (key, salt), then final combine per key. Spark's hash aggregate
    already does map-side partials, so this explicit form matters for
    algebraic aggregates over extremely hot keys where even the
    post-partial shuffle rows concentrate (e.g. high-cardinality
    payloads per group like collect_list)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(salt_factor)).cast("int")
    partial = (df.withColumn("_salt", salt)
                 .groupBy(key, "_salt")
                 .agg(F.count(F.lit(1)).alias("_partial")))
    return (partial.groupBy(key)
                   .agg(F.sum("_partial").cast("bigint").alias("cnt")))
