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

from pyspark.sql import DataFrame
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
