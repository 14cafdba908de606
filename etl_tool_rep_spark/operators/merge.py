"""Merge / upsert operators — the write-side half of an ETL engine.

Spark's file formats don't mutate in place; an upsert is a plan:
target rows not matched by key stay, matched rows take the update's
values, unmatched updates insert. Expressed as a full outer join +
coalesce — one shuffle on the key (or zero if both sides are bucketed
on it; see sinks.write_bucketed).

At 100 TB, pair with partitioned layouts: read only the partitions
the updates touch, merge, and overwrite just those partitions
(``spark.sql.sources.partitionOverwriteMode=dynamic``) — the
merge cost tracks the delta, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 key: str | list[str]) -> DataFrame:
    """Upsert semantics (MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT): updates win on key collision, target rows survive
    otherwise, new update keys append. Both inputs must share a
    schema."""
    keys = [key] if isinstance(key, str) else list(key)
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target={sorted(target.columns)} "
            f"updates={sorted(updates.columns)}")
    value_cols = [c for c in target.columns if c not in keys]
    t = target.alias("t")
    # explicit existence marker: "u.<key> IS NOT NULL" would
    # misclassify rows whose key is legitimately NULL (eqNullSafe
    # matches NULL to NULL, so such rows DO match)
    u = updates.withColumn("_u_exists", F.lit(1)).alias("u")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]
    joined = t.join(u, cond, "full_outer")
    matched = F.col("u._u_exists").isNotNull()
    out_cols = [
        F.when(matched, F.col(f"u.{k}")).otherwise(F.col(f"t.{k}"))
         .alias(k)
        for k in keys
    ] + [
        F.when(matched, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}"))
         .alias(c)
        for c in value_cols
    ]
    return joined.select(*out_cols)


def delete_matching(target: DataFrame, deletes: DataFrame,
                    key: str | list[str]) -> DataFrame:
    """Anti-join delete: keep target rows whose key is absent from
    ``deletes`` (MERGE WHEN MATCHED DELETE)."""
    keys = [key] if isinstance(key, str) else list(key)
    return target.join(deletes.select(*keys).distinct(), keys,
                       "left_anti")
