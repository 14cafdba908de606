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


def scd2_apply(history: DataFrame, updates: DataFrame,
               key: str, tracked: list[str],
               effective_ts_col: str = "effective_ts",
               valid_from: str = "valid_from",
               valid_to: str = "valid_to",
               is_current: str = "is_current") -> DataFrame:
    """Slowly-changing-dimension type 2: apply a batch of updates to a
    versioned history table.

    * rows whose tracked values changed: current version closed out
      (valid_to = update ts, is_current = false) + new open version
      appended;
    * unchanged / untouched keys: pass through;
    * brand-new keys: new open version.

    One full-outer join on the key + a union — no window needed
    because only the current version participates. At 100 TB keep
    history partitioned by is_current so the join reads only the open
    slice."""
    cur = history.filter(F.col(is_current))
    closed = history.filter(~F.col(is_current))

    # one update per key (latest effective_ts wins, deterministic) —
    # two updates for one key in a batch would otherwise open two
    # concurrent is_current versions and break the SCD2 invariant
    from pyspark.sql import Window
    w = Window.partitionBy(key).orderBy(
        F.col(effective_ts_col).desc(),
        *[F.col(c).desc_nulls_last() for c in tracked])
    updates = (updates.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn"))

    u = updates.withColumn("_u_exists", F.lit(1)).alias("u")
    c = cur.withColumn("_c_exists", F.lit(1)).alias("c")
    changed_cond = F.lit(False)
    for col in tracked:
        changed_cond = changed_cond | ~F.col(f"c.{col}").eqNullSafe(
            F.col(f"u.{col}"))
    # eqNullSafe + existence markers: NULL keys match each other and
    # never masquerade as "unmatched"
    j = c.join(u, F.col(f"c.{key}").eqNullSafe(F.col(f"u.{key}")),
               "full_outer")
    u_matched = F.col("u._u_exists").isNotNull()
    c_matched = F.col("c._c_exists").isNotNull()

    # surviving current rows: untouched, or touched-but-unchanged
    keep_cur = (j.filter(c_matched & (~u_matched | ~changed_cond))
                .select(*[F.col(f"c.{x}") for x in history.columns]))
    # closed-out versions of changed rows
    close_out = (j.filter(c_matched & u_matched & changed_cond)
                 .select(*[F.col(f"c.{x}") for x in history.columns
                           if x not in (valid_to, is_current)],
                         F.col(f"u.{effective_ts_col}").alias(valid_to),
                         F.lit(False).alias(is_current)))
    # new open versions: changed rows + brand-new keys
    new_rows = (j.filter(u_matched & (~c_matched | changed_cond))
                .select(F.col(f"u.{key}").alias(key),
                        *[F.col(f"u.{x}").alias(x) for x in tracked],
                        F.col(f"u.{effective_ts_col}").alias(valid_from),
                        F.lit(None).cast(
                            history.schema[valid_to].dataType)
                         .alias(valid_to),
                        F.lit(True).alias(is_current)))
    cols = history.columns
    return (closed.select(*cols)
            .unionByName(keep_cur.select(*cols))
            .unionByName(close_out.select(*cols))
            .unionByName(new_rows.select(*cols)))


def delete_matching(target: DataFrame, deletes: DataFrame,
                    key: str | list[str]) -> DataFrame:
    """Anti-join delete: keep target rows whose key is absent from
    ``deletes`` (MERGE WHEN MATCHED DELETE)."""
    keys = [key] if isinstance(key, str) else list(key)
    return target.join(deletes.select(*keys).distinct(), keys,
                       "left_anti")
