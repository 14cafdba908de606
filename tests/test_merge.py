"""Merge/upsert + delete operators, and the foreachBatch streaming
sink pattern (micro-batch upserts into a parquet target)."""

import os

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.operators.merge import delete_matching, merge_upsert
from etl_tool_rep_spark.streaming import read_event_stream


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, val double")


def test_merge_upsert_semantics(spark, target):
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (9, "new", 1.0)],
        "id long, name string, val double")
    got = {r["id"]: (r["name"], r["val"])
           for r in merge_upsert(target, updates, "id").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0),
                   9: ("new", 1.0)}


def test_merge_schema_mismatch_raises(spark, target):
    bad = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(target, bad, "id")


def test_delete_matching(spark, target):
    deletes = spark.createDataFrame([(1,), (3,), (99,)], "id long")
    got = sorted(r["id"] for r in
                 delete_matching(target, deletes, "id").collect())
    assert got == [2]


def test_scd2_apply(spark):
    from etl_tool_rep_spark.operators.merge import scd2_apply
    hist = spark.createDataFrame(
        [(1, "gold", "2024-01-01", None, True),
         (2, "silver", "2024-01-01", None, True),
         (2, "bronze", "2023-01-01", "2024-01-01", False)],
        "id long, tier string, valid_from string, valid_to string, "
        "is_current boolean")
    updates = spark.createDataFrame(
        [(1, "platinum", "2024-06-01"),   # changed -> close + reopen
         (2, "silver", "2024-06-01"),     # unchanged -> untouched
         (3, "gold", "2024-06-01")],      # new key -> insert
        "id long, tier string, effective_ts string")
    out = scd2_apply(hist, updates, "id", ["tier"])
    rows = {(r["id"], r["tier"], r["is_current"]):
            (r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert rows[(1, "gold", False)] == ("2024-01-01", "2024-06-01")
    assert rows[(1, "platinum", True)] == ("2024-06-01", None)
    assert rows[(2, "silver", True)] == ("2024-01-01", None)
    assert rows[(2, "bronze", False)] == ("2023-01-01", "2024-01-01")
    assert rows[(3, "gold", True)] == ("2024-06-01", None)
    assert len(rows) == 5


def test_scd2_duplicate_key_updates_keep_one_current(spark):
    """Regression: two same-key updates in one batch opened two
    concurrent is_current versions."""
    from etl_tool_rep_spark.operators.merge import scd2_apply
    hist = spark.createDataFrame(
        [(1, "gold", "2024-01-01", None, True)],
        "id long, tier string, valid_from string, valid_to string, "
        "is_current boolean")
    updates = spark.createDataFrame(
        [(1, "silver", "2024-05-01"), (1, "platinum", "2024-06-01")],
        "id long, tier string, effective_ts string")
    out = scd2_apply(hist, updates, "id", ["tier"]).collect()
    current = [r for r in out if r["is_current"]]
    assert len(current) == 1 and current[0]["tier"] == "platinum"


def test_salted_join_rejects_outer_modes(spark):
    from etl_tool_rep_spark.operators.skew import salted_join
    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="full")


def test_foreachbatch_upsert_sink(spark, sf_dir, tmp_path):
    """Streaming upsert: each micro-batch merges per-user counts into
    a parquet target via foreachBatch — the standard 'streaming MERGE'
    pattern for sinks without native upsert."""
    src = str(tmp_path / "stream_src")
    tgt = str(tmp_path / "target")
    (load(spark, sf_dir, "events").repartition(3)
     .write.mode("overwrite").json(src))

    def upsert_batch(batch_df, batch_id):
        counts = (batch_df.groupBy("user_id")
                  .agg(F.count(F.lit(1)).alias("n")))
        if os.path.exists(tgt):
            current = spark.read.parquet(tgt)
            merged = (current.unionByName(counts)
                      .groupBy("user_id")
                      .agg(F.sum("n").cast("long").alias("n")))
        else:
            merged = counts
        merged.write.mode("overwrite").parquet(tgt + "_tmp")
        spark.read.parquet(tgt + "_tmp").write.mode("overwrite") \
            .parquet(tgt)

    q = (read_event_stream(spark, src, max_files_per_trigger=1)
         .writeStream.foreachBatch(upsert_batch)
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.awaitTermination(180)

    final = {r["user_id"]: r["n"]
             for r in spark.read.parquet(tgt).collect()}
    expect = {r["user_id"]: r["n"] for r in
              load(spark, sf_dir, "events").groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert final == expect
