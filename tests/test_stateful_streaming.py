"""Custom stateful operator: state must accumulate ACROSS micro-
batches (forced via maxFilesPerTrigger=1) and the final per-user
profile must equal the batch aggregate."""

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.streaming import read_event_stream
from etl_tool_rep_spark.streaming.stateful import (run_update_stream,
                                                   user_profile_stream)


@pytest.fixture(scope="module")
def event_files(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stateful_events"))
    # several files => several micro-batches => state reuse is tested
    (load(spark, sf_dir, "events")
     .repartition(4)
     .write.mode("overwrite").json(out))
    return out


def test_state_accumulates_across_batches(spark, sf_dir, event_files):
    stream = read_event_stream(spark, event_files,
                               max_files_per_trigger=1)
    result = run_update_stream(user_profile_stream(stream), "t_profile")

    # update mode appends one row per (batch, user); the LAST row per
    # user is the final state
    final = {}
    for r in result.collect():
        final[r["user_id"]] = (r["n_events"], r["total_value"])

    batch = (load(spark, sf_dir, "events")
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 6)
                   .alias("total")))
    expect = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}

    assert set(final) == set(expect)
    mismatch = {u for u in expect
                if final[u][0] != expect[u][0]
                or abs(final[u][1] - expect[u][1]) > 1e-6}
    assert not mismatch, f"{len(mismatch)} users mismatch: " \
                         f"{sorted(mismatch)[:5]}"
