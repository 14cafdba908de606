"""Structured Streaming smoke tests: the streaming plans must produce
the same results as their batch twins over a static file set
(availableNow trigger + memory sink)."""

import os

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.streaming import (read_event_stream,
                                          run_available_now,
                                          windowed_agg_stream)


@pytest.fixture(scope="module")
def event_json_dir(spark, sf_dir, tmp_path_factory):
    """Dump sf0.001 events to a json dir to act as the stream source."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    (load(spark, sf_dir, "events")
     .coalesce(2)
     .write.mode("overwrite").json(out))
    return out


def test_stream_matches_batch_tumbling(spark, sf_dir, event_json_dir):
    stream = read_event_stream(spark, event_json_dir)
    assert stream.isStreaming
    got = run_available_now(
        windowed_agg_stream(stream, "1 hour", watermark="10 minutes"),
        "t_tumbling")

    batch = (load(spark, sf_dir, "events")
             .groupBy(F.window("ts", "1 hour"), "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("value").alias("total_value"))
             .select(F.col("window.start").alias("window_start"),
                     "event_type", "n_events"))

    g = {(r["window_start"], r["event_type"]): r["n_events"]
         for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"]
         for r in batch.collect()}
    assert g == b
    assert len(g) > 0


def test_watermark_is_attached(spark, event_json_dir):
    stream = windowed_agg_stream(
        read_event_stream(spark, event_json_dir), "1 hour",
        watermark="15 minutes")
    # eventTime watermark must appear in the analyzed plan
    assert "watermark" in stream._jdf.queryExecution().analyzed() \
        .toString().lower()
