"""Stream-stream interval join: click events joined to view events of
the same user within a bounded time interval, under watermarks (the
state-bounded streaming join shape)."""

import pytest
from pyspark.sql import functions as F

from etl_tool_rep_spark.catalog import load
from etl_tool_rep_spark.streaming import read_event_stream


@pytest.fixture(scope="module")
def event_json(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ss_join"))
    (load(spark, sf_dir, "events").coalesce(2)
     .write.mode("overwrite").json(out))
    return out


def test_stream_stream_interval_join(spark, sf_dir, event_json):
    views = (read_event_stream(spark, event_json)
             .filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("ts").alias("v_ts"))
             .withWatermark("v_ts", "1 hour"))
    clicks = (read_event_stream(spark, event_json)
              .filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", "1 hour"))

    joined = views.join(
        clicks,
        F.expr("""v_user = c_user AND
                  c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 2 HOURS"""))

    q = (joined.writeStream.format("memory").queryName("t_ssjoin")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("t_ssjoin").count()

    e = load(spark, sf_dir, "events")
    v = e.filter("event_type = 'view'").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    c = e.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    expect = v.join(c, F.expr(
        """v_user = c_user AND
           c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 2 HOURS""")).count()
    assert got == expect and got > 0
